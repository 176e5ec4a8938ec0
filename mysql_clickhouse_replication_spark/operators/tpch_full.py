"""The remaining TPC-H query shapes (q2, q9, q11, q13, q15, q16, q17,
q20, q21, q22) — completing the 22-query suite alongside composite.py.

The fixtures are TPC-H-ish minus ``partsupp``, ``l_commitdate`` /
``l_receiptdate``, ``c_phone`` and the comment columns, so each shape
documents its adaptation: the part↔supplier association comes from
``DISTINCT (l_partkey, l_suppkey)`` over lineitem, date-lag predicates
become returnflag markers, and phone country codes become the customer
id's trailing digits.  What is preserved is the PLAN ELEMENT each query
exists to exercise — decorrelated min join-back (q2), global-scalar
thresholds via broadcast cross join (q11, q17, q22), left join with
ON-clause extra predicate + double aggregation (q13), argmax join-back
(q15), anti-join under count-distinct (q16), two-level semi-join chain
(q20), and the semi+anti self-join pair (q21).

Determinism follows _util's decimal policy: every aggregate over money /
quantity doubles is an exact DECIMAL sum cast to DOUBLE at the end, and
every scalar threshold (0.2*avg, 0.001*total) is derived from those
exact sums with a single IEEE-754 op per engine, so both engines compare
identical doubles.

100 TB notes: every dimension side (part, supplier, nation, region, the
per-part averages of q17, the scalar aggregates of q11/q15/q22) is
explicitly ``F.broadcast``; the only all-fact shuffles are the keyed
aggregations themselves.  q21's semi+anti pair self-joins lineitem on
l_orderkey — at scale both probe sides shuffle on the same key, so AQE
plans them back-to-back on one exchange of the big side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..session import table
from ._util import D4, D8, D12, dec, dsum, sql_dsum

_REV_SQL = (
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(8,2)) * (CAST(1 AS DECIMAL(4,2))"
    " - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)"
)


def _rev() -> F.Column:
    return F.sum(
        dec("l_extendedprice", D8) * (F.lit(1).cast(D4) - dec("l_discount", D4))
    ).cast("double")


@register(
    "tpch_q2_shape",
    oracle="""
WITH cost AS (
  SELECT l_partkey, l_suppkey,
         MIN(CAST(l_extendedprice AS DECIMAL(8,2))) AS unit_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
), eligible AS (
  SELECT p_partkey, s_name, s_acctbal, n_name, unit_cost
  FROM cost
  JOIN part     ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE p_size BETWEEN 1 AND 5 AND p_type = 'LARGE' AND r_name = 'EUROPE'
), best AS (
  SELECT p_partkey AS bp, MIN(unit_cost) AS best_cost
  FROM eligible GROUP BY p_partkey
)
SELECT s_acctbal, s_name, n_name, p_partkey,
       CAST(unit_cost AS DOUBLE) AS supply_cost
FROM eligible JOIN best ON p_partkey = bp AND unit_cost = best_cost
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
""",
)
def tpch_q2_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 (minimum-cost supplier): the decorrelated correlated
    subquery.  Adaptation (no partsupp): the part↔supplier catalog is
    ``MIN(l_extendedprice)`` per (l_partkey, l_suppkey).  Plan element:
    per-part MIN computed once, then joined BACK on (key, min-equality) —
    the standard rewrite of ``WHERE cost = (SELECT MIN … WHERE pk = outer
    pk)``.  The min-equality join stays exact because unit_cost never
    leaves DECIMAL(8,2) until the output cast.  All four dims broadcast;
    the join-back is agg-vs-agg on the already-shuffled p_partkey.

    The join-back carries a shuffle_hash hint (ADVICE r3): the best
    side is bounded by the FILTERED part count — linear in scale
    factor, not a constant — so a hard broadcast would eventually hit
    Spark's 8 GB broadcast limit at the 100 TB design point.  Catalyst
    alone cannot see the agg's cardinality and falls back to a
    sort-merge join that re-sorts the whole eligible catalog on a
    (key, cost) composite — measured 4x slower at bench scale; the
    shuffle-hash hint keeps the hash-join physical shape (build side =
    best, no sort) while both sides arrive already partitioned on
    p_partkey from their upstream aggregations, so no extra exchange."""
    li = table(spark, sf_dir, "lineitem")
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(dec("l_extendedprice", D8)).alias("unit_cost")
    )
    p = table(spark, sf_dir, "part").filter(
        F.col("p_size").between(1, 5) & (F.col("p_type") == "LARGE")
    )
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eligible = (
        cost.join(F.broadcast(p), cost.l_partkey == p.p_partkey)
        .join(F.broadcast(s), cost.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("p_partkey", "s_name", "s_acctbal", "n_name", "unit_cost")
    )
    best = eligible.groupBy(F.col("p_partkey").alias("bp")).agg(
        F.min("unit_cost").alias("best_cost")
    )
    return (
        eligible.join(
            best.hint("shuffle_hash"),
            (eligible.p_partkey == best.bp)
            & (eligible.unit_cost == best.best_cost),
        )
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            F.col("unit_cost").cast("double").alias("supply_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "tpch_q9_shape",
    oracle="""
SELECT n_name AS nation, EXTRACT(YEAR FROM o_orderdate) AS o_year,
       CAST(SUM(
         CAST(l_extendedprice AS DECIMAL(8,2))
           * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
         - CAST(p_retailprice AS DECIMAL(8,2)) * CAST(l_quantity AS DECIMAL(4,2))
           * CAST(0.01 AS DECIMAL(4,2))
       ) AS DOUBLE) AS profit
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN part     ON l_partkey  = p_partkey
JOIN supplier ON l_suppkey  = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%gear%'
GROUP BY n_name, EXTRACT(YEAR FROM o_orderdate)
""",
)
def tpch_q9_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 (product-type profit): 5-way star with a two-term profit
    expression aggregated by supplier nation × order year.  Adaptation
    (no ps_supplycost): unit cost is 1% of p_retailprice, so profit =
    disc_price − retailprice·qty·0.01 — same shape (revenue minus a
    join-sourced cost), exact DECIMAL both terms (widths ≤18, compact
    64-bit decimals).  The substring LIKE on p_name cannot push to row
    groups but prunes via the broadcast part join before any fact row
    widens."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders")
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("%gear%"))
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    profit = dec("l_extendedprice", D8) * (
        F.lit(1).cast(D4) - dec("l_discount", D4)
    ) - dec("p_retailprice", D8) * dec("l_quantity", D4) * F.lit(0.01).cast(D4)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(F.sum(profit).cast("double").alias("profit"))
    )


@register(
    "tpch_q11_shape",
    oracle="""
WITH g AS (
  SELECT l_partkey,
         SUM(CAST(l_extendedprice AS DECIMAL(8,2))
             * CAST(l_quantity AS DECIMAL(4,2))) AS vdec
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
  GROUP BY l_partkey
)
SELECT l_partkey, CAST(vdec AS DOUBLE) AS value
FROM g, (SELECT CAST(SUM(vdec) AS DOUBLE) / COUNT(*) AS mean_v FROM g) t
WHERE CAST(vdec AS DOUBLE) > mean_v * 1.5
""",
)
def tpch_q11_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 (important stock): per-part inventory value for one
    region's suppliers, kept only when above 1.5× the GLOBAL per-part
    mean (TPC-H's fixed fraction scales by 1/SF for the same reason — a
    constant share of total is vacuous once part count grows 10×; the
    mean-relative threshold is scale-free).  Adaptation (no partsupp): value = Σ price·qty over that
    region's lineitems (a region, not a single nation, so the filter is
    populated at every fixture SF — sf0.001 has only 10 suppliers across
    25 nations).  Plan element: the global scalar aggregate
    re-enters the plan as a broadcast cross join (1 row), so the HAVING
    > (SELECT SUM…) decorrelates without a second fact scan — the
    grouped decimals are summed again rather than recomputed from base.
    Threshold compare: exact-decimal doubles, one IEEE multiply per
    engine — bit-identical on both sides."""
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    g = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("l_partkey")
        .agg(
            F.sum(dec("l_extendedprice", D8) * dec("l_quantity", D4)).alias(
                "vdec"
            )
        )
    )
    mean_v = g.agg(
        (F.sum("vdec").cast("double") / F.count(F.lit(1))).alias("mean_v")
    )
    return (
        g.crossJoin(F.broadcast(mean_v))
        .filter(F.col("vdec").cast("double") > F.col("mean_v") * 1.5)
        .select("l_partkey", F.col("vdec").cast("double").alias("value"))
    )


@register(
    "tpch_q13_shape",
    oracle="""
WITH c_orders AS (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey
                  AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
SELECT c_count, COUNT(*) AS custdist
FROM c_orders GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
""",
)
def tpch_q13_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 (customer order-count distribution).  Plan elements: a
    LEFT OUTER join whose ON clause carries a NON-key predicate (the
    priority exclusion must sit in the join condition, not a WHERE —
    filtering after the join would drop order-less customers), COUNT
    over a nullable column (counts only matched rows, so no-order
    customers land in the c_count=0 bucket), then a second aggregation
    over the first's output.  Adaptation: o_comment NOT LIKE '%special
    requests%' becomes the priority exclusion (no comment column)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    c_orders = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey)
            & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        c_orders.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "tpch_q15_shape",
    oracle=f"""
WITH rev AS (
  SELECT l_suppkey AS supplier_no, {_REV_SQL} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier
JOIN rev ON s_suppkey = supplier_no,
     (SELECT MAX(total_revenue) AS mx FROM rev) m
WHERE total_revenue = mx
""",
)
def tpch_q15_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): quarterly revenue per supplier, return
    the argmax row(s).  Plan element: the view-then-max-then-equality
    pattern — the aggregate feeds BOTH the global MAX (1-row broadcast)
    and the equality probe, so Spark computes rev once per branch off a
    shared shuffle.  The equality on total_revenue is safe because both
    engines derive it from the same exact decimal sum (identical
    doubles); ties would return multiple rows in both engines alike."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        _rev().alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("mx"))
    s = table(spark, sf_dir, "supplier")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("mx"))
        .join(F.broadcast(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "tpch_q16_shape",
    oracle="""
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM ps JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#5' AND p_type <> 'MEDIUM'
  AND p_size IN (1, 4, 9, 14, 19, 24, 30, 45)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
""",
)
def tpch_q16_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 (parts/supplier relationship): COUNT(DISTINCT supplier)
    per part attribute triple, under a NOT-IN exclusion.  Adaptations:
    the partsupp association is DISTINCT (l_partkey, l_suppkey) from
    lineitem; the '%Customer%Complaints%' supplier blacklist becomes
    s_acctbal < 0.  Plan elements: NOT IN over a never-null key compiles
    to a broadcast LEFT ANTI join (no null-aware machinery needed), and
    the count-distinct rides the same shuffle as the group keys."""
    li = table(spark, sf_dir, "lineitem")
    ps = li.select("l_partkey", "l_suppkey").distinct()
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & (F.col("p_type") != "MEDIUM")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 24, 30, 45)
    )
    bad = table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        ps.join(F.broadcast(p), ps.l_partkey == p.p_partkey)
        .join(
            F.broadcast(bad), ps.l_suppkey == F.col("s_suppkey"), "left_anti"
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@register(
    "tpch_q17_shape",
    oracle="""
WITH pl AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#3' AND p_type = 'SMALL'
), avgq AS (
  SELECT l_partkey AS ap,
         0.2 * (CAST(SUM(CAST(l_quantity AS DECIMAL(4,2))) AS DOUBLE)
                / COUNT(l_quantity)) AS qty_thresh
  FROM pl GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(8,2))) AS DOUBLE) / 7.0
         AS avg_yearly,
       COUNT(*) AS n_small
FROM pl JOIN avgq ON l_partkey = ap
WHERE l_quantity < qty_thresh
""",
)
def tpch_q17_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 (small-quantity-order revenue): revenue from orders
    below 20% of the part's average quantity.  Plan element: the
    correlated per-part scalar (AVG per l_partkey) decorrelated into a
    grouped aggregate re-joined to the same rows — computed off one
    shared scan of the brand-filtered join, broadcast back (the per-part
    average table is |parts-in-brand| rows, tiny).  The 0.2·avg
    threshold is exact-sum/count then one multiply, so both engines
    compare identical doubles against the integral quantities."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#3") & (F.col("p_type") == "SMALL")
    )
    pl = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    avgq = pl.groupBy(F.col("l_partkey").alias("ap")).agg(
        (
            F.lit(0.2)
            * (
                F.sum(dec("l_quantity", D4)).cast("double")
                / F.count("l_quantity")
            )
        ).alias("qty_thresh")
    )
    return (
        pl.join(F.broadcast(avgq), pl.l_partkey == F.col("ap"))
        .filter(F.col("l_quantity") < F.col("qty_thresh"))
        .agg(
            (F.sum(dec("l_extendedprice", D8)).cast("double") / 7.0).alias(
                "avg_yearly"
            ),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


@register(
    "tpch_q20_shape",
    oracle="""
WITH qty AS (
  SELECT l_suppkey
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'red%'
    AND l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1998-01-01'
  GROUP BY l_suppkey, l_partkey
  HAVING SUM(CAST(l_quantity AS DECIMAL(4,2))) > 50
)
SELECT s_name, s_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'AFRICA'
  AND s_suppkey IN (SELECT l_suppkey FROM qty)
ORDER BY s_name
""",
)
def tpch_q20_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 (excess-stock suppliers): suppliers in one region who
    shipped more than a threshold of any 'red' part this year.  Plan
    element: the two-level nested IN — an aggregated HAVING subquery
    feeding a semi-join — expressed as groupBy→filter→LEFT SEMI, so the
    fact table is scanned once and the supplier probe is the tiny side.
    Adaptation (no partsupp availqty): threshold is the shipped-quantity
    sum itself (> 50), exact decimal."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    p = table(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    qty = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(dec("l_quantity", D4)).alias("tq"))
        .filter(F.col("tq") > 50)
        .select("l_suppkey")
        .distinct()
    )
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "AFRICA")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(qty, s.s_suppkey == qty.l_suppkey, "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


@register(
    "tpch_q21_shape",
    oracle="""
SELECT s_name, COUNT(*) AS numwait
FROM lineitem l1
JOIN orders   ON l1.l_orderkey = o_orderkey
JOIN supplier ON l1.l_suppkey  = s_suppkey
WHERE o_orderstatus = 'F' AND l1.l_returnflag = 'R'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
""",
)
def tpch_q21_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 (suppliers who kept orders waiting): on failed orders,
    the supplier whose line was returned while every OTHER supplier's
    lines were fine.  Adaptation (no receipt/commit dates): 'late'
    becomes l_returnflag = 'R'.  Plan element: the EXISTS / NOT-EXISTS
    pair over the SAME self-joined fact — a LEFT SEMI then a LEFT ANTI,
    both keyed on l_orderkey with a non-equi suppkey disqualifier in the
    join condition.  Both probes shuffle on the same key as l1, so the
    exchange is reused across the pair; supplier broadcasts."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    s = table(spark, sf_dir, "supplier")
    l1 = li.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_suppkey"
    )
    l2 = li.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2")
    )
    l3 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("ok3"), F.col("l_suppkey").alias("sk3")
    )
    return (
        l1.join(o, l1.l_orderkey == o.o_orderkey, "left_semi")
        .join(
            l2,
            (F.col("l_orderkey") == F.col("ok2"))
            & (F.col("l_suppkey") != F.col("sk2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("ok3"))
            & (F.col("l_suppkey") != F.col("sk3")),
            "left_anti",
        )
        .join(F.broadcast(s), F.col("l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


@register(
    "tpch_q22_shape",
    oracle="""
WITH pot AS (
  SELECT SUBSTR(c_name, 17, 2) AS cntrycode, c_acctbal, c_custkey
  FROM customer
  WHERE SUBSTR(c_name, 17, 2) IN ('00', '05', '13', '21', '37',
                                  '42', '55', '68', '71', '89')
), thresh AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
           / COUNT(c_acctbal) AS avg_bal
  FROM pot WHERE c_acctbal > 0.0
)
SELECT cntrycode, COUNT(*) AS numcust,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
FROM pot, thresh
WHERE c_acctbal > avg_bal
  AND c_custkey NOT IN (SELECT o_custkey FROM orders
                        WHERE o_orderpriority = '1-URGENT'
                          AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY cntrycode
ORDER BY cntrycode
""",
)
def tpch_q22_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 (global sales opportunity): above-average-balance
    customers with no recent activity, grouped by country code.
    Adaptations: the phone prefix becomes the customer id's trailing
    digit pair SUBSTR(c_name,17,2) (uniform '00'–'99'); 'no orders at
    all' becomes 'no recent URGENT orders' because the fixture's order
    density leaves zero order-less customers (every c_custkey appears
    in orders, so the literal anti-join would be vacuous at every SF).
    Plan elements: a global scalar AVG re-entering as a 1-row
    broadcast cross join, plus a NOT IN anti-join against a filtered
    fact projection.  The AVG threshold is the exact decimal sum/count,
    so both engines filter on identical doubles."""
    c = table(spark, sf_dir, "customer")
    pot = c.filter(
        F.substring("c_name", 17, 2).isin(
            "00", "05", "13", "21", "37", "42", "55", "68", "71", "89"
        )
    ).select(
        F.substring("c_name", 17, 2).alias("cntrycode"),
        "c_acctbal",
        "c_custkey",
    )
    thresh = pot.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(dec("c_acctbal", D12)).cast("double") / F.count("c_acctbal")
        ).alias("avg_bal")
    )
    urgent = (
        table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderpriority") == "1-URGENT")
            & (F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        )
        .select("o_custkey")
    )
    return (
        pot.crossJoin(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(urgent, pot.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal", "totacctbal", D12),
        )
        .orderBy("cntrycode")
    )
