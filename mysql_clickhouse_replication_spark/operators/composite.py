"""Composite analytics queries + skew/approx techniques (SURVEY.md
section 2 closure).

The TPC-H-shaped composites prove the operator surface composes into the
full reports a warehouse user actually runs (the fixtures are TPC-H-ish
by construction, minus partsupp/comment columns). The skew/approx keys
demonstrate the two standard 100 TB defenses — salted two-stage
aggregation and sketch-based quantiles — in oracle-checkable form.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..session import table
from ._util import D4, D8, dsum, sql_dsum

_REV_SQL = (
    "CAST(SUM(CAST(l_extendedprice AS DECIMAL(8,2)) * (CAST(1 AS DECIMAL(4,2))"
    " - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)"
)


def _rev() -> F.Column:
    return F.sum(
        F.col("l_extendedprice").cast(D8)
        * (F.lit(1).cast(D4) - F.col("l_discount").cast(D4))
    ).cast("double")


@register(
    "tpch_q3_shape",
    oracle=f"""
SELECT l_orderkey, {_REV_SQL} AS revenue, o_orderdate, c_mktsegment
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1997-01-01'
  AND l_shipdate  > TIMESTAMP '1997-01-01'
GROUP BY l_orderkey, o_orderdate, c_mktsegment
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
)
def tpch_q3_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 (shipping priority): segment filter -> 3-way join ->
    revenue agg -> global top-10. Filters sit on both scans BEFORE the
    joins (pushdown), the final top-k is a TakeOrderedAndProject, and the
    revenue tie is broken by l_orderkey for a deterministic LIMIT."""
    c = table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1997-01-01").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate", "c_mktsegment")
        .agg(_rev().alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "c_mktsegment")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "tpch_q6_shape",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(8,2))
              * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
)
def tpch_q6_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 (forecast revenue change): pure scan-filter-aggregate.
    Every predicate reaches the parquet row-group reader; the aggregate
    is a single partial+final combine with no keyed shuffle."""
    li = table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(F.col("l_extendedprice").cast(D8) * F.col("l_discount").cast(D4))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "tpch_q10_shape",
    oracle=f"""
SELECT c_custkey, c_name, {_REV_SQL} AS revenue, n_name
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-04-01'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
)
def tpch_q10_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 (returned-item reporting): quarter + returnflag filters,
    star join with broadcast nation, revenue per customer, top-20."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = table(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(_rev().alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "tpch_q4_shape",
    oracle="""
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01'
  AND o_orderdate <  TIMESTAMP '1996-10-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
""",
)
def tpch_q4_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 (order priority checking), adapted to the trimmed schema
    (no commit/receipt dates -> 'shipped after ordering' plays the late
    predicate): quarter filter -> EXISTS as a left-semi join whose right
    side carries the correlated l_shipdate > o_orderdate condition ->
    count by priority."""
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "tpch_q12_shape",
    oracle="""
SELECT l_linestatus,
       COUNT(*) FILTER (WHERE o_orderpriority IN ('1-URGENT', '2-HIGH'))
           AS high_line_count,
       COUNT(*) FILTER (WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH'))
           AS low_line_count
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1997-01-01'
GROUP BY l_linestatus
""",
)
def tpch_q12_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 (shipping mode / priority split, l_shipmode absent ->
    grouped by linestatus): fact-fact join with the year filter pushed to
    the lineitem scan, conditional counts by priority class."""
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.count_if(high).alias("high_line_count"),
            F.count_if(~high).alias("low_line_count"),
        )
    )


@register(
    "tpch_q14_shape",
    oracle=f"""
SELECT ROUND(100.0 * CAST(SUM(CASE WHEN p_type = 'ECONOMY'
                 THEN CAST(l_extendedprice AS DECIMAL(8,2))
                      * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
                 ELSE CAST(0 AS DECIMAL(13,4)) END) AS DOUBLE)
             / {_REV_SQL}, 6) AS economy_revenue_pct,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01'
  AND l_shipdate <  TIMESTAMP '1996-10-01'
""",
)
def tpch_q14_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 (promotion effect; 'ECONOMY' plays the PROMO type):
    month filter -> lineitem joins the part dim -> conditional revenue
    share as one global aggregate. Decimal-exact numerator/denominator,
    single final division rounded on both sides."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    p = table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev_term = F.col("l_extendedprice").cast(D8) * (
        F.lit(1).cast(D4) - F.col("l_discount").cast(D4)
    )
    econ = F.when(F.col("p_type") == "ECONOMY", rev_term).otherwise(
        F.lit(0).cast("decimal(13,4)")
    )
    return li.join(p, li.l_partkey == p.p_partkey).agg(
        F.round(
            100.0 * F.sum(econ).cast("double") / F.sum(rev_term).cast("double"), 6
        ).alias("economy_revenue_pct"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "agg_skew_salted",
    oracle="""
SELECT l_returnflag, COUNT(*) AS n,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
FROM lineitem GROUP BY l_returnflag
""",
)
def agg_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation — the manual defense when ONE key
    carries most rows (l_returnflag has 3 values over 600k rows: maximal
    skew). Stage 1 aggregates (key, salt16) so the hot key spreads over
    16 reducers; stage 2 merges the 16 partials per key. Result is
    bitwise equal to the direct groupBy (decimal-exact, order-free);
    wall-clock equal here, but at 100 TB stage 1 is the difference
    between one straggler reducer and even utilization. AQE's
    skewedPartitionFactor handles JOIN skew; aggregation skew needs this
    explicit shape."""
    li = table(spark, sf_dir, "lineitem")
    salted = li.withColumn("salt", F.pmod(F.col("l_orderkey"), F.lit(16)))
    partial = salted.groupBy("l_returnflag", "salt").agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("pq"),
    )
    return partial.groupBy("l_returnflag").agg(
        F.sum("pn").alias("n"),
        F.sum("pq").cast("double").alias("sum_qty"),
    )


@register(
    "agg_approx_percentiles",
    oracle="""
SELECT o_orderstatus,
       QUANTILE_CONT(o_totalprice, 0.5) AS exact_p50,
       COUNT(*) AS n,
       TRUE AS approx_within_5pct
FROM orders GROUP BY o_orderstatus
""",
)
def agg_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based quantiles — the 100 TB replacement for the exact
    per-group sort that agg_percentiles pays. Same contract pattern as
    agg_approx_distinct: the sketch estimate cannot hash-match across
    engines, so the exact value rides along and a pinned boolean asserts
    the approx_percentile (accuracy 10000) landed within 5%."""
    o = table(spark, sf_dir, "orders")
    approx = F.approx_percentile("o_totalprice", F.lit(0.5), F.lit(10000))
    exact = F.percentile("o_totalprice", F.lit(0.5))
    return o.groupBy("o_orderstatus").agg(
        exact.alias("exact_p50"),
        F.count(F.lit(1)).alias("n"),
        (F.abs(approx - exact) <= 0.05 * exact).alias("approx_within_5pct"),
    )


@register(
    "tpch_q5_shape",
    oracle=f"""
SELECT n_name, {_REV_SQL} AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
""",
)
def tpch_q5_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 (local supplier volume): 6-table star with the
    customer-and-supplier-in-the-same-nation constraint. The two facts
    (orders, lineitem) meet in a keyed shuffle join; supplier/nation/
    region are broadcast dims, and the region filter prunes nations
    BEFORE the fact join touches them — at 100 TB the broadcast side is
    a few MB while the fact side never shuffles twice (the n_name
    grouping rides the already-partitioned join output).

    The fact join carries an explicit shuffle_hash hint: at bench scale
    lineitem's pruned 4-column projection sneaks under the
    auto-broadcast threshold and Catalyst happily broadcasts the FACT
    (a 600 k-row hash relation rebuilt per run — measured 4-5 s of
    driver-side build under a warm loaded JVM, and a plan that would
    OOM outright at 100 TB). The hint pins the scale-correct shape at
    every SF; dims stay broadcast."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = table(spark, sf_dir, "lineitem")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li.hint("shuffle_hash"), o.o_orderkey == li.l_orderkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(_rev().alias("revenue"))
    )


@register(
    "tpch_q18_shape",
    oracle="""
SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
       CAST(SUM(CAST(l_quantity AS DECIMAL(4,2))) AS DOUBLE) AS total_qty
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE o_orderkey IN (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS DECIMAL(4,2))) > 300
)
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 20
""",
)
def tpch_q18_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 (large-volume customers): self-aggregation of lineitem
    feeds a semi-join that prunes orders BEFORE the customer join — the
    qualifying-key set is tiny (99.9th-percentile order volume), so at
    100 TB the expensive 3-way join runs over a filtered fact, not the
    full one. The HAVING sum is decimal-exact so the qualifying set is
    bit-identical across engines."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    li = table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(D4)).alias("q"))
        .filter(F.col("q") > 300)
        .select("l_orderkey")
    )
    return (
        o.join(big.hint("broadcast"), o.o_orderkey == big.l_orderkey, "left_semi")
        .join(c, F.col("o_custkey") == c.c_custkey)
        .join(li, F.col("o_orderkey") == li.l_orderkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum(F.col("l_quantity").cast(D4)).cast("double").alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


@register(
    "tpch_q19_shape",
    oracle=f"""
SELECT {_REV_SQL} AS revenue, COUNT(*) AS n_items
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 20 AND 30)
""",
)
def tpch_q19_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 (discounted revenue, disjunctive predicates): the OR of
    three brand/size/quantity conjunctions straddles the join. Catalyst
    derives the single-sided implications (p_size <= 15 on part,
    l_quantity between 1 and 30 on lineitem) and pushes them below the
    join so both scans prune; the residual disjunction evaluates on the
    joined row. The part side after pushdown is dim-sized -> broadcast."""
    li = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    qty, brand, size = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    pred = (
        ((brand == "Brand#12") & size.between(1, 5) & qty.between(1, 11))
        | ((brand == "Brand#23") & size.between(1, 10) & qty.between(10, 20))
        | ((brand == "Brand#34") & size.between(1, 15) & qty.between(20, 30))
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(pred)
        .agg(_rev().alias("revenue"), F.count(F.lit(1)).alias("n_items"))
    )


@register(
    "tpch_q7_shape",
    oracle=f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       EXTRACT(YEAR FROM l_shipdate) AS l_year, {_REV_SQL} AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey  = c_custkey
JOIN supplier ON l_suppkey  = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
    OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
  AND l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY n1.n_name, n2.n_name, EXTRACT(YEAR FROM l_shipdate)
""",
)
def tpch_q7_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): bilateral trade between two nations by
    ship year. The new plan element vs the other tpch_* shapes is the
    SAME dimension joined TWICE under different roles (supplier's nation
    vs customer's nation) — both legs broadcast independently, and the
    disjunctive nation-pair predicate applies after both legs resolve
    (it spans the two aliases, so it cannot push into either scan; the
    ship-date range does push). Decimal-exact revenue, 2-year window."""
    li = table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    n1 = F.broadcast(
        n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    )
    n2 = F.broadcast(
        n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    )
    pair = (
        (F.col("supp_nation") == "NATION_3") & (F.col("cust_nation") == "NATION_7")
    ) | ((F.col("supp_nation") == "NATION_7") & (F.col("cust_nation") == "NATION_3"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(n1, F.col("s_nationkey") == F.col("s_nk"))
        .join(n2, F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(_rev().alias("revenue"))
    )


@register(
    "tpch_q8_shape",
    oracle=f"""
WITH all_rev AS (
  SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
         CAST(l_extendedprice AS DECIMAL(8,2))
           * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) AS volume,
         n2.n_name AS supp_nation
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey  = c_custkey
  JOIN part     ON l_partkey  = p_partkey
  JOIN supplier ON l_suppkey  = s_suppkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region    ON n1.n_regionkey = r_regionkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA' AND p_type = 'PROMO'
    AND o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate <  TIMESTAMP '1998-01-01'
)
SELECT o_year,
       CAST(FLOOR(CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                                     ELSE CAST(0 AS DECIMAL(13,4)) END)
                            * 10000 AS BIGINT) AS DOUBLE)
                  / CAST(CAST(SUM(volume) * 10000 AS BIGINT) AS DOUBLE)
                  * 1000000) AS BIGINT) AS mkt_share_ppm,
       CAST(SUM(volume) AS DOUBLE) AS total_volume
FROM all_rev GROUP BY o_year
""",
)
def tpch_q8_shape(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): of the PROMO-part revenue sold
    into ASIA customers, what fraction came from NATION_3 suppliers, per
    order year. Adds the conditional-share aggregate (one pass: CASE
    inside SUM over the same rows — never two scans joined back) on top
    of Q7's double-nation star. The share is surfaced as ppm computed
    from the two EXACT decimal sums lifted to integer 1e-4 units (scale
    4 -> *10000 is exact) and divided in ONE identical IEEE op, floored
    — cross-engine decimal-division scale rules never run.  Region/part
    filters prune via broadcast joins before any fact row widens."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = table(spark, sf_dir, "customer")
    p = table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = table(spark, sf_dir, "supplier")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = n.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    volume = F.col("l_extendedprice").cast("decimal(8,2)") * (
        F.lit(1).cast("decimal(4,2)") - F.col("l_discount").cast("decimal(4,2)")
    )
    zero = F.lit(0).cast("decimal(13,4)")
    rows = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(r), F.col("c_rk") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            volume.alias("volume"),
            "supp_nation",
        )
    )
    nation_vol = F.sum(
        F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(zero)
    )
    return rows.groupBy("o_year").agg(
        F.floor(
            (nation_vol * F.lit(10000)).cast("bigint").cast("double")
            / (F.sum("volume") * F.lit(10000)).cast("bigint").cast("double")
            * F.lit(1000000)
        ).alias("mkt_share_ppm"),
        F.sum("volume").cast("double").alias("total_volume"),
    )
