"""Join operators (SURVEY.md section 2.D).

Reference parity: the reference class delegates all joins to ClickHouse SQL
over the replicated tables (SURVEY.md section 3.1 — empty snapshot, no
citable file:line; semantics tagged [P:med] there). ASOF JOIN is a native
ClickHouse feature of the sink engine, re-expressed here with the
union+window trick.

Scale notes (100 TB): every dimension at or below nation/region size is
explicitly ``F.broadcast`` — no shuffle for the dim side, fact side stays
in place. Fact-to-fact joins (orders⋈customer, lineitem⋈orders) shuffle
both sides on the key and rely on AQE for skew splitting; at 100 TB these
become sort-merge joins over co-bucketed tables. Non-equi joins (theta /
interval) broadcast the literal dim so the plan is a single pass over the
fact — BroadcastNestedLoopJoin is inherent to theta joins and safe only
because the broadcast side is tiny. The asof join is ONE shuffle
(partitionBy user) + ONE in-partition sort — strictly better at scale
than the naive per-left-row subquery, which would be a quadratic range
join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import QUERIES, register
from ..session import table
from ._util import davg, dsum, sql_davg, sql_dsum, values_df

_BIG = 450000.0  # ~10% of orders; splits customers into have/have-not


@register(
    "join_inner_equi",
    oracle="""
SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
FROM orders JOIN customer ON o_custkey = c_custkey
""",
)
def join_inner_equi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PK-FK equi join. Planner picks broadcast-hash while customer fits the
    threshold and switches to sort-merge/shuffled-hash beyond it (AQE); no
    hint on purpose — this key exercises the default strategy."""
    o = table(spark, sf_dir, "orders")
    c = table(spark, sf_dir, "customer")
    return o.join(c, o.o_custkey == c.c_custkey, "inner").select(
        "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"
    )


@register(
    "join_multiway",
    oracle=f"""
SELECT r_name, n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(8,2))
                * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
           AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey  = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY r_name, n_name
""",
)
def join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-table star chain (TPC-H Q5 shape). Fact⋈fact legs shuffle on the
    join key; nation/region are broadcast so the star adds zero extra
    shuffles. The date filter is pushed into the orders parquet scan before
    the join (verified in tests/test_plans.py)."""
    li = table(spark, sf_dir, "lineitem")
    o = table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    # D8 x D4 product stays at precision 13 — compact decimal fast path
    rev = F.col("l_extendedprice").cast("decimal(8,2)") * (
        F.lit(1).cast("decimal(4,2)") - F.col("l_discount").cast("decimal(4,2)")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "join_broadcast",
    oracle=f"""
SELECT r_name, n_name, COUNT(*) AS n_custs, {sql_dsum('c_acctbal', 'sum_bal')}
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
""",
)
def join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast-hash join of the two smallest dims (25 / 5 rows).
    At 100 TB this is THE dim-join pattern: ship the dim to every executor,
    zero shuffle of the fact. tests/test_plans.py asserts the
    BroadcastHashJoin appears in the plan."""
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    r = table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_custs"), dsum("c_acctbal", "sum_bal"))
    )


@register(
    "join_left_outer",
    oracle=f"""
SELECT c_custkey, o_orderkey, o_totalprice
FROM customer LEFT JOIN (
  SELECT * FROM orders WHERE o_totalprice > {_BIG}
) big ON c_custkey = o_custkey
""",
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer with a filtered right side so both match and null-padded
    rows exist (every customer has SOME order on the fixtures; only ~60%
    have one above the threshold)."""
    c = table(spark, sf_dir, "customer")
    big = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > _BIG)
    return c.join(big, c.c_custkey == big.o_custkey, "left").select(
        "c_custkey", "o_orderkey", "o_totalprice"
    )


@register(
    "join_full_outer",
    oracle="""
SELECT COALESCE(cs.nationkey, ss.nationkey) AS nationkey, n_cust, n_supp
FROM (SELECT c_nationkey AS nationkey, COUNT(*) AS n_cust
      FROM customer WHERE c_nationkey < 15 GROUP BY c_nationkey) cs
FULL OUTER JOIN
     (SELECT s_nationkey AS nationkey, COUNT(*) AS n_supp
      FROM supplier WHERE s_nationkey >= 10 GROUP BY s_nationkey) ss
ON cs.nationkey = ss.nationkey
""",
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer with a structural key split (customers restricted to
    nations 0-14, suppliers to 10-24) so left-only, right-only, and
    both-sides keys are all guaranteed non-empty at every scale factor."""
    cs = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_nationkey") < 15)
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    ss = (
        table(spark, sf_dir, "supplier")
        .filter(F.col("s_nationkey") >= 10)
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    return cs.join(ss, cs.nationkey == ss.nationkey, "full").select(
        F.coalesce(cs.nationkey, ss.nationkey).alias("nationkey"),
        "n_cust",
        "n_supp",
    )


@register(
    "join_semi",
    oracle=f"""
SELECT c_custkey, c_name, c_mktsegment FROM customer
WHERE EXISTS (SELECT 1 FROM orders
              WHERE o_custkey = c_custkey AND o_totalprice > {_BIG})
""",
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS as left-semi join: the right side is reduced to its key set
    during the build, output carries only left columns — at 100 TB this is
    far cheaper than inner-join+distinct."""
    c = table(spark, sf_dir, "customer")
    big = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > _BIG)
    return c.join(big, c.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@register(
    "join_anti",
    oracle=f"""
SELECT c_custkey, c_name, c_acctbal FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey AND o_totalprice > {_BIG})
""",
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS as left-anti join (null-safe: anti join keeps left rows
    with no build-side match, the set complement of join_semi)."""
    c = table(spark, sf_dir, "customer")
    big = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > _BIG)
    return c.join(big, c.c_custkey == big.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_acctbal"
    )


@register(
    "join_cross",
    oracle="SELECT r_name, n_name FROM region CROSS JOIN nation",
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded Cartesian product (5 x 25). Only ever sane when one side is
    a broadcastable constant-size dim — which the planner turns into a
    BroadcastNestedLoopJoin, not a shuffled cartesian."""
    r = table(spark, sf_dir, "region").select("r_name")
    n = table(spark, sf_dir, "nation").select("n_name")
    return r.crossJoin(n)


_SIZE_BUCKETS = [
    ("small", 1, 10),
    ("medium", 11, 25),
    ("large", 26, 40),
    ("xlarge", 41, 50),
]


@register(
    "join_theta_range",
    oracle=f"""
SELECT bucket, COUNT(*) AS n_parts, {sql_davg('p_retailprice', 'avg_price')}
FROM part
JOIN (VALUES {', '.join(f"('{b}', {lo}, {hi})" for b, lo, hi in _SIZE_BUCKETS)})
     v(bucket, lo, hi)
ON p_size BETWEEN lo AND hi
GROUP BY bucket
""",
)
def join_theta_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band (theta/range) join against a literal bucket dim. Non-equi
    predicates cannot hash-partition, so the ONLY scalable physical shape
    is broadcasting the tiny side (BroadcastNestedLoopJoin) — one pass
    over the fact, no shuffle before the final aggregation."""
    p = table(spark, sf_dir, "part")
    dim = values_df(spark, _SIZE_BUCKETS, "bucket string, lo int, hi int")
    cond = (F.col("p_size") >= F.col("lo")) & (F.col("p_size") <= F.col("hi"))
    return (
        p.join(F.broadcast(dim), cond)
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            davg("p_retailprice", "avg_price"),
        )
    )


@register(
    "join_asof",
    oracle="""
WITH l AS (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'),
     r AS (SELECT user_id, ts AS r_ts, MAX_BY(value, event_id) AS r_value
           FROM events WHERE event_type = 'view' GROUP BY user_id, ts)
SELECT l.user_id, l.ts, l.value AS purchase_value,
       r.r_value AS last_view_value, r.r_ts AS last_view_ts
FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.r_ts
""",
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (ClickHouse ASOF JOIN: latest right row with r.ts <= l.ts
    per key), via the union+window trick: tag both sides, sort each user's
    rows by (ts, side) with right rows first on ties, and carry the last
    non-null right payload forward. ONE shuffle on user_id + one
    in-partition sort — the scalable alternative to a per-row range
    subquery. Right side is pre-aggregated to unique (user_id, ts) so tie
    resolution is deterministic in both engines."""
    ev = table(spark, sf_dir, "events")
    left = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        "ts",
        F.lit(1).alias("side"),
        F.col("value").alias("purchase_value"),
        F.lit(None).cast("double").alias("r_value"),
    )
    right = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max_by("value", "event_id").alias("r_value"))
        .select(
            "user_id",
            "ts",
            F.lit(0).alias("side"),
            F.lit(None).cast("double").alias("purchase_value"),
            "r_value",
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = left.unionByName(right).select(
        "user_id",
        "ts",
        "side",
        "purchase_value",
        F.last("r_value", ignorenulls=True).over(w).alias("last_view_value"),
        F.last(
            F.when(F.col("side") == 0, F.col("ts")), ignorenulls=True
        ).over(w).alias("last_view_ts"),
    )
    return merged.filter(F.col("side") == 1).select(
        "user_id", "ts", "purchase_value", "last_view_value", "last_view_ts"
    )


_WINDOWS = [
    ("1996H1", "1996-01-01", "1996-07-01"),
    ("1996H2", "1996-07-01", "1997-01-01"),
    ("1999H1", "1999-01-01", "1999-07-01"),
    ("2001H1", "2001-01-01", "2001-07-01"),
]


@register(
    "join_interval_overlap",
    oracle=f"""
SELECT w_name, COUNT(*) AS n_orders
FROM orders
JOIN (VALUES {', '.join(f"('{n}', TIMESTAMP '{s}', TIMESTAMP '{e}')" for n, s, e in _WINDOWS)})
     w(w_name, w_start, w_end)
ON o_orderdate <= w_end AND o_orderdate + INTERVAL 30 DAY >= w_start
GROUP BY w_name
""",
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join: each order spans [o_orderdate, +30d], matched
    against literal report windows via a_start <= b_end AND b_start <=
    a_end. Same physical shape as join_theta_range: broadcast the literal
    window dim, single fact pass."""
    o = table(spark, sf_dir, "orders")
    dim = values_df(
        spark, _WINDOWS, "w_name string, w_start timestamp, w_end timestamp"
    )
    o_end = F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    cond = (F.col("o_orderdate") <= F.col("w_end")) & (o_end >= F.col("w_start"))
    return (
        o.join(F.broadcast(dim), cond)
        .groupBy("w_name")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@register(
    "join_skew_salted",
    oracle="""
SELECT d.flag_label,
       COUNT(*)                                          AS n_items,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
FROM lineitem
JOIN (VALUES ('A', 'returned'), ('N', 'kept'), ('R', 'refunded'))
     d(flag, flag_label)
ON l_returnflag = d.flag
GROUP BY d.flag_label
""",
)
def join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salt-replicated skew join — the manual defense when a SHUFFLE join
    key is pathologically hot (l_returnflag: 3 values over the whole
    fact). The fact side gets salt = pk % 16; the dim side is exploded
    16x so every (key, salt) bucket finds its dim row; the join key
    becomes (flag, salt) and the hot key's rows spread over 16 reducers
    instead of one straggler. Result is bitwise-equal to the plain join
    (oracle). Note the COMPLEMENT of agg_skew_salted: that key salts an
    aggregation, this one a join; at 100 TB the two compose (salted join
    -> partial agg on (key, salt) -> final merge). AQE's skew-join
    splitting automates this for sort-merge joins; the explicit shape is
    still required for broadcast-ineligible skewed hash joins and for
    deterministic bucket layouts."""
    li = table(spark, sf_dir, "lineitem")
    dim = values_df(
        spark,
        [("A", "returned"), ("N", "kept"), ("R", "refunded")],
        "flag string, flag_label string",
    )
    n_salt = 16
    dim_salted = dim.withColumn(
        "salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    fact_salted = li.withColumn("salt", F.pmod(F.col("l_orderkey"), F.lit(n_salt)))
    return (
        fact_salted.join(
            dim_salted,
            (F.col("l_returnflag") == F.col("flag")) & (fact_salted.salt == dim_salted.salt),
        )
        .groupBy("flag_label")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_quantity").cast("decimal(12,2)"))
            .cast("double")
            .alias("sum_qty"),
        )
    )


@register(
    "join_bucketed_colocated",
    oracle="""
SELECT o_orderstatus,
       COUNT(*) AS n_items,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderstatus
""",
)
def join_bucketed_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed co-located fact-fact join — the 100 TB technique that
    removes the join shuffle ENTIRELY: both tables are written
    ``bucketBy(8, orderkey)`` (+ sorted within buckets), so matching
    keys land in matching files and the sort-merge join reads bucket i
    against bucket i with NO Exchange on either side (asserted in
    tests/test_plans.py). This is what a nightly-loaded warehouse does
    once at write time to make every subsequent orders⋈lineitem free of
    its dominant cost; the write itself prices in the one shuffle the
    reads then never pay. Bucket pruning and the decimal-exact agg ride
    on top."""
    import os

    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    wh = os.path.join(repo, ".scratch", "bucketed", os.path.basename(sf_dir))
    suffix = os.path.basename(sf_dir).replace(".", "_")
    names = {t: f"bkt_{t}_{suffix}" for t in ("orders", "lineitem")}
    for t, (key, cols) in {
        "orders": ("o_orderkey", ["o_orderkey", "o_orderstatus"]),
        "lineitem": ("l_orderkey", ["l_orderkey", "l_quantity"]),
    }.items():
        # A metastore entry can outlive the gitignored .scratch data, and
        # a regenerated fixture under the same sf basename would silently
        # serve stale buckets: reuse only when the backing files exist AND
        # a fingerprint of the source parquet (size + mtime) still matches.
        src = os.path.join(sf_dir, f"{t}.parquet")
        st = os.stat(src)
        fingerprint = f"{st.st_size}:{st.st_mtime_ns}"
        marker = os.path.join(wh, t, "_SOURCE_FINGERPRINT")
        fresh = False
        if spark.catalog.tableExists(names[t]) and os.path.isfile(marker):
            with open(marker) as fh:
                fresh = fh.read().strip() == fingerprint
        if not fresh:
            spark.sql(f"DROP TABLE IF EXISTS {names[t]}")
            (
                table(spark, sf_dir, t)
                .select(*cols)
                .write.bucketBy(8, key)
                .sortBy(key)
                .option("path", os.path.join(wh, t))
                .mode("overwrite")
                .saveAsTable(names[t])
            )
            with open(marker, "w") as fh:
                fh.write(fingerprint)
    # At fixture scale the planner would BROADCAST tiny orders (hiding
    # the point); the merge hint pins the sort-merge strategy a real
    # fact-fact join gets on its own, and bucketing then removes both
    # Exchanges AND both Sorts (bucket files are pre-sorted on the key).
    o = spark.table(names["orders"]).hint("merge")
    li = spark.table(names["lineitem"])
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_quantity").cast("decimal(12,2)"))
            .cast("double")
            .alias("sum_qty"),
        )
    )


@register(
    "join_asof_tolerance",
    oracle="""
WITH l AS (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase'),
     r AS (SELECT user_id, ts AS r_ts, MAX_BY(value, event_id) AS r_value
           FROM events WHERE event_type = 'view' GROUP BY user_id, ts)
SELECT l.user_id, l.ts, l.value AS purchase_value,
       CASE WHEN r.r_ts >= l.ts - INTERVAL 1 DAY THEN r.r_value END
           AS last_view_value,
       CASE WHEN r.r_ts >= l.ts - INTERVAL 1 DAY THEN r.r_ts END
           AS last_view_ts
FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.r_ts
""",
)
def join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a staleness tolerance (pandas ``merge_asof
    (tolerance=...)`` / tick-data semantics): the latest prior right row
    counts only if it is at most 1 day old, otherwise the match is null.
    Same single-shuffle union+window plan as join_asof — the tolerance is
    a post-window null-out, NOT a second join or range predicate, so the
    scale shape is unchanged."""
    matched = QUERIES["join_asof"](spark, sf_dir)
    fresh = F.col("last_view_ts") >= F.col("ts") - F.expr("INTERVAL 1 DAY")
    return matched.select(
        "user_id",
        "ts",
        "purchase_value",
        F.when(fresh, F.col("last_view_value")).alias("last_view_value"),
        F.when(fresh, F.col("last_view_ts")).alias("last_view_ts"),
    )


@register(
    "join_range_bucketed",
    oracle=f"""
SELECT w_name, COUNT(*) AS n_orders
FROM orders
JOIN (VALUES {', '.join(f"('{n}', TIMESTAMP '{s}', TIMESTAMP '{e}')" for n, s, e in _WINDOWS)})
     w(w_name, w_start, w_end)
ON o_orderdate <= w_end AND o_orderdate + INTERVAL 30 DAY >= w_start
GROUP BY w_name
""",
)
def join_range_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed range join — the scale twin of join_interval_overlap:
    identical semantics (same oracle), different physical shape. Both
    interval sides explode into the calendar months they cover, meet in
    a HASH equi-join on the month bucket, exact-filter the overlap
    predicate, and dedup (o_orderkey, w_name) pairs that matched in
    several shared buckets.

    Why this exists: the broadcast nested-loop of join_interval_overlap
    is O(|facts| * |dims|) and only safe while the dim side is tiny. At
    100 TB with BOTH sides large (e.g. sessions x incidents), the
    bucketed form is the standard rewrite: cost becomes sum over buckets
    of |a_b| * |b_b| — data-local, shuffle-partitionable, AQE-skew-
    splittable — and completeness is structural (any overlapping pair
    shares at least one covered bucket). Bucket width tunes the
    duplication factor vs per-bucket fan-in; months here because the
    fixture windows span half-years while orders span 30 days."""
    o = table(spark, sf_dir, "orders")
    dim = values_df(
        spark, _WINDOWS, "w_name string, w_start timestamp, w_end timestamp"
    )
    # the overlap predicate is o_orderdate <= w_end INCLUSIVE, so the
    # window's covered-bucket list must include w_end's own month —
    # truncating to end - 1 day drops pairs whose only shared month is
    # the endpoint month (caught by the oracle at sf0.01: 1272 vs 1274)
    dim_b = dim.withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.date_trunc("month", "w_start"),
                F.date_trunc("month", "w_end"),
                F.expr("INTERVAL 1 MONTH"),
            )
        ),
    )
    o_end = F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    o_b = o.select("o_orderkey", "o_orderdate").withColumn(
        "bucket",
        F.explode(
            F.sequence(
                F.date_trunc("month", "o_orderdate"),
                F.date_trunc("month", o_end),
                F.expr("INTERVAL 1 MONTH"),
            )
        ),
    )
    o_end2 = F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
    pairs = (
        o_b.join(F.broadcast(dim_b), "bucket")
        .filter((F.col("o_orderdate") <= F.col("w_end")) & (o_end2 >= F.col("w_start")))
        .select("o_orderkey", "w_name")
        .distinct()
    )
    return pairs.groupBy("w_name").agg(F.count(F.lit(1)).alias("n_orders"))


@register(
    "join_anti_null_aware",
    oracle="""
SELECT l_returnflag, COUNT(*) AS n_rows
FROM (SELECT l_returnflag, NULLIF(l_suppkey, 7) AS msupp FROM lineitem) t
WHERE msupp NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY l_returnflag
""",
)
def join_anti_null_aware(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT IN with three-valued-logic NULL semantics -- the null-aware
    anti join.  NOT IN differs from a plain anti join in BOTH null
    directions: an outer NULL never satisfies NOT IN (NULL <> x is
    NULL, so suppkey-7 rows vanish here), and ANY inner NULL empties
    the whole result.  Expressed through spark.sql so Catalyst itself
    plans the null-awareness (a broadcast null-aware anti join /
    NAAJ when the inner side is broadcastable) instead of us
    hand-rewriting the semantics into filters.  At 100 TB the inner
    (blacklist) side is dimension-sized, so NAAJ broadcasts it; a
    shuffled NOT IN over two fact tables should be rewritten by the
    user into the explicit null-checked anti join."""
    table(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.expr("nullif(l_suppkey, 7)").alias("msupp")
    ).createOrReplaceTempView("naaj_lineitem")
    table(spark, sf_dir, "supplier").createOrReplaceTempView("naaj_supplier")
    return spark.sql(
        """
        SELECT l_returnflag, COUNT(*) AS n_rows
        FROM naaj_lineitem
        WHERE msupp NOT IN (SELECT s_suppkey FROM naaj_supplier
                            WHERE s_acctbal < 0)
        GROUP BY l_returnflag
        """
    )


@register(
    "join_asof_nearest",
    oracle="""
WITH clicks AS (SELECT DISTINCT user_id, ts FROM events WHERE event_type = 'click'),
errs AS (SELECT user_id, ts, event_id FROM events WHERE event_type = 'error'),
merged AS (
  SELECT user_id, ts, CAST(NULL AS BIGINT) AS event_id, 0 AS side, ts AS c_ts
  FROM clicks
  UNION ALL
  SELECT user_id, ts, event_id, 1 AS side, CAST(NULL AS TIMESTAMP) AS c_ts
  FROM errs
),
carried AS (
  SELECT user_id, ts, event_id, side,
    LAST_VALUE(c_ts IGNORE NULLS) OVER
      (PARTITION BY user_id ORDER BY ts, side
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS back_ts,
    LAST_VALUE(c_ts IGNORE NULLS) OVER
      (PARTITION BY user_id ORDER BY ts DESC, side DESC
       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fwd_ts
  FROM merged
)
SELECT user_id, ts, event_id,
  CASE WHEN back_ts IS NULL AND fwd_ts IS NULL THEN NULL
       WHEN fwd_ts IS NULL THEN back_ts
       WHEN back_ts IS NULL THEN fwd_ts
       WHEN ts - back_ts <= fwd_ts - ts THEN back_ts ELSE fwd_ts
  END AS nearest_click_ts,
  CASE WHEN back_ts IS NULL AND fwd_ts IS NULL THEN NULL
       WHEN fwd_ts IS NULL THEN 'back'
       WHEN back_ts IS NULL THEN 'fwd'
       WHEN ts - back_ts <= fwd_ts - ts THEN 'back' ELSE 'fwd'
  END AS direction
FROM carried WHERE side = 1
""",
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor as-of join (pandas merge_asof direction='nearest'):
    each error event matched to the CLOSEST click of the same user in
    either time direction, ties going to the earlier (backward) side.

    Same single-shuffle union+window shape as join_asof, run in BOTH
    directions over one user_id exchange: a backward carry (clicks sort
    before errors on ties, so a same-ts click is the backward candidate
    at distance 0) and a forward carry over the reversed order (side
    DESC excludes the same-ts click from the forward lane — it is
    already counted backward).  The nearest pick is then a pure per-row
    CASE — never a range self-join, which is quadratic per key.
    """
    ev = table(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select("user_id", "ts")
        .distinct()
        .select(
            "user_id",
            "ts",
            F.lit(None).cast("bigint").alias("event_id"),
            F.lit(0).alias("side"),
            F.col("ts").alias("c_ts"),
        )
    )
    errs = ev.filter(F.col("event_type") == "error").select(
        "user_id",
        "ts",
        "event_id",
        F.lit(1).alias("side"),
        F.lit(None).cast("timestamp").alias("c_ts"),
    )
    back_w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("ts"), F.asc("side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd_w = (
        Window.partitionBy("user_id")
        .orderBy(F.desc("ts"), F.desc("side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = clicks.unionByName(errs).select(
        "user_id",
        "ts",
        "event_id",
        "side",
        F.last("c_ts", ignorenulls=True).over(back_w).alias("back_ts"),
        F.last("c_ts", ignorenulls=True).over(fwd_w).alias("fwd_ts"),
    )
    d_back = F.unix_micros(F.col("ts")) - F.unix_micros(F.col("back_ts"))
    d_fwd = F.unix_micros(F.col("fwd_ts")) - F.unix_micros(F.col("ts"))
    both_null = F.col("back_ts").isNull() & F.col("fwd_ts").isNull()
    pick_back = (
        F.col("fwd_ts").isNull()
        | (F.col("back_ts").isNotNull() & (d_back <= d_fwd))
    )
    return carried.filter(F.col("side") == 1).select(
        "user_id",
        "ts",
        "event_id",
        F.when(both_null, F.lit(None).cast("timestamp"))
        .when(pick_back, F.col("back_ts"))
        .otherwise(F.col("fwd_ts"))
        .alias("nearest_click_ts"),
        F.when(both_null, F.lit(None).cast("string"))
        .when(pick_back, F.lit("back"))
        .otherwise(F.lit("fwd"))
        .alias("direction"),
    )


@register(
    "join_null_skew_split",
    oracle="""
WITH li AS (
  SELECT l_orderkey, l_linenumber, l_quantity,
         CASE WHEN l_orderkey % 13 = 0 THEN NULL ELSE l_orderkey END AS fk
  FROM lineitem
), j AS (
  SELECT li.fk, li.l_linenumber, li.l_quantity, o.o_totalprice
  FROM li LEFT JOIN orders o ON li.fk = o.o_orderkey
)
SELECT COUNT(*) AS n_rows,
       COUNT(*) FILTER (fk IS NULL) AS n_null_fk,
       COUNT(o_totalprice) AS n_matched,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
FROM j
""",
)
def join_null_skew_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-key skew defense for outer joins: every NULL foreign key
    hashes to the SAME shuffle partition, so a null-heavy fact (here a
    deterministic ~8% of rows nulled, standing in for optional FKs)
    sends its entire null population to one reducer in a plain left
    join.  The rewrite splits the fact BEFORE the shuffle: non-null
    rows join normally, null rows bypass the join entirely (a LEFT join
    can never match them) and union back with null-padded columns —
    bitwise-equal to the naive join, which is exactly what the oracle
    (a plain LEFT JOIN) verifies.

    At 100 TB this and salting (join_skew_salted) are the two skew
    levers; the null split is FREE (no fan-out factor) and should
    always be applied first when null rates are material.  The final
    aggregate is the equality witness — exact decimal sums over every
    column the join produces."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        F.when(F.col("l_orderkey") % 13 == 0, None)
        .otherwise(F.col("l_orderkey"))
        .alias("fk"),
    )
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    nn = (
        li.filter(F.col("fk").isNotNull())
        .join(o, F.col("fk") == F.col("o_orderkey"), "left")
        .select("fk", "l_linenumber", "l_quantity", "o_totalprice")
    )
    nul = li.filter(F.col("fk").isNull()).select(
        "fk",
        "l_linenumber",
        "l_quantity",
        F.lit(None).cast("double").alias("o_totalprice"),
    )
    j = nn.unionByName(nul)
    return j.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_if(F.col("fk").isNull()).alias("n_null_fk"),
        F.count("o_totalprice").alias("n_matched"),
        F.sum(F.col("l_quantity").cast("decimal(12,2)"))
        .cast("double")
        .alias("sum_qty"),
        F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
        .cast("double")
        .alias("sum_price"),
    )


@register(
    "join_bloom_prefilter",
    oracle="""
SELECT l_returnflag,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
         AS sum_price
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE o_orderpriority = '1-URGENT'
GROUP BY l_returnflag
""",
)
def join_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime bloom-filter semi-join reduction: a fact⋈dim join where
    the dim side carries a selective predicate the fact side cannot
    see statically.  Catalyst's InjectRuntimeFilter builds a bloom
    filter from the FILTERED dim keys (bloom_filter_agg over
    xxhash64(o_orderkey)) and pushes might_contain(l_orderkey) into
    the fact scan — ~80% of fact rows are dropped BEFORE the shuffle
    instead of after the join.  At 100 TB this is the difference
    between shuffling the whole fact and shuffling the fifth that can
    match; unlike dynamic partition pruning it needs NO partition
    layout, so it composes with any storage arrangement.

    The shuffle_hash hint keeps the join a shuffle join (broadcast
    joins don't need a bloom — the full dim hash table IS the
    filter).  Injection thresholds are size-based
    (spark.sql.optimizer.runtime.bloomFilter.*: creation side below
    10MB plan size, application side above 10GB scan by default), so
    at bench scale the plan is asserted in tests/test_plans.py with
    the application-side threshold lowered; at production scale the
    defaults fire on their own.  The oracle is the plain join — the
    bloom is a pure prefilter, bitwise-invisible in the result."""
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag"
    )
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    return (
        li.join(o.hint("shuffle_hash"), li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_price"),
        )
    )


def _spatial_oracle() -> str:
    from ..functions.scalar import GEO_POINTS_SQL

    return f"""
WITH pts AS (
  SELECT c_custkey,
         {GEO_POINTS_SQL}
  FROM customer
),
{_SPATIAL_TAIL}
"""


_SPATIAL_TAIL = """
zones AS (
  SELECT z AS zone_id,
         -80.0 + z * 15 AS lat_lo, -80.0 + z * 15 + 20 AS lat_hi,
         -160.0 + z * 35 AS lon_lo, -160.0 + z * 35 + 50 AS lon_hi
  FROM (SELECT unnest(range(0, 8)) AS z)
)
SELECT zone_id,
       COUNT(*) AS n_points,
       COUNT(DISTINCT CAST(FLOOR(lat / 5) AS BIGINT) * 1000
             + CAST(FLOOR(lon / 5) AS BIGINT)) AS n_cells,
       MIN(c_custkey) AS first_cust
FROM pts JOIN zones
  ON lat >= lat_lo AND lat < lat_hi AND lon >= lon_lo AND lon < lon_hi
GROUP BY zone_id"""


@register("join_spatial_grid", oracle=_spatial_oracle())
def join_spatial_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grid-bucketed spatial join — the scalable point-in-region
    shape (PostGIS ST_Contains + GIST re-expressed for a shuffle
    engine): assigning points to zones with a raw theta join is a
    nested-loop over |points| x |zones|; instead each zone is
    EXPLODED into the fixed 5-degree grid cells its bbox covers
    (bounded: area/cell-size cells per zone), points carry their own
    cell id, and the join becomes a broadcast HASH join on the cell
    key followed by the exact bbox check on the survivors — candidate
    pairs are cell-local, never all-pairs.  The same fn_geo
    coordinate synthesis and grid constant keep the two geo keys
    consistent.

    The oracle runs the NAIVE theta join — the grid decomposition is
    a pure candidate filter (cells covering a zone are a superset of
    its points), so the hash-join plan must reproduce the
    nested-loop result bit-for-bit, which is what the gate checks.
    At 100 TB: points shuffle nowhere (zone-cells broadcast), the
    per-cell fan-out is the only amplification, and the exact check
    is per-row expression work — the standard spatial-join recipe
    (grid/kd bucketing + refine)."""
    from ..functions.scalar import geo_lat_lon

    c = table(spark, sf_dir, "customer")
    lat, lon = geo_lat_lon()
    pts = c.select(
        "c_custkey",
        lat.alias("lat"),
        lon.alias("lon"),
    ).withColumns(
        {
            "cl": F.floor(F.col("lat") / 5).cast("bigint"),
            "cn": F.floor(F.col("lon") / 5).cast("bigint"),
        }
    )
    zones = spark.range(8).select(
        F.col("id").cast("int").alias("zone_id"),
        (-80.0 + F.col("id") * 15).alias("lat_lo"),
        (-80.0 + F.col("id") * 15 + 20).alias("lat_hi"),
        (-160.0 + F.col("id") * 35).alias("lon_lo"),
        (-160.0 + F.col("id") * 35 + 50).alias("lon_hi"),
    )
    zone_cells = zones.select(
        "*",
        F.explode(
            F.expr(
                "sequence(CAST(floor(lat_lo / 5) AS BIGINT),"
                " CAST(floor((lat_hi - 0.000001) / 5) AS BIGINT))"
            )
        ).alias("cl"),
    ).select(
        "*",
        F.explode(
            F.expr(
                "sequence(CAST(floor(lon_lo / 5) AS BIGINT),"
                " CAST(floor((lon_hi - 0.000001) / 5) AS BIGINT))"
            )
        ).alias("cn"),
    )
    cand = pts.join(F.broadcast(zone_cells), ["cl", "cn"])
    exact = cand.filter(
        (F.col("lat") >= F.col("lat_lo"))
        & (F.col("lat") < F.col("lat_hi"))
        & (F.col("lon") >= F.col("lon_lo"))
        & (F.col("lon") < F.col("lon_hi"))
    )
    return exact.groupBy("zone_id").agg(
        F.count(F.lit(1)).alias("n_points"),
        F.countDistinct(F.col("cl") * 1000 + F.col("cn")).alias("n_cells"),
        F.min("c_custkey").alias("first_cust"),
    )
