"""Aggregation operators (SURVEY.md section 2.E).

Reference parity: the reference class delegates all aggregation to
ClickHouse SQL over the replicated tables (SURVEY.md section 3.1 — no
citable file:line, empty snapshot; semantics tagged [P:high/med] there).
Each key below is the Spark-native equivalent of a ClickHouse aggregate
surface: sum/avg/min/max/count, GROUP BY + HAVING, uniqExact/uniq (count
distinct / approx), GROUPING SETS/ROLLUP/CUBE, quantiles, stats moments,
argMin/argMax -> min_by/max_by, groupArray -> collect_list, countIf ->
count_if.

Scale notes: every aggregate here is a partial+final hash aggregate in
Spark (map-side combine before the shuffle) — the 100 TB plan is one
shuffle keyed by the GROUP BY columns, skew-safe under AQE.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..session import table
from ._util import D4, D8, davg, dec, dsum, sql_davg, sql_dsum

_Q1_CUTOFF = "1998-09-02 00:00:00"


def flagship_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped flagship: filter -> groupBy -> 8 aggregates.

    Physical plan at scale: parquet scan with l_shipdate predicate pushed
    to row groups + only 7 columns read -> partial HashAggregate ->
    shuffle on (l_returnflag, l_linestatus) [tiny: <=6 groups] -> final
    HashAggregate. One shuffle, whole-stage codegen end to end.
    """
    li = table(spark, sf_dir, "lineitem")
    # D8 x D4 keeps both product chains at precision <= 18 (compact
    # 64-bit decimals; see _util width policy)
    price = dec("l_extendedprice", D8)
    one = F.lit(1).cast(D4)
    disc_price = price * (one - dec("l_discount", D4))
    charge = disc_price * (one + dec("l_tax", D4))
    return (
        li.filter(F.col("l_shipdate") <= F.lit(_Q1_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            # ROUND the exact decimal sums to 2dp BEFORE the double cast:
            # the scale-6 product sums pass 2^53/1e6 units around sf1, and
            # DuckDB's two-step int128->double->/10^6 conversion can land
            # one ulp off Spark's BigDecimal.doubleValue() there (caught by
            # the r7 sf1 hash sweep).  At 2dp the scaled integer stays
            # double-exact until ~9e13 currency units.
            F.round(F.sum(disc_price), 2).cast("double").alias("sum_disc_price"),
            F.round(F.sum(charge), 2).cast("double").alias("sum_charge"),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc", D4),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_Q1_ORACLE = f"""
SELECT l_returnflag, l_linestatus,
       {sql_dsum('l_quantity', 'sum_qty')},
       {sql_dsum('l_extendedprice', 'sum_base_price')},
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(8,2))
                * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE)
           AS sum_disc_price,
       CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(8,2))
                * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
                * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))), 2) AS DOUBLE)
           AS sum_charge,
       {sql_davg('l_quantity', 'avg_qty')},
       {sql_davg('l_extendedprice', 'avg_price')},
       {sql_davg('l_discount', 'avg_disc', 'DECIMAL(4,2)')},
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{_Q1_CUTOFF}'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

register("agg_groupby_multi", oracle=_Q1_ORACLE)(flagship_q1)


# --- 2.E remaining aggregate surface ----------------------------------------


@register(
    "agg_hash_global",
    oracle=f"""
SELECT COUNT(*) AS n,
       {sql_dsum('l_quantity', 'sum_qty')},
       {sql_davg('l_extendedprice', 'avg_price')},
       MIN(l_quantity) AS min_qty,
       MAX(l_quantity) AS max_qty,
       MIN(l_shipdate) AS first_ship,
       MAX(l_shipdate) AS last_ship
FROM lineitem
""",
)
def agg_hash_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ungrouped aggregate — partial aggregation on every partition then a
    single-row final combine (no keyed shuffle at any scale)."""
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n"),
        dsum("l_quantity", "sum_qty"),
        davg("l_extendedprice", "avg_price"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.min("l_shipdate").alias("first_ship"),
        F.max("l_shipdate").alias("last_ship"),
    )


@register(
    "agg_count_distinct",
    oracle="""
SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_custs, COUNT(*) AS n_orders
FROM orders GROUP BY o_orderstatus
""",
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact NDV per group (ClickHouse uniqExact). Spark expands distinct
    aggregates into a two-phase plan (partial distinct before the shuffle)."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_custs"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "agg_approx_distinct",
    oracle="""
SELECT event_type,
       COUNT(DISTINCT user_id) AS exact_users,
       COUNT(*) AS n,
       TRUE AS approx_within_10pct
FROM events GROUP BY event_type
""",
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate NDV (ClickHouse uniq/HLL). At 100 TB this is THE way to
    count distincts: fixed-size sketch per partition, no distinct shuffle.

    HLL estimates are engine-specific, so the estimate itself cannot be
    hash-matched; instead the query emits the exact NDV alongside and a
    boolean asserting the HLL++ sketch (rsd=2%) landed within 10% of it —
    deterministic for a fixed input set (the sketch is order-insensitive),
    and the oracle pins the boolean to TRUE."""
    ev = table(spark, sf_dir, "events")
    approx = F.approx_count_distinct("user_id", 0.02)
    exact = F.countDistinct("user_id")
    return ev.groupBy("event_type").agg(
        exact.alias("exact_users"),
        F.count(F.lit(1)).alias("n"),
        (F.abs(approx - exact) <= 0.10 * exact).alias("approx_within_10pct"),
    )


@register(
    "agg_grouping_sets",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       GROUPING(l_returnflag) AS g_flag, GROUPING(l_linestatus) AS g_status,
       {sql_dsum('l_quantity', 'sum_qty')}, COUNT(*) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
""",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return (
        li.groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.grouping("l_returnflag").alias("g_flag"),
            F.grouping("l_linestatus").alias("g_status"),
            dsum("l_quantity", "sum_qty"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "agg_rollup",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {sql_dsum('l_extendedprice', 'sum_price')}, COUNT(*) AS n
FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        dsum("l_extendedprice", "sum_price"), F.count(F.lit(1)).alias("n")
    )


@register(
    "agg_cube",
    oracle=f"""
SELECT c_mktsegment, c_nationkey,
       {sql_dsum('c_acctbal', 'sum_bal')}, COUNT(*) AS n
FROM customer GROUP BY CUBE (c_mktsegment, c_nationkey)
""",
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    return c.cube("c_mktsegment", "c_nationkey").agg(
        dsum("c_acctbal", "sum_bal"), F.count(F.lit(1)).alias("n")
    )


@register(
    "agg_percentiles",
    oracle="""
SELECT o_orderstatus,
       MEDIAN(o_totalprice) AS med_price,
       QUANTILE_CONT(o_totalprice, 0.25) AS p25,
       QUANTILE_CONT(o_totalprice, 0.90) AS p90
FROM orders GROUP BY o_orderstatus
""",
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact continuous quantiles (both engines: linear interpolation at
    p*(n-1)). Exact percentile requires a per-group sort — at 100 TB swap
    in approx_percentile (t-digest sketch) unless exactness is contractual."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.median("o_totalprice").alias("med_price"),
        F.percentile("o_totalprice", F.lit(0.25)).alias("p25"),
        F.percentile("o_totalprice", F.lit(0.90)).alias("p90"),
    )


_STATS_ORACLE = """
WITH s AS (
  SELECT l_returnflag,
         COUNT(*) AS n,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(8,2))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(8,2)) * CAST(l_extendedprice AS DECIMAL(8,2))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(l_quantity AS DECIMAL(4,2))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(l_quantity AS DECIMAL(4,2)) * CAST(l_quantity AS DECIMAL(4,2))) AS DOUBLE) AS syy,
         CAST(SUM(CAST(l_extendedprice AS DECIMAL(8,2)) * CAST(l_quantity AS DECIMAL(4,2))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(l_quantity AS DECIMAL(4,2)) * CAST(l_quantity AS DECIMAL(4,2)) * CAST(l_quantity AS DECIMAL(4,2))) AS DOUBLE) AS syyy
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       ROUND((sxx - sx*sx/n) / (n - 1), 2) AS var_price,
       ROUND(SQRT((sxx - sx*sx/n) / (n - 1)), 4) AS stddev_price,
       ROUND((sxy - sx*sy/n) / (n - 1), 2) AS covar_price_qty,
       ROUND((sxy - sx*sy/n) / (SQRT(sxx - sx*sx/n) * SQRT(syy - sy*sy/n)), 6) AS corr_price_qty,
       ROUND(((syyy - 3*(sy/n)*syy + 2*n*(sy/n)*(sy/n)*(sy/n)) / n)
           / (((syy - sy*sy/n) / n) * SQRT((syy - sy*sy/n) / n)), 6) AS skew_qty
FROM s
"""


@register("agg_stats", oracle=_STATS_ORACLE)
def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moment statistics (variance/stddev/covar/corr/skewness) computed from
    exact decimal power sums, finished in double — single-pass, one shuffle.

    The power sums are decimal-exact in both engines; the derived moments
    are double expression chains whose last-ulp can drift across engines
    (FMA / reassociation), so every derived stat is rounded to a precision
    far coarser than the drift but far finer than the signal: absolute-
    large stats (var/covar ~1e8) to 2 decimals, stddev (~1e4) to 4,
    O(1) stats (corr/skew) to 6. Oracle applies identical ROUNDs.
    """
    li = table(spark, sf_dir, "lineitem")
    # narrow operands -> every power-sum product stays compact (<= 18)
    x = dec("l_extendedprice", D8)
    y = dec("l_quantity", D4)
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).cast("double").alias("sx"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(y * y).cast("double").alias("syy"),
        F.sum(x * y).cast("double").alias("sxy"),
        F.sum(y * y * y).cast("double").alias("syyy"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    sy, syy, sxy, syyy = F.col("sy"), F.col("syy"), F.col("sxy"), F.col("syyy")
    mean_y = sy / n
    var_price = (sxx - sx * sx / n) / (n - 1)
    return s.select(
        "l_returnflag",
        "n",
        F.round(var_price, 2).alias("var_price"),
        F.round(F.sqrt(var_price), 4).alias("stddev_price"),
        F.round((sxy - sx * sy / n) / (n - 1), 2).alias("covar_price_qty"),
        F.round(
            (sxy - sx * sy / n)
            / (F.sqrt(sxx - sx * sx / n) * F.sqrt(syy - sy * sy / n)),
            6,
        ).alias("corr_price_qty"),
        F.round(
            ((syyy - 3 * mean_y * syy + 2 * n * mean_y * mean_y * mean_y) / n)
            / (((syy - sy * sy / n) / n) * F.sqrt((syy - sy * sy / n) / n)),
            6,
        ).alias("skew_qty"),
    )


@register(
    "agg_minmax_by",
    oracle="""
SELECT o_orderstatus,
       MIN_BY(o_custkey, o_orderkey) AS first_cust,
       MAX_BY(o_custkey, o_orderkey) AS last_cust,
       MAX_BY(o_orderkey, o_totalprice + o_orderkey * 1e-9) AS priciest_order
FROM orders GROUP BY o_orderstatus
""",
)
def agg_minmax_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """argMin/argMax (ClickHouse argMin/argMax). Ordering values are made
    unique (o_orderkey, or price epsilon-salted by unique key) — min_by on a
    tied ordering value is nondeterministic in any engine."""
    o = table(spark, sf_dir, "orders")
    uniq_price = F.col("o_totalprice") + F.col("o_orderkey") * F.lit(1e-9)
    return o.groupBy("o_orderstatus").agg(
        F.min_by("o_custkey", "o_orderkey").alias("first_cust"),
        F.max_by("o_custkey", "o_orderkey").alias("last_cust"),
        F.max_by("o_orderkey", uniq_price).alias("priciest_order"),
    )


@register(
    "agg_collect",
    oracle="""
SELECT n_regionkey,
       STRING_AGG(n_name, ',' ORDER BY n_name) AS nations_csv,
       COUNT(*) AS n_nations
FROM nation GROUP BY n_regionkey
""",
)
def agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group array/string aggregation (ClickHouse groupArray).
    collect_list order is partition-dependent -> always array_sort; the
    array is then serialized (concat_ws) because the correctness gate's
    value-hasher only handles scalar columns."""
    n = table(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.concat_ws(",", F.array_sort(F.collect_list("n_name"))).alias("nations_csv"),
        F.count(F.lit(1)).alias("n_nations"),
    )


@register(
    "agg_conditional",
    oracle="""
SELECT user_id,
       COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchases,
       COUNT(*) FILTER (WHERE event_type = 'error') AS n_errors,
       BOOL_AND(value > 1.0) AS all_nontrivial,
       BOOL_OR(value > 400.0) AS any_large
FROM events GROUP BY user_id
""",
)
def agg_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """countIf / boolean aggregates (ClickHouse countIf/min&max over UInt8)."""
    ev = table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.count_if(F.col("event_type") == "purchase").alias("n_purchases"),
        F.count_if(F.col("event_type") == "error").alias("n_errors"),
        F.bool_and(F.col("value") > 1.0).alias("all_nontrivial"),
        F.bool_or(F.col("value") > 400.0).alias("any_large"),
    )


@register(
    "agg_distinct_rows",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
)
def agg_distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus"
    ).distinct()


@register(
    "agg_heavy_hitters",
    oracle="""
WITH corpus AS (
  SELECT event_type FROM events
  UNION ALL
  SELECT event_type FROM events, (SELECT unnest(range(3)) AS i) r
  WHERE event_type = 'signup' AND user_id % 2 = 0
),
tot AS (SELECT COUNT(*) AS total FROM corpus)
SELECT event_type, COUNT(*) AS n_occurrences,
       ROUND(COUNT(*) / ANY_VALUE(tot.total), 6) AS share
FROM corpus, tot
GROUP BY event_type
HAVING COUNT(*) >= 0.30 * ANY_VALUE(tot.total)
""",
)
def agg_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact frequent-items / heavy hitters (ClickHouse ``topK`` without
    the sketch error): keys whose frequency exceeds a support fraction of
    ALL rows. The fixture's categorical columns are deliberately uniform,
    so a re-delivery storm is injected first (every even-user signup
    re-appended 3x — the at-least-once burst a CDC consumer actually
    sees), making 'signup' the one key above the 30% support line at
    every scale factor.

    Two aggregates total: one map-side-combinable groupBy(key) whose
    output is |distinct keys| rows, and one scalar total broadcast into
    the HAVING — no second scan of the input, no sort. At 100 TB with a
    high-cardinality key, the same plan holds because the support filter
    is applied AFTER the partial-agg shuffle, whose volume is already
    keys-not-rows; if even that overflows, the standard refinement is a
    count-min pre-filter before the exact pass — the exact pass here is
    the verifier of that refinement."""
    ev = table(spark, sf_dir, "events").select("event_type", "user_id")
    storm = (
        ev.filter((F.col("event_type") == "signup") & (F.col("user_id") % 2 == 0))
        .withColumn("i", F.explode(F.array(*[F.lit(i) for i in range(3)])))
        .drop("i")
    )
    corpus = ev.unionByName(storm).select("event_type")
    total = F.broadcast(corpus.agg(F.count(F.lit(1)).alias("total")))
    return (
        corpus.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .crossJoin(total)
        .filter(F.col("n_occurrences") >= 0.30 * F.col("total"))
        .select(
            "event_type",
            "n_occurrences",
            F.round(F.col("n_occurrences") / F.col("total"), 6).alias("share"),
        )
    )


@register(
    "agg_countmin_prefilter",
    oracle="""
WITH base AS (
  SELECT unnest(string_split(text, ' ')) AS tok FROM documents
), corpus AS (
  SELECT tok FROM base WHERE tok <> ''
  UNION ALL
  SELECT tok FROM base, (SELECT unnest(range(5)) AS i) r
  WHERE tok LIKE 's%'
), tot AS (SELECT COUNT(*) AS total FROM corpus)
SELECT tok, COUNT(*) AS n_occ,
       ROUND(COUNT(*) / ANY_VALUE(tot.total), 6) AS share
FROM corpus, tot
GROUP BY tok
HAVING COUNT(*) >= 0.05 * ANY_VALUE(tot.total)
""",
)
def agg_countmin_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via a COUNT-MIN SKETCH pre-filter: pass 1 builds a
    d=4 x w=32 counter sketch (each token increments one counter per
    hash row; map-side combine collapses a task's increments to <=128
    rows before the shuffle, so the sketch pass shuffles O(d*w) bytes
    per task regardless of corpus size). Candidates are the distinct
    keys whose MIN over the d counter estimates clears the support
    threshold phi*N -- since every estimate >= the true count, the
    candidate set is a SUPERSET of the true heavy hitters.  Pass 2
    exact-counts ONLY candidate keys (semi-join pre-filter), so the
    keyed shuffle carries just the candidates, and the final exact
    HAVING makes the output independent of the sketch's hash choice --
    which is why Spark-internal xxhash64 is fine here and the oracle is
    the plain exact query.  The corpus manufactures skew (s-tokens
    replicated 6x, same device as agg_heavy_hitters) because the
    synthetic fixture's token frequencies are near-uniform."""
    docs = table(spark, sf_dir, "documents")
    base = docs.select(F.explode(F.split("text", " ")).alias("tok")).filter(
        F.col("tok") != ""
    )
    boost = (
        base.filter(F.col("tok").startswith("s"))
        .withColumn("i", F.explode(F.sequence(F.lit(1), F.lit(5))))
        .drop("i")
    )
    corpus = base.unionAll(boost)
    tot = corpus.agg(F.count(F.lit(1)).alias("total"))

    d_seeds = F.array(*[F.lit(j) for j in range(4)])
    sketch = (
        corpus.select("tok", F.explode(d_seeds).alias("seed"))
        .groupBy(
            "seed", F.pmod(F.hash("seed", "tok"), F.lit(32)).alias("bucket")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    est = (
        corpus.select("tok")
        .distinct()
        .select("tok", F.explode(d_seeds).alias("seed"))
        .withColumn("bucket", F.pmod(F.hash("seed", "tok"), F.lit(32)))
        .join(F.broadcast(sketch), ["seed", "bucket"])
        .groupBy("tok")
        .agg(F.min("cnt").alias("est"))
    )
    candidates = (
        est.crossJoin(F.broadcast(tot))
        .filter(F.col("est") >= 0.05 * F.col("total"))
        .select("tok")
    )
    return (
        corpus.join(F.broadcast(candidates), "tok", "left_semi")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n_occ"))
        .crossJoin(F.broadcast(tot))
        .filter(F.col("n_occ") >= 0.05 * F.col("total"))
        .select(
            "tok",
            "n_occ",
            F.round(F.col("n_occ") / F.col("total"), 6).alias("share"),
        )
    )


@register(
    "agg_weighted_avg",
    oracle="""
SELECT l_returnflag,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(8,2))
                * CAST(l_quantity AS DECIMAL(4,2))) AS DOUBLE)
         / CAST(SUM(CAST(l_quantity AS DECIMAL(4,2))) AS DOUBLE)
         AS wavg_price,
       COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag
""",
)
def agg_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted average (ClickHouse avgWeighted): quantity-weighted
    mean price per return flag.  Both the weighted sum and the weight
    sum are EXACT decimals cast to double only at the final divide, so
    the one IEEE division runs on identical operands in both engines —
    the naive double SUM(price*qty)/SUM(qty) would drift by partition
    order.  Same single-shuffle partial+final shape as any plain
    aggregate (two sums ride one groupBy)."""
    li = table(spark, sf_dir, "lineitem")
    wsum = F.sum(dec("l_extendedprice", D8) * dec("l_quantity", D4)).cast(
        "double"
    )
    qsum = F.sum(dec("l_quantity", D4)).cast("double")
    return (
        li.groupBy("l_returnflag")
        .agg(
            (wsum / qsum).alias("wavg_price"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "agg_bool_family",
    oracle="""
SELECT o_orderstatus,
       CAST(bool_and(o_totalprice > 1000) AS INT)         AS all_over_1k,
       CAST(bool_or(o_orderpriority = '1-URGENT') AS INT) AS any_urgent,
       CAST(count_if(o_totalprice > 100000) AS BIGINT)    AS n_large,
       CAST(bool_and(o_orderdate >= TIMESTAMP '1995-01-01') AS INT)
           AS all_in_range
FROM orders
GROUP BY o_orderstatus
""",
)
def agg_bool_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregate family (every/any/countIf — ClickHouse
    minIf/countIf parity): bool_and / bool_or / count_if over grouped
    predicates.  All map-combinable single-bit/counter state — the
    cheapest aggregates there are at any scale.

    Gate surface: the boolean aggregate results are cast to INT (1/0)
    on both engines — raw BOOLEAN columns hash-drift in the driver's
    pandas canonicalizer (CORRECTNESS_r04 evidence), integers do not."""
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.bool_and(F.col("o_totalprice") > 1000).cast("int").alias("all_over_1k"),
        F.bool_or(F.col("o_orderpriority") == "1-URGENT")
        .cast("int")
        .alias("any_urgent"),
        F.count_if(F.col("o_totalprice") > 100000).alias("n_large"),
        F.bool_and(
            F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp")
        )
        .cast("int")
        .alias("all_in_range"),
    )


@register(
    "agg_array_topk",
    oracle="""
WITH ranked AS (
  SELECT c_mktsegment, c_custkey, c_acctbal,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                            ORDER BY c_acctbal DESC, c_custkey) AS rn
  FROM customer
)
SELECT c_mktsegment,
       array_to_string(list(c_custkey ORDER BY rn), ',') AS top_custkeys,
       array_to_string(list(CAST(CAST(c_acctbal AS DECIMAL(12,2)) AS VARCHAR)
                            ORDER BY rn), ',') AS top_acctbals
FROM ranked WHERE rn <= 5
GROUP BY c_mktsegment
""",
)
def agg_array_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k collected as ordered per-group lists (ClickHouse
    groupArray(5)(...ORDER BY...) parity) — the denormalized leaderboard
    shape dashboards read as one row per group.

    Scale-correct construction: rank-filter FIRST (WindowGroupLimit —
    per-partition k-heaps, k rows per group cross the shuffle), THEN
    collect the <=k survivors; a collect_list-then-slice would buffer
    whole groups in executor memory.  Lists are built by sorting on the
    precomputed rank, so element order is total and cross-engine.

    Gate surface: the ordered lists are emitted as comma-joined STRINGS
    (acctbal stringified via exact DECIMAL(12,2), 2dp repr on both
    engines) — the driver's pandas canonicalizer cannot hash ARRAY
    columns (CORRECTNESS_r04 `unhashable type: 'list'`)."""
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        c.select("c_mktsegment", "c_custkey", "c_acctbal")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .groupBy("c_mktsegment")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("rn", "c_custkey", "c_acctbal"))
            ).alias("ranked")
        )
        .select(
            "c_mktsegment",
            F.expr(
                "array_join(transform(ranked,"
                " x -> CAST(x.c_custkey AS STRING)), ',')"
            ).alias("top_custkeys"),
            F.expr(
                "array_join(transform(ranked,"
                " x -> CAST(CAST(x.c_acctbal AS DECIMAL(12,2)) AS STRING)),"
                " ',')"
            ).alias("top_acctbals"),
        )
    )


@register(
    "agg_map_sum",
    oracle="""
WITH per AS (
  SELECT user_id, event_type, SUM(CAST(value AS DECIMAL(12,2))) AS v
  FROM events GROUP BY user_id, event_type)
SELECT user_id,
       array_to_string(list(event_type ORDER BY event_type), ',') AS keys,
       array_to_string(list(CAST(CAST(v AS DECIMAL(14,2)) AS VARCHAR)
                            ORDER BY event_type), ',') AS vals
FROM per GROUP BY user_id
""",
)
def agg_map_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse sumMap parity: per user, a keyed value map summed BY
    KEY (event_type -> total value), surfaced as two parallel key-sorted
    lists — the hash-checkable rendering of a map column (map key order
    is engine-arbitrary; sorted parallel lists are total).

    Two-stage shape: keyed partial sums first (map-combined, the state
    a sumMap rollup table stores), then one collect per user over the
    ALREADY-REDUCED |users x types| set — never collect raw rows.

    Gate surface: the parallel lists are emitted as comma-joined
    STRINGS, with values stringified from the EXACT decimal sums
    (fixed 2dp repr on both engines) before any double ever appears —
    the driver's pandas canonicalizer cannot hash ARRAY columns
    (CORRECTNESS_r04 `unhashable type: 'list'`)."""
    per = (
        table(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.sum(dec("value")).alias("v"))
    )
    return (
        per.groupBy("user_id")
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        "event_type",
                        F.col("v").cast("decimal(14,2)").alias("v"),
                    )
                )
            ).alias("kv")
        )
        .select(
            "user_id",
            F.expr("array_join(transform(kv, x -> x.event_type), ',')").alias(
                "keys"
            ),
            F.expr(
                "array_join(transform(kv, x -> CAST(x.v AS STRING)), ',')"
            ).alias("vals"),
        )
    )


@register(
    "agg_mergeable_moments",
    oracle="""
WITH shard AS (
  SELECT event_type, user_id % 8 AS shard,
         COUNT(*) AS n,
         SUM(CAST(value AS DECIMAL(18,6))) AS s,
         SUM(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6))) AS ss
  FROM events GROUP BY event_type, user_id % 8
),
merged AS (
  SELECT event_type,
         COUNT(*) AS n_shards,
         CAST(SUM(n) AS BIGINT) AS n,
         CAST(SUM(s) AS DOUBLE) AS sx,
         CAST(SUM(ss) AS DOUBLE) AS sxx
  FROM shard GROUP BY event_type
)
SELECT event_type, n_shards, n,
       CAST(FLOOR(sx / n * 1000000) AS BIGINT) AS mean_e6,
       CAST(FLOOR((sxx - sx * sx / n) / n * 1000000) AS BIGINT) AS var_pop_e6
FROM merged
""",
)
def agg_mergeable_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable moment sketches — the rollup-table pattern for
    mean/variance (ClickHouse ``avgState``/``varPopState`` +
    ``-Merge`` parity, the non-distinct sibling of agg_hll_mergeable):
    per-(group, shard) partial states (n, Σx, Σx²) built independently,
    then MERGED by plain addition into exact global moments — how a
    100 TB pipeline stores per-day/per-partition stats that roll up to
    any coarser grain without re-scanning raw data.

    Determinism: the partial states are EXACT decimals (the agg_stats
    power-sum convention), so shard merge order cannot perturb them —
    the only doubles are the final derived mean/variance, and those are
    surfaced as FLOOR(x*1e6) micro-unit BIGINTs computed from the same
    IEEE expression on both engines (raw/rounded DOUBLE columns
    hash-drift in the driver canonicalizer — CORRECTNESS_r03/r04
    evidence).  Shape: two keyed aggregations
    (map-side combined), the second over |groups|x8 rows — merge cost
    independent of raw data size, which is the entire point."""
    ev = table(spark, sf_dir, "events")
    x = dec("value", "decimal(18,6)")
    shard = ev.groupBy(
        "event_type", (F.col("user_id") % 8).alias("shard")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("s"),
        F.sum(x * x).alias("ss"),
    )
    merged = shard.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_shards"),
        F.sum("n").alias("n"),
        F.sum("s").cast("double").alias("sx"),
        F.sum("ss").cast("double").alias("sxx"),
    )
    n, sx, sxx = F.col("n"), F.col("sx"), F.col("sxx")
    return merged.select(
        "event_type",
        "n_shards",
        "n",
        F.floor(sx / n * F.lit(1000000)).alias("mean_e6"),
        F.floor((sxx - sx * sx / n) / n * F.lit(1000000)).alias("var_pop_e6"),
    )


@register(
    "agg_weighted_percentile",
    oracle="""
WITH w AS (
  SELECT l_returnflag AS flag,
         CAST(l_extendedprice AS DECIMAL(12,2)) AS price,
         CAST(l_quantity AS DECIMAL(12,2)) AS qty
  FROM lineitem
),
g AS (
  SELECT flag, price, SUM(qty) AS wt
  FROM w GROUP BY flag, price
),
c AS (
  SELECT flag, price, wt,
         SUM(wt) OVER (PARTITION BY flag ORDER BY price) AS cum,
         SUM(wt) OVER (PARTITION BY flag) AS total
  FROM g
)
SELECT flag,
       CAST(MIN(CASE WHEN cum >= total * 0.50 THEN price END) AS DOUBLE)
         AS p50_weighted,
       CAST(MIN(CASE WHEN cum >= total * 0.90 THEN price END) AS DOUBLE)
         AS p90_weighted,
       CAST(MIN(CASE WHEN cum >= total * 0.99 THEN price END) AS DOUBLE)
         AS p99_weighted
FROM c GROUP BY flag
""",
)
def agg_weighted_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted exact percentiles (ClickHouse ``quantileExactWeighted``
    parity): the p50/p90/p99 of price where each row counts with weight
    = quantity — the shape behind revenue-weighted latency/price
    analytics, where unweighted quantiles mislead.  Selection rule: the
    smallest value whose CUMULATIVE weight reaches q x total (the
    standard weighted-quantile definition; reduces to nearest-rank for
    unit weights).

    Determinism: weights and values stay exact decimals through the
    cumulative sums; the quantile thresholds (total x q) are exact
    decimal x literal products, so the boundary comparison can never
    1-ULP-flip between engines; the selected price converts to double
    only at output.  Shape: pre-aggregate per (group, value) — the
    value-distinct compression quantileExactWeighted itself stores —
    then ONE cumulative window per group and a final min-conditional
    agg; everything keyed by group, no global sort."""
    li = table(spark, sf_dir, "lineitem")
    w = li.select(
        F.col("l_returnflag").alias("flag"),
        dec("l_extendedprice", "decimal(12,2)").alias("price"),
        dec("l_quantity", "decimal(12,2)").alias("qty"),
    )
    g = w.groupBy("flag", "price").agg(F.sum("qty").alias("wt"))
    win_cum = (
        Window.partitionBy("flag")
        .orderBy("price")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    win_all = Window.partitionBy("flag")
    c = g.select(
        "flag",
        "price",
        F.sum("wt").over(win_cum).alias("cum"),
        F.sum("wt").over(win_all).alias("total"),
    )
    def pick(q: float, alias: str):
        return (
            F.min(
                F.when(F.col("cum") >= F.col("total") * F.lit(q), F.col("price"))
            )
            .cast("double")
            .alias(alias)
        )
    return c.groupBy("flag").agg(
        pick(0.50, "p50_weighted"),
        pick(0.90, "p90_weighted"),
        pick(0.99, "p99_weighted"),
    )


@register(
    "agg_histogram_quantile",
    oracle="""
WITH h AS (
  SELECT CAST(floor(o_totalprice / 10000) AS BIGINT) AS bin,
         COUNT(*) AS cnt
  FROM orders GROUP BY bin
), c AS (
  SELECT bin, cnt,
         SUM(cnt) OVER (ORDER BY bin
                        ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS cum,
         SUM(cnt) OVER () AS total
  FROM h
), q AS (SELECT unnest(CAST([0.50, 0.90, 0.99] AS DOUBLE[])) AS q)
SELECT q,
       ROUND(MIN(CASE WHEN cum >= q * total AND cum - cnt < q * total THEN
         bin * 10000 + 10000 * (q * total - (cum - cnt)) / cnt END), 6)
         AS quantile_est
FROM c CROSS JOIN q
GROUP BY q
""",
)
def agg_histogram_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable histogram-sketch quantiles: p50/p90/p99 of order value
    estimated from a fixed-width bin histogram (width 10k) with linear
    interpolation inside the containing bin — the re-aggregatable
    alternative to exact percentiles when the corpus is too large to
    sort.  A fixed-bin histogram is the simplest mergeable quantile
    sketch: per-partition partial counts add associatively (it is just
    a groupBy), per-day rollup tables store the bins, and quantiles of
    any date range come from summing bins — never re-scanning raw
    data.  t-digest/KLL refine the memory bound, but the merge algebra
    and the interpolation step are exactly this.

    Shape: one map-side-combined groupBy over the fact (bins, not
    rows, cross the wire — the histogram is ~100 entries regardless of
    input size), then cumulative/total windows over the BIN table and
    a 3-row quantile probe broadcast against it.  Determinism: counts
    are integers, the interpolation is a single rounded division —
    both engines compute bit-identical estimates."""
    o = table(spark, sf_dir, "orders")
    h = (
        o.select(F.floor(F.col("o_totalprice") / 10000).cast("bigint").alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w_cum = Window.orderBy("bin").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy()
    c = h.select(
        "bin",
        "cnt",
        F.sum("cnt").over(w_cum).alias("cum"),
        F.sum("cnt").over(w_all).alias("total"),
    )
    qs = spark.range(1).select(
        F.explode(F.array(F.lit(0.50), F.lit(0.90), F.lit(0.99))).alias("q")
    )
    # interpolate ONLY in the unique containing bin (cum_prev < target
    # <= cum): later qualifying bins carry large NEGATIVE interpolation
    # terms that would hijack an unguarded MIN (review finding; the
    # unguarded form returned 190416 for the 253606 fixture median)
    target = F.col("q") * F.col("total")
    est = F.when(
        (F.col("cum") >= target) & (F.col("cum") - F.col("cnt") < target),
        F.col("bin") * 10000
        + 10000 * (target - (F.col("cum") - F.col("cnt"))) / F.col("cnt"),
    )
    return (
        c.crossJoin(F.broadcast(qs))
        .groupBy("q")
        .agg(F.round(F.min(est), 6).alias("quantile_est"))
    )


@register(
    "agg_bitmap_distinct",
    oracle="""
SELECT event_type, COUNT(DISTINCT user_id) AS n_distinct_users
FROM events GROUP BY event_type
UNION ALL
SELECT 'ALL' AS event_type, COUNT(DISTINCT user_id) AS n_distinct_users
FROM events
""",
)
def agg_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT mergeable distinct counts via roaring-style bitmap states
    (ClickHouse groupBitmap / groupBitmapOr parity): the
    re-aggregatable EXACT complement of agg_hll_mergeable's
    approximate sketches.  Per (event_type, shard) the user-id set is
    compressed into fixed-width bitmap buckets
    (bitmap_construct_agg over bitmap_bit_position, bucketed by
    bitmap_bucket_number); shard states merge with bitmap_or_agg
    WITHOUT rescanning raw data — how a rollup table stores exact
    per-day audiences that still union across days — and the same
    bucket-level states merge once more into the 'ALL' row, proving
    the re-aggregation path inside the key itself.  The oracle is
    plain COUNT(DISTINCT): bitmaps are exact, so the equality is
    hash-checked, not approximate.

    Shape: map-side bitmap_construct per (type, shard, bucket) —
    the shuffle carries BITMAPS (<=4KB per bucket), never user ids;
    then two bitmap_or_agg merge levels whose input is bounded by
    |types| x |buckets|.  At 100 TB this is the only exact-distinct
    shape that works: state size is bounded by id-space/8 bytes per
    group regardless of row count, and states persist for
    incremental daily rollups."""
    ev = table(spark, sf_dir, "events")
    states = (
        ev.selectExpr(
            "event_type",
            "user_id % 4 AS shard",
            "bitmap_bucket_number(user_id) AS bucket",
            "user_id",
        )
        .groupBy("event_type", "shard", "bucket")
        .agg(
            F.expr("bitmap_construct_agg(bitmap_bit_position(user_id))").alias(
                "bm"
            )
        )
    )
    merged = states.groupBy("event_type", "bucket").agg(
        F.expr("bitmap_or_agg(bm)").alias("bm")
    )
    per_type = merged.groupBy("event_type").agg(
        F.expr("CAST(SUM(bitmap_count(bm)) AS BIGINT)").alias("n_distinct_users")
    )
    all_row = (
        merged.groupBy("bucket")
        .agg(F.expr("bitmap_or_agg(bm)").alias("bm"))
        .agg(
            F.expr("CAST(SUM(bitmap_count(bm)) AS BIGINT)").alias(
                "n_distinct_users"
            )
        )
        .select(F.lit("ALL").alias("event_type"), "n_distinct_users")
    )
    return per_type.unionByName(all_row)


@register(
    "agg_topk_weighted",
    oracle="""
WITH per_key AS (
  SELECT o_custkey,
         COUNT(*) AS n_orders,
         SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS rev
  FROM orders GROUP BY o_custkey
),
tot AS (SELECT SUM(rev) AS total FROM per_key)
SELECT o_custkey, n_orders,
       CAST(rev AS DOUBLE) AS revenue,
       CAST(CAST(rev * 100 AS BIGINT) * 1000000
            // CAST(total * 100 AS BIGINT) AS BIGINT) AS share_ppm
FROM per_key CROSS JOIN tot
ORDER BY rev DESC, o_custkey LIMIT 10
""",
)
def agg_topk_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted heavy hitters (ClickHouse ``topKWeighted`` parity —
    the revenue-weighted sibling of agg_heavy_hitters' count-based
    support): the top-10 keys by TOTAL WEIGHT (exact-decimal revenue),
    each with its all-integer ppm share of the global total.  This is
    the "which customers are the business" readout, and the exact twin
    of the sketch: at 100 TB a space-saving topKWeighted sketch feeds
    the same surface, and this exact plan is both the gate oracle and
    the sketch's accuracy reference (the agg_heavy_hitters /
    agg_countmin_prefilter convention).

    Shape: ONE map-combined (custkey) aggregation, a 1-row total via
    broadcast, and TakeOrderedAndProject for the top-10 — no global
    sort materialization, no second data-sized pass.  share_ppm is
    bigint floor arithmetic on exact decimal cents, so no float enters
    the ranking or the surface.  Both numerator and denominator are
    scaled to cents BEFORE the decimal->bigint cast: scale-2 * 100 is
    exactly integral, so DuckDB's round-on-cast and Spark's
    truncate-on-cast agree (casting the fractional ``total`` directly
    would differ by 1 whenever its cents >= 50)."""
    o = table(spark, sf_dir, "orders")
    per_key = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(dec("o_totalprice")).alias("rev"),
    )
    tot = per_key.agg(F.sum("rev").alias("total"))
    return (
        per_key.crossJoin(F.broadcast(tot))
        .select(
            "o_custkey",
            "n_orders",
            F.col("rev").cast("double").alias("revenue"),
            F.expr(
                "CAST(CAST(rev * 100 AS BIGINT) * 1000000"
                " DIV CAST(total * 100 AS BIGINT) AS BIGINT)"
            ).alias("share_ppm"),
            F.col("rev").alias("_rev"),
        )
        .orderBy(F.desc("_rev"), F.asc("o_custkey"))
        .limit(10)
        .drop("_rev")
    )


@register(
    "agg_exact_median",
    oracle="""
WITH c AS (
  SELECT l_returnflag AS grp, CAST(ROUND(l_quantity) AS BIGINT) AS v,
         COUNT(*) AS cnt
  FROM lineitem GROUP BY 1, 2
),
t AS (SELECT grp, CAST(SUM(cnt) AS BIGINT) AS n FROM c GROUP BY grp),
cum AS (
  SELECT grp, v,
         CAST(SUM(cnt) OVER (PARTITION BY grp ORDER BY v) AS BIGINT) AS cum
  FROM c
)
SELECT t.grp AS grp, t.n AS n_rows,
       MIN(CASE WHEN cum >= (n + 1) // 2 THEN v END) AS median_lo,
       MIN(CASE WHEN cum >= n // 2 + 1 THEN v END) AS median_hi
FROM cum JOIN t ON cum.grp = t.grp
GROUP BY t.grp, t.n
""",
)
def agg_exact_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distributed median per group (ClickHouse
    ``quantileExact(0.5)`` parity) — the op Spark only ships
    approximately (percentile_approx): both order statistics that
    bracket the median (lower = k-th smallest with k=(n+1)//2, upper =
    k=n//2+1; equal for odd n) computed exactly with NO global sort.

    Plan: the classic distributed counting selection — (1) map-combined
    count per (group, value): the only corpus-sized pass, reduced to
    |groups| x |distinct values| rows; (2) running count over the tiny
    per-group value histogram (window over <=50 rows per group here;
    bounded by the value domain, not the row count); (3) the first
    value whose running count reaches k.  At 100 TB this is one
    aggregation shuffle of histogram-sized state — the same reason
    ClickHouse's quantileExact keeps a value multiset, not row copies.
    For unbounded/continuous domains the production variant buckets
    values first and recurses into the median bucket; the fixture's
    integral quantities (TPC-H 1..50) need no second round.  Both
    medians are exact BIGINTs — no interpolation float on the surface."""
    li = table(spark, sf_dir, "lineitem")
    c = li.groupBy(
        F.col("l_returnflag").alias("grp"),
        F.col("l_quantity").cast("bigint").alias("v"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("grp").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # group total n = the last running count — a second unordered window
    # over the SAME tiny histogram partitioning (plan shows one Exchange
    # feeding both Window nodes), instead of re-aggregating the corpus:
    # a naive c.groupBy(grp).sum join made Catalyst scan lineitem twice.
    cum = c.select(
        "grp",
        "v",
        F.sum("cnt").over(w).alias("cum"),
    ).withColumn("n", F.max("cum").over(Window.partitionBy("grp")))
    return cum.groupBy("grp", F.col("n").alias("n_rows")).agg(
        F.min(
            F.when(F.col("cum") >= F.expr("(n + 1) DIV 2"), F.col("v"))
        ).alias("median_lo"),
        F.min(
            F.when(F.col("cum") >= F.expr("n DIV 2 + 1"), F.col("v"))
        ).alias("median_hi"),
    )


_EXACT_QS = (25, 50, 75, 90, 99)  # percent levels, exact lower quantiles


@register(
    "agg_exact_quantiles",
    oracle=f"""
WITH c AS (
  SELECT l_returnflag AS grp,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS v,
         COUNT(*) AS cnt
  FROM lineitem GROUP BY 1, 2
),
cum AS (
  SELECT grp, v,
         CAST(SUM(cnt) OVER (PARTITION BY grp ORDER BY v) AS BIGINT) AS cum,
         CAST(SUM(cnt) OVER (PARTITION BY grp) AS BIGINT) AS n
  FROM c
)
SELECT grp, n AS n_rows,
  {",".join(
      f"MIN(CASE WHEN cum * 100 >= {q} * n THEN v END) AS p{q}_cents"
      for q in _EXACT_QS
  )}
FROM cum GROUP BY grp, n
""",
)
def agg_exact_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT quantile vector per group (ClickHouse
    ``quantilesExact(0.25, 0.5, 0.75, 0.9, 0.99)`` parity) — the same
    distributed counting selection as agg_exact_median, generalized:
    ALL five levels come from ONE histogram pass and ONE running-count
    window, because the k-th order statistic for every level reads the
    same cumulative counts (each level is one conditional min over the
    histogram — adding a level costs one expression, not a pass).

    The value domain here is price CENTS (exact integers via the
    decimal-cents cast), so the histogram is |groups| x |distinct
    prices| — bigger than the median key's 50-value domain but still
    data-bounded; the two-round bucket-then-recurse selection that
    removes even that bound is IMPLEMENTED as
    ``agg_exact_quantiles_bucketed`` (r9), oracled by this key's exact
    SQL so the two forms must agree bit-for-bit.  The level test is
    all-integer (cum * 100 >= q * n), so no float ever touches the
    selection; surfaces are exact cents BIGINTs."""
    li = table(spark, sf_dir, "lineitem")
    c = li.groupBy(
        F.col("l_returnflag").alias("grp"),
        (dec("l_extendedprice") * 100).cast("bigint").alias("v"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy("grp").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = c.select(
        "grp",
        "v",
        F.sum("cnt").over(w).alias("cum"),
    ).withColumn("n", F.max("cum").over(Window.partitionBy("grp")))
    return cum.groupBy("grp", F.col("n").alias("n_rows")).agg(
        *[
            F.min(
                F.when(F.col("cum") * 100 >= F.lit(q) * F.col("n"), F.col("v"))
            ).alias(f"p{q}_cents")
            for q in _EXACT_QS
        ]
    )


_BKT_WIDTH = 4096  # cents per bucket in the two-round exact selection


@register(
    "agg_exact_quantiles_bucketed",
    oracle=f"""
WITH c AS (
  SELECT l_returnflag AS grp,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS v,
         COUNT(*) AS cnt
  FROM lineitem GROUP BY 1, 2
),
cum AS (
  SELECT grp, v,
         CAST(SUM(cnt) OVER (PARTITION BY grp ORDER BY v) AS BIGINT) AS cum,
         CAST(SUM(cnt) OVER (PARTITION BY grp) AS BIGINT) AS n
  FROM c
)
SELECT grp, n AS n_rows,
  {",".join(
      f"MIN(CASE WHEN cum * 100 >= {q} * n THEN v END) AS p{q}_cents"
      for q in _EXACT_QS
  )}
FROM cum GROUP BY grp, n
""",
)
def agg_exact_quantiles_bucketed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Two-round bucket-then-recurse EXACT quantiles — the 100 TB form
    whose docstring-only sketch the r8 verdict asked to implement
    (agg_exact_quantiles documents it as its production variant; this
    key IS that variant, oracled by the same exact-selection SQL so
    both forms must agree bit-for-bit on every surface).

    Why: the single-round counting selection sorts |distinct values|
    rows inside each group partition (its running-count window) — fine
    while the domain is bounded, a straggler when a continuous domain
    makes |distinct| ~ |rows|.  Here NO window ever sees more than a
    bucket's worth of input:

    1. ONE corpus pass builds the (group, value) histogram — identical
       to the exact form and the only row-count-sized work.
    2. Values bucket by integer division (bucket = v DIV 4096 cents —
       data-independent, so bucketing needs no min/max pre-pass and
       the bucket id is a pure projection).  The per-group BUCKET
       histogram (domain/4096 rows) gets the running-count window; the
       target bucket for every level q is the first whose cumulative
       count reaches q% of n, carried with ``base`` = count strictly
       below it (min-struct aggregation, no second window).
    3. Recurse = ONE broadcast semi-join of the value histogram onto
       the |groups| x |levels| target buckets, then a running count
       ordered by v inside each (group, level) — at most 4096 distinct
       cents per partition by construction — and the answer is the
       first v with (base + within-bucket cum) * 100 >= q * n.
    4. A levels pivot reshapes to the exact form's column surface.

    The level test stays ALL-INTEGER on exact decimal cents end to
    end.  At 100 TB: pass 1 is map-combined; the bucket window input
    is domain-bounded (~2.5k rows/group for 7-digit cents), the
    value-level windows are 4096-bounded, and the bucket->value join
    broadcasts 15 rows — nothing anywhere sorts |distinct values|."""
    li = table(spark, sf_dir, "lineitem")
    c = li.groupBy(
        F.col("l_returnflag").alias("grp"),
        (dec("l_extendedprice") * 100).cast("bigint").alias("v"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    # The value histogram feeds TWO consumers (bucket histogram and the
    # target-bucket recursion join); persisting it pins pass 1 to ONE
    # lineitem scan (unpersisted, each branch re-ran the corpus
    # aggregation — 4 scans in the formatted plan).  Histogram-sized
    # state only; released harness-side via clearCache (r8 ADVICE
    # convention).
    c = c.withColumn("bkt", F.expr(f"v DIV {_BKT_WIDTH}")).persist()

    bh = c.groupBy("grp", "bkt").agg(F.sum("cnt").alias("bcnt"))
    wb = Window.partitionBy("grp").orderBy("bkt").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    bh = bh.select(
        "grp", "bkt", "bcnt", F.sum("bcnt").over(wb).alias("bcum")
    ).withColumn("n", F.max("bcum").over(Window.partitionBy("grp")))

    levels = F.explode(F.array(*[F.lit(q) for q in _EXACT_QS])).alias("q")
    # target bucket per (grp, level): first bucket whose cumulative
    # count reaches q% — min on (bkt, base) structs, ordered by bkt.
    targets = (
        bh.select("grp", "bkt", "bcnt", "bcum", "n", levels)
        .filter(F.col("bcum") * 100 >= F.col("q") * F.col("n"))
        .groupBy("grp", "q", "n")
        .agg(F.min(F.struct("bkt", (F.col("bcum") - F.col("bcnt")).alias(
            "base"))).alias("t"))
        .select("grp", "q", "n", F.col("t.bkt").alias("bkt"),
                F.col("t.base").alias("base"))
    )

    sel = c.join(F.broadcast(targets), ["grp", "bkt"])
    wv = Window.partitionBy("grp", "q").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    hit = (
        sel.withColumn("wcum", F.sum("cnt").over(wv))
        .filter(
            (F.col("base") + F.col("wcum")) * 100 >= F.col("q") * F.col("n")
        )
        .groupBy("grp", "q", F.col("n").alias("n_rows"))
        .agg(F.min("v").alias("pv"))
    )
    pivoted = (
        hit.groupBy("grp", "n_rows")
        .pivot("q", list(_EXACT_QS))
        .agg(F.first("pv"))
    )
    return pivoted.select(
        "grp", "n_rows",
        *[F.col(str(q)).alias(f"p{q}_cents") for q in _EXACT_QS],
    )
