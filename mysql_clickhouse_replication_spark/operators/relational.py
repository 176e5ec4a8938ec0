"""Scans, projections, filters, predicates (SURVEY.md sections 2.B, 2.C).

Reference parity: the reference lands rows into ClickHouse and users scan/
filter there (SURVEY.md section 3.1; empty snapshot, semantics [P:med]).
Spark-side, each of these compiles to a parquet scan with column pruning
and predicate pushdown — verified via .explain() (PushedFilters/ReadSchema)
in tests/test_plans.py.

Scale notes: filters and projections are embarrassingly parallel — the only
scale lever is making sure they reach the scan (no shuffle at all).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..session import scratch_path, table
from ._util import D4, dec


# --- 2.B scans -------------------------------------------------------------


@register(
    "scan_parquet",
    oracle="SELECT COUNT(*) AS n_rows, COUNT(DISTINCT l_orderkey) AS n_orders FROM lineitem",
)
def scan_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full parquet scan + count (reference: initial table load path)."""
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
    )


@register(
    "scan_projection_pushdown",
    oracle="SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem",
)
def scan_projection_pushdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-pruned scan: ReadSchema must contain exactly these 3 columns
    (asserted in tests/test_plans.py) — at 100 TB this is the difference
    between reading 3/11 of the table and all of it."""
    return table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )


@register(
    "scan_partition_filter",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
FROM orders
WHERE o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '2000-07-01 00:00:00'
""",
)
def scan_partition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate pushed to parquet row-group stats (PushedFilters in the
    plan); on a date-partitioned production layout this prunes whole
    partitions before any IO."""
    o = table(spark, sf_dir, "orders")
    return o.filter(
        (F.col("o_orderdate") >= F.lit("2000-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("2000-07-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")


# --- 2.C projections / filters ---------------------------------------------


@register(
    "project_compute",
    oracle="""
SELECT l_orderkey, l_linenumber,
       CAST(CAST(l_extendedprice AS DECIMAL(12,2))
            * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE)
           AS revenue,
       CAST(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_tax AS DECIMAL(4,2)) AS DOUBLE)
           AS taxed_qty
FROM lineitem
""",
)
def project_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic derived columns (decimal-exact, surfaced as double)."""
    li = table(spark, sf_dir, "lineitem")
    one = F.lit(1).cast(D4)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        (dec("l_extendedprice") * (one - dec("l_discount", D4)))
        .cast("double")
        .alias("revenue"),
        (dec("l_quantity") * dec("l_tax", D4)).cast("double").alias("taxed_qty"),
    )


@register(
    "filter_conjunctive",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag
FROM lineitem
WHERE (l_quantity > 30 AND l_discount <= 0.05) OR l_returnflag = 'R'
""",
)
def filter_conjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    cond = ((F.col("l_quantity") > 30) & (F.col("l_discount") <= 0.05)) | (
        F.col("l_returnflag") == "R"
    )
    return li.filter(cond).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag"
    )


@register(
    "filter_in_between_like",
    oracle="""
SELECT p_partkey, p_brand, p_type, p_size
FROM part
WHERE p_brand IN ('Brand#11', 'Brand#22', 'Brand#33')
  AND p_size BETWEEN 5 AND 25
  AND p_type LIKE '%M%'
""",
)
def filter_in_between_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    return p.filter(
        F.col("p_brand").isin("Brand#11", "Brand#22", "Brand#33")
        & F.col("p_size").between(5, 25)
        & F.col("p_type").like("%M%")
    ).select("p_partkey", "p_brand", "p_type", "p_size")


@register(
    "filter_null_semantics",
    oracle="""
SELECT o_orderkey,
       NULLIF(o_orderstatus, 'O') AS status_or_null,
       (NULLIF(o_orderstatus, 'O') IS NOT DISTINCT FROM 'F') AS nullsafe_is_f
FROM orders
WHERE NULLIF(o_orderstatus, 'O') IS NOT NULL
""",
)
def filter_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IS [NOT] NULL + null-safe equality (fixtures carry no NULLs, so they
    are synthesized with NULLIF — the canonical CDC pattern for soft-deleted
    columns arriving as sentinel values)."""
    o = table(spark, sf_dir, "orders")
    status_or_null = F.nullif(F.col("o_orderstatus"), F.lit("O"))
    return (
        o.select(
            "o_orderkey",
            status_or_null.alias("status_or_null"),
            status_or_null.eqNullSafe(F.lit("F")).alias("nullsafe_is_f"),
        )
        .filter(F.col("status_or_null").isNotNull())
    )


@register(
    "case_when",
    oracle="""
SELECT CASE WHEN o_totalprice >= 300000 THEN 'large'
            WHEN o_totalprice >= 100000 THEN 'medium'
            ELSE 'small' END AS bucket,
       o_orderpriority,
       COUNT(*) AS n
FROM orders
GROUP BY 1, 2
""",
)
def case_when(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") >= 300000, "large")
        .when(F.col("o_totalprice") >= 100000, "medium")
        .otherwise("small")
        .alias("bucket")
    )
    return o.groupBy(bucket, "o_orderpriority").agg(F.count(F.lit(1)).alias("n"))


@register(
    "sample_hash_based",
    oracle="""
SELECT o_orderstatus, COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
FROM orders
WHERE ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT % 10 = 0
GROUP BY o_orderstatus
""",
)
def sample_hash_based(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% sample (ClickHouse `SAMPLE 0.1` parity): the
    sampling predicate is a PORTABLE key hash (md5-derived 32-bit bucket,
    identical in every engine), not an RNG — so the sample is
    reproducible across engines, runs, and cluster sizes, can be
    re-derived for any key (join two hash-samples and they align on the
    same keys, exactly like ClickHouse's SAMPLE on a shared sampling
    key), and pushes into the scan as an ordinary predicate. df.sample()
    gives none of those properties (per-partition RNG; resize the
    cluster and the sample changes)."""
    o = table(spark, sf_dir, "orders")
    bucket = (
        F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10)
        .cast("bigint") % 10
    )
    return (
        o.filter(bucket == 0)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
            .cast("double")
            .alias("sum_price"),
        )
    )


@register(
    "reshape_pivot",
    oracle="""
SELECT user_id % 10 AS cohort,
       COUNT(*) FILTER (event_type = 'signup')   AS signup,
       COUNT(*) FILTER (event_type = 'view')     AS view,
       COUNT(*) FILTER (event_type = 'click')    AS click,
       COUNT(*) FILTER (event_type = 'purchase') AS purchase,
       COUNT(*) FILTER (event_type = 'error')    AS error
FROM events GROUP BY 1
""",
)
def reshape_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-to-wide pivot: per-cohort event counts spread into one
    column per event type. The value list is EXPLICIT (no discovery
    scan, stable schema — at 100 TB an unlisted pivot would first
    distinct-scan the column), so the plan is a single grouped
    conditional aggregation, exactly the oracle's FILTER form."""
    ev = table(spark, sf_dir, "events")
    types = ["signup", "view", "click", "purchase", "error"]
    return (
        ev.withColumn("cohort", F.col("user_id") % 10)
        .groupBy("cohort")
        .pivot("event_type", types)
        .count()
        .na.fill(0, types)
    )


@register(
    "reshape_unpivot",
    oracle="""
SELECT l_orderkey, l_linenumber, metric, value FROM (
  SELECT l_orderkey, l_linenumber, 'quantity' AS metric,
         CAST(l_quantity AS DOUBLE) AS value FROM lineitem
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'extendedprice',
         CAST(l_extendedprice AS DOUBLE) FROM lineitem
  UNION ALL
  SELECT l_orderkey, l_linenumber, 'discount',
         CAST(l_discount AS DOUBLE) FROM lineitem
) WHERE l_orderkey % 101 = 0
""",
)
def reshape_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long unpivot (``df.unpivot`` / SQL UNPIVOT, ClickHouse's
    ARRAY JOIN-of-tuples idiom): three measure columns melt into
    (metric, value) rows. Planner-side this is a single Expand node —
    one scan emitting 3 rows per input, NOT three scans unioned (the
    oracle spells the UNION form only because it is the portable
    equivalent)."""
    li = table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") % 101 == 0)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("double").alias("quantity"),
        F.col("l_extendedprice").cast("double").alias("extendedprice"),
        F.col("l_discount").cast("double").alias("discount"),
    ).unpivot(
        ["l_orderkey", "l_linenumber"],
        ["quantity", "extendedprice", "discount"],
        "metric",
        "value",
    )


@register(
    "profile_table",
    oracle="""
SELECT 'l_quantity' AS col_name, COUNT(*) - COUNT(l_quantity) AS n_nulls,
       COUNT(DISTINCT l_quantity) AS n_distinct,
       CAST(MIN(l_quantity) AS DOUBLE) AS min_v,
       CAST(MAX(l_quantity) AS DOUBLE) AS max_v
FROM lineitem
UNION ALL
SELECT 'l_extendedprice', COUNT(*) - COUNT(l_extendedprice),
       COUNT(DISTINCT l_extendedprice),
       CAST(MIN(l_extendedprice) AS DOUBLE), CAST(MAX(l_extendedprice) AS DOUBLE)
FROM lineitem
UNION ALL
SELECT 'l_discount', COUNT(*) - COUNT(l_discount),
       COUNT(DISTINCT l_discount),
       CAST(MIN(l_discount) AS DOUBLE), CAST(MAX(l_discount) AS DOUBLE)
FROM lineitem
UNION ALL
SELECT 'l_partkey', COUNT(*) - COUNT(l_partkey),
       COUNT(DISTINCT l_partkey),
       CAST(MIN(l_partkey) AS DOUBLE), CAST(MAX(l_partkey) AS DOUBLE)
FROM lineitem
UNION ALL
SELECT 'l_suppkey', COUNT(*) - COUNT(l_suppkey),
       COUNT(DISTINCT l_suppkey),
       CAST(MIN(l_suppkey) AS DOUBLE), CAST(MAX(l_suppkey) AS DOUBLE)
FROM lineitem
""",
)
def profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass column profiling (the data-quality screen that runs
    before any pipeline ingests a new drop): per-column null count,
    exact distinct count, min and max, emitted as one row per column
    via stack().  ONE scan computes all 20 statistics -- the naive
    per-column loop would scan the fact table 5 times.  The cost model
    to know: multiple COUNT(DISTINCT x) in one aggregate makes Catalyst
    plan an Expand (rows x #distinct-aggs before the shuffle); at
    100 TB swap exact distinct for approx_count_distinct and the Expand
    disappears -- kept exact here because the profile IS the oracle
    contract.  Min/max surface as DOUBLE so one stack() schema fits all
    numeric columns (the driver hasher needs scalar columns)."""
    li = table(spark, sf_dir, "lineitem")
    cols = [
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_partkey",
        "l_suppkey",
    ]
    aggs = []
    for c in cols:
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__nulls"),
            F.countDistinct(c).alias(f"{c}__nd"),
            F.min(c).cast("double").alias(f"{c}__min"),
            F.max(c).cast("double").alias(f"{c}__max"),
        ]
    one = li.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nulls, {c}__nd, {c}__min, {c}__max" for c in cols
    )
    return one.selectExpr(
        f"stack({len(cols)}, {stack_args}) "
        "AS (col_name, n_nulls, n_distinct, min_v, max_v)"
    )


@register(
    "sample_stratified",
    oracle="""
WITH s AS (
  SELECT o_orderpriority, o_totalprice,
         ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
           AS bucket,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1
              WHEN o_orderpriority = '2-HIGH'   THEN 2
              ELSE 10 END AS keep_mod
  FROM orders
)
SELECT o_orderpriority, COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
FROM s
WHERE bucket % keep_mod = 0
GROUP BY o_orderpriority
""",
)
def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sampling (class rebalancing for training
    sets): each stratum gets its own sampling rate — URGENT 100%, HIGH
    50%, the rest 10% — driven by the SAME portable md5 key-bucket as
    sample_hash_based, so strata stay reproducible across engines and
    cluster sizes, two stratified samples on the same key align
    row-for-row, and the whole thing is an ordinary pushable predicate
    (a per-stratum df.sample() loop would RNG-drift AND scan once per
    stratum).  The per-stratum rate is just a CASE on the modulus —
    one scan, no shuffle beyond the final tiny aggregate."""
    o = table(spark, sf_dir, "orders")
    bucket = F.conv(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10
    ).cast("bigint")
    keep_mod = (
        F.when(F.col("o_orderpriority") == "1-URGENT", 1)
        .when(F.col("o_orderpriority") == "2-HIGH", 2)
        .otherwise(10)
    )
    return (
        o.filter(bucket % keep_mod == 0)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
            .cast("double")
            .alias("sum_price"),
        )
    )


@register(
    "sample_reservoir",
    oracle="""
WITH ranked AS (
  SELECT c_mktsegment, c_custkey, c_acctbal,
         ROW_NUMBER() OVER (PARTITION BY c_mktsegment
             ORDER BY md5(CAST(c_custkey AS VARCHAR)), c_custkey) AS rn
  FROM customer
)
SELECT c_mktsegment, c_custkey, c_acctbal, rn
FROM ranked WHERE rn <= 20
""",
)
def sample_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size-per-group deterministic sample (reservoir-sampling
    parity, k=20 per market segment): rank keys by their portable md5
    hash and keep the k smallest — a reproducible "random" subset that,
    unlike an RNG reservoir, is identical across engines, runs, and
    cluster sizes, and re-derivable for any key.

    Scale shape: min-k by hash is a MERGEABLE statistic — executors keep
    per-partition k-smallest heaps and the shuffle carries k rows per
    (group, partition), never the group's full population; Spark plans
    the rn<=k window filter as exactly that (WindowGroupLimit pushdown).
    """
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.md5(F.col("c_custkey").cast("string")), F.col("c_custkey")
    )
    return (
        c.select("c_mktsegment", "c_custkey", "c_acctbal")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 20)
    )


@register(
    "profile_skew",
    oracle="""
WITH c AS (
  SELECT l_partkey AS k, COUNT(*) AS c FROM lineitem GROUP BY l_partkey
), dist AS (
  SELECT c, COUNT(*) AS nk FROM c GROUP BY c
), stats AS (
  SELECT CAST(SUM(nk) AS BIGINT) AS n_keys,
         CAST(SUM(c * nk) AS BIGINT) AS total_rows,
         MAX(c) AS max_cnt
  FROM dist
), cum AS (
  SELECT c, SUM(nk) OVER (ORDER BY c
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM dist
), pct AS (
  SELECT MIN(CASE WHEN 2 * cum >= (SELECT n_keys FROM stats)
                  THEN c END) AS p50_cnt,
         MIN(CASE WHEN 100 * cum >= 99 * (SELECT n_keys FROM stats)
                  THEN c END) AS p99_cnt
  FROM cum
), top1 AS (
  SELECT k AS top_key, c AS top_cnt FROM c ORDER BY c DESC, k LIMIT 1
)
SELECT n_keys, total_rows, max_cnt, p50_cnt, p99_cnt, top_key,
       CAST(top_cnt * 1000000 // total_rows AS BIGINT) AS top_share_ppm,
       CAST(max_cnt * n_keys * 10000 // total_rows AS BIGINT)
         AS skew_ratio_e4
FROM stats, pct, top1
""",
)
def profile_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join/agg-key skew diagnostic — the report you run BEFORE deciding
    whether a 100 TB join needs salting (join_skew_salted) or AQE skew
    splitting: per-key count distribution (median / p99 / max
    multiplicity), the heaviest key and its ppm share of all rows, and
    the max/avg skew ratio.

    Plan: ONE map-combined groupBy on the key, then everything downstream
    runs on |distinct multiplicities| rows (the count-of-counts
    histogram, typically a few hundred values regardless of key
    cardinality) — the global cumulative window is over that tiny frame,
    NOT over keys, so the single-partition window that kills
    global-percentile plans never sees more than the histogram.
    Percentiles are exact smallest-value-reaching-quantile picks over
    integer cumulative counts (no interpolation drift); the skew ratio
    is all-integer e4 fixed point.  The top-1 probe is a
    TakeOrderedAndProject (limit 1), and the three 1-row frames meet in
    broadcast cross joins."""
    li = table(spark, sf_dir, "lineitem")
    c = li.groupBy(F.col("l_partkey").alias("k")).agg(F.count(F.lit(1)).alias("c"))
    dist = c.groupBy("c").agg(F.count(F.lit(1)).alias("nk"))
    stats = dist.agg(
        F.sum("nk").alias("n_keys"),
        F.sum(F.col("c") * F.col("nk")).alias("total_rows"),
        F.max("c").alias("max_cnt"),
    )
    wc = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, 0)
    cum = dist.select("c", F.sum("nk").over(wc).alias("cum"))
    pct = (
        cum.crossJoin(F.broadcast(stats.select("n_keys")))
        .agg(
            F.min(
                F.when(2 * F.col("cum") >= F.col("n_keys"), F.col("c"))
            ).alias("p50_cnt"),
            F.min(
                F.when(100 * F.col("cum") >= 99 * F.col("n_keys"), F.col("c"))
            ).alias("p99_cnt"),
        )
    )
    top1 = (
        c.orderBy(F.desc("c"), F.asc("k"))
        .limit(1)
        .select(F.col("k").alias("top_key"), F.col("c").alias("top_cnt"))
    )
    return (
        stats.crossJoin(F.broadcast(pct))
        .crossJoin(F.broadcast(top1))
        .select(
            "n_keys",
            "total_rows",
            "max_cnt",
            "p50_cnt",
            "p99_cnt",
            "top_key",
            F.expr("CAST(top_cnt * 1000000 DIV total_rows AS BIGINT)").alias(
                "top_share_ppm"
            ),
            F.expr(
                "CAST(max_cnt * n_keys * 10000 DIV total_rows AS BIGINT)"
            ).alias("skew_ratio_e4"),
        )
    )


@register(
    "scan_sorted_layout_prune",
    oracle="""
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
       MIN(o_orderdate) AS min_d,
       MAX(o_orderdate) AS max_d
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-03-01'
  AND o_orderdate <  TIMESTAMP '1997-04-01'
""",
)
def scan_sorted_layout_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sort-key data layout for scan pruning — ClickHouse
    ``ORDER BY (o_orderdate)`` primary-index parity on parquet: land the
    table RANGE-PARTITIONED + sorted on the filter column, so every
    parquet row group's min/max statistics span a narrow date slice and
    a one-month predicate skips almost all of them at the reader level
    (PushedFilters -> row-group stats pruning; asserted in
    tests/test_plans.py).  The verified result is the month aggregate
    read back from the sorted sink.

    At 100 TB this is the cheapest scan win there is: the SAME query on
    an unsorted landing reads every row group (each spans the full date
    domain); sorted layout turns time-windowed scans into
    O(selected data).  repartitionByRange gives cluster-wide partition
    pruning by range, sortWithinPartitions gives row-group pruning
    inside each file — two pruning levels, one write-time decision."""
    src = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )
    sink = scratch_path("sorted_orders", os.path.basename(sf_dir))
    (
        src.repartitionByRange(8, "o_orderdate")
        .sortWithinPartitions("o_orderdate")
        .write.mode("overwrite")
        .parquet(sink)
    )
    rb = spark.read.parquet(sink)
    f = rb.filter(
        (F.col("o_orderdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    return f.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
        .cast("double")
        .alias("sum_price"),
        F.min("o_orderdate").alias("min_d"),
        F.max("o_orderdate").alias("max_d"),
    )


@register(
    "reshape_pivot_multi",
    oracle="""
SELECT CAST(ts AS DATE) AS d,
       COUNT(*) FILTER (event_type = 'view') AS view_n,
       CAST(COALESCE(SUM(CAST(value AS DECIMAL(12,2)))
            FILTER (event_type = 'view'), 0) AS DOUBLE) AS view_sum,
       COUNT(*) FILTER (event_type = 'click') AS click_n,
       CAST(COALESCE(SUM(CAST(value AS DECIMAL(12,2)))
            FILTER (event_type = 'click'), 0) AS DOUBLE) AS click_sum,
       COUNT(*) FILTER (event_type = 'purchase') AS purchase_n,
       CAST(COALESCE(SUM(CAST(value AS DECIMAL(12,2)))
            FILTER (event_type = 'purchase'), 0) AS DOUBLE) AS purchase_sum
FROM events GROUP BY CAST(ts AS DATE)
""",
)
def reshape_pivot_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-metric pivot — the wide dashboard table (one row per day,
    one COLUMN GROUP per event type x metric) that reshape_pivot's
    single-metric form doesn't cover: groupBy(day).pivot(type with an
    explicit value list).agg(count, sum) emits {type}_{metric} columns
    in one pass.  The explicit pivot value list keeps the plan a single
    conditional aggregate (no discovery scan), the reshape_pivot
    discipline; exact decimal sums, zero-fill for absent cells so the
    wide schema is total.

    Scale: the long-form (day, type) aggregate does the data-volume
    work (map-combined); the pivotfirst reshape is a SECOND exchange
    over the already-reduced |days x types| frame — wide fan-out costs
    a tiny extra shuffle, never a second pass over raw rows."""
    ev = table(spark, sf_dir, "events")
    p = (
        ev.groupBy(F.to_date("ts").alias("d"))
        .pivot("event_type", ["view", "click", "purchase"])
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum(F.col("value").cast("decimal(12,2)")), F.lit(0))
            .cast("double")
            .alias("sum"),
        )
    )
    return p.select(
        "d",
        F.col("view_n"),
        F.col("view_sum"),
        F.col("click_n"),
        F.col("click_sum"),
        F.col("purchase_n"),
        F.col("purchase_sum"),
    )


@register(
    "scan_zorder_layout",
    oracle="""
SELECT COUNT(*) AS n_rows,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
       COUNT(DISTINCT o_custkey % 256) AS n_cust_buckets
FROM orders
WHERE o_custkey % 256 BETWEEN 64 AND 79
  AND (year(o_orderdate) - 1992) * 12 + month(o_orderdate) - 1 BETWEEN 48 AND 53
""",
)
def scan_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) multi-column layout — the 2-D
    generalization of scan_sorted_layout_prune and the technique
    behind Delta/Iceberg OPTIMIZE ZORDER: one sort column cannot
    serve BOTH a customer-bucket predicate and a month predicate, but
    sorting by the bit-interleave of (customer bucket, month index)
    clusters rows so every parquet row group spans a small RECTANGLE
    of the 2-D key space and a box query prunes on min/max stats in
    BOTH dimensions at once.

    The landed table STORES the two bucket columns (cb = custkey mod
    256, ym = month index) and the query filters on them directly —
    derived-expression predicates (x % 256) are not pushable to
    parquet, so the buckets must be materialized for stats pruning to
    see them; true of every z-order implementation and the reason
    OPTIMIZE ZORDER operates on concrete columns.  The z-value is
    pure bit arithmetic (shiftright/&/shiftleft, JVM codegen),
    write-time only.  The oracle runs the same box on the RAW table
    via the defining expressions — layout cannot change the answer,
    which is what the gate verifies.

    Measured at sf0.1 (150k orders, 16 files, 16-bucket x 6-month
    box): an UNSORTED layout's scan emits all 150,000 rows to the
    filter; the z-layout emits 17,126 — 8.8x less (asserted with the
    executed-plan scan metric in tests/test_plans.py).  A 1-D
    date-sorted layout measures 18,064 here — parquet PAGE-level
    column indexes approximate 2-D pruning when pages are tiny — but
    that convergence is a bench-scale artifact: at production
    row-group/page sizes the unsorted dimension's pages each span the
    whole bucket domain and 1-D degrades toward the unsorted case,
    which is exactly when the interleave pays."""
    src = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        "o_orderdate",
        (F.col("o_custkey") % 256).cast("int").alias("cb"),
        ((F.year("o_orderdate") - 1992) * 12 + F.month("o_orderdate") - 1)
        .cast("int")
        .alias("ym"),
    )
    z = F.lit(0)
    for b in range(8):  # interleave 8 bits of each dimension
        z = (
            z
            + F.shiftleft(F.shiftright(F.col("cb"), b).bitwiseAND(1), 2 * b + 1)
            + F.shiftleft(F.shiftright(F.col("ym"), b).bitwiseAND(1), 2 * b)
        )
    sink = scratch_path("zorder_orders", os.path.basename(sf_dir))
    (
        src.withColumn("z", z)
        .repartitionByRange(16, "z")
        .sortWithinPartitions("z")
        .drop("z")
        .write.mode("overwrite")
        .parquet(sink)
    )
    rb = spark.read.parquet(sink)
    f = rb.filter(F.col("cb").between(64, 79) & F.col("ym").between(48, 53))
    return f.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
        .cast("double")
        .alias("sum_price"),
        F.countDistinct("cb").alias("n_cust_buckets"),
    )


#: Bloom skip-index geometry: m = 3968 bits = 64 words x 62 usable
#: bits (bit 62+ of a signed BIGINT would wrap), k = 2 independent
#: lattice hashes -- m/n ~ 7.75 at the 512-row granule, measured ~5%
#: false-positive rate at sf0.1.  Same cross-engine-exact
#: multiplicative hashing as docs_epoch_shuffle (production swaps in
#: xxhash64 seeds 0/1).  The probe materializes ONLY the needle's two
#: index words -- exactly what a reader fetches from a skip index.
_BLOOM_GRANULE = 512  # rows per granule (ClickHouse index_granularity)


def _bloom_pos(col: str) -> tuple[str, str]:
    """The two lattice-hash bit positions of ``col`` in [0, 3968).

    Id-magnitude precondition (r11 ADVICE #2, same lattice as
    docs_epoch_shuffle): cross-engine exactness holds while
    ``col * 2654435761`` fits int64, i.e. values below ~3.47e9 —
    past that Spark wraps where DuckDB errors.  The fixture id
    domains sit orders of magnitude inside the bound; corpora with
    wider ids reduce them mod 2^32 before hashing (production's
    xxhash64 replacement has no such precondition)."""
    return (
        f"((({col} * 2654435761 + 13) % 4294967296) % 3968)",
        f"((({col} * 40503 + 97) % 4294967296) % 3968)",
    )


@register(
    "scan_bloom_skip_index",
    oracle="""
WITH nd AS (
  SELECT needle,
         (((needle * 2654435761 + 13) % 4294967296) % 3968) // 62 AS nw1, (((needle * 40503 + 97) % 4294967296) % 3968) // 62 AS nw2,
         (CAST(1 AS BIGINT) << CAST((((needle * 2654435761 + 13) % 4294967296) % 3968) % 62 AS INTEGER)) AS nb1,
         (CAST(1 AS BIGINT) << CAST((((needle * 40503 + 97) % 4294967296) % 3968) % 62 AS INTEGER)) AS nb2
  FROM (SELECT MAX(user_id) // 2 AS needle FROM events)
),
m AS (
  SELECT event_id // 512 AS granule, user_id AS u,
         needle, nw1, nw2, nb1, nb2,
         (((user_id * 2654435761 + 13) % 4294967296) % 3968) AS p1, (((user_id * 40503 + 97) % 4294967296) % 3968) AS p2
  FROM events CROSS JOIN nd
),
c AS (
  SELECT granule, u, needle, nb1, nb2,
         (CASE WHEN p1 // 62 = nw1
               THEN (CAST(1 AS BIGINT) << CAST(p1 % 62 AS INTEGER))
               ELSE 0 END)
       | (CASE WHEN p2 // 62 = nw1
               THEN (CAST(1 AS BIGINT) << CAST(p2 % 62 AS INTEGER))
               ELSE 0 END) AS m1,
         (CASE WHEN p1 // 62 = nw2
               THEN (CAST(1 AS BIGINT) << CAST(p1 % 62 AS INTEGER))
               ELSE 0 END)
       | (CASE WHEN p2 // 62 = nw2
               THEN (CAST(1 AS BIGINT) << CAST(p2 % 62 AS INTEGER))
               ELSE 0 END) AS m2
  FROM m
),
g AS (
  SELECT granule, COUNT(*) AS n_rows,
         bit_or(m1) AS b1, bit_or(m2) AS b2,
         MIN(u) AS min_u, MAX(u) AS max_u,
         MAX(needle) AS needle, MAX(nb1) AS nb1, MAX(nb2) AS nb2,
         COUNT(*) FILTER (u = needle) AS n_exact
  FROM c GROUP BY granule
)
SELECT granule, n_rows, b1 AS probe_word1, b2 AS probe_word2,
       min_u, max_u,
       CAST(CASE WHEN (b1 & nb1) = nb1 AND (b2 & nb2) = nb2
            THEN 1 ELSE 0 END AS INTEGER) AS bloom_hit,
       CAST(CASE WHEN needle BETWEEN min_u AND max_u
            THEN 1 ELSE 0 END AS INTEGER) AS minmax_hit,
       CAST(CASE WHEN n_exact > 0 THEN 1 ELSE 0 END AS INTEGER)
         AS true_hit
FROM g
""",
)
def scan_bloom_skip_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``bloom_filter`` SKIP-INDEX twin -- the third
    data-skipping structure next to scan_sorted_layout_prune (minmax on
    the sort key) and scan_zorder_layout (multi-column curve): a
    per-granule Bloom filter (m = 3968 bits, k = 2) over a NON-sort
    column (user_id -- point lookups on it cannot use the primary
    index), probed with a data-derived needle (MAX(user_id) DIV 2).
    Emits per granule: the needle's two PROBE WORDS of the index (what
    a reader actually fetches -- never the whole filter), the minmax
    envelope, and three verdicts: bloom_hit (granule survives the
    probe), minmax_hit (granule survives a minmax index -- on an
    unsorted column essentially EVERY granule does, which is why
    ClickHouse offers bloom skip indexes at all), true_hit (the needle
    really is there).  bloom_hit >= true_hit always (no false
    negatives -- the Bloom contract, property-tested); measured at
    sf0.1: 196 granules, minmax prunes 0, bloom prunes all 141 granules
    the needle is absent from (0 false positives on this fixture;
    the k=2 / m=3968 / n=512 formula predicts ~5%), truth 55.

    Build is one map-combined groupBy(granule) OR-folding each row's
    two bit contributions to the two probe words -- at 100 TB the full
    index is |granules| x 64 words (orders smaller than the table) and
    the probe reads k words per granule; this plan never materializes
    the non-probed 62 words because the verdict doesn't need them.
    Hashes are the repo's cross-engine-exact multiplicative lattice
    (production: xxhash64 with two seeds; nothing else changes)."""
    ev = table(spark, sf_dir, "events")
    np1, np2 = _bloom_pos("needle")
    nd = ev.agg(F.expr("MAX(user_id) DIV 2").alias("needle")).select(
        "needle",
        F.expr(f"{np1} DIV 62").alias("nw1"),
        F.expr(f"{np2} DIV 62").alias("nw2"),
        F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST({np1} % 62 AS INT))"
        ).alias("nb1"),
        F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST({np2} % 62 AS INT))"
        ).alias("nb2"),
    )
    u1, u2 = _bloom_pos("user_id")

    def contrib(word: str) -> str:
        return (
            f"(CASE WHEN {u1} DIV 62 = {word}"
            f" THEN shiftleft(CAST(1 AS BIGINT), CAST({u1} % 62 AS INT))"
            " ELSE CAST(0 AS BIGINT) END)"
            f" | (CASE WHEN {u2} DIV 62 = {word}"
            f" THEN shiftleft(CAST(1 AS BIGINT), CAST({u2} % 62 AS INT))"
            " ELSE CAST(0 AS BIGINT) END)"
        )

    m = ev.crossJoin(F.broadcast(nd)).select(
        F.expr(f"event_id DIV {_BLOOM_GRANULE}").alias("granule"),
        F.col("user_id").alias("u"),
        "needle",
        "nb1",
        "nb2",
        F.expr(contrib("nw1")).alias("m1"),
        F.expr(contrib("nw2")).alias("m2"),
    )
    g = m.groupBy("granule").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.expr("bit_or(m1)").alias("b1"),
        F.expr("bit_or(m2)").alias("b2"),
        F.min("u").alias("min_u"),
        F.max("u").alias("max_u"),
        F.max("needle").alias("needle"),
        F.max("nb1").alias("nb1"),
        F.max("nb2").alias("nb2"),
        F.count_if(F.col("u") == F.col("needle")).alias("n_exact"),
    )
    return g.select(
        "granule",
        "n_rows",
        F.col("b1").alias("probe_word1"),
        F.col("b2").alias("probe_word2"),
        "min_u",
        "max_u",
        F.expr(
            "CAST(CASE WHEN (b1 & nb1) = nb1 AND (b2 & nb2) = nb2"
            " THEN 1 ELSE 0 END AS INT)"
        ).alias("bloom_hit"),
        F.expr(
            "CAST(CASE WHEN needle BETWEEN min_u AND max_u"
            " THEN 1 ELSE 0 END AS INT)"
        ).alias("minmax_hit"),
        F.expr(
            "CAST(CASE WHEN n_exact > 0 THEN 1 ELSE 0 END AS INT)"
        ).alias("true_hit"),
    )


#: set(N) skip-index cap: granules whose distinct-value set exceeds N
#: store NO index entry and can never be pruned (ClickHouse's exact
#: semantics for `INDEX i col TYPE set(N)`).  8 comfortably holds the
#: 1-3 distinct days real ingest order packs per 512-row granule while
#: staying small enough that a shuffled/unclustered column (avg ~480
#: distinct users per granule) would disable the index — which is the
#: honest story: set indexes only pay on locally-clustered columns.
_SET_INDEX_CAP = 8


@register(
    "scan_set_skip_index",
    oracle=f"""
WITH nd AS (
  SELECT CAST(date_trunc('day', MAX(ts) - INTERVAL 15 DAY) AS DATE)
           AS needle
  FROM events
),
b AS (
  SELECT event_id // {_BLOOM_GRANULE} AS granule,
         CAST(date_trunc('day', ts) AS DATE) AS day, needle
  FROM events CROSS JOIN nd
),
g AS (
  SELECT granule, COUNT(*) AS n_rows,
         CAST(COUNT(DISTINCT day) AS BIGINT) AS n_days,
         MIN(day) AS min_day, MAX(day) AS max_day,
         MAX(needle) AS needle,
         COUNT(*) FILTER (day = needle) AS n_match
  FROM b GROUP BY granule
)
SELECT granule, n_rows, n_days, min_day, max_day,
       CAST(CASE WHEN n_days <= {_SET_INDEX_CAP} THEN 1 ELSE 0 END
            AS INTEGER) AS set_usable,
       CAST(CASE WHEN n_days > {_SET_INDEX_CAP} OR n_match > 0
            THEN 1 ELSE 0 END AS INTEGER) AS set_hit,
       CAST(CASE WHEN needle BETWEEN min_day AND max_day
            THEN 1 ELSE 0 END AS INTEGER) AS minmax_hit,
       CAST(CASE WHEN n_match > 0 THEN 1 ELSE 0 END AS INTEGER)
         AS true_hit
FROM g
""",
)
def scan_set_skip_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``set(N)`` SKIP-INDEX twin — completing the
    data-skipping family (minmax: scan_sorted_layout_prune; curve:
    scan_zorder_layout; hash: scan_bloom_skip_index; exact-set: this):
    each granule stores the exact distinct-value set of the indexed
    column UNLESS it exceeds N = 8 entries, in which case the granule
    has no index and can never be pruned — ClickHouse's exact
    semantics, including the failure mode.  Indexed column: the event
    DAY, which real append-order ingestion packs 1-3-distinct per
    512-row granule (measured on the fixtures) — the locally-clustered
    column a set index is FOR; the same geometry on the shuffled
    user_id column (~480 distinct per granule) would exceed any sane N
    and disable every granule, which is why the bloom twin owns that
    column.  Probe: the day 15 days before max ts — data-derived,
    mid-range of the fixtures' 30-day window, so the needle day always
    exists and the prune rate is non-vacuous at every SF.

    Surface per granule: n_rows, the set size, the minmax envelope,
    and the three verdicts — set_usable, set_hit (unusable granules
    are ALWAYS hit: no index entry means no pruning), minmax_hit,
    true_hit.  Contracts, property-tested: set_hit >= true_hit (no
    false negatives), and set_usable = 1 implies set_hit == true_hit
    (the set is EXACT where it exists — unlike the bloom, it never
    false-positives).

    Measured: sf0.001's two 500-row granules each span ~15 days —
    over the cap, index disabled, both always-hit (the fallback path,
    exercised); sf0.01/sf0.1 every granule usable and set_hit == true
    (1/20, 7/196); sf1 set prunes to exactly the 74 true granules while
    minmax keeps 83 — ingest jitter puts the needle day inside 9
    envelopes that don't contain it, the set-beats-minmax case that
    justifies the index.

    Build is one map-combined groupBy(granule) whose only extra cost
    over minmax is the per-granule distinct (bounded by N+1 useful
    entries; Spark's partial distinct keeps it map-side).  At 100 TB
    the index is |granules| rows and the probe touches only it."""
    ev = table(spark, sf_dir, "events")
    nd = ev.agg(F.max("ts").alias("mx")).select(
        F.to_date(
            F.date_trunc("day", F.col("mx") - F.expr("INTERVAL 15 DAYS"))
        ).alias("needle")
    )
    b = ev.crossJoin(F.broadcast(nd)).select(
        F.expr(f"event_id DIV {_BLOOM_GRANULE}").alias("granule"),
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"),
        "needle",
    )
    g = b.groupBy("granule").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("day").alias("n_days"),
        F.min("day").alias("min_day"),
        F.max("day").alias("max_day"),
        F.max("needle").alias("needle"),
        F.count_if(F.col("day") == F.col("needle")).alias("n_match"),
    )
    return g.select(
        "granule",
        "n_rows",
        "n_days",
        "min_day",
        "max_day",
        F.expr(
            f"CAST(CASE WHEN n_days <= {_SET_INDEX_CAP} THEN 1 ELSE 0 END"
            " AS INT)"
        ).alias("set_usable"),
        F.expr(
            f"CAST(CASE WHEN n_days > {_SET_INDEX_CAP} OR n_match > 0"
            " THEN 1 ELSE 0 END AS INT)"
        ).alias("set_hit"),
        F.expr(
            "CAST(CASE WHEN needle BETWEEN min_day AND max_day"
            " THEN 1 ELSE 0 END AS INT)"
        ).alias("minmax_hit"),
        F.expr(
            "CAST(CASE WHEN n_match > 0 THEN 1 ELSE 0 END AS INT)"
        ).alias("true_hit"),
    )


#: tokenbf granule: documents per skip-index granule.  Smaller than the
#: 512-row numeric granule because the indexed unit is a token SET (a
#: 32-doc granule holds ~hundreds of distinct tokens against m = 3968
#: bits / k = 2 — ~10% fill; 512 docs would saturate the filter, which
#: is exactly the sizing lesson ClickHouse documents for tokenbf_v1).
_TOKENBF_GRANULE = 32


@register(
    "scan_tokenbf_skip_index",
    oracle=f"""
WITH toks AS (
  SELECT doc_id, doc_id // {_TOKENBF_GRANULE} AS granule, tok
  FROM (SELECT doc_id,
               unnest(list_distinct(
                 regexp_split_to_array(lower(text), '[^a-z]+'))) AS tok
        FROM documents) u
  WHERE tok <> ''
),
nd AS (
  SELECT tok AS ndl,
         (('0x' || substr(md5(tok), 1, 8))::BIGINT % 3968) AS np1,
         (('0x' || substr(md5(tok), 9, 8))::BIGINT % 3968) AS np2
  FROM (SELECT tok, COUNT(*) AS df FROM toks GROUP BY tok
        ORDER BY df, tok LIMIT 1)
),
m AS (
  SELECT granule, doc_id, CAST(tok = ndl AS INTEGER) AS is_ndl,
         np1 // 62 AS nw1, np2 // 62 AS nw2,
         (CAST(1 AS BIGINT) << CAST(np1 % 62 AS INTEGER)) AS nb1,
         (CAST(1 AS BIGINT) << CAST(np2 % 62 AS INTEGER)) AS nb2,
         ('0x' || substr(md5(tok), 1, 8))::BIGINT % 3968 AS p1,
         ('0x' || substr(md5(tok), 9, 8))::BIGINT % 3968 AS p2
  FROM toks CROSS JOIN nd
),
c AS (
  SELECT granule, doc_id, is_ndl, nb1, nb2,
         (CASE WHEN p1 // 62 = nw1
               THEN (CAST(1 AS BIGINT) << CAST(p1 % 62 AS INTEGER))
               ELSE 0 END)
       | (CASE WHEN p2 // 62 = nw1
               THEN (CAST(1 AS BIGINT) << CAST(p2 % 62 AS INTEGER))
               ELSE 0 END) AS m1,
         (CASE WHEN p1 // 62 = nw2
               THEN (CAST(1 AS BIGINT) << CAST(p1 % 62 AS INTEGER))
               ELSE 0 END)
       | (CASE WHEN p2 // 62 = nw2
               THEN (CAST(1 AS BIGINT) << CAST(p2 % 62 AS INTEGER))
               ELSE 0 END) AS m2
  FROM m
),
g AS (
  SELECT granule,
         CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
         CAST(COUNT(*) AS BIGINT) AS n_postings,
         bit_or(m1) AS b1, bit_or(m2) AS b2,
         MAX(nb1) AS nb1, MAX(nb2) AS nb2,
         CAST(SUM(is_ndl) AS BIGINT) AS n_match
  FROM c GROUP BY granule
)
SELECT granule, n_docs, n_postings,
       b1 AS probe_word1, b2 AS probe_word2,
       CAST(CASE WHEN (b1 & nb1) = nb1 AND (b2 & nb2) = nb2
            THEN 1 ELSE 0 END AS INTEGER) AS tokenbf_hit,
       CAST(CASE WHEN n_match > 0 THEN 1 ELSE 0 END AS INTEGER)
         AS true_hit
FROM g
""",
)
def scan_tokenbf_skip_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``tokenbf_v1`` SKIP-INDEX twin — the TEXT member that
    completes the data-skipping family (minmax: scan_sorted_layout_prune;
    curve: scan_zorder_layout; hash: scan_bloom_skip_index; exact-set:
    scan_set_skip_index): each 32-doc granule stores a Bloom filter
    (m = 3968 bits, k = 2) over the granule's DISTINCT TOKEN set, and a
    ``hasToken(text, needle)`` / token-boundary LIKE predicate probes it
    — the index that lets a log-search engine skip message granules
    without reading a byte of text.

    Probe needle: the corpus's RAREST token (min document frequency,
    token ASC tiebreak — a deterministic data-derived rule; on the
    fixtures it picks the planted near-dup marker at ~5% df), so the
    prune rate is non-vacuous at every SF: most granules lack the
    needle and a correct filter proves it cheaply.

    Hashes: TWO INDEPENDENT 32-bit slices of one md5 (chars 1-8 and
    9-16) — the repo's portable cross-engine hash (text_fingerprint
    convention), chosen over the integer lattice deliberately: k = 2
    genuinely independent functions, and no ``h * mult`` product, so
    the _bloom_pos id-magnitude precondition doesn't exist here at all.
    Bit layout matches scan_bloom_skip_index exactly: 64 words x 62
    bits, and the reader fetches only the needle's two PROBE WORDS —
    never the whole filter.

    Contracts, property-tested: tokenbf_hit >= true_hit (no false
    negatives — the Bloom contract); false positives possible and
    expected (~1% at the measured ~10% fill).

    Scale: tokenization is one map-side explode of per-doc DISTINCT
    tokens; the needle argmin is a vocabulary-bounded agg feeding a
    1-row broadcast (TakeOrderedAndProject, never a sort); the build
    is ONE map-combined groupBy(granule) OR-folding each posting's two
    bit contributions to the two probe words.  At 100 TB the full
    index is |granules| x 64 words — orders smaller than the text —
    and this plan materializes only the 2 probed words per granule
    because the verdict needs nothing else."""
    d = table(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id",
        F.expr(f"doc_id DIV {_TOKENBF_GRANULE}").alias("granule"),
        F.explode(
            F.array_distinct(F.split(F.lower("text"), "[^a-z]+"))
        ).alias("tok"),
    ).filter(F.col("tok") != "")

    def h32(col: str, lo: int) -> str:
        return f"CAST(conv(substring(md5({col}), {lo}, 8), 16, 10) AS BIGINT)"

    nd = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
        .orderBy("df", "tok")
        .limit(1)
        .select(
            F.col("tok").alias("ndl"),
            F.expr(f"{h32('tok', 1)} % 3968").alias("np1"),
            F.expr(f"{h32('tok', 9)} % 3968").alias("np2"),
        )
    )
    m = toks.crossJoin(F.broadcast(nd)).select(
        "granule",
        "doc_id",
        F.expr("CAST(tok = ndl AS INT)").alias("is_ndl"),
        F.expr("np1 DIV 62").alias("nw1"),
        F.expr("np2 DIV 62").alias("nw2"),
        F.expr(
            "shiftleft(CAST(1 AS BIGINT), CAST(np1 % 62 AS INT))"
        ).alias("nb1"),
        F.expr(
            "shiftleft(CAST(1 AS BIGINT), CAST(np2 % 62 AS INT))"
        ).alias("nb2"),
        F.expr(f"{h32('tok', 1)} % 3968").alias("p1"),
        F.expr(f"{h32('tok', 9)} % 3968").alias("p2"),
    )

    def contrib(word: str) -> str:
        return (
            f"(CASE WHEN p1 DIV 62 = {word}"
            " THEN shiftleft(CAST(1 AS BIGINT), CAST(p1 % 62 AS INT))"
            " ELSE CAST(0 AS BIGINT) END)"
            f" | (CASE WHEN p2 DIV 62 = {word}"
            " THEN shiftleft(CAST(1 AS BIGINT), CAST(p2 % 62 AS INT))"
            " ELSE CAST(0 AS BIGINT) END)"
        )

    g = (
        m.select(
            "granule",
            "doc_id",
            "is_ndl",
            "nb1",
            "nb2",
            F.expr(contrib("nw1")).alias("m1"),
            F.expr(contrib("nw2")).alias("m2"),
        )
        .groupBy("granule")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count(F.lit(1)).alias("n_postings"),
            F.expr("bit_or(m1)").alias("b1"),
            F.expr("bit_or(m2)").alias("b2"),
            F.max("nb1").alias("nb1"),
            F.max("nb2").alias("nb2"),
            F.sum("is_ndl").cast("bigint").alias("n_match"),
        )
    )
    return g.select(
        "granule",
        "n_docs",
        "n_postings",
        F.col("b1").alias("probe_word1"),
        F.col("b2").alias("probe_word2"),
        F.expr(
            "CAST(CASE WHEN (b1 & nb1) = nb1 AND (b2 & nb2) = nb2"
            " THEN 1 ELSE 0 END AS INT)"
        ).alias("tokenbf_hit"),
        F.expr(
            "CAST(CASE WHEN n_match > 0 THEN 1 ELSE 0 END AS INT)"
        ).alias("true_hit"),
    )


@register(
    "scan_projection_route",
    oracle="""
WITH dt AS (
  SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate FROM orders
  WHERE o_orderdate >= TIMESTAMP '1997-03-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
),
ck AS (
  SELECT needle FROM (SELECT MAX(o_custkey) // 2 AS needle FROM orders)
),
cu AS (
  SELECT o.o_orderkey, o.o_custkey, o.o_totalprice, o.o_orderdate
  FROM orders o, ck WHERE o.o_custkey = ck.needle
)
SELECT 'date_window' AS probe, 'by_orderdate' AS layout,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)
         AS sum_price,
       CAST(MIN(o_orderkey) AS BIGINT) AS min_key,
       CAST(MAX(o_orderkey) AS BIGINT) AS max_key
FROM dt
UNION ALL
SELECT 'cust_point', 'by_custkey',
       CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE),
       CAST(MIN(o_orderkey) AS BIGINT),
       CAST(MAX(o_orderkey) AS BIGINT)
FROM cu
""",
)
def scan_projection_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse PROJECTIONS twin — the last member of the data-layout
    family (sorted layout / z-order / the four skip indexes): a table
    stores ALTERNATIVE SORT ORDERS of the same rows (`ALTER TABLE ...
    ADD PROJECTION p_cust (SELECT * ORDER BY o_custkey)`), and the
    reader ROUTES each query to the layout whose sort key matches its
    predicate — time-windowed scans hit the date-sorted primary, point
    lookups on a foreign key hit the projection, and both return
    identical rows because a projection is the same data.

    Landed here as two parquet layouts of `orders` in the scratch sink
    (repartitionByRange + sortWithinPartitions on o_orderdate /
    o_custkey — each the scan_sorted_layout_prune recipe), plus the
    routing rule ClickHouse's analyzer applies: equality/range
    predicate column == layout sort key.  Two probes, both READ BACK
    from their routed layout: a one-month date window and a
    data-derived customer point lookup (MAX(o_custkey) DIV 2).  The
    oracle computes both from the BASE table — equality proves the
    projection contract (rerouted reads lose nothing), while each
    routed scan's PushedFilters hit row-group stats that the matching
    sort made narrow (the pruning win, asserted in tests/test_plans.py:
    the date range AND the custkey EQUALITY both reach their scans).
    The needle is collected to a literal first — a 1-row, 1-column
    bounded collect (the probe parameter, not data volume) — because a
    broadcast-joined needle only pushes IsNotNull; the equality must be
    a literal at plan time to reach row-group stats (r12 ADVICE #2).

    Scale: the write cost is one range-exchange + in-task sort PER
    LAYOUT, paid once at ingest (exactly ClickHouse's projection
    build); the read win at 100 TB is the scan_sorted_layout_prune
    argument applied per query shape — each query reads O(selected)
    row groups from ITS layout instead of O(table) from a single
    compromise order.  Routing is a planning-time string match; no
    runtime cost at all."""
    src = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"
    )
    sinks = {}
    for col_ in ("o_orderdate", "o_custkey"):
        sink = scratch_path(f"proj_{col_}", os.path.basename(sf_dir))
        (
            src.repartitionByRange(8, col_)
            .sortWithinPartitions(col_)
            .write.mode("overwrite")
            .parquet(sink)
        )
        sinks[col_] = sink

    def probe_agg(df: DataFrame, probe: str, layout: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("o_totalprice").cast("decimal(12,2)"))
            .cast("double")
            .alias("sum_price"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
        ).select(
            F.lit(probe).alias("probe"),
            F.lit(layout).alias("layout"),
            "n_rows",
            "sum_price",
            "min_key",
            "max_key",
        )

    # ROUTE: predicate column == layout sort key (the analyzer rule)
    dt = spark.read.parquet(sinks["o_orderdate"]).filter(
        (F.col("o_orderdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    # 1-row/1-col bounded collect: the probe PARAMETER (MAX DIV 2), so
    # the equality is a plan-time literal that reaches PushedFilters.
    # MAX over an empty orders table is NULL: default the needle to 0
    # (the probe then selects nothing, matching the empty layout).
    needle = src.agg(F.expr("MAX(o_custkey) DIV 2").alias("needle")).first()[0]
    cu = spark.read.parquet(sinks["o_custkey"]).filter(
        F.col("o_custkey") == F.lit(int(needle) if needle is not None else 0)
    )
    return probe_agg(dt, "date_window", "by_orderdate").unionAll(
        probe_agg(cu, "cust_point", "by_custkey")
    )
