"""Window-function operators (SURVEY.md section 2.F).

Reference parity: ClickHouse window functions over replicated tables
(SURVEY.md section 3.1; [P:med] — empty snapshot, no citable file:line).

Scale notes (100 TB): every window here is partitionBy(key) — ONE shuffle
keyed by the partition column, then an in-partition sort; no global sort
anywhere. Frame aggregates over DOUBLE go through exact DECIMAL casts:
engines disagree on frame-summation order (DuckDB uses segment trees,
Spark streams the frame), so only order-insensitive exact arithmetic
hash-matches.

Determinism rules: row_number/ntile demand a TOTAL order -> unique
tiebreak column in the ORDER BY; rank/dense_rank are exercised on a
tie-heavy key instead (their outputs are per-value deterministic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..session import table


@register(
    "win_ranking",
    oracle="""
SELECT o_custkey, o_orderkey,
       ROW_NUMBER() OVER (PARTITION BY o_custkey
                          ORDER BY o_totalprice DESC, o_orderkey) AS rn,
       RANK()       OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) AS rk,
       DENSE_RANK() OVER (PARTITION BY o_custkey ORDER BY o_orderpriority) AS drk,
       NTILE(4)     OVER (PARTITION BY o_custkey
                          ORDER BY o_totalprice DESC, o_orderkey) AS quartile
FROM orders
""",
)
def win_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number/ntile over a total order (unique o_orderkey tiebreak);
    rank/dense_rank over the tie-heavy priority column so gap semantics
    are actually exercised."""
    o = table(spark, sf_dir, "orders")
    w_total = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    w_ties = Window.partitionBy("o_custkey").orderBy("o_orderpriority")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w_total).alias("rn"),
        F.rank().over(w_ties).alias("rk"),
        F.dense_rank().over(w_ties).alias("drk"),
        F.ntile(4).over(w_total).alias("quartile"),
    )


@register(
    "win_analytic",
    oracle="""
SELECT user_id, event_id, value,
       LAG(value)  OVER w AS prev_value,
       LEAD(value) OVER w AS next_value,
       FIRST_VALUE(value) OVER w AS first_value,
       NTH_VALUE(value, 2) OVER w AS second_value
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""",
)
def win_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/first_value/nth_value per user in event order (event_id
    breaks ts ties). Values pass through untouched -> bit-exact."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wo = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        "value",
        F.lag("value").over(wo).alias("prev_value"),
        F.lead("value").over(wo).alias("next_value"),
        F.first("value").over(w).alias("first_value"),
        F.nth_value("value", 2).over(w).alias("second_value"),
    )


@register(
    "win_frame_rows",
    oracle="""
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
           AS running_spend,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
            PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
           AS spend_last3
FROM orders
""",
)
def win_frame_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running + sliding ROWS-frame sums per customer in order-date order.
    DECIMAL-exact inside the frame (engines sum frames in different
    orders), surfaced as DOUBLE."""
    o = table(spark, sf_dir, "orders")
    base = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    run = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    last3 = base.rowsBetween(-2, Window.currentRow)
    price = F.col("o_totalprice").cast("decimal(12,2)")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(price).over(run).cast("double").alias("running_spend"),
        F.sum(price).over(last3).cast("double").alias("spend_last3"),
    )


@register(
    "win_frame_range",
    oracle="""
SELECT user_id, event_id,
       COUNT(*) OVER w AS n_last_hour,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE) AS sum_last_hour
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
""",
)
def win_frame_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based RANGE frame: per-user trailing-hour event count and
    (decimal-exact) value sum, ordered by MICROSECOND epoch — second
    granularity would flip boundary rows (Spark unix_timestamp floors,
    DuckDB's epoch cast rounds). RANGE peers (equal timestamps) are
    included identically by both engines."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    val = F.col("value").cast("decimal(12,2)")
    return ev.select(
        "user_id",
        "event_id",
        F.count(F.lit(1)).over(w).alias("n_last_hour"),
        F.sum(val).over(w).cast("double").alias("sum_last_hour"),
    )


@register(
    "win_percent",
    oracle="""
SELECT c_nationkey, c_custkey,
       PERCENT_RANK() OVER w AS pct_rank,
       CUME_DIST()    OVER w AS cume
FROM customer
WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal)
""",
)
def win_percent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank/cume_dist of account balance within nation. Both are a
    single integer-ratio division -> bit-identical across engines; balance
    ties (if any) resolve to the same rank in both."""
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal")
    return c.select(
        "c_nationkey",
        "c_custkey",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@register(
    "win_ntile",
    oracle="""
SELECT c_mktsegment, c_custkey,
       NTILE(4) OVER (PARTITION BY c_mktsegment
                      ORDER BY c_acctbal, c_custkey) AS quartile
FROM customer
""",
)
def win_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE(4) balance quartiles within market segment — the windowed
    bucketing used for cohort splits and percentile banding. The order
    carries a c_custkey tiebreak so equal balances bucket identically in
    both engines (both implement standard NTILE: remainder rows go to
    the leading buckets). One shuffle on the partition key; in-partition
    sort only."""
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_mktsegment", "c_custkey", F.ntile(4).over(w).alias("quartile")
    )


@register(
    "win_ignore_nulls",
    oracle="""
WITH t AS (
  SELECT c_custkey, c_mktsegment,
         CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS pos_bal
  FROM customer
), g AS (
  SELECT c_custkey, c_mktsegment, pos_bal,
         COUNT(pos_bal) OVER (PARTITION BY c_mktsegment ORDER BY c_custkey
                              ROWS UNBOUNDED PRECEDING) AS grp
  FROM t
)
SELECT c_custkey, c_mktsegment, pos_bal,
       MAX(pos_bal) OVER (PARTITION BY c_mktsegment, grp) AS last_pos_bal,
       CASE WHEN grp = 0 THEN 1 ELSE 0 END AS before_first
FROM g
""",
)
def win_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAST_VALUE ... IGNORE NULLS semantics (the forward-fill /
    most-recent-observation window) over a null-bearing measure —
    negative balances null out and each row carries the latest
    non-null balance seen so far in its segment.  Implemented with the
    PORTABLE count-of-non-nulls trick (grp is constant within a null
    run, so MAX within (segment, grp) IS the last non-null) rather
    than the engine-specific IGNORE NULLS modifier, because the
    modifier's syntax and availability differ across engines while the
    trick is plain SQL-92 everywhere — same single-shuffle plan: both
    windows share the (c_mktsegment) partitioning, so Catalyst runs
    them off one exchange.  before_first flags rows preceding any
    observation (LOCF has nothing to fill; they stay NULL)."""
    c = table(spark, sf_dir, "customer")
    t = c.select(
        "c_custkey",
        "c_mktsegment",
        F.when(F.col("c_acctbal") < 0, None)
        .otherwise(F.col("c_acctbal"))
        .alias("pos_bal"),
    )
    w_run = (
        Window.partitionBy("c_mktsegment")
        .orderBy("c_custkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    g = t.withColumn("grp", F.count("pos_bal").over(w_run))
    w_grp = Window.partitionBy("c_mktsegment", "grp")
    return g.select(
        "c_custkey",
        "c_mktsegment",
        "pos_bal",
        F.max("pos_bal").over(w_grp).alias("last_pos_bal"),
        F.when(F.col("grp") == 0, 1).otherwise(0).alias("before_first"),
    )


@register(
    "win_reset_running_sum",
    oracle="""
WITH o AS (
  SELECT o_custkey, o_orderkey, o_orderdate,
         CAST(o_totalprice AS DECIMAL(12,2)) AS price,
         CASE WHEN o_totalprice >= 400000 THEN 1 ELSE 0 END AS big
  FROM orders
), seg AS (
  SELECT *,
         COALESCE(SUM(big) OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND 1 PRECEDING), 0) AS seg_id
  FROM o
)
SELECT o_custkey, o_orderkey, CAST(seg_id AS BIGINT) AS seg_id,
       CAST(SUM(price) OVER (PARTITION BY o_custkey, seg_id
                             ORDER BY o_orderdate, o_orderkey
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND CURRENT ROW) AS DOUBLE)
         AS running_spend
FROM seg
""",
)
def win_reset_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional-reset running sum (gaps-and-islands cumulative): per
    customer, spend accumulates order-by-order and RESETS after any
    order of >= 400k — the 'running total since last milestone' shape
    behind loyalty-tier meters, error-budget counters, and
    since-last-compaction byte counters.  No engine has a native
    RESET frame; the portable recipe is two stacked windows: the
    strictly-preceding count of reset markers is constant within a
    segment (so it IS the segment id), then an ordinary cumulative sum
    partitioned by (customer, segment).

    Shape: both windows share the o_custkey partitioning, so Catalyst
    plans ONE exchange and two in-partition sorts (the second adds
    seg_id to the partition key but the data is already hash-placed by
    customer — no second shuffle).  At 100 TB this is a single
    shuffle of the fact keyed by customer; segment boundaries never
    cross partitions by construction.  Sums run over exact DECIMAL
    casts (fold-order-proof), surfaced as DOUBLE at the end."""
    o = table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.col("o_totalprice").cast("decimal(12,2)").alias("price"),
        F.when(F.col("o_totalprice") >= 400000, 1).otherwise(0).alias("big"),
    )
    w_prev = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seg = o.withColumn(
        "seg_id", F.coalesce(F.sum("big").over(w_prev), F.lit(0)).cast("bigint")
    )
    w_run = (
        Window.partitionBy("o_custkey", "seg_id")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return seg.select(
        "o_custkey",
        "o_orderkey",
        "seg_id",
        F.sum("price").over(w_run).cast("double").alias("running_spend"),
    )


@register(
    "win_time_range_frame",
    oracle="""
SELECT event_id, user_id, ts,
       COUNT(*) OVER w AS n_last_hour,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE)
         AS sum_last_hour
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
""",
)
def win_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-interval RANGE frame: per user, the trailing-one-hour
    event count and value sum at every event — the 'activity in the
    last hour, evaluated per event' window behind rate limiting,
    rolling exposure caps, and velocity features.  ROWS frames
    (win_frame_rows) count a fixed number of rows; RANGE-over-time
    frames cover a fixed TIME span, so bursty users get wide frames
    and sparse users narrow ones.

    Spark's rangeBetween needs a numeric ordering key, so ts is
    cast to EXACT epoch microseconds on BOTH engines (unix_micros /
    DuckDB epoch_us) — whole-second keys would silently truncate
    and shift frame membership for sub-second timestamps (caught by
    the sf0.1 gate run); engines with native INTERVAL frames
    compile to the same sliding two-pointer pass.  Shape: ONE
    shuffle keyed by user + one in-partition sort; both aggregates
    share the frame.  Exact decimal sums inside the frame."""
    ev = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3600 * 1000 * 1000, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.count(F.lit(1)).over(w).alias("n_last_hour"),
        F.sum(F.col("value").cast("decimal(12,2)"))
        .over(w)
        .cast("double")
        .alias("sum_last_hour"),
    )
