"""Batch twins of streaming semantics (SURVEY.md section 2.J).

sessionize_batch is the SQL-checkable twin of stream_session: identical
gap-merge semantics (a new session starts when the gap since the previous
event reaches the 30-minute threshold; Spark session windows are
[start, last_event + gap), so an event landing exactly at the boundary
opens a NEW session — the oracle uses >= to match).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..session import table

GAP_MINUTES = 30


@register(
    "sessionize_batch",
    oracle=f"""
WITH gaps AS (
  SELECT user_id, ts, event_id,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   >= INTERVAL {GAP_MINUTES} MINUTE
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sess AS (
  SELECT user_id, ts,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS session_id
  FROM gaps
)
SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS last_event, COUNT(*) AS n_events
FROM sess GROUP BY user_id, session_id
""",
)
def sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: lag + gap flag + running sum = session id,
    then per-session aggregates. One shuffle on user_id and an
    in-partition sort — the batch-mode equivalent of session_window
    state merging, and the pattern for backfilling session tables at
    100 TB (partition-parallel per user, no global sort)."""
    ev = table(spark, sf_dir, "events")
    order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(order)
    # microsecond-exact gap comparison (truncating to seconds would flip
    # boundary sessions vs the oracle's interval arithmetic)
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(prev_ts)
    new_session = F.when(
        prev_ts.isNull() | (gap_us >= GAP_MINUTES * 60 * 1_000_000), 1
    ).otherwise(0)
    running = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        ev.withColumn("new_session", new_session)
        .withColumn("session_id", F.sum("new_session").over(running))
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("last_event"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("user_id", "session_start", "last_event", "n_events")
    )
