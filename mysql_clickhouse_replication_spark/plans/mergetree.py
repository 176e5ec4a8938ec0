"""ClickHouse MergeTree-family sink semantics as batch plans (round 4).

The reference's sink tables are MergeTree variants; ReplacingMergeTree
("latest version per pk wins") is covered by plans/cdc.py.  This module
adds the other two engine behaviors a MySQL->ClickHouse replicator
actually deploys, as exact batch twins over the events changelog:

* ``cdc_collapsing_sign`` — CollapsingMergeTree: every new version of a
  row is written as a cancel row (sign=-1) for the previous state plus a
  state row (sign=+1); background merges annihilate matched pairs so a
  table holds only live states without a read-time window.
* ``cdc_ttl_expiry`` — MergeTree TTL: rows age out after a fixed
  interval; parts whose max ts passed the TTL are dropped at merge time.

Both are pure DataFrame plans: one pk-keyed window + one aggregation —
the same shuffle shape ClickHouse pays in its merges.  100 TB: all keyed
by pk/event_type, no broadcast of anything unbounded, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..session import table

# The shared changelog decode (kept in lockstep with plans/cdc.py's
# _DECODE_SQL; only the columns this module needs).
_DECODE = """
SELECT CASE WHEN event_type = 'signup' THEN 'insert'
            WHEN event_type = 'error'  THEN 'delete'
            ELSE 'update' END AS op,
       user_id AS pk, event_id AS seq, value
FROM events
"""


@register(
    "cdc_collapsing_sign",
    oracle=f"""
WITH decoded AS ({_DECODE.strip()}),
seq AS (
  SELECT op, pk, seq, value,
         LAG(op)    OVER w AS prev_op,
         LAG(seq)   OVER w AS prev_seq,
         LAG(value) OVER w AS prev_value
  FROM decoded
  WINDOW w AS (PARTITION BY pk ORDER BY seq)
),
signed AS (
  SELECT pk, seq, value, 1 AS sign FROM seq WHERE op != 'delete'
  UNION ALL
  SELECT pk, prev_seq AS seq, prev_value AS value, -1 AS sign
  FROM seq WHERE prev_seq IS NOT NULL AND prev_op != 'delete'
)
SELECT pk, seq, value, SUM(sign) AS net_sign
FROM signed GROUP BY pk, seq, value
HAVING SUM(sign) != 0
""",
)
def cdc_collapsing_sign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CollapsingMergeTree twin: render the changelog as signed state /
    cancel rows, then merge-collapse matched pairs; what survives
    (net_sign != 0) is exactly the live state of every pk — the newest
    non-delete version, or nothing if the pk's last op is a delete.

    Construction (the replicator's write path): every non-delete event
    emits a state row (+1) carrying its version; every event whose pk
    had a previous non-delete version additionally emits that previous
    version as a cancel row (-1).  The merge is then a plain
    groupBy(pk, seq, value).sum(sign) — annihilated pairs drop out.

    Shape: ONE pk-keyed window (LAG) feeding a union of two projections,
    then ONE aggregation — hashpartitioning(pk) from the window satisfies
    the groupBy's distribution on its prefix, and Spark reuses the
    exchange.  This is the identical shuffle ClickHouse's merge pays;
    sign-collapse never compares across pks, so skew defense is the
    same AQE story as cdc_apply_upsert."""
    ev = table(spark, sf_dir, "events")
    decoded = ev.select(
        F.when(F.col("event_type") == "signup", "insert")
        .when(F.col("event_type") == "error", "delete")
        .otherwise("update")
        .alias("op"),
        F.col("user_id").alias("pk"),
        F.col("event_id").alias("seq"),
        "value",
    )
    w = Window.partitionBy("pk").orderBy("seq")
    seq = decoded.select(
        "op",
        "pk",
        "seq",
        "value",
        F.lag("op").over(w).alias("prev_op"),
        F.lag("seq").over(w).alias("prev_seq"),
        F.lag("value").over(w).alias("prev_value"),
    )
    states = seq.filter(F.col("op") != "delete").select(
        "pk", "seq", "value", F.lit(1).alias("sign")
    )
    cancels = seq.filter(
        F.col("prev_seq").isNotNull() & (F.col("prev_op") != "delete")
    ).select(
        "pk",
        F.col("prev_seq").alias("seq"),
        F.col("prev_value").alias("value"),
        F.lit(-1).alias("sign"),
    )
    return (
        states.unionByName(cancels)
        .groupBy("pk", "seq", "value")
        .agg(F.sum("sign").alias("net_sign"))
        .filter(F.col("net_sign") != 0)
    )


@register(
    "cdc_ttl_expiry",
    oracle="""
SELECT event_type,
       COUNT(*) AS n_total,
       COUNT(*) FILTER (ts <  mx - INTERVAL 30 DAY) AS n_expired,
       COUNT(*) FILTER (ts >= mx - INTERVAL 30 DAY) AS n_retained,
       MIN(ts)  FILTER (ts >= mx - INTERVAL 30 DAY) AS min_retained_ts,
       MAX(ts) AS max_ts
FROM events CROSS JOIN (SELECT MAX(ts) AS mx FROM events)
GROUP BY event_type
""",
)
def cdc_ttl_expiry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MergeTree ``TTL ts + INTERVAL 30 DAY`` twin: classify every row
    as retained or expired against a 30-day horizon anchored at the
    table's max ts (deterministic — wall clock would flip hashes), and
    report the per-type drop profile a TTL merge would apply.  This is
    the replication-side capacity answer: what fraction of the sink
    disappears at the next TTL merge.

    Shape: a 1-row global max broadcast-crossed into the scan (the
    repo's scalar-threshold pattern), then one groupBy(event_type) with
    conditional aggregates — two scans of events, zero row expansion,
    no window.  At 100 TB the anchor agg is a map-side-combined
    min/max; production would read it off partition stats instead."""
    ev = table(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("mx"))
    horizon = F.col("mx") - F.expr("INTERVAL 30 DAYS")
    retained = F.col("ts") >= horizon
    return (
        ev.crossJoin(F.broadcast(mx))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.count_if(~retained).alias("n_expired"),
            F.count_if(retained).alias("n_retained"),
            F.min(F.when(retained, F.col("ts"))).alias("min_retained_ts"),
            F.max("ts").alias("max_ts"),
        )
    )
