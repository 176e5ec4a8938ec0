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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..session import table
from ._util import D4, davg, dec, dsum, sql_davg, sql_dsum

_Q1_CUTOFF = "1998-09-02 00:00:00"


def flagship_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped flagship: filter -> groupBy -> 8 aggregates.

    Physical plan at scale: parquet scan with l_shipdate predicate pushed
    to row groups + only 7 columns read -> partial HashAggregate ->
    shuffle on (l_returnflag, l_linestatus) [tiny: <=6 groups] -> final
    HashAggregate. One shuffle, whole-stage codegen end to end.
    """
    li = table(spark, sf_dir, "lineitem")
    price = dec("l_extendedprice")
    one = F.lit(1).cast(D4)
    disc_price = price * (one - dec("l_discount", D4))
    charge = disc_price * (one + dec("l_tax", D4))
    return (
        li.filter(F.col("l_shipdate") <= F.lit(_Q1_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
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
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
           AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                * (CAST(1 AS DECIMAL(4,2)) - CAST(l_discount AS DECIMAL(4,2)))
                * (CAST(1 AS DECIMAL(4,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE)
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
