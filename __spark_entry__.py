"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All implementations live in ``mysql_clickhouse_replication_spark``;
this module only adapts the registry to the driver's interface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mysql_clickhouse_replication_spark import ORACLES, QUERIES, load_all


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1 shape) on /root/testdata/sf0.001."""
    load_all()
    return QUERIES["agg_groupby_multi"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md section 2."""
    load_all()
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL per query key (absent => rows-only check)."""
    load_all()
    return dict(ORACLES)
