"""Unit tests for the production connector plumbing (no live server:
option construction and validation only; the Spark-side contract twins
are the cdc_* registered keys)."""

from __future__ import annotations

import pytest

from mysql_clickhouse_replication_spark.sources.clickhouse import (
    jdbc_partitioned_options,
)


def test_parallel_snapshot_reader_options():
    opts = jdbc_partitioned_options(
        "jdbc:mysql://db:3306/shop",
        "shop.orders",
        "o_orderkey",
        lower_bound=1,
        upper_bound=6_000_000,
        num_partitions=1000,
    )
    assert opts["partitionColumn"] == "o_orderkey"
    assert opts["lowerBound"] == "1"
    assert opts["upperBound"] == "6000000"
    assert opts["numPartitions"] == "1000"
    assert opts["dbtable"] == "shop.orders"
    # everything stringly-typed: goes straight into DataFrameReader.options
    assert all(isinstance(v, str) for v in opts.values())


def test_parallel_snapshot_rejects_bad_bounds():
    with pytest.raises(ValueError):
        jdbc_partitioned_options("u", "t", "pk", 10, 1, 8)
    with pytest.raises(ValueError):
        jdbc_partitioned_options("u", "t", "pk", 1, 10, 0)


def test_events_ts_decodes_to_ltz_timestamp_for_all_fixtures(spark):
    """Fixture generations have shipped events.ts as parquet
    TIMESTAMP(NANOS) (read as raw longs under the legacy conf) and as
    TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ).  The loader must
    normalize BOTH to TIMESTAMP (LTZ) — event operators use
    unix_micros()/watermarks, which reject NTZ — without shifting
    instants (session TZ is pinned UTC)."""
    from pyspark.sql.types import TimestampType

    from mysql_clickhouse_replication_spark.session import table

    for sf in ("sf0.001", "sf0.01"):
        df = table(spark, f"/root/testdata/{sf}", "events")
        assert isinstance(df.schema["ts"].dataType, TimestampType), sf
        # unix_micros must analyze (the exact op that broke on NTZ)
        df.selectExpr("unix_micros(ts)").limit(1).collect()
