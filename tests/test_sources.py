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


# ---------------------------------------------------------------------------
# Binlog wire-format twin (sources/binlog_wire.py): raw v4 frames in,
# RowsEvent-shaped changelog rows out — the byte layer the live
# BinLogStreamReader would otherwise provide.


def _wire_fixture_rows():
    return [
        ("insert", 1, 10, 0.5),
        ("insert", 2, 11, None),  # NULL value -> null-bitmap bit
        ("update", 1, 12, 2.25),
        ("update", None, 13, 3.5),  # NULL pk (fixture has NULL user_id)
        ("delete", 2, 14, None),
        ("insert", 3, 15, -7.125),
    ]


def test_binlog_wire_roundtrip_with_nulls():
    from mysql_clickhouse_replication_spark.sources import binlog_wire as w

    rows = _wire_fixture_rows()
    buf = w.encode_changelog(rows)
    assert buf[:4] == w.MAGIC
    decoded = [r for r, _ in w.decode(buf)]
    assert decoded == rows


def test_binlog_wire_header_layout_is_v4():
    """The 19-byte little-endian v4 header must hold: event_size at
    offset 9 and log_pos (END of event) at offset 13 — the public
    layout a real replication client parses."""
    import struct

    from mysql_clickhouse_replication_spark.sources import binlog_wire as w

    buf = w.encode_changelog(_wire_fixture_rows())
    pos = 4
    while pos < len(buf):
        size = struct.unpack_from("<I", buf, pos + 9)[0]
        log_pos = struct.unpack_from("<I", buf, pos + 13)[0]
        assert size >= 19
        assert log_pos == (pos + size) & 0xFFFFFFFF
        pos += size
    assert pos == len(buf)  # events tile the file exactly

    # first event is FORMAT_DESCRIPTION with binlog_version 4
    assert buf[4 + 4] == w.FORMAT_DESCRIPTION_EVENT
    assert struct.unpack_from("<H", buf, 4 + 19)[0] == 4


def test_binlog_wire_resume_at_every_tx_boundary():
    """Every tx_end_pos the decoder hands out must be a valid resume
    offset: decode(buf, start=tx_end) yields exactly the suffix after
    that transaction — the (resume_stream=True, log_pos) contract."""
    from mysql_clickhouse_replication_spark.sources import binlog_wire as w

    rows = _wire_fixture_rows()
    buf = w.encode_changelog(rows)
    full = list(w.decode(buf))
    boundaries = sorted({pos for _, pos in full})
    for b in boundaries:
        suffix = [r for r, _ in w.decode(buf, start=b)]
        expect = [r for r, pos in full if pos > b]
        assert suffix == expect, f"resume at {b} diverged"


def test_binlog_wire_rejects_mid_transaction_range():
    """A byte range that ends between a ROWS event and its XID must
    refuse to emit the uncommitted rows (a replication client never
    re-delivers a half transaction)."""
    import pytest as _pytest

    from mysql_clickhouse_replication_spark.sources import binlog_wire as w

    buf = w.encode_changelog(_wire_fixture_rows())
    # find the first XID event and cut just before it
    import struct

    pos, xid_at = 4, None
    while pos < len(buf):
        if buf[pos + 4] == w.XID_EVENT:
            xid_at = pos
            break
        pos += struct.unpack_from("<I", buf, pos + 9)[0]
    assert xid_at is not None
    with _pytest.raises(ValueError, match="mid-transaction"):
        list(w.decode(buf, end=xid_at))


def test_binlog_wire_recorder_matches_batch_decode(spark, sf_dir):
    """record_changelog(events.parquet) -> decode must reproduce the
    cdc decode mapping row-for-row in seq order (the same op/pk/seq/
    value contract plans/cdc.py applies to the fixture directly)."""
    import duckdb

    from mysql_clickhouse_replication_spark.sources import binlog_wire as w

    path = f"{sf_dir}/events.parquet"
    f = w.record_changelog(path)
    with open(f, "rb") as fh:
        buf = fh.read()
    got = [r for r, _ in w.decode(buf)]
    exp = [
        tuple(r)
        for r in duckdb.connect()
        .execute(
            f"""
        SELECT CASE WHEN event_type = 'signup' THEN 'insert'
                    WHEN event_type = 'error'  THEN 'delete'
                    ELSE 'update' END,
               user_id, event_id, value
        FROM read_parquet('{path}') ORDER BY event_id"""
        )
        .fetchall()
    ]
    assert got == exp
