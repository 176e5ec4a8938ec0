"""Custom streaming source: binlog-tail stand-in via the Python Data
Source API (SURVEY.md section 2.A cdc_stream_source, section 4.3).

Reference parity: the reference tails the MySQL binlog with
python-mysql-replication's BinLogStreamReader(blocking=True,
resume_stream=True, log_file/log_pos) and decodes RowsEvents ([P:high],
SURVEY.md section 3.1). Spark has no binlog source, so this is the one
genuinely custom source in the engine: a ``DataSource`` +
``SimpleDataSourceStreamReader`` whose offset dict plays the role of the
binlog (log_file, log_pos) coordinate — monotonically increasing,
checkpointable by the engine, replayable between offsets (exactly the
resume contract BinLogStreamReader exposes).

Offline the "binlog" is the events fixture replayed in event_id order;
in production the read()/readBetweenOffsets() bodies swap to a
BinLogStreamReader session while the offset/commit machinery stays
identical. The decode (event -> op/pk/seq/value changelog row) matches
plans/cdc.py's _changelog mapping.

Scale note: SimpleDataSourceStreamReader reads on the driver — correct
for a binlog (a binlog IS a single serial stream; MySQL offers no
parallel tail), and the decoded rows fan out to executors immediately
after ingestion.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, SimpleDataSourceStreamReader

_DECODE = """
SELECT CASE WHEN event_type = 'signup' THEN 'insert'
            WHEN event_type = 'error'  THEN 'delete'
            ELSE 'update' END AS op,
       user_id AS pk,
       event_id AS seq,
       value
FROM read_parquet('{path}')
WHERE event_id >= {lo} {hi_clause}
ORDER BY event_id
"""


class BinlogReplaySource(DataSource):
    """spark.readStream.format("binlog_replay").option("path", ...)"""

    @classmethod
    def name(cls) -> str:
        return "binlog_replay"

    def schema(self) -> str:
        return "op string, pk bigint, seq bigint, value double"

    def simpleStreamReader(self, schema):  # noqa: ARG002 - fixed schema
        return BinlogReplayReader(self.options)


class BinlogReplayReader(SimpleDataSourceStreamReader):
    """Offset = {"pos": <next event_id>} — the (log_file, log_pos) stand-in."""

    def __init__(self, options) -> None:
        self.path = options.get("path")
        # One batch covers the whole backlog by default: trigger
        # availableNow processes exactly the offsets prefetched at start.
        self.batch = int(options.get("batchsize", str(1 << 40)))

    def initialOffset(self) -> dict:
        return {"pos": 0}

    def _rows(self, lo: int, hi: int | None):
        import duckdb

        hi_clause = f"AND event_id < {hi}" if hi is not None else ""
        q = _DECODE.format(path=self.path, lo=lo, hi_clause=hi_clause)
        return [tuple(r) for r in duckdb.connect().execute(q).fetchall()]

    def read(self, start: dict):
        rows = self._rows(start["pos"], start["pos"] + self.batch)
        nxt = {"pos": start["pos"] + self.batch} if rows else start
        return iter(rows), (nxt if rows else start)

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(self._rows(start["pos"], end["pos"]))
