"""ClickHouse sink — the production half of cdc_sink (SURVEY.md section
2.A) that needs a live server and therefore cannot be a registered
oracle-checked key offline.

Reference parity: the reference batches decoded binlog rows into
``clickhouse_driver.Client.execute("INSERT INTO ... VALUES", batch)``
([P:high], SURVEY.md section 3.1). Spark-side the same contract is the
JDBC writer (ClickHouse's JDBC driver speaks the HTTP protocol) or the
spark-clickhouse-connector's catalog API; both are expressed here behind
one function so `streaming/queries.py`'s foreachBatch body swaps its
parquet stand-in for this without further changes.

Offline behavior: argument validation is eager and raises before any
request is issued; the online path is at-least-once with per-payload
dedup tokens (see post_rowbinary_http's docstring).
tests/test_contract.py keys cover the parquet twin; this module is
exercised in production deployments only.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession

#: MySQL type -> ClickHouse DDL type (SURVEY.md section 1.2), used when
#: auto-creating the sink table.
MYSQL_TO_CLICKHOUSE = {
    "tinyint": "Int8",
    "smallint": "Int16",
    "int": "Int32",
    "bigint": "Int64",
    "float": "Float32",
    "double": "Float64",
    "decimal": "Decimal(18, 4)",
    "varchar": "String",
    "text": "String",
    "date": "Date32",
    "datetime": "DateTime64(6)",
    "timestamp": "DateTime64(6)",
    "blob": "String",
    "json": "String",
}


def jdbc_partitioned_options(
    url: str,
    table: str,
    partition_column: str,
    lower_bound: int,
    upper_bound: int,
    num_partitions: int,
    user: str = "default",
    password: str = "",
    fetchsize: int = 100_000,
) -> dict[str, str]:
    """Reader options for a PARALLEL initial snapshot (cdc_snapshot's
    production path).

    A binlog is a serial stream, so the streaming reader is rightly
    single-cursor — but the initial full load must not be: these options
    make Spark issue ``num_partitions`` concurrent range queries
    (``partition_column BETWEEN stride_i AND stride_i+1``), so a
    1000-executor cluster pulls the source table in parallel instead of
    through one driver-side cursor. ``partition_column`` must be an
    indexed, roughly-uniform numeric key (the primary key in MySQL);
    skewed keys stripe unevenly — pick bounds from
    ``SELECT min(pk), max(pk)`` at snapshot start.

    Returned as a plain dict so callers can apply it to either the MySQL
    source read or a ClickHouse-side backfill read::

        spark.read.format("jdbc").options(
            **jdbc_partitioned_options(url, "db.orders", "o_orderkey",
                                       lo, hi, 1000)).load()
    """
    if num_partitions < 1:
        raise ValueError(f"num_partitions must be >= 1, got {num_partitions}")
    if upper_bound < lower_bound:
        raise ValueError(
            f"upper_bound {upper_bound} < lower_bound {lower_bound}"
        )
    return {
        "url": url,
        "dbtable": table,
        "user": user,
        "password": password,
        "partitionColumn": partition_column,
        "lowerBound": str(lower_bound),
        "upperBound": str(upper_bound),
        "numPartitions": str(num_partitions),
        "fetchsize": str(fetchsize),
    }


def read_snapshot_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str,
    lower_bound: int,
    upper_bound: int,
    num_partitions: int,
    **kwargs: str,
) -> DataFrame:
    """Parallel full-table snapshot read (see jdbc_partitioned_options).
    Needs a live server; offline contract twin is plans/cdc.py::cdc_snapshot."""
    opts = jdbc_partitioned_options(
        url, table, partition_column, lower_bound, upper_bound, num_partitions,
        **kwargs,
    )
    return spark.read.format("jdbc").options(**opts).load()


def write_clickhouse_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    user: str = "default",
    password: str = "",
    batchsize: int = 100_000,
) -> None:
    """Append a (micro-)batch to ClickHouse over JDBC.

    Usage inside the CDC stream (replaces the offline parquet sink of
    streaming/queries.py::cdc_sink):

        def write_batch(bdf, batch_id):
            write_clickhouse_jdbc(bdf, "jdbc:clickhouse://ch:8123/db", "events_rt")

        decoded.writeStream.foreachBatch(write_batch)\\
               .option("checkpointLocation", ckpt).start()

    Exactly-once lands on ReplacingMergeTree semantics: re-inserted
    batches after a checkpoint replay are deduplicated by the engine's
    (pk, seq) version column — the same contract cdc_apply_upsert
    materializes in batch mode.

    ``batchsize`` mirrors the reference's insert-buffer threshold; large
    batches are what make ClickHouse MergeTree ingestion efficient
    (many small inserts -> too many parts).
    """
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("user", user)
        .option("password", password)
        .option("batchsize", str(batchsize))
        .option("isolationLevel", "NONE")  # ClickHouse has no txns
        .option("driver", "com.clickhouse.jdbc.ClickHouseDriver")
        .mode("append")
        .save()
    )


#: ClickHouse identifiers we will interpolate into a query string —
#: bare or dot-qualified names only, so a caller-supplied table value
#: cannot smuggle SQL into the HTTP query parameter.
_CH_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*(\.[A-Za-z_][A-Za-z0-9_]*)?$")


def post_rowbinary_http(
    df: DataFrame,
    url: str,
    table: str,
    user: str = "default",
    password: str = "",
    timeout: float = 60.0,
    token_salt: str = "",
) -> None:
    """Ship a (micro-)batch as ``INSERT INTO t FORMAT RowBinary`` POST
    bodies — the sink's wire-level path (sources/rowbinary.py encodes
    the exact payload bytes; this function only frames the transport).

    Production shape: each encoded payload row is one HTTP request
    ``POST {url}/?query=INSERT+INTO+{table}+FORMAT+RowBinary`` with the
    payload as the body — issued executor-side inside foreachPartition,
    so a 1000-executor cluster posts in parallel and one payload maps to
    one MergeTree part (the insert-buffer tradeoff of
    write_clickhouse_jdbc's ``batchsize``).

    Delivery semantics — AT-LEAST-ONCE on the online path: a failure
    mid-partition leaves earlier payloads of that partition already
    inserted, and Spark's task retry re-posts the whole partition.  To
    make the retry idempotent each POST carries an
    ``insert_deduplication_token`` derived from the payload bytes
    (sha256): on Replicated/SharedMergeTree (and plain MergeTree with
    ``non_replicated_deduplication_window`` set) the server drops a
    re-posted block with a token it has already seen inside the dedup
    window, upgrading the effect to exactly-once there; on engines
    without insert dedup the path stays at-least-once and the
    downstream merge (cdc_apply_upsert's ReplacingMergeTree contract)
    absorbs the duplicates.  Content-hash tokens are an INTENTIONAL
    trade-off (matching ClickHouse's own default block-hash dedup):
    two legitimately distinct micro-batches that serialize to
    byte-identical payloads inside the server's dedup window are
    treated as one insert.  When once-PER-BATCH delivery of identical
    payloads matters (e.g. idempotent counters re-emitting the same
    delta each epoch), pass ``token_salt`` — typically the
    foreachBatch ``batch_id`` — and the token becomes
    sha256(len(salt) ":" salt ":" || payload), distinct across batches
    while retries of the SAME batch still dedup exactly.  The salt is
    length-prefixed so the encoding is injective: a bare
    concatenation would let distinct (salt, payload) pairs collide
    (salt ``"1"`` + payload ``b"2..."`` vs salt ``"12"`` + payload
    ``b"..."``), silently dropping a legitimately distinct batch
    inside the server's dedup window.  Every request carries ``timeout`` so a
    hung endpoint fails the task (and triggers the retry) instead of
    blocking the executor forever.  The byte layer itself is
    oracle-proven offline by the ``cdc_sink_wire`` contract key.
    """
    from urllib.parse import quote

    from .rowbinary import encode_batches, wire_types_for

    if not url.startswith(("http://", "https://")):
        raise ValueError(f"ClickHouse HTTP endpoint required, got {url!r}")
    if not _CH_IDENT.match(table):
        raise ValueError(f"invalid ClickHouse table identifier: {table!r}")
    if timeout <= 0:
        raise ValueError(f"timeout must be positive, got {timeout!r}")

    payloads = encode_batches(df, wire_types_for(df.schema))
    query = quote(f"INSERT INTO {table} FORMAT RowBinary")
    endpoint = f"{url}/?query={query}"

    def _post(rows) -> None:
        import hashlib
        import urllib.request

        for row in rows:
            body = bytes(row.payload)
            # Length-prefixed salt => injective (salt, payload) encoding;
            # see the docstring for the collision this rules out.
            salted = f"{len(token_salt)}:{token_salt}:".encode() + body
            token = hashlib.sha256(salted).hexdigest()
            req = urllib.request.Request(
                f"{endpoint}&insert_deduplication_token={token}",
                data=body,
                method="POST",
                headers={
                    "X-ClickHouse-User": user,
                    "X-ClickHouse-Key": password,
                    "Content-Type": "application/octet-stream",
                },
            )
            with urllib.request.urlopen(  # pragma: no cover
                req, timeout=timeout
            ) as resp:
                if resp.status != 200:
                    raise OSError(f"ClickHouse insert failed: {resp.status}")

    payloads.foreachPartition(_post)
