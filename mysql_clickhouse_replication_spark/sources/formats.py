"""Multi-format sources/sinks (SURVEY.md section 2.B prod row: csv / json
/ orc readers+writers).

Reference parity: the reference reads MySQL and writes ClickHouse only;
its Spark-native replacement speaks every columnar/text format the
DataFrameReader/Writer stack offers. Each key is a full write->read
roundtrip through the format landed in the scratch sink, verified against
the original fixture — i.e. what is checked is that NOTHING is lost in
the format hop (schema fidelity via explicit read schemas, value fidelity
via the oracle hash: shortest-roundtrip double serialization, UTC
timestamp encoding).

Scale notes: these are single-pass copies — no shuffle; on a cluster the
write parallelism equals the scan partitioning. CSV/JSON are the
interchange slow path (row-oriented, re-parsed); parquet/orc the columnar
fast path. JDBC (MySQL source, ClickHouse sink) shares this code shape
but needs a live server — gated out offline (SURVEY.md section 2.A
cdc_sink note).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ..session import scratch_path, table

_ORDERS_ORACLE = (
    "SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate "
    "FROM orders"
)


def _roundtrip(
    spark: SparkSession, sf_dir: str, fmt: str, **read_opts: str
) -> DataFrame:
    src = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate"
    )
    # uuid-suffixed sink: concurrent verify/bench runs on the same sf_dir
    # must never interleave this overwrite with each other's read-back
    sink = scratch_path(f"fmt_{fmt}", os.path.basename(sf_dir))
    src.write.mode("overwrite").format(fmt).options(**read_opts).save(sink)
    return (
        spark.read.format(fmt)
        .schema(src.schema)  # explicit schema: no inference drift
        .options(**read_opts)
        .load(sink)
    )


@register("source_csv_roundtrip", oracle=_ORDERS_ORACLE)
def source_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV writer+reader roundtrip with explicit schema. Doubles survive
    because Spark writes shortest-roundtrip decimal strings; timestamps
    survive because writer and reader share the session's UTC format."""
    return _roundtrip(spark, sf_dir, "csv", header="true")


@register("source_json_roundtrip", oracle=_ORDERS_ORACLE)
def source_json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines writer+reader roundtrip with explicit schema (inference
    would widen o_custkey and re-guess timestamps)."""
    return _roundtrip(spark, sf_dir, "json")


@register("source_orc_roundtrip", oracle=_ORDERS_ORACLE)
def source_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC writer+reader roundtrip — the second columnar format besides
    parquet; schema and values are carried natively."""
    return _roundtrip(spark, sf_dir, "orc")


@register(
    "source_parquet_schema_merge",
    oracle="""
SELECT o_orderkey,
       o_custkey,
       CAST(NULL AS VARCHAR) AS o_orderstatus,
       epoch AS ingest_epoch
FROM (SELECT o_orderkey, o_custkey, 1 AS epoch FROM orders
      WHERE o_orderkey % 2 = 0)
UNION ALL
SELECT o_orderkey, o_custkey, o_orderstatus, 2 AS epoch
FROM orders WHERE o_orderkey % 2 = 1
""",
)
def source_parquet_schema_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-drift reads — the lake reality a long-lived CDC landing
    accumulates: early partitions were written BEFORE a column existed
    (here: epoch-1 files lack ``o_orderstatus``), later partitions
    carry it.  ``mergeSchema=true`` makes one scan read BOTH vintages,
    surfacing the missing column as NULL for old files — the documented
    Spark contract for ADDED columns, the same semantics
    cdc_schema_evolution applies on the changelog side.

    Scale note: schema merging is a FOOTER-ONLY operation (Spark unions
    the parquet footers of the file listing at planning time; DuckDB's
    union_by_name twin is the same idea) — data pages are never read to
    infer anything, so the cost at 100 TB is the file listing, not a
    scan, and per-file column pruning still applies: an epoch-1 file
    never materializes the added column at all.  The epoch rides each
    file as a written column so the surface pins which rows came from
    which vintage."""
    src = table(spark, sf_dir, "orders")
    sink = scratch_path("fmt_schema_merge", os.path.basename(sf_dir))
    v1 = (
        src.filter(F.col("o_orderkey") % 2 == 0)
        .select("o_orderkey", "o_custkey", F.lit(1).alias("ingest_epoch"))
    )
    v2 = (
        src.filter(F.col("o_orderkey") % 2 == 1)
        .select(
            "o_orderkey", "o_custkey", "o_orderstatus",
            F.lit(2).alias("ingest_epoch"),
        )
    )
    v1.write.mode("overwrite").parquet(f"{sink}/epoch=1")
    v2.write.mode("overwrite").parquet(f"{sink}/epoch=2")
    merged = (
        spark.read.option("mergeSchema", "true")
        .option("recursiveFileLookup", "true")
        .parquet(sink)
    )
    return merged.select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        F.col("ingest_epoch").cast("int").alias("ingest_epoch"),
    )
