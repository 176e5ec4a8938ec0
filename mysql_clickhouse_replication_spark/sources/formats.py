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
