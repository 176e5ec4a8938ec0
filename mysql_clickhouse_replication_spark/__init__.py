"""PySpark-native analytics/ETL engine with the query and data-processing
capabilities of the reference ``yymysql/mysql-clickhouse-replication``
(MySQL -> ClickHouse incremental CDC replication), rebuilt Spark-first.

The reference is a row-oriented CDC pipeline (binlog tail -> decode ->
batch -> ClickHouse insert); its user-facing query capability is ClickHouse
SQL over the replicated tables.  This engine re-expresses both halves
natively in Spark:

* the CDC half as Structured Streaming + DataFrame changelog compaction
  (``plans/cdc.py``, ``streaming/``, ``sources/``), and
* the analytics half as the full relational operator surface of
  SURVEY.md section 2 over DataFrames (``operators/``, ``functions/``).

Provenance note: the reference snapshot at /root/reference is EMPTY
(SURVEY.md section 0) — semantics here derive from public knowledge of the
MySQL binlog protocol, python-mysql-replication, clickhouse-driver, and
ClickHouse MergeTree documented in SURVEY.md, never from reference code.
"""

from .registry import QUERIES, ORACLES, load_all

__all__ = ["QUERIES", "ORACLES", "load_all"]
