"""Edge-case twins of the oracle gate on synthetic mini-fixtures.

The sf fixtures guarantee comfortable shapes (>=3-token documents, one
micro-batch per stream).  These tests feed deliberately hostile inputs
through BOTH engines so fixture luck can't mask a divergence."""

from __future__ import annotations

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import __spark_entry__ as e


@pytest.fixture(scope="module")
def short_docs_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("short_docs")
    tbl = pa.table(
        {
            "doc_id": [1, 2, 3, 4],
            "text": ["one", "two toks", "three tok doc", "a b c d"],
            "lang": ["en"] * 4,
            "category": ["x"] * 4,
            "published_at": [None] * 4,
        }
    )
    pq.write_table(tbl, os.path.join(str(d), "documents.parquet"))
    return str(d)


def _oracle_rows(sf_dir: str, key: str, order_by: str):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet')"
    )
    return con.execute(e.oracle_sql()[key] + f" ORDER BY {order_by}").fetchall()


def test_text_fingerprint_short_docs(spark, short_docs_dir):
    """1- and 2-token docs: bounded shingle sequence in Spark, bounded
    range + final modulus in DuckDB (list_reduce has no init value, so a
    single-shingle doc would otherwise skip the rolling modulus)."""
    sdf = e.queries()["text_fingerprint"](spark, short_docs_dir).orderBy("doc_id")
    srows = [tuple(r) for r in sdf.collect()]
    orows = _oracle_rows(short_docs_dir, "text_fingerprint", "doc_id")
    assert srows == orows
