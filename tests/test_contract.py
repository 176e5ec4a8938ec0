"""Contract tests: every registered query runs, every oracle parses, and
oracle-paired queries hash-match DuckDB on sf0.001 (fast twin of the
driver's sf0.01 gate; tools/verify_local.py runs the full-size check)."""

from __future__ import annotations

import pytest

import __spark_entry__ as e
from tools.verify_local import _hash_rows


def test_entry_smoke(spark):
    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns[0] == "l_returnflag"


def test_every_query_has_callable_and_every_oracle_has_query():
    qs, os_ = e.queries(), e.oracle_sql()
    assert qs, "no queries registered"
    missing = set(os_) - set(qs)
    assert not missing, f"oracles without queries: {missing}"


@pytest.fixture(scope="session")
def all_keys():
    return sorted(e.queries())


def _compare(spark, duck, sf_dir, key):
    sdf = e.queries()[key](spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    oracle = e.oracle_sql().get(key)
    if oracle is None:
        assert srows is not None  # rows-only: just runnable
        return
    res = duck.execute(oracle)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    assert len(srows) == len(orows), f"{key}: rowcount {len(srows)} vs {len(orows)}"
    assert sorted(sdf.columns) == sorted(ocols), f"{key}: column names differ"
    assert _hash_rows(sdf.columns, srows) == _hash_rows(ocols, orows), (
        f"{key}: value-hash mismatch"
    )


def test_all_registered_queries_match_oracle(spark, duck, sf_dir):
    failures = []
    for key in sorted(e.queries()):
        try:
            _compare(spark, duck, sf_dir, key)
        except AssertionError as exc:
            failures.append(str(exc))
    assert not failures, "\n".join(failures)
