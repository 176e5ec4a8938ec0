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
import re
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


#: Top-level wrappers that pin the fractional part BEFORE an integer
#: cast, making DuckDB's round-on-cast and Spark's truncate-on-cast
#: agree by construction (the r6 share_ppm fix pattern).
_PINNED = ("FLOOR", "CEIL", "CEILING", "ROUND", "TRUNC", "LEN", "LENGTH",
           "COUNT")
_CAST_RE = re.compile(r"CAST\s*\(", re.IGNORECASE)


def _cast_exprs(sql: str):
    """Yield the inner expression of every CAST(<expr> AS BIGINT/INT...)
    in ``sql`` (balanced-paren scan; comments/strings not expected in
    registry oracles)."""
    for m in _CAST_RE.finditer(sql):
        depth, i = 1, m.end()
        while i < len(sql) and depth:
            if sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
            i += 1
        inner = sql[m.end():i - 1]
        # BIGINT/HUGEINT targets only: the hazard class is fractional
        # ppm/share/sum surfaces (always BIGINT here); CAST(<bool> AS
        # INT) flag columns carry no fractional part by construction.
        mm = re.search(r"\s+AS\s+(BIGINT|HUGEINT)\s*$", inner, re.IGNORECASE)
        if mm:
            yield inner[: mm.start()].strip()


def round_trunc_hazards(sql: str) -> list[str]:
    """Round-vs-truncate divergence lint (r6 share_ppm class): DuckDB
    CAST(x AS BIGINT) ROUNDS a fractional x while Spark's
    .cast('bigint') TRUNCATES, so any oracle casting an expression that
    can carry a fractional part to an integer type is a cross-engine
    hash hazard.  An expression is flagged when it contains division or
    a fractional literal and is not pinned by a top-level
    FLOOR/CEIL/ROUND/TRUNC (the integral-in-cents fix pattern).
    Integer-only arithmetic (SUM/COUNT/*, +, -) cannot carry a
    fraction, and DuckDB's ``//`` is FLOOR division — the safe
    integral-ppm pattern itself (its Spark twins use F.floor) — so
    both pass."""
    out = []
    for expr in _cast_exprs(sql):
        head = expr.split("(", 1)[0].strip().upper()
        if head in _PINNED:
            continue
        true_div = expr.replace("//", "")  # drop floor-division tokens
        fractional = ("/" in true_div
                      or re.search(r"\b\d+\.\d+", expr) is not None
                      or re.search(r"\bAVG\s*\(", expr, re.I) is not None)
        if fractional:
            out.append(expr if len(expr) <= 80 else expr[:77] + "...")
    return out


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
        rt = round_trunc_hazards(sql)
        if hits:
            bad += 1
            print(f"HAZARD {key}: " + ", ".join(f"{c}:{t}" for c, t in hits))
        elif rt:
            bad += 1
            print(f"HAZARD {key}: round-vs-truncate int cast of "
                  + "; ".join(rt))
        elif warns:
            warned += 1
            print(f"warn   {key}: " + ", ".join(f"{c}:{t}" for c, t in warns))
    print(f"\n{bad} hazardous oracles, {warned} warnings of {len(oracles)}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
