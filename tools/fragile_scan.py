"""Scan every registered query's OUTPUT schema for driver-gate-fragile
column types.

CORRECTNESS_r04/r05 evidence: the driver's pandas canonicalizer
(a) crashes on ARRAY/MAP-typed output columns (`unhashable type:
'list'`) and (b) hash-drifts whenever the post-pandas DTYPE CLASS
differs between engines — Spark DECIMAL arrives as object(Decimal)
while a DuckDB DECIMAL/HUGEINT arrives as float64 (the r5 red-row
class).  DOUBLE and BOOLEAN are advisory only: both are PROVEN SAFE
when the oracle side carries the same class (13 green BOOLEAN rows,
dozens of green dsum DOUBLE rows) — they are listed so a reviewer can
confirm the oracle side matches.  The oracle half of the check is
tools/oracle_dtype_lint.py; the end-to-end replay is
tools/pandas_gate_sim.py.

This tool builds each DataFrame lazily (no execution) and reports, in
registration order, every key with array/map/decimal (hard) or
boolean/float (advisory) output columns.

Usage: python tools/fragile_scan.py [--limit N]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> int:
    limit = None
    args = sys.argv[1:]
    for i, a in enumerate(args):
        if a.startswith("--limit="):
            limit = int(a.split("=", 1)[1])
        elif a == "--limit" and i + 1 < len(args):
            limit = int(args[i + 1])

    import __spark_entry__ as ent
    from mysql_clickhouse_replication_spark.session import get_spark

    spark = get_spark()
    qs = ent.queries()
    keys = list(qs)
    if limit is not None:
        keys = keys[:limit]
    n_fragile = 0
    for pos, k in enumerate(keys):
        try:
            df = qs[k](spark, SF_DIR)
        except Exception as e:  # noqa: BLE001 - diagnostic tool
            print(f"{pos:3d} {k}: BUILD-ERROR {e}")
            n_fragile += 1
            continue
        bad = []
        for f in df.schema.fields:
            t = f.dataType.simpleString()
            if t.startswith(("array", "map")):
                bad.append(f"{f.name}:{t}:CRASH")
            elif t.startswith("decimal"):
                # object(Decimal) in pandas vs float64 from DuckDB —
                # the r5 fn_try_cast red row; surface as DOUBLE/string
                bad.append(f"{f.name}:{t}:CLASS-DRIFT")
            elif t == "boolean":
                bad.append(f"{f.name}:bool(advisory)")
            elif t in ("double", "float"):
                bad.append(f"{f.name}:{t}(advisory)")
        if bad:
            n_fragile += 1
            print(f"{pos:3d} {k}: " + ", ".join(bad))
    print(f"\n{n_fragile} fragile / {len(keys)} scanned")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
