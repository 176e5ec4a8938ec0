"""Profile query CONSTRUCTION time (driver-side plan building, py4j
round trips, memo-building collects) for every registered key — no
action is triggered, so the numbers isolate the cost bench.py pays
INSIDE its timed region before the first job starts.

Second pass re-constructs every key memo-warm, so the steady-state
construction cost (what best-of-2 benching pays) is the `warm` column.

Usage: python tools/construct_profile.py [key ...]
Prints one JSON line: {"cold": {key: sec}, "warm": {key: sec}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main(argv: list[str]) -> int:
    import __spark_entry__ as e
    from mysql_clickhouse_replication_spark.session import get_spark

    spark = get_spark("construct_profile")
    qs = e.queries()
    keys = argv or list(qs)
    bad = [k for k in keys if k not in qs]
    if bad:
        print(f"unknown keys: {bad}")
        return 2

    def sweep() -> dict[str, float]:
        out = {}
        for key in keys:
            t0 = time.perf_counter()
            qs[key](spark, SF_DIR)
            out[key] = round(time.perf_counter() - t0, 3)
        return out

    cold = sweep()
    warm = sweep()
    print(json.dumps({"sf_dir": SF_DIR, "cold": cold, "warm": warm}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
