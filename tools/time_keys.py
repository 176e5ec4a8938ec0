"""Time a subset of keys with bench.py's exact method (warm-up, N=2,
noop materialization) — for scaling-slope measurements of newly added
operators without re-running the whole bench.

Usage:
    python tools/time_keys.py key1 key2 ...
    SPARK_GRAFT_SF_DIR=$PWD/.scratch/sf1 python tools/time_keys.py key1 ...

Prints one JSON line: {"sf_dir": ..., "times": {key: best_sec}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_RUNS = 2


def main(argv: list[str]) -> int:
    if not argv:
        print(__doc__)
        return 2
    import __spark_entry__ as e
    from mysql_clickhouse_replication_spark.session import get_spark

    spark = get_spark("time_keys")
    qs = e.queries()
    bad = [k for k in argv if k not in qs]
    if bad:
        print(f"unknown keys: {bad}")
        return 2

    def mat(df):
        df.write.mode("overwrite").format("noop").save()

    mat(qs["agg_groupby_multi"](spark, SF_DIR))  # warm-up
    times = {}
    for key in argv:
        best = float("inf")
        for _ in range(N_RUNS):
            t0 = time.perf_counter()
            mat(qs[key](spark, SF_DIR))
            best = min(best, time.perf_counter() - t0)
        times[key] = round(best, 3)
    print(json.dumps({"sf_dir": SF_DIR, "times": times}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
