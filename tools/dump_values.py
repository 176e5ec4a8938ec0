"""Driver-gate canonicalization probe (VERDICT r3 item 7).

When a key is red in CORRECTNESS_r{N}.json with rows_match+schema_match
true but hash_match false, the divergence lives in VALUE canonicalization
(float repr, decimal rounding, type coercion) between the driver's gate
and whatever produced the values — not in the plan.  This tool makes that
diagnosable from artifacts: for each requested key it runs the Spark
query AND the DuckDB oracle on the same fixtures and dumps BOTH engines'
raw pre-hash values side by side, plus the per-row canonical strings and
the first N differing rows with a per-column type/value breakdown.

Usage:
    python tools/dump_values.py cdc_type_cast [more keys ...]
    python tools/dump_values.py --out=probe.json text_stats
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python tools/dump_values.py K

Output (stdout + optional JSON artifact):
    per key: spark/oracle row counts, column names + Python types,
    hash of each side, and for up to --max-diff rows that differ, the
    raw repr() of every cell on both sides so a double-vs-decimal or
    1-ULP repr drift is visible directly.
"""

from __future__ import annotations

import json
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.verify_local import SF_DIR, TABLES, _canon, _hash_rows  # noqa: E402


def _canon_lines(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    keyed = sorted(
        ("\x1f".join(_canon(r[i]) for i in order), r) for r in rows
    )
    return [k for k, _ in keyed], [r for _, r in keyed]


def probe_key(spark, con, qs, oracles, key, max_diff=5):
    out = {"key": key}
    sdf = qs[key](spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    out["spark"] = {
        "rows": len(srows),
        "cols": scols,
        "py_types": [type(v).__name__ for v in (srows[0] if srows else [])],
        "hash": _hash_rows(scols, srows),
    }
    if key not in oracles:
        out["oracle"] = None
        return out
    res = con.execute(oracles[key])
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    out["oracle"] = {
        "rows": len(orows),
        "cols": ocols,
        "py_types": [type(v).__name__ for v in (orows[0] if orows else [])],
        "hash": _hash_rows(ocols, orows),
    }
    out["hash_match"] = out["spark"]["hash"] == out["oracle"]["hash"]
    if not out["hash_match"]:
        sl, sr = _canon_lines(scols, srows)
        ol, orr = _canon_lines(ocols, orows)
        sorder = sorted(range(len(scols)), key=lambda i: scols[i])
        oorder = sorted(range(len(ocols)), key=lambda i: ocols[i])
        diffs = []
        for i in range(min(len(sl), len(ol))):
            if sl[i] != ol[i]:
                diffs.append(
                    {
                        "sorted_row_index": i,
                        "spark_raw": {
                            scols[j]: repr(sr[i][j]) for j in sorder
                        },
                        "oracle_raw": {
                            ocols[j]: repr(orr[i][j]) for j in oorder
                        },
                        "spark_canon": sl[i][:400],
                        "oracle_canon": ol[i][:400],
                    }
                )
                if len(diffs) >= max_diff:
                    break
        out["first_diffs"] = diffs
    return out


def main(argv: list[str]) -> int:
    json_out = None
    max_diff = 5
    argv = list(argv)
    for a in list(argv):
        if a.startswith("--out="):
            json_out = a.split("=", 1)[1]
            argv.remove(a)
        elif a.startswith("--max-diff="):
            max_diff = int(a.split("=", 1)[1])
            argv.remove(a)
    if not argv:
        print(__doc__)
        return 2

    import __spark_entry__ as e
    from mysql_clickhouse_replication_spark.session import get_spark

    spark = get_spark("dump_values")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    qs, oracles = e.queries(), e.oracle_sql()
    report = {"sf_dir": SF_DIR, "keys": []}
    rc = 0
    for key in argv:
        if key not in qs:
            print(f"?? unknown key {key}")
            rc = 2
            continue
        out = probe_key(spark, con, qs, oracles, key, max_diff)
        report["keys"].append(out)
        s, o = out["spark"], out["oracle"]
        print(f"== {key} ==")
        print(f"  spark : {s['rows']} rows, cols={s['cols']}, "
              f"py_types={s['py_types']}")
        print(f"          hash={s['hash']}")
        if o is None:
            print("  oracle: (none — rows-only key)")
            continue
        print(f"  oracle: {o['rows']} rows, cols={o['cols']}, "
              f"py_types={o['py_types']}")
        print(f"          hash={o['hash']}")
        print(f"  hash_match: {out['hash_match']}")
        if not out["hash_match"]:
            rc = 1
            for d in out.get("first_diffs", []):
                print(f"  diff @ sorted row {d['sorted_row_index']}:")
                for c in sorted(d["spark_raw"]):
                    sv = d["spark_raw"][c]
                    ov = d["oracle_raw"].get(c, "<missing>")
                    mark = "   " if sv == ov else " <<"
                    print(f"    {c:24s} spark={sv!s:28s} oracle={ov}{mark}")
    if json_out:
        with open(json_out, "w") as fh:
            json.dump(report, fh, indent=1)
        print(f"\nwrote {json_out}")
    return rc


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
