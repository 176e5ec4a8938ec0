"""Local replica of the driver's t2 correctness gate.

Runs every ``queries()[k]`` on Spark and the matching ``oracle_sql()[k]``
on DuckDB over the same parquet fixtures, then compares:

* row count
* column-name set
* order-insensitive value hash (columns sorted by name, rows sorted,
  values canonicalized)

Stricter-than-driver canonicalization: floats compared via repr of the
exact double — any mismatch here is a real nondeterminism bug to fix at
the query level (decimal casts / rounding / tiebreaks), not to paper over.

Usage:
    python tools/verify_local.py [key ...]           # default: all keys
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 python tools/verify_local.py
    python tools/verify_local.py --json=OUT.json     # also write an artifact
    python tools/verify_local.py --no-superlinear-oracles  # big-SF sweeps
"""

from __future__ import annotations

import hashlib
import math
import os
import sys
import time
import traceback

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

# Keys whose ORACLE is deliberately brute-force and super-linear in a
# group size that clone-replication scales with the SF — correct and
# fast at gate scale (sf0.001/sf0.01), prohibitive at sf0.1+ (the r7
# sf1 hash sweep measured dedup_containment at 772 s, dedup_incremental
# unfinished after 30 min, events_funnel_strict's v x c x p triple join
# at ~110 GB of DuckDB state).  The SPARK side of every one of these is
# banded/bucketed/windowed and sweeps sf1 clean (BASELINE.md execution
# sweeps); it is only the obviously-correct oracle that cannot follow.
# As of round 9 NO key is skipped at big SFs: pair-output keys get the
# r8 endpoint-filter twins (SCALE_TWINS below), and the global-output
# remainder gets the r9 sampled-fixture twins (SAMPLED_FIXTURE_TWINS) —
# every membership below must appear in exactly one of the two maps.
SUPERLINEAR_ORACLES = {
    # all-pairs / recursive-closure dedup oracles (|dup-mass|^2)
    "dedup_cluster", "dedup_minhash", "dedup_minhash_accuracy",
    "dedup_ngram_jaccard", "dedup_simhash", "dedup_source_matrix",
    "dedup_survivor_pick", "docs_dedup_pipeline", "docs_split_leakage_safe",
    # asymmetric but still |new| x |corpus| shingle intersections
    "dedup_incremental",
    # per-user event-combination joins (10x clones -> 100-1000x tuples)
    "events_funnel_strict", "events_funnel_unordered",
    "events_funnel_window_sensitivity",
}

# Blocked-sample SCALE TWINS (round 8): for pair-output dedup keys the
# brute-force oracle is quadratic in the corpus, but the pair metric is
# DOC-LOCAL (shingles/fingerprints of the two docs only), so the oracle
# restricted to any doc subset is itself an exact oracle for the
# induced pair subgraph.  At big SFs (--no-superlinear-oracles) these
# keys therefore get a real hash check instead of a skip: run the Spark
# plan on the FULL corpus, keep only output pairs whose BOTH endpoints
# fall in a deterministic content-keyed sample, and compare against the
# unmodified registered oracle evaluated over the sampled `documents`
# view.  The sample key is the 30-char text prefix: measured on the
# fixture, every qualifying pair of all three metrics shares it (25/25
# ngram J>=0.8, 25/25 word-shingle J>=0.5 at sf0.01), and sf1's clone
# replicas share full text — so whole near-dup blocks co-sample and the
# check is non-vacuous, while cross-block pairs are excluded from BOTH
# sides consistently (soundness does not depend on the blocking).
# Global-output keys (clusters, survivor picks, corpus aggregates,
# funnel counts) cannot be endpoint-filtered and stay excluded.
SCALE_TWIN_SAMPLE = "hash(substr(text, 1, 30)) % 64 = 7"
SCALE_TWINS = {
    # key -> the two doc-id output columns to endpoint-filter
    "dedup_minhash": ("doc_a", "doc_b"),
    "dedup_simhash": ("doc_a", "doc_b"),
    "dedup_ngram_jaccard": ("doc_a", "doc_b"),
    "dedup_incremental": ("new_doc", "corpus_doc"),
}

# SAMPLED-FIXTURE scale twins (round 9): the remaining superlinear
# oracles have GLOBAL outputs (connected-component clusters, survivor
# picks, corpus aggregates, funnel step counts) that the r8
# endpoint-filter trick structurally can't touch.  But every one is
# BLOCK-LOCAL in its base table's natural key: the dedup metrics and
# their transitive closures depend only on the sampled docs (clone
# groups share full text at sf1, so the prefix-hash block keeps whole
# groups intact — 760 docs / ~76 groups in the 1/64 sample), and
# funnel state is user-local (a user-id block sample induces an exact
# sub-corpus — 235 users, all five event types present).  So at big
# SFs BOTH engines run over the SAME deterministically sampled fixture
# directory: the registered Spark plan and the unmodified registered
# oracle, byte-identical comparison semantics, with the oracle's
# quadratic term shrunk 64x to feasibility while the sample keeps
# sf1's full per-group clone density (the thing sf0.01 lacks).
# Whatever subgraph the block induces, both engines compute it — the
# comparison's soundness does not depend on the blocking; a vacuous
# sample (no dup groups / zero funnel mass) FAILS the run instead of
# passing it silently.
#
# events is sampled via pyarrow (bit-mask on user_id) so the parquet
# schema/physical types stay byte-identical to the fixture; documents
# (strings + ints only) samples via DuckDB COPY with the same
# prefix-hash predicate the endpoint twins use.
SAMPLED_FIXTURE_TWINS = {
    "dedup_cluster": "documents",
    "dedup_minhash_accuracy": "documents",
    "dedup_source_matrix": "documents",
    "dedup_survivor_pick": "documents",
    "docs_dedup_pipeline": "documents",
    "docs_split_leakage_safe": "documents",
    "events_funnel_strict": "events",
    "events_funnel_unordered": "events",
    "events_funnel_window_sensitivity": "events",
}
_EVENTS_USER_MASK = 63  # keep (user_id & 63) == 7 — 1/64 user blocks
_EVENTS_USER_KEEP = 7


def _build_twin_fixture(sf_dir: str, tbl: str) -> str:
    """Materialize <sf_dir-twin>/{tbl sampled, other tables symlinked}
    and return the directory path.  Cheap (the samples are 1/64) and
    rebuilt per run so a stale sample can never mask a fixture change."""
    import shutil

    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), os.pardir,
        ".scratch", "twin_fix",
        f"{os.path.basename(os.path.normpath(sf_dir))}_{tbl}",
    )
    out = os.path.normpath(out)
    shutil.rmtree(out, ignore_errors=True)
    os.makedirs(out)
    for t in TABLES:
        src = os.path.join(sf_dir, f"{t}.parquet")
        dst = os.path.join(out, f"{t}.parquet")
        if t != tbl:
            os.symlink(os.path.abspath(src), dst)
        elif t == "events":
            import pyarrow.compute as pc
            import pyarrow.parquet as pq

            full = pq.read_table(src)
            mask = pc.equal(
                pc.bit_wise_and(full.column("user_id"), _EVENTS_USER_MASK),
                _EVENTS_USER_KEEP,
            )
            sampled = full.filter(mask)
            if sampled.num_rows == 0:
                raise RuntimeError(f"vacuous events sample from {src}")
            pq.write_table(sampled, dst)
        else:
            c = duckdb.connect()
            c.execute(
                f"COPY (SELECT * FROM read_parquet('{src}') "
                f"WHERE {SCALE_TWIN_SAMPLE}) TO '{dst}' (FORMAT PARQUET)"
            )
            n = c.execute(
                f"SELECT count(*) FROM read_parquet('{dst}')"
            ).fetchone()[0]
            if n == 0:
                raise RuntimeError(f"vacuous {tbl} sample from {src}")
    return out


def _canon(v) -> str:
    if v is None:
        return "<NULL>"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bytes):
        return "0x" + v.hex()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, dict):
        return "{" + ",".join(f"{k}:{_canon(v[k])}" for k in sorted(v)) + "}"
    return str(v)


def _hash_rows(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("\x1f".join(_canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()


def main(argv: list[str]) -> int:
    import json

    import __spark_entry__ as e
    from mysql_clickhouse_replication_spark.session import get_spark

    json_out = None
    skip_superlinear = False
    argv = list(argv)
    for a in list(argv):
        if a.startswith("--json="):
            json_out = a.split("=", 1)[1]
            argv.remove(a)
        elif a == "--no-superlinear-oracles":
            skip_superlinear = True
            argv.remove(a)
    results: dict[str, dict] = {}

    spark = get_spark("verify_local")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    keys = argv or sorted(qs)
    scale_twin_keys: set[str] = set()
    sampled_fixture_keys: set[str] = set()
    if skip_superlinear:
        scale_twin_keys = {
            k for k in keys
            if k in SUPERLINEAR_ORACLES and k in SCALE_TWINS
        }
        sampled_fixture_keys = {
            k for k in keys
            if k in SUPERLINEAR_ORACLES and k in SAMPLED_FIXTURE_TWINS
        }
        skipped = [k for k in keys
                   if k in SUPERLINEAR_ORACLES and k not in SCALE_TWINS
                   and k not in SAMPLED_FIXTURE_TWINS]
        keys = [k for k in keys if k not in skipped]
        if scale_twin_keys:
            print(f"scale-twin oracles for {len(scale_twin_keys)} keys: "
                  + " ".join(sorted(scale_twin_keys)))
        if sampled_fixture_keys:
            print(f"sampled-fixture oracles for {len(sampled_fixture_keys)} "
                  "keys: " + " ".join(sorted(sampled_fixture_keys)))
        if skipped:
            print(f"skipping {len(skipped)} superlinear-oracle keys: "
                  + " ".join(skipped))
    twin_dirs: dict[str, str] = {}
    twin_cons: dict[str, duckdb.DuckDBPyConnection] = {}
    for k in sorted(sampled_fixture_keys):
        tbl = SAMPLED_FIXTURE_TWINS[k]
        if tbl not in twin_dirs:
            twin_dirs[tbl] = _build_twin_fixture(SF_DIR, tbl)
            tc = duckdb.connect()
            for t in TABLES:
                tc.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{twin_dirs[tbl]}/{t}.parquet')"
                )
            twin_cons[tbl] = tc
    sample_con = None
    if scale_twin_keys:
        # same fixture views, but `documents` restricted to the sample
        sample_con = duckdb.connect()
        for t in TABLES:
            pred = f" WHERE {SCALE_TWIN_SAMPLE}" if t == "documents" else ""
            sample_con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/{t}.parquet'){pred}"
            )
        sample_ids = {
            r[0] for r in
            sample_con.execute("SELECT doc_id FROM documents").fetchall()
        }
    n_pass = n_fail = n_rows_only = 0
    for key in keys:
        t0 = time.time()
        sampled = key in sampled_fixture_keys
        key_sf = twin_dirs[SAMPLED_FIXTURE_TWINS[key]] if sampled else SF_DIR
        try:
            sdf = qs[key](spark, key_sf)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            # Keys that persist intermediates (dedup_containment's
            # posting list, graph_pagerank's edge frame) rely on the
            # harness to release them once the result is materialized;
            # without this a full 311-key single-session sweep
            # accumulates MEMORY_AND_DISK blocks across keys (r8
            # ADVICE).  Recompute-on-reuse keys (dedup_incremental's
            # capped corpus cache) just repopulate lazily.
            spark.catalog.clearCache()
        except Exception:
            print(f"FAIL  {key}: spark error\n{traceback.format_exc()}")
            results[key] = {"status": "fail", "err": "spark error"}
            n_fail += 1
            continue
        if key not in oracles:
            print(f"rows  {key}: {len(srows)} rows (rows-only, no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            results[key] = {"status": "rows_only", "rows": len(srows)}
            n_rows_only += 1
            continue
        twin = key in scale_twin_keys
        if twin:
            ia, ib = (scols.index(c) for c in SCALE_TWINS[key])
            srows = [r for r in srows
                     if r[ia] in sample_ids and r[ib] in sample_ids]
        key_con = con
        if twin:
            key_con = sample_con
        elif sampled:
            key_con = twin_cons[SAMPLED_FIXTURE_TWINS[key]]
        try:
            res = key_con.execute(oracles[key])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception:
            print(f"FAIL  {key}: duckdb error\n{traceback.format_exc()}")
            results[key] = {"status": "fail", "err": "duckdb error"}
            n_fail += 1
            continue
        if twin and not orows:
            print(f"FAIL  {key}: scale-twin sample is vacuous (0 expected "
                  "pairs) — widen SCALE_TWIN_SAMPLE")
            results[key] = {"status": "fail", "err": "vacuous scale twin"}
            n_fail += 1
            continue
        if sampled:
            # vacuity guard: the induced sub-corpus must carry signal —
            # a non-empty result whose numeric surfaces are not all
            # zero (an all-zero funnel means the user block sampled no
            # funnel mass and the "pass" would be contentless).
            def _mag(v) -> float:
                if isinstance(v, bool) or not isinstance(v, (int, float)):
                    return 0.0
                if isinstance(v, float) and math.isnan(v):
                    return 0.0
                return abs(v)

            total = sum(_mag(v) for r in orows for v in r)
            if not orows or not total:
                print(f"FAIL  {key}: sampled-fixture twin is vacuous "
                      "(empty / all-zero oracle output) — widen the block")
                results[key] = {"status": "fail",
                                "err": "vacuous sampled fixture"}
                n_fail += 1
                continue
        problems = []
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if sorted(scols) != sorted(ocols):
            problems.append(f"cols spark={sorted(scols)} oracle={sorted(ocols)}")
        if not problems:
            hs, ho = _hash_rows(scols, srows), _hash_rows(ocols, orows)
            if hs != ho:
                problems.append("value-hash mismatch")
                # print first differing canonical row for debugging
                order_s = sorted(range(len(scols)), key=lambda i: scols[i])
                order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
                ls = sorted("\x1f".join(_canon(r[i]) for i in order_s) for r in srows)
                lo = sorted("\x1f".join(_canon(r[i]) for i in order_o) for r in orows)
                for a, b in zip(ls, lo):
                    if a != b:
                        problems.append(f"  spark : {a[:300]}")
                        problems.append(f"  oracle: {b[:300]}")
                        break
        if problems:
            print(f"FAIL  {key}: " + "; ".join(problems[:1]))
            for p in problems[1:]:
                print(p)
            results[key] = {"status": "fail", "err": problems[0]}
            n_fail += 1
        else:
            tag = (" (scale-twin)" if twin
                   else " (sampled-fixture)" if sampled else "")
            print(f"PASS  {key}: {len(srows)} rows{tag} "
                  f"[{time.time()-t0:.1f}s]")
            status = "pass"
            if twin:
                status = "pass_scale_twin"
            elif sampled:
                status = "pass_sampled_fixture"
            results[key] = {
                "status": status,
                "rows": len(srows),
                "secs": round(time.time() - t0, 2),
            }
            n_pass += 1
    print(f"\n{n_pass} pass, {n_rows_only} rows-only, {n_fail} fail "
          f"(sf_dir={SF_DIR})")
    if json_out:
        with open(json_out, "w") as fh:
            json.dump(
                {
                    "sf_dir": SF_DIR,
                    "n_pass": n_pass,
                    "n_rows_only": n_rows_only,
                    "n_fail": n_fail,
                    "keys": results,
                },
                fh,
                indent=1,
            )
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
