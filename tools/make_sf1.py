"""Generate an sf1-scale fixture set by key-shifted 10x replication of
the driver's sf0.1 tables (read-only; we may not regenerate them).

Method: every table is unioned 10 times; replica i shifts each key
column by ``i * span(referenced table)`` so foreign-key relationships,
join fan-outs, per-key cardinalities, selectivities, and value
distributions are preserved EXACTLY — the per-row work of every bench
query is unchanged, only the row count grows 10x, which is precisely
what a scaling-slope measurement needs. region/nation stay fixed (they
are constant-size dimensions at every TPC-H scale factor).

documents/embeddings replicate verbatim with shifted ids: replicas form
10-member duplicate groups, the realistic re-crawl shape for dedup_*
keys; group-bounded candidate generation keeps their cost linear-ish in
N (that claim is part of what the sf1 run checks).

Output: <repo>/.scratch/sf1/*.parquet (gitignored, ~150 MB). Usage:

    python tools/make_sf1.py
    SPARK_GRAFT_SF_DIR=$PWD/.scratch/sf1 python bench.py
"""

from __future__ import annotations

import os
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.environ.get("SPARK_GRAFT_SF01_DIR", "/root/testdata/sf0.1")
DST = os.path.join(REPO, ".scratch", "sf1")
REPLICAS = 10

# table -> {column: span_source_table}; spans are max(key)+1 of the
# REFERENCED table so shifted foreign keys land on shifted primary keys.
SHIFTS: dict[str, dict[str, tuple[str, str]]] = {
    "region": {},
    "nation": {},
    "supplier": {"s_suppkey": ("supplier", "s_suppkey")},
    "customer": {"c_custkey": ("customer", "c_custkey")},
    "part": {"p_partkey": ("part", "p_partkey")},
    "orders": {
        "o_orderkey": ("orders", "o_orderkey"),
        "o_custkey": ("customer", "c_custkey"),
    },
    "lineitem": {
        "l_orderkey": ("orders", "o_orderkey"),
        "l_partkey": ("part", "p_partkey"),
        "l_suppkey": ("supplier", "s_suppkey"),
    },
    "events": {
        "event_id": ("events", "event_id"),
        "user_id": ("events", "user_id"),
    },
    "documents": {"doc_id": ("documents", "doc_id")},
    "embeddings": {"vec_id": ("embeddings", "vec_id")},
}


def main() -> int:
    os.makedirs(DST, exist_ok=True)
    con = duckdb.connect()
    spans: dict[tuple[str, str], int] = {}
    for tbl, cols in SHIFTS.items():
        for src_tbl, src_col in cols.values():
            if (src_tbl, src_col) not in spans:
                spans[(src_tbl, src_col)] = con.execute(
                    f"SELECT max({src_col}) + 1 FROM "
                    f"read_parquet('{SRC}/{src_tbl}.parquet')"
                ).fetchone()[0]
    for tbl, cols in SHIFTS.items():
        out = os.path.join(DST, f"{tbl}.parquet")
        if not cols:  # constant-size dimension: copy as-is
            con.execute(
                f"COPY (SELECT * FROM read_parquet('{SRC}/{tbl}.parquet')) "
                f"TO '{out}' (FORMAT PARQUET)"
            )
            print(f"{tbl}: copied")
            continue
        if tbl == "events":
            # events.ts is parquet TIMESTAMP(NANOS) and the Spark reader
            # decodes it nanos-as-long; DuckDB 1.0 downcasts ns -> us on
            # COPY, so replicate through pyarrow to keep the physical
            # type (and read path) identical to the driver fixture.
            import pyarrow as pa
            import pyarrow.parquet as pq

            src = pq.read_table(f"{SRC}/{tbl}.parquet")
            parts = []
            for i in range(REPLICAS):
                arrays = []
                for name in src.schema.names:
                    col = src.column(name)
                    if name in cols:
                        span = spans[cols[name]]
                        col = pa.chunked_array(
                            [pa.compute.add(chunk, i * span) for chunk in col.chunks]
                        )
                    arrays.append(col)
                parts.append(pa.table(arrays, schema=src.schema))
            merged = pa.concat_tables(parts)
            pq.write_table(merged, out)
            print(f"{tbl}: {merged.num_rows} rows (pyarrow, ns preserved)")
            continue
        schema = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{tbl}.parquet')"
            ).fetchall()
        ]
        sel = ", ".join(
            f"{c} + r.i * {spans[cols[c]]} AS {c}" if c in cols else c
            for c in schema
        )
        con.execute(
            f"COPY (SELECT {sel} "
            f"FROM read_parquet('{SRC}/{tbl}.parquet'), "
            f"(SELECT unnest(range({REPLICAS})) AS i) r) "
            f"TO '{out}' (FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT count(*) FROM read_parquet('{out}')").fetchone()[0]
        print(f"{tbl}: {n} rows")
    return 0


if __name__ == "__main__":
    sys.exit(main())
