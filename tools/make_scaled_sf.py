"""Derive a larger scale factor from the driver's sf0.1 fixtures.

The graded testdata stops at sf0.1, where ~8 of 13 headline queries
are bound by Spark's ~0.35 s/query scheduling floor rather than by
data (BASELINE.md §3) — the wrong regime for judging a 100 TB design.
This tool replicates sf0.1 K× with key-space-preserving offsets so
join fan-out, group cardinality ratios, and null densities stay
exactly as generated; only volume grows. Dimension tables (region,
nation) are copied as-is — their keys are referenced unchanged.

Pure DuckDB (no Spark): each table is one CROSS JOIN range(K) with
the replica index folded into every synthetic key at a stride of
(max key + 1). Deterministic; output parquet under the repo's
.benchdata/ (gitignored — derived data, rebuilt on demand).

Usage: python tools/make_scaled_sf.py [src_dir] [out_dir] [K]
"""

from __future__ import annotations

import os
import sys

import duckdb

#: table -> columns that get a per-replica stride offset
KEY_OFFSETS: dict[str, list[str]] = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "region": [],
    "nation": [],
}

#: stride source: the key space being offset lives in this table/column
#: (foreign keys must stride by the REFERENCED table's span so every
#: replica's facts point at that replica's dims)
STRIDE_OF: dict[str, tuple[str, str]] = {
    "l_orderkey": ("orders", "o_orderkey"),
    "o_orderkey": ("orders", "o_orderkey"),
    "l_partkey": ("part", "p_partkey"),
    "p_partkey": ("part", "p_partkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
    "s_suppkey": ("supplier", "s_suppkey"),
    "o_custkey": ("customer", "c_custkey"),
    "c_custkey": ("customer", "c_custkey"),
    "event_id": ("events", "event_id"),
    "user_id": ("events", "user_id"),
    "doc_id": ("documents", "doc_id"),
    "vec_id": ("embeddings", "vec_id"),
}


def make_scaled(src_dir: str, out_dir: str, k: int = 10) -> None:
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    strides = {
        col: con.sql(
            f"SELECT MAX({scol}) + 1 FROM '{src_dir}/{table}.parquet'"
        ).fetchone()[0]
        for col, (table, scol) in STRIDE_OF.items()
    }
    for table, keys in KEY_OFFSETS.items():
        src = f"'{src_dir}/{table}.parquet'"
        dst = os.path.join(out_dir, f"{table}.parquet")
        if not keys:  # dims: straight copy
            con.execute(f"COPY (SELECT * FROM {src}) TO '{dst}'")
            continue
        cols = [c[0] for c in con.sql(f"DESCRIBE SELECT * FROM {src}").fetchall()]

        def col_expr(c: str) -> str:
            if c in keys:
                return f"{c} + _r.i * {strides[c]} AS {c}"
            if table == "documents" and c == "text":
                # replicated text would put EVERY doc in a K-way exact-
                # duplicate cluster — pair output grows K² and the sf1
                # row measures that explosion instead of volume. A
                # per-replica suffix keeps the corpus's dup/near-dup
                # density as generated.
                return f"text || ' #' || _r.i AS text"
            return c

        select = ", ".join(col_expr(c) for c in cols)
        con.execute(
            f"COPY (SELECT {select} FROM {src} CROSS JOIN range({k}) _r(i)) "
            f"TO '{dst}'"
        )


if __name__ == "__main__":
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(repo, ".benchdata", "sf1")
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    make_scaled(src, out, k)
    print(f"wrote {out} ({k}x {src})")
