"""Leakage-split fingerprint A/B (r9, VERDICT r8 ask #4): the one
ratio-weak query with an untried micro-lever — `leakage_safe_split`'s
cost IS the per-document fingerprint pass (r8: two regexp_replace +
md5 at 2.31× behind DuckDB at sf10).

Arms (each runs the FULL registered shape — fingerprint → cluster
groupBy(min rep, counts) → split aggregate — so the measured cost is
end-to-end and the 3-row output must be IDENTICAL across arms):

  regex2_md5 — the r8 registered form: strip-then-collapse regex pair
               + md5 group key;
  regex1_md5 — the r9 fused single-regex normalize (value-identical,
               hypothesis-pinned) + md5 group key;
  regex1_xxh — fused normalize + xxhash64 group key.  The fingerprint
               is ONLY a grouping key here (never an output value),
               so any injective-enough recoding of the normalized
               text induces the same cluster partition → same reps →
               same splits; the oracle can group by the raw
               normalized string and stay value-equal.

Interleaved A/B/C over fresh DataFrames per run (DAG-scheduler
shuffle reuse on retained lineage is ~3× flattering; JIT warm-up
order-confounds sequential arms) — the measurement rules from
BASELINE.md §3.

Usage: python tools/exp_fingerprint_ab.py [sf ...]   (default sf1)
Prints one JSON line per SF.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIRS = {
    "sf0.1": "/root/testdata/sf0.1",
    "sf1": os.path.join(REPO, ".benchdata", "sf1"),
    "sf10": os.path.join(REPO, ".benchdata", "sf10"),
}
ROUNDS = 5


def main() -> None:
    from pyspark.sql import functions as F

    from gaming_ai_analytics_spark.functions.text import (
        normalize_text,
        normalize_text_2pass,
    )
    from gaming_ai_analytics_spark.queries_traindata import split_assign
    from gaming_ai_analytics_spark.session import get_spark
    from gaming_ai_analytics_spark.sources.star import load_table

    spark = get_spark("fingerprint-ab")

    ARMS = {
        "regex2_md5": lambda c: F.md5(normalize_text_2pass(c)),
        "regex1_md5": lambda c: F.md5(normalize_text(c)),
        "regex1_xxh": lambda c: F.xxhash64(normalize_text(c)),
    }

    sfs = sys.argv[1:] or ["sf1"]
    for sf in sfs:
        sf_dir = SF_DIRS[sf]

        def run(fp) -> tuple[float, tuple]:
            docs = load_table(spark, sf_dir, "documents").filter(
                F.col("text").isNotNull()
            )  # fresh lineage per run
            t0 = time.perf_counter()
            rows = (
                docs.groupBy(fp(F.col("text")).alias("_fp"))
                .agg(
                    F.min("doc_id").alias("_rep"),
                    F.count(F.lit(1)).alias("_n_docs"),
                    F.sum("n_chars").alias("_chars"),
                )
                .select(
                    split_assign(F.col("_rep")).alias("split"),
                    "_n_docs",
                    "_chars",
                )
                .groupBy("split")
                .agg(
                    F.sum("_n_docs").alias("n_docs"),
                    F.count(F.lit(1)).alias("n_clusters"),
                    F.sum("_chars").alias("total_chars"),
                )
                .orderBy("split")
                .collect()
            )
            dt = time.perf_counter() - t0
            return dt, tuple(tuple(r) for r in rows)

        for fp in ARMS.values():  # warm every arm once
            run(fp)
        times: dict[str, list[float]] = {k: [] for k in ARMS}
        results = set()
        for _ in range(ROUNDS):
            for name, fp in ARMS.items():
                dt, res = run(fp)
                times[name].append(round(dt, 3))
                results.add(res)
        # integer outputs: arms must agree EXACTLY
        assert len(results) == 1, f"arms disagree: {results}"
        med = {k: sorted(v)[len(v) // 2] for k, v in times.items()}
        base = med["regex2_md5"]
        print(json.dumps({
            "exp": "fingerprint_ab", "sf": sf,
            "median_s": med,
            "speedup_vs_r8": {
                k: round(base / v, 2) for k, v in med.items()
            },
            "all_runs": times,
        }))


if __name__ == "__main__":
    main()
