"""Quality-score fused-vs-unfused A/B (r8, VERDICT r7 ask #4): the
per-document quality pass is the floor under `quality_psi_drift`
(4.5× behind DuckDB at sf10), `text_analysis_profile`'s share, and
the measured ~2 s/pass at sf1 — the one heavy path with an untried
vectorization lever.

Arms (each = score the documents corpus, aggregate sum+count so the
result is a 1-row reduce and the measured cost is the scoring pass):
  unfused — the r4–r7 formulation: split() token array, filtered
            stopword copy, regexp_replace'd punctuation copy;
  fused   — the r8 formulation: two regexp_count scans + a separator
            count, zero array/string allocation (value-identical,
            hypothesis-pinned).

Interleaved A/B/A/B over fresh DataFrames per run (DAG-scheduler
shuffle reuse on retained lineage is ~3× flattering; JIT warm-up
order-confounds sequential arms) — the measurement rules from
BASELINE.md §3.

Usage: python tools/exp_quality_fused.py [sf ...]   (default sf1)
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
        quality_score,
        quality_score_unfused,
    )
    from gaming_ai_analytics_spark.session import get_spark
    from gaming_ai_analytics_spark.sources.star import (
        load_nonempty_documents,
    )

    spark = get_spark("quality-fused-ab")
    sfs = sys.argv[1:] or ["sf1"]
    for sf in sfs:
        sf_dir = SF_DIRS[sf]

        def run(scorer) -> tuple[float, float, int]:
            docs = load_nonempty_documents(spark, sf_dir)  # fresh lineage
            t0 = time.perf_counter()
            row = docs.agg(
                F.sum(scorer(F.col("text"))).alias("s"),
                F.count(F.lit(1)).alias("n"),
            ).collect()[0]
            dt = time.perf_counter() - t0
            return dt, float(row.s), int(row.n)

        # warm both arms once (JIT, file listing), then interleave
        run(quality_score_unfused), run(quality_score)
        times = {"unfused": [], "fused": []}
        sums, ns = [], set()
        for _ in range(ROUNDS):
            dt, s, n = run(quality_score_unfused)
            times["unfused"].append(round(dt, 3))
            sums.append(s); ns.add(n)
            dt, s, n = run(quality_score)
            times["fused"].append(round(dt, 3))
            sums.append(s); ns.add(n)
        # value parity within last-ulp tolerance: the final double SUM
        # merges mapper partials in nondeterministic order, so two
        # runs of the SAME plan can differ by an ulp — per-row
        # equality is hypothesis-pinned; here we assert the corpus
        # sums agree to relative 1e-12 and counts exactly
        assert len(ns) == 1, f"row counts disagree: {ns}"
        lo, hi = min(sums), max(sums)
        assert hi - lo <= abs(hi) * 1e-12, f"arms disagree: {lo} vs {hi}"
        med = {k: sorted(v)[len(v) // 2] for k, v in times.items()}
        print(json.dumps({
            "exp": "quality_fused_ab", "sf": sf,
            "rows": next(iter(ns)),
            "median_s": med,
            "speedup": round(med["unfused"] / med["fused"], 2),
            "all_runs": times,
        }))


if __name__ == "__main__":
    main()
