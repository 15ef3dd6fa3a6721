"""Measure DataFrame CONSTRUCTION cost per benched query (§1: know
where the floor goes before touching it).

Each bench run pays `fn(spark, sf_dir)` — pure driver-side plan
construction (py4j round-trips, analysis triggers like
`df.rdd.getNumPartitions()` / Catalyst stats probes) — before any
action. On a host whose per-operation latency is ~2.5-3x the r3-r12
regime (OPTIMIZATION_r13.md "Host regime"), this share is inflated
the most, so it is re-measured here rather than assumed from the r3
table-resolution-cache round.

Usage: python tools/exp_construction_cost.py [sf_dir] [reps]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    from bench import HEADLINE, TIER2
    from gaming_ai_analytics_spark import registry
    from gaming_ai_analytics_spark.session import get_spark

    spark = get_spark("exp-construction")
    qs = dict(registry.queries())
    from gaming_ai_analytics_spark.queries_llm import q_similarity_topk_lsh

    qs.setdefault("similarity_topk_lsh", q_similarity_topk_lsh)

    names = HEADLINE + TIER2
    for name in names:  # warm: table cache, module state
        qs[name](spark, sf_dir)
    rows = []
    for name in names:
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir)
            ts.append(time.perf_counter() - t0)
        rows.append((statistics.median(ts), name))
    rows.sort(reverse=True)
    total = sum(r[0] for r in rows)
    print(f"construction-only, median of {reps}, sf_dir={sf_dir}")
    for sec, name in rows:
        print(f"{sec*1000:8.1f} ms  {name}")
    print(f"{total*1000:8.1f} ms  TOTAL (18 queries)")


if __name__ == "__main__":
    main()
