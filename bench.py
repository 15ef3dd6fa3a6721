"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Method: each query runs twice — cold (plan + JIT + file-index) then
warm; the warm time is recorded (steady-state, per BASELINE.md).
Materialization uses the noop sink: full execution, no driver-side
row transfer skewing the number.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

#: Representative heavy paths across the operator surface.
HEADLINE = [
    "flagship_star_metrics",
    "join_chain_left",
    "fillna_after_left_join",
    "agg_percentile",
    "window_topk_per_group",
    "agg_rollup",
    "fact_build_transform",
    "text_analysis_profile",
    "dedup_minhash_lsh",
    "similarity_topk",
    "similarity_topk_lsh",
    "events_session_window",
    "metric_view_region",
]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from gaming_ai_analytics_spark.session import get_spark
    from gaming_ai_analytics_spark import registry

    spark = get_spark("bench")
    qs = registry.queries()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = qs[name]
        materialize(fn(spark, sf_dir))  # cold: plan + JIT + index
        t0 = time.perf_counter()
        materialize(fn(spark, sf_dir))  # warm: steady state
        timings[name] = round(time.perf_counter() - t0, 3)

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_warm",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf else None,
            }
        )
    )


if __name__ == "__main__":
    main()
