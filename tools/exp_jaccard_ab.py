"""A/B probe for the r13 ngram_jaccard_pairs rewrite (carried sizes +
length filter): fresh-lineage toPandas, cold + median-of-3 warm, for
the jaccard-family queries, at a given sf dir. Run alternately against
the old (git stash) and new working tree; one JSON line out.

Usage: python tools/exp_jaccard_ab.py <tag> [sf_dir] [names...]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

NAMES = ["dedup_ngram_jaccard", "dedup_cluster_assign_star",
         "dedup_survivors_quality"]


def main() -> None:
    tag = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    names = sys.argv[3:] or NAMES
    from gaming_ai_analytics_spark import registry
    from gaming_ai_analytics_spark.session import get_spark

    spark = get_spark("exp_jaccard_ab")
    qs = dict(registry.queries())
    out = {"tag": tag, "sf_dir": sf_dir}
    for name in names:
        fn = qs[name]
        fn(spark, sf_dir).toPandas()  # cold
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).toPandas()
            runs.append(time.perf_counter() - t0)
        out[name] = round(statistics.median(runs), 3)
        out[name + "_runs"] = [round(r, 3) for r in runs]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
