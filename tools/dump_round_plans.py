"""Dump `.explain("formatted")` per query into plans/r13/<name>_<tag>.txt.

The optimization-round deliverable: one file per examined query and
phase (`_before` / `_after`), committed so the judge can check plan
claims without running Spark.

Usage: python tools/dump_round_plans.py <tag> [sf_dir] [name ...]
       (default sf_dir /root/testdata/sf0.1; default names = bench
       HEADLINE + TIER2)
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    tag = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    from bench import HEADLINE, TIER2
    from gaming_ai_analytics_spark import registry
    from gaming_ai_analytics_spark.session import get_spark

    names = sys.argv[3:] or (HEADLINE + TIER2)
    out_dir = os.path.join(REPO, "plans", "r13")
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("dump_round_plans")
    jvm = spark._jvm
    qs = dict(registry.queries())
    from gaming_ai_analytics_spark.queries_llm import q_similarity_topk_lsh

    qs.setdefault("similarity_topk_lsh", q_similarity_topk_lsh)

    for name in names:
        df = qs[name](spark, sf_dir)
        plan = jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(f"-- {name} @ {sf_dir} ({tag})\n\n")
            f.write(plan)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
