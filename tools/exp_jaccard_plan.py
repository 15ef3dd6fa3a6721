"""Dump the formatted plan for dedup_ngram_jaccard (the
ngram_jaccard_pairs operator itself) — before/after evidence for the
r13 carried-size + length-filter rewrite.

Usage: python tools/exp_jaccard_plan.py <out_file> [sf_dir] [query]
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    out = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    from gaming_ai_analytics_spark import registry
    from gaming_ai_analytics_spark.session import get_spark

    spark = get_spark("exp_jaccard_plan")
    qs = dict(registry.queries())
    name = sys.argv[3] if len(sys.argv) > 3 else "dedup_ngram_jaccard"
    df = qs[name](spark, sf_dir)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    with open(out, "w") as f:
        f.write(plan)
    print(f"wrote {out} ({len(plan.splitlines())} lines, "
          f"{plan.count('Exchange')} Exchange mentions)")


if __name__ == "__main__":
    main()
