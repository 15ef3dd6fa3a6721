"""Interleaved A/B: flagship median strategy (r6 VERDICT ask #5).

Arms (fresh DataFrame per run, toPandas materialization — bench.py's
measurement rules):
  A = registered plan (built-in ``percentile`` riding the single
      joined aggregation)
  B = ``median_impl="bracket"`` (median split onto the two-scan
      bracket strategy, all algebraic measures as pass-1 companions)

Interleaving removes the JIT/warm-up order confound that invalidated a
round-5 same-session A/B (BASELINE.md §3). Results print per-pair and
median-per-arm; run at sf0.1 and sf1.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from gaming_ai_analytics_spark.plans.flagship import (  # noqa: E402
    flagship_star_metrics,
)
from gaming_ai_analytics_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("exp-flagship-bracket")

    # correctness gate first: both arms identical
    a = flagship_star_metrics(spark, sf_dir).orderBy("r_name").collect()
    b = flagship_star_metrics(
        spark, sf_dir, median_impl="bracket"
    ).orderBy("r_name").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b], (a, b)
    print("arms agree on", len(a), "rows")

    def run(impl: str) -> float:
        t0 = time.perf_counter()
        flagship_star_metrics(spark, sf_dir, median_impl=impl).toPandas()
        return time.perf_counter() - t0

    for impl in ("percentile", "bracket"):  # warm both arms
        run(impl)
        run(impl)

    ta, tb = [], []
    for i in range(pairs):
        ta.append(run("percentile"))
        tb.append(run("bracket"))
        print(
            f"pair {i}: percentile={ta[-1]:.3f}s bracket={tb[-1]:.3f}s",
            flush=True,
        )
    print(
        f"MEDIAN sf={sf_dir}: percentile={statistics.median(ta):.3f}s "
        f"bracket={statistics.median(tb):.3f}s "
        f"(load {os.getloadavg()[0]:.2f})"
    )


if __name__ == "__main__":
    main()
