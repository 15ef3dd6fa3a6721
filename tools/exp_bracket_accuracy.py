"""Bracket-percentile accuracy sweep (r6 VERDICT ask #7).

Measures, at a given SF, how ``bracket_exact_percentile``'s driver
state and wall time scale with the ``accuracy`` knob — the experiment
backing the docstring claim that the pass-2 in-bracket slice is
≈ 8n/accuracy rows per group (margin = 4/accuracy each side of p, rank
error ≤ n/accuracy, so the bracket spans ≤ 8n/accuracy ranks) and that
accuracy should therefore be scaled with n/group to keep the collected
slice within driver budget.

Per accuracy: correctness vs the built-in exact percentile, the actual
pass-2 slice size per group (replicating pass 1's bracket — same
margin arithmetic as the operator's attempt 0), and fresh-lineage
median wall time over 3 runs.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from gaming_ai_analytics_spark.operators.aggregates import (  # noqa: E402
    bracket_exact_percentile,
)
from gaming_ai_analytics_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.benchdata/sf1"
    p = 0.5
    spark = get_spark("exp-bracket-accuracy")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")

    want = {
        r.l_linestatus: r.mp
        for r in li.groupBy("l_linestatus")
        .agg(F.round(F.percentile("l_extendedprice", F.lit(p)), 2).alias("mp"))
        .collect()
    }
    n_rows = li.count()
    print(f"sf_dir={sf_dir} rows={n_rows} groups={len(want)}")
    print("accuracy | slice_rows/group (max) | 8n/acc bound | med_wall_s | exact")

    for accuracy in (1_000, 10_000, 100_000):
        # replicate pass 1's attempt-0 bracket to observe slice sizes
        eps = 4.0 / accuracy
        br = li.groupBy("l_linestatus").agg(
            F.count("l_extendedprice").alias("_n"),
            F.percentile_approx(
                "l_extendedprice",
                F.array(F.lit(max(0.0, p - eps)), F.lit(min(1.0, p + eps))),
                F.lit(accuracy),
            ).alias("_br"),
        )
        stats = {
            r.l_linestatus: (r._n, float(r._br[0]), float(r._br[1]))
            for r in br.collect()
        }
        slice_sizes = {}
        for g, (n, lo, hi) in stats.items():
            slice_sizes[g] = (
                li.filter(
                    (F.col("l_linestatus") == g)
                    & F.col("l_extendedprice").between(lo, hi)
                ).count(),
                int(8 * n / accuracy) + 2,
            )

        def run() -> float:
            t0 = time.perf_counter()
            df = bracket_exact_percentile(
                spark.read.parquet(f"{sf_dir}/lineitem.parquet"),
                ["l_linestatus"],
                "l_extendedprice",
                "median_price",
                accuracy=accuracy,
            )
            got = {r.l_linestatus: r.median_price for r in df.collect()}
            assert got == want, (accuracy, got, want)
            return time.perf_counter() - t0

        run()  # warm
        wall = statistics.median(run() for _ in range(3))
        mx = max(s for s, _ in slice_sizes.values())
        bound = max(b for _, b in slice_sizes.values())
        print(
            f"{accuracy:>8} | {mx:>10} ({slice_sizes}) | {bound:>8} | "
            f"{wall:.3f} | ok",
            flush=True,
        )
    print(f"load {os.getloadavg()[0]:.2f}")


if __name__ == "__main__":
    main()
