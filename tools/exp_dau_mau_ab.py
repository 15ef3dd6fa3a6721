"""DAU/MAU stickiness A/B/C (r10, VERDICT r9 ask #2): the one new
weak row — `dau_mau_stickiness` was 4.8x behind DuckDB at sf10 (8.52
vs 1.76 s) and the named suspect is the double distinct: the corpus
(user, day) distinct PLUS a second distinct over the 28x-exploded
coverage frame.

Arms (each produces the IDENTICAL (d, dau, mau28, stickiness) rows):

  double_distinct — the r9 registered shape: distinct activity ->
                    explode 28 -> distinct (user, covered_day) ->
                    count per day; DAU from a second branch + join.
  coverage_minoff — the verdict's lever: ONE pass over the exploded
                    frame, groupBy(user, covered_day).agg(min(offset))
                    (offset=0 marks the DAU row), then a single
                    groupBy(day) emits dau AND mau28 together — one
                    distinct-class shuffle instead of two, no branch
                    join, no localCheckpoint materialization.
  interval_delta  — eliminate the 28x explode entirely: per user,
                    merge overlapping coverage intervals [d, d+27]
                    into islands (gap > 28 days starts a new island —
                    one activity-sized window shuffle), emit +1 at
                    island start / -1 the day after island end,
                    reduce deltas per DAY (map-side combined, output
                    <= 2*|calendar days| rows), and a single tiny
                    prefix-sum over the day points IS the trailing
                    MAU.  Shuffled bytes never exceed the activity
                    frame — no 28x amplification anywhere.

Interleaved A/B/C over fresh DataFrames per run (DAG-scheduler
shuffle reuse on retained lineage is ~3x flattering; JIT warm-up
order-confounds sequential arms) — the measurement rules from
BASELINE.md §3.

Usage: python tools/exp_dau_mau_ab.py [sf ...]   (default sf1)
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
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from gaming_ai_analytics_spark.session import get_spark
    from gaming_ai_analytics_spark.sources.star import load_table

    spark = get_spark("dau-mau-ab")

    def activity(sf_dir):
        return (
            load_table(spark, sf_dir, "events")
            .select("user_id", F.to_date("ts").alias("d"))
        )

    def finish(dau_mau):
        return (
            dau_mau.select(
                "d",
                "dau",
                "mau28",
                F.round(F.col("dau") / F.col("mau28") + 5e-10, 4).alias(
                    "stickiness"
                ),
            )
            .orderBy("d")
        )

    def arm_a(sf_dir):
        active = activity(sf_dir).distinct().localCheckpoint()
        dau = active.groupBy("d").agg(F.count(F.lit(1)).alias("dau"))
        covered = (
            active.select(
                "user_id",
                F.explode(
                    F.expr("sequence(d, date_add(d, 27), interval 1 day)")
                ).alias("d"),
            )
            .distinct()
            .groupBy("d")
            .agg(F.count(F.lit(1)).alias("mau28"))
        )
        return finish(dau.join(covered, "d"))

    def arm_b(sf_dir):
        cov = activity(sf_dir).distinct().select(
            "user_id",
            F.posexplode(
                F.expr("sequence(d, date_add(d, 27), interval 1 day)")
            ).alias("off", "d"),
        )
        per_day = (
            cov.groupBy("user_id", "d")
            .agg(F.min("off").alias("off"))
            .groupBy("d")
            .agg(
                F.sum(F.when(F.col("off") == 0, 1).otherwise(0)).alias(
                    "dau"
                ),
                F.count(F.lit(1)).alias("mau28"),
            )
            .filter(F.col("dau") > 0)
        )
        return finish(per_day)

    def arm_c(sf_dir):
        active = activity(sf_dir).distinct().localCheckpoint()
        dau = active.groupBy("d").agg(F.count(F.lit(1)).alias("dau"))
        w = Window.partitionBy("user_id").orderBy("d")
        islands = (
            active.withColumn(
                "_new",
                F.when(
                    F.datediff("d", F.lag("d").over(w)) > 28, 1
                ).otherwise(0),
            )
            .withColumn("_grp", F.sum("_new").over(w))
            .groupBy("user_id", "_grp")
            .agg(
                F.min("d").alias("_s"),
                F.date_add(F.max("d"), 27).alias("_e"),
            )
        )
        deltas = islands.select(
            F.col("_s").alias("d"), F.lit(1).alias("_dd")
        ).unionAll(
            islands.select(
                F.date_add("_e", 1).alias("d"), F.lit(-1).alias("_dd")
            )
        )
        points = (
            deltas.unionAll(dau.select("d", F.lit(0).alias("_dd")))
            .groupBy("d")
            .agg(F.sum("_dd").alias("_dd"))
        )
        cum = points.withColumn(
            "mau28",
            F.sum("_dd").over(Window.orderBy("d")),
        )
        return finish(dau.join(cum.select("d", "mau28"), "d"))

    ARMS = {
        "double_distinct": arm_a,
        "coverage_minoff": arm_b,
        "interval_delta": arm_c,
    }

    sfs = sys.argv[1:] or ["sf1"]
    for sf in sfs:
        sf_dir = SF_DIRS[sf]

        def run(arm) -> tuple[float, tuple]:
            t0 = time.perf_counter()
            rows = arm(sf_dir).collect()
            dt = time.perf_counter() - t0
            return dt, tuple(tuple(r) for r in rows)

        for arm in ARMS.values():  # warm every arm once
            run(arm)
        times: dict[str, list[float]] = {k: [] for k in ARMS}
        results = set()
        for _ in range(ROUNDS):
            for name, arm in ARMS.items():
                dt, res = run(arm)
                times[name].append(round(dt, 3))
                results.add(res)
        assert len(results) == 1, (
            f"arms disagree: {[len(r) for r in results]} rows"
        )
        med = {k: sorted(v)[len(v) // 2] for k, v in times.items()}
        base = med["double_distinct"]
        print(json.dumps({
            "exp": "dau_mau_ab", "sf": sf,
            "median_s": med,
            "speedup_vs_registered": {
                k: round(base / v, 2) for k, v in med.items()
            },
            "all_runs": times,
        }))


if __name__ == "__main__":
    main()
