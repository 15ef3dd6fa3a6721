"""Interleaved A/B: temporal_embargo_split's per-split distinct floor
(VERDICT r10 ask #5 — the weak/floor call should rest on a measurement,
the dau_mau standard).

Arms (fresh lineage per run, toPandas materialization):
  A registered   countDistinct riding the 3-key aggregate
  B two-level    (split, user) pre-agg -> split-level reduce
  C approx tier  approx_count_distinct(user_id) in the 3-key aggregate

A and B are value-identical by construction (gated before timing).
C trades exactness for one shuffle of 3-key partials — measured to see
whether the distinct shuffle is the floor at all.

Usage: python tools/exp_embargo_distinct_ab.py [sf_dir] [pairs]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from gaming_ai_analytics_spark.queries_traindata import (  # noqa: E402
    q_temporal_embargo_split,
)
from gaming_ai_analytics_spark.session import get_spark  # noqa: E402
from gaming_ai_analytics_spark.sources.star import load_table  # noqa: E402


def _assigned(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("_d"), "value"
    )
    bounds = ev.agg(F.max("_d").alias("_d1"))
    return ev.crossJoin(F.broadcast(bounds)).select(
        F.when(F.datediff("_d1", "_d") > 20, "train")
        .when(F.datediff("_d1", "_d") > 13, "embargo")
        .otherwise("test")
        .alias("split"),
        "user_id",
        "value",
    )


def arm_a(spark, sf_dir):
    return q_temporal_embargo_split(spark, sf_dir)


def arm_b(spark, sf_dir):
    pre = _assigned(spark, sf_dir).groupBy("split", "user_id").agg(
        F.count(F.lit(1)).alias("_n"), F.sum("value").alias("_v")
    )
    return (
        pre.groupBy("split")
        .agg(
            F.sum("_n").alias("n_events"),
            F.count(F.lit(1)).alias("n_users"),
            F.round(F.sum("_v") + 5e-10, 2).alias("total_value"),
        )
        .orderBy("split")
    )


def arm_c(spark, sf_dir):
    return (
        _assigned(spark, sf_dir)
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.approx_count_distinct("user_id").alias("n_users"),
            F.round(F.sum("value") + 5e-10, 2).alias("total_value"),
        )
        .orderBy("split")
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, ".benchdata", "sf1"
    )
    pairs = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    spark = get_spark("exp-embargo-ab")

    a = arm_a(spark, sf_dir).collect()
    b = arm_b(spark, sf_dir).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b], (a, b)
    c = arm_c(spark, sf_dir).collect()
    drift = max(
        abs(ra.n_users - rc.n_users) / ra.n_users for ra, rc in zip(a, c)
    )
    print(f"arms A=B on {len(a)} rows; C n_users drift {drift:.4f}")

    arms = {"A_countDistinct": arm_a, "B_two_level": arm_b, "C_approx": arm_c}
    for fn in arms.values():
        fn(spark, sf_dir).toPandas()  # warm
    res = {k: [] for k in arms}
    for i in range(pairs):
        line = [f"pair {i}:"]
        for k, fn in arms.items():
            t0 = time.perf_counter()
            fn(spark, sf_dir).toPandas()
            res[k].append(time.perf_counter() - t0)
            line.append(f"{k}={res[k][-1]:.3f}s")
        print(" ".join(line), flush=True)
    print("=== medians ===")
    for k in arms:
        print(f"{k:16s} {statistics.median(res[k]):.3f}s")


if __name__ == "__main__":
    main()
