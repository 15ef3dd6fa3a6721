"""Skew-join strategy shoot-out (r7).

The repo carries three answers to the hot-key join problem — AQE's
runtime skew split (session default), `salted_join`, and
`hot_key_isolated_join` (operators/skew.py) — with correctness
evidence but no measured comparison. This grades all of them, plus the
unmitigated straggler baseline, on a fixture built to be exactly the
regime the operators exist for:

  fact: 40 M rows, ONE key holds 40% of them (the viral game / bot
        reviewer shape), 64-char incompressible payload so shuffle
        compression can't hide the hot partition (~16 M rows ≈ 0.6 GB
        compressed — past the 256 MB default AQE skew threshold)
  dim:  2 M keys, 128-char payload (~130 MB on disk — above the 64 MB
        broadcast threshold, so the plain join MUST shuffle both sides)

Workload per arm: fact ⋈ dim on k, group by the dim's 1 k-value
attribute, count + sum(length(payload)) — forces the full join, tiny
result. Every arm must return the identical aggregate (asserted).

Arms (each in its OWN subprocess = cold JVM; two interleaved rounds):
  no_mitigation  AQE skew split OFF — the straggler baseline: one
                 reduce task sorts the 16 M-row hot partition alone
  aqe_skew       session defaults — AQE splits the hot partition at
                 runtime into advisory-sized sub-reads
  salted         salted_join(buckets=16), AQE skew OFF — spreads the
                 hot key over 16 reducers, pays dim ×16 replication
  isolated       hot_key_isolated_join(hot_keys=[0]), AQE skew OFF —
                 hot slice joins a broadcast 1-row dim subset with NO
                 shuffle; cold slice (uniform) joins normally. Pays a
                 second fact scan instead of replication. The hot-key
                 list is passed explicitly (detection = one bounded
                 top_keys agg, measured separately by the driver run).

Usage:
  python tools/exp_skew_strategies.py            # prep + full matrix
  python tools/exp_skew_strategies.py --arm X    # one measured arm
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE = os.path.join(REPO, ".benchdata", "skewbench")
FACT, DIM = os.path.join(BASE, "fact.parquet"), os.path.join(BASE, "dim.parquet")
N_FACT, N_KEYS, HOT_SHARE = 40_000_000, 2_000_000, 0.4
ARMS = ("no_mitigation", "aqe_skew", "salted", "isolated")


def _spark():
    from gaming_ai_analytics_spark.session import get_spark

    return get_spark("skew-strategies")


def prepare() -> None:
    if os.path.isdir(FACT) and os.path.isdir(DIM):
        return
    from pyspark.sql import functions as F

    spark = _spark()
    # 40% of ids land on key 0 deterministically (id%25<10); the rest
    # hash-uniform over the dim's key space
    (
        spark.range(N_FACT)
        .select(
            F.when(F.col("id") % 25 < 10, F.lit(0))
            .otherwise(F.pmod(F.xxhash64("id"), F.lit(N_KEYS)))
            .alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("pay"),
        )
        .write.mode("overwrite")
        .parquet(FACT)
    )
    (
        spark.range(N_KEYS)
        .select(
            F.col("id").alias("k"),
            (F.col("id") % 1000).alias("grp"),
            F.sha2(F.col("id").cast("string"), 512).alias("attr"),
        )
        .write.mode("overwrite")
        .parquet(DIM)
    )


def run_arm(arm: str) -> dict:
    from pyspark.sql import functions as F

    from gaming_ai_analytics_spark.operators.skew import (
        hot_key_isolated_join,
        salted_join,
    )

    spark = _spark()
    if arm != "aqe_skew":
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    fact = spark.read.parquet(FACT)
    dim = spark.read.parquet(DIM)

    t0 = time.perf_counter()
    if arm == "salted":
        joined = salted_join(fact, dim, "k", salt_buckets=16)
    elif arm == "isolated":
        joined = hot_key_isolated_join(fact, dim, "k", hot_keys=[0])
    else:
        joined = fact.join(dim, "k")
    # the aggregate must CONSUME dim.attr: column pruning otherwise
    # drops it, the shuffled dim shrinks to (k, grp) ≈ 30 MB, and AQE
    # legitimately converts the whole join to a runtime broadcast — no
    # reduce-side skew left to mitigate (measured: every arm ~8 s via
    # BroadcastHashJoin). That conversion is its own 100 TB lesson
    # (recorded in BASELINE.md §3); the premise HERE is a dim too wide
    # to broadcast, so the workload reads its payload.
    row = (
        joined.groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.length("pay") + F.length("attr")).alias("paylen"),
        )
        .agg(
            F.count(F.lit(1)).alias("groups"),
            F.sum("n").alias("rows"),
            F.sum("paylen").alias("paylen"),
            F.sum(F.hash("grp", "n", "paylen").cast("long")).alias("sig"),
        )
        .first()
    )
    wall = time.perf_counter() - t0
    return {
        "arm": arm,
        "wall_s": round(wall, 2),
        "result": [row["groups"], row["rows"], row["paylen"], row["sig"]],
    }


def main() -> None:
    if "--arm" in sys.argv:
        print("ARM_JSON " + json.dumps(run_arm(sys.argv[sys.argv.index("--arm") + 1])))
        return

    prepare()
    # hot-key detection cost, measured once on its own (the isolated
    # arm receives the key list explicitly, as a production job would)
    from gaming_ai_analytics_spark.operators.skew import top_keys

    spark = _spark()
    t0 = time.perf_counter()
    hot = top_keys(spark.read.parquet(FACT), "k", 5).collect()
    detect_s = round(time.perf_counter() - t0, 2)
    print(f"top_keys detection: {detect_s}s -> {[(r.k, r.rows) for r in hot[:2]]}",
          flush=True)

    runs: dict[str, list[float]] = {a: [] for a in ARMS}
    results = set()
    for rnd in range(2):  # interleaved rounds, cold JVM per run
        for arm in ARMS:
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--arm", arm],
                capture_output=True, text=True, cwd=REPO, check=True,
            ).stdout
            rec = json.loads(
                next(ln for ln in out.splitlines() if ln.startswith("ARM_JSON "))
                [len("ARM_JSON "):]
            )
            runs[arm].append(rec["wall_s"])
            results.add(tuple(rec["result"]))
            print(f"round {rnd} {arm}: {rec['wall_s']}s", flush=True)

    assert len(results) == 1, f"arms disagree: {results}"
    print(json.dumps({
        "rows": N_FACT, "hot_share": HOT_SHARE, "n_keys": N_KEYS,
        "detect_s": detect_s,
        "wall_s": {a: runs[a] for a in ARMS},
        "result": list(next(iter(results))),
    }))


if __name__ == "__main__":
    main()
