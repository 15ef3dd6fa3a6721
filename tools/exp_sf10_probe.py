"""sf10 scale probe (r7): one decade past the bench's sf1 regime.

Measures a hand-picked set of scale-shaped queries on the derived
.benchdata/sf10 data (100× sf0.1: 60 M lineitem / 10 M events / 5 M
docs / 1 M embeddings) on BOTH engines — Spark cold + one warm run
(fresh lineage), DuckDB one warm run in a per-query SUBPROCESS with a
hard timeout so a super-linear exact plan (the minhash pair join, the
recursive-CTE connected components) records "DNF(timeout)" instead of
stalling the probe.  The point is the SLOPE: sub-quadratic candidate
generation and log-round CC should grow ~linearly sf1 → sf10 while
exact pair plans grow ~quadratically.

Usage: python tools/exp_sf10_probe.py [duck_timeout_s] [query ...]
(query names override the default set — used to extend the probe
table one path at a time without re-paying the whole sweep)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

#: Probe data dir — override with SPARK_GRAFT_PROBE_DIR to reuse the
#: same cold/warm/subprocess-oracle protocol at another decade (the
#: r11 sf1 rows use .benchdata/sf1).
SF10 = os.environ.get(
    "SPARK_GRAFT_PROBE_DIR", os.path.join(REPO, ".benchdata", "sf10")
)

QUERIES = [
    "flagship_star_metrics",
    "agg_percentile",
    "text_analysis_profile",
    "similarity_topk",
    "global_quality_rank",
    "doc_rarity_score",
    "dedup_minhash_lsh",
    # dedup_cluster_assign_star is excluded: at sf10 its n-gram
    # posting self-join spills >45 GB and transiently fills THIS
    # host's single 252 GB disk (a cluster distributes spill across
    # executor disks; the derived fixture's 10× doc replication also
    # inflates near-dup pair counts ~100×, not 10×). See
    # BASELINE.md §3.
]

_DUCK_TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def duck_one(name: str) -> None:
    """Subprocess entry: one cold run of one oracle at sf10."""
    import duckdb

    from gaming_ai_analytics_spark import registry

    sql = registry.oracle_for(name)
    con = duckdb.connect()
    con.execute("SET threads=32")
    for t in _DUCK_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF10}/{t}.parquet'"
        )
    t0 = time.perf_counter()
    con.execute(sql).fetchall()
    print(json.dumps({"t": time.perf_counter() - t0}))


def main() -> None:
    duck_timeout = int(sys.argv[1]) if len(sys.argv) > 1 else 900
    queries = sys.argv[2:] or QUERIES

    from gaming_ai_analytics_spark import registry
    from gaming_ai_analytics_spark.session import get_spark

    # sf10 results can exceed the 1g default result cap (the LSH
    # containment answer is ~50 M directed pairs); the probe's
    # materialization is like-for-like with DuckDB's fetchall, so the
    # cap is raised rather than the sink weakened.  Run this tool
    # with SPARK_GRAFT_DRIVER_MEM=32g.
    spark = get_spark(
        "sf10-probe", extra_conf={"spark.driver.maxResultSize": "8g"}
    )
    qs = registry.queries()

    results: dict[str, dict] = {}
    for name in queries:
        fn = qs[name]
        t0 = time.perf_counter()
        fn(spark, SF10).toPandas()
        cold = time.perf_counter() - t0
        t0 = time.perf_counter()
        fn(spark, SF10).toPandas()
        warm = time.perf_counter() - t0
        results[name] = {"spark_cold": round(cold, 2), "spark": round(warm, 2)}
        print(f"{name}: spark cold {cold:.2f}s warm {warm:.2f}s", flush=True)

    for name in queries:  # DuckDB after all Spark numbers are in
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--duck", name],
                capture_output=True, text=True, timeout=duck_timeout,
            )
            t = json.loads(proc.stdout.strip().splitlines()[-1])["t"]
            results[name]["duckdb"] = round(t, 2)
        except subprocess.TimeoutExpired:
            results[name]["duckdb"] = f"DNF(>{duck_timeout}s)"
        except Exception as ex:  # noqa: BLE001 — record, keep probing
            results[name]["duckdb"] = f"error({type(ex).__name__})"
        print(f"{name}: duckdb {results[name]['duckdb']}", flush=True)

    print(json.dumps({"sf_dir": SF10, "load_end": os.getloadavg()[0],
                      "results": results}))


if __name__ == "__main__":
    if len(sys.argv) == 3 and sys.argv[1] == "--duck":
        duck_one(sys.argv[2])
    else:
        main()
