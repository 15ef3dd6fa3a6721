"""End-to-end workflow-DAG timing at scale (r7).

The pipeline (plans/pipeline.py — the reference's workflow.json DAG:
dims ∥ fact → quality gate → metric layer) has stage-level correctness
evidence but no timed run past the test fixture. This drives the WHOLE
job at sf10 (5 M documents) the way the reference runs nightly:

  1. dims build (3 dim tables)
  2. fact build looped until the source drains — each iteration is one
     "nightly" increment: transform → anti-join vs the materialized
     fact → score (Arrow pandas_udf) → observe-metrics → append
  3. one more fact probe that must append 0 rows (the exactly-once
     contract at scale: the anti-join sees all 5 M keys)
  4. quality gate over the full fact (uniqueness / range / not-null)
  5. metric-layer materialization

Usage: python tools/exp_pipeline_e2e.py [sf_dir] [batch_size]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, ".benchdata", "sf10")
BATCH = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000


def main() -> None:
    import gaming_ai_analytics_spark.plans.pipeline as pl
    from gaming_ai_analytics_spark.config import PipelineConfig
    from gaming_ai_analytics_spark.session import get_spark
    from gaming_ai_analytics_spark.sources.io import TableStore

    spark = get_spark("pipeline-e2e")
    wh = tempfile.mkdtemp(prefix="gaa_e2e_wh_")
    cfg = PipelineConfig(warehouse_dir=wh, batch_size=BATCH)
    store = TableStore(spark, cfg.warehouse_dir, cfg.table_format)
    stages: dict[str, float] = {}
    t_all = time.perf_counter()
    try:
        t0 = time.perf_counter()
        dims = pl.build_dims(spark, store, SF)
        stages["dims"] = round(time.perf_counter() - t0, 2)

        batches, total_rows = [], 0
        while True:
            t0 = time.perf_counter()
            res = pl.build_fact(spark, store, SF, cfg)
            wall = round(time.perf_counter() - t0, 2)
            if res.appended == 0:
                stages["fact_zero_probe"] = wall
                break
            batches.append(wall)
            total_rows += res.appended
            print(f"fact batch {len(batches)}: {res.appended:,} rows "
                  f"in {wall}s  {res.metrics}", flush=True)
        stages["fact_batches"] = batches

        t0 = time.perf_counter()
        pl.run_quality(store)
        stages["quality_gate"] = round(time.perf_counter() - t0, 2)

        t0 = time.perf_counter()
        metrics = pl.build_metric_layer(spark, store)
        n_metric = metrics.count()
        stages["metric_layer"] = round(time.perf_counter() - t0, 2)
    finally:
        shutil.rmtree(wh, ignore_errors=True)

    print(json.dumps({
        "sf_dir": SF, "batch_size": BATCH,
        "dims_built": len(dims), "fact_rows": total_rows,
        "metric_rows": n_metric,
        "stages": stages,
        "total_s": round(time.perf_counter() - t_all, 2),
    }))


if __name__ == "__main__":
    main()
