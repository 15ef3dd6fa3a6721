"""CLI entry point: run the full pipeline DAG from a shell.

The reference's "main()" is a scheduled Databricks job
(src/job/workflow.json); the OSS equivalent is

    python -m gaming_ai_analytics_spark [sf_dir] [--warehouse DIR]
                                        [--sequential]

which executes the same dims ∥ fact → quality → metrics ordering via
``plans.pipeline.run_pipeline`` and prints a one-line JSON summary
(the cron-log contract: machine-parseable, one record per run).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    from gaming_ai_analytics_spark.config import PipelineConfig
    from gaming_ai_analytics_spark.plans.pipeline import run_pipeline
    from gaming_ai_analytics_spark.session import get_spark

    ap = argparse.ArgumentParser(prog="gaming_ai_analytics_spark")
    ap.add_argument("sf_dir", nargs="?", default="/root/testdata/sf0.001")
    ap.add_argument("--warehouse", default=None)
    ap.add_argument(
        "--sequential",
        action="store_true",
        help="submit dims and fact sequentially instead of from two driver threads",
    )
    args = ap.parse_args(argv)

    cfg = PipelineConfig()
    if args.warehouse:
        cfg.warehouse_dir = args.warehouse
    spark = get_spark("gaa_pipeline")
    res = run_pipeline(
        spark, args.sf_dir, cfg, concurrent=not args.sequential
    )
    print(
        json.dumps(
            {
                "dims_built": res.dims_built,
                "fact_rows_appended": res.fact_rows_appended,
                "quality_passed": res.quality_passed,
                "metric_rows": res.metric_rows,
                # observe()-collected run stats — same pass as the
                # append, no extra profiling job
                "fact_metrics": res.fact_metrics,
            }
        )
    )
    return 0 if res.quality_passed else 1


if __name__ == "__main__":
    sys.exit(main())
