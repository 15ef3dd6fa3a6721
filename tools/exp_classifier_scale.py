"""Classifier-training scale experiment (r7): does the full-batch
logistic trainer's per-iteration cost stay scan-bound as the corpus
grows three decades?

Measures, at sf0.1 (5 k docs) / sf1 (50 k) / sf10 (5 M):
  - featurize+localCheckpoint wall time (the once-per-training cost);
  - mean per-iteration gradient-step time over the 15 heavy-ball
    steps (the claim under test: each step is ONE codegen'd scan of
    the compact checkpointed frame + a 1-row reduce, so steps should
    scale ~linearly in rows and stay milliseconds-per-million-rows —
    driver round-trip latency floors the small SFs);
  - holdout scoring + bounded-state AUC report time;
  - the resulting holdout accuracy/AUC (the contract floors must
    hold at every scale, not just the checked SFs).

Usage: python tools/exp_classifier_scale.py [sf ...]   (default all)
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


def main() -> None:
    from pyspark.sql import functions as F

    from gaming_ai_analytics_spark.functions.text import (
        punctuation_ratio,
        quality_score,
        stopword_ratio,
        tokens,
    )
    from gaming_ai_analytics_spark.operators.classifier import (
        binary_classification_report,
        logistic_score,
        train_logistic,
    )
    from gaming_ai_analytics_spark.operators.parallelism import (
        ensure_parallelism,
    )
    from gaming_ai_analytics_spark.queries_traindata import split_assign
    from gaming_ai_analytics_spark.session import get_spark

    wanted = sys.argv[1:] or list(SF_DIRS)
    spark = get_spark("exp_classifier_scale")
    cols = ["f_len", "f_stop", "f_punct", "f_ttr"]

    for sf in wanted:
        sf_dir = SF_DIRS[sf]
        docs = ensure_parallelism(
            spark.read.parquet(f"{sf_dir}/documents.parquet").filter(
                F.col("text").isNotNull()
                & (F.length(F.trim(F.col("text"))) > 0)
            )
        )
        toks = tokens(F.col("text"))
        t0 = time.monotonic()
        feats = docs.select(
            "doc_id",
            F.least(F.length("text") / 400.0, F.lit(1.0)).alias("f_len"),
            F.least(stopword_ratio(F.col("text")) * 5.0, F.lit(1.0)).alias(
                "f_stop"
            ),
            punctuation_ratio(F.col("text")).alias("f_punct"),
            (F.size(F.array_distinct(toks)) / F.size(toks)).alias("f_ttr"),
            (quality_score(F.col("text")) >= 0.65)
            .cast("double")
            .alias("label"),
            split_assign(F.col("doc_id")).alias("split"),
        ).localCheckpoint()
        t_feat = time.monotonic() - t0

        train = feats.filter(F.col("split") == "train")
        t0 = time.monotonic()
        weights = train_logistic(train, cols, "label")
        t_train = time.monotonic() - t0

        t0 = time.monotonic()
        holdout = feats.filter(F.col("split") != "train").withColumn(
            "score", logistic_score(weights, cols)
        )
        rep = binary_classification_report(holdout, "label", "score").first()
        t_eval = time.monotonic() - t0

        n_rows = feats.count()
        print(
            json.dumps(
                {
                    "sf": sf,
                    "n_docs": n_rows,
                    "featurize_s": round(t_feat, 2),
                    "train_total_s": round(t_train, 2),
                    "per_iter_s": round(t_train / 15, 3),
                    "eval_s": round(t_eval, 2),
                    "holdout_acc": round(rep.accuracy, 4),
                    "holdout_auc": round(rep.auc, 4) if rep.auc is not None else None,
                }
            ),
            flush=True,
        )
        feats.unpersist()


if __name__ == "__main__":
    main()
