"""Distributed linear-classifier training with bounded driver state.

The TRAINED quality-filter stage of an LLM data pipeline: public
corpus-curation recipes (CCNet, the GPT-3 / LLaMA data papers) train a
linear classifier against a reference corpus and score every document
with it — the smooth, learned successor to rule gates like the
C4/Gopher thresholds. This module is the Spark-first expression of
that stage: full-batch logistic regression by gradient descent where
the CLUSTER does every per-row flop and the driver holds only the
weight vector.

Scale shape (the reason this formulation and not MLlib-style RDD
aggregation or a Python training loop over collected data):

- featurization is map-only and rides the corpus scan — callers pass a
  compact frame of a few double columns per row, checkpointed once;
- each gradient step is ONE whole-stage-codegen'd scan + a single
  1-row reduce: per-feature partial sums ``sum(err * x_j)`` combine
  map-side, so the shuffle per iteration is |partitions| rows of d+1
  doubles — there is no per-row Python anywhere and no corpus-sized
  shuffle at any point in the loop;
- driver state is the (d+1)-element weight list — bounded and
  independent of corpus size; the only collect sites are the 1-row
  gradient aggregates (one per iteration);
- evaluation (``binary_classification_report``) needs a rank statistic
  (AUC) but never a global sort: scores round to 4 decimals, so the
  per-score contingency has ≤ 10 001 rows and the tie-aware
  Mann-Whitney sum runs as one |scores|-key shuffle plus one window
  over that bounded relation — the same compact-relation-window shape
  as the chi-square marginals (queries_analytics.py).

Full-batch (not SGD) is deliberate: at 100 TB a pass is cheap relative
to shuffles, convergence on the convex logistic objective is
monotonic, and determinism holds up to float summation order — which
the contract query absorbs with coarse metric floors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def train_logistic(
    feats: DataFrame,
    feature_cols: list[str],
    label_col: str,
    lr: float = 6.0,
    iters: int = 15,
    momentum: float = 0.9,
    l2: float = 0.0,
) -> list[float]:
    """Full-batch logistic regression on ``feats``; returns the learned
    weights as ``[w_0..w_{d-1}, bias]``.

    ``feats`` is projected to the needed columns and locally
    checkpointed, so the (possibly expensive) upstream featurization
    runs exactly once — the score-once pattern ``global_quality_rank``
    established. Labels must be 0.0/1.0 doubles. Heavy-ball momentum
    (Polyak) on the convex logistic objective: the defaults reach the
    same holdout metrics as 60 plain steps in 15 (measured on the
    fixture battery at three SFs) — each iteration is a driver
    round-trip, so fewer iterations is directly less wall time at any
    scale. Deterministic up to float summation order (weights start at
    zero, no sampling, no shuffling of the data between iterations).
    """
    cols = list(feature_cols)
    compact = feats.select(
        *[F.col(c).cast("double") for c in cols],
        F.col(label_col).cast("double").alias(label_col),
    ).localCheckpoint()
    n = compact.count()
    if n == 0:
        raise ValueError("train_logistic: empty training frame")
    w = [0.0] * (len(cols) + 1)  # bias last
    v = [0.0] * (len(cols) + 1)
    for _ in range(iters):
        z = F.lit(w[-1])
        for j, c in enumerate(cols):
            z = z + F.lit(w[j]) * F.col(c)
        err = F.lit(1.0) / (F.lit(1.0) + F.exp(-z)) - F.col(label_col)
        g = compact.agg(
            *[F.sum(err * F.col(c)).alias(f"_g{j}") for j, c in enumerate(cols)],
            F.sum(err).alias("_gb"),
        ).first()
        grad = [*(g[f"_g{j}"] / n for j in range(len(cols))), g["_gb"] / n]
        v = [
            momentum * vj - lr * (gj + (l2 * wj if j < len(cols) else 0.0))
            for j, (vj, gj, wj) in enumerate(zip(v, grad, w))
        ]
        w = [wj + vj for wj, vj in zip(w, v)]
    return w


def logistic_score(weights: list[float], feature_cols: list[str]) -> Column:
    """The trained model as a pure codegen'd column: sigmoid of the
    dot product. ``weights`` is ``train_logistic``'s output (bias
    last). Apply to any frame carrying the feature columns — scoring
    100 TB is a map-only pass."""
    cols = list(feature_cols)
    if len(weights) != len(cols) + 1:
        raise ValueError(
            f"logistic_score: {len(weights)} weights for {len(cols)} features"
        )
    z = F.lit(float(weights[-1]))
    for j, c in enumerate(cols):
        z = z + F.lit(float(weights[j])) * F.col(c)
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def binary_classification_report(
    scored: DataFrame, label_col: str, score_col: str,
    score_decimals: int = 4,
) -> DataFrame:
    """One-row frame ``(n, n_pos, accuracy, auc)`` for a scored
    binary-labeled frame, with bounded state.

    Accuracy thresholds the score at 0.5 (exact). AUC is the tie-aware
    Mann-Whitney statistic computed WITHOUT ranking the corpus, exact
    AT ``score_decimals`` score resolution: scores are rounded to that
    many decimals first, so pairs closer than the resolution count as
    ties — relative to the unrounded scores the statistic is
    approximate (ADVICE r7), biased toward 0.5 by at most the tie-mass
    the rounding creates.  Tighten ``score_decimals`` to trade state
    for resolution: the per-score (positives, negatives) contingency
    is ≤ 10^d + 1 rows, and one unpartitioned window over that compact
    relation accumulates the negatives-strictly-below term
    (single-reducer, but over a bounded input — the same shape as the
    chi-square marginal windows). NULL ``auc`` when the frame is
    single-class (no pair to rank)."""
    y = F.col(label_col).cast("double")
    hit = F.when(
        (F.col(score_col) >= 0.5) == (y == 1.0), 1.0
    ).otherwise(0.0)
    per = scored.groupBy(
        F.round(F.col(score_col), score_decimals).alias("_s")
    ).agg(
        F.sum(y).alias("_p"),
        F.sum(F.lit(1.0) - y).alias("_n"),
        F.sum(hit).alias("_ok"),
    )
    w_below = Window.orderBy("_s").rowsBetween(
        Window.unboundedPreceding, -1
    )
    per = per.withColumn(
        "_nb", F.coalesce(F.sum("_n").over(w_below), F.lit(0.0))
    )
    n_pos = F.sum("_p")
    n_neg = F.sum("_n")
    u = F.sum(F.col("_p") * (F.col("_nb") + 0.5 * F.col("_n")))
    return per.agg(
        (n_pos + n_neg).cast("long").alias("n"),
        n_pos.cast("long").alias("n_pos"),
        (F.sum("_ok") / (n_pos + n_neg)).alias("accuracy"),
        F.when(n_pos * n_neg == 0, F.lit(None).cast("double"))
        .otherwise(u / (n_pos * n_neg))
        .alias("auc"),
    )
