"""Distributed logistic-regression trainer (operators/classifier.py):
the Spark full-batch gradient loop must reproduce the identical
numpy reference step-for-step, the bounded-state evaluation report
must be exact against hand-computed metrics (including AUC tie
handling), and the registered distillation contract must clear its
floors on the fixtures.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from gaming_ai_analytics_spark.operators.classifier import (
    binary_classification_report,
    logistic_score,
    train_logistic,
)


def _ref_train(X, y, lr, iters, momentum, l2=0.0):
    """The identical heavy-ball full-batch GD in numpy (bias as an
    appended all-ones column, matching weights-then-bias layout)."""
    Xb = np.column_stack([X, np.ones(len(X))])
    w = np.zeros(Xb.shape[1])
    v = np.zeros_like(w)
    reg = np.append(np.full(X.shape[1], l2), 0.0)
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(Xb @ w)))
        g = Xb.T @ (p - y) / len(y)
        v = momentum * v - lr * (g + reg * w)
        w = w + v
    return w


def _toy(spark, n=200, seed=7):
    rng = np.random.default_rng(seed)
    X = rng.uniform(0, 1, size=(n, 3))
    y = (X @ np.array([2.0, -1.5, 0.5]) + 0.1 > 0.55).astype(float)
    rows = [(float(a), float(b), float(c), float(t)) for (a, b, c), t in zip(X, y)]
    df = spark.createDataFrame(rows, "x1 double, x2 double, x3 double, y double")
    return df, X, y


def test_train_logistic_matches_numpy_reference(spark):
    df, X, y = _toy(spark)
    w_spark = train_logistic(
        df, ["x1", "x2", "x3"], "y", lr=2.0, iters=8, momentum=0.9, l2=0.01
    )
    w_ref = _ref_train(X, y, lr=2.0, iters=8, momentum=0.9, l2=0.01)
    assert np.allclose(w_spark, w_ref, atol=1e-9)


def test_logistic_score_matches_reference_probabilities(spark):
    df, X, y = _toy(spark, n=50)
    w = train_logistic(df, ["x1", "x2", "x3"], "y", iters=5)
    got = (
        df.withColumn("p", logistic_score(w, ["x1", "x2", "x3"]))
        .select("x1", "x2", "x3", "p")
        .collect()
    )
    for r in got:
        z = w[0] * r.x1 + w[1] * r.x2 + w[2] * r.x3 + w[3]
        assert abs(r.p - 1.0 / (1.0 + np.exp(-z))) < 1e-12


def test_logistic_score_arity_check():
    with pytest.raises(ValueError, match="3 weights for 3 features"):
        logistic_score([0.1, 0.2, 0.3], ["a", "b", "c"])


def test_train_logistic_empty_frame_raises(spark):
    df = spark.createDataFrame([], "x1 double, y double")
    with pytest.raises(ValueError, match="empty training frame"):
        train_logistic(df, ["x1"], "y")


def test_report_exact_metrics_with_score_ties(spark):
    """Hand-checkable frame with a score tie across classes: positive
    scores .9 .6 .6, negative scores .6 .2 (the .6 group holds two
    positives and one negative). U = sum over positives of
    negs-strictly-below + 0.5 * negs-tied =
    (.9: 2) + (.6: 1 + .5) + (.6: 1 + .5) = 5.0; AUC = 5/(3*2)."""
    rows = [
        (1.0, 0.9),
        (1.0, 0.6),
        (1.0, 0.6),
        (0.0, 0.6),
        (0.0, 0.2),
    ]
    df = spark.createDataFrame(rows, "label double, score double")
    r = binary_classification_report(df, "label", "score").first()
    assert (r.n, r.n_pos) == (5, 3)
    # threshold 0.5: predictions 1,1,1,1,0 vs labels 1,1,1,0,0 -> 4/5
    assert abs(r.accuracy - 0.8) < 1e-12
    assert abs(r.auc - 5.0 / 6.0) < 1e-12


def test_report_single_class_auc_is_null(spark):
    df = spark.createDataFrame(
        [(1.0, 0.8), (1.0, 0.3)], "label double, score double"
    )
    r = binary_classification_report(df, "label", "score").first()
    assert r.auc is None
    assert r.n_pos == 2


def test_quality_classifier_contract_on_fixture(spark, sf_dir):
    from gaming_ai_analytics_spark.queries_traindata import (
        q_quality_classifier_distill,
    )

    row = q_quality_classifier_distill(spark, sf_dir).first()
    assert row.n_train + row.n_eval > 0
    assert row.acc_ok and row.auc_ok


def test_contract_floor_exceeds_majority_base_rate(spark, sf_dir):
    """The 0.85 accuracy floor is only evidence of LEARNING if a
    majority-class predictor would fail it — pin that the holdout
    base rate sits safely below the floor on the fixture, so a
    trainer that collapses to the majority label cannot sneak past
    the contract."""
    from gaming_ai_analytics_spark.functions.text import quality_score
    from gaming_ai_analytics_spark.queries_traindata import split_assign
    from gaming_ai_analytics_spark.sources.star import load_table

    holdout = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull() & (F.length(F.trim("text")) > 0))
        .select(
            (quality_score(F.col("text")) >= 0.65).cast("double").alias("y"),
            split_assign(F.col("doc_id")).alias("split"),
        )
        .filter(F.col("split") != "train")
    )
    pos_rate = holdout.agg(F.avg("y")).first()[0]
    assert max(pos_rate, 1 - pos_rate) < 0.80
