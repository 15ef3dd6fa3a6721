from __future__ import annotations

import pytest

from gaming_ai_analytics_spark.config import PipelineConfig
from gaming_ai_analytics_spark.constants import Layers
from gaming_ai_analytics_spark.operators.quality import QualityError
from gaming_ai_analytics_spark.plans import pipeline as pl
from gaming_ai_analytics_spark.sources.io import TableStore


@pytest.fixture()
def cfg(tmp_path):
    return PipelineConfig(warehouse_dir=str(tmp_path / "wh"))


def test_full_pipeline(spark, sf_dir, cfg):
    res = pl.run_pipeline(spark, sf_dir, cfg)
    assert set(res.dims_built) == {"dim_nation", "dim_supplier", "dim_part"}
    assert res.fact_rows_appended > 0
    assert res.quality_passed
    assert res.metric_rows > 0


def test_fact_append_idempotent(spark, sf_dir, cfg):
    """reviews_fact.py:150-153 contract: rerun appends zero rows."""
    store = TableStore(spark, cfg.warehouse_dir)
    first = pl.build_fact(spark, store, sf_dir, cfg)
    assert first > 0
    second = pl.build_fact(spark, store, sf_dir, cfg)
    assert second == 0
    assert store.load(Layers.FACT, "reviews").count() == first


def test_fact_batching_drains_backlog(spark, sf_dir, cfg):
    """limit(batch_size) throttle (reviews_fact.py:171-186): repeated
    runs drain the backlog batch by batch, never re-scoring a row."""
    small = PipelineConfig(warehouse_dir=cfg.warehouse_dir, batch_size=150)
    store = TableStore(spark, cfg.warehouse_dir)
    total = 0
    for _ in range(10):
        n = pl.build_fact(spark, store, sf_dir, small)
        assert n <= 150
        total += n
        if n == 0:
            break
    fact = store.load(Layers.FACT, "reviews")
    assert fact.count() == total
    assert fact.select("review_id").distinct().count() == total


def test_dims_skip_if_exists(spark, sf_dir, cfg):
    store = TableStore(spark, cfg.warehouse_dir)
    assert len(pl.build_dims(spark, store, sf_dir)) == 3
    assert pl.build_dims(spark, store, sf_dir) == []  # auxillary_dims.py:60-61


def test_quality_gate_blocks_on_planted_dup(spark, sf_dir, cfg):
    store = TableStore(spark, cfg.warehouse_dir)
    pl.build_fact(spark, store, sf_dir, cfg)
    fact = store.load(Layers.FACT, "reviews")
    store.save(Layers.FACT, "reviews", fact.limit(1), mode="append")  # plant dup
    with pytest.raises(QualityError):
        pl.run_quality(store)


def test_scd2_apply_versions_nulls_and_keeps_history(spark):
    """NULL→value / value→NULL transitions must version (null-safe
    change detection), and pre-existing closed rows pass through."""
    import datetime as dt

    from gaming_ai_analytics_spark.operators.scd import scd2_apply

    d = dt.date
    current = spark.createDataFrame(
        [
            # key 1: one closed + one open version; update flips attr→NULL
            (1, "a", d(2020, 1, 1), d(2021, 1, 1)),
            (1, "b", d(2021, 1, 1), None),
            # key 2: open with NULL attr; update sets a value
            (2, None, d(2020, 1, 1), None),
            # key 3: open, update re-sends identical value → no version
            (3, "z", d(2020, 1, 1), None),
        ],
        "k int, attr string, valid_from date, valid_to date",
    )
    updates = spark.createDataFrame(
        [
            (1, None, d(2024, 6, 1)),
            (2, "now-set", d(2024, 6, 1)),
            (3, "z", d(2024, 6, 1)),
        ],
        "k int, attr string, eff date",
    )
    out = scd2_apply(current, updates, "k", ["attr"], "eff").collect()
    rows = {(r.k, r.attr, r.valid_from, r.valid_to, r.is_current) for r in out}
    assert rows == {
        (1, "a", d(2020, 1, 1), d(2021, 1, 1), False),  # history kept
        (1, "b", d(2021, 1, 1), d(2024, 6, 1), False),  # closed
        (1, None, d(2024, 6, 1), None, True),  # value→NULL versioned
        (2, None, d(2020, 1, 1), d(2024, 6, 1), False),  # NULL→value
        (2, "now-set", d(2024, 6, 1), None, True),
        (3, "z", d(2020, 1, 1), None, True),  # identical resend: no-op
    }


def test_cli_main_runs_pipeline(spark, tmp_path, capsys):
    """python -m gaming_ai_analytics_spark: same DAG, JSON summary,
    exit code keyed on the quality gate."""
    import json

    from gaming_ai_analytics_spark.__main__ import main

    rc = main(
        ["/root/testdata/sf0.001", "--warehouse", str(tmp_path / "wh"),
         "--sequential"]
    )
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rc == 0
    assert out["quality_passed"] is True
    assert out["fact_rows_appended"] > 0
    assert sorted(out["dims_built"]) == [
        "dim_nation", "dim_part", "dim_supplier"
    ]


def test_observe_metrics_ride_the_append_pass(spark, sf_dir, cfg):
    """DataFrame.observe statistics arrive with the batch action —
    no extra profiling job — and agree with a direct recomputation."""
    from pyspark.sql import functions as F

    store = TableStore(spark, cfg.warehouse_dir)
    res = pl.build_fact(spark, store, sf_dir, cfg)
    assert res > 0
    m = res.metrics
    assert m["rows"] == res.appended
    fact = store.load(Layers.FACT, "reviews")
    want = fact.agg(
        F.round(F.avg("weighted_score"), 4).alias("a"),
        F.sum(
            F.when(F.col("sentiment_score") < 0, 1).otherwise(0)
        ).alias("neg"),
    ).first()
    assert abs(m["avg_weighted_score"] - want.a) < 1e-9
    assert m["n_negative"] == want.neg
    # and the pipeline surfaces them
    res2 = pl.run_pipeline(spark, sf_dir, cfg)
    assert isinstance(res2.fact_metrics, dict)


def test_pit_dim_join_exactly_one_version_per_order(spark, sf_dir):
    """The half-open validity intervals tile time with no gap and no
    overlap, so every order matches exactly one dim version and the
    output reconciles to the full orders table."""
    from gaming_ai_analytics_spark.queries_ext import q_pit_dim_join
    from gaming_ai_analytics_spark.sources.star import load_table

    out = q_pit_dim_join(spark, sf_dir).collect()
    n_orders = load_table(spark, sf_dir, "orders").count()
    assert sum(r.n_orders for r in out) == n_orders
    # the planted switch cohort actually splits across versions
    segs = {(r.segment, r.is_current_version) for r in out}
    assert ("NEWSEG", True) in segs
