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
