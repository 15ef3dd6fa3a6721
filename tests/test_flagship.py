from __future__ import annotations

from gaming_ai_analytics_spark.plans.flagship import flagship_star_metrics


def test_flagship_runs_and_has_rows(spark, sf_dir):
    df = flagship_star_metrics(spark, sf_dir)
    rows = df.collect()
    assert len(rows) >= 1
    cols = set(df.columns)
    assert cols == {
        "r_name",
        "line_count",
        "avg_price",
        "high_discount_pct",
        "low_discount_pct",
        "median_qty",
    }
    total = sum(r.line_count for r in rows)
    assert total > 0
    for r in rows:
        assert 0.0 <= r.high_discount_pct <= 1.0
        assert 0.0 <= r.low_discount_pct <= 1.0


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() >= 1
    qs = e.queries()
    oracles = e.oracle_sql()
    assert "flagship_star_metrics" in qs
    assert set(oracles) <= set(qs)
