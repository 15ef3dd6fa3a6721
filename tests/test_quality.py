from __future__ import annotations

import pytest

from gaming_ai_analytics_spark.operators.quality import (
    IsInRange,
    IsUnique,
    NotNull,
    QualityError,
    quality_gate,
    violations,
)


@pytest.fixture()
def df(spark):
    return spark.createDataFrame(
        [(1, 2.0, "a"), (2, 7.0, "b"), (2, 3.0, None)],
        "id long, score double, txt string",
    )


def test_is_unique_flags_dupes(spark, df):
    v = violations(df, [IsUnique(name="u", columns=("id",))])
    assert v.count() == 2  # both rows with id=2


def test_is_in_range(spark, df):
    v = violations(
        df, [IsInRange(name="r", column="score", min_value=-5, max_value=5)]
    )
    rows = v.collect()
    assert len(rows) == 1 and rows[0]["score"] == 7.0


def test_not_null(spark, df):
    v = violations(df, [NotNull(name="n", column="txt")])
    assert v.count() == 1


def test_gate_raises_and_passes(spark, df):
    with pytest.raises(QualityError):
        quality_gate(df, [IsUnique(name="u", columns=("id",))])
    clean = df.filter("id = 1")
    quality_gate(
        clean,
        [
            IsUnique(name="u", columns=("id",)),
            IsInRange(name="r", column="score", min_value=-5, max_value=5),
        ],
    )  # must not raise


def test_warn_rules_do_not_block(spark, df):
    quality_gate(
        df, [IsUnique(name="u", criticality="warn", columns=("id",))]
    )  # warn-level: no raise


def test_warn_rules_reported_in_warnings_column(spark, df):
    """Warn-criticality rules must not vanish: they annotate
    ``_warnings`` and show up in violations(), while ``_errors`` stays
    null so the gate never blocks on them."""
    v = violations(
        df, [IsUnique(name="u", criticality="warn", columns=("id",))]
    ).collect()
    assert v  # duplicate ids reported
    assert all(r["_errors"] is None for r in v)
    assert all(r["_warnings"] and "u:" in r["_warnings"][0] for r in v)


def test_mixed_error_and_warn_rules(spark, df):
    rows = violations(
        df,
        [
            IsInRange(name="r", column="score", min_value=-5, max_value=5),
            IsUnique(name="u", criticality="warn", columns=("id",)),
        ],
    ).collect()
    assert any(r["_errors"] for r in rows) and any(r["_warnings"] for r in rows)
