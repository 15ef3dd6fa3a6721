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


def test_dq_completeness_profile_counts_planted_gaps(spark):
    from gaming_ai_analytics_spark.queries_ext import q_dq_completeness_profile
    from gaming_ai_analytics_spark.sources import star

    rows = [
        (1, "hello world", "en", "s", 11),
        (2, None, "en", None, 0),       # null text, null source
        (3, "   ", None, "s", 3),       # blank text, null lang
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
        "n_chars long"
    )
    key = (spark.sparkContext.applicationId, "_mem", "documents")
    star._TABLE_CACHE[key] = df
    try:
        out = {r.column_name: (r.n_missing, r.pct_missing)
               for r in q_dq_completeness_profile(spark, "_mem").collect()}
    finally:
        del star._TABLE_CACHE[key]
    assert out["text"] == (1, round(1 / 3, 6))
    assert out["text_blank"] == (1, round(1 / 3, 6))
    assert out["lang"] == (1, round(1 / 3, 6))
    assert out["source"] == (1, round(1 / 3, 6))
    assert out["n_chars"] == (0, 0.0)


def test_quantile_profile_monotone(spark, sf_dir):
    from gaming_ai_analytics_spark.queries_ext import q_quantile_profile

    for r in q_quantile_profile(spark, sf_dir).collect():
        assert r.p10 <= r.p50 <= r.p90 <= r.p99


def test_skew_top_keys_ranks_planted_hot_key(spark):
    import datetime as dt

    from gaming_ai_analytics_spark.queries_ext import q_skew_top_keys
    from gaming_ai_analytics_spark.sources import star

    t0 = dt.datetime(2024, 1, 1)
    rows = [(i, t0, 99, "a", 1.0, "{}") for i in range(50)]  # hot user 99
    rows += [(50 + u, t0, u, "a", 1.0, "{}") for u in range(10)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    key = (spark.sparkContext.applicationId, "_mem", "events")
    star._TABLE_CACHE[key] = df
    try:
        out = q_skew_top_keys(spark, "_mem").collect()
    finally:
        del star._TABLE_CACHE[key]
    assert out[0].user_id == 99 and out[0].rows == 50
    assert abs(out[0].share - round(50 / 60, 6)) < 1e-9
    assert len(out) == 10


def test_dq_referential_orphans_null_fk_cross_engine(spark, tmp_path):
    """ADVICE r8: the oracle's previous NOT IN form returned ZERO rows
    for a whole check whenever the referenced subquery contained a
    NULL — disagreeing with Spark's left_anti exactly on dirty data.
    Pin both engines on a fixture with (a) a NULL FK on the probe
    side, (b) a NULL key on the build side, and (c) genuine orphans:
    the NOT EXISTS oracle and the anti-join must agree that NULL FKs
    count as orphans."""
    import duckdb

    from gaming_ai_analytics_spark import registry
    from gaming_ai_analytics_spark.queries_ext import (
        q_dq_referential_orphans,
    )

    (
        spark.createDataFrame(
            # one valid child, one orphan (order 404), one NULL FK
            [(1, 10), (2, 404), (3, None)],
            "l_linenumber long, l_orderkey long",
        ).write.parquet(f"{tmp_path}/lineitem.parquet")
    )
    (
        spark.createDataFrame(
            # order 10 valid; order 20 childless + orphan custkey;
            # order 30 childless + NULL custkey; NULL orderkey row
            [(10, 100), (20, 999), (30, None), (None, 100)],
            "o_orderkey long, o_custkey long",
        ).write.parquet(f"{tmp_path}/orders.parquet")
    )
    (
        spark.createDataFrame(
            [(100,), (None,)], "c_custkey long"
        ).write.parquet(f"{tmp_path}/customer.parquet")
    )

    got = {
        r.check: r.n_violations
        for r in q_dq_referential_orphans(spark, str(tmp_path)).collect()
    }
    # NULL l_orderkey and NULL o_custkey are orphans (never match);
    # the NULL o_orderkey order matches no lineitem
    assert got == {
        "lineitem_without_order": 2,       # 404 + NULL
        "order_without_customer": 2,       # 999 + NULL
        "order_without_lineitems": 3,      # 20, 30, NULL
    }

    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer"):
        con.execute(  # Spark writes a directory per table
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM '{tmp_path}/{t}.parquet/*.parquet'"
        )
    oracle = {
        check: n
        for check, n in con.execute(
            registry.oracle_for("dq_referential_orphans")
        ).fetchall()
    }
    assert oracle == got


def test_dq_referential_orphans_empty_tables_report_zero(spark, tmp_path):
    """r9 review finding: SUM(CASE) over an empty full-outer join is
    NULL where count(*) was 0 — and empty loads are exactly where a
    DQ gate runs.  All three checks must report 0 (not NULL) on
    empty tables, agreeing with the oracle's COUNT(*)."""
    import duckdb

    from gaming_ai_analytics_spark import registry
    from gaming_ai_analytics_spark.queries_ext import (
        q_dq_referential_orphans,
    )

    spark.createDataFrame([], "l_linenumber long, l_orderkey long").write.parquet(
        f"{tmp_path}/lineitem.parquet"
    )
    spark.createDataFrame([], "o_orderkey long, o_custkey long").write.parquet(
        f"{tmp_path}/orders.parquet"
    )
    spark.createDataFrame([], "c_custkey long").write.parquet(
        f"{tmp_path}/customer.parquet"
    )
    got = {
        r.check: r.n_violations
        for r in q_dq_referential_orphans(spark, str(tmp_path)).collect()
    }
    assert got == {
        "lineitem_without_order": 0,
        "order_without_customer": 0,
        "order_without_lineitems": 0,
    }
    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer"):
        con.execute(
            f"CREATE VIEW {t} AS "
            f"SELECT * FROM '{tmp_path}/{t}.parquet/*.parquet'"
        )
    oracle = dict(
        con.execute(registry.oracle_for("dq_referential_orphans")).fetchall()
    )
    assert oracle == got
