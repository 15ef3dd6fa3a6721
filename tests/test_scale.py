"""Scale-lever tests: salted skew joins and bucketed co-located joins.

These are the two explicit 100 TB mechanisms that don't show up in
result values, only in plans and key distributions — so the tests
assert (a) result equivalence with the naive formulation and (b) the
plan property that makes the lever worth pulling.
"""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from gaming_ai_analytics_spark.operators.skew import (
    hot_key_isolated_join,
    salted_join,
    top_keys,
)


def _rows(df, cols):
    return sorted(
        (tuple(r) for r in df.select(*cols).collect()),
        key=lambda t: tuple((x is None, x) for x in t),
    )


def test_salted_inner_join_matches_plain(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    cols = ["l_orderkey", "l_quantity", "o_orderpriority"]
    plain = li.join(orders, "l_orderkey", "inner")
    salted = salted_join(li, orders, "l_orderkey", "inner", salt_buckets=4)
    assert _rows(salted, cols) == _rows(plain, cols)


def test_salted_left_join_matches_plain(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber"
    )
    # half the orders missing -> left join must keep unmatched lineitems
    orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter(F.col("o_orderkey") % 2 == 0)
        .select(F.col("o_orderkey").alias("l_orderkey"), "o_totalprice")
    )
    cols = ["l_orderkey", "l_linenumber", "o_totalprice"]
    plain = li.join(orders, "l_orderkey", "left")
    salted = salted_join(li, orders, "l_orderkey", "left", salt_buckets=4)
    assert _rows(salted, cols) == _rows(plain, cols)


def test_salted_join_spreads_hot_key(spark):
    """A key holding 50% of the rows must land in >1 partition of the
    salted shuffle key (the whole point of salting)."""
    hot = spark.range(10_000).select(
        F.when(F.col("id") < 5_000, F.lit(0)).otherwise(F.col("id")).alias("k")
    )
    from gaming_ai_analytics_spark.operators.skew import SALT

    salted = hot.withColumn(SALT, (F.rand(7) * 8).cast("int"))
    n_salts = (
        salted.filter(F.col("k") == 0).select(SALT).distinct().count()
    )
    assert n_salts == 8


def test_hot_isolated_inner_join_matches_plain(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    hot = [r.l_orderkey for r in li.limit(3).collect()]
    cols = ["l_orderkey", "l_quantity", "o_orderpriority"]
    plain = li.join(orders, "l_orderkey", "inner")
    iso = hot_key_isolated_join(li, orders, "l_orderkey", hot_keys=hot)
    assert _rows(iso, cols) == _rows(plain, cols)


def test_hot_isolated_left_join_nulls_and_missing_dim_keys(spark):
    """Left-join equivalence on the awkward inputs: NULL keys must ride
    the cold branch and survive, and a hot key absent from the dim must
    still emit its left rows with NULL payload."""
    left = spark.createDataFrame(
        [(0, "a")] * 50 + [(1, "b"), (2, "c"), (None, "d"), (9, "e")],
        "k int, tag string",
    )
    right = spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "k int, v double"
    )  # hot key 0 intentionally missing
    cols = ["k", "tag", "v"]
    plain = left.join(right, "k", "left")
    iso = hot_key_isolated_join(
        left, right, "k", how="left", hot_keys=[0, 9]
    )
    assert _rows(iso, cols) == _rows(plain, cols)


def test_hot_isolated_join_none_in_explicit_hot_keys(spark):
    """A None inside an explicit hot_keys list (natural when feeding
    top_keys() output straight in on NULL-heavy data) must not poison
    isin(): without the strip, every non-hot comparison is SQL NULL and
    BOTH branch filters drop the row — the join silently loses most of
    its input."""
    left = spark.createDataFrame(
        [(None, "n")] * 10 + [(5, "hot")] * 10 + [(1, "a"), (2, "b")],
        "k int, tag string",
    )
    right = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (5, 50.0)], "k int, v double"
    )
    cols = ["k", "tag", "v"]
    for how in ("inner", "left"):
        plain = left.join(right, "k", how)
        iso = hot_key_isolated_join(
            left, right, "k", how=how, hot_keys=[None, 5]
        )
        assert _rows(iso, cols) == _rows(plain, cols)


def test_hot_isolated_join_auto_detects_and_broadcasts(spark):
    """Auto-detection must pick exactly the dominant key, and the hot
    branch must plan as a BroadcastHashJoin — the no-shuffle side-path
    that is the operator's whole point."""
    left = spark.range(20_000).select(
        F.when(F.col("id") % 2 == 0, 0).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("v"),
    )
    right = spark.range(20_000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("w")
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        iso = hot_key_isolated_join(left, right, "k", min_share=0.2)
        plan = iso._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan  # hot branch, despite -1
        assert (
            _rows(iso, ["k", "v", "w"])
            == _rows(left.join(right, "k"), ["k", "v", "w"])
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_hot_isolated_join_no_hot_keys_falls_back(spark):
    """A uniform key distribution auto-detects nothing and degrades to
    the plain join."""
    left = spark.range(1_000).select(
        F.col("id").alias("k"), F.lit(1).alias("v")
    )
    right = spark.range(1_000).select(
        F.col("id").alias("k"), F.lit(2).alias("w")
    )
    iso = hot_key_isolated_join(left, right, "k", min_share=0.05)
    assert iso.count() == 1_000


def test_top_keys_diagnostic(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    top = top_keys(orders, "o_orderpriority", n=3).collect()
    assert len(top) == 3
    assert top[0]["rows"] >= top[1]["rows"] >= top[2]["rows"]


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    """Two tables bucketed on the join key with equal bucket counts
    must sort-merge join with zero Exchange on either side."""
    from gaming_ai_analytics_spark.sources.io import TableStore

    store = TableStore(spark, str(tmp_path))
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    tag = uuid.uuid4().hex[:8]
    t1 = store.save_bucketed(
        "bkt", f"lineitem_{tag}", li, ["l_orderkey"], num_buckets=4
    )
    t2 = store.save_bucketed(
        "bkt", f"orders_{tag}", orders, ["o_orderkey"], num_buckets=4
    )
    try:
        old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = spark.table(t1).join(
                spark.table(t2),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            plan = joined._jdf.queryExecution().executedPlan().toString()
            assert "Exchange" not in plan, plan
            assert joined.count() > 0
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {t1}")
        spark.sql(f"DROP TABLE IF EXISTS {t2}")


def test_asof_join_directions_and_ties(spark):
    from datetime import datetime

    from gaming_ai_analytics_spark.operators.joins import asof_join

    def ts(s):
        return datetime(2026, 1, 1, 0, 0, s)

    left = spark.createDataFrame(
        [(1, ts(5)), (1, ts(10)), (1, ts(2)), (2, ts(7))], ["k", "ts"]
    )
    right = spark.createDataFrame(
        [(1, ts(5), 50.0), (1, ts(8), 80.0), (2, ts(9), 90.0)],
        ["k", "ts", "v"],
    )
    back = {
        (r.k, r.ts.second): r.v
        for r in asof_join(left, right, ["k"], "ts", ["v"]).collect()
    }
    # tie at ts=5 matches; ts=2 precedes everything -> null; k=2 at 7
    # precedes its only right row -> null
    assert back == {(1, 5): 50.0, (1, 10): 80.0, (1, 2): None, (2, 7): None}

    fwd = {
        (r.k, r.ts.second): r.v
        for r in asof_join(
            left, right, ["k"], "ts", ["v"], direction="forward"
        ).collect()
    }
    assert fwd == {(1, 5): 50.0, (1, 10): None, (1, 2): 50.0, (2, 7): 90.0}


def test_asof_join_null_values_ride_with_matched_row(spark):
    """A genuine NULL in the nearest right row must survive — and all
    value columns must come from that SAME row, never stitched from an
    older one (DuckDB ASOF semantics)."""
    from datetime import datetime

    from gaming_ai_analytics_spark.operators.joins import asof_join

    def ts(s):
        return datetime(2026, 1, 1, 0, 0, s)

    left = spark.createDataFrame([(1, ts(7)), (1, ts(3))], ["k", "ts"])
    right = spark.createDataFrame(
        [(1, ts(1), 10.0, "a"), (1, ts(5), None, "b")],
        ["k", "ts", "v", "w"],
    )
    got = {
        (r.k, r.ts.second): (r.v, r.w)
        for r in asof_join(left, right, ["k"], "ts", ["v", "w"]).collect()
    }
    # ts=7 matches the ts=5 row: v is genuinely NULL there and must NOT
    # be backfilled from the ts=1 row; w comes from the same matched row
    assert got == {(1, 7): (None, "b"), (1, 3): (10.0, "a")}


def test_range_join_boundaries(spark):
    from datetime import datetime

    from gaming_ai_analytics_spark.operators.joins import range_join

    def ts(m, s=0):
        return datetime(2026, 1, 1, 0, m, s)

    left = spark.createDataFrame(
        [(1, ts(0)), (1, ts(29, 59)), (1, ts(30)), (2, ts(10))],
        ["k", "ts"],
    )
    right = spark.createDataFrame(
        [(1, ts(0), ts(30)), (2, ts(20), ts(40))], ["k", "s", "e"]
    )
    got = {
        (r.k, r.ts.minute, r.ts.second)
        for r in range_join(left, right, ["k"], "ts", "s", "e").collect()
    }
    # start inclusive, end exclusive; k=2 click at minute 10 outside
    assert got == {(1, 0, 0), (1, 29, 59)}


def test_runtime_bloom_filter_prunes_fact_join(spark, sf_dir):
    """Spark's runtime Bloom-filter injection (the row-level runtime
    filter that makes selective fact⋈fact joins scan-cheap at 100 TB):
    with a selective creation side and a sort-merge join, the probe
    side's scan must gain a ``might_contain`` filter fed by a
    ``bloom_filter_agg`` subquery. Default thresholds only fire at
    real scale (creation ≤ 10 MB buildable, application ≥ 10 GB scan)
    — tuned down here to prove the wiring on bench data."""
    from pyspark.sql import functions as F

    from gaming_ai_analytics_spark.sources.star import load_table

    li = load_table(spark, sf_dir, "lineitem")
    # tune the EXECUTION session — load_table may have picked the
    # static-plan child, and runtime-filter confs are per-session
    exec_spark = li.sparkSession
    saved = {
        k: exec_spark.conf.get(k)
        for k in (
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        exec_spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "64KB",
        )
        exec_spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        orders = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        j = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .groupBy("o_orderpriority")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "might_contain" in plan
        assert "bloom_filter_agg" in plan
    finally:
        for k, v in saved.items():
            exec_spark.conf.set(k, v)


def test_dynamic_partition_pruning_on_partitioned_fact(spark, tmp_path):
    """Dynamic partition pruning — the partition-layout twin of the
    Bloom-filter row filter: a selective dim predicate turns into a
    runtime PartitionFilter on the fact scan, so only matching
    partitions are read (at 100 TB this is the difference between
    scanning one day and scanning the table)."""
    from pyspark.sql import functions as F

    from gaming_ai_analytics_spark.sources.star import load_events

    ev = load_events(spark, "/root/testdata/sf0.001").withColumn(
        "day", F.to_date("ts")
    )
    ev.write.partitionBy("day").parquet(str(tmp_path / "ev"))
    ev.select("day").distinct().withColumn(
        "tag", F.dayofweek("day")
    ).write.parquet(str(tmp_path / "days"))
    fact = spark.read.parquet(str(tmp_path / "ev"))
    days = spark.read.parquet(str(tmp_path / "days")).filter(
        F.col("tag") == 2
    )
    j = fact.join(days, "day").groupBy("day").agg(
        F.count(F.lit(1)).alias("n")
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower()
    # and the result is correct under the pruned scan
    want_days = {r.day for r in days.select("day").collect()}
    got = {r.day: r.n for r in j.collect()}
    assert set(got) == want_days


def test_aqe_skew_join_splits_hot_partition(spark):
    """AQE's runtime skew-join split — the automatic complement to
    the explicit salted join (operators/skew.py): a hot key whose
    shuffle partition dwarfs the median is split into parallel
    sub-reads at runtime, visible as SortMergeJoin(skew=true) over an
    'AQEShuffleRead ... skewed' in the final adaptive plan.
    Thresholds are tuned down to fire at test volume (defaults are
    sized for real partitions); the payload is xxhash64 so shuffle
    compression can't shrink the hot partition below the threshold."""
    from pyspark.sql import functions as F

    keys = (
        "spark.sql.autoBroadcastJoinThreshold",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
    )
    saved = {k: spark.conf.get(k) for k in keys}
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2"
        )
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "64KB",
        )
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB"
        )
        left = spark.range(0, 300000).select(
            F.when(F.col("id") % 10 < 9, 0)
            .otherwise(F.col("id"))
            .alias("k"),
            F.xxhash64("id").alias("v"),
        )
        right = spark.range(0, 1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        j = left.join(right, "k").agg(
            F.avg("v").alias("s"), F.count(F.lit(1)).alias("n")
        )
        row = j.collect()[0]
        # every left row has a match (hot key 0 and ids ≥ 1000 drop? no:
        # right covers 0..999; left keys are 0 or id≥... keys are 0 or
        # original id — only ids < 1000 with id%10==9 survive besides 0)
        assert row.n > 0
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan
        assert "skewed" in plan
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_duplicate_ngram_spans_observed_guard(spark, sf_dir):
    """VERDICT r11 ask #3: the spans probe twin must (a) agree
    value-for-value with the registered gram-window query and (b)
    report the skew precondition via metrics that rode the job itself
    (DataFrame.observe) — with the guard green on the fixture and the
    metrics load-bearing (planted dup spans → max_df >= 2)."""
    from gaming_ai_analytics_spark.queries_llm import (
        duplicate_ngram_spans_observed,
        q_duplicate_ngram_spans,
    )

    result, check = duplicate_ngram_spans_observed(spark, sf_dir)
    observed = _rows(result, ["doc_id", "n_spans", "n_dup_spans"])
    metrics = check()
    assert observed == _rows(
        q_duplicate_ngram_spans(spark, sf_dir),
        ["doc_id", "n_spans", "n_dup_spans"],
    )
    assert metrics["n_docs"] > 0
    assert metrics["max_df"] >= 2, metrics  # fixture plants dup spans
    assert metrics["max_df_share"] <= 0.05, metrics


def test_duplicate_ngram_spans_observed_guard_trips_on_boilerplate(
    spark, tmp_path
):
    """The guard must RAISE (naming the join-back remedy) on a corpus
    where one boilerplate 8-gram covers more than 5% of documents —
    the regression the window form cannot AQE-split at scale."""
    import pytest

    from gaming_ai_analytics_spark.queries_llm import (
        duplicate_ngram_spans_observed,
    )

    boiler = "this content is provided as is without any warranty"
    rows = [
        (i, f"{boiler} unique tail {i} alpha beta gamma delta",
         "en", "srcX", 60)
        for i in range(40)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).write.parquet(f"{tmp_path}/documents.parquet")

    result, check = duplicate_ngram_spans_observed(spark, str(tmp_path))
    result.count()
    with pytest.raises(ValueError, match="join-back"):
        check()
