from __future__ import annotations

import pytest

from gaming_ai_analytics_spark.sources.star import load_events
from gaming_ai_analytics_spark.streaming.events import (
    session_windows,
    streaming_tumbling_hourly,
    tumbling_hourly,
)

SF = "/root/testdata/sf0.001"


def test_streaming_matches_batch(spark):
    """readStream → watermark → window → memory sink produces exactly
    the batch result over the bounded fixture."""
    batch = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in tumbling_hourly(load_events(spark, SF)).collect()
    }
    stream = {
        (r.window_start, r.event_type): (r.n_events, r.total_value)
        for r in streaming_tumbling_hourly(spark, SF).collect()
    }
    assert batch == stream
    assert batch  # non-trivial


def test_session_windows_partition_events(spark):
    ev = load_events(spark, SF)
    sessions = session_windows(ev, gap="10 minutes")
    total = sessions.groupBy().sum("n_events").collect()[0][0]
    assert total == ev.count()  # every event in exactly one session


def test_session_window_exact_gap_boundary(spark):
    """Two events EXACTLY gap apart merge into one session: Spark
    session windows span [ts, ts+gap) and merge adjacent windows, so
    the SQL oracle's new-session predicate must be strict > (gap
    exactly equal ⇒ same session). Pins the boundary semantics the
    registered oracle relies on."""
    from datetime import datetime

    ev = spark.createDataFrame(
        [
            (1, datetime(2026, 1, 1, 0, 0, 0), "c", 0.0),
            (1, datetime(2026, 1, 1, 0, 10, 0), "c", 0.0),
            (1, datetime(2026, 1, 1, 0, 20, 1), "c", 0.0),
        ],
        ["user_id", "ts", "event_type", "value"],
    )
    got = {
        (r.user_id, r.session_start.minute): r.n_events
        for r in session_windows(ev, gap="10 minutes").collect()
    }
    # 0 and 10 merge (adjacent); 20:01 is >10min past 10:00 → new session
    assert got == {(1, 0): 2, (1, 20): 1}


def test_stateful_user_totals_matches_batch(spark):
    """applyInPandasWithState running totals equal the batch groupBy
    over the bounded fixture (monotone-final-emit extraction)."""
    from pyspark.sql import functions as F

    import __spark_entry__ as e

    got = {
        r.user_id: (r.n_events, r.total_value)
        for r in e.queries()["events_streaming_stateful_totals"](
            spark, SF
        ).collect()
    }
    want = {
        r.user_id: (r.n_events, r.total_value)
        for r in load_events(spark, SF)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .collect()
    }
    assert got == want
    assert got


def test_stream_append_idempotent_rerun_appends_nothing(spark, tmp_path):
    """foreachBatch sink: first bounded run lands every event once;
    a full re-run (fresh checkpoint — the worst case) appends 0 rows
    because idempotence rides on the key anti-join, not the
    checkpoint."""
    from gaming_ai_analytics_spark.sources.io import TableStore
    from gaming_ai_analytics_spark.streaming.events import (
        stream_append_idempotent,
        stream_events,
    )

    sf = "/root/testdata/sf0.001"
    store = TableStore(spark, str(tmp_path / "wh"))
    n_events = spark.read.parquet(f"{sf}/events.parquet").count()

    for run in range(2):
        stream_append_idempotent(
            stream_events(spark, sf).select("event_id", "user_id", "value"),
            store,
            "silver",
            "events_landed",
            "event_id",
            checkpoint_dir=str(tmp_path / f"ckpt{run}"),  # fresh each run
        )
        landed = store.load("silver", "events_landed")
        assert landed.count() == n_events, f"run {run}"
        assert landed.select("event_id").distinct().count() == n_events


def test_stream_append_idempotent_dedupes_within_batch(spark, tmp_path):
    """Duplicate keys arriving in the SAME micro-batch must land once:
    the table-side anti-join can't see them (nothing landed yet), so
    the sink dedupes each batch before appending."""
    from gaming_ai_analytics_spark.sources.io import TableStore
    from gaming_ai_analytics_spark.streaming.events import (
        stream_append_idempotent,
    )

    src = spark.createDataFrame(
        [(1, "a"), (1, "a_dup"), (2, "b"), (2, "b_dup"), (3, "c")],
        ["k", "payload"],
    )
    src_dir = str(tmp_path / "src")
    src.coalesce(1).write.parquet(src_dir)

    stream = spark.readStream.schema(src.schema).parquet(src_dir)
    store = TableStore(spark, str(tmp_path / "wh"))
    stream_append_idempotent(
        stream, store, "silver", "dupes", "k",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    landed = store.load("silver", "dupes")
    assert landed.count() == 3
    assert landed.select("k").distinct().count() == 3


def test_view_to_purchase_pairs_interval_bounds(spark):
    import datetime as dt

    def ts(minute):
        return dt.datetime(2024, 1, 1, 12, minute)

    rows = [
        (1, 10, "view", ts(0)),
        (1, 20, "purchase", ts(0)),   # same instant: included (>=)
        (1, 21, "purchase", ts(30)),  # boundary: included (<=)
        (1, 22, "purchase", ts(31)),  # past horizon: excluded
        (2, 23, "purchase", ts(5)),   # other user: excluded
    ]
    ev = spark.createDataFrame(rows, ["user_id", "event_id", "event_type", "ts"])
    from gaming_ai_analytics_spark.streaming.events import view_to_purchase_pairs

    got = {
        (r.view_id, r.purchase_id)
        for r in view_to_purchase_pairs(
            ev.where("event_type = 'view'"),
            ev.where("event_type = 'purchase'"),
            horizon="30 minutes",
        ).collect()
    }
    assert got == {(10, 20), (10, 21)}


def test_streaming_dedupe_matches_batch_distinct(spark):
    from gaming_ai_analytics_spark.registry import queries

    sf = "/root/testdata/sf0.001"
    got = queries()["events_streaming_dedupe"](spark, sf)
    expect = (
        spark.read.parquet(f"{sf}/events.parquet")
        .select("user_id", "event_type")
        .distinct()
    )
    assert got.count() == expect.count()
    assert got.exceptAll(expect).count() == 0


def test_watermark_drops_late_events_in_append_mode(spark, tmp_path):
    """The watermark contract that bounds state at scale: an event
    arriving after the watermark passed its window is DROPPED from the
    aggregate (append mode), not retro-merged. Two explicit
    micro-batches: batch 1 advances the watermark past the first
    window and finalizes it; batch 2's late event targets that closed
    window and must not resurrect it."""
    import datetime as dt

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")

    def write_batch(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def t(minute):
        return dt.datetime(2024, 1, 1, 12, minute)

    # batch 1: two events in [12:00, 12:10) + one at 12:30 that pushes
    # the watermark (10 min lateness) to 12:20 — past the first window
    write_batch("b1", [(1, t(0)), (2, t(5)), (3, t(30))])

    agg = (
        spark.readStream.schema(schema)
        .parquet(src)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "10 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("start"), "n")
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_drop_t")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()  # batch 1 → watermark 12:20, window closed

        # batch 2: LATE event for the closed [12:00, 12:10) window
        write_batch("b2", [(4, t(5))])
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        r.start.minute: r.n for r in spark.table("late_drop_t").collect()
    }
    # the finalized first window counts 2 — the late event_id=4 was
    # dropped, never re-emitted or merged
    assert got.get(0) == 2, got


def test_transform_with_state_plan_construction(spark, sf_dir):
    """transformWithStateInPandas surface: plan + output schema build
    without execution (execution needs protobuf — absent here)."""
    from gaming_ai_analytics_spark.sources.star import load_events
    from gaming_ai_analytics_spark.streaming.events import (
        stateful_user_totals_tws,
    )

    out = stateful_user_totals_tws(load_events(spark, sf_dir))
    assert [f.name for f in out.schema.fields] == [
        "user_id",
        "n_events",
        "total_value",
    ]


def test_transform_with_state_matches_batch(spark, sf_dir):
    """Full execution parity vs the batch aggregate — runs only where
    protobuf is installed (production images; not this container)."""
    pytest.importorskip("google.protobuf")
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from gaming_ai_analytics_spark.sources.star import load_events
    from gaming_ai_analytics_spark.streaming.events import (
        run_stream_to_memory,
        stateful_user_totals_tws,
        stream_events,
    )

    out = run_stream_to_memory(
        stateful_user_totals_tws(stream_events(spark, sf_dir)),
        spark,
        output_mode="update",
    )
    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    final = {
        (r.user_id, r.n_events, r.total_value)
        for r in out.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("user_id", "n_events", "total_value")
        .collect()
    }
    batch = {
        (r.user_id, r.n_events, r.total_value)
        for r in load_events(spark, sf_dir)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .collect()
    }
    assert final == batch


def test_stream_matview_upsert_equals_batch_aggregate(spark, tmp_path):
    """The streaming materialized view (update-mode agg → keyed upsert
    per micro-batch) must converge to exactly the batch aggregate of
    the same input, and a full replay from a fresh checkpoint must
    leave the serving table unchanged (idempotent merge)."""
    from pyspark.sql import functions as F

    from gaming_ai_analytics_spark.sources.io import TableStore
    from gaming_ai_analytics_spark.streaming.events import (
        stream_events,
        stream_matview_upsert,
    )

    sf_dir = "/root/testdata/sf0.001"

    def totals(df):
        return (
            df.withWatermark("ts", "1 hour")
            .groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum("value"), 2).alias("total_value"),
            )
        )

    store = TableStore(spark, str(tmp_path / "wh"))
    stream_matview_upsert(
        totals(stream_events(spark, sf_dir)),
        store,
        "serve",
        "user_totals",
        ["user_id"],
        checkpoint_dir=str(tmp_path / "ck1"),
    )
    got = {
        r.user_id: (r.n_events, r.total_value)
        for r in store.load("serve", "user_totals").collect()
    }
    want = {
        r.user_id: (r.n_events, r.total_value)
        for r in totals(load_events(spark, sf_dir)).collect()
    }
    assert got == want
    # replay with a FRESH checkpoint: upserts converge, nothing drifts
    stream_matview_upsert(
        totals(stream_events(spark, sf_dir)),
        store,
        "serve",
        "user_totals",
        ["user_id"],
        checkpoint_dir=str(tmp_path / "ck2"),
    )
    again = {
        r.user_id: (r.n_events, r.total_value)
        for r in store.load("serve", "user_totals").collect()
    }
    assert again == want


def test_stream_matview_upsert_partition_pruned_equals_batch(
    spark, tmp_path
):
    """The partitioned serving-table variant (day-keyed daily rollup,
    partition-pruned MERGE per micro-batch) must converge to the same
    batch aggregate as ever — correctness of VERDICT r11 ask #5's
    lever before its throughput A/B."""
    from pyspark.sql import functions as F

    from gaming_ai_analytics_spark.sources.io import TableStore
    from gaming_ai_analytics_spark.streaming.events import (
        stream_events,
        stream_matview_upsert,
    )

    sf_dir = "/root/testdata/sf0.001"

    def daily(df):
        return (
            df.withWatermark("ts", "1 hour")
            .groupBy(
                F.date_format(F.date_trunc("day", "ts"), "yyyy-MM-dd")
                .alias("day"),
                "user_id",
            )
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum("value"), 2).alias("total_value"),
            )
        )

    store = TableStore(spark, str(tmp_path / "wh"))
    stream_matview_upsert(
        daily(stream_events(spark, sf_dir)),
        store,
        "serve",
        "daily_totals",
        ["day", "user_id"],
        checkpoint_dir=str(tmp_path / "ck"),
        partition_by=["day"],
    )
    # partition values are type-inferred on read ('2024-01-01' -> date);
    # normalize both sides to str for the comparison
    got = {
        (str(r.day), r.user_id): (r.n_events, r.total_value)
        for r in store.load("serve", "daily_totals").collect()
    }
    want = {
        (str(r.day), r.user_id): (r.n_events, r.total_value)
        for r in daily(load_events(spark, sf_dir)).collect()
    }
    assert got == want


def test_python_stream_source_drains_all_offsets(spark):
    """The streaming Python DataSource must pull EVERY micro-batch
    (regression: availableNow silently reads one batch on sources
    that don't implement it) and agree with the batch twin."""
    from pyspark.sql import functions as F

    from gaming_ai_analytics_spark.queries_stream import (
        q_python_datasource_stream,
    )
    from gaming_ai_analytics_spark.sources.pyds import (
        register_python_datasource,
    )

    got = {
        r.event_type: (r.n_events, r.total_value)
        for r in q_python_datasource_stream(spark, "unused").collect()
    }
    register_python_datasource(spark)
    batch = (
        spark.read.format("synthetic_events")
        .option("n", 10000)
        .load()
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )
    want = {r.event_type: (r.n_events, r.total_value) for r in batch.collect()}
    assert got == want
    assert sum(n for n, _ in got.values()) == 10000


def test_stream_resume_from_checkpoint_restores_agg_state(spark, tmp_path):
    """Crash-recovery contract of every stateful stream here: stop a
    running aggregation, append new source data, restart a NEW query
    from the SAME checkpoint — the restored state must (a) carry the
    pre-crash counts forward and (b) not replay committed batches.

    Asserted via update mode: the resumed sink receives ONLY the keys
    touched after the restart, and their values are cumulative across
    the restart boundary."""
    import pyspark.sql.functions as F

    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")

    def write(rows):
        spark.createDataFrame(rows, "user_id int, value double").coalesce(
            1
        ).write.mode("append").parquet(src)

    def start(rows_out):
        # the memory sink refuses checkpoint recovery; foreachBatch is
        # the recovery-capable sink (and the production pattern)
        agg = (
            spark.readStream.schema("user_id int, value double")
            .parquet(src)
            .groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.sum("value"), 2).alias("total"),
            )
        )
        return (
            agg.writeStream.outputMode("update")
            .foreachBatch(lambda df, _id: rows_out.extend(df.collect()))
            .option("checkpointLocation", ckpt)
            .start()
        )

    write([(1, 10.0), (1, 5.0), (2, 7.0)])
    q = start([])
    try:
        q.processAllAvailable()
    finally:
        q.stop()  # simulated crash / planned restart

    write([(1, 2.0)])  # arrives while the stream is down
    after = []
    q = start(after)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    resumed = {r.user_id: (r.n, r.total) for r in after}
    # state restored: user 1 counts BOTH pre-crash events plus the new
    # one; batch 1 not replayed: user 2 emits nothing after restart
    assert resumed == {1: (3, 17.0)}


def test_stream_resume_restores_custom_group_state(spark, tmp_path):
    """The same recovery contract for the applyInPandasWithState path:
    explicit GroupState survives a stop/restart from one checkpoint,
    and only post-restart keys re-emit."""
    from gaming_ai_analytics_spark.streaming.events import (
        stateful_user_totals,
    )

    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    schema = "user_id int, value double"

    def write(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def start(rows_out):
        ev = spark.readStream.schema(schema).parquet(src)
        return (
            stateful_user_totals(ev)
            .writeStream.outputMode("update")
            .foreachBatch(lambda df, _id: rows_out.extend(df.collect()))
            .option("checkpointLocation", ckpt)
            .start()
        )

    write([(1, 10.0), (1, 5.0), (2, 7.0)])
    q = start([])
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    write([(1, 2.0)])
    after = []
    q = start(after)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    resumed = {r.user_id: (r.n_events, r.total_value) for r in after}
    assert resumed == {1: (3, 17.0)}


def test_stream_dedup_against_growing_index(spark, tmp_path):
    """Streaming ingestion dedup (operators/dedup.py stream_dedup_sink):
    each micro-batch drops in-batch near-dup losers and docs matching
    the persisted LSH index, appends survivors, and GROWS the index —
    so a later batch's near-dup of an earlier batch's survivor is
    caught even though neither was in the original corpus. Driven as
    two sequential availableNow runs on one checkpoint (also proving
    the sink composes with restart)."""
    import uuid

    from gaming_ai_analytics_spark.operators.dedup import (
        save_minhash_index,
        stream_dedup_sink,
    )
    from gaming_ai_analytics_spark.sources.io import TableStore

    def text(prefix, n=20, swap=None):
        words = [f"{prefix}{i:02d}" for i in range(n)]
        if swap is not None:
            words[swap] = f"x{swap:02d}"
        return " ".join(words)

    store = TableStore(spark, str(tmp_path / "wh"))
    name = f"stream_{uuid.uuid4().hex[:8]}"
    corpus = spark.createDataFrame(
        [(1, text("c"))], "doc_id int, text string"
    )
    t_bands, t_sh = save_minhash_index(
        store, "idx", name, corpus, "doc_id", "text", num_buckets=4
    )
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    sink = stream_dedup_sink(
        store, "idx", name, "clean", "docs", "doc_id", "text"
    )

    def run_available():
        q = (
            spark.readStream.schema("doc_id int, text string")
            .parquet(src)
            .writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    def write(rows):
        spark.createDataFrame(rows, "doc_id int, text string").coalesce(
            1
        ).write.mode("append").parquet(src)

    try:
        # batch 1: A, A'~A (in-batch dup), C1~corpus C (cross dup)
        write([(10, text("a")), (11, text("a", swap=5)), (12, text("c", swap=10))])
        run_available()
        # batch 2: A''~A (dup of batch 1's SURVIVOR via the grown
        # index — A was never in the original corpus), B unique
        write([(20, text("a", swap=15)), (21, text("b"))])
        run_available()

        survivors = {r.doc_id for r in store.load("clean", "docs").collect()}
        assert survivors == {10, 21}
    finally:
        for t in (t_bands, t_sh):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_stream_dedup_sink_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is AT-LEAST-ONCE: the engine replays a batch whose
    appends landed but whose checkpoint commit did not. The sink's
    commit LEDGER lands before any data, so (a) a replay after a
    crash BETWEEN appends (marker + clean landed, index did not)
    takes the guard path and back-fills exactly the missing index
    entries without duplicating clean rows, (b) a replay of a
    fully-committed batch changes nothing anywhere, and (c) a fresh
    batch id takes the fast path and still lands exactly once."""
    import uuid

    from gaming_ai_analytics_spark.operators.dedup import (
        save_minhash_index,
        stream_dedup_sink,
    )
    from gaming_ai_analytics_spark.sources.io import TableStore

    store = TableStore(spark, str(tmp_path / "wh"))
    name = f"replay_{uuid.uuid4().hex[:8]}"
    corpus = spark.createDataFrame(
        [(1, " ".join(f"c{i:02d}" for i in range(20)))],
        "doc_id int, text string",
    )
    t_bands, t_sh = save_minhash_index(
        store, "idx", name, corpus, "doc_id", "text", num_buckets=4
    )
    sink = stream_dedup_sink(
        store, "idx", name, "clean", "docs", "doc_id", "text"
    )
    batch = spark.createDataFrame(
        [
            (10, " ".join(f"a{i:02d}" for i in range(20))),
            (11, " ".join(f"b{i:02d}" for i in range(20))),
        ],
        "doc_id int, text string",
    )

    def state():
        return (
            sorted(r.doc_id for r in store.load("clean", "docs").collect()),
            spark.table(t_bands).count(),
            spark.table(t_sh).count(),
        )

    try:
        # simulate a crash AFTER the ledger marker + clean-table
        # append, BEFORE the index appends (marker always lands
        # first, so this is the worst surviving partial state)
        store.save(
            "idx",
            f"{name}_commits",
            spark.createDataFrame([(0,)], "batch_id long"),
            mode="append",
        )
        store.save("clean", "docs", batch, mode="append")
        sink(batch, 0)
        clean, n_bands, n_sh = state()
        assert clean == [10, 11]  # no duplicate clean rows
        assert n_sh == 3  # corpus doc + the two back-filled survivors

        # full replay of a fully-committed batch: nothing changes
        sink(batch, 0)
        assert state() == (clean, n_bands, n_sh)

        # a FRESH batch id rides the fast path (no guards) and its
        # marker lands in the ledger
        batch2 = spark.createDataFrame(
            [(20, " ".join(f"d{i:02d}" for i in range(20)))],
            "doc_id int, text string",
        )
        sink(batch2, 1)
        clean2, _, n_sh2 = state()
        assert clean2 == [10, 11, 20]
        assert n_sh2 == 4
        marks = sorted(
            r.batch_id for r in store.load("idx", f"{name}_commits").collect()
        )
        assert marks == [0, 1]
    finally:
        for t in (t_bands, t_sh):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


# ---------------------------------------------------------------------------
# streaming document curation (r13)
# ---------------------------------------------------------------------------
def test_documents_streaming_curation_matches_batch(spark):
    """The shared gate+dedup definition must produce identical results
    through the streaming engine (availableNow file source) and the
    plain batch path — the module's batch/stream-parity promise."""
    from gaming_ai_analytics_spark.streaming.documents import (
        curated_manifest,
        stream_documents,
    )
    from gaming_ai_analytics_spark.streaming.events import (
        run_stream_to_memory,
    )

    batch = {
        (r.fp, r.n_tokens)
        for r in curated_manifest(
            spark.read.parquet(f"{SF}/documents.parquet")
        ).collect()
    }
    streamed = {
        (r.fp, r.n_tokens)
        for r in run_stream_to_memory(
            curated_manifest(stream_documents(spark, SF)),
            spark,
            output_mode="append",
        ).collect()
    }
    assert streamed == batch
    assert batch  # the fixture must admit at least one document


def test_documents_streaming_curation_multibatch_and_gate(spark, tmp_path):
    """Micro-batch independence + gate semantics on planted docs: the
    same corpus split across three files streamed one file per
    trigger (duplicates STRADDLING micro-batches) must still dedup to
    one row per fingerprint, and gate-failing docs never appear."""
    import pyspark.sql.functions as F
    from gaming_ai_analytics_spark.streaming.documents import (
        curated_manifest,
    )
    from gaming_ai_analytics_spark.streaming.events import (
        run_stream_to_memory,
    )

    good = "the quick brown fox jumps of the lazy dog and friends"
    rows = [
        (1, good, "en", "web", len(good)),
        (2, good, "en", "books", len(good)),  # exact dup, other source
        (3, "tiny", "en", "web", 4),  # fails the 5-token floor
        (4, "!!! ??? *** $$$ %%% ^^^ @@@ ###", "en", "web", 31),  # punct
        (5, "the best of the rest and more of the same to end in style",
         "en", "web", 58),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
        "n_chars long"
    )
    src = tmp_path / "docs"
    for i, r in enumerate(rows):
        df.filter(F.col("doc_id") == r[0]).coalesce(1).write.mode(
            "append"
        ).parquet(str(src))
    stream = (
        spark.readStream.schema(df.schema)
        .format("parquet")
        .option("maxFilesPerTrigger", 1)
        .load(str(src))
    )
    out = run_stream_to_memory(
        curated_manifest(stream), spark, output_mode="append"
    ).collect()
    batch = curated_manifest(df).collect()
    assert {(r.fp, r.n_tokens) for r in out} == {
        (r.fp, r.n_tokens) for r in batch
    }
    assert len(out) == 2  # docs 1/2 collapse to one fp; 3 and 4 gated out
