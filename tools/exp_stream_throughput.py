"""Streaming sustained-throughput probe (r7).

The streaming surface has batch-parity correctness evidence but no
performance evidence. This measures sustained rows/s through the REAL
Structured Streaming engine — micro-batch planner, state store,
watermark-free update mode — by replaying the 10 M-row sf10 `events`
fixture as a bounded 8-micro-batch stream (16 files,
maxFilesPerTrigger=2) into a noop sink, per operator:

  tumbling_hourly       built-in windowed agg (tiny state: 30 d x 24 h
                        x |event_type| windows)
  session_windows       gap-based sessionization (state ~ open
                        sessions per user)
  dedupe_keys           dropDuplicates on event_id (state = key set)
  segment_totals        stream-static broadcast join + agg (the
                        slowly-changing-dim enrichment pattern)
  stateful_user_totals  applyInPandasWithState — the Python/Arrow
                        custom-state path (state: 1 tuple x 150 k
                        users; measures the Python worker round-trip
                        per micro-batch)

rows/s here is a LOWER bound on cluster throughput: local[32] shares
one JVM between source, state store, and sink, and the 8-batch replay
pays the micro-batch scheduling floor 8 times.

Usage: python tools/exp_stream_throughput.py [sf_dir] [ops ...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
    REPO, ".benchdata", "sf10"
)
SRC = os.path.join(REPO, ".benchdata", "stream_src_events")
N_FILES, FILES_PER_TRIGGER = 16, 2


def prepare_source(spark) -> int:
    """A 16-file TIME-ORDERED copy of the events fixture (one-time) so
    the file source replays it as 8 roughly-in-order micro-batches —
    the arrival pattern of a real event log, and the one that lets the
    session-window watermark close sessions instead of dropping bulk
    late data. Returns the row count."""
    if not os.path.isdir(SRC):
        (
            spark.read.parquet(os.path.join(SF, "events.parquet"))
            .repartitionByRange(N_FILES, "ts")
            .sortWithinPartitions("ts")
            .write.mode("overwrite")
            .parquet(SRC)
        )
    return spark.read.parquet(SRC).count()


def read_stream(spark):
    from pyspark.sql import functions as F

    from gaming_ai_analytics_spark.sources.star import normalize_event_ts

    schema = spark.read.parquet(SRC).schema
    raw = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", FILES_PER_TRIGGER)
        .parquet(SRC)
    )
    return normalize_event_ts(raw).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )


def drive(agg, mode: str) -> tuple[float, int]:
    """Run the bounded stream to completion; (wall_s, n_batches)."""
    ckpt = tempfile.mkdtemp(prefix="stream_tp_")
    t0 = time.perf_counter()
    q = (
        agg.writeStream.outputMode(mode)
        .format("noop")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.processAllAvailable()
        batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    finally:
        q.stop()
        shutil.rmtree(ckpt, ignore_errors=True)
    return time.perf_counter() - t0, batches


def drive_matview(spark, ev) -> tuple[float, int]:
    """The foreachBatch MERGE sink (`stream_matview_upsert`) runs its
    own bounded query — time the whole convergence: every micro-batch
    re-emits changed user keys and upserts the serving table
    (anti-join + union + atomic staged swap).  Returns (wall_s,
    n_batches) with the batch count taken from the query's own
    recentProgress (ADVICE r11: never hard-code it — it drifts with
    N_FILES/FILES_PER_TRIGGER).  This is the honest cost of a
    continuously-maintained summary TABLE vs the noop-sink operator
    rows above it."""
    from pyspark.sql import functions as F

    from gaming_ai_analytics_spark.sources.io import TableStore
    from gaming_ai_analytics_spark.streaming.events import (
        stream_matview_upsert,
    )

    wh = tempfile.mkdtemp(prefix="stream_tp_mv_")
    store = TableStore(spark, wh)
    totals = (
        ev.withWatermark("ts", "1 hour")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )
    t0 = time.perf_counter()
    try:
        batches = stream_matview_upsert(
            totals, store, "serve", "user_totals", ["user_id"]
        )
        return time.perf_counter() - t0, batches
    finally:
        shutil.rmtree(wh, ignore_errors=True)


def drive_matview_daily(
    spark, ev, pruned: bool, aged_copies: int = 0
) -> tuple[float, int]:
    """VERDICT r11 ask #5 A/B: the same DAILY (day, user) rollup
    matview driven through the full-rewrite MERGE vs the
    partition-pruned MERGE (serving table partitioned by day; each
    micro-batch rewrites only its touched day directories).  The
    source replay is time-ordered, so a micro-batch's updates are
    day-local — the workload shape partition pruning exists for.
    Day count grows with the serving table's age; at sf10 the fixture
    spans ~30 days and each of the 8 batches touches ~4-5, so the
    pruned arm's per-batch rewrite is bounded by the batch's days
    while the full arm rewrites all days seen so far.

    ``aged_copies`` pre-seeds the serving table with that many
    synthetic HISTORICAL copies of the full rollup (days shifted into
    the past) before the stream starts — the months-old serving table
    a real deployment maintains.  The full arm must rewrite the whole
    aged table every micro-batch; the pruned arm's cost stays bounded
    by the batch's touched days regardless of age."""
    from pyspark.sql import functions as F

    from gaming_ai_analytics_spark.sources.io import TableStore
    from gaming_ai_analytics_spark.streaming.events import (
        stream_matview_upsert,
    )

    wh = tempfile.mkdtemp(prefix="stream_tp_mvd_")
    store = TableStore(spark, wh)
    daily = (
        ev.withWatermark("ts", "1 hour")
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
    part = ["day"] if pruned else None
    if aged_copies:
        batch_daily = (
            spark.read.parquet(SRC)
            .withColumn("ts", F.col("ts").cast("timestamp"))
            .groupBy(
                F.date_trunc("day", "ts").alias("_d"), "user_id"
            )
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.round(F.sum("value"), 2).alias("total_value"),
            )
        )
        history = None
        for k in range(1, aged_copies + 1):
            shifted = batch_daily.select(
                F.date_format(
                    F.date_sub(F.col("_d"), 40 * k), "yyyy-MM-dd"
                ).alias("day"),
                "user_id",
                "n_events",
                "total_value",
            )
            history = shifted if history is None else history.unionAll(
                shifted
            )
        store.save(
            "serve", "daily_totals", history, mode="overwrite",
            partition_by=part,
        )
    t0 = time.perf_counter()
    try:
        batches = stream_matview_upsert(
            daily, store, "serve", "daily_totals", ["day", "user_id"],
            partition_by=part,
        )
        return time.perf_counter() - t0, batches
    finally:
        shutil.rmtree(wh, ignore_errors=True)


def main() -> None:
    from gaming_ai_analytics_spark.session import get_spark
    from gaming_ai_analytics_spark.streaming import events as se

    spark = get_spark("stream-throughput")
    n_rows = prepare_source(spark)

    def ops():
        ev = read_stream(spark)
        cust = spark.read.parquet(os.path.join(SF, "customer.parquet"))
        return {
            "tumbling_hourly": (se.tumbling_hourly(ev), "update"),
            # session windows only support append (closed sessions) on
            # streams; the watermark is what closes them
            "session_windows": (
                se.session_windows(ev.withWatermark("ts", "30 minutes")),
                "append",
            ),
            "dedupe_keys": (se.dedupe_keys(ev, ["event_id"]), "append"),
            "segment_totals": (se.segment_totals(ev, cust), "update"),
            "stateful_user_totals": (se.stateful_user_totals(ev), "update"),
        }

    wanted = sys.argv[2:] or (list(ops()) + ["matview_upsert"])
    results = {}
    for name in wanted:
        if name == "matview_upsert":
            wall, batches = drive_matview(spark, read_stream(spark))
        elif name.startswith("matview_daily"):
            wall, batches = drive_matview_daily(
                spark,
                read_stream(spark),
                pruned="pruned" in name,
                aged_copies=12 if name.endswith("_aged") else 0,
            )
        else:
            agg, mode = ops()[name]  # fresh stream per run
            wall, batches = drive(agg, mode)
        results[name] = {
            "wall_s": round(wall, 2),
            "micro_batches": batches,
            "rows_per_s": int(n_rows / wall),
        }
        print(f"{name}: {wall:.2f}s over {batches} micro-batches = "
              f"{results[name]['rows_per_s']:,} rows/s", flush=True)

    print(json.dumps({"rows": n_rows, "n_files": N_FILES,
                      "files_per_trigger": FILES_PER_TRIGGER,
                      "results": results}))


if __name__ == "__main__":
    main()
