from __future__ import annotations

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
