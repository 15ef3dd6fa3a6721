"""SparkSession factory.

Local defaults mirror the test environment (single JVM, many threads);
on a real cluster the same builder options remain correct — AQE handles
runtime re-planning, shuffle partitions are overridable via env.

Replaces the reference's implicit Databricks-provided ``spark`` handle
(reference: src/notebooks/utilities.py:1-7 assumes an ambient session).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "execution_session", "ADAPTIVE_MIN_INPUT_BYTES"]

#: Total scanned-input bytes below which a query executes on the
#: static-plan child session (adaptive execution off). AQE's unit of
#: work is the shuffle-stage barrier: materialize the map side, ship
#: stats to the driver, re-optimize, resubmit — a fixed ~50-160 ms per
#: query measured on this 32-thread node at bench scale. Its payoffs
#: (partition coalescing, skew-join splitting, dynamic join-strategy
#: changes) are proportional to shuffle SIZE, so below ~a GB of input
#: the barrier can never pay for itself: every shuffle already fits in
#: a handful of partitions and the static planner's size estimates are
#: exact enough (file-backed scans). At or above the threshold —
#: including every real deployment this engine targets — AQE stays on.
#: This is the same shape of cost-based choice as
#: ``autoBroadcastJoinThreshold``: pick the physical strategy from
#: driver-side size metadata, no job.
ADAPTIVE_MIN_INPUT_BYTES = 1 << 30

_STATIC_SESSIONS: dict[str, SparkSession] = {}


def execution_session(
    spark: SparkSession, input_bytes: int | None
) -> SparkSession:
    """Pick the execution session for a query whose total scanned
    input is ``input_bytes`` (driver-side file metadata — no job).

    Returns ``spark`` unchanged (adaptive execution, the scale
    default) when the input meets ``ADAPTIVE_MIN_INPUT_BYTES`` or is
    unknown; otherwise a per-context child session (``newSession`` —
    same SparkContext, same UTC/shuffle/Arrow conf, isolated SQLConf)
    with AQE disabled. Child and parent DataFrames interoperate freely
    (joins, stream-static joins — one JVM, one context); only session
    STATE (temp views, registered UDFs) is per-session, so SQL-text
    consumers must resolve views against ``df.sparkSession``."""
    if input_bytes is None or input_bytes >= ADAPTIVE_MIN_INPUT_BYTES:
        return spark
    app_id = spark.sparkContext.applicationId
    child = _STATIC_SESSIONS.get(app_id)
    if child is None or child is spark:
        child = spark.newSession()
        child.conf.set("spark.sql.adaptive.enabled", "false")
        _STATIC_SESSIONS[app_id] = child
    return child


def get_spark(
    app_name: str = "gaming_ai_analytics_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    - AQE on: runtime coalescing, skew-join splitting, dynamic
      broadcast decisions — the 100 TB levers we rely on.
    - Arrow on: fast pandas interchange for the Pandas-UDF operators.
    - UTC session timezone: parquet timestamp parity with the DuckDB
      oracle (duckdb timestamps are UTC-naive).
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    master = master or os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", cpus))
    # local[N] runs N task threads inside ONE JVM whose default heap is
    # 1g — 32 concurrent aggregation states in 1 GB OOMed a full-registry
    # verify pass at sf0.1. Size the heap like the executor fleet it
    # stands in for (only effective at JVM creation; ignored on attach).
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.driver.memory", driver_mem)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # 10 MB (the default) was tuned for 1 GB executors a decade
        # ago; with large-memory executors a mid-size build side is
        # far cheaper to broadcast than to shuffle BOTH join inputs.
        # Measured: the flagship's orders-with-dims side broadcasts at
        # sf0.1 (0.86 s → 0.63 s) while sf1's larger side still
        # correctly falls back to sort-merge. Size per executor memory
        # when deploying (64 MB assumes multi-GB executors).
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        # let custom Python DataSources receive Catalyst predicates
        # (sources/pyds.py turns them into generator-range pruning)
        .config("spark.sql.python.filterPushdown.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Duser.timezone=UTC")
        .config("spark.executor.extraJavaOptions", "-Duser.timezone=UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
