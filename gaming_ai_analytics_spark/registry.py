"""Query registry: every implemented operator exposed for the driver.

Each entry pairs a PySpark implementation ``(spark, sf_dir) -> DataFrame``
with an ANSI-SQL oracle string DuckDB runs on the same parquet tables
(driver contract in ``__spark_entry__.py``). Column names and rounding
are aligned on both sides so the order-insensitive value hash matches.

Non-SQL-expressible operators (LSH dedup internals, streaming) register
a query with no oracle → the driver records a rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from gaming_ai_analytics_spark.plans.flagship import (
    FLAGSHIP_ORACLE_SQL,
    flagship_star_metrics,
)

QueryFn = Callable[[SparkSession, str], DataFrame]

#: name -> (spark_impl, oracle_sql | None)
_REGISTRY: dict[str, tuple[QueryFn, str | None]] = {}


def register(name: str, fn: QueryFn, oracle: str | None) -> None:
    _REGISTRY[name] = (fn, oracle)


def queries() -> dict[str, QueryFn]:
    _apply_driver_window()
    return {name: fn for name, (fn, _) in _REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    _apply_driver_window()
    return {name: sql for name, (_, sql) in _REGISTRY.items() if sql is not None}


def oracle_for(name: str) -> str | None:
    """Raw oracle lookup for intra-package reuse.

    Safe to call from a query module's body during ``_load_all`` —
    unlike ``oracle_sql`` it does not validate/reorder the (possibly
    still half-built) registry.
    """
    return _REGISTRY[name][1]


# --- M1 flagship -----------------------------------------------------------
register("flagship_star_metrics", flagship_star_metrics, FLAGSHIP_ORACLE_SQL)


def _load_all() -> None:
    """Import every module that registers queries (side-effect imports)."""
    from gaming_ai_analytics_spark import queries_core  # noqa: F401
    from gaming_ai_analytics_spark import queries_ext  # noqa: F401
    from gaming_ai_analytics_spark import queries_llm  # noqa: F401
    from gaming_ai_analytics_spark import queries_stream  # noqa: F401
    from gaming_ai_analytics_spark import queries_traindata  # noqa: F401
    from gaming_ai_analytics_spark import queries_analytics  # noqa: F401
    from gaming_ai_analytics_spark import queries_warehouse  # noqa: F401


#: The driver's correctness pass checks the FIRST 50 entries of
#: ``queries()`` iteration order.  Registration order is import order,
#: which drifts as modules grow — round 2 proved that nine new core/ext
#: registrations silently evicted the entire extension ladder from the
#: checked window.  So the window is pinned EXPLICITLY: these names are
#: moved to the front (in this order) after all modules register.
#:
#: Composition: flagship, every query that has never had a driver
#: correctness row (the LLM-pipeline / streaming / train-data /
#: analytics surfaces), the bench headliners not already among them,
#: and the two queries whose oracles changed this round
#: (``pivot_lang_counts`` hash fix, ``agg_scale_sketches`` new oracle).
#: Long-green core/ext queries rotate out; they stay covered by
#: ``tools/verify_local.py`` and pytest.
DRIVER_WINDOW: tuple[str, ...] = (
    # flagship first — the smoke-check query
    "flagship_star_metrics",
    # §2.11 LLM-pipeline ladder (green in r1, evicted in r2)
    "text_analysis_profile",
    "dedup_exact_canonical",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash_pairs",
    "dedup_embedding_cosine",
    "dedup_embedding_lsh",
    "dedup_cluster_assign",
    "similarity_topk",
    "similarity_topk_lsh",
    "similarity_topk_ivf",
    "multimodal_features",
    "multimodal_frame_sample",
    "multimodal_resize",
    # streaming (never driver-checked in any round)
    "events_tumbling_hourly",
    "events_streaming_tumbling",
    "events_sliding_window",
    "events_session_window",
    "events_streaming_stateful_totals",
    "events_streaming_session",
    "events_stream_stream_join",
    "events_streaming_dedupe",
    "events_streaming_static_join",
    # train-data pipeline (new in r2, never checked)
    "doc_chunking",
    "vocab_top_terms",
    "tf_idf",
    "sample_stratified",
    "pii_redact",
    "quality_repetition",
    "decontaminate_eval_overlap",
    "export_shards",
    # analytics (new in r2, never checked)
    "funnel_conversion",
    "retention_cohorts",
    "anomaly_zscore",
    "window_rolling_7d",
    "agg_incremental_merge",
    "latest_event_per_user",
    "timeseries_gap_fill",
    "window_forward_fill",
    "agg_sketch_rollup",
    # bench headliners not already above — keep driver evidence fresh
    # for every number in BENCH_r{N}.json (window_topk_per_group and
    # join_chain_left, green in r1+r2, rotate out for round-3 queries)
    "fillna_after_left_join",
    "agg_percentile",
    "agg_rollup",
    "fact_build_transform",
    "metric_view_region",
    # new this round: SQL-registered ai_score/ai_translate + the
    # composed corpus-curation pass
    "sql_ai_functions",
    "traindata_curation_pipeline",
    # oracles changed this round — must re-prove in the driver
    "pivot_lang_counts",
    "agg_scale_sketches",
)


def _apply_driver_window() -> None:
    """Reorder ``_REGISTRY`` so ``DRIVER_WINDOW`` names iterate first.

    Called lazily from ``queries()`` / ``oracle_sql()`` rather than at
    import time: a direct ``import queries_ext`` re-enters this module
    before ``queries_ext``'s own registrations have run (circular
    import), so an eager check would raise on a half-built registry.
    By first *call* time every module body has finished.
    """
    missing = [n for n in DRIVER_WINDOW if n not in _REGISTRY]
    if missing:  # fail loudly: a typo here wastes a round
        raise KeyError(f"DRIVER_WINDOW names not registered: {missing}")
    ordered = {n: _REGISTRY[n] for n in DRIVER_WINDOW}
    ordered.update((n, v) for n, v in _REGISTRY.items() if n not in ordered)
    _REGISTRY.clear()
    _REGISTRY.update(ordered)


_load_all()
