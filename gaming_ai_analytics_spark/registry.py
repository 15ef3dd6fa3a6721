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
#: Round-4 composition (VERDICT r3 ask #4): flagship, the four
#: round-3 FAIL/crash queries re-proving their fixes, the three
#: queries whose registered output was reshaped to oracle-checkable
#: form this round, ``agg_percentile`` (implementation swapped), all
#: 32 queries that have NEVER had a driver correctness row in any
#: round (warehouse reports, analytics/skew/RFM/DQ diagnostics, BM25,
#: quality gates, token budgeting, sequence packing, streaming rate
#: alert, dedup diagnostics, the new ANN recall twins), and the bench
#: headliners so every BENCH_r{N} number keeps fresh driver evidence.
#: r3-green entries rotate out; they stay covered by
#: ``tools/verify_local.py`` (all-registered gate) and pytest. Every
#: name below carries a full oracle — zero rows-only checks in the
#: window.
DRIVER_WINDOW: tuple[str, ...] = (
    # flagship first — the smoke-check query
    "flagship_star_metrics",
    # round-3 driver FAILs/crashes, fixed this round
    "events_streaming_tumbling",
    "events_streaming_session",
    "events_stream_stream_join",
    "window_rolling_7d",
    # registered output reshaped to oracle-checkable form this round
    "multimodal_features",
    "multimodal_resize",
    "dedup_simhash_pairs",
    # implementation swapped (gather-free percentile)
    "agg_percentile",
    # never driver-checked: warehouse report ladder (r3)
    "pricing_summary",
    "top_revenue_orders",
    "returned_item_customers",
    "priority_class_mix",
    "late_ship_priority_counts",
    # never driver-checked: analytics / diagnostics (r3)
    "weekly_active_users",
    "user_lifetime_value",
    "trending_daily_topk",
    "customer_rfm_segments",
    "quantile_profile",
    "anomaly_mad",
    "stat_regression",
    "event_path_transitions",
    "source_lang_entropy",
    "skew_top_keys",
    "join_salted_skew",
    "dq_completeness_profile",
    "embedding_norm_profile",
    # never driver-checked: train-data ladder (r3)
    "bm25_term_scores",
    "quality_gate_rules",
    "token_budget_select",
    "vocab_bigrams",
    "token_length_histogram",
    "mixture_rebalance",
    "traindata_sequence_packing",
    "dedup_rate_by_source",
    "dup_similarity_histogram",
    "dedup_survivors",
    "lang_confusion_matrix",
    # never driver-checked: streaming rate alert (shares the fixed
    # stream_events path) + the new ANN recall contracts
    "events_streaming_rate_alert",
    "similarity_topk_lsh_recall",
    "similarity_topk_ivf_recall",
    # bench headliners not already above — keep driver evidence fresh
    # for every number in BENCH_r{N}.json (agg_rollup rotates out:
    # triple-green, floor-bound)
    "join_chain_left",
    "fillna_after_left_join",
    "window_topk_per_group",
    "fact_build_transform",
    "text_analysis_profile",
    "dedup_minhash_lsh",
    "similarity_topk",
    "events_session_window",
    "metric_view_region",
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
