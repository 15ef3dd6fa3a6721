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
#: ROUND-6 COMPOSITION (VERDICT r5 ask #1 — drain the driver-evidence
#: backlog, highest-risk first): every slot goes to a query with NO
#: prior driver row or a CHANGED plan/oracle — the window is disjoint
#: from the 50 r5-green names by construction (a slot spent re-proving
#: last round's rows is a slot wasted; ``tests/test_registry.py``
#: pins that invariant).  Priority order:
#:   1. changed-ORACLE: ``dedup_embedding_lsh`` (reshaped late r5 to
#:      the scale-stable recall contract — r1-r3 rows predate it);
#:   2. changed-PLAN (late-r5 one-scan audit rewrites, locally
#:      verified identical but deserving fresh driver rows):
#:      ``skew_top_keys`` ``mixture_rebalance`` ``weekly_active_users``
#:      ``timeseries_gap_fill`` ``min_cost_supplier``
#:      ``supplier_value_concentration`` ``top_supplier_revenue``
#:      ``dominant_part_suppliers`` ``approx_topk_contract``, plus
#:      ``agg_percentile`` whose high-NDV median was rerouted through
#:      the sketch-bracket strategy THIS round (r5 ask #2);
#:   3. the never-driver-checked late-r5 surfaces, complex operators
#:      before simple language surfaces: the TPC-H completion sweep,
#:      the analytics/warehouse reports, the full Python-eval ladder
#:      (UDAF / applyInPandas / mapInArrow / UDTF) + Python
#:      DataSource batch+stream, the traindata/LLM additions
#:      (fuzzy match, drift-KL, samplers, rarity, quantization,
#:      binaryFile, bitmap), and the riskiest SQL surfaces
#:      (recursive CTE, VARIANT, XML, GROUP BY ALL, parameterized
#:      SQL; Z-order lost its slot to the agg_percentile rework and
#:      heads the backlog).
#: Every name carries a full oracle — zero rows-only checks in the
#: window.  What does NOT fit (16 never-checked low-risk simple
#: surfaces + the two rows-only pure-ANN queries + the 30 r3-stale
#: entries) is enumerated in ``ROTATION_BACKLOG`` below, in r7
#: priority order — the staleness test asserts nothing stale has
#: fallen off both lists.
DRIVER_WINDOW: tuple[str, ...] = (
    # -- 1. changed oracle ------------------------------------------
    "dedup_embedding_lsh",
    # -- 2. changed plans (one-scan audit) --------------------------
    "skew_top_keys",
    "mixture_rebalance",
    "weekly_active_users",
    "timeseries_gap_fill",
    "min_cost_supplier",
    "supplier_value_concentration",
    "top_supplier_revenue",
    "dominant_part_suppliers",
    "approx_topk_contract",
    # high-NDV median rerouted through the sketch-bracket strategy
    # this round (VERDICT r5 ask #2) — changed plan, fresh row now
    "agg_percentile",
    # -- 3a. TPC-H completion sweep (never checked) -----------------
    "shipping_priority",
    "forecast_revenue_delta",
    "product_profit_by_nation_year",
    "customer_order_distribution",
    "supplier_part_variety",
    "large_volume_customers",
    "sole_return_suppliers",
    # -- 3b. analytics / warehouse reports (never checked) ----------
    "order_aging_report",
    "pareto_revenue_share",
    "chisq_lang_source",
    "regional_supplier_volume",
    "nation_trade_flows",
    "market_share",
    "idle_rich_customers",
    "promo_revenue_share",
    "small_quantity_revenue",
    "disjunctive_predicate_join",
    "fulfillment_latency_profile",
    "lateral_topk_suppliers",
    "agg_grouping_sets",
    # -- 3c. Python-eval ladder + Python DataSource (never checked) -
    "agg_geomean_udaf",
    "grouped_zscore_applyinpandas",
    "mapinarrow_bytelen",
    "doc_chunking_udtf",
    "python_datasource_scan",
    "python_datasource_stream",
    # -- 3d. traindata / LLM additions (never checked) --------------
    "fuzzy_part_name_pairs",
    "corpus_drift_kl",
    "dataset_hash_split",
    "sample_exact_k_per_group",
    "doc_rarity_score",
    "embedding_quantization_profile",
    "binaryfile_ingest_scan",
    "bitmap_distinct_users",
    # -- 3e. SQL-language surfaces (never checked, riskiest first) --
    "recursive_cte_spine",
    "events_props_variant",
    "xml_csv_roundtrip",
    "group_by_all_sql",
    "parameterized_sql",
)

#: Everything still owed a (fresh) driver row AFTER this round's
#: window, in r7 priority order.  Layers: (a) the mid-r6-added
#: ``chunk_dedup_clean`` (post-freeze, heads the queue), the 15
#: never-checked low-risk simple surfaces (zorder included — it lost
#: its slot to the agg_percentile rework) + the 2 rows-only pure-ANN
#: queries; (b) the 30 entries whose last green driver row is round 3
#: (two-round staleness cap); the 44 r4-green entries follow once
#: CORRECTNESS_r06 lands (computed by the staleness test from
#: committed history, not listed here).
ROTATION_BACKLOG: tuple[str, ...] = (
    # (a) never-checked, deferred this round (chunk_dedup_clean was
    # ADDED mid-r6, after the window was frozen)
    "chunk_dedup_clean",
    "zorder_key_events",
    "window_value_range_frame",
    "join_null_safe",
    "events_stream_stream_left_join",
    "events_streaming_dedupe_ttl",
    "set_except_all",
    "set_intersect_all",
    "union_by_name_evolution",
    "try_arithmetic_safety",
    "string_agg_langs",
    "quantity_width_buckets",
    "events_local_hour_profile",
    "regex_token_mentions",
    "token_array_hof_profile",
    "content_hash_manifest",
    "similarity_topk_lsh",
    "similarity_topk_ivf",
    # (b) r3-stale
    "agg_rollup",
    "agg_scale_sketches",
    "sql_ai_functions",
    "pivot_lang_counts",
    "dedup_exact_canonical",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    "multimodal_frame_sample",
    "doc_chunking",
    "vocab_top_terms",
    "tf_idf",
    "sample_stratified",
    "pii_redact",
    "quality_repetition",
    "decontaminate_eval_overlap",
    "export_shards",
    "traindata_curation_pipeline",
    "events_tumbling_hourly",
    "events_sliding_window",
    "events_streaming_stateful_totals",
    "events_streaming_dedupe",
    "events_streaming_static_join",
    "funnel_conversion",
    "retention_cohorts",
    "anomaly_zscore",
    "agg_incremental_merge",
    "latest_event_per_user",
    "window_forward_fill",
    "agg_sketch_rollup",
    "dedup_cluster_assign",
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
