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
#: ROUND-7 COMPOSITION (VERDICT r6 ask #1 — the staleness test went
#: red by design when CORRECTNESS_r06 landed; this rotation is the
#: first r7 commit).  Committed-history state at rotation time:
#: 17 registered names with NO driver row ever (the two rows-only
#: pure-ANN entries were RETIRED this round per VERDICT r6 ask #6 —
#: folded into their ``_recall`` twins, see queries_llm.py), 30 names
#: last green r3, 40 last green r4.  Priority order:
#:   1. ``chunk_dedup_clean`` — the only real never-checked operator
#:      (added mid-r6 after the window froze; new nontrivial oracle);
#:   2. ``zorder_key_events`` + ``python_datasource_scan`` (the one
#:      red r6 row — session-portability conf fixed this round, keep
#:      it in the window per VERDICT r6 ask #2);
#:   3. the 14 remaining never-checked language surfaces;
#:   4. all 30 r3-stale entries (oldest evidence in the registry);
#:   5. three r4 heads — the heavy dedup operators and the text
#:      profile, highest-complexity first.
#: Every name carries a full oracle — zero rows-only checks remain in
#: the REGISTRY at all now.  The 37 remaining r4-green names form the
#: r8 backlog below.
DRIVER_WINDOW: tuple[str, ...] = (
    # -- 1. never-checked: the real operator first -------------------
    "chunk_dedup_clean",
    "zorder_key_events",
    # red r6 row; filterPushdown conf now set inside the query
    "python_datasource_scan",
    # -- never-checked language / streaming surfaces -----------------
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
    # -- r3-stale (complete set, oldest evidence) --------------------
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
    # -- NEW r7 operators (zero evidence anywhere — a fresh driver row
    # is worth more than refreshing an r4-green name) -----------------
    "leakage_safe_split",
    "dq_observed_metrics",
    # -- r4 head (heaviest operator of the r4 cohort) ----------------
    "dedup_minhash_lsh",
)

#: Everything still owed a fresh driver row AFTER this round's window
#: — the 39 remaining r4-green names (37 + the two displaced by the
#: new r7 operators) plus the post-freeze r7 additions, pre-ordered as
#: the r8 window plan (VERDICT r6 ask #8).  R8 COMPOSITION PLAN: the
#: backlog now holds 58 names (the 13 extra-late-r7 operators joined
#: its head), so the r8 window is exactly its FIRST 50 entries and the
#: last 8 (tail of the analytics/warehouse cohort) roll to r9; after r8
#: every name's last green row is ≥ r5.  Heads: the new operators, the
#: displaced r4 heads, the three sf1
#: bench-regression suspects (fresh rows double as correctness cover
#: for any perf fix), then the heavy operators, then language
#: surfaces.
ROTATION_BACKLOG: tuple[str, ...] = (
    # NEW r7 operators added after the window froze (hot-key isolated
    # skew join; incremental dedup against a persisted LSH index;
    # trained quality-classifier distillation contract; deterministic
    # weighted sampling; SemDeDup k-means-blocked embedding dedup) —
    # zero driver evidence, head the r8 plan
    "join_skew_isolated",
    "dedup_incremental_index",
    "quality_classifier_distill",
    "sample_weighted",
    "dedup_semantic",
    "lm_perplexity_score",
    "pagerank_trade_graph",
    "frequent_itemset_pairs",
    "triangle_count_parts",
    "blocking_snm_candidates",
    "audience_overlap_sketch",
    "dedup_containment",
    "quality_psi_drift",
    "inverted_index_postings",
    "user_value_decay",
    "pit_dim_join",
    "ab_conversion_ztest",
    "pmi_collocations",
    "benford_price_digits",
    # r4 heads displaced by the two new r7 operators
    "dedup_simhash_pairs",
    "text_analysis_profile",
    # bench-regression suspects (BENCH r6, host-suspect — re-proved r7)
    "fillna_after_left_join",
    "fact_build_transform",
    "window_topk_per_group",
    # heavy operators / pipelines
    "join_chain_left",
    "join_salted_skew",
    "customer_rfm_segments",
    "dq_completeness_profile",
    "quantile_profile",
    "multimodal_features",
    "multimodal_resize",
    "bm25_term_scores",
    "embedding_norm_profile",
    "lang_confusion_matrix",
    "dedup_rate_by_source",
    "dup_similarity_histogram",
    "traindata_sequence_packing",
    "quality_gate_rules",
    "token_budget_select",
    "vocab_bigrams",
    "token_length_histogram",
    # streaming cohort
    "events_streaming_tumbling",
    "events_session_window",
    "events_streaming_session",
    "events_stream_stream_join",
    "events_streaming_rate_alert",
    # analytics / warehouse cohort
    "window_rolling_7d",
    "stat_regression",
    "source_lang_entropy",
    "event_path_transitions",
    "anomaly_mad",
    "trending_daily_topk",
    "user_lifetime_value",
    "pricing_summary",
    "top_revenue_orders",
    "returned_item_customers",
    "priority_class_mix",
    "late_ship_priority_counts",
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
