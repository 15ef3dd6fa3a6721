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
#: Round-5 composition (VERDICT r4 asks #2 and #7): flagship, the
#: never-driver-checked ``dedup_cluster_assign_star`` (now the
#: ``dedup_clusters`` default), every query whose implementation or
#: oracle changed in round 5 (the reworked exact top-k + its two
#: recall contracts with the parameterized oracle, the two CC
#: consumers riding the rewritten star scheme, the reordered
#: flagship, metric-view), the two round-5 additions (ORC round-trip,
#: per-domain cap — never driver-checked), and ALL 40 queries whose
#: last driver row is round 2 — the staleness cap (no entry older
#: than two rounds) binds exactly 40+10 = 50 slots, so the r4-green
#: bench headliners sit this round out (they keep
#: ``tools/verify_local.py`` + pytest coverage and rotate back in
#: round 6). Every name below carries a full oracle — zero rows-only
#: checks in the window.
#:
#: ROUND-6 ROTATION QUEUE (in priority order): the ~30 late-r5
#: additions with no driver row yet — COVERAGE.md marks each
#: "r6 window candidate" (warehouse Q5/Q7/Q8/Q11/Q14/Q17/Q19/Q22
#: analogs, grouping sets, LATERAL, recursive CTE, VARIANT,
#: approx_top_k contract, xml/csv parsing, fuzzy match, regex
#: mentions, UDAF/applyInPandas/mapInArrow ladder, null-safe join,
#: string_agg, EXCEPT/INTERSECT ALL, union-by-name, try arithmetic,
#: value-RANGE frame, calendar/timezone/width_bucket, Python
#: DataSource batch+stream, content hashes, zorder, UDTF,
#: stream-left-join + TTL dedup from early r5, and the late-r5
#: TPC-H completion sweep — Q2/Q3/Q6/Q9/Q13/Q15/Q16/Q18/Q20/Q21
#: analogs `min_cost_supplier` `shipping_priority`
#: `forecast_revenue_delta` `product_profit_by_nation_year`
#: `customer_order_distribution` `top_supplier_revenue`
#: `supplier_part_variety` `large_volume_customers`
#: `dominant_part_suppliers` `sole_return_suppliers` plus
#: `dataset_hash_split` `sample_exact_k_per_group` `corpus_drift_kl`
#: `group_by_all_sql` `parameterized_sql`; the RESHAPED
#: `dedup_embedding_lsh` — its oracle changed to the scale-stable
#: recall contract late r5, so it needs a fresh driver row even
#: though the r1-r3 rows were green; and the queries whose PLANS were
#: rewritten by the late-r5 one-scan audit — `min_cost_supplier`
#: `supplier_value_concentration` `top_supplier_revenue`
#: `dominant_part_suppliers` `skew_top_keys` `approx_topk_contract`
#: `mixture_rebalance` `weekly_active_users` `timeseries_gap_fill` —
#: results verified identical locally, but a changed plan deserves a
#: fresh driver row) — then the r4-green bench headliners, then
#: oldest last-green.
DRIVER_WINDOW: tuple[str, ...] = (
    # flagship first — the smoke-check query (join order reworked r5)
    "flagship_star_metrics",
    # the dedup_clusters default CC scheme: first-ever driver row,
    # plus the consumer riding the r5 convergence rewrite (hash-min's
    # own query is unchanged this round — r3-green, rotates back r6)
    "dedup_cluster_assign_star",
    "dedup_survivors",
    "global_quality_rank",
    # exact top-k reworked r5 (Arrow fan-out) + recall contracts
    # whose oracle was parameterized r5
    "similarity_topk",
    "similarity_topk_lsh_recall",
    "similarity_topk_ivf_recall",
    # metric-view consumer-SQL hardening landed r5
    "metric_view_region",
    # round-5 additions — first driver rows (these outrank keeping
    # r4-green bench headliners fresh; the headliners rotate back r6)
    "orc_roundtrip_scan",
    "domain_cap_sample",
    # --- the 40 round-2-stale entries (last driver row r2) ---
    # filters / projections / scalars
    "filter_numeric_conjunction",
    "filter_boolean_algebra",
    "filter_isin",
    "filter_null_guard",
    "project_rename",
    "derived_columns",
    "scalar_string_functions",
    "case_when_banding",
    # joins
    "join_flatten_dim",
    "join_anti_incremental",
    "join_inner",
    "join_semi",
    # aggregations
    "agg_count_by_group",
    "agg_avg_by_group",
    "agg_conditional_ratio",
    "agg_distinct",
    "agg_global_counts",
    "agg_uniqueness_check",
    "agg_cube",
    # sort-limit
    "topk_orders",
    # windows
    "window_running_sum",
    "window_lag_delta",
    "window_ntile_pctrank",
    "window_value_functions",
    # set ops
    "set_union_distinct",
    "set_intersect",
    "set_except",
    # event-time batch
    "events_daily_rollup",
    "events_asof_enrich",
    "events_range_join",
    "events_json_props",
    # stats / data quality
    "stat_correlation",
    "dq_range_violations",
    "dq_uniqueness_violations",
    # UDF surface + metric-view consumer variant
    "translate_dim_names",
    "metric_view_two_dims_where",
    # sources + reshapes + SCD
    "csv_roundtrip_scan",
    "jsonl_roundtrip_scan",
    "unpivot_measures",
    "scd2_customer_segment",
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
