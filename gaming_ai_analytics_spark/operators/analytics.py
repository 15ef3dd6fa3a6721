"""Product-analytics operators: funnel conversion, retention cohorts,
per-group outlier detection.

The reference's domain is gaming analytics (review facts + event
exploration, ``/root/reference/src/exploration/analysis.sql:20-59``);
these are the standard event-stream analyses a user of such a platform
runs next, expressed shuffle-minimally:

- :func:`funnel` — ordered multi-step conversion. ONE shuffle on the
  user key; per-user step matching is a single codegen'd fold
  (``aggregate``) over the time-sorted event array — no self-joins,
  no window functions, no per-row Python (the only join is the
  broadcast step-spine onto the final per-step counts). The per-user
  event array is bounded (events-per-user, the same assumption every
  sessionizer makes), so the fold's state is O(steps).
- :func:`retention_cohorts` — first-seen cohort × day-offset active
  users. ONE shuffle on the user key (min-date and distinct active
  days come from the same aggregate), then a tiny (cohort, offset)
  re-agg.
- :func:`zscore_outliers` — |z| > t rows vs their group's mean/std.
  The group stats aggregate is map-side partial + a broadcast join
  back; deliberately NOT a ``Window.partitionBy(group)`` — with few
  groups that window funnels the whole table through |groups|
  reducers, the classic skew trap this engine avoids everywhere.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    steps: Sequence[str],
    id_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered funnel: a user reaches step *i* at the earliest event of
    type ``steps[i]`` STRICTLY after their step *i-1* match (classic
    greedy earliest-completion semantics — the matched times are the
    minimal chain, so reach counts are maximal). Steps must be
    distinct event types.

    Returns one row per step: ``(step, event_type, n_users)``.
    """
    if len(set(steps)) != len(steps):
        raise ValueError("funnel steps must be distinct event types")
    n = len(steps)
    steps_arr = F.array(*[F.lit(s) for s in steps])
    init = F.array(*[F.lit(None).cast("timestamp") for _ in steps])

    def advance(acc: Column, ev: Column) -> Column:
        # One event fills at most the single unmatched lane whose step
        # name matches and whose predecessor matched strictly earlier.
        # `transform` reads the pre-event acc for every lane, so a
        # lane filled by THIS event never unlocks the next lane until
        # a later event (ts-sorted input makes that the correct order).
        def lane(m: Column, i: Column) -> Column:
            prev_ok = F.when(i == 0, F.lit(True)).otherwise(
                F.element_at(acc, i).isNotNull()
                & (ev["t"] > F.element_at(acc, i))
            )
            return F.when(m.isNotNull(), m).otherwise(
                F.when(
                    (ev["e"] == F.element_at(steps_arr, i + 1)) & prev_ok,
                    ev["t"],
                )
            )

        return F.transform(acc, lane)

    per_user = (
        events.select(
            F.col(id_col).alias("_id"),
            F.struct(
                F.col(ts_col).alias("t"), F.col(type_col).alias("e")
            ).alias("_ev"),
        )
        .where(F.col(type_col).isin(list(steps)))  # scan-pushed prune
        .groupBy("_id")
        .agg(F.array_sort(F.collect_list("_ev")).alias("_evs"))
        .select(F.aggregate(F.col("_evs"), init, advance).alias("_m"))
    )
    counts = (
        per_user.select(F.posexplode("_m").alias("_i", "_t"))
        .groupBy("_i")
        .agg(F.count("_t").alias("_n"))  # count skips nulls
    )
    # left-join onto a literal step spine so every step row exists even
    # when no user reaches it (or the input is empty) — SQL's scalar
    # COUNT subqueries always produce a row per step; so must we.
    spine = events.sparkSession.range(1).select(
        F.posexplode(steps_arr).alias("_i", "event_type")
    )
    return spine.join(counts, "_i", "left").select(
        (F.col("_i") + 1).cast("int").alias("step"),
        "event_type",
        F.coalesce("_n", F.lit(0)).alias("n_users"),
    )


def retention_cohorts(
    events: DataFrame,
    offsets: Sequence[int] = (0, 1, 3, 7),
    id_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention: users grouped by first-seen date; for each
    requested day offset, how many of the cohort were active exactly
    that many days later. ``(cohort_day, day_offset, n_users)``.

    Cohort date and distinct active days come from ONE aggregate on
    the user key; a user contributes at most once per (cohort, offset)
    via the distinct-day set (bounded by the calendar, not the event
    volume — partial aggregation collapses duplicates map-side).
    """
    d = F.to_date(F.col(ts_col)).alias("_d")
    per_user = (
        events.select(F.col(id_col).alias("_id"), d)
        .groupBy("_id")
        .agg(
            F.min("_d").alias("cohort_day"),
            F.collect_set("_d").alias("_days"),
        )
    )
    return (
        per_user.select("cohort_day", F.explode("_days").alias("_day"))
        .select(
            "cohort_day",
            F.datediff("_day", F.col("cohort_day")).alias("day_offset"),
        )
        .where(F.col("day_offset").isin(list(offsets)))
        .groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def rolling_time_sum(
    df: DataFrame,
    value_col: str,
    key_col: str,
    ts_col: str = "ts",
    window_seconds: int = 7 * 86400,
    out_cols: Sequence[str] = ("event_id",),
) -> DataFrame:
    """Per-key rolling sum over a TIME range (not a row count): for
    each row, the sum of ``value_col`` across the key's rows in the
    trailing ``window_seconds`` — the time-decayed activity feature
    (7-day spend, 30-day usage) row-count frames can't express.

    The frame is a RANGE window over the epoch SECOND (timestamp cast
    to long truncates sub-second), so engines at different sub-second
    precisions agree exactly; same-second rows are frame peers. The
    window partitions by the entity key — per-entity state, the one
    shuffle any per-entity timeline computation needs.
    """
    w = (
        Window.partitionBy(key_col)
        # TIMESTAMP_NTZ has no direct long cast (AnalysisException);
        # cast through TIMESTAMP first — identity under a UTC session,
        # then epoch-second truncation as before.
        .orderBy(F.col(ts_col).cast("timestamp").cast("long"))
        .rangeBetween(-window_seconds, 0)
    )
    return df.select(
        *out_cols,
        F.round(F.sum(value_col).over(w), 2).alias("rolling_sum"),
    )


def gap_fill_daily_counts(
    df: DataFrame,
    cat_col: str,
    ts_col: str,
    cond: Column,
    count_alias: str = "n_events",
) -> DataFrame:
    """Time-series gap filling: daily counts of rows matching ``cond``
    per category, densified over a complete date spine (category ×
    every day in the data's range) with absent days as 0 — the shape
    chart/forecast consumers need (a groupBy alone silently drops
    empty days).

    The spine is built engine-side from ONE pass over the input:
    per-category date bounds aggregate (map-side combined), global
    bounds via an empty-partition window over that |categories|-row
    relation, then ``sequence()`` exploded — no driver action, no
    collected bounds, and no separate bounds/categories branches (the
    late-r5 audit showed such branches scanning the input once EACH —
    cross-branch exchange reuse is not guaranteed). Spine size is
    |categories|·|days| (calendar-bounded, tiny); the filtered daily
    counts are the intrinsic second pass.
    """
    from pyspark.sql import Window

    d = F.to_date(F.col(ts_col))
    w_all = Window.partitionBy()
    spine = (
        df.groupBy(cat_col)
        .agg(F.min(d).alias("_lo_c"), F.max(d).alias("_hi_c"))
        .select(  # window first: a generator can't host a window expr
            cat_col,
            F.min("_lo_c").over(w_all).alias("_lo"),
            F.max("_hi_c").over(w_all).alias("_hi"),
        )
        .select(
            cat_col, F.explode(F.sequence("_lo", "_hi")).alias("day")
        )
    )
    daily = (
        df.where(cond)
        .groupBy(F.col(cat_col), d.alias("day"))
        .agg(F.count(F.lit(1)).alias(count_alias))
    )
    return spine.join(daily, [cat_col, "day"], "left").select(
        cat_col,
        "day",
        F.coalesce(count_alias, F.lit(0)).alias(count_alias),
    )


def forward_fill(
    df: DataFrame,
    value: Column,
    keys: Sequence[str],
    order_cols: Sequence[str],
    out_cols: Sequence[str],
    alias: str = "filled",
) -> DataFrame:
    """Per-key forward fill (last observation carried forward): each
    row gets the most recent non-null ``value`` at or before it in
    ``order_cols`` order. ``last(..., ignorenulls) OVER (ROWS
    UNBOUNDED PRECEDING)`` — one per-entity window, O(1) running
    state, no self-join. Make ``order_cols`` a total order (e.g.
    ``(ts, id)``) or fill results are tie-order dependent.
    """
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return df.select(
        *out_cols, F.last(value, ignorenulls=True).over(w).alias(alias)
    )


def zscore_outliers(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    threshold: float = 3.0,
    keep_cols: Sequence[str] = (),
) -> DataFrame:
    """Rows whose value deviates more than ``threshold`` sample
    standard deviations from their group mean. Output carries
    ``keep_cols + group_cols + (value_col, zscore)``; ``zscore`` is
    rounded to 6 dp for cross-engine float stability.

    Group stats are a partial-aggregated groupBy broadcast-joined
    back: the big side never shuffles and never funnels into
    |groups| window reducers.

    A constant-valued group has ``stddev_samp = 0``; z would be 0/0 =
    NaN, and Spark's NaN ordering makes ``abs(NaN) > t`` TRUE — every
    row of the constant group would be flagged (and DuckDB disagrees,
    NULL there). The ``_sd > 0`` guard excludes those groups on both
    engines: a constant group has no outliers by definition.
    """
    gcols = list(group_cols)
    stats = df.groupBy(*gcols).agg(
        F.avg(value_col).alias("_mu"),
        F.stddev_samp(value_col).alias("_sd"),
    )
    z = (F.col(value_col) - F.col("_mu")) / F.col("_sd")
    return (
        df.join(F.broadcast(stats), gcols)
        .where((F.col("_sd") > 0) & (F.abs(z) > threshold))
        .select(
            *keep_cols,
            *gcols,
            value_col,
            F.round(z, 6).alias("zscore"),
        )
    )
