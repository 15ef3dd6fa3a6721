"""Product-analytics + graph queries: funnel, retention cohorts,
outlier detection, dedup cluster assignment.

The event-exploration side of the reference
(``/root/reference/src/exploration/analysis.sql:20-59``) stops at
grouped aggregates; these register the standard next-step analyses on
the same ``events`` stream, each with a full DuckDB oracle — including
the genuinely iterative connected-components operator, which DuckDB
checks with a recursive CTE (transitive closure) while Spark runs
hash-min label propagation (``operators/graph.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window

from pyspark.sql import functions as F

from gaming_ai_analytics_spark.operators.aggregates import (
    hll_distinct_rollup,
    latest_per_key,
    merge_partial_aggs,
)
from gaming_ai_analytics_spark.operators.analytics import (
    forward_fill,
    funnel,
    gap_fill_daily_counts,
    retention_cohorts,
    rolling_time_sum,
    zscore_outliers,
)
from gaming_ai_analytics_spark.operators.dedup import ngram_jaccard_pairs
from gaming_ai_analytics_spark.operators.graph import dedup_clusters
from gaming_ai_analytics_spark.functions.text_sql import (
    JACCARD_PAIRS_SQL as _JACCARD_PAIRS_SQL,
)
from gaming_ai_analytics_spark.registry import oracle_for, register
from gaming_ai_analytics_spark.sources.star import load_events, load_table

_FUNNEL_STEPS = ("view", "click", "purchase")


def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view → click → purchase ordered funnel over the event stream."""
    return funnel(load_events(spark, sf_dir), _FUNNEL_STEPS)


register(
    "funnel_conversion",
    q_funnel_conversion,
    # Greedy earliest-completion chain: step i's match time is the MIN
    # event ts of that type strictly after the step i-1 match — exactly
    # the fold semantics of operators/analytics.funnel.
    """
    WITH s1 AS (
      SELECT user_id, MIN(ts) AS t FROM events
      WHERE event_type = 'view' GROUP BY 1
    ),
    s2 AS (
      SELECT e.user_id, MIN(e.ts) AS t
      FROM events e JOIN s1 ON e.user_id = s1.user_id
      WHERE e.event_type = 'click' AND e.ts > s1.t GROUP BY 1
    ),
    s3 AS (
      SELECT e.user_id, MIN(e.ts) AS t
      FROM events e JOIN s2 ON e.user_id = s2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > s2.t GROUP BY 1
    )
    SELECT CAST(1 AS INTEGER) AS step, 'view' AS event_type,
           (SELECT COUNT(*) FROM s1) AS n_users
    UNION ALL
    SELECT 2, 'click', (SELECT COUNT(*) FROM s2)
    UNION ALL
    SELECT 3, 'purchase', (SELECT COUNT(*) FROM s3)
    """,
)


def q_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-seen-date cohorts × day-{0,1,3,7} active-user counts."""
    return retention_cohorts(load_events(spark, sf_dir), offsets=(0, 1, 3, 7))


register(
    "retention_cohorts",
    q_retention_cohorts,
    """
    WITH per_user AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
      FROM events GROUP BY 1
    ),
    act AS (
      SELECT DISTINCT e.user_id, p.cohort_day,
             CAST(date_diff('day', p.cohort_day, CAST(e.ts AS DATE))
                  AS INTEGER) AS day_offset
      FROM events e JOIN per_user p ON e.user_id = p.user_id
    )
    SELECT cohort_day, day_offset, COUNT(*) AS n_users
    FROM act WHERE day_offset IN (0, 1, 3, 7) GROUP BY 1, 2
    """,
)


def q_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events whose value is >3σ from their event-type mean."""
    return zscore_outliers(
        load_events(spark, sf_dir),
        value_col="value",
        group_cols=["event_type"],
        threshold=3.0,
        keep_cols=["event_id"],
    )


register(
    "anomaly_zscore",
    q_anomaly_zscore,
    """
    WITH stats AS (
      SELECT event_type, AVG(value) AS mu, STDDEV_SAMP(value) AS sd
      FROM events GROUP BY 1
    )
    SELECT e.event_id, e.event_type, e.value,
           ROUND((e.value - mu) / sd, 6) AS zscore
    FROM events e JOIN stats USING (event_type)
    WHERE sd > 0 AND ABS((e.value - mu) / sd) > 3.0
    """,
)


def q_window_rolling_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day per-user spend for every event (time-RANGE
    window frame, not a row-count frame)."""
    return rolling_time_sum(
        load_events(spark, sf_dir),
        value_col="value",
        key_col="user_id",
        window_seconds=7 * 86400,
        out_cols=("event_id",),
    )


register(
    "window_rolling_7d",
    q_window_rolling_7d,
    # Both engines frame over the truncated epoch second (FLOOR(epoch)
    # == Spark's timestamp→long cast), so sub-second precision
    # differences (ns parquet vs µs Spark) cannot shift the frame.
    """
    SELECT event_id, ROUND(SUM(value) OVER (
             PARTITION BY user_id
             ORDER BY CAST(FLOOR(epoch(ts)) AS BIGINT)
             RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW), 2
           ) AS rolling_sum
    FROM events
    """,
)


def q_agg_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance: aggregate two disjoint
    halves of lineitem independently (stored table + new batch), then
    merge the partial (count, sum) states — result equals the
    one-shot aggregate, which is what the oracle computes."""
    li = load_table(spark, sf_dir, "lineitem")

    def half(i: int) -> DataFrame:
        return (
            li.where(F.pmod(F.xxhash64("l_orderkey"), F.lit(2)) == i)
            .groupBy("l_returnflag")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.sum("l_quantity").alias("_sum_qty"),
            )
        )

    return merge_partial_aggs(
        half(0), half(1), ["l_returnflag"], "n_rows", "_sum_qty"
    ).select(
        "l_returnflag", "n_rows", F.round("_sum_qty", 2).alias("sum_qty")
    )


register(
    "agg_incremental_merge",
    q_agg_incremental_merge,
    """
    SELECT l_returnflag, COUNT(*) AS n_rows,
           ROUND(SUM(l_quantity), 2) AS sum_qty
    FROM lineitem GROUP BY 1
    """,
)


def q_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-snapshot read: each user's most recent event id (struct
    max — no per-group sort, deterministic tie-break on event_id)."""
    return latest_per_key(
        load_events(spark, sf_dir), ["user_id"], "ts", "event_id"
    )


register(
    "latest_event_per_user",
    q_latest_event_per_user,
    # date_trunc to µs aligns DuckDB's ns precision with Spark's µs;
    # max event_id among max-ts peers == Spark's (ts, event_id)
    # struct max.
    """
    WITH t AS (
      SELECT user_id, date_trunc('microseconds', ts) AS mts, event_id
      FROM events
    ),
    m AS (SELECT user_id, MAX(mts) AS mt FROM t GROUP BY 1)
    SELECT t.user_id, MAX(t.event_id) AS last_event_id
    FROM t JOIN m ON t.user_id = m.user_id AND t.mts = m.mt
    GROUP BY 1
    """,
)


def q_timeseries_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily high-value (>200) event counts per type, densified over
    the full date range with zero-filled gaps."""
    return gap_fill_daily_counts(
        load_events(spark, sf_dir),
        cat_col="event_type",
        ts_col="ts",
        cond=F.col("value") > 200,
    )


register(
    "timeseries_gap_fill",
    q_timeseries_gap_fill,
    """
    WITH b AS (
      SELECT MIN(CAST(ts AS DATE)) AS lo, MAX(CAST(ts AS DATE)) AS hi
      FROM events
    ),
    spine AS (
      SELECT t.event_type, d.day
      FROM (SELECT DISTINCT event_type FROM events) t,
           (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE
              AS day FROM b) d
    ),
    daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
      FROM events WHERE value > 200 GROUP BY 1, 2
    )
    SELECT s.event_type, s.day, COALESCE(n, 0) AS n_events
    FROM spine s LEFT JOIN daily d
      ON s.event_type = d.event_type AND s.day = d.day
    """,
)


def q_window_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-observation-carried-forward: each event carries its user's
    most recent high-value (>200) reading. (ts, event_id) ordering
    makes tie handling deterministic and engine-independent."""
    ev = load_events(spark, sf_dir)
    return forward_fill(
        ev,
        value=F.when(F.col("value") > 200, F.col("value")),
        keys=("user_id",),
        order_cols=("ts", "event_id"),
        out_cols=("event_id",),
        alias="last_spike_value",
    )


register(
    "window_forward_fill",
    q_window_forward_fill,
    # date_trunc to µs aligns DuckDB's ns ordering with Spark's µs;
    # event_id then breaks any remaining tie identically.
    """
    SELECT event_id,
           LAST_VALUE(CASE WHEN value > 200 THEN value END IGNORE NULLS)
             OVER (PARTITION BY user_id
                   ORDER BY date_trunc('microseconds', ts), event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS last_spike_value
    FROM events
    """,
)


def q_agg_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type merged from per-day HLL sketches
    (the persistable sketch-table path). Sketch estimates aren't
    bit-reproducible across engines, so — like ``agg_scale_sketches``
    — the checked output carries the EXACT count plus an error-bound
    boolean (HLL default lgK error ~1.6%; 5% bound) and the oracle
    computes the exact tier with literal TRUEs: a broken sketch or
    merge flips the boolean and hash-fails."""
    ev = load_events(spark, sf_dir)
    est = hll_distinct_rollup(
        ev, ["event_type"], F.to_date("ts").alias("_day"), "user_id"
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_users_exact")
    )
    rel_err = F.abs(
        F.col("distinct_estimate") - F.col("n_users_exact")
    ) / F.col("n_users_exact")
    return exact.join(est, "event_type").select(
        "event_type", "n_users_exact", (rel_err < 0.05).alias("estimate_ok")
    )


register(
    "agg_sketch_rollup",
    q_agg_sketch_rollup,
    """
    SELECT event_type, COUNT(DISTINCT user_id) AS n_users_exact,
           TRUE AS estimate_ok
    FROM events GROUP BY 1
    """,
)


def q_dedup_cluster_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs → transitive clusters: every clustered doc
    labeled with its component's min doc_id (the canonical survivor).
    Spark: iterative hash-min propagation; oracle: recursive CTE.
    (Pinned to ``hashmin`` so both algorithms keep driver evidence —
    ``dedup_cluster_assign_star`` covers the default star scheme.)"""
    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.5)
    return dedup_clusters(pairs, "id_a", "id_b", algorithm="hashmin")


register(
    "dedup_cluster_assign",
    q_dedup_cluster_assign,
    # Transitive closure over the symmetric near-dup edge set; cluster
    # id = LEAST(own id, min reachable id). Reuses the exact-Jaccard
    # pair SQL (the oracle of dedup_ngram_jaccard) as the edge source.
    f"""
    WITH RECURSIVE p AS ({_JACCARD_PAIRS_SQL}),
    edges AS (
      SELECT id_a AS s, id_b AS d FROM p
      UNION
      SELECT id_b, id_a FROM p
    ),
    reach AS (
      SELECT s, d FROM edges
      UNION
      SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
    )
    SELECT s AS doc_id, LEAST(s, MIN(d)) AS cluster_id
    FROM reach GROUP BY s
    """,
)


def q_dedup_cluster_assign_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same cluster assignment via the O(log n)-round
    large-star/small-star scheme (operators/graph.py
    ``connected_components_star``) — the long-diameter scale path
    beside hash-min; identical labels, same recursive-CTE oracle.

    Opts into the hybrid small-graph finish (r6): once the
    checkpointed near-dup edge list measures ≤1M edges it is a
    bounded driver merge (≤16 MB of id pairs), and union-find there
    replaces 4-6 star rounds whose checkpoint barriers dominate at
    that volume. Measured sf0.1 3.4 → 2.3 s — the residual is the
    n-gram pair pipeline itself, which also dominates sf1 (~22 s
    total, CC share now negligible). A real corpus's edge list blows
    past the cap and runs the log-round loop unchanged."""
    from gaming_ai_analytics_spark.operators.graph import (
        connected_components_star,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.5)
    return connected_components_star(
        pairs, "id_a", "id_b", small_graph_max_edges=1_000_000
    ).select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_id")
    )


register(
    "dedup_cluster_assign_star",
    q_dedup_cluster_assign_star,
    oracle_for("dedup_cluster_assign"),
)


def q_stat_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type least-squares fit of value vs hour-of-day —
    diurnal-trend detection with the built-in regression aggregates
    (``regr_slope``/``regr_intercept``/``regr_r2``, Spark 3.5+).

    100 TB shape: single hash aggregate on a low-cardinality key; the
    regression moments (sums, cross-products) combine map-side exactly
    like ``corr``/``covar`` — no window, no second pass."""
    ev = load_events(spark, sf_dir)
    y = F.col("value")
    x = F.hour("ts").cast("double")
    return (
        ev.filter(y.isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.regr_slope(y, x), 6).alias("slope"),
            F.round(F.regr_intercept(y, x), 6).alias("intercept"),
            F.round(F.regr_r2(y, x), 6).alias("r2"),
        )
    )


register(
    "stat_regression",
    q_stat_regression,
    """
    SELECT event_type, COUNT(*) AS n,
           ROUND(regr_slope(value, CAST(date_part('hour', ts) AS DOUBLE)), 6)
             AS slope,
           ROUND(regr_intercept(value, CAST(date_part('hour', ts) AS DOUBLE)), 6)
             AS intercept,
           ROUND(regr_r2(value, CAST(date_part('hour', ts) AS DOUBLE)), 6)
             AS r2
    FROM events WHERE value IS NOT NULL
    GROUP BY event_type
    """,
)


def q_source_lang_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy (nats) of each source's language mix — the
    mixture-diagnostics primitive of corpus curation (a source whose
    language distribution collapses is a crawl bug; one whose entropy
    spikes is a contamination signal).

    100 TB shape: one shuffle on (source, lang) — both low-cardinality
    — then a tiny re-aggregation to sources; the per-source totals
    ride the same small post-shuffle frame, no window over raw rows."""
    docs = load_table(spark, sf_dir, "documents")
    c = (
        docs.filter(F.col("lang").isNotNull())
        .groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    t = c.groupBy("source").agg(F.sum("c").alias("n"))
    p = F.col("c") / F.col("n")
    return (
        c.join(t, "source")
        .groupBy("source")
        .agg(
            F.max("n").alias("n_docs"),
            F.count(F.lit(1)).alias("n_langs"),
            F.round(-F.sum(p * F.log(p)), 6).alias("entropy_nats"),
        )
    )


register(
    "source_lang_entropy",
    q_source_lang_entropy,
    """
    WITH c AS (
      SELECT source, lang, COUNT(*) AS c
      FROM documents WHERE lang IS NOT NULL
      GROUP BY 1, 2
    ),
    t AS (SELECT source, SUM(c) AS n FROM c GROUP BY 1)
    SELECT c.source, CAST(MAX(n) AS BIGINT) AS n_docs, COUNT(*) AS n_langs,
           ROUND(-SUM((c * 1.0 / n) * LN(c * 1.0 / n)), 6) AS entropy_nats
    FROM c JOIN t USING (source)
    GROUP BY c.source
    """,
)


def q_event_path_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov path analysis: per-user consecutive event-type
    transitions with the conditional share of each next step — the
    "where do users go after X" primitive behind journey/sankey views.

    100 TB shape: the lead() window shuffles once on user_id (bounded
    per-user state), then the transition counts aggregate onto a
    |types|² frame; the share window runs on that tiny aggregate,
    never the event stream."""
    from pyspark.sql import Window

    ev = load_events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
    )
    trans = (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    share = F.col("n") / F.sum("n").over(Window.partitionBy("prev_type"))
    return trans.select(
        "prev_type", "next_type", "n", F.round(share, 6).alias("share")
    )


register(
    "event_path_transitions",
    q_event_path_transitions,
    """
    WITH seq AS (
      SELECT event_type AS prev_type,
             LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS next_type
      FROM events
    ),
    t AS (
      SELECT prev_type, next_type, COUNT(*) AS n
      FROM seq WHERE next_type IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT prev_type, next_type, n,
           ROUND(n * 1.0 / SUM(n) OVER (PARTITION BY prev_type), 6) AS share
    FROM t
    """,
)


def q_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier profile per event type: median, MAD (median
    absolute deviation), and how many events sit beyond the
    3σ-equivalent robust fence (3 · 1.4826 · MAD) — the
    contamination-resistant twin of ``anomaly_zscore`` (one planted
    spike cannot move the fence the way it moves a stddev).

    100 TB shape: two grouped exact medians + one counting pass, all
    shuffling only on the low-cardinality type key with the tiny
    median frames broadcast back; swap ``percentile`` for
    ``percentile_approx`` at scale (same plan shape), as with the
    other exact-median oracle tiers."""
    from pyspark.sql.functions import broadcast

    ev = load_events(spark, sf_dir).filter(F.col("value").isNotNull())
    med = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    dev = ev.join(broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.percentile("adev", F.lit(0.5)).alias("mad")
    )
    fence = F.lit(3 * 1.4826) * F.col("mad")
    return (
        dev.join(broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.max("med"), 6).alias("med"),
            F.round(F.max("mad"), 6).alias("mad"),
            F.sum((F.col("adev") > fence).cast("long")).alias("n_outliers"),
        )
    )


register(
    "anomaly_mad",
    q_anomaly_mad,
    """
    WITH ev AS (
      SELECT event_type, value FROM events WHERE value IS NOT NULL
    ),
    med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM ev GROUP BY 1
    ),
    d AS (
      SELECT ev.event_type, ABS(ev.value - med.med) AS adev, med.med
      FROM ev JOIN med USING (event_type)
    ),
    mad AS (
      SELECT event_type, quantile_cont(adev, 0.5) AS mad FROM d GROUP BY 1
    )
    SELECT d.event_type, COUNT(*) AS n,
           ROUND(MAX(d.med), 6) AS med,
           ROUND(MAX(mad.mad), 6) AS mad,
           CAST(SUM(CASE WHEN d.adev > 3 * 1.4826 * mad.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM d JOIN mad USING (event_type)
    GROUP BY 1
    """,
)


def q_dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end near-dup REMOVAL pass: pairs → transitive
    clusters → keep one canonical doc per cluster plus every
    unclustered doc — the actual corpus a dedup stage emits, with the
    keep reason for auditability (``canonical`` = won its cluster,
    ``unique`` = never matched anything).

    100 TB shape: the cluster frame is tiny relative to the corpus
    (only docs that matched something), so the final step is a
    broadcast left anti/semi composition on doc_id — the full corpus
    shuffles zero times past the pair generation it already paid."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.5)
    clusters = dedup_clusters(pairs, "id_a", "id_b")
    losers = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select(
        "doc_id"
    )
    winners = clusters.filter(F.col("doc_id") == F.col("cluster_id")).select(
        "doc_id"
    )
    kept = docs.join(F.broadcast(losers), "doc_id", "left_anti")
    reason = F.when(
        F.col("is_canon").isNotNull(), F.lit("canonical")
    ).otherwise(F.lit("unique"))
    return (
        kept.join(
            F.broadcast(winners.withColumn("is_canon", F.lit(1))),
            "doc_id",
            "left",
        )
        .select("doc_id", "lang", "source", reason.alias("keep_reason"))
    )


register(
    "dedup_survivors",
    q_dedup_survivors,
    f"""
    WITH RECURSIVE p AS ({_JACCARD_PAIRS_SQL}),
    edges AS (
      SELECT id_a AS s, id_b AS d FROM p
      UNION
      SELECT id_b, id_a FROM p
    ),
    reach AS (
      SELECT s, d FROM edges
      UNION
      SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
    ),
    clusters AS (
      SELECT s AS doc_id, LEAST(s, MIN(d)) AS cluster_id
      FROM reach GROUP BY s
    )
    SELECT d.doc_id, d.lang, d.source,
           CASE WHEN c.doc_id IS NOT NULL THEN 'canonical'
                ELSE 'unique' END AS keep_reason
    FROM documents d
    LEFT JOIN clusters c
      ON d.doc_id = c.doc_id AND c.doc_id = c.cluster_id
    WHERE d.doc_id NOT IN (
      SELECT doc_id FROM clusters WHERE doc_id <> cluster_id
    )
    """,
)


def q_trending_daily_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 event types per day by volume — the trending/leaderboard
    window pattern. One shuffle onto the (day, type) aggregate, then
    the rank window runs on the aggregated frame (365 × |types| rows),
    never the raw stream."""
    from pyspark.sql import Window

    ev = load_events(spark, sf_dir)
    daily = (
        ev.groupBy(
            F.date_trunc("day", F.col("ts")).alias("day"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("day").orderBy(F.desc("n"), "event_type")
    return (
        daily.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select(F.to_date("day").alias("day"), "rank", "event_type", "n")
    )


register(
    "trending_daily_topk",
    q_trending_daily_topk,
    """
    WITH daily AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT day, rank, event_type, n
    FROM (SELECT *, CAST(ROW_NUMBER() OVER (
                      PARTITION BY day ORDER BY n DESC, event_type)
                    AS INT) AS rank
          FROM daily)
    WHERE rank <= 3
    """,
)


def q_weekly_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU and trailing-7-day WAU per day — the activity dashboard
    pair. The rolling distinct is NOT a range join: each (day, user)
    pair map-expands to the ≤7 report days it supports (explode of a
    7-element sequence), then one distinct-count shuffle per day —
    the formulation that stays linear at 100 TB, with the HLL sketch
    rollup (``agg_sketch_rollup``) as the approximate drop-in when
    exact distincts stop fitting."""
    ev = load_events(spark, sf_dir)
    pairs = ev.select(
        F.to_date("ts").alias("day"), "user_id"
    ).distinct()
    # single-reference shape (late-r5 audit: the previous
    # spine/dau/wau branches referenced `pairs` three times and the
    # plan scanned events three times — cross-branch exchange reuse is
    # not guaranteed): keep the ORIGIN day through the expansion, then
    # ONE grouped pass derives DAU (distinct users whose origin day IS
    # the report day), WAU (all distinct users supporting the day),
    # and the spine membership (a day reports only if some pair
    # originated on it) together.
    expanded = pairs.select(
        "day",
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
        ).alias("day_w"),
        "user_id",
    )
    # pairs is distinct per (day, user), so DAU is a PLAIN conditional
    # sum — only WAU needs a distinct, keeping the aggregate on the
    # no-Expand single-distinct path (see agg_scale_sketches for why
    # multi-distinct Expand is poison at scale)
    return (
        expanded.groupBy("day_w")
        .agg(
            F.sum(
                F.when(F.col("day") == F.col("day_w"), 1).otherwise(0)
            ).alias("dau"),
            F.countDistinct("user_id").alias("wau"),
        )
        .filter(F.col("dau") > 0)
        .select(F.col("day_w").alias("day"), "dau", "wau")
    )


register(
    "weekly_active_users",
    q_weekly_active_users,
    """
    WITH pairs AS (
      SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day, user_id
      FROM events
    ),
    spine AS (SELECT DISTINCT day FROM pairs),
    expanded AS (
      SELECT day + CAST(i AS INT) AS day_w, user_id
      FROM pairs, (SELECT unnest(generate_series(0, 6)) AS i)
    ),
    wau AS (
      SELECT day_w AS day, COUNT(DISTINCT user_id) AS wau
      FROM expanded WHERE day_w IN (SELECT day FROM spine)
      GROUP BY 1
    ),
    dau AS (
      SELECT day, COUNT(DISTINCT user_id) AS dau FROM pairs GROUP BY 1
    )
    SELECT day, dau, wau FROM dau JOIN wau USING (day)
    """,
)


def q_user_lifetime_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user lifetime profile: event volume, total value, active
    days, first/last day, tenure span and intensity — the LTV frame
    every engagement model trains on. One shuffle on user_id; every
    statistic partial-aggregates map-side (the distinct-day count
    rides the same shuffle as a two-level agg)."""
    ev = load_events(spark, sf_dir)
    day = F.to_date("ts")
    per = (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.countDistinct(day).alias("n_active_days"),
            F.min(day).alias("first_day"),
            F.max(day).alias("last_day"),
        )
    )
    span = F.datediff(F.col("last_day"), F.col("first_day")) + 1
    return per.select(
        "user_id",
        "n_events",
        "total_value",
        "n_active_days",
        "first_day",
        "last_day",
        span.cast("int").alias("span_days"),
        F.round(F.col("n_events") / F.col("n_active_days"), 4).alias(
            "events_per_active_day"
        ),
    )


register(
    "user_lifetime_value",
    q_user_lifetime_value,
    """
    WITH per AS (
      SELECT user_id, COUNT(*) AS n_events,
             ROUND(SUM(value), 2) AS total_value,
             COUNT(DISTINCT CAST(date_trunc('day', ts) AS DATE))
               AS n_active_days,
             MIN(CAST(date_trunc('day', ts) AS DATE)) AS first_day,
             MAX(CAST(date_trunc('day', ts) AS DATE)) AS last_day
      FROM events GROUP BY 1
    )
    SELECT user_id, n_events, total_value, n_active_days, first_day,
           last_day,
           CAST(last_day - first_day + 1 AS INT) AS span_days,
           ROUND(n_events * 1.0 / n_active_days, 4)
             AS events_per_active_day
    FROM per
    """,
)


def q_recursive_cte_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 ``WITH RECURSIVE``) — an acyclic
    day-spine recursion joined to daily event counts, the SQL-language
    twin of :func:`timeseries_gap_fill` (which stays the scale path:
    ``sequence`` + explode is one map-side expression, while recursion
    executes one iteration per day).  The anchor computes (min, max)
    day in one aggregate; recursion walks forward until the max, so
    depth = calendar span, data-driven, with no UNION-distinct state
    (Spark's recursion supports UNION ALL only — cyclic reachability
    stays on operators/graph.py's iterative schemes).  Tables bind via
    ``parquet.`path``` so concurrent scale factors never race on view
    names; the event-time cast goes through the same micro-precision
    normalization contract as every events reader."""
    ev = load_events(spark, sf_dir)
    view = f"_spine_events_{abs(hash(sf_dir)) % 10**8}"
    ev.select(F.to_date("ts").alias("d")).createOrReplaceTempView(view)
    # resolve against the view's OWN session — temp views are
    # per-session, so bind the SQL to the DataFrame's session
    return ev.sparkSession.sql(
        f"""
        WITH RECURSIVE spine(day, dmax) AS (
          SELECT MIN(d), MAX(d) FROM {view}
          UNION ALL
          SELECT DATE_ADD(day, 1), dmax FROM spine WHERE day < dmax
        )
        SELECT s.day, COALESCE(c.n, 0) AS n_events
        FROM spine s
        LEFT JOIN (SELECT d, COUNT(*) AS n FROM {view} GROUP BY d) c
          ON s.day = c.d
        """
    )


register(
    "recursive_cte_spine",
    q_recursive_cte_spine,
    """
    WITH RECURSIVE spine(day, dmax) AS (
      SELECT MIN(CAST(ts AS DATE)), MAX(CAST(ts AS DATE)) FROM events
      UNION ALL
      SELECT day + 1, dmax FROM spine WHERE day < dmax
    )
    SELECT s.day, COALESCE(c.n, 0) AS n_events
    FROM spine s
    LEFT JOIN (SELECT CAST(ts AS DATE) AS d, COUNT(*) AS n
               FROM events GROUP BY 1) c
      ON s.day = c.d
    """,
)


def q_window_value_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric RANGE frame — value-bounded window peers (all orders
    within ±1000 of each row's total price, per status): the frame
    Spark sizes by ORDER-BY VALUE distance, not row offsets — the
    missing tier between ROWS frames (`window_running_sum`) and
    time-RANGE frames (`window_rolling_7d`).  One status-keyed
    shuffle + sort; the frame scan is the classic sliding two-pointer
    over the sorted run, linear per partition."""
    orders = load_table(spark, sf_dir, "orders")
    from pyspark.sql import Window

    # Frame over INTEGER cents: double frame bounds are engine-
    # formulation-sensitive at the edges ((v-x) <= b vs v <= x+b differ
    # in the last ulp), so the ORDER BY value is exact cents and the
    # band is ±25000 cents. DECIMAL sums keep the frame aggregate
    # order-insensitive before the final double division. Frame
    # population grows with data at a fixed band — at real scale
    # pre-bucket the value axis (the `token_length_histogram` shape)
    # instead of widening the band.
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
    w = (
        Window.partitionBy("o_orderstatus")
        .orderBy(cents)
        .rangeBetween(-25000, 25000)
    )
    dec = F.col("o_totalprice").cast("decimal(18,2)")
    return orders.select(
        "o_orderkey",
        "o_orderstatus",
        F.count(F.lit(1)).over(w).alias("n_price_peers"),
        # exact 2-decimal total (no division: a divided average can
        # land on a .xx5 knife edge where the engines' ROUND-half
        # conventions differ)
        F.sum(dec).over(w).cast("double").alias("peer_price_total"),
    )


register(
    "window_value_range_frame",
    q_window_value_range_frame,
    """
    SELECT o_orderkey, o_orderstatus,
           COUNT(*) OVER w AS n_price_peers,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w
                AS DOUBLE) AS peer_price_total
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus
                 ORDER BY CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
                 RANGE BETWEEN 25000 PRECEDING AND 25000 FOLLOWING)
    """,
)


def q_order_aging_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-function toolkit — ``months_between`` /
    ``last_day`` / ``date_trunc('quarter')``: order aging against a
    fixed as-of date, bucketed by quarter with month-end anchors.
    All map-only codegen'd date arithmetic; one tiny-key aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    asof = F.to_timestamp(F.lit("2001-09-01"))
    return (
        orders.select(
            F.to_date(
                F.date_trunc("quarter", "o_orderdate")
            ).alias("order_quarter"),
            F.last_day("o_orderdate").alias("_month_end"),
            F.round(
                F.months_between(asof, F.col("o_orderdate")), 1
            ).alias("_age_months"),
        )
        .groupBy("order_quarter")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.avg("_age_months"), 2).alias("avg_age_months"),
            F.count_distinct(F.col("_month_end")).alias("n_month_ends"),
        )
    )


register(
    "order_aging_report",
    q_order_aging_report,
    """
    SELECT CAST(DATE_TRUNC('quarter', o_orderdate) AS DATE)
               AS order_quarter,
           COUNT(*) AS n_orders,
           -- Spark months_between vs 2001-09-01 (day=1, midnight):
           -- whole calendar months + (1 - day)/31, rounded to 1
           ROUND(AVG(ROUND(
               (2001 * 12 + 9)
               - (EXTRACT(year FROM o_orderdate) * 12
                  + EXTRACT(month FROM o_orderdate))
               + (1 - EXTRACT(day FROM o_orderdate)) / 31.0, 1)), 2)
               AS avg_age_months,
           COUNT(DISTINCT LAST_DAY(CAST(o_orderdate AS DATE)))
               AS n_month_ends
    FROM orders
    GROUP BY 1
    """,
)


def q_pareto_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto (cumulative-concentration) report: suppliers ranked by
    revenue with each one's running share of the total — the
    "which 20% carry 80%" analysis. Top-20 emitted; the shares still
    reflect the WHOLE population.

    Scale shape (VERDICT r7 ask #5 — the r4 form ran one unpartitioned
    ordered window over the full |suppliers| relation, the last
    unbounded-cardinality single-partition window in the registry):
    only the DENOMINATOR needs the whole population, so the plan never
    sorts it globally.  One fact aggregation (map-side combined) feeds
    two branches off the SAME exchange (ReusedExchange — one lineitem
    scan): a 1-row grand total, broadcast back, and a
    TakeOrderedAndProject top-20 (per-partition heaps, no shuffle
    sort).  The rank/running-share window then runs over the 20-row
    post-limit frame — unpartitioned, but bounded by construction at
    the emitted k, the same bounded-window class as the chi-square
    marginals.  Plan-pinned in tests/test_analytics_plans.py: the
    window's child is the limit, and the exchange is reused."""
    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "_rev"
        )
    )
    total = rev.agg(F.sum("_rev").alias("_tot"))
    top = rev.orderBy(F.col("_rev").desc(), "l_suppkey").limit(20)
    w_ord = Window.orderBy(F.col("_rev").desc(), "l_suppkey")
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return top.crossJoin(F.broadcast(total)).select(
        F.row_number().over(w_ord).alias("rank"),
        "l_suppkey",
        F.round("_rev", 2).alias("revenue"),
        F.round(F.sum("_rev").over(w_cum) / F.col("_tot"), 6).alias(
            "cum_share"
        ),
    )


register(
    "pareto_revenue_share",
    q_pareto_revenue_share,
    """
    WITH rev AS (
      SELECT l_suppkey,
             SUM(l_extendedprice * (1 - l_discount)) AS _rev
      FROM lineitem GROUP BY 1)
    SELECT rank, l_suppkey, revenue, cum_share
    FROM (
      SELECT ROW_NUMBER() OVER (ORDER BY _rev DESC, l_suppkey) AS rank,
             l_suppkey, ROUND(_rev, 2) AS revenue,
             ROUND(SUM(_rev) OVER (ORDER BY _rev DESC, l_suppkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   / SUM(_rev) OVER (), 6) AS cum_share
      FROM rev)
    WHERE rank <= 20
    """,
)


def q_chisq_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence screen between two corpus dimensions
    (language × source) — the statistical QA a training-mix owner
    runs to detect coupled ingest (a source that only contributes one
    language skews the mixture solver). Observed counts from one
    grouped pass; the contingency table is then DENSIFIED — the
    |langs|×|sources| cross of the marginal relations — so an absent
    (lang, source) cell contributes its full (0−E)²/E = E mass to the
    Pearson sum (summing observed cells only understates χ² exactly
    when the table is sparse, the regime where independence breaks).
    Both marginals and the cross product are aggregate-sized; the
    corpus is scanned once. Output is the statistic, the dense and
    observed cell counts, and the table's degrees of freedom — the
    consumer compares against their chosen critical value."""
    docs = load_table(spark, sf_dir, "documents")
    obs = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n")
    )
    lt = obs.groupBy("lang").agg(F.sum("n").alias("_lt"))
    st = obs.groupBy("source").agg(F.sum("n").alias("_st"))
    # dense grid = marginal × marginal (both |dim|-sized); observed
    # counts re-attach null-safely (a NULL lang is a real category)
    dense = lt.crossJoin(F.broadcast(st))
    # rename the observed side — dense and obs share lineage, so a
    # direct self-join on the natural names is ambiguous
    obs_r = obs.select(
        F.col("lang").alias("_ol"), F.col("source").alias("_os"), "n"
    )
    cells = dense.join(
        obs_r,
        F.col("lang").eqNullSafe(F.col("_ol"))
        & F.col("source").eqNullSafe(F.col("_os")),
        "left",
    ).select(
        "lang",
        "source",
        F.coalesce(F.col("n"), F.lit(0)).alias("n"),
        (
            F.col("_lt")
            * F.col("_st")
            / F.sum("_lt").over(Window.partitionBy("source"))
        ).alias("_exp"),
    )
    return cells.agg(
        F.round(
            F.sum(F.pow(F.col("n") - F.col("_exp"), 2) / F.col("_exp")), 4
        ).alias("chi2"),
        F.count(F.lit(1)).alias("n_cells"),
        F.sum(F.when(F.col("n") > 0, 1).otherwise(0)).alias("n_obs_cells"),
        # dof counts categories NULL-INCLUSIVELY: the densified table
        # treats a NULL lang/source as a real category (it contributes
        # cells, marginals, and expected mass), and countDistinct
        # ignores NULLs — without the correction the reported dof
        # would be inconsistent with the table the statistic was
        # computed over (ADVICE r6). Oracle mirrors the same term.
        (
            (
                F.countDistinct("lang")
                + F.max(F.when(F.col("lang").isNull(), 1).otherwise(0))
                - 1
            )
            * (
                F.countDistinct("source")
                + F.max(F.when(F.col("source").isNull(), 1).otherwise(0))
                - 1
            )
        ).alias("dof"),
    )


register(
    "chisq_lang_source",
    q_chisq_lang_source,
    """
    WITH obs AS (
      SELECT lang, source, COUNT(*) AS n
      FROM documents GROUP BY 1, 2),
    lt AS (SELECT lang, SUM(n) AS _lt FROM obs GROUP BY 1),
    st AS (SELECT source, SUM(n) AS _st FROM obs GROUP BY 1),
    gt AS (SELECT SUM(n) AS _gt FROM obs),
    cells AS (
      SELECT lt.lang, st.source, COALESCE(o.n, 0) AS n,
             _lt * _st * 1.0 / _gt AS _exp
      FROM lt CROSS JOIN st CROSS JOIN gt
      LEFT JOIN obs o
        ON lt.lang IS NOT DISTINCT FROM o.lang
       AND st.source IS NOT DISTINCT FROM o.source)
    SELECT ROUND(SUM(POW(n - _exp, 2) / _exp), 4) AS chi2,
           COUNT(*) AS n_cells,
           CAST(SUM(CASE WHEN n > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_obs_cells,
           (COUNT(DISTINCT lang)
              + MAX(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) - 1)
             * (COUNT(DISTINCT source)
                  + MAX(CASE WHEN source IS NULL THEN 1 ELSE 0 END) - 1)
             AS dof
    FROM cells
    """,
)


# --------------------------------------------------------------------------
# PageRank over the supplier↔customer trade graph
# --------------------------------------------------------------------------
def q_pagerank_trade_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 trade-graph nodes by weighted PageRank: suppliers and
    customers are the nodes, each lineitem's (supplier → ordering
    customer) relationship an edge weighted by lineitem count,
    symmetrized so both sides emit and receive rank (no dangling
    mass). Five fixed power-iteration rounds — deterministic, so the
    oracle replays the identical computation as five unrolled SQL
    CTEs and the result is value-hash-checked end to end (unlike the
    convergence-stopped connected-components twin, which carries a
    weaker contract). Ranks round at 9 dp and order by the ROUNDED
    rank (ties broken on the node key), so the top-20 set is stable
    against last-ulp summation-order drift in either engine."""
    from gaming_ai_analytics_spark.operators.graph import pagerank

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey"
    )
    pairs = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("l_suppkey", "o_custkey")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    fwd = pairs.select(
        F.concat(F.lit("s"), F.col("l_suppkey")).alias("src"),
        F.concat(F.lit("c"), F.col("o_custkey")).alias("dst"),
        "w",
    )
    edges = fwd.unionByName(
        fwd.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"), "w"
        )
    )
    pr = pagerank(edges, "src", "dst", "w", iterations=5)
    return (
        pr.select("node", F.round("r", 9).alias("rank"))
        .orderBy(F.desc("rank"), "node")
        .limit(20)
    )


def _pagerank_oracle(iters: int = 5) -> str:
    """Unrolled power-iteration oracle: literals written as
    ``(1.0 - 0.85)`` (not 0.15) so both engines compute the teleport
    constant from the SAME IEEE operations."""
    its = []
    prev = "it0"
    for k in range(1, iters + 1):
        its.append(f"""
    it{k} AS (
      SELECT n.node,
             (1.0 - 0.85) / (SELECT n FROM nn)
             + 0.85 * COALESCE(c.c, 0) AS r
      FROM nodes n LEFT JOIN (
        SELECT e.dst AS node, SUM(p.r * e.p) AS c
        FROM enorm e JOIN {prev} p ON e.src = p.node
        GROUP BY 1) c ON n.node = c.node)""")
        prev = f"it{k}"
    return f"""
    WITH pairs AS (
      SELECT l_suppkey AS sk, o_custkey AS ck, COUNT(*) AS w
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY 1, 2),
    edges AS (
      SELECT 's' || sk AS src, 'c' || ck AS dst, w FROM pairs
      UNION ALL
      SELECT 'c' || ck AS src, 's' || sk AS dst, w FROM pairs),
    wsum AS (SELECT src, SUM(w) AS ws FROM edges GROUP BY 1),
    enorm AS (SELECT e.src, e.dst, e.w * 1.0 / w2.ws AS p
              FROM edges e JOIN wsum w2 ON e.src = w2.src),
    nodes AS (SELECT DISTINCT src AS node FROM edges
              UNION SELECT DISTINCT dst FROM edges),
    nn AS (SELECT COUNT(*) AS n FROM nodes),
    it0 AS (SELECT node, 1.0 / (SELECT n FROM nn) AS r FROM nodes),
    {",".join(its)}
    SELECT node, ROUND(r, 9) AS rank FROM {prev}
    ORDER BY rank DESC, node LIMIT 20
    """


register("pagerank_trade_graph", q_pagerank_trade_graph, _pagerank_oracle())


# --------------------------------------------------------------------------
# Market-basket mining: a-priori-pruned frequent co-occurrence pairs
# --------------------------------------------------------------------------
_ITEMSET_MIN_SUPPORT = 2  # pair AND item floor (a-priori: pair ⊆ item)
_ITEMSET_MAX_BASKET = 50  # skew guard: a giant basket is O(k²) pairs


def q_frequent_itemset_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 co-purchased part pairs with support and lift — the
    frequent-itemset pass (Agrawal & Srikant's a-priori at k=2) every
    recommendation / co-occurrence pipeline runs over basket data.

    Scale shape: the naive plan self-joins the fact on the basket key
    — O(k²) rows per basket BEFORE any pruning, and the pair-count
    shuffle carries all of them. This plan prunes first and never
    joins: (1) item supports ride a window count over the partkey
    exchange; (2) the a-priori rule (a pair's support ≤ either item's
    support) drops infrequent items BEFORE pair generation — on a
    Zipfian catalog that is most of the long tail; (3) baskets above
    ``_ITEMSET_MAX_BASKET`` frequent items are excluded outright
    (documented skew guard, mirrored in the oracle — a single
    pathological basket otherwise contributes C(k,2) pairs); (4) pair
    generation is a map-side array higher-order function over the
    per-basket sorted item array (codegen, no join, no Python), so
    the only shuffles are the two aggregations and the basket
    regroup. Item supports travel INSIDE the basket array as struct
    fields, so lift needs no post-join against a support table; the
    total-basket scalar joins as a broadcast 1-row frame. Pairs
    emerge (part_a < part_b) from the sorted array — each unordered
    pair exactly once. The total-basket scalar deliberately RE-SCANS
    the fact as a single-column pruned pass (justified 1-ref stat
    frame in the plan audit): measured at sf1, sharing one
    materialization via localCheckpoint costs 3.4 s to write + 1.6 s
    to re-read (two longs × 6 M rows) while the pruned rescan +
    partial-agg countDistinct is ~1 s — the checkpoint only wins once
    the scan itself dominates, and a 2-column fact projection at this
    width never does. Plan A/B at sf1 (warm, fresh lineage per run):
    this window plan 6.4 s; the groupBy-support + join-probe variant
    7.4–8.3 s (the broadcast join re-widens the fact before the
    basket regroup); DuckDB oracle 1.37 s — the residual is the
    multi-stage toy-scale floor (basket regroup + 12 M-row pair
    explode), not a shuffle the plan can drop.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    items = li.distinct()
    supported = items.withColumn(
        "item_support",
        F.count(F.lit(1)).over(Window.partitionBy("l_partkey")),
    )
    frequent = supported.filter(
        F.col("item_support") >= _ITEMSET_MIN_SUPPORT
    )
    baskets = (
        frequent.groupBy("l_orderkey")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("l_partkey", "item_support"))
            ).alias("items")
        )
        .filter(
            (F.size("items") >= 2)
            & (F.size("items") <= _ITEMSET_MAX_BASKET)
        )
    )
    arr = F.col("items")
    pairs = baskets.select(
        F.explode(
            F.flatten(
                F.transform(
                    arr,
                    lambda x, i: F.transform(
                        F.slice(arr, i + F.lit(2), F.size(arr)),
                        lambda y: F.struct(
                            x.alias("pa"), y.alias("pb")
                        ),
                    ),
                )
            )
        ).alias("pr")
    )
    counted = (
        pairs.groupBy(
            F.col("pr.pa.l_partkey").alias("part_a"),
            F.col("pr.pb.l_partkey").alias("part_b"),
            F.col("pr.pa.item_support").alias("support_a"),
            F.col("pr.pb.item_support").alias("support_b"),
        )
        .agg(F.count(F.lit(1)).alias("pair_support"))
        .filter(F.col("pair_support") >= _ITEMSET_MIN_SUPPORT)
    )
    # single-column pruned rescan — see the docstring's measured trade
    n_baskets = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey")
        .agg(F.countDistinct("l_orderkey").alias("n_baskets"))
    )
    return (
        counted.crossJoin(F.broadcast(n_baskets))
        .select(
            "part_a",
            "part_b",
            "pair_support",
            "support_a",
            "support_b",
            F.round(
                (F.col("pair_support") * F.col("n_baskets"))
                / (F.col("support_a") * F.col("support_b")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("pair_support"), "part_a", "part_b")
        .limit(100)
    )


register(
    "frequent_itemset_pairs",
    q_frequent_itemset_pairs,
    """
    WITH items AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    nb AS (SELECT COUNT(DISTINCT o) AS n FROM items),
    s AS (SELECT p, COUNT(*) AS c FROM items GROUP BY 1),
    freq AS (SELECT i.o, i.p, s.c FROM items i JOIN s ON i.p = s.p
             WHERE s.c >= 2),
    sized AS (SELECT o FROM freq GROUP BY o
              HAVING COUNT(*) BETWEEN 2 AND 50),
    pairs AS (
      SELECT a.p AS part_a, b.p AS part_b,
             a.c AS support_a, b.c AS support_b,
             COUNT(*) AS pair_support
      FROM freq a
      JOIN freq b ON a.o = b.o AND a.p < b.p
      JOIN sized ON a.o = sized.o
      GROUP BY 1, 2, 3, 4)
    SELECT part_a, part_b, pair_support, support_a, support_b,
           ROUND((pair_support * (SELECT n FROM nb))
                 / (support_a * support_b), 6) AS lift
    FROM pairs WHERE pair_support >= 2
    ORDER BY pair_support DESC, part_a, part_b LIMIT 100
    """,
)


# --------------------------------------------------------------------------
# Triangle counting over the hot-part co-purchase graph
# --------------------------------------------------------------------------
_TRIANGLE_HOT_SUPPORT = 40  # node set: parts in ≥40 baskets


def q_triangle_count_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 parts by triangle participation in the co-purchase
    graph (nodes = parts appearing in ≥``_TRIANGLE_HOT_SUPPORT``
    baskets, edges = co-occurrence in at least one basket) — the
    clustering-structure probe behind community/cohesion analyses.

    The counting itself is :func:`operators.graph.triangle_counts`
    (Suri–Vassilvitskii degree-ordered orientation, wedge volume
    bounded O(m^1.5) under any skew). Edge derivation reuses the
    basket-array pattern from ``frequent_itemset_pairs``: hot-item
    filter via a window count on the partkey exchange, per-basket
    sorted array, map-side HOF pair expansion (each undirected edge
    emerges part_a < part_b), then DISTINCT — so the graph build is
    two shuffles and the guard against pathological baskets is the
    same mirrored ``BETWEEN 2 AND 50`` size window. The oracle
    enumerates each triangle once as a < b < c over the identical
    edge set — orientation-free, so it cross-checks the oriented
    plan's dedup-by-construction claim, not just its arithmetic.
    """
    from gaming_ai_analytics_spark.operators.graph import triangle_counts

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    items = li.distinct()
    hot = items.withColumn(
        "_sup", F.count(F.lit(1)).over(Window.partitionBy("l_partkey"))
    ).filter(F.col("_sup") >= _TRIANGLE_HOT_SUPPORT)
    baskets = (
        hot.groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_list("l_partkey")).alias("items"))
        .filter(
            (F.size("items") >= 2)
            & (F.size("items") <= _ITEMSET_MAX_BASKET)
        )
    )
    arr = F.col("items")
    edges = baskets.select(
        F.explode(
            F.flatten(
                F.transform(
                    arr,
                    lambda x, i: F.transform(
                        F.slice(arr, i + F.lit(2), F.size(arr)),
                        lambda y: F.struct(
                            x.alias("pa"), y.alias("pb")
                        ),
                    ),
                )
            )
        ).alias("e")
    ).select("e.pa", "e.pb").distinct()
    return (
        triangle_counts(edges, "pa", "pb")
        .select(F.col("node").alias("part"), "triangles")
        .orderBy(F.desc("triangles"), "part")
        .limit(20)
    )


register(
    "triangle_count_parts",
    q_triangle_count_parts,
    """
    WITH items AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    s AS (SELECT p, COUNT(*) AS c FROM items GROUP BY 1),
    hot AS (SELECT i.o, i.p FROM items i JOIN s ON i.p = s.p
            WHERE s.c >= 40),
    sized AS (SELECT o FROM hot GROUP BY o
              HAVING COUNT(*) BETWEEN 2 AND 50),
    edges AS (
      SELECT DISTINCT a.p AS pa, b.p AS pb
      FROM hot a
      JOIN hot b ON a.o = b.o AND a.p < b.p
      JOIN sized ON a.o = sized.o),
    tri AS (
      SELECT e1.pa AS a, e1.pb AS b, e2.pb AS c
      FROM edges e1
      JOIN edges e2 ON e1.pb = e2.pa
      JOIN edges e3 ON e3.pa = e1.pa AND e3.pb = e2.pb),
    corners AS (
      SELECT a AS part FROM tri
      UNION ALL SELECT b FROM tri
      UNION ALL SELECT c FROM tri)
    SELECT part, COUNT(*) AS triangles FROM corners GROUP BY 1
    ORDER BY triangles DESC, part LIMIT 20
    """,
)


# --------------------------------------------------------------------------
# Sketch-based audience overlap (HLL inclusion-exclusion)
# --------------------------------------------------------------------------
_OVERLAP_TOL = 0.05  # sketch estimate must land within ±5% of exact


def q_audience_overlap_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise user-audience overlap between event types, estimated
    from mergeable HLL sketches by inclusion-exclusion
    (|A∩B| = est(A) + est(B) − est(A∪B), Flajolet et al. 2007 /
    the Apache DataSketches formulation Spark 3.5+ ships as
    ``hll_sketch_agg`` / ``hll_union`` / ``hll_sketch_estimate``) —
    the 100 TB answer to "how much do these segments share" without
    ever shuffling user-level rows per pair.

    Contract query (the `dedup_embedding_lsh` pattern): the sketch
    path CANNOT be value-hash-checked directly (DuckDB has no
    DataSketches HLL), so the query also computes the exact overlap
    and emits ``(pair, overlap_exact, sketch_ok)`` where ``sketch_ok``
    asserts the estimate landed within ±5% of exact; the oracle
    re-derives the exact overlap and a literal TRUE. At fixture scale
    the sketch is in sparse mode and near-exact; the tolerance covers
    the dense-mode ~1.6% RSE (lgK=12) with headroom. Scale shape: the
    distinct (type, user) relation is localCheckpoint-ed (one source
    scan), sketches reduce it to one row per type (map-side
    combinable), and only the CONTRACT needs the user-level exact
    self-join — production reads the per-type sketch table alone,
    O(types²) work on kilobyte states.
    """
    ev = load_events(spark, sf_dir).select("event_type", "user_id")
    d = ev.distinct().localCheckpoint()
    per = d.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk"),
        F.count(F.lit(1)).alias("n"),
    )
    a, b = per.alias("a"), per.alias("b")
    est = (
        a.join(b, F.col("a.event_type") < F.col("b.event_type"))
        .select(
            F.col("a.event_type").alias("type_a"),
            F.col("b.event_type").alias("type_b"),
            (
                F.hll_sketch_estimate(F.col("a.sk"))
                + F.hll_sketch_estimate(F.col("b.sk"))
                - F.hll_sketch_estimate(
                    F.hll_union(F.col("a.sk"), F.col("b.sk"))
                )
            ).alias("overlap_est"),
        )
    )
    x, y = d.alias("x"), d.alias("y")
    exact = (
        x.join(
            y,
            (F.col("x.user_id") == F.col("y.user_id"))
            & (F.col("x.event_type") < F.col("y.event_type")),
        )
        .groupBy(
            F.col("x.event_type").alias("type_a"),
            F.col("y.event_type").alias("type_b"),
        )
        .agg(F.count(F.lit(1)).alias("overlap_exact"))
    )
    return (
        exact.join(est, ["type_a", "type_b"])
        .select(
            "type_a",
            "type_b",
            "overlap_exact",
            (
                F.abs(F.col("overlap_est") - F.col("overlap_exact"))
                <= F.lit(_OVERLAP_TOL) * F.col("overlap_exact")
            ).alias("sketch_ok"),
        )
        .orderBy("type_a", "type_b")
    )


register(
    "audience_overlap_sketch",
    q_audience_overlap_sketch,
    """
    WITH d AS (SELECT DISTINCT event_type, user_id FROM events)
    SELECT x.event_type AS type_a, y.event_type AS type_b,
           COUNT(*) AS overlap_exact, TRUE AS sketch_ok
    FROM d x
    JOIN d y ON x.user_id = y.user_id AND x.event_type < y.event_type
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)


# --------------------------------------------------------------------------
# Time-decayed user value (feature-store style point-in-time feature)
# --------------------------------------------------------------------------
_DECAY_TAU_DAYS = 7.0


def q_user_value_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 users by exponentially time-decayed event value —
    the feature-store staple (recency-weighted engagement: each
    event contributes ``value · e^(−Δdays/τ)`` against the corpus
    watermark, τ = 7 days) that a plain SUM/AVG can't express and a
    true recursive EWMA doesn't need: the decayed sum is
    order-independent, so it is ONE map-side-combinable aggregation —
    no window, no per-user sort, mergeable across increments exactly
    like `agg_incremental_merge`'s (count,sum) states (store
    Σ v·e^(t/τ) unnormalized and re-anchor by multiplying
    e^(−t_now/τ) — the standard trick; here the watermark anchor is
    computed in-query). Δ is a whole-day integer on both engines
    (DATE-truncated, the ns-vs-µs-proof pattern) so `exp` sees
    identical arguments; the 5e-10 nudge before ROUND absorbs
    last-ulp summation-order drift at the 4 dp boundary (the
    `quality_score` rationale) and the top-100 orders by the ROUNDED
    value. The watermark is a broadcast 1-row stat frame — one
    justified extra reference of the narrow events projection.
    """
    ev = load_events(spark, sf_dir).select(
        "user_id", F.col("ts").cast("date").alias("d"), "value"
    )
    tref = ev.agg(F.max("d").alias("d0"))
    decayed = F.sum(
        F.col("value")
        * F.exp(-F.datediff("d0", "d") / F.lit(_DECAY_TAU_DAYS))
    )
    return (
        ev.crossJoin(F.broadcast(tref))
        .groupBy("user_id")
        .agg(
            F.round(decayed + F.lit(5e-10), 4).alias("decayed_value")
        )
        .orderBy(F.desc("decayed_value"), "user_id")
        .limit(100)
    )


register(
    "user_value_decay",
    q_user_value_decay,
    """
    WITH tref AS (SELECT MAX(CAST(ts AS DATE)) AS d0 FROM events)
    SELECT user_id,
           ROUND(SUM(value * EXP(-date_diff('day', CAST(ts AS DATE), d0)
                                  / 7.0)) + 5e-10, 4) AS decayed_value
    FROM events, tref
    GROUP BY 1
    ORDER BY decayed_value DESC, user_id LIMIT 100
    """,
)


# --------------------------------------------------------------------------
# A/B experiment evaluation (two-proportion z-test on conversion)
# --------------------------------------------------------------------------
def q_ab_conversion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test on purchase conversion between two
    hash-assigned experiment arms — the experiment-evaluation readout
    every product-analytics stack ships next to funnels and cohorts
    (`chisq_lang_source` is the k×k generalization; this is the
    2×2 A/B special case with the signed pooled-variance z statistic
    analysts actually read, plus the |z| > 1.96 call at α = 0.05).

    Arm assignment is user-id parity (deterministic, mirrored in the
    oracle — a stand-in for the experiment-bucketing hash, which
    `split_assign` shows in full multiplicative form). Scale shape:
    one pass — per-user conversion is a boolean MAX riding the
    (arm, user) aggregation, arm totals reduce from it, and the
    z arithmetic runs on a 2-row frame pivoted into one row. Nothing
    driver-side, no join against a user dim; the 5e-10 nudge before
    the 4 dp ROUND absorbs cross-engine last-ulp drift in the sqrt.
    """
    ev = load_events(spark, sf_dir).select(
        "user_id", "event_type", "value"
    )
    # conversion = ≥1 high-value purchase (plain purchase saturates at
    # 100% on the fixture — zero variance, z undefined)
    per_user = ev.groupBy(
        (F.col("user_id") % 2 == 0).alias("arm_a"), F.col("user_id")
    ).agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("value") > 100),
                1,
            ).otherwise(0)
        ).alias("converted")
    )
    arms = per_user.groupBy("arm_a").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("converted").alias("conv"),
    )
    one = arms.agg(
        F.max(F.when(F.col("arm_a"), F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("arm_a"), F.col("conv"))).alias("conv_a"),
        F.max(F.when(~F.col("arm_a"), F.col("n"))).alias("n_b"),
        F.max(F.when(~F.col("arm_a"), F.col("conv"))).alias("conv_b"),
    )
    p_a = F.col("conv_a") / F.col("n_a")
    p_b = F.col("conv_b") / F.col("n_b")
    pool = (F.col("conv_a") + F.col("conv_b")) / (
        F.col("n_a") + F.col("n_b")
    )
    # zero-variance guard: pool ∈ {0,1} → z undefined → NULL (ANSI
    # mode raises on the bare division)
    z = F.when(
        (pool > 0) & (pool < 1),
        (p_a - p_b)
        / F.sqrt(
            pool * (1 - pool) * (1 / F.col("n_a") + 1 / F.col("n_b"))
        ),
    )
    return one.select(
        "n_a",
        "conv_a",
        "n_b",
        "conv_b",
        F.round(z + F.lit(5e-10), 4).alias("z_stat"),
        F.coalesce(F.abs(z) > F.lit(1.96), F.lit(False)).alias(
            "significant_95"
        ),
    )


register(
    "ab_conversion_ztest",
    q_ab_conversion_ztest,
    """
    WITH per_user AS (
      SELECT user_id % 2 = 0 AS arm_a, user_id,
             MAX(CASE WHEN event_type = 'purchase' AND value > 100
                      THEN 1 ELSE 0 END) AS converted
      FROM events GROUP BY 1, 2),
    arms AS (
      SELECT arm_a, COUNT(*) AS n,
             CAST(SUM(converted) AS BIGINT) AS conv
      FROM per_user GROUP BY 1),
    one AS (
      SELECT MAX(CASE WHEN arm_a THEN n END) AS n_a,
             MAX(CASE WHEN arm_a THEN conv END) AS conv_a,
             MAX(CASE WHEN NOT arm_a THEN n END) AS n_b,
             MAX(CASE WHEN NOT arm_a THEN conv END) AS conv_b
      FROM arms),
    z AS (
      SELECT n_a, conv_a, n_b, conv_b,
             CASE WHEN (conv_a + conv_b) > 0
                       AND (conv_a + conv_b) < (n_a + n_b)
                  THEN (conv_a * 1.0 / n_a - conv_b * 1.0 / n_b)
                       / SQRT((conv_a + conv_b) * 1.0 / (n_a + n_b)
                              * (1 - (conv_a + conv_b) * 1.0
                                     / (n_a + n_b))
                              * (1.0 / n_a + 1.0 / n_b))
             END AS zr
      FROM one)
    SELECT n_a, conv_a, n_b, conv_b,
           ROUND(zr + 5e-10, 4) AS z_stat,
           COALESCE(ABS(zr) > 1.96, FALSE) AS significant_95
    FROM z
    """,
)


# --------------------------------------------------------------------------
# multi-touch attribution
# --------------------------------------------------------------------------
def q_funnel_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: every distinct event type a
    converting user touched BEFORE their first qualifying purchase
    (value > 100 — plain purchase saturates on this fixture, see
    `ab_conversion_ztest`) shares the conversion credit equally —
    the standard product-analytics alternative to last-touch.
    Ordering anchors on event_id (ingest order), which is
    engine-portable; the raw ns timestamp is not (`user_event_sequences`
    documents the same choice).

    Scale shape (r9 single-scan bounded-state form): ONE map-side
    combined aggregation on (user, type) carries BOTH facts every
    later step needs — the type's first event id and the type's
    first QUALIFYING purchase id (conditional min, NULL when none) —
    so the raw corpus reduces to ≤|users|·|event_types| rows before
    anything crosses the wire.  The per-user conversion anchor is
    then a min-window over that aggregated frame (≤|event_types|
    rows per user — a hot 10⁸-event bot still reduces map-side to
    ≤|event_types| rows, where the r8 plan's join probe and a naive
    conditional-min window over raw events would buffer or reshuffle
    its whole history), the touch filter compares the two ids, and
    the credit window rides the same bounded frame.  Two corpus-side
    exchanges of the AGGREGATED relation (its (user,type) partial
    then the user-keyed window), one events scan, no join —
    plan-pinned in tests/test_plans.py."""
    ev = load_events(spark, sf_dir).select(
        "user_id", "event_type", "event_id", "value"
    )
    per_type = ev.groupBy("user_id", "event_type").agg(
        F.min("event_id").alias("_first_eid"),
        F.min(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("value") > 100),
                F.col("event_id"),
            )
        ).alias("_q_eid"),
    )
    w_user = Window.partitionBy("user_id")
    touches = (
        per_type.withColumn("_conv_eid", F.min("_q_eid").over(w_user))
        .filter(F.col("_first_eid") < F.col("_conv_eid"))
        .select("user_id", "event_type")
    )
    credited = touches.withColumn(
        "_credit", F.lit(1.0) / F.count(F.lit(1)).over(w_user)
    )
    return credited.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("users_touched"),
        F.round(F.sum("_credit") + 5e-10, 4).alias("credit"),
    )


register(
    "funnel_attribution",
    q_funnel_attribution,
    """
    WITH conv AS (
      SELECT user_id, MIN(event_id) AS conv_eid
      FROM events WHERE event_type = 'purchase' AND value > 100
      GROUP BY 1),
    touches AS (
      SELECT DISTINCT e.user_id, e.event_type
      FROM events e JOIN conv USING (user_id)
      WHERE e.event_id < conv_eid),
    credited AS (
      SELECT event_type,
             1.0 / COUNT(*) OVER (PARTITION BY user_id) AS credit
      FROM touches)
    SELECT event_type, COUNT(*) AS users_touched,
           ROUND(SUM(credit) + 5e-10, 4) AS credit
    FROM credited GROUP BY 1
    """,
)


# --------------------------------------------------------------------------
# CUPED variance-reduced A/B lift (Deng et al., WSDM 2013)
# --------------------------------------------------------------------------
def q_cuped_adjusted_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED-adjusted experiment readout: per-variant mean purchase
    revenue in the post-period, variance-reduced with the pre-period
    revenue as the control covariate — adjusted = post − θ·(pre −
    mean(pre)), θ = cov(pre, post)/var(pre) pooled over all users
    (Deng, Xu, Kohavi & Walker, WSDM 2013 — the standard trick for
    tightening A/B confidence intervals without changing the
    estimand: E[adjusted] = E[post] because the correction term has
    mean zero).  The pre/post boundary is the midpoint DAY of the
    corpus date range (integer day arithmetic — engine-portable,
    unlike timestamp midpoints); the variant is the user-id parity
    (a deterministic stand-in for the assignment service's hash).

    Scale shape: purchases reduce map-side to ONE row per user
    (groupBy sums — a hot user combines before the shuffle); the
    date bounds and the pooled (θ, mean-pre) stats each ride as
    broadcast 1-row frames off that |users|-sized relation; the
    readout aggregates on the 2-value variant key.  θ and mean(pre)
    are rounded to 6 decimals IN-ENGINE before the correction is
    applied, so both engines feed bit-comparable constants into the
    per-user adjustment (population moments merge partials in
    nondeterministic order; unrounded θ would smear the 4-decimal
    output).  var_reduction = var(adjusted)/var(post) — the number
    an experimenter actually checks before trusting CUPED (≈1 means
    the covariate bought nothing)."""
    ev = load_events(spark, sf_dir).select("user_id", "ts", "event_type", "value")
    bounds = ev.agg(
        F.min(F.to_date("ts")).alias("_d0"),
        F.max(F.to_date("ts")).alias("_d1"),
    )
    per_user = (
        ev.filter(F.col("event_type") == "purchase")
        .crossJoin(F.broadcast(bounds))
        .withColumn(
            "_cut",
            F.date_add(
                F.col("_d0"),
                F.floor(F.datediff("_d1", "_d0") / 2).cast("int"),
            ),
        )
        .groupBy("user_id")
        .agg(
            F.sum(
                F.when(F.to_date("ts") < F.col("_cut"), F.col("value"))
                .otherwise(0.0)
            ).alias("pre"),
            F.sum(
                F.when(F.to_date("ts") >= F.col("_cut"), F.col("value"))
                .otherwise(0.0)
            ).alias("post"),
        )
        .withColumn("variant", F.pmod("user_id", F.lit(2)).cast("int"))
    )
    stats = per_user.agg(
        F.round(
            F.when(
                F.var_pop("pre") > 1e-12,
                F.covar_pop("pre", "post") / F.var_pop("pre"),
            ).otherwise(0.0)
            + 5e-10,
            6,
        ).alias("_theta"),
        F.round(F.avg("pre") + 5e-10, 6).alias("_mu_pre"),
    )
    adj = per_user.crossJoin(F.broadcast(stats)).withColumn(
        "cuped",
        F.col("post") - F.col("_theta") * (F.col("pre") - F.col("_mu_pre")),
    )
    return (
        adj.groupBy("variant")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.round(F.avg("post") + 5e-10, 4).alias("mean_post"),
            F.round(F.avg("cuped") + 5e-10, 4).alias("mean_cuped"),
            F.round(
                F.var_pop("cuped") / F.nullif(F.var_pop("post"), F.lit(0.0))
                + 5e-10,
                4,
            ).alias("var_reduction"),
        )
        .orderBy("variant")
    )


register(
    "cuped_adjusted_lift",
    q_cuped_adjusted_lift,
    """
    WITH bounds AS (
      SELECT CAST(MIN(ts) AS DATE) AS d0, CAST(MAX(ts) AS DATE) AS d1
      FROM events),
    per_user AS (
      SELECT user_id,
             CAST(user_id % 2 AS INT) AS variant,
             SUM(CASE WHEN CAST(ts AS DATE) <
                   d0 + (DATEDIFF('day', d0, d1) // 2) * INTERVAL 1 DAY
                 THEN value ELSE 0 END) AS pre,
             SUM(CASE WHEN CAST(ts AS DATE) >=
                   d0 + (DATEDIFF('day', d0, d1) // 2) * INTERVAL 1 DAY
                 THEN value ELSE 0 END) AS post
      FROM events, bounds
      WHERE event_type = 'purchase'
      GROUP BY 1, 2),
    stats AS (
      SELECT ROUND(CASE WHEN VAR_POP(pre) > 1e-12
                        THEN COVAR_POP(pre, post) / VAR_POP(pre)
                        ELSE 0 END + 5e-10, 6) AS theta,
             ROUND(AVG(pre) + 5e-10, 6) AS mu_pre
      FROM per_user),
    adj AS (
      SELECT variant, post, post - theta * (pre - mu_pre) AS cuped
      FROM per_user, stats)
    SELECT variant, COUNT(*) AS n_users,
           ROUND(AVG(post) + 5e-10, 4) AS mean_post,
           ROUND(AVG(cuped) + 5e-10, 4) AS mean_cuped,
           ROUND(VAR_POP(cuped) / NULLIF(VAR_POP(post), 0) + 5e-10, 4)
             AS var_reduction
    FROM adj GROUP BY 1 ORDER BY variant
    """,
)


# --------------------------------------------------------------------------
# DAU / trailing-28-day MAU stickiness
# --------------------------------------------------------------------------
def q_dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The gaming-analytics north-star ratio: daily active users over
    trailing-28-day monthly active users, per day (DAU/MAU
    "stickiness", the how-often-do-actives-return readout).

    Scale shape (r10 re-plan, the winning arm of the VERDICT r9 A/B —
    tools/exp_dau_mau_ab.py, 1.78x at sf1 / 3.36x at sf10 over the
    r9 explode-and-re-distinct form; the verdict's own min(offset)
    lever measured SLOWER, 0.92x-0.94x, and is refuted): a trailing
    COUNT(DISTINCT user) per day re-scans 28 days of activity per
    output day, and the r9 alternative exploded every active day into
    28 covered days — a 28x shuffle amplification of the activity
    frame.  Instead, MAU28 is a sweep-line: the corpus collapses ONCE
    to the distinct (user, active_day) frame (the only corpus-sized
    shuffle; its size is the number of distinct (user, day) pairs —
    grows with users x observed days, NOT bounded by a constant, and
    the localCheckpoint materializes exactly it), then per user the
    overlapping coverage intervals [d, d+27] merge into islands (a
    gap > 28 days starts a new island — one activity-sized window
    shuffle, each user's slice bounded by |calendar days|), each
    island emits +1 at its start and -1 the day after it ends, the
    deltas reduce per DAY (map-side combined; output <= 2x|calendar
    days| rows), and a prefix sum over those day points IS the
    trailing MAU — the one unpartitioned window runs over a
    calendar-bounded frame, never data-sized.  Nothing downstream of
    the activity frame is amplified 28x.  Days with zero DAU simply
    don't appear (no calendar spine needed for the ratio).  MAU
    windows are clipped at the corpus start — the standard cold-start
    readout, documented rather than back-filled."""
    ev = load_events(spark, sf_dir).select(
        "user_id", F.to_date("ts").alias("d")
    )
    # (user, active_day) — the ONE corpus reduce.  localCheckpoint:
    # both the DAU and the island branch consume it, and Catalyst's
    # cross-branch exchange reuse is not reliable (r5 finding); the
    # materialized frame is the distinct-(user, day) count, the
    # score-once trade
    active = ev.distinct().localCheckpoint()
    dau = active.groupBy("d").agg(F.count(F.lit(1)).alias("dau"))
    w = Window.partitionBy("user_id").orderBy("d")
    islands = (
        active.withColumn(
            "_new",
            F.when(F.datediff("d", F.lag("d").over(w)) > 28, 1).otherwise(
                0
            ),
        )
        .withColumn("_grp", F.sum("_new").over(w))
        .groupBy("user_id", "_grp")  # rides the user partitioning
        .agg(
            F.min("d").alias("_s"),
            F.date_add(F.max("d"), 27).alias("_e"),
        )
    )
    deltas = islands.select(
        F.col("_s").alias("d"), F.lit(1).alias("_dd")
    ).unionAll(
        islands.select(F.date_add("_e", 1).alias("d"), F.lit(-1).alias("_dd"))
    )
    # DAU days join the point set with delta 0 so the prefix sum has a
    # row at every output day (a DAU day need not be an island edge)
    points = (
        deltas.unionAll(dau.select("d", F.lit(0).alias("_dd")))
        .groupBy("d")
        .agg(F.sum("_dd").alias("_dd"))
    )
    mau = points.withColumn(
        "mau28", F.sum("_dd").over(Window.orderBy("d"))
    ).select("d", "mau28")
    return (
        dau.join(mau, "d")  # inner: ratio only where DAU exists
        .select(
            "d",
            "dau",
            "mau28",
            F.round(F.col("dau") / F.col("mau28") + 5e-10, 4).alias(
                "stickiness"
            ),
        )
        .orderBy("d")
    )


register(
    "dau_mau_stickiness",
    q_dau_mau_stickiness,
    """
    WITH active AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
    dau AS (
      SELECT d, COUNT(*) AS dau FROM active GROUP BY 1),
    covered AS (
      SELECT DISTINCT user_id, d + i * INTERVAL 1 DAY AS d
      FROM active, UNNEST(generate_series(0, 27)) AS u(i)),
    mau AS (
      SELECT d, COUNT(*) AS mau28 FROM covered GROUP BY 1)
    SELECT dau.d, dau, mau28,
           ROUND(dau * 1.0 / mau28 + 5e-10, 4) AS stickiness
    FROM dau JOIN mau ON dau.d = mau.d
    ORDER BY dau.d
    """,
)


# --------------------------------------------------------------------------
# Sample-ratio-mismatch (SRM) guardrail
# --------------------------------------------------------------------------
def q_ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-ratio-mismatch check on the experiment assignment the
    z-test and CUPED readouts trust: a chi-square goodness-of-fit of
    observed arm sizes against the designed 50/50 allocation.  SRM is
    the first gate an experimentation platform runs — a significant
    mismatch means the bucketing, logging, or filtering pipeline is
    biased and every downstream lift number is invalid (Fabijan et
    al., "Diagnosing Sample Ratio Mismatch", KDD 2019; they run it at
    a deliberately strict alpha because it is a data-quality alarm,
    not a hypothesis test — the 10.828 cut here is chi-square(1) at
    alpha = 0.001).  Arm assignment is the same user-id parity the
    z-test uses, so the two readouts audit the same experiment.

    Scale shape: one pass — the corpus reduces to distinct users
    (the one distinct-class shuffle, bounded by |users|, map-side
    partially combined), arm counts reduce from parity, and the
    chi-square arithmetic runs on a 2-row frame pivoted into one.
    The statistic is compared against the constant critical value
    in-engine — neither engine has a chi-square CDF, and the pinned
    constant keeps the verdict bit-identical across engines."""
    users = (
        load_events(spark, sf_dir).select("user_id").distinct()
    )
    arms = users.groupBy(
        (F.col("user_id") % 2 == 0).alias("arm_a")
    ).agg(F.count(F.lit(1)).alias("n"))
    one = arms.agg(
        F.max(F.when(F.col("arm_a"), F.col("n"))).alias("n_a"),
        F.max(F.when(~F.col("arm_a"), F.col("n"))).alias("n_b"),
    )
    e = (F.col("n_a") + F.col("n_b")) / 2.0
    chisq = (F.col("n_a") - e) ** 2 / e + (F.col("n_b") - e) ** 2 / e
    return one.select(
        "n_a",
        "n_b",
        F.round(chisq + F.lit(5e-10), 4).alias("srm_chisq"),
        (chisq > F.lit(10.828)).alias("srm_flag"),
    )


register(
    "ab_srm_check",
    q_ab_srm_check,
    """
    WITH users AS (SELECT DISTINCT user_id FROM events),
    arms AS (
      SELECT user_id % 2 = 0 AS arm_a, COUNT(*) AS n
      FROM users GROUP BY 1),
    one AS (
      SELECT MAX(CASE WHEN arm_a THEN n END) AS n_a,
             MAX(CASE WHEN NOT arm_a THEN n END) AS n_b
      FROM arms)
    SELECT n_a, n_b,
           ROUND(POW(n_a - (n_a + n_b) / 2.0, 2) / ((n_a + n_b) / 2.0)
                 + POW(n_b - (n_a + n_b) / 2.0, 2) / ((n_a + n_b) / 2.0)
                 + 5e-10, 4) AS srm_chisq,
           (POW(n_a - (n_a + n_b) / 2.0, 2) / ((n_a + n_b) / 2.0)
            + POW(n_b - (n_a + n_b) / 2.0, 2) / ((n_a + n_b) / 2.0))
             > 10.828 AS srm_flag
    FROM one
    """,
)


# --------------------------------------------------------------------------
# Minimum detectable effect (experiment power planning)
# --------------------------------------------------------------------------
def q_ab_minimum_detectable_effect(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Completes the experimentation triad (SRM guardrail → MDE
    planning → z-test readout): the smallest absolute lift in
    high-value-purchase conversion this experiment could declare at
    alpha = 0.05 with 80% power, from the same per-user frame the
    z-test reads.  MDE = (z_{alpha/2} + z_{power}) · sqrt(2·p(1-p)/n)
    with the two-sided normal approximation (z constants pinned to
    1.959964 and 0.841621 — neither engine has an inverse normal
    CDF, and pinning keeps the verdict bit-identical; n = the
    smaller arm, the conservative planning convention).  An observed
    lift below the MDE row means "underpowered", not "no effect" —
    the readout every experiment review asks for next to the z-test.

    Scale shape: identical to `ab_conversion_ztest`'s one pass — the
    corpus reduces map-side to one row per (arm, user), arm totals
    pivot into one row, the MDE arithmetic is scalar."""
    ev = load_events(spark, sf_dir).select(
        "user_id", "event_type", "value"
    )
    per_user = ev.groupBy(
        (F.col("user_id") % 2 == 0).alias("arm_a"), F.col("user_id")
    ).agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("value") > 100),
                1,
            ).otherwise(0)
        ).alias("converted")
    )
    arms = per_user.groupBy("arm_a").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("converted").alias("conv"),
    )
    one = arms.agg(
        F.max(F.when(F.col("arm_a"), F.col("n"))).alias("n_a"),
        F.max(F.when(~F.col("arm_a"), F.col("n"))).alias("n_b"),
        F.sum("conv").alias("conv_all"),
        F.sum("n").alias("n_all"),
    )
    p = F.col("conv_all") / F.col("n_all")
    n_min = F.least("n_a", "n_b")
    mde = (
        F.lit(1.959964 + 0.841621)
        * F.sqrt(F.lit(2.0) * p * (1 - p) / n_min)
    )
    return one.select(
        "n_a",
        "n_b",
        F.round(p + 5e-10, 4).alias("base_rate"),
        F.round(mde + 5e-10, 4).alias("mde_abs"),
        F.round(mde / p + 5e-10, 4).alias("mde_rel"),
    )


register(
    "ab_minimum_detectable_effect",
    q_ab_minimum_detectable_effect,
    """
    WITH per_user AS (
      SELECT user_id % 2 = 0 AS arm_a, user_id,
             MAX(CASE WHEN event_type = 'purchase' AND value > 100
                      THEN 1 ELSE 0 END) AS converted
      FROM events GROUP BY 1, 2),
    arms AS (
      SELECT arm_a, COUNT(*) AS n, SUM(converted) AS conv
      FROM per_user GROUP BY 1),
    one AS (
      SELECT MAX(CASE WHEN arm_a THEN n END) AS n_a,
             MAX(CASE WHEN NOT arm_a THEN n END) AS n_b,
             SUM(conv) AS conv_all, SUM(n) AS n_all
      FROM arms)
    SELECT n_a, n_b,
           ROUND(conv_all * 1.0 / n_all + 5e-10, 4) AS base_rate,
           ROUND((1.959964 + 0.841621)
                 * SQRT(2.0 * (conv_all * 1.0 / n_all)
                        * (1 - conv_all * 1.0 / n_all)
                        / LEAST(n_a, n_b)) + 5e-10, 4) AS mde_abs,
           ROUND((1.959964 + 0.841621)
                 * SQRT(2.0 * (conv_all * 1.0 / n_all)
                        * (1 - conv_all * 1.0 / n_all)
                        / LEAST(n_a, n_b))
                 / (conv_all * 1.0 / n_all) + 5e-10, 4) AS mde_rel
    FROM one
    """,
)


# --------------------------------------------------------------------------
# Seasonal-naive forecast with time-based backtest
# --------------------------------------------------------------------------
def q_forecast_seasonal_backtest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Seasonal-naive revenue forecast with a PROPER time-based
    holdout: the last 7 calendar days are the test window, the
    forecast for each test day is the day-of-week mean over the
    training days, and the readout is per-event-type backtest error
    (MAE, WAPE, signed bias) — the protocol any production forecast
    pipeline runs before promoting a model, applied to its simplest
    honest baseline (Q6's `forecast_revenue_delta` is a filtered sum,
    not a forecast; this is the time-series rung).

    Scale shape: ONE events scan collapses to the (event_type, day)
    daily frame (map-side combined, |types|·|days| rows); the split
    boundary (global max day) and the per-(type, dow) train means are
    WINDOWS over that compact frame — the conditional-aggregate
    window avoids re-deriving daily for a train/test join, so events
    is scanned once (the `anomaly_zscore` events:2 class is exactly
    what this formulation dodges).  Test days whose day-of-week never
    occurs in training drop on both sides (fc IS NULL filter).
    WAPE (Σ|err|/Σ|actual|) replaces row-wise MAPE — no zero-actual
    division.  Day-of-week parity: Spark ``dayofweek`` is 1–7
    Sunday=1; DuckDB ``date_part('dow')`` is 0–6 Sunday=0, shifted
    +1 in the oracle."""
    ev = load_events(spark, sf_dir)
    daily = ev.groupBy(
        "event_type",
        F.to_date(F.date_trunc("day", F.col("ts"))).alias("day"),
    ).agg(F.sum("value").alias("rev"))
    w_all = Window.partitionBy()
    w_dow = Window.partitionBy("event_type", F.dayofweek("day"))
    bounded = daily.select(
        "event_type",
        "day",
        "rev",
        F.date_sub(F.max("day").over(w_all), 6).alias("_split"),
    )
    staged = bounded.select(
        "event_type",
        "day",
        "rev",
        "_split",
        F.avg(F.when(F.col("day") < F.col("_split"), F.col("rev")))
        .over(w_dow)
        .alias("_fc"),
    )
    err = F.col("rev") - F.col("_fc")
    return (
        staged.filter(
            (F.col("day") >= F.col("_split")) & F.col("_fc").isNotNull()
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_test_days"),
            F.round(F.avg(F.abs(err)) + 5e-10, 4).alias("mae"),
            F.round(
                F.sum(F.abs(err)) / F.sum(F.abs(F.col("rev"))) + 5e-10, 4
            ).alias("wape"),
            F.round(F.avg(-err) + 5e-10, 4).alias("bias"),
        )
        .orderBy("event_type")
    )


register(
    "forecast_seasonal_backtest",
    q_forecast_seasonal_backtest,
    """
    WITH daily AS (
      SELECT event_type,
             CAST(date_trunc('day', ts) AS DATE) AS day,
             SUM(value) AS rev
      FROM events GROUP BY 1, 2),
    bounded AS (
      SELECT event_type, day, rev,
             MAX(day) OVER () - 6 AS split
      FROM daily),
    staged AS (
      SELECT event_type, day, rev, split,
             AVG(CASE WHEN day < split THEN rev END)
               OVER (PARTITION BY event_type,
                     date_part('dow', day) + 1) AS fc
      FROM bounded)
    SELECT event_type,
           COUNT(*) AS n_test_days,
           ROUND(AVG(ABS(rev - fc)) + 5e-10, 4) AS mae,
           ROUND(SUM(ABS(rev - fc)) / SUM(ABS(rev)) + 5e-10, 4) AS wape,
           ROUND(AVG(fc - rev) + 5e-10, 4) AS bias
    FROM staged
    WHERE day >= split AND fc IS NOT NULL
    GROUP BY 1 ORDER BY event_type
    """,
)


def q_dedup_survivors_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup removal with QUALITY-RANKED survivor selection: the
    curation-grade variant of `dedup_survivors` — a training corpus
    wants to keep the BEST copy of duplicated content, not the one
    with the smallest id (min-id keeps whatever crawled first; the
    boilerplate-stripped re-crawl usually scores higher).  Survivor =
    argmax quality_score within each transitive near-dup cluster
    (tie: lowest doc_id); unclustered docs pass through.  Corpus =
    non-empty documents (the quality score's domain, the
    `global_quality_rank` convention).

    100 TB shape: identical to `dedup_survivors` past the pair
    generation it shares — the cluster frame holds only docs that
    matched something, so scoring its members is a broadcast join
    into the corpus scan, the per-cluster argmax window runs over
    that tiny frame, and the final keep/drop is a broadcast anti-join
    on doc_id; the corpus never re-shuffles."""
    from gaming_ai_analytics_spark.functions.text import quality_score

    docs = load_table(spark, sf_dir, "documents").filter(
        F.col("text").isNotNull() & (F.length(F.trim("text")) > 0)
    )
    q = quality_score(F.col("text"))
    pairs = ngram_jaccard_pairs(docs, "doc_id", "text", k=3, threshold=0.5)
    clusters = dedup_clusters(pairs, "id_a", "id_b")
    members = docs.select("doc_id", q.alias("_q")).join(
        F.broadcast(clusters), "doc_id"
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("_q"), F.col("doc_id")
    )
    ranked = members.withColumn("_rn", F.row_number().over(w))
    winners = ranked.filter(F.col("_rn") == 1).select("doc_id")
    losers = ranked.filter(F.col("_rn") > 1).select("doc_id")
    kept = docs.join(F.broadcast(losers), "doc_id", "left_anti")
    reason = F.when(
        F.col("_won").isNotNull(), F.lit("best_quality")
    ).otherwise(F.lit("unique"))
    return kept.join(
        F.broadcast(winners.withColumn("_won", F.lit(1))), "doc_id", "left"
    ).select(
        "doc_id",
        "lang",
        "source",
        q.alias("quality"),
        reason.alias("keep_reason"),
    )


def _dedup_survivors_quality_oracle() -> str:
    from gaming_ai_analytics_spark.functions.text_sql import QUALITY

    nonempty = "text IS NOT NULL AND LENGTH(TRIM(text)) > 0"
    return f"""
    WITH RECURSIVE p AS ({_JACCARD_PAIRS_SQL}),
    edges AS (
      SELECT id_a AS s, id_b AS d FROM p
      UNION
      SELECT id_b, id_a FROM p
    ),
    reach AS (
      SELECT s, d FROM edges
      UNION
      SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
    ),
    clusters AS (
      SELECT s AS doc_id, LEAST(s, MIN(d)) AS cluster_id
      FROM reach GROUP BY s
    ),
    scored AS (
      SELECT c.doc_id, c.cluster_id, {QUALITY} AS q
      FROM clusters c JOIN documents d2 ON c.doc_id = d2.doc_id
    ),
    ranked AS (
      SELECT doc_id,
             ROW_NUMBER() OVER (PARTITION BY cluster_id
                                ORDER BY q DESC, doc_id) AS rn
      FROM scored
    )
    SELECT d.doc_id, d.lang, d.source, {QUALITY} AS quality,
           CASE WHEN w.doc_id IS NOT NULL THEN 'best_quality'
                ELSE 'unique' END AS keep_reason
    FROM documents d
    LEFT JOIN (SELECT doc_id FROM ranked WHERE rn = 1) w
      ON d.doc_id = w.doc_id
    WHERE ({nonempty})
      AND d.doc_id NOT IN (SELECT doc_id FROM ranked WHERE rn > 1)
    """


register(
    "dedup_survivors_quality",
    q_dedup_survivors_quality,
    _dedup_survivors_quality_oracle(),
)
