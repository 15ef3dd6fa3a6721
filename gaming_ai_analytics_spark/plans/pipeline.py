"""End-to-end pipeline parity — the reference's workflow DAG as plain
Python over the driver fixtures.

Reference DAG (src/job/workflow.json:15-79):

    dimensions ∥ reviews_fact → quality_checks → semantic_layer

Role mapping onto the synthetic star schema (FIXTURES.md §B.1):
- dims build (auxillary_dims.py): nation⋈region flatten + translated
  names → ``dim_nation``; supplier/part projections with fillna +
  consistency filter → ``dim_supplier``/``dim_part``.
- fact build (reviews_fact.py): ``documents`` is the scored-text fact —
  filter → project → incremental anti-join → sentiment score →
  sponsored half-weighting → batched append.
- quality gate (data_quality.py): key uniqueness + score range,
  raising ``QualityError`` blocks the metric layer.
- metric layer (semantic_layer.sql): a MetricView over the fact,
  materialized as a summary table.

Idempotence contract (reviews_fact.py:150-153,185-186): the anti-join
against already-materialized keys makes re-runs exactly-once — running
``build_fact`` twice appends zero new rows.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gaming_ai_analytics_spark.config import PipelineConfig
from gaming_ai_analytics_spark.constants import Layers
from gaming_ai_analytics_spark.functions.scoring import (
    RuleTranslator,
    Translator,
    sentiment_expr,
    weighted_score,
)
from gaming_ai_analytics_spark.operators.joins import (
    flatten_dimension,
    incremental_anti_join,
)
from gaming_ai_analytics_spark.operators.quality import (
    IsInRange,
    IsUnique,
    NotNull,
    quality_gate,
)
from gaming_ai_analytics_spark.plans.metric_view import (
    JoinSpec,
    MetricView,
    MetricViewSpec,
)
from gaming_ai_analytics_spark.sources.io import TableStore
from gaming_ai_analytics_spark.sources.star import load_table


@dataclass
class PipelineResult:
    dims_built: list[str]
    fact_rows_appended: int
    quality_passed: bool
    metric_rows: int
    #: run statistics captured by ``DataFrame.observe`` on the fact
    #: batch — collected DURING the append action, zero extra jobs
    #: (empty when no rows were appended, so no action ran)
    fact_metrics: dict = None  # type: ignore[assignment]


# --------------------------------------------------------------------------
# dimensions task (auxillary_dims.py)
# --------------------------------------------------------------------------
def build_dims(
    spark: SparkSession,
    store: TableStore,
    sf_dir: str,
    translator: Translator | None = None,
) -> list[str]:
    """auxillary_dims.py flow: skip-if-exists guard (:60-61), translate
    (:14-27,66), flatten join (:73-97), fillna + consistency filter +
    project (:118-148), overwrite write (:97,152)."""
    built: list[str] = []
    translator = translator or RuleTranslator()

    if not store.exists(Layers.DIM, "nation"):
        nation = load_table(spark, sf_dir, "nation")
        region = load_table(spark, sf_dir, "region")
        # dims_to_translate path (:44-45,65-67): translated display name.
        from gaming_ai_analytics_spark.functions.scoring import translate_text

        flat = flatten_dimension(
            translate_text(nation, "n_name", "display_name", translator),
            region,
            "n_regionkey",
            "r_regionkey",
        ).select("n_nationkey", "n_name", "display_name", "r_name")
        store.save(Layers.DIM, "nation", flat, mode="overwrite")
        built.append("dim_nation")

    if not store.exists(Layers.DIM, "supplier"):
        supplier = load_table(spark, sf_dir, "supplier")
        store.save(
            Layers.DIM,
            "supplier",
            supplier.select(
                F.col("s_suppkey").alias("supplier_id"),
                F.col("s_name").alias("name"),
                F.col("s_nationkey").alias("nation_id"),
                F.col("s_acctbal").alias("balance"),
            ),
            mode="overwrite",
        )
        built.append("dim_supplier")

    if not store.exists(Layers.DIM, "part"):
        part = load_table(spark, sf_dir, "part")
        # fillna + consistency filter + derived flag (auxillary_dims.py:123-131)
        cleaned = (
            part.fillna({"p_retailprice": 0.0})
            .filter(F.col("p_size") > 0)
            .select(
                F.col("p_partkey").alias("part_id"),
                F.col("p_name").alias("name"),
                F.col("p_brand").alias("brand"),
                F.col("p_type").alias("type"),
                F.col("p_size").alias("size"),
                F.col("p_retailprice").alias("retail_price"),
                (F.col("p_retailprice") > 1500.0).alias("premium"),
            )
        )
        store.save(Layers.DIM, "part", cleaned, mode="overwrite")
        built.append("dim_part")
    return built


# --------------------------------------------------------------------------
# fact task (reviews_fact.py)
# --------------------------------------------------------------------------
def fact_transform(docs: DataFrame) -> DataFrame:
    """The fact build's pure transform chain (reviews_fact.py:131-167):
    filter → project/rename → score → weight. Scoring uses the
    JVM-side lexicon expression (codegen'd; the pandas-UDF path in
    functions.scoring is the pluggable-backend variant)."""
    guarded = docs.filter(
        F.col("text").isNotNull() & (F.col("n_chars") > 0)  # F1/F5 analog
    )
    projected = guarded.select(
        F.col("doc_id").alias("review_id"),  # P1 renames
        F.col("text").alias("review_text"),
        F.col("lang").alias("language"),
        F.col("source").alias("source"),
        F.col("n_chars").alias("review_length"),
        (F.col("doc_id") % 10 == 0).alias("sponsored_review"),
    )
    scored = projected.withColumn(
        "sentiment_score", sentiment_expr(F.col("review_text"))
    )
    return scored.withColumn(
        "weighted_score",
        weighted_score(F.col("sentiment_score"), F.col("sponsored_review")),
    )


class FactBuildResult(int):
    """Rows-appended count (an ``int``, so every existing caller and
    arithmetic keeps working) carrying the ``DataFrame.observe``
    statistics from the SAME pass that materialized the batch — no
    extra job."""

    metrics: dict

    def __new__(cls, appended: int, metrics: dict) -> "FactBuildResult":
        out = super().__new__(cls, appended)
        out.metrics = metrics
        return out

    @property
    def appended(self) -> int:
        return int(self)


def build_fact(
    spark: SparkSession,
    store: TableStore,
    sf_dir: str,
    cfg: PipelineConfig | None = None,
) -> FactBuildResult:
    """reviews_fact.py flow: transform → anti-join vs existing fact
    (:151-153) → limit(batch) (:178,185) → append (:185-186).
    Exactly-once across reruns.

    The batch carries a ``DataFrame.observe`` node: run statistics
    (row count, score profile, negative share) are accumulated by the
    tasks that materialize the batch anyway — the zero-cost
    replacement for the separate profiling scan a naive pipeline runs
    per batch (at 100 TB a redundant profiling pass IS the cost)."""
    from pyspark.sql import Observation

    cfg = cfg or PipelineConfig()
    new = fact_transform(load_table(spark, sf_dir, "documents"))
    if store.exists(Layers.FACT, "reviews"):
        existing = store.load(Layers.FACT, "reviews")
        new = incremental_anti_join(new, existing, "review_id")
    obs = Observation("fact_batch")
    batch = new.limit(cfg.batch_size).observe(
        obs,
        F.count(F.lit(1)).alias("rows"),
        F.round(F.avg("weighted_score"), 4).alias("avg_weighted_score"),
        F.sum(
            F.when(F.col("sentiment_score") < 0, 1).otherwise(0)
        ).alias("n_negative"),
    )
    # Materialize the batch before counting so the append and the count
    # see the same rows (scores are deterministic here, but the remote
    # backend would not be — SURVEY §7.3.1).
    batch.persist()
    try:
        appended = batch.count()
        if appended:
            store.save(Layers.FACT, "reviews", batch, mode="append")
        metrics = dict(obs.get) if appended is not None else {}
    finally:
        batch.unpersist()
    return FactBuildResult(appended=appended, metrics=metrics)


# --------------------------------------------------------------------------
# quality task (data_quality.py)
# --------------------------------------------------------------------------
FACT_RULES = [
    IsUnique(name="unique_review", columns=("review_id",)),
    IsInRange(name="score_range", column="weighted_score", min_value=-5, max_value=5),
    NotNull(name="text_present", column="review_text"),
]


def run_quality(store: TableStore) -> None:
    """data_quality.py:24-46 over the materialized fact; raises
    QualityError on any violation (blocks the metric layer)."""
    quality_gate(store.load(Layers.FACT, "reviews"), FACT_RULES)


# --------------------------------------------------------------------------
# metric layer (semantic_layer.sql)
# --------------------------------------------------------------------------
def review_metric_spec() -> MetricViewSpec:
    """The semantic layer's spec shape (semantic_layer.sql:11-93)
    transposed to the scored-document fact."""
    return MetricViewSpec(
        source="fact_reviews",
        filter="fact_reviews.weighted_score IS NOT NULL",
        joins=[],
        dimensions={
            "language": "fact_reviews.language",
            "source": "fact_reviews.source",
            "sponsored": "fact_reviews.sponsored_review",
        },
        measures={
            "review_count": "COUNT(*)",
            "avg_weighted_score": "ROUND(AVG(fact_reviews.weighted_score), 4)",
            "positive_review_pct": (
                "ROUND(SUM(CASE WHEN fact_reviews.weighted_score > 0 THEN 1 "
                "ELSE 0 END) * 1.0 / COUNT(*), 4)"
            ),
            "negative_review_pct": (
                "ROUND(SUM(CASE WHEN fact_reviews.weighted_score < 0 THEN 1 "
                "ELSE 0 END) * 1.0 / COUNT(*), 4)"
            ),
            "median_review_length": (
                "ROUND(quantile_cont(fact_reviews.review_length, 0.5), 2)"
            ),
        },
    )


SPARK_MEASURE_OVERRIDES = {
    # DuckDB spells exact interpolated percentile quantile_cont; Spark
    # spells it percentile. The spec stores the ANSI/DuckDB form; the
    # Spark compile rewrites it.
    "quantile_cont(": "percentile(",
}


def build_metric_layer(spark: SparkSession, store: TableStore) -> DataFrame:
    """semantic_layer task: materialize the language×sponsored rollup
    through the MetricView compiler."""
    spec = review_metric_spec()
    spec.measures = {
        k: _to_spark_measure(v) for k, v in spec.measures.items()
    }
    mv = MetricView(
        spark, spec, {"fact_reviews": store.load(Layers.FACT, "reviews")}
    )
    out = mv.query(
        ["language", "sponsored"],
        ["review_count", "avg_weighted_score", "positive_review_pct"],
    )
    store.save(Layers.METRIC, "review_summary", out, mode="overwrite")
    # catalog documentation is part of the semantic layer
    # (semantic_layer.sql:96-139) — comments ride the same build
    store.document(
        Layers.METRIC,
        "review_summary",
        table_comment="Review metrics rolled up by language and sponsorship",
        column_comments={
            "review_count": "Number of reviews in the group",
            "avg_weighted_score": "Average sponsorship-weighted sentiment",
            "positive_review_pct": "Share of reviews with positive score",
        },
    )
    return store.load(Layers.METRIC, "review_summary")


def _to_spark_measure(expr: str) -> str:
    for a, b in SPARK_MEASURE_OVERRIDES.items():
        expr = expr.replace(a, b)
    return expr


# --------------------------------------------------------------------------
# the DAG (workflow.json)
# --------------------------------------------------------------------------
def run_pipeline(
    spark: SparkSession,
    sf_dir: str,
    cfg: PipelineConfig | None = None,
    concurrent: bool = True,
) -> PipelineResult:
    """workflow.json:15-79 ordering: dims ∥ fact → quality → metrics.

    Dims and fact have no dependency (workflow.json:15-48: neither
    task declares ``depends_on``), so they are submitted from two
    driver threads — SparkSessions are thread-safe for job submission
    and the scheduler interleaves their stages across executors, the
    same concurrency the Databricks job runner provides. They write
    disjoint tables, so there is no ordering hazard. ``concurrent=
    False`` falls back to sequential submission (identical results)."""
    cfg = cfg or PipelineConfig()
    store = TableStore(spark, cfg.warehouse_dir, cfg.table_format)
    if concurrent:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=2) as pool:
            dims_f = pool.submit(build_dims, spark, store, sf_dir)
            fact_f = pool.submit(build_fact, spark, store, sf_dir, cfg)
            dims, fact = dims_f.result(), fact_f.result()
    else:
        dims = build_dims(spark, store, sf_dir)
        fact = build_fact(spark, store, sf_dir, cfg)
    run_quality(store)  # raises → blocks metric layer (ALL_SUCCESS)
    metrics = build_metric_layer(spark, store)
    return PipelineResult(
        dims_built=dims,
        fact_rows_appended=fact.appended,
        quality_passed=True,
        metric_rows=metrics.count(),
        fact_metrics=fact.metrics,
    )
