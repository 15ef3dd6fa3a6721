"""gaming_ai_analytics_spark — a PySpark-native analytics engine.

A brand-new, idiomatic PySpark re-expression of the query and
data-processing capabilities of ``engineeringmadness/gaming-ai-analytics``
(a Databricks lakehouse ETL + analytics pipeline; see SURVEY.md), extended
with the LLM-data-pipeline operator surface (dedup, similarity search,
multimodal columns, text analysis) and designed for 100 TB scale:

- DataFrame/SQL declarative plans — Catalyst/AQE pick physical strategy
- explicit schemas everywhere (never ``inferSchema`` in production paths)
- broadcast hints for dim joins, anti-join incremental semantics
- Arrow-batched Pandas UDFs only where built-ins can't express semantics
- no driver-side ``collect()`` in any operator hot path

Layout:
    session.py    SparkSession factory tuned for local[32] tests / cluster
    config.py     pipeline configuration dataclass (replaces dbutils widgets)
    constants.py  canonical column-name registry (GameConstants analog)
    sources/      IO: layered table read/write, schema-pinned CSV, star loader
    operators/    joins, aggregates, dedup, similarity, quality gate
    functions/    text analysis, vector math, pluggable scorers
    plans/        metric-view compiler, pipeline DAG
    streaming/    Structured Streaming ingestion of the events surface
"""

__version__ = "0.1.0"
