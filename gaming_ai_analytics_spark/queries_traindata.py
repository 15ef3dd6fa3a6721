"""Training-data pipeline queries: chunking, vocabulary, TF-IDF,
deterministic sampling (SURVEY §2.11 extension; no reference analog —
these are the corpus-preparation operators an LLM data pipeline runs
in front of training, expressed Spark-first over the documents
fixture).

Scale notes baked into each operator:
- chunking is map-only (let-bound token array → transform → one
  posexplode; no shuffle, no Python);
- vocabulary / TF-IDF shuffle on the term key with map-side partial
  aggregation — the only formulation that holds at corpus scale;
- sampling is pure per-row arithmetic on a multiplicative hash — no
  ``.sample()`` nondeterminism, reruns pick identical rows, and the
  predicate pushes down to the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gaming_ai_analytics_spark.functions.text import token_chunks, tokens
from gaming_ai_analytics_spark.operators.parallelism import ensure_parallelism
from gaming_ai_analytics_spark.registry import register
from gaming_ai_analytics_spark.sources.star import load_table

_TOKS = "string_split_regex(TRIM(text), ' +')"
_NONEMPTY = "text IS NOT NULL AND LENGTH(TRIM(text)) > 0"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ensure_parallelism(
        load_table(spark, sf_dir, "documents").filter(
            F.col("text").isNotNull() & (F.length(F.trim(F.col("text"))) > 0)
        )
    )


# --------------------------------------------------------------------------
# document chunking
# --------------------------------------------------------------------------
def q_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping 32-token chunks with stride 24 — one row per
    (doc, chunk). The chunk array is computed per-row; the only
    row-multiplying op is the final posexplode."""
    docs = _docs(spark, sf_dir)
    return docs.select(
        "doc_id", F.explode(token_chunks(F.col("text"), 32, 24)).alias("c")
    ).select("doc_id", "c.chunk_no", "c.chunk")


register(
    "doc_chunking",
    q_doc_chunking,
    f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS} AS t FROM documents WHERE {_NONEMPTY}
    ),
    c AS (
      SELECT doc_id, t,
             unnest(generate_series(0,
               CASE WHEN len(t) <= 32 THEN 0
                    ELSE CAST(1 + CEIL((len(t) - 32) / 24.0) AS INT) - 1
               END)) AS chunk_no
      FROM toks
    )
    SELECT doc_id, chunk_no,
           array_to_string(t[chunk_no * 24 + 1 : chunk_no * 24 + 32], ' ')
             AS chunk
    FROM c
    """,
)


# --------------------------------------------------------------------------
# vocabulary build (top terms by document frequency)
# --------------------------------------------------------------------------
def q_vocab_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 vocabulary terms by document frequency (distinct per
    doc), deterministic tie-break on the term. One shuffle on the term
    key (partial counts map-side), then TakeOrderedAndProject."""
    docs = _docs(spark, sf_dir)
    terms = docs.select(
        F.explode(F.array_distinct(tokens(F.col("text")))).alias("term")
    )
    return (
        terms.groupBy("term")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
        .orderBy(F.desc("doc_freq"), "term")
        .limit(50)
    )


register(
    "vocab_top_terms",
    q_vocab_top_terms,
    f"""
    SELECT term, COUNT(*) AS doc_freq
    FROM (SELECT doc_id, unnest(list_distinct({_TOKS})) AS term
          FROM documents WHERE {_NONEMPTY})
    GROUP BY 1 ORDER BY doc_freq DESC, term LIMIT 50
    """,
)


# --------------------------------------------------------------------------
# TF-IDF
# --------------------------------------------------------------------------
def q_tf_idf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(doc, term) TF-IDF over the corpus: tf = term count /
    doc length, idf = ln(N / doc_freq). The corpus statistics (N,
    doc_freq) come from aggregations, never a driver action — N is a
    1-row aggregate broadcast into the weight projection. Output is
    restricted to doc_id < 100 to keep the checked result compact;
    the statistics still cover the whole corpus."""
    docs = _docs(spark, sf_dir)
    toks = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    doclen = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n"))
    weight = F.round(
        (F.col("tf") / F.col("dl")) * F.log(F.col("n") / F.col("df")), 4
    )
    return (
        tf.filter(F.col("doc_id") < 100)
        .join(doclen, "doc_id")
        .join(dfreq, "term")
        .crossJoin(F.broadcast(n))
        .select("doc_id", "term", "tf", weight.alias("tf_idf"))
    )


register(
    "tf_idf",
    q_tf_idf,
    f"""
    WITH docs AS (SELECT doc_id, text FROM documents WHERE {_NONEMPTY}),
    toks AS (SELECT doc_id, unnest({_TOKS}) AS term FROM docs),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
    doclen AS (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY 1),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT COUNT(*) AS n FROM docs)
    SELECT tf.doc_id, tf.term, tf.tf,
           ROUND((tf.tf * 1.0 / doclen.dl) * LN(n.n * 1.0 / dfreq.df), 4)
             AS tf_idf
    FROM tf
    JOIN doclen USING (doc_id)
    JOIN dfreq USING (term), n
    WHERE tf.doc_id < 100
    """,
)


# --------------------------------------------------------------------------
# deterministic stratified sampling
# --------------------------------------------------------------------------
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-stratified corpus sampling with per-language rates (en is
    downweighted 10%, the rest keep 30%) — the training-mix rebalance
    operator. A multiplicative hash of the key (Knuth constant) gives
    a uniform deterministic bucket; reruns and both engines pick the
    IDENTICAL rows, unlike ``DataFrame.sample``. The bucket predicate
    is plain arithmetic, so it pushes into the scan."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = (F.col("doc_id") * F.lit(2654435761)) % 100
    rate = F.when(F.col("lang") == "en", 10).otherwise(30)
    return docs.filter(bucket < rate).select(
        "doc_id", "lang", "source", "n_chars"
    )


register(
    "sample_stratified",
    q_sample_stratified,
    """
    SELECT doc_id, lang, source, n_chars
    FROM documents
    WHERE (doc_id * 2654435761) % 100
          < CASE WHEN lang = 'en' THEN 10 ELSE 30 END
    """,
)
