"""Training-data pipeline operator tests: chunking, vocabulary,
TF-IDF, deterministic sampling (queries_traindata) plus the reshape /
JSON queries in queries_ext."""

from __future__ import annotations

from pyspark.sql import functions as F

from gaming_ai_analytics_spark.functions.text import token_chunks

SF = "/root/testdata/sf0.001"


def test_token_chunks_cover_all_tokens_with_overlap(spark):
    text = " ".join(f"w{i}" for i in range(100))  # 100 tokens
    df = spark.createDataFrame([(1, text)], ["id", "text"])
    rows = (
        df.select(F.explode(token_chunks(F.col("text"), 32, 24)).alias("c"))
        .select("c.chunk_no", "c.chunk")
        .collect()
    )
    # 1 + ceil((100-32)/24) = 1 + 3 = 4 chunks
    assert [r.chunk_no for r in sorted(rows, key=lambda r: r.chunk_no)] == [0, 1, 2, 3]
    covered = set()
    for r in rows:
        toks = r.chunk.split(" ")
        assert len(toks) <= 32
        covered.update(toks)
    assert covered == {f"w{i}" for i in range(100)}  # full coverage
    # consecutive chunks overlap by size - stride = 8 tokens
    by_no = {r.chunk_no: r.chunk.split(" ") for r in rows}
    assert by_no[0][-8:] == by_no[1][:8]


def test_token_chunks_short_doc_single_chunk(spark):
    df = spark.createDataFrame([(1, "a b c")], ["id", "text"])
    rows = df.select(
        F.explode(token_chunks(F.col("text"), 32, 24)).alias("c")
    ).collect()
    assert len(rows) == 1 and rows[0].c.chunk == "a b c"


def test_sample_stratified_deterministic_and_pushed_down(spark):
    from gaming_ai_analytics_spark.queries_traindata import q_sample_stratified

    a = {r.doc_id for r in q_sample_stratified(spark, SF).collect()}
    b = {r.doc_id for r in q_sample_stratified(spark, SF).collect()}
    assert a == b and a  # identical across reruns
    plan = (
        q_sample_stratified(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # arithmetic predicate evaluates in the scan stage, not post-shuffle
    assert "Exchange" not in plan


def test_tf_idf_no_driver_action_for_corpus_size(spark, monkeypatch):
    """N comes from a broadcast 1-row aggregate, never df.count()."""
    from pyspark.sql import DataFrame

    from gaming_ai_analytics_spark.queries_traindata import q_tf_idf

    def boom(*a, **k):
        raise AssertionError("driver action during plan construction")

    for action in ("count", "collect", "first", "take", "head"):
        monkeypatch.setattr(DataFrame, action, boom)
    q_tf_idf(spark, SF)  # plan construction only — must not act
