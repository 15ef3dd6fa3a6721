from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from gaming_ai_analytics_spark.functions.scoring import (
    LexiconScorer,
    RuleTranslator,
    score_text,
    sentiment_expr,
    translate_text,
    weighted_score,
)


def test_lexicon_scorer_batch():
    s = LexiconScorer()
    out = s.score_batch(pd.Series(["fast fast", "slow", "", None, "big small"]))
    assert list(out) == [4, -2, 0, 0, 0]


def test_lexicon_clip_bounds():
    s = LexiconScorer()
    out = s.score_batch(pd.Series(["fast " * 10, "slow " * 10]))
    assert list(out) == [5, -5]


def test_sentiment_expr_matches_pandas_udf(spark, sf_dir):
    """JVM expression path and Arrow pandas-UDF path agree row-for-row."""
    from gaming_ai_analytics_spark.sources.star import load_table

    docs = load_table(spark, sf_dir, "documents").limit(200)
    via_expr = docs.select("doc_id", sentiment_expr(F.col("text")).alias("s"))
    via_udf = score_text(docs, out_col="s").select("doc_id", "s")
    diff = via_expr.join(via_udf, "doc_id").filter(
        via_expr.s != via_udf.s
    )
    assert diff.count() == 0


def test_weighted_score(spark):
    df = spark.createDataFrame(
        [(4, True), (4, False), (-2, True)], "score int, sponsored boolean"
    )
    out = df.select(
        weighted_score(F.col("score"), F.col("sponsored")).alias("w")
    ).collect()
    assert [r.w for r in out] == [2.0, 4.0, -1.0]
    assert dict(out[0].asDict())  # double type
    assert df.select(
        weighted_score(F.col("score"), F.col("sponsored")).alias("w")
    ).schema["w"].dataType.typeName() == "double"


def test_translator(spark):
    df = spark.createDataFrame([("hola",), (None,)], "name string")
    out = translate_text(df, "name", "name_en", RuleTranslator()).collect()
    assert [r.name_en for r in out] == ["EN:hola", "NA"]


def test_sql_registered_ai_functions(spark):
    """ai_score/ai_translate compose from SQL text (the reference's
    ai_query-in-SQL shape, exploration/analysis.sql:29-37)."""
    from gaming_ai_analytics_spark.functions.scoring import (
        register_sql_functions,
    )

    register_sql_functions(spark)
    spark.createDataFrame(
        [(1, "fast fast big", "de"), (2, "slow", None), (3, "", "fr")],
        ["id", "txt", "lang"],
    ).createOrReplaceTempView("ai_fn_t")
    rows = {
        r.id: (r.s, r.tr)
        for r in spark.sql(
            "SELECT id, ai_score(txt) AS s, ai_translate(lang) AS tr "
            "FROM ai_fn_t"
        ).collect()
    }
    assert rows == {1: (5, "EN:de"), 2: (-2, "NA"), 3: (0, "EN:fr")}
