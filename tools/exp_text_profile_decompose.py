"""Decompose text_analysis_profile's per-column cost (§1): time each
output column in isolation (noop sink, cold + median-of-3) at a given
sf dir, plus the full query, plus a let-bound language_id candidate.

Usage: python tools/exp_text_profile_decompose.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import Column, functions as F  # noqa: E402


def language_id_let(col: Column) -> Column:
    """Candidate rewrite: tokens let-bound, one hits count per
    language, argmax by (hits, earliest-language) via struct
    array_max — identical values to the when-chain."""
    from gaming_ai_analytics_spark.functions.expr import let
    from gaming_ai_analytics_spark.functions.text import (
        LANG_MARKERS,
        tokens,
    )

    def body(toks):
        entries = F.array(*[
            F.struct(
                F.size(
                    F.filter(toks, lambda t: t.isin(*LANG_MARKERS[lang]))
                ).alias("h"),
                F.lit(-i).alias("ni"),
                F.lit(lang).alias("lang"),
            )
            for i, lang in enumerate(LANG_MARKERS)
        ])
        best = F.array_max(entries)
        return F.when(best["h"] > 0, best["lang"]).otherwise(F.lit("und"))

    return let(tokens(F.lower(col)), body)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from gaming_ai_analytics_spark.functions.text import (
        bpe_ish_token_count,
        doc_fingerprint,
        language_id,
        quality_score,
        token_count,
    )
    from gaming_ai_analytics_spark.operators.parallelism import (
        ensure_parallelism,
    )
    from gaming_ai_analytics_spark.sources.star import load_table
    from gaming_ai_analytics_spark.session import get_spark

    spark = get_spark("exp_text_profile")
    docs = ensure_parallelism(load_table(spark, sf_dir, "documents"))
    t = F.col("text")
    cols = {
        "n_tokens": token_count(t),
        "n_bpe_tokens": bpe_ish_token_count(t),
        "quality": quality_score(t),
        "lang_guess": language_id(t),
        "lang_guess_let": language_id_let(t),
        "fingerprint": doc_fingerprint(t),
    }

    # parity for the language_id candidate
    mism = (
        docs.filter(t.isNotNull())
        .select(
            language_id(t).alias("a"), language_id_let(t).alias("b")
        )
        .filter("a <> b")
        .count()
    )
    print(f"lang_id parity mismatches: {mism}", flush=True)

    out = {"sf_dir": sf_dir}
    for name, c in cols.items():
        df = docs.filter(t.isNotNull()).select("doc_id", c.alias("x"))
        df.write.format("noop").mode("overwrite").save()
        runs = []
        for _ in range(3):
            df = docs.filter(t.isNotNull()).select("doc_id", c.alias("x"))
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        out[name] = round(statistics.median(runs), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
