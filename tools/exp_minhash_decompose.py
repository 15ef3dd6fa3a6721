"""Decompose dedup_minhash_lsh's cost (§1 measure-first): time each
subplan — signatures, band entries, candidate pairs, hashed-shingle
arrays, full query — with the noop sink, cold + median-of-3, at a
given sf dir.

Usage: python tools/exp_minhash_decompose.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from pyspark.sql import functions as F
    from gaming_ai_analytics_spark.operators import dedup as D
    from gaming_ai_analytics_spark.sources.star import load_table
    from gaming_ai_analytics_spark.session import get_spark

    spark = get_spark("exp_minhash_decompose")
    docs = load_table(spark, sf_dir, "documents")

    def subplans():
        d = D.ensure_parallelism(docs)
        sig = D.minhash_signatures(d, "doc_id", "text")
        bands = D._band_entries(d, "doc_id", "text", 3, 64, 16)
        _hint = D._self_join_hinter(d)
        a, b = _hint(bands).alias("a"), _hint(bands).alias("b")
        cand = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col("a._id") < F.col("b._id")),
            )
            .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
            .distinct()
        )
        shs = D._hashed_shingles(d, "doc_id", "text", 3)
        full = D.minhash_lsh_pairs(docs, "doc_id", "text")
        return {
            "signatures": sig,
            "band_entries": bands,
            "candidates_distinct": cand,
            "hashed_shingles": shs,
            "full_query": full,
        }

    out = {"sf_dir": sf_dir}
    for name in subplans():
        subplans()[name].write.format("noop").mode("overwrite").save()  # cold
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            subplans()[name].write.format("noop").mode("overwrite").save()
            runs.append(time.perf_counter() - t0)
        out[name] = round(statistics.median(runs), 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
