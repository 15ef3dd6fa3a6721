"""Incremental-dedup-vs-recompute at sf10 (r7).

The claim behind ``save_minhash_index`` / ``minhash_lsh_pairs_incremental``
(operators/dedup.py): once the corpus is indexed, the nightly dedup
cost tracks the INCREMENT, not the corpus. Measured on the sf10
documents fixture (500 k docs): corpus = 90% indexed once, increment =
10% probed against it, vs the alternative the operator replaces —
re-running full-corpus ``minhash_lsh_pairs`` every night. The probe
runs BEFORE the full pass in the same JVM, so warm-up bias favors the
side we argue AGAINST.

Usage: python tools/exp_incremental_dedup.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = sys.argv[1] if len(sys.argv) > 1 else os.path.join(REPO, ".benchdata", "sf10")


def main() -> None:
    from pyspark.sql import functions as F

    from gaming_ai_analytics_spark.operators.dedup import (
        minhash_lsh_pairs,
        minhash_lsh_pairs_incremental,
        save_minhash_index,
    )
    from gaming_ai_analytics_spark.session import get_spark
    from gaming_ai_analytics_spark.sources.io import TableStore

    spark = get_spark("incremental-dedup")
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet")).filter(
        F.col("text").isNotNull()
    )
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    inc = docs.filter(F.col("doc_id") % 10 == 0)
    n_corpus, n_inc = corpus.count(), inc.count()

    store = TableStore(spark, tempfile.mkdtemp(prefix="gaa_incdedup_"))
    t0 = time.perf_counter()
    t_bands, t_sh = save_minhash_index(
        store, "idx", "sf10docs", corpus, "doc_id", "text"
    )
    build_s = round(time.perf_counter() - t0, 2)
    print(f"index build ({n_corpus:,} docs): {build_s}s", flush=True)

    t0 = time.perf_counter()
    n_pairs_inc = minhash_lsh_pairs_incremental(
        store, "idx", "sf10docs", inc, "doc_id", "text"
    ).count()
    probe_s = round(time.perf_counter() - t0, 2)
    print(f"increment probe ({n_inc:,} docs): {probe_s}s, "
          f"{n_pairs_inc} pairs", flush=True)

    t0 = time.perf_counter()
    n_pairs_full = minhash_lsh_pairs(docs, "doc_id", "text").count()
    full_s = round(time.perf_counter() - t0, 2)
    print(f"full recompute ({n_corpus + n_inc:,} docs): {full_s}s, "
          f"{n_pairs_full} pairs", flush=True)

    for t in (t_bands, t_sh):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
    print(json.dumps({
        "sf_dir": SF, "n_corpus": n_corpus, "n_increment": n_inc,
        "index_build_s": build_s, "probe_s": probe_s,
        "full_recompute_s": full_s,
        "pairs_incremental": n_pairs_inc, "pairs_full": n_pairs_full,
    }))


if __name__ == "__main__":
    main()
