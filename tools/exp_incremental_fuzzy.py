"""Incremental-fuzzy-decontamination-vs-recompute at sf10 (r11).

The claim behind ``decontaminate_fuzzy_incremental``
(queries_traindata.py): persist the small static eval side's LSH index
once, and the nightly cost tracks the train INCREMENT — the eval side
is never re-shingled.  Measured on the sf10 documents fixture:
eval = source 'src0' indexed once, increment = 10% of the train side
(doc_id % 10 = 0), vs the alternative the operator replaces —
re-running ``cross_corpus_minhash`` (which re-shingles BOTH sides) on
the same increment every night.  The probe runs BEFORE the full pass
in the same JVM, so warm-up bias favors the side we argue AGAINST.
Value parity between the two paths is asserted before timing.

Usage: python tools/exp_incremental_fuzzy.py [sf_dir]
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
        cross_corpus_minhash,
        minhash_lsh_pairs_incremental,
        save_minhash_index,
    )
    from gaming_ai_analytics_spark.session import get_spark
    from gaming_ai_analytics_spark.sources.io import TableStore

    spark = get_spark("incremental-fuzzy")
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet")).filter(
        F.col("text").isNotNull() & (F.length(F.trim("text")) > 0)
    )
    eval_set = docs.filter(F.col("source") == "src0")
    inc = docs.filter(
        (F.col("source") != "src0") & (F.col("doc_id") % 10 == 0)
    )
    n_eval, n_inc = eval_set.count(), inc.count()

    store = TableStore(spark, tempfile.mkdtemp(prefix="gaa_incfuzzy_"))
    t0 = time.perf_counter()
    save_minhash_index(
        store, "idx", "evalfx", eval_set, "doc_id", "text", num_buckets=8
    )
    t_build = time.perf_counter() - t0

    def readout(pairs):
        return pairs.groupBy(F.col("id_new").alias("doc_id")).agg(
            F.count(F.lit(1)).alias("n_eval_matches"),
            F.max("jaccard").alias("max_jaccard"),
        )

    # value parity gate (one run each, not timed)
    inc_rows = {
        r.doc_id: (r.n_eval_matches, round(r.max_jaccard, 6))
        for r in readout(
            minhash_lsh_pairs_incremental(
                store, "idx", "evalfx", inc, "doc_id", "text", threshold=0.5
            )
        ).collect()
    }
    full_rows = {
        r.doc_id: (r.n_eval_matches, round(r.max_jaccard, 6))
        for r in cross_corpus_minhash(
            inc, eval_set, "doc_id", "text", k=3, threshold=0.5
        ).collect()
    }
    assert inc_rows == full_rows, (
        len(inc_rows), len(full_rows),
        dict(list(inc_rows.items())[:3]), dict(list(full_rows.items())[:3]),
    )
    print(f"paths agree on {len(inc_rows)} contaminated docs")

    t0 = time.perf_counter()
    readout(
        minhash_lsh_pairs_incremental(
            store, "idx", "evalfx", inc, "doc_id", "text", threshold=0.5
        )
    ).toPandas()
    t_probe = time.perf_counter() - t0

    t0 = time.perf_counter()
    cross_corpus_minhash(
        inc, eval_set, "doc_id", "text", k=3, threshold=0.5
    ).toPandas()
    t_full = time.perf_counter() - t0

    print(json.dumps({
        "sf_dir": SF,
        "n_eval": n_eval,
        "n_increment": n_inc,
        "index_build_once_s": round(t_build, 2),
        "nightly_probe_s": round(t_probe, 2),
        "nightly_full_recompute_s": round(t_full, 2),
    }))


if __name__ == "__main__":
    main()
