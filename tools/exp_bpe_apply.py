"""BPE train-once/apply-nightly decomposition (r11).

The claim behind ``bpe_apply_saved_vocab`` (queries_traindata.py): the
merge-round training is the expensive part of tokenizer costing, and a
persisted word→token-count vocabulary reduces each nightly increment
job to scan → broadcast join → aggregate — the training corpus never
re-scans at apply time.  Measured on the documents fixture:

- ``t_train_save``: BPE_ROUNDS greedy merges over the full corpus'
  word counts + the vocab table write (paid once per tokenizer
  release);
- ``t_apply``: price ONE nightly increment (doc_id % 10 = 0) from the
  saved table (the recurring cost);
- ``t_inquery``: what the nightly job costs WITHOUT the saved vocab —
  the in-query shape that re-trains per invocation
  (`bpe_fertility_by_lang`'s plan restricted to the increment).

The apply path is timed BEFORE the in-query pass in the same JVM so
warm-up bias favors the side we argue against.  Value parity between
the two paths is asserted before timing.

Usage: python tools/exp_bpe_apply.py [sf_dir]
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

    from gaming_ai_analytics_spark import registry
    from gaming_ai_analytics_spark.functions.text import tokens
    from gaming_ai_analytics_spark.session import get_spark
    from gaming_ai_analytics_spark.sources.io import TableStore

    registry.queries()  # load query modules (circular-import guard)
    import gaming_ai_analytics_spark.queries_traindata as qt

    spark = get_spark("bpe-apply")
    docs = spark.read.parquet(os.path.join(SF, "documents.parquet")).filter(
        F.col("text").isNotNull() & (F.length(F.trim("text")) > 0)
    )
    increment = docs.filter(F.col("doc_id") % 10 == 0)

    def price(vocab_df):
        words = increment.select(
            "source", F.explode(tokens(F.col("text"))).alias("w")
        )
        return (
            words.join(F.broadcast(vocab_df), "w")
            .groupBy("source")
            .agg(
                F.count(F.lit(1)).alias("n_words"),
                F.sum("n_tok").cast("long").alias("n_bpe_tokens"),
            )
        )

    store = TableStore(spark, tempfile.mkdtemp(prefix="gaa_bpeapply_"))

    # --- pay training + persist once -------------------------------
    t0 = time.perf_counter()
    wc = docs.select(F.explode(tokens(F.col("text"))).alias("w")).groupBy(
        "w"
    ).agg(F.count(F.lit(1)).alias("f"))
    _, state = qt.bpe_train(wc, qt.BPE_ROUNDS, return_state=True)
    store.save(
        "tok",
        "word_tokens_fx",
        state.select(
            "w", F.size(F.split("seg", qt._BPE_SEP)).alias("n_tok")
        ),
    )
    t_train_save = time.perf_counter() - t0

    saved = store.load("tok", "word_tokens_fx")

    # --- value parity: saved-vocab pricing == in-query pricing -----
    fresh_vocab = state.select(
        "w", F.size(F.split("seg", qt._BPE_SEP)).alias("n_tok")
    )
    a = {tuple(r) for r in price(saved).collect()}
    b = {tuple(r) for r in price(fresh_vocab).collect()}
    assert a == b, "saved-vocab pricing diverged from in-query pricing"

    # --- nightly apply from the saved table ------------------------
    t0 = time.perf_counter()
    price(saved).toPandas()
    t_apply = time.perf_counter() - t0

    # --- the alternative: re-train in the nightly job --------------
    t0 = time.perf_counter()
    wc2 = docs.select(F.explode(tokens(F.col("text"))).alias("w")).groupBy(
        "w"
    ).agg(F.count(F.lit(1)).alias("f"))
    _, state2 = qt.bpe_train(wc2, qt.BPE_ROUNDS, return_state=True)
    price(
        state2.select(
            "w", F.size(F.split("seg", qt._BPE_SEP)).alias("n_tok")
        )
    ).toPandas()
    t_inquery = time.perf_counter() - t0

    print(
        json.dumps(
            {
                "sf_dir": SF,
                "t_train_save": round(t_train_save, 2),
                "t_apply_saved": round(t_apply, 2),
                "t_nightly_inquery": round(t_inquery, 2),
                "load_end": os.getloadavg()[0],
            }
        )
    )


if __name__ == "__main__":
    main()
