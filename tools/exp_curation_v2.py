"""curation-v2 decomposition (r12): the stage-boundary materialization
A/B the query docstring claims, plus a per-stage cost split.

Arm MATERIALIZED is the registered plan: the span-cleaned corpus is
written once (TableStore parquet) and the four downstream consumers
(pair-generation self-join, quality argmax, survivor anti-join, BPE
pricing) read it back.  Arm REDERIVED threads the cleaned DataFrame
through by lineage instead — every consumer re-executes the
five-shuffle ExactSubstr subplan.  Same values; the A/B is the cost of
NOT checkpointing a stage a DAG consumes four times.

Usage: python tools/exp_curation_v2.py [sf_dir] [arm ...]
arms: materialized rederived stages   (default: all three)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
    REPO, ".benchdata", "sf1"
)


def _stages(spark, sf_dir, materialize: bool):
    """Build the chain, returning (survivors, priced_base) frames; the
    span-removal output is either saved+reloaded or threaded by
    lineage."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from gaming_ai_analytics_spark.functions.text import (
        mean_word_length,
        punctuation_ratio,
        quality_score,
        stopword_ratio,
        token_count,
        tokens,
    )
    from gaming_ai_analytics_spark.operators.dedup import (
        ngram_jaccard_pairs,
        remove_duplicate_spans,
    )
    from gaming_ai_analytics_spark.operators.graph import dedup_clusters
    from gaming_ai_analytics_spark.queries_traindata import (
        BPE_ROUNDS,
        _BPE_SEP,
        _docs,
        _word_counts,
        bpe_train,
        split_assign,
    )
    from gaming_ai_analytics_spark.sources.io import TableStore

    t = F.col("text")
    gated = _docs(spark, sf_dir).filter(
        token_count(t).cast("int").between(5, 100_000)
        & F.round(mean_word_length(t) + 5e-10, 4).between(2.0, 12.0)
        & (F.round(punctuation_ratio(t) + 5e-10, 4) < 0.3)
        & (F.round(stopword_ratio(t) + 5e-10, 4) > 0.01)
    )
    cleaned = remove_duplicate_spans(gated, carry=("source",)).select(
        "doc_id", "source", "n_removed",
        F.col("cleaned_text").alias("text"),
    )
    if materialize:
        import tempfile

        wh = tempfile.mkdtemp(prefix="gaa_curv2_exp_")
        store = TableStore(spark, wh)
        store.save("cur", "cleaned_fx", cleaned, mode="overwrite")
        cl = store.load("cur", "cleaned_fx")
    else:
        cl = cleaned
    q = quality_score(F.col("text"))
    pairs = ngram_jaccard_pairs(cl, "doc_id", "text", k=3, threshold=0.5)
    clusters = dedup_clusters(pairs, "id_a", "id_b")
    members = cl.select("doc_id", q.alias("_q")).join(
        F.broadcast(clusters), "doc_id"
    )
    w = Window.partitionBy("cluster_id").orderBy(F.desc("_q"), "doc_id")
    losers = (
        members.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") > 1)
        .select("doc_id")
    )
    survivors = cl.join(F.broadcast(losers), "doc_id", "left_anti")
    _, state = bpe_train(
        _word_counts(spark, sf_dir), BPE_ROUNDS, return_state=True
    )
    word_tokens = state.select(
        "w", F.size(F.split("seg", _BPE_SEP)).alias("_n_tok")
    )
    priced = (
        survivors.select(
            "doc_id", F.explode(tokens(F.col("text"))).alias("w")
        )
        .join(F.broadcast(word_tokens), "w")
        .groupBy("doc_id")
        .agg(F.sum("_n_tok").cast("long").alias("n_bpe_tokens"))
    )
    base = survivors.select(
        "doc_id", "source",
        split_assign(F.col("doc_id")).alias("split"),
        (F.col("doc_id") % 8).cast("int").alias("shard"),
        q.alias("quality"), "n_removed",
    ).join(priced, "doc_id")
    wpk = Window.partitionBy("split", "shard").orderBy("doc_id")
    cum = F.sum("n_bpe_tokens").over(wpk)
    return base.select(
        "doc_id", "split",
        ((cum - F.col("n_bpe_tokens")) / 4096).cast("int").alias("seq_id"),
    )


def main() -> None:
    from gaming_ai_analytics_spark.session import get_spark

    spark = get_spark("exp-curation-v2")
    arms = sys.argv[2:] or ["materialized", "rederived", "stages"]
    out = {}
    for arm in arms:
        if arm == "stages":
            # per-stage split of the registered query's construction +
            # execution, via the module's own pieces
            from gaming_ai_analytics_spark.queries_traindata import (
                q_traindata_curation_v2,
            )

            t0 = time.perf_counter()
            df = q_traindata_curation_v2(spark, SF)
            t1 = time.perf_counter()
            n = df.count()
            t2 = time.perf_counter()
            # NOTE: construction executes gate + span removal + the
            # stage-boundary save + BPE train + the CC driver loop
            # (dedup_clusters checkpoints per round); only the final
            # argmax/price/pack plan stays lazy for the count.
            out["stages"] = {
                "construct_s (gate+span_save+bpe_train+pairs+cc)":
                    round(t1 - t0, 2),
                "execute_s (argmax+price+pack)": round(t2 - t1, 2),
                "rows": n,
            }
        else:
            t0 = time.perf_counter()
            n = _stages(spark, SF, materialize=(arm == "materialized")).count()
            out[arm] = {"wall_s": round(time.perf_counter() - t0, 2),
                        "rows": n}
        print(arm, out[arm], flush=True)
    print(json.dumps({"sf_dir": SF, "results": out}))


if __name__ == "__main__":
    main()
