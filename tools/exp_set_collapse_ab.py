"""r14 identical-set collapse — measured and REJECTED; this tool holds
the rejected arm so the refutation stays reproducible.

Hypothesis (guide §1.2/§2.3/§8): set similarity depends only on the
shingle SET, so grouping documents by their exact shingle array and
running the quadratic posting self-join once per distinct set (then
fanning the verdict back out to members) shrinks the join input by the
duplication factor and the pair-enumeration mass by its square.

Verdict: byte-identical output at sf0.001/0.01/0.1/1 (verify mode
below), but 0.76× at sf1 — every benchable corpus here is deliberately
duplicate-free (tools/make_scaled_sf.py salts each replica's text with
' #<i>' precisely so pair output does not grow K²; measured 49 920
distinct sets / 50 000 docs at sf1, 4 992/5 000 at sf0.1), so the
group exchange + collect_list (ObjectHashAggregate over array keys)
buy nothing back. Kept out of the operator; on a genuinely
duplicate-heavy corpus this is the first move and the arm below is the
implementation to lift.

Usage:
  python tools/exp_set_collapse_ab.py verify <sf_dir> [<sf_dir> ...]
  python tools/exp_set_collapse_ab.py time <sf_dir> [rounds]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from gaming_ai_analytics_spark.operators.dedup import (  # noqa: E402
    _self_join_hinter,
    ngram_jaccard_pairs,
)
from gaming_ai_analytics_spark.operators.parallelism import (  # noqa: E402
    ensure_parallelism,
)
from gaming_ai_analytics_spark.functions.text import word_shingles  # noqa: E402
from gaming_ai_analytics_spark.session import get_spark  # noqa: E402


def collapse_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, k: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """The rejected identical-set-collapse arm (byte-identical to
    ngram_jaccard_pairs; see module docstring)."""
    base = ensure_parallelism(df).select(
        F.col(id_col).alias("_id"),
        word_shingles(F.col(text_col), k).alias("_arr"),
    )
    grouped = base.groupBy("_arr").agg(
        F.array_sort(F.collect_list("_id")).alias("_ids")
    )
    sh = grouped.select(
        F.array_min("_ids").alias("_id"),
        F.size("_arr").alias("_n"),
        "_ids",
        F.explode_outer("_arr").alias("_sh"),
    )
    _hint = _self_join_hinter(df)
    jac = F.col("_common") / (F.col("_na") + F.col("_nb") - F.col("_common"))
    a, b = _hint(sh).alias("a"), _hint(sh).alias("b")
    length_ok = F.least(F.col("a._n"), F.col("b._n")) >= (
        F.lit(float(threshold) - 1e-6)
        * F.greatest(F.col("a._n"), F.col("b._n"))
    )
    common = (
        a.join(
            b,
            (F.col("a._sh") == F.col("b._sh"))
            & (F.col("a._id") < F.col("b._id"))
            & length_ok,
        )
        .groupBy(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._n").alias("_na"),
            F.col("b._n").alias("_nb"),
            F.col("a._ids").alias("_ids_a"),
            F.col("b._ids").alias("_ids_b"),
        )
        .agg(F.count(F.lit(1)).alias("_common"))
    )
    cross = (
        common.withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("jaccard", F.explode("_ids_a").alias("_x"), "_ids_b")
        .select("jaccard", "_x", F.explode("_ids_b").alias("_y"))
        .select(
            F.least("_x", "_y").alias("id_a"),
            F.greatest("_x", "_y").alias("id_b"),
            "jaccard",
        )
    )
    if threshold > 1.0:  # no pair can qualify within a group
        return cross
    pairs = F.flatten(
        F.transform(
            "_ids",
            lambda x: F.transform(
                F.filter(F.col("_ids"), lambda y: y > x),
                lambda y: F.struct(x.alias("_x"), y.alias("_y")),
            ),
        )
    )
    within = (
        grouped.filter((F.size("_ids") >= 2) & (F.size("_arr") >= 1))
        .select(F.explode(pairs).alias("_p"))
        .select(
            F.col("_p._x").alias("id_a"),
            F.col("_p._y").alias("id_b"),
            F.lit(1.0).alias("jaccard"),
        )
    )
    return cross.unionByName(within)


def rows_of(df: DataFrame) -> list[tuple]:
    return sorted(tuple(r) for r in df.collect())


def verify(spark, sf_dirs: list[str]) -> None:
    ok = True
    for sf_dir in sf_dirs:
        docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        for thr in (0.5, 0.3):
            h = rows_of(ngram_jaccard_pairs(docs, "doc_id", "text", 3, thr))
            c = rows_of(collapse_jaccard_pairs(docs, "doc_id", "text", 3, thr))
            same = h == c
            ok = ok and same
            print(f"{sf_dir} t={thr}: head={len(h)} collapse={len(c)} "
                  f"{'IDENTICAL' if same else 'MISMATCH'}")
    print("VERIFY:", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


def noop(df: DataFrame) -> None:
    df.write.format("noop").mode("overwrite").save()


def timed(spark, sf_dir: str, rounds: int) -> None:
    docs_path = os.path.join(sf_dir, "documents.parquet")
    arms = {
        "head": lambda d: ngram_jaccard_pairs(d, "doc_id", "text", 3, 0.5),
        "collapse": lambda d: collapse_jaccard_pairs(d, "doc_id", "text", 3, 0.5),
    }
    for name, fn in arms.items():  # cold both arms once
        noop(fn(spark.read.parquet(docs_path)))
    results: dict[str, list[float]] = {n: [] for n in arms}
    for r in range(rounds):
        for name, fn in arms.items():
            spark.sparkContext.setJobDescription(f"collapse-ab {name} r{r}")
            t0 = time.perf_counter()
            noop(fn(spark.read.parquet(docs_path)))  # fresh lineage
            results[name].append(time.perf_counter() - t0)
            print(f"round {r} {name}: {results[name][-1]:.3f}s", flush=True)
    for name, runs in results.items():
        print(f"{name}: median {statistics.median(runs):.3f}s runs="
              f"{[round(x, 3) for x in runs]}")
    print(f"speedup head/collapse: "
          f"{statistics.median(results['head'])/statistics.median(results['collapse']):.2f}x")


if __name__ == "__main__":
    mode = sys.argv[1]
    spark = get_spark("exp_set_collapse_ab")
    if mode == "verify":
        verify(spark, sys.argv[2:])
    else:
        timed(spark, sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 3)
