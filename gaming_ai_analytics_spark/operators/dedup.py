"""Deduplication operators — exact through approximate, at scale.

Extension surface (SURVEY §2.11): the training-data-pipeline dedup
ladder. No reference analog beyond the key-based anti-join
(reviews_fact.py:151-153, covered in operators.joins); everything here
is the standard large-corpus design expressed Spark-first:

- exact: hash-groupBy on a normalized-text fingerprint (one shuffle).
- n-gram Jaccard: inverted-index self-join on shingles — the exact
  pairwise formulation; quadratic only within a shingle's posting
  list, so hot shingles can be capped (``max_shingle_df``).
- MinHash + LSH: shingle→minhash signature→banding→bucket join —
  candidate generation is linear-ish in corpus size; candidates are
  verified with exact Jaccard. The 100 TB path.
- SimHash: 64-bit token-hash sign aggregation; near-dup = small
  Hamming distance, banded for blocking. Pure built-ins (explode +
  bit ops), no Python.
- embedding cosine: exact pairwise over id<id (oracle-checkable) and
  a random-hyperplane LSH bucketed variant (scale path).

All hash functions are ``xxhash64`` (JVM built-in, deterministic,
seedable via a literal prefix column) — no Python ``hash()``
(PYTHONHASHSEED-dependent) anywhere.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from gaming_ai_analytics_spark.functions.text import (
    doc_fingerprint,
    tokens,
    word_shingles,
)
from gaming_ai_analytics_spark.functions.vectors import dot
from gaming_ai_analytics_spark.operators.parallelism import ensure_parallelism


#: Below this Catalyst estimate of the SOURCE frame, join strategy is
#: left to the planner: even a ~20× exploded broadcast build is then
#: ≤ ~100 MB and measured faster (BASELINE.md §3: minhash sf0.1
#: 1.0 s planner vs 1.8 s hinted).  At or above it, the estimate can
#: no longer be trusted THROUGH an explode (fan-out is invisible to
#: sizeInBytes, so the planner broadcast a ~3.3 GiB exploded posting
#: frame at sf10 and OOMed) and every self-join in this module is
#: pinned shuffle_hash.  Unknown sizes (LocalRelation reports
#: Long.MaxValue; any py4j hiccup returns None) take the scale-safe
#: hint path — which also means unit tests on createDataFrame inputs
#: exercise the hinted plans while the sf0.01/sf0.1 driver runs
#: exercise the planner path, covering both.
PLANNER_TRUST_MAX_BYTES = 4 << 20

#: Source-size gate for routing exact containment through the lossless
#: PPJoin prefix tier (see containment_pairs, r14 note): the prefix
#: tier pays fixed corpus-wide window + checkpoint overhead but its
#: candidate/verify cost grows with the PRUNED candidate set, while
#: the count-from-join tier's pair aggregate grows with EVERY
#: colliding pair (no sound length filter exists for the asymmetric
#: measure). Units are Catalyst sizeInBytes ESTIMATES (post-filter
#: compressed-scan bytes — the same currency as
#: PLANNER_TRUST_MAX_BYTES), not raw file sizes. Measured crossover
#: on this corpus family sits between sf0.1 (estimate 0.59 MB, files
#: 26 MB: 1.88 s count-from-join vs 2.73 s prefix) and sf1 (estimate
#: 5.8 MB, files 260 MB: 49.3 s vs 21.6 s); 4 MB splits it, and
#: matching the planner-trust gate means the prefix tier engages
#: exactly where this module stops trusting toy-size planning.
CONTAINMENT_PREFIX_MIN_BYTES = 4 << 20


def _source_bytes(df: DataFrame) -> int | None:
    """Catalyst's size estimate for ``df``'s optimized plan (file-scan
    bytes for parquet sources), or None when unavailable."""
    try:
        return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:  # noqa: BLE001 — internal API; unknown = big
        return None


def _self_join_hinter(df: DataFrame, strategy: str = "shuffle_hash"):
    """Return a frame-wrapper pinning a join strategy on the module's
    corpus-sized self-joins unless the source is provably toy-sized
    (see PLANNER_TRUST_MAX_BYTES).  ``shuffle_hash`` (default) for
    joins whose per-partition build side is modest (candidate pairs,
    per-doc array lookups); ``merge`` for joins of two FULL posting
    frames, where a shuffle-hash build map is itself corpus-scale per
    partition (the r8 sf10 heap-OOM class) — sort-merge spills to
    disk instead."""
    size = _source_bytes(df)
    if size is not None and size < PLANNER_TRUST_MAX_BYTES:
        return lambda frame: frame
    return lambda frame: frame.hint(strategy)


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------
def exact_dedup(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Exact duplicate removal (nondeterministic representative) —
    ``dropDuplicates``: map-side partial dedup, then one shuffle."""
    return df.dropDuplicates(cols) if cols else df.dropDuplicates()


def exact_dedup_canonical(
    df: DataFrame, key_col: str, text_col: str
) -> DataFrame:
    """Exact text dedup with a *deterministic* representative: rows
    grouped by normalized-text fingerprint, lowest key survives.
    Window row_number, one shuffle on the fingerprint."""
    fp = doc_fingerprint(F.col(text_col)).alias("_fp")
    w = Window.partitionBy("_fp").orderBy(F.col(key_col))
    return (
        df.select("*", fp)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_fp", "_rn")
    )


# --------------------------------------------------------------------------
# n-gram Jaccard (exact pairwise via inverted index)
# --------------------------------------------------------------------------
def _surviving_postings_and_sizes(
    df: DataFrame, id_col: str, text_col: str, k: int, max_shingle_df: int
) -> tuple[DataFrame, DataFrame]:
    """Legacy stop-shingle scaffold shared by both exact tiers
    (ADVICE r13): postings with document frequency ≤ ``max_shingle_df``
    plus the per-doc SURVIVING-posting counts (which is why this path
    keeps the aggregate-and-join shape rather than carried sizes)."""
    sh = ensure_parallelism(df).select(
        F.col(id_col).alias("_id"),
        F.explode(word_shingles(F.col(text_col), k)).alias("_sh"),
    ).withColumn(
        "_df", F.count(F.lit(1)).over(Window.partitionBy("_sh"))
    ).filter(F.col("_df") <= max_shingle_df).drop("_df")
    sizes = sh.groupBy("_id").agg(F.count(F.lit(1)).alias("_n"))
    return sh, sizes


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """All document pairs with shingle-Jaccard ≥ threshold.

    Inverted-index formulation: explode distinct k-shingles, self-join
    postings (id_a < id_b), count common shingles per pair, then
    |A∪B| = |A| + |B| − common. Exact — the oracle for the LSH variant.

    ``max_shingle_df`` drops shingles appearing in more than N docs
    (stop-shingles create quadratic posting lists at corpus scale;
    dropping them is the standard recall-safe-ish cap — pairs sharing
    ONLY ubiquitous shingles are the ones you didn't want anyway).

    The posting self-join carries an explicit SHUFFLE_HASH hint above
    the toy-corpus gate (``PLANNER_TRUST_MAX_BYTES``) — the one class
    of places this library overrides the planner's join choice, found
    the hard way by the r7 sf10 probe: Catalyst estimates the join
    input from the PRE-explode scan/exchange bytes (explode fan-out
    is invisible to stats, and AQE measures the stage BEFORE the
    explode too), so at 6M docs it statically broadcast a ~3.3 GiB
    exploded posting frame that fit "under 64 MB" on paper and OOMed
    the JVM.  A posting list is corpus-sized by construction —
    broadcasting it can never be right at scale; shingle-key
    co-partitioning is the plan the inverted index wants, and
    shuffle-hash beats sort-merge here (no sort of the fat exploded
    frames; per-partition build state is corpus/shuffle-partitions
    sized; AQE still splits skewed keys).  Measured A/B in
    BASELINE.md §3: sf1 minhash 7.3→4.0 s; below the gate the
    planner's broadcast genuinely wins (sf0.1 1.0 vs 1.8 s hinted),
    which is why tiny sources are left alone.

    r13 (no ``max_shingle_df``): the per-doc shingle count is
    ``size(word_shingles(text,k))`` — the shingle array is already
    distinct — so ``|A|``/``|B|`` ride each posting row map-side
    instead of a separate corpus-sized ``groupBy(_id)`` aggregation
    joined back onto the pair frame twice. That removes three
    exchanges (the sizes aggregate plus two shuffles of the PAIR
    stream keyed by id_a then id_b), and makes the exact
    prefix/length filter available INSIDE the posting join:
    ``jaccard ≤ min(|A|,|B|)/max(|A|,|B|)``, so any pair with
    ``min < (t − 1e-6)·max`` can never survive the final
    ``round(jac,6) ≥ t`` filter (round is monotone and HALF_UP:
    ``jac ≤ min/max < t−1e-6 ⟹ round(jac,6) < t``) and is dropped
    before the pair exchange — candidate pruning with zero recall
    loss. With ``max_shingle_df`` the doc size must count SURVIVING
    postings, so that path keeps the aggregate-and-join shape.

    r14, two measured-and-rejected rewrites (numbers in
    OPTIMIZATION_r14.md): (1) identical-set collapse — group docs by
    their exact shingle array, pair representatives, fan members back
    out; byte-identical and sound, but every benchable corpus here is
    deliberately duplicate-free (make_scaled_sf salts replica text
    precisely so pair output does not grow K²), so it measured 0.76×
    at sf1 (the group exchange and collect_list pay for nothing) and
    was reverted — tools/exp_set_collapse_ab.py holds both arms.
    (2) PPJoin prefix positions for this tier: with t = 0.5 a
    hash-order prefix cuts the enumeration mass only ~2.1× (DuckDB
    posting analysis) while forcing per-candidate array verification
    of ~50× more pairs than the final answer — the count-from-join
    formulation needs full postings on both sides, and this corpus's
    saturated template vocabulary keeps lossless prefix candidates
    within ~2× of all colliding pairs.
    """
    _hint = _self_join_hinter(df)
    jac = F.col("_common") / (F.col("_na") + F.col("_nb") - F.col("_common"))

    if max_shingle_df is not None:
        sh, sizes = _surviving_postings_and_sizes(
            df, id_col, text_col, k, max_shingle_df
        )
        a, b = _hint(sh).alias("a"), _hint(sh).alias("b")
        common = (
            a.join(b, (F.col("a._sh") == F.col("b._sh")) & (F.col("a._id") < F.col("b._id")))
            .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
            .agg(F.count(F.lit(1)).alias("_common"))
        )
        # sizes is |corpus| rows — hinted for the same reason as the
        # posting join (a broadcast build map of every doc id cannot be
        # right at scale; AQE keeps the small-SF cost negligible)
        sa = _hint(sizes).select(
            F.col("_id").alias("id_a"), F.col("_n").alias("_na")
        )
        sb = _hint(sizes).select(
            F.col("_id").alias("id_b"), F.col("_n").alias("_nb")
        )
        return (
            common.join(sa, "id_a")
            .join(sb, "id_b")
            .withColumn("jaccard", F.round(jac, 6))
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard")
        )

    # fast path: sizes carried on the posting rows (array built once in
    # the child Project — CollapseProject keeps multiply-referenced
    # non-cheap aliases un-inlined, verified in plans/r13/).
    # explode_OUTER, deliberately: plain explode lets
    # InferFiltersFromGenerate synthesize `size(arr)>0 AND
    # isnotnull(arr)` with the whole shingle expression re-inlined
    # TWICE, and push it below the parallelize exchange — the corpus
    # was tokenized 3× per side, two of them single-threaded in the
    # scan stage (plans/r13/dedup_ngram_jaccard_*.txt). Outer explode
    # blocks that inference; the no-shingle rows it keeps emit one
    # null _sh each, dropped for free by the join key's inferred
    # isnotnull above the Generate.
    base = ensure_parallelism(df).select(
        F.col(id_col).alias("_id"),
        word_shingles(F.col(text_col), k).alias("_arr"),
    )
    sh = base.select(
        "_id", F.size("_arr").alias("_n"), F.explode_outer("_arr").alias("_sh")
    )
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
        )
        .agg(F.count(F.lit(1)).alias("_common"))
    )
    return (
        common.withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


# --------------------------------------------------------------------------
# cross-corpus contamination (train vs eval overlap)
# --------------------------------------------------------------------------
def cross_corpus_overlap(
    train: DataFrame,
    eval_set: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Benchmark-decontamination primitive: train documents that share
    at least one distinct k-word shingle with any eval document, with
    the overlap evidence (`n_overlap_shingles` distinct shared shingles,
    `n_eval_docs` distinct eval docs hit).

    Inverted-index join on the shingle key — never all-pairs. The eval
    side (benchmark suites: thousands of docs, not billions) is tiny
    relative to train, so its postings broadcast and the train side
    joins map-only with no shuffle of the train postings; set
    ``broadcast_eval=False`` if the eval corpus is genuinely large and
    let AQE pick the strategy on the shuffled join.
    """
    tr = ensure_parallelism(train).select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_shingles(F.col(text_col), k)).alias("_sh"),
    )
    ev = eval_set.select(
        F.col(id_col).alias("_eval_id"),
        F.explode(word_shingles(F.col(text_col), k)).alias("_sh"),
    )
    if broadcast_eval:
        ev = F.broadcast(ev)
    return (
        tr.join(ev, "_sh")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("_sh").alias("n_overlap_shingles"),
            F.countDistinct("_eval_id").alias("n_eval_docs"),
        )
    )


# --------------------------------------------------------------------------
# MinHash + LSH (the 100 TB near-dup path)
# --------------------------------------------------------------------------
from gaming_ai_analytics_spark.functions.expr import let as _let  # noqa: E402
# (kept under the old name — operators.similarity imports it from here)


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    num_hashes: int = 64,
) -> DataFrame:
    """Per-doc MinHash signature, computed entirely per-row (NO
    shuffle): for seed i, min over the shingle array of
    xxhash64(i, shingle-hash), via nested transform/array_min
    higher-order functions. Stays inside whole-stage codegen; at
    100 TB this is a map-only stage, vs the explode+groupBy
    formulation which shuffles one row per (doc, shingle). Each
    shingle string is hashed to a long ONCE (inner let), so the
    num_hashes-seed battery rehashes 8-byte longs instead of re-running
    the string hash per seed — ~20% cheaper end-to-end. (A wrapping
    h1+i·h2 affine family would halve the hash work again but ANSI
    mode forbids overflowing long arithmetic, and try_add's
    null-on-overflow corrupts the min.)"""
    sig = _let(
        _let(
            word_shingles(F.col(text_col), k),
            lambda shs: F.transform(shs, lambda s: F.xxhash64(s)),
        ),
        lambda hs: F.transform(
            F.sequence(F.lit(0), F.lit(num_hashes - 1)),
            lambda i: F.array_min(F.transform(hs, lambda h: F.xxhash64(i, h))),
        ),
    )
    # docs with fewer than k tokens have no shingles → no signature
    # (matches the explode formulation, which emitted no rows for them);
    # the filter runs on cheap token count, never the shingle array
    return df.filter(F.size(tokens(F.col(text_col))) >= k).select(
        F.col(id_col).alias("_id"), sig.alias("signature")
    )


def _band_entries(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    num_hashes: int,
    bands: int,
) -> DataFrame:
    """(_id, band, bucket) LSH band entries — the map-only candidate
    key frame both the self-join and the index paths build on."""
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, id_col, text_col, k, num_hashes)

    # let-bind the signature: CollapseProject would otherwise inline
    # the full 64-hash expression into every band reference
    buckets = _let(
        F.col("signature"),
        lambda s: F.transform(
            F.sequence(F.lit(0), F.lit(bands - 1)),
            lambda b: F.xxhash64(F.slice(s, b * rows_per_band + 1, rows_per_band)),
        ),
    )
    return sig.select("_id", F.posexplode(buckets).alias("band", "bucket"))


def _hashed_shingles(
    df: DataFrame, id_col: str, text_col: str, k: int
) -> DataFrame:
    """(_id, _shs) distinct HASHED shingle arrays for exact-Jaccard
    verification: set-Jaccard is preserved under an (effectively)
    injective hash, while the pair join shuffles 8-byte longs instead
    of raw shingle strings (~8× less payload) and
    array_intersect/union compare longs, not strings — measured 2.3×
    on the sf1 verify stage. array_distinct ONCE per doc (a doc
    appears in many candidate pairs; deduping at the source shrinks
    every joined payload and every per-pair set op)."""
    return df.select(
        F.col(id_col).alias("_id"),
        F.array_distinct(
            F.transform(
                word_shingles(F.col(text_col), k), lambda s: F.xxhash64(s)
            )
        ).alias("_shs"),
    )


def _jaccard() -> Column:
    # built lazily: classic-mode Column construction needs a live session
    return F.size(F.array_intersect("_sa", "_sb")) / F.size(
        F.array_union("_sa", "_sb")
    )


def _banded_candidates_with_arrays(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    num_hashes: int,
    bands: int,
    left_name: str,
    right_name: str,
) -> DataFrame:
    """Shared scaffolding of both banded-MinHash tiers: the
    (band, bucket) candidate self-join plus the two hinted
    shingle-array verify joins — returns distinct candidate pairs
    ``(left_name, right_name, _sa, _sb)`` with ``left < right``, ready
    for tier-specific scoring (Jaccard or directed containment).
    Lives in ONE place so a band-join tuning (the hint work this
    module keeps accumulating) cannot silently diverge between tiers.

    shuffle_hash-hinted like ngram_jaccard_pairs' posting join (r7
    sf10 probe): band entries are a bands× EXPLODE of a map-only
    signature frame, so Catalyst's size estimate predates the fan-out
    and at sf10 it statically broadcast all three corpus-sized joins
    in this plan (~GB-scale build maps in an 8g JVM — OOM one notch
    up). Band-bucket co-partitioning is the plan LSH wants anyway;
    AQE still splits skewed buckets. The verify joins carry HASHED
    shingles (see _hashed_shingles); per-doc arrays are corpus-sized
    too — same hint (the array payload makes a broadcast build map
    even fatter than the row count suggests)."""
    df = ensure_parallelism(df)
    band_entries = _band_entries(df, id_col, text_col, k, num_hashes, bands)
    _hint = _self_join_hinter(df)
    a, b = _hint(band_entries).alias("a"), _hint(band_entries).alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias(left_name), F.col("b._id").alias(right_name)
        )
        .distinct()
    )
    shingle_arrays = _hashed_shingles(df, id_col, text_col, k)
    sa = _hint(shingle_arrays).select(
        F.col("_id").alias(left_name), F.col("_shs").alias("_sa")
    )
    sb = _hint(shingle_arrays).select(
        F.col("_id").alias(right_name), F.col("_shs").alias("_sb")
    )
    return candidates.join(sa, left_name).join(sb, right_name)


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.5,
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Near-dup pairs via banded MinHash LSH, verified with exact
    Jaccard (array_intersect/union on the distinct-shingle arrays).

    16 bands × 4 rows ⇒ collision probability 1-(1-j⁴)¹⁶ — ~0.98 at
    j=0.7, ~0.56 at j=0.5: tune bands to the target threshold. The
    bucket join shuffles (band_id, band_hash) keys only; verification
    touches candidate pairs, never the full n² space. Candidate and
    verify scaffolding shared with the containment tier
    (:func:`_banded_candidates_with_arrays`)."""
    scored = _banded_candidates_with_arrays(
        df, id_col, text_col, k, num_hashes, bands, "id_a", "id_b"
    )
    return (
        scored.withColumn("jaccard", F.round(_jaccard(), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """Directed containment pairs over banded-MinHash candidates — the
    100 TB containment path (VERDICT r7 ask #3).

    Candidate generation is exactly :func:`minhash_lsh_pairs`' bucketed
    band join (shuffles (band, bucket) keys only — never all-pairs,
    never the full posting lists the lossless prefix tier needs);
    verification computes EXACT directed containment from the hashed
    shingle arrays (common = |array_intersect|, divided by each side's
    own size, both directions).  Same output columns and arithmetic as
    :func:`containment_pairs`.

    RECALL contract, stated honestly: banding collides pairs by
    JACCARD, and containment-qualifying pairs of similar size have
    J ≥ t/(2−t) (0.67 at t=0.8 → ≥97% band-collision probability at
    16×4), so near-dup-shaped corpora — this fixture included — see
    recall ≈ 1 and the FULL containment oracle passes.  The pairs
    banding structurally under-recalls are the strongly ASYMMETRIC
    ones (small doc quoted inside a 10×-larger one: c ≈ 1, J ≈ 0.1);
    for those use :func:`containment_pairs_prefix` (lossless) where
    data volume allows, or an asymmetric-LSH scheme.  Measured sf10:
    completes where both exact-pair plans exceed single-host disk."""
    scored = _banded_candidates_with_arrays(
        df, id_col, text_col, k, num_hashes, bands, "_ia", "_ib"
    ).select(
        "_ia",
        "_ib",
        F.size(F.array_intersect("_sa", "_sb")).alias("_common"),
        F.size("_sa").alias("_na"),
        F.size("_sb").alias("_nb"),
    )
    fwd = scored.select(
        F.col("_ia").alias("id_contained"),
        F.col("_ib").alias("id_container"),
        F.round(F.col("_common") / F.col("_na"), 6).alias("containment"),
    )
    rev = scored.select(
        F.col("_ib").alias("id_contained"),
        F.col("_ia").alias("id_container"),
        F.round(F.col("_common") / F.col("_nb"), 6).alias("containment"),
    )
    return fwd.unionByName(rev).filter(F.col("containment") >= threshold)


# --------------------------------------------------------------------------
# incremental dedup against a persisted LSH index
# --------------------------------------------------------------------------
def save_minhash_index(
    store,
    layer: str,
    name: str,
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    num_buckets: int = 32,
) -> tuple[str, str]:
    """Persist the corpus side of banded MinHash LSH as a reusable
    index: the band entries as a table BUCKETED on (band, bucket) —
    the candidate join key — and the hashed shingle arrays bucketed on
    ``_id`` for verification, plus a one-row parameter table so probes
    can't silently use mismatched hashing. Build once, then dedup
    every nightly increment against it with
    :func:`minhash_lsh_pairs_incremental` — at 100 TB the corpus side
    is never re-shingled, never re-hashed, and (bucketed on the join
    key) never re-shuffled; the per-night cost tracks the increment.
    Same build-once/probe-many shape as the IVF index
    (operators/similarity.py)."""
    spark = df.sparkSession
    t_bands = store.save_bucketed(
        layer,
        f"{name}_lshbands",
        _band_entries(df, id_col, text_col, k, num_hashes, bands),
        ["band", "bucket"],
        num_buckets,
        sort_cols=["band", "bucket"],
    )
    t_sh = store.save_bucketed(
        layer,
        f"{name}_lshshingles",
        _hashed_shingles(df, id_col, text_col, k),
        ["_id"],
        num_buckets,
    )
    store.save(
        layer,
        f"{name}_lshmeta",
        spark.createDataFrame(
            [(k, num_hashes, bands, num_buckets)],
            "k int, num_hashes int, bands int, num_buckets int",
        ),
    )
    return t_bands, t_sh


def minhash_lsh_pairs_incremental(
    store,
    layer: str,
    name: str,
    new_df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-dup pairs between an increment and an indexed corpus
    (:func:`save_minhash_index`), exact-Jaccard-verified — WITHOUT
    touching corpus text: the increment's band entries (map-only)
    join the persisted band table on (band, bucket); the planner may
    freely broadcast the increment side (it IS small — that is the
    ideal plan: zero shuffle on the corpus). Hash parameters come
    from the index's meta table, so a probe can't disagree with the
    build. Returns (id_new, id_corpus, jaccard); ids are assumed
    disjoint between increment and corpus (dedup-the-increment
    semantics — an exact re-ingest is caught upstream by the key
    anti-join).

    The increment side rides the module's explode-aware size gate
    (``PLANNER_TRUST_MAX_BYTES``): its band frame is a bands× explode
    whose fan-out Catalyst's estimate cannot see, so a LARGE increment
    is pinned ``shuffle_hash`` instead of letting the planner broadcast
    a corpus-scale frame (the sf10 OOM class). Bucket the session's
    shuffle partitions to the index's ``num_buckets`` and the hinted
    path re-uses the corpus tables' bucketing too.

    Plan verified at sf0.1 (toy increment, planner path): all three
    joins broadcast the increment; the corpus band/shingle tables scan
    with ZERO exchanges."""
    spark = new_df.sparkSession
    meta = store.load(layer, f"{name}_lshmeta").first()
    idx_bands = spark.table(store.table_name(layer, f"{name}_lshbands"))
    idx_sh = spark.table(store.table_name(layer, f"{name}_lshshingles"))

    _hint = _self_join_hinter(new_df)
    new_bands = _hint(
        _band_entries(
            new_df, id_col, text_col,
            meta["k"], meta["num_hashes"], meta["bands"],
        )
    )
    candidates = (
        new_bands.alias("n")
        .join(
            idx_bands.alias("c"),
            (F.col("n.band") == F.col("c.band"))
            & (F.col("n.bucket") == F.col("c.bucket")),
        )
        .select(
            F.col("n._id").alias("id_new"), F.col("c._id").alias("id_corpus")
        )
        .distinct()
    )
    new_sh = _hint(
        _hashed_shingles(new_df, id_col, text_col, meta["k"])
    ).select(F.col("_id").alias("id_new"), F.col("_shs").alias("_sa"))
    corpus_sh = idx_sh.select(
        F.col("_id").alias("id_corpus"), F.col("_shs").alias("_sb")
    )
    return (
        candidates.join(new_sh, "id_new")
        .join(corpus_sh, "id_corpus")
        .withColumn("jaccard", F.round(_jaccard(), 6))
        .filter(F.col("jaccard") >= threshold)
        .select("id_new", "id_corpus", "jaccard")
    )


def stream_dedup_sink(
    store,
    layer: str,
    name: str,
    survivors_layer: str,
    survivors_name: str,
    id_col: str,
    text_col: str,
    threshold: float = 0.5,
):
    """``foreachBatch`` function for streaming ingestion dedup against
    a :func:`save_minhash_index` index. Per micro-batch:

    1. within-batch survivor pass — near-dup pairs → transitive
       clusters (``dedup_clusters``), min-id canonical survives (the
       SAME rule as the batch ``dedup_survivors`` pass);
    2. provisional survivors probe the index
       (:func:`minhash_lsh_pairs_incremental`) — anything matching the
       corpus is dropped (the corpus doc is the canonical);
    3. survivors append to the clean table AND their band entries /
       shingle arrays append into the index (bucket spec from the
       index meta), so batch N+1 dedups against batch N's survivors —
       first-seen-wins across the whole stream.

    ``foreachBatch`` is AT-LEAST-ONCE: a crash between any append
    below and the checkpoint commit replays the whole batch. The sink
    is exactly-once anyway, via a batch-commit LEDGER plus replay
    guards, at zero steady-state cost:

    - a tiny ``{name}_commits`` table records each batch id BEFORE its
      data appends. The normal path (batch id not yet in the ledger)
      runs no guards at all — the marker's presence on replay proves
      nothing of the batch's data landed, because the marker always
      lands first;
    - a replayed batch (id already in the ledger) re-derives the same
      survivors (min-id canonical, no randomness) and each of the
      three appends anti-joins its destination on the batch's
      (broadcast) id set, back-filling exactly what the crashed
      attempt missed — one destination scan per append, paid ONLY on
      replay. A checkpoint-loss restart (batch ids reset to 0) just
      rides the guard path until ids pass the ledger high-water mark —
      slower, still exactly-once.

    Single-writer assumption (one streaming query per index), as with
    any foreachBatch sink maintaining shared tables. Use as
    ``stream.writeStream.foreachBatch(stream_dedup_sink(...))``;
    replay idempotence is pinned in tests/test_streaming.py."""

    def process(batch_df: DataFrame, batch_id: int) -> None:
        from gaming_ai_analytics_spark.operators.graph import dedup_clusters

        meta = store.load(layer, f"{name}_lshmeta").first()
        ledger = f"{name}_commits"
        spark = batch_df.sparkSession
        if store.exists(layer, ledger):
            replay = (
                store.load(layer, ledger)
                .filter(F.col("batch_id") == batch_id)
                .limit(1)
                .count()
                > 0
            )
        else:
            replay = False
        # marker FIRST: on the fast path its absence proves no data
        # from this batch has landed, so the appends below skip the
        # guard scans entirely
        if not replay:
            store.save(
                layer,
                ledger,
                spark.createDataFrame([(batch_id,)], "batch_id long"),
                mode="append",
            )
        batch_df = batch_df.persist()
        try:
            pairs = minhash_lsh_pairs(
                batch_df,
                id_col,
                text_col,
                meta["k"],
                threshold,
                meta["num_hashes"],
                meta["bands"],
            )
            losers = (
                dedup_clusters(pairs)
                .filter(F.col("doc_id") != F.col("cluster_id"))
                .select(F.col("doc_id").alias(id_col))
            )
            provisional = batch_df.join(
                F.broadcast(losers), id_col, "left_anti"
            )
            matched = (
                minhash_lsh_pairs_incremental(
                    store, layer, name, provisional, id_col, text_col,
                    threshold,
                )
                .select(F.col("id_new").alias(id_col))
                .distinct()
            )
            survivors = provisional.join(
                F.broadcast(matched), id_col, "left_anti"
            ).persist()
            try:
                # Replay guards (guard path only): anti-join each
                # destination's already-landed ids (restricted to this
                # batch via broadcast semi-join) so a partially-
                # committed batch replays to exactly the missing
                # appends, never duplicates.
                surv_ids = survivors.select(id_col).distinct()

                def _fresh(dest: DataFrame, dest_id: str) -> DataFrame:
                    if not replay:
                        return survivors
                    landed = (
                        dest.select(F.col(dest_id).alias(id_col))
                        .join(F.broadcast(surv_ids), id_col, "left_semi")
                        .distinct()
                    )
                    return survivors.join(
                        F.broadcast(landed), id_col, "left_anti"
                    )

                to_clean = survivors
                if replay and store.exists(survivors_layer, survivors_name):
                    to_clean = _fresh(
                        store.load(survivors_layer, survivors_name), id_col
                    )
                store.save(
                    survivors_layer, survivors_name, to_clean, mode="append"
                )
                to_bands = _fresh(
                    spark.table(store.table_name(layer, f"{name}_lshbands")),
                    "_id",
                )
                store.save_bucketed(
                    layer,
                    f"{name}_lshbands",
                    _band_entries(
                        to_bands, id_col, text_col,
                        meta["k"], meta["num_hashes"], meta["bands"],
                    ),
                    ["band", "bucket"],
                    meta["num_buckets"],
                    sort_cols=["band", "bucket"],
                    mode="append",
                )
                to_sh = _fresh(
                    spark.table(
                        store.table_name(layer, f"{name}_lshshingles")
                    ),
                    "_id",
                )
                store.save_bucketed(
                    layer,
                    f"{name}_lshshingles",
                    _hashed_shingles(to_sh, id_col, text_col, meta["k"]),
                    ["_id"],
                    meta["num_buckets"],
                    mode="append",
                )
            finally:
                survivors.unpersist()
        finally:
            batch_df.unpersist()

    return process


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------
def simhash_fingerprints(
    df: DataFrame, id_col: str, text_col: str, bits: int = 64
) -> DataFrame:
    """64-bit SimHash per doc, computed entirely per-row (NO shuffle),
    like the MinHash signatures: token xxhash64 array → one fold
    accumulating all 64 ±1 bit sums in an array accumulator → bit
    reassembly in the finish lambda. The earlier formulation exploded
    tokens ×64 bit-rows and paid two shuffles (groupBy(_id,_i) +
    groupBy(_id)); this is a map-only stage — at 100 TB the first
    exchange in the plan is the LSH candidate join, nothing before it.

    Bit i's mask is a signed-long literal (bit 63 wraps negative), so
    ``h & mask`` needs no variable-distance shift (Spark's shift
    builtins take only literal distances outside SQL text)."""

    def mask(i: int) -> int:  # signed-64 wrap for the sign bit
        m = 1 << i
        return m - (1 << 64) if m >= (1 << 63) else m

    from gaming_ai_analytics_spark.functions.vectors import long_array_lit

    masks = long_array_lit(mask(i) for i in range(bits))
    sig = _let(
        F.transform(tokens(F.col(text_col)), lambda t: F.xxhash64(t)),
        lambda hs: F.aggregate(
            hs,
            F.array_repeat(F.lit(0), bits),
            lambda acc, h: F.zip_with(
                acc,
                masks,
                lambda a, m: a + F.when(h.bitwiseAND(m) != 0, 1).otherwise(-1),
            ),
            lambda acc: F.aggregate(
                F.zip_with(
                    acc,
                    masks,
                    lambda a, m: F.when(a > 0, m).otherwise(F.lit(0).cast("long")),
                ),
                F.lit(0).cast("long"),
                lambda s, x: s + x,
            ),
        ),
    )
    return (
        ensure_parallelism(df)
        .filter(F.size(tokens(F.col(text_col))) >= 1)
        .select(F.col(id_col).alias(id_col), sig.alias("simhash"))
    )


def simhash_near_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ max_hamming.

    Blocking: split the 64-bit fingerprint into ``bands`` 16-bit
    chunks — any pair within Hamming ≤ bands-1 shares at least one
    chunk (pigeonhole), so the bucket join finds all such pairs
    without n² comparisons; the Hamming filter then verifies."""
    fp = simhash_fingerprints(df, id_col, text_col)
    width = 64 // bands
    chunks = fp.select(
        F.col(id_col).alias("_id"),
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(F.col("simhash"), b * width)
                        .bitwiseAND(F.lit((1 << width) - 1))
                        .alias("chunk"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("_id", "simhash", "bb.band", "bb.chunk")

    # shuffle_hash hint: chunks is a bands× explode of a map-only frame —
    # the same post-explode-stats blind spot as the jaccard/minhash
    # joins (r7 sf10 probe); a chunk-blocked self-join must never
    # pick a corpus-sized broadcast build
    _hint = _self_join_hinter(df)
    a, b = _hint(chunks).alias("a"), _hint(chunks).alias("b")
    hamming = F.bit_count(
        F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
    )
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            hamming.alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


# --------------------------------------------------------------------------
# embedding cosine near-dup
# --------------------------------------------------------------------------
#: Upper bound for the Arrow exact tier: the matmul path collects the
#: corpus to the driver, so it engages only while that stays cheap
#: (~10⁵ 64-dim vectors ≈ 50 MB). Past it the exact tier is the wrong
#: tool regardless — the module docstring and the LSH variant are the
#: scale path — and the BNL form at least needs no driver memory.
ARROW_EXACT_MAX_BYTES = 256 << 20


def embedding_cosine_pairs(
    df: DataFrame, id_col: str, vec_col: str, threshold: float = 0.9
) -> DataFrame:
    """Exact pairwise cosine near-dups (id_a < id_b). O(n²) — the
    correctness oracle; use the LSH variant beyond ~10⁵ vectors.

    Two physical strategies by corpus size (same contract):

    - small (< ``ARROW_FANOUT_MIN_BYTES``): broadcast nested-loop join
      with the JVM expression-fold dot — exact oracle parity, zero
      Python. The streamed side is widened first: BNL parallelism is
      the streamed side's split count, and a 1-2-split scan serialized
      the entire n² dot work onto 2 cores (observed hanging the sf1
      sweep).
    - mid (up to ``ARROW_EXACT_MAX_BYTES``): the corpus collects to
      the driver as a matmul matrix and each Arrow batch scores its
      rows against ALL vectors in one numpy call, thresholding INSIDE
      the kernel so only surviving (id_b, cosine) hits cross the Arrow
      boundary — near-dup pairs are sparse, so the n² work stays in
      SIMD and the transfer is O(|hits|), not O(n²). Measured at the
      sf1 sweep's 20k-vector corpus: 111 s (interpreted BNL) → ~3 s.
      Float accumulation order differs from the sequential fold in the
      last ulp; the kernel pre-filters with a 1e-6-wide guard and the
      exact ``round(·, 6) >= threshold`` decision is re-applied JVM-side,
      so a boundary pair is decided by the same rounded test on both
      paths.
    """
    a = ensure_parallelism(
        df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"))
    )
    from gaming_ai_analytics_spark.operators.parallelism import (
        ARROW_FANOUT_MIN_BYTES,
        est_bytes,
    )

    est = est_bytes(a)
    if est >= ARROW_EXACT_MAX_BYTES:
        # Refuse to fall through to the O(n²) theta self-join at
        # corpus scale — that plan is only ever an oracle/test tier.
        # (r5 verdict soft spot: the silent fallback here would let a
        # 100 TB caller run an all-pairs BNL by accident.)
        raise ValueError(
            f"embedding_cosine_pairs is the exact O(n²) tier; corpus "
            f"≈ {est >> 20} MiB exceeds ARROW_EXACT_MAX_BYTES "
            f"({ARROW_EXACT_MAX_BYTES >> 20} MiB). Use "
            "embedding_cosine_pairs_lsh (banded candidate generation "
            "+ exact verification) at this scale."
        )
    if ARROW_FANOUT_MIN_BYTES <= est:
        rows = [
            r
            for r in df.select(F.col(id_col), F.col(vec_col)).collect()
            if r[1] is not None
        ]
        if rows and all(isinstance(r[0], int) for r in rows):
            return _cosine_pairs_arrow(a, rows, threshold, df, id_col)
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"))
    sim = F.round(dot(F.col("_va"), F.col("_vb")), 6)
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", sim)
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def _cosine_pairs_arrow(
    a: DataFrame, rows, threshold: float, df: DataFrame, id_col: str
) -> DataFrame:
    """Arrow matmul tier of :func:`embedding_cosine_pairs`: one numpy
    matmul per batch against the collected corpus, sparse hit structs
    out (see caller docstring for the guard/rounding contract)."""
    from pyspark.sql import types as T

    ids_arr = np.asarray([r[0] for r in rows], dtype=np.int64)
    m = np.ascontiguousarray(
        np.asarray([list(r[1]) for r in rows], dtype=np.float64).T
    )
    guard = threshold - 1e-6  # keep anything that could round up to pass

    @F.pandas_udf(
        T.ArrayType(
            T.StructType(
                [
                    T.StructField("id_b", T.LongType()),
                    T.StructField("c", T.DoubleType()),
                ]
            )
        )
    )
    def _hits(ids_s: pd.Series, vecs: pd.Series) -> pd.Series:
        stacked = np.stack(vecs.to_numpy()).astype(np.float64)  # (b, d)
        sims = stacked @ m  # (b, n)
        out = []
        for rid, row in zip(ids_s.to_numpy(), sims):
            idx = np.nonzero((row >= guard) & (ids_arr > rid))[0]
            out.append(
                [(int(ids_arr[i]), float(row[i])) for i in idx]
            )
        return pd.Series(out)

    id_type = df.schema[id_col].dataType
    return (
        a.filter(F.col("_va").isNotNull())
        .select(
            "id_a", F.explode(_hits(F.col("id_a"), F.col("_va"))).alias("_h")
        )
        .select(
            "id_a",
            F.col("_h.id_b").cast(id_type).alias("id_b"),
            F.round(F.col("_h.c"), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.RandomState(seed)
    planes = rng.randn(n_planes, dim)
    return planes / np.linalg.norm(planes, axis=1, keepdims=True)


def _rhp_signature(vec_col: Column, planes: np.ndarray) -> Column:
    """Random-hyperplane (SRP) signature: bit i = sign(v·pᵢ), packed
    into a long — built from literal plane arrays, all JVM-side.
    The plane matrix and bit masks are single-parse literals
    (functions.vectors.matrix_lit): per-element ``F.lit`` loops cost a
    py4j round-trip each — hundreds of ms of plan time per query."""
    from gaming_ai_analytics_spark.functions.vectors import (
        long_array_lit,
        matrix_lit,
    )

    dots = F.transform(matrix_lit(planes), lambda p: dot(vec_col, p))
    return F.aggregate(
        F.zip_with(
            dots,
            long_array_lit(1 << i for i in range(len(planes))),
            lambda d, m: F.when(d > 0, m).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )


def _rhp_signature_arrow(vec_col: Column, planes: np.ndarray) -> Column:
    """Arrow-kernel SRP signature: ONE numpy matmul per batch computes
    all n_planes dots (functions.vectors.dot_many_pandas — measured
    2.1× over the interpreted higher-order fold at 256k rows), then a
    JVM-side fold packs the sign bits. Float summation order differs
    from the sequential fold in the last ulp, which can flip a sign
    only when |v·p| ≈ 0 — harmless for bucketing (candidates are
    verified with exact cosine downstream)."""
    from gaming_ai_analytics_spark.functions.vectors import (
        dot_many_pandas,
        long_array_lit,
    )

    masks = long_array_lit(1 << i for i in range(len(planes)))
    return F.aggregate(
        F.zip_with(
            dot_many_pandas(vec_col, planes),
            masks,
            lambda d, m: F.when(d > 0, m).otherwise(F.lit(0).cast("long")),
        ),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )


#: Above this estimated row count the Arrow kernel wins over the
#: interpreted expression fold (below it, Arrow transfer + Python
#: worker dispatch dominate). Measured on the 64-dim × 16-plane
#: battery: Arrow is already 2× faster at 2k rows (the per-row work —
#: n_planes interpreted dot folds — is heavy), so the crossover sits
#: low; only genuinely tiny inputs keep the expression form.
ARROW_SIG_MIN_ROWS = 2_000


def _rhp_sig_auto(
    df: DataFrame, vec_col: str, planes: np.ndarray, arrow: bool | None
) -> Column:
    """Pick the SRP signature implementation. ``arrow=None`` decides
    from Catalyst's size statistics (driver-side metadata — no job):
    estimated rows = sizeInBytes / bytes-per-row-lower-bound."""
    if arrow is None:
        size = df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        dim = planes.shape[1]
        arrow = int(str(size)) > ARROW_SIG_MIN_ROWS * (4 * dim)
    fn = _rhp_signature_arrow if arrow else _rhp_signature
    return fn(F.col(vec_col), planes)


def embedding_cosine_pairs_lsh(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.9,
    n_planes: int = 16,
    bands: int = 4,
    dim: int | None = None,
    arrow: bool | None = None,
) -> DataFrame:
    """Scale path: random-hyperplane LSH buckets candidate pairs
    (cosine-similar vectors agree on most hyperplane signs →
    pigeonhole on signature chunks), then exact cosine verifies.
    Deterministic planes (fixed seed) — reruns give identical plans.

    Pass ``dim`` (the vector length) so plan construction stays
    action-free; omitting it falls back to a one-row probe job.
    ``arrow`` selects the SRP signature kernel (None = auto from size
    statistics; see :func:`_rhp_sig_auto`)."""
    if dim is None:  # fallback only — callers should pass the dim
        dim = len(df.select(vec_col).first()[0])
    df = ensure_parallelism(df)
    planes = _hyperplanes(dim, n_planes)
    width = n_planes // bands
    # let-bind the signature: each band reference would otherwise
    # inline (and re-evaluate) the full n_planes-dot expression
    bb = _let(
        _rhp_sig_auto(df, vec_col, planes, arrow),
        lambda s: F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftrightunsigned(s, b * width)
                    .bitwiseAND(F.lit((1 << width) - 1))
                    .alias("chunk"),
                )
                for b in range(bands)
            ]
        ),
    )
    chunks = df.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).alias("_v"),
        F.explode(bb).alias("bb"),
    ).select("_id", "_v", "bb.band", "bb.chunk")

    # shuffle_hash hint: bands× explode carrying the FULL embedding vector —
    # the fattest instance of the post-explode-stats blind spot (r7
    # sf10 probe); a broadcast build here is corpus-size × dim floats
    _hint = _self_join_hinter(df)
    a, b = _hint(chunks).alias("a"), _hint(chunks).alias("b")
    sim = F.round(dot(F.col("a._v"), F.col("b._v")), 6)
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"),
                sim.alias("cosine"))
        .distinct()
        .filter(F.col("cosine") >= threshold)
    )


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Directed shingle-containment pairs (Broder 1997's second
    resemblance measure): c(A→B) = |S(A)∩S(B)| / |S(A)| — "how much of
    A is inside B". Catches the asymmetric near-dups Jaccard
    structurally misses: a document quoted whole inside a 10×-larger
    one has c ≈ 1 but Jaccard ≈ 0.1, so a Jaccard-thresholded dedup
    keeps both and the training corpus still memorizes the quote
    twice. Returns ``(id_contained, id_container, containment)`` with
    each qualifying direction emitted once.

    Same inverted-index plan as :func:`ngram_jaccard_pairs` (explode
    distinct k-shingles, posting self-join on the shingle key with
    the same shuffle_hash gate — see that docstring for why the
    planner cannot be trusted through an explode — count common
    shingles per pair), same ``max_shingle_df`` stop-shingle cap; the
    only change is the final arithmetic: common is divided by each
    side's OWN shingle count instead of the union, and both
    directions are tested. One extra output row per mutually-
    contained pair, no extra shuffle.

    r14: above ``CONTAINMENT_PREFIX_MIN_BYTES`` the default path
    DELEGATES to :func:`containment_pairs_prefix` — lossless, same
    output, and 2.3× faster once collision mass dominates (measured
    sf1: 49.3 → 21.6 s median, interleaved noop A/B). Containment has
    no sound length filter (asymmetric measure), so the count-from-
    join formulation enumerates and aggregates EVERY colliding pair
    (~86 M groups at sf1) where the prefix tier verifies 24.5 M
    candidates; below the gate the fixed window/checkpoint overhead
    of the prefix tier dominates instead (measured sf0.1: 1.88 s
    count-from-join vs 2.73 s prefix; sf0.01: 0.84 vs 1.47 s) and the
    count-from-join shape stays. Unknown source size takes the prefix
    path — same scale-safe default as the join hints.
    """
    if max_shingle_df is None:
        size = _source_bytes(df)
        if size is None or size >= CONTAINMENT_PREFIX_MIN_BYTES:
            return containment_pairs_prefix(df, id_col, text_col, k, threshold)
    _hint = _self_join_hinter(df)
    if max_shingle_df is not None:
        # legacy stop-shingle path: sizes must count SURVIVING
        # postings, so it keeps the aggregate-and-join shape
        sh, sizes = _surviving_postings_and_sizes(
            df, id_col, text_col, k, max_shingle_df
        )
        a, b = _hint(sh).alias("a"), _hint(sh).alias("b")
        common = (
            a.join(
                b,
                (F.col("a._sh") == F.col("b._sh"))
                & (F.col("a._id") < F.col("b._id")),
            )
            .groupBy(
                F.col("a._id").alias("_ia"), F.col("b._id").alias("_ib")
            )
            .agg(F.count(F.lit(1)).alias("_common"))
        )
        sa = _hint(sizes).select(
            F.col("_id").alias("_ia"), F.col("_n").alias("_na")
        )
        sb = _hint(sizes).select(
            F.col("_id").alias("_ib"), F.col("_n").alias("_nb")
        )
        scored = common.join(sa, "_ia").join(sb, "_ib")
        fwd = scored.select(
            F.col("_ia").alias("id_contained"),
            F.col("_ib").alias("id_container"),
            F.round(F.col("_common") / F.col("_na"), 6).alias("containment"),
        )
        rev = scored.select(
            F.col("_ib").alias("id_contained"),
            F.col("_ia").alias("id_container"),
            F.round(F.col("_common") / F.col("_nb"), 6).alias("containment"),
        )
        return fwd.unionByName(rev).filter(
            F.col("containment") >= threshold
        )

    # r13: sizes carried on the posting rows exactly as in
    # ngram_jaccard_pairs (see that docstring) — the sizes
    # aggregate and both attach joins vanish. NO length filter
    # here, deliberately: containment is asymmetric, and the
    # smaller side's direction (common/n_small) can qualify at
    # ANY size ratio, so no size-based prune is sound.
    base = ensure_parallelism(df).select(
        F.col(id_col).alias("_id"),
        word_shingles(F.col(text_col), k).alias("_arr"),
    )
    sh = base.select(
        "_id",
        F.size("_arr").alias("_n"),
        F.explode_outer("_arr").alias("_sh"),
    )
    a, b = _hint(sh).alias("a"), _hint(sh).alias("b")
    scored = (
        a.join(
            b,
            (F.col("a._sh") == F.col("b._sh"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .groupBy(
            F.col("a._id").alias("_ia"),
            F.col("b._id").alias("_ib"),
            F.col("a._n").alias("_na"),
            F.col("b._n").alias("_nb"),
        )
        .agg(F.count(F.lit(1)).alias("_common"))
    )
    fwd = scored.select(
        F.col("_ia").alias("id_contained"),
        F.col("_ib").alias("id_container"),
        F.round(F.col("_common") / F.col("_na"), 6).alias("containment"),
    )
    rev = scored.select(
        F.col("_ib").alias("id_contained"),
        F.col("_ia").alias("id_container"),
        F.round(F.col("_common") / F.col("_nb"), 6).alias("containment"),
    )
    return fwd.unionByName(rev).filter(
        F.col("containment") >= threshold
    )


def containment_pairs_prefix(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.8,
    df_order: bool = True,
) -> DataFrame:
    """Directed containment pairs via PREFIX FILTERING — the bucketed
    scale tier for :func:`containment_pairs` (VERDICT r7 ask #3), and
    LOSSLESS: same output, full oracle.

    The exact tier's posting self-join emits one row per (pair,
    common shingle); on near-dup-heavy corpora that multiplicity is
    ~|shingles-per-doc| per pair, the term that filled single-host
    disk at sf10.  Prefix filtering (Chaudhuri/Ganti/Kaushik SSJoin
    2006; Xiao et al. PPJoin 2008 — public papers) bounds candidate
    generation instead: if c(A→B) = |S(A)∩S(B)|/|S(A)| ≥ t then B
    holds at least ⌈t·nₐ⌉ of A's shingles, so ANY
    (nₐ − ⌈t·nₐ⌉ + 1)-subset of S(A) intersects S(B) — for ANY
    consistent global ordering of the shingle universe.  Index only
    that short prefix — at t = 0.8 one-fifth of each doc — against
    the full posting side; a qualifying pair is guaranteed ≥ 1 prefix
    collision, the PPJoin positional filter (below) kills
    cannot-qualify collisions inside the join, and the exact verify
    (array_intersect on the hashed-shingle arrays, per direction)
    scores only surviving candidates.

    ORDERING — the distributed trade the textbook formulation hides,
    MEASURED at sf1 (50 k docs, checkpointed arrays): PPJoin's
    ascending-global-df order keeps prefixes on the RAREST shingles —
    24.5 M distinct candidates — but costs two corpus-wide posting
    windows (df + per-doc rank: shuffle + sort each).  HASH order
    (``df_order=False``) computes prefix AND positions MAP-ONLY
    (per-doc ``array_sort`` + ``posexplode`` of the already-hashed
    shingles; zero windows) but is rarity-blind: 48.8 M candidates on
    the same corpus — 2.0× worse, because this fixture's text is
    template-generated (36 k distinct shingles, median df 80, i.e.
    boilerplate-heavy, the regime rarity ordering exists for).
    df-order is therefore the DEFAULT; hash order remains the
    low-shuffle option for corpora with flat shingle df.  Both
    orderings are lossless; both are property-tested against brute
    force.  Fixture honesty note: at sf10 the 36 k-shingle vocabulary
    saturates (500 k docs, median shingle df ~800), so the candidate
    stream of ANY lossless shingle method is ≳10⁹ rows and exceeds
    single-host disk; the prefix tier still beats the exact tier by
    the per-pair multiplicity factor (~80 common shingles per pair on
    this corpus — measured: the exact tier's pair join emits ~80×
    these candidate counts), and the sf10-capable containment path is
    :func:`minhash_containment_pairs` (LSH candidates, exact-verified,
    recall bounded by the Jaccard banding).

    Plan (default): map-only sorted-posting explode → prefix filter
    (map-only) → prefix⋈full posting join on the shingle key
    (sort-merge pinned above the toy gate: both sides are
    post-explode, the planner's pre-explode estimate cannot be
    trusted — the r7 sf10 OOM class; a shuffle-hash build of a full
    posting side is corpus-scale per partition) → positional filter →
    distinct ordered candidates → array verify.  The ONLY corpus-wide
    shuffles are the join's two exchanges and the candidate dedup.
    """
    df = ensure_parallelism(df)
    _hint = _self_join_hinter(df)
    # the prefix⋈full posting join gets MERGE, not shuffle_hash: the
    # full posting side is |docs|·|shingles-per-doc| rows, so a
    # shuffle-hash build map is corpus-scale per partition (measured
    # sf10: straight heap OOM); sort-merge spills
    _mhint = _self_join_hinter(df, "merge")
    arrays = _hashed_shingles(df, id_col, text_col, k)
    size = _source_bytes(df)
    if size is None or size >= PLANNER_TRUST_MAX_BYTES:
        # score-once at corpus scale (the global_quality_rank
        # pattern): FOUR branches consume the shingle arrays (df
        # postings, full postings, both verify sides) — uncheckpointed
        # they are four full scans + four shingle computations that
        # run as CONCURRENT stages, and the stacked sort/build memory
        # of those stages is what pushed the sf10 probe over an
        # 0.25 GB/core heap.  Checkpoint blocks live MEMORY_AND_DISK.
        # eager=False: the default eager checkpoint runs the full
        # corpus job at PLAN-CONSTRUCTION time, which a plan dump /
        # audit / explain would pay without ever executing the query
        arrays = arrays.localCheckpoint(eager=False)
    # prefix length nₐ − ⌈t·nₐ⌉ + 1; the 1e-9 guard keeps float noise
    # in t·nₐ from pushing a knife-edge integer product (0.8·10 =
    # 8.000…002 in binary) up a notch, which would SHRINK the prefix
    # below the lossless bound
    pref_len = (
        F.col("_na")
        - F.ceil(F.lit(threshold) * F.col("_na") - F.lit(1e-9))
        + 1
    )
    if df_order:
        # rarity ordering: two corpus-wide posting windows (df, rank)
        posts = arrays.select(
            "_id", F.size("_shs").alias("_na"),
            F.explode("_shs").alias("_h"),
        ).withColumn(
            "_df", F.count(F.lit(1)).over(Window.partitionBy("_h"))
        )
        rnk = F.row_number().over(
            Window.partitionBy("_id").orderBy("_df", "_h")
        )
        ranked = posts.withColumn("_rnk", rnk).drop("_df")
    else:
        # hash ordering: prefix and positions fall out of the per-row
        # sorted array — MAP-ONLY, no windows, no posting shuffles
        ranked = arrays.select(
            "_id",
            F.size("_shs").alias("_na"),
            F.posexplode(F.array_sort("_shs")).alias("_p", "_h"),
        ).select(
            "_id", "_na", "_h", (F.col("_p") + 1).alias("_rnk")
        )
    prefix = ranked.filter(F.col("_rnk") <= pref_len)
    # PPJoin positional filter as a RESIDUAL join predicate (lossless):
    # with both docs' shingles ranked by the same global (df, h)
    # order, the pair's MINIMAL collision row satisfies
    # common ≤ 1 + min(nₐ−i, n_b−j), and a qualifying pair needs
    # common ≥ t·min(nₐ, n_b) — rows that cannot reach that bound
    # drop INSIDE the join, before the candidate exchange (measured
    # sf10: the unfiltered candidate STREAM, not the answer, is what
    # filled the disk).  The minimal collision row always survives —
    # any common shingle earlier in A's order is itself a prefix
    # collision at a smaller (i, j) — so the distinct pair set is
    # unchanged; only redundant multiplicity dies.
    pos_ok = (
        F.lit(1.0)
        + F.least(
            F.col("p._na") - F.col("p._rnk"),
            F.col("f._na") - F.col("f._rnk"),
        )
        >= F.lit(threshold) * F.least(F.col("p._na"), F.col("f._na"))
        - F.lit(1e-9)
    )
    # candidates canonicalize to UNORDERED (least, greatest) pairs
    # before the distinct: either qualifying direction guarantees the
    # pair a surviving prefix collision (via that direction's prefix
    # side), so one canonical row carries both — and the verify stage
    # then joins the corpus-scale arrays and intersects each pair
    # ONCE, emitting both directions from the same row (the score-once
    # shape the exact tier already uses), instead of paying the
    # heaviest stage twice for the (A,B)/(B,A) twins
    cand = (
        _mhint(prefix).alias("p")
        .join(
            _mhint(ranked).alias("f"),
            (F.col("p._h") == F.col("f._h"))
            & (F.col("p._id") != F.col("f._id"))
            & pos_ok,
        )
        .select(
            F.least(F.col("p._id"), F.col("f._id")).alias("_ia"),
            F.greatest(F.col("p._id"), F.col("f._id")).alias("_ib"),
        )
        .distinct()
    )
    sa = _hint(arrays).select(
        F.col("_id").alias("_ia"), F.col("_shs").alias("_sa")
    )
    sb = _hint(arrays).select(
        F.col("_id").alias("_ib"), F.col("_shs").alias("_sb")
    )
    scored = (
        cand.join(sa, "_ia")
        .join(sb, "_ib")
        .select(
            "_ia",
            "_ib",
            F.size(F.array_intersect("_sa", "_sb")).alias("_common"),
            F.size("_sa").alias("_na"),
            F.size("_sb").alias("_nb"),
        )
    )
    fwd = scored.select(
        F.col("_ia").alias("id_contained"),
        F.col("_ib").alias("id_container"),
        F.round(F.col("_common") / F.col("_na"), 6).alias("containment"),
    )
    rev = scored.select(
        F.col("_ib").alias("id_contained"),
        F.col("_ia").alias("id_container"),
        F.round(F.col("_common") / F.col("_nb"), 6).alias("containment"),
    )
    return fwd.unionByName(rev).filter(F.col("containment") >= threshold)


def cross_corpus_minhash(
    train: DataFrame,
    eval_set: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 3,
    threshold: float = 0.5,
    num_hashes: int = 64,
    bands: int = 16,
) -> DataFrame:
    """FUZZY decontamination: train documents NEAR-DUPLICATING an
    eval document (banded-MinHash candidates, exact-Jaccard verify) —
    the tier :func:`cross_corpus_overlap` cannot reach: exact shingle
    overlap misses paraphrased or lightly-edited benchmark leakage,
    which is how contamination actually survives web pipelines
    (GPT-3's n-gram decontamination famously under-matched).

    Plan: both sides build map-only (band, bucket) entries; the EVAL
    side (benchmark suites — thousands of docs) broadcasts into both
    the candidate join and its verify join, so the train BAND frame
    never shuffles: candidates = train-bands ⋈ broadcast(eval-bands).
    The train SHINGLE-ARRAY frame pays exactly one doc-id-keyed
    shuffle into the verify join — shuffle_hash-hinted like every
    corpus-sized join in this module: the array frame is map-only, so
    Catalyst's size estimate predates the shingle fan-out and at
    sf0.01 it statically BROADCAST the train arrays (fine there,
    the r8 heap-OOM class one decade up).  Per train doc the readout
    aggregates matches ≥ threshold.  Same recall contract as
    :func:`minhash_lsh_pairs` (16×4 banding: ~0.56 collision at
    J=0.5, ≥0.98 at J=0.7 — the fixtures' planted gap), so the exact
    cross-corpus Jaccard oracle passes verbatim."""
    tr = ensure_parallelism(train)
    _hint = _self_join_hinter(tr)
    tr_bands = _band_entries(tr, id_col, text_col, k, num_hashes, bands)
    ev_bands = _band_entries(
        eval_set, id_col, text_col, k, num_hashes, bands
    )
    candidates = (
        tr_bands.join(
            F.broadcast(ev_bands.withColumnRenamed("_id", "_eval_id")),
            ["band", "bucket"],
        )
        .select("_id", "_eval_id")
        .distinct()
    )
    tr_arr = _hint(_hashed_shingles(tr, id_col, text_col, k))
    ev_arr = _hashed_shingles(eval_set, id_col, text_col, k).select(
        F.col("_id").alias("_eval_id"), F.col("_shs").alias("_se")
    )
    scored = (
        candidates.join(F.broadcast(ev_arr), "_eval_id")
        .join(tr_arr, "_id")
        .select(
            "_id",
            "_eval_id",
            F.round(
                F.size(F.array_intersect("_shs", "_se"))
                / F.size(F.array_union("_shs", "_se")),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return scored.groupBy(F.col("_id").alias("doc_id")).agg(
        F.count(F.lit(1)).alias("n_eval_matches"),
        F.max("jaccard").alias("max_jaccard"),
    )


def distinct_kgrams(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
) -> DataFrame:
    """The corpus's distinct word ``k``-gram PRESENCE SET — one
    ``(g)`` row per gram string appearing anywhere.  This is the
    state :func:`remove_duplicate_spans_state` persists for
    incremental span removal: in a full rebuild over
    (corpus ∪ increment), an increment gram is duplicated (df >= 2)
    iff it appears >= 2 times within the increment OR at least once
    in the corpus — so corpus presence, not corpus df, is what the
    nightly probe needs.  Map-only explode + one distinct shuffle on
    the gram key."""
    toks = docs.select(id_col, tokens(F.col(text_col)).alias("t"))
    return (
        toks.filter(F.size("t") >= k)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), F.size("t") - k),
                    lambda i: F.array_join(F.slice("t", i + 1, k), " "),
                )
            ).alias("g")
        )
        .distinct()
    )


def remove_duplicate_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    carry: tuple[str, ...] = (),
    extra_flag_grams: DataFrame | None = None,
) -> DataFrame:
    """Cross-document duplicated-span REMOVAL (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better" —
    the ExactSubstr step): every token covered by at least one word
    ``k``-gram appearing in >= 2 DISTINCT documents is dropped and
    each document re-emits its surviving tokens in order.  Documents
    whose every token is covered vanish.  ``carry`` columns ride
    through unchanged (they join the reassembly group key — must be
    functionally dependent on ``id_col``).

    ``extra_flag_grams`` (the INCREMENTAL form, VERDICT r12 ask #2):
    a ``(g)`` frame of grams known duplicated elsewhere — the
    persisted corpus presence set from :func:`distinct_kgrams`.  A
    gram is then flagged if duplicated WITHIN ``docs`` (df >= 2) OR
    present in the set, which is exactly what a full rebuild over
    (corpus ∪ docs) would decide for ``docs``'s tokens.  The set
    side joins on the gram key — persisted bucketed on ``g``, the
    corpus side never re-shuffles; the default ``None`` path plans
    byte-identically to before.

    Shared by the registered `duplicate_span_removal` query and the
    `traindata_curation_v2` pipeline stage; the scale-shape narrative
    lives on the query's docstring — this is the same plan,
    parameterized.

    r13 shape (guide §8 "decide with small rows, move big rows
    once"): the token payload crosses the network ONCE. The old plan
    position-exploded every token, ANTI-joined the covered (doc,
    position) frame on (id, p), and re-assembled documents with a
    struct-collect — two full shuffles of every token plus per-row
    position overhead. Now the covered positions collapse per doc
    into one sorted int array (shuffling ints only), LEFT-join the
    token-array frame once on the doc key, and the surviving text is
    rebuilt map-side: ``array_except(sequence(0,n-1), cov)`` (hash
    set, linear) indexing back into the token array. The doc-key
    join is shuffle_hash-pinned through the planner-trust gate — the
    build side is the per-doc covered arrays, the "per-doc array
    lookup" class the gate's docstring routes to a hash build (the
    r11 sf10 OOM was a BROADCAST of that frame; a per-partition
    build map is corpus/shuffle-partitions sized), while sort-merge
    would sort the token-array payload. The (g,id) aggregate rides
    an explicit ``repartition("g")`` whose exchange ALSO satisfies
    the df-window's g-clustering (hash(g) clusters (g,id)), so the
    gram frame is shuffled once, not twice. Measured interleaved
    (noop/toPandas medians): sf0.1 2.05 → 1.88 s, sf1 5.9 → 5.3 s,
    sf10 40.5 → ~35 s; byte-identical output at sf0.1/sf1 (49 840
    rows compared).

    r14: the coverage aggregate collects distinct STARTS instead of
    pre-expanded positions (k× fewer exploded rows into its exchange)
    and the kept positions become a map-side interval complement —
    see the inline note at ``cov``; sf10 44.7 → 32.8 s.

    Returns ``(id_col, *carry, n_tokens, n_kept, n_removed,
    cleaned_text)``.
    """
    _hint = _self_join_hinter(docs, strategy="shuffle_hash")
    toks = docs.select(
        id_col, *carry, tokens(F.col(text_col)).alias("t")
    )
    gp = toks.filter(F.size("t") >= k).select(
        id_col,
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.size("t") - k),
                lambda i: F.array_join(F.slice("t", i + 1, k), " "),
            )
        ).alias("i", "g"),
    )
    gd = (
        gp.repartition("g")
        .groupBy("g", id_col)
        .agg(F.collect_list("i").alias("starts"))
    )
    with_df = gd.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("g"))
    )
    if extra_flag_grams is not None:
        known = extra_flag_grams.select("g").withColumn(
            "_known", F.lit(True)
        )
        flagged = with_df.join(known, "g", "left").filter(
            (F.col("df") >= 2) | F.col("_known").isNotNull()
        )
    else:
        flagged = with_df.filter(F.col("df") >= 2)
    # r14 (§2.3 — shuffle 8× fewer rows into the coverage aggregate):
    # the r13 shape expanded every flagged start into its k covered
    # positions BEFORE the per-doc aggregate (one exploded row per
    # position — 192 M rows at sf10 for 24 M starts) and subtracted
    # the collected position set with array_except. All intervals
    # share the fixed length k, so the per-doc aggregate only needs
    # the DISTINCT STARTS (24 M rows) and the surviving positions are
    # the interval-complement, computed map-side in the reassembly
    # projection: with S the sorted distinct starts, kept =
    # [0, S₁−1] ∪ ⋃ᵢ [Sᵢ+k, next(Sᵢ)−1] (next of the last = n) —
    # ascending, exactly array_except's first-array order, so output
    # is byte-identical (proved at sf0.01/0.1/1; sf10 interleaved
    # noop A/B: 44.7 → 32.8 s median). The guarded `when`s matter:
    # Spark's `sequence(a, b)` DESCENDS when b < a instead of
    # returning empty. A 128-bit gram fingerprint for the exchange
    # was also measured here and rejected (parity: string grams
    # lz4-compress well and the hash work cancels the byte saving).
    cov = (
        flagged.select(id_col, F.explode("starts").alias("s"))
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_set("s")).alias("_starts"))
    )
    joined = toks.filter(F.size("t") > 0).join(_hint(cov), id_col, "left")
    _n = F.size("t")
    _S = F.coalesce(F.col("_starts"), F.array().cast("array<int>"))
    _empty = F.array().cast("array<int>")
    _k = F.lit(k)
    _m = F.size(_S)
    _lead = F.concat(F.slice(_S, 2, _m - 1), F.array(_n))
    _head = F.when(
        F.element_at(_S, 1) > 0,
        F.sequence(F.lit(0), F.element_at(_S, 1) - 1),
    ).otherwise(_empty)
    _gaps = F.flatten(
        F.zip_with(
            _S,
            _lead,
            lambda s, nx: F.when(
                nx - 1 >= s + _k, F.sequence(s + _k, nx - 1)
            ).otherwise(_empty),
        )
    )
    kept_pos = F.when(_m == 0, F.sequence(F.lit(0), _n - 1)).otherwise(
        F.concat(_head, _gaps)
    )
    out = joined.select(
        id_col,
        *carry,
        F.size("t").cast("long").alias("n_tokens"),
        kept_pos.alias("_kp"),
        F.col("t"),
    ).filter(F.size("_kp") > 0)
    return out.select(
        id_col,
        *carry,
        "n_tokens",
        F.size("_kp").cast("long").alias("n_kept"),
        (F.col("n_tokens") - F.size("_kp").cast("long")).alias("n_removed"),
        F.array_join(
            F.transform("_kp", lambda p: F.element_at("t", p + 1)), " "
        ).alias("cleaned_text"),
    )
