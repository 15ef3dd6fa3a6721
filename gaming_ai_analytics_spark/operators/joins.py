"""Join operators.

Covers the reference's whole join surface (SURVEY.md §2.5):

- J1 dim flattening: left equi-join of a linkage table to a tiny
  reference dim (auxillary_dims.py:73-97) — broadcast the dim side.
- J2 incremental anti-join: "don't re-process already-materialized
  keys" (reviews_fact.py:151-153).
- J3 star join: fact left-joined to N dims (semantic_layer.sql:15-30).
- J4/J5 inner + chained left joins (exploration/analysis.sql:20-21,51-59).

Scale notes (100 TB): dims small enough to broadcast are hinted with
``F.broadcast`` so the fact side never shuffles for them; fact⋈fact
joins (lineitem⋈orders) are left to Catalyst/AQE which will pick
sort-merge with skew splitting. Broadcasting is a *hint* — Catalyst
ignores it if the side exceeds the broadcast threshold, so the plan
degrades gracefully rather than OOMing.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def flatten_dimension(
    link: DataFrame,
    ref: DataFrame,
    link_key: str,
    ref_key: str = "id",
    how: str = "left",
    broadcast_ref: bool = True,
) -> DataFrame:
    """J1 (auxillary_dims.py:96): ``link.join(ref, link[k]==ref[id], 'left')``.

    The reference dim is tiny (genre/category name lookups) — broadcast
    it so the (large) linkage side never shuffles.
    """
    right = F.broadcast(ref) if broadcast_ref else ref
    return link.join(right, link[link_key] == right[ref_key], how)


def incremental_anti_join(
    new_rows: DataFrame, existing: DataFrame, key: str | Sequence[str]
) -> DataFrame:
    """J2 (reviews_fact.py:151-153): keep only rows whose key is NOT in
    ``existing`` — the exactly-once incremental-append guard.

    The probe side is pruned to the key column(s) before the join so the
    shuffle moves keys only, not whole rows (the reference did the same
    with ``.select(REVIEW_ID)``, reviews_fact.py:152).
    """
    keys = [key] if isinstance(key, str) else list(key)
    return new_rows.join(existing.select(*keys), on=keys, how="left_anti")


def star_join(
    fact: DataFrame,
    dims: Sequence[tuple[DataFrame, Column]],
    how: str = "left",
    broadcast_dims: bool = True,
) -> DataFrame:
    """J3 (semantic_layer.sql:15-30): fact left-joined to each dim.

    ``dims`` is a list of ``(dim_df, join_condition)``. All dims are
    broadcast-hinted by default — the star-schema pattern where the
    fact is 100 TB and dims are MBs.
    """
    out = fact
    for dim, cond in dims:
        right = F.broadcast(dim) if broadcast_dims else dim
        out = out.join(right, cond, how)
    return out


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    value_cols: Sequence[str],
    direction: str = "backward",
) -> DataFrame:
    """As-of join — the time-series enrichment operator Spark has no
    built-in for (no reference analog; extension surface): for every
    left row, attach ``value_cols`` from the right row with the
    greatest ``ts_col`` ≤ left's (``backward``; ties match), or the
    smallest ≥ (``forward``). Unmatched left rows keep nulls (left
    outer semantics).

    Spark mapping: union-tag both streams, then ``last(struct,
    ignorenulls=True)`` over a per-key time-ordered running window —
    ONE shuffle on the key (identical to any windowed agg), never a
    range self-join, and no per-row Python. At 100 TB this is the
    only formulation that doesn't explode: a range-condition join
    degenerates to per-key cross products, while the union+window
    sorts within partitions only. Right rows sort before left rows at
    equal timestamps so ties match, mirroring standard ASOF JOIN
    semantics (DuckDB's ASOF is the oracle in the registered query).

    All value columns ride together inside ONE struct per right row —
    the struct is non-null iff the row came from the right stream, so
    ``ignorenulls`` skips interleaved left rows but keeps genuine
    NULLs *inside* the matched row's columns. (Carrying each value
    column independently would stitch values from different right
    rows and resurrect NULLs from older ones.)
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward/forward, got {direction!r}")
    keys = list(keys)
    lrow_t = F.struct(*[left[c] for c in left.columns])
    r_side = right.select(
        *keys,
        F.col(ts_col).alias("_ts"),
        F.lit(0).alias("_src"),
        F.struct(*[right[c] for c in value_cols]).alias("_rval"),
    )
    l_side = left.select(
        *keys,
        F.col(ts_col).alias("_ts"),
        F.lit(1).alias("_src"),
        F.lit(None).cast(r_side.schema["_rval"].dataType).alias("_rval"),
        lrow_t.alias("_lrow"),
    )
    r_side = r_side.withColumn(
        "_lrow", F.lit(None).cast(l_side.schema["_lrow"].dataType)
    )
    order = (
        [F.col("_ts").asc(), F.col("_src").asc()]
        if direction == "backward"
        else [F.col("_ts").desc(), F.col("_src").asc()]
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        l_side.unionByName(r_side)
        .select(
            "_src",
            "_lrow",
            F.last("_rval", ignorenulls=True).over(w).alias("_rval"),
        )
        .filter(F.col("_src") == 1)
        .select("_lrow.*", *[F.col(f"_rval.{v}").alias(v) for v in value_cols])
    )


def range_join(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_seconds: int = 1800,
) -> DataFrame:
    """Range (interval-containment) join: left rows with
    ``start ≤ ts < end`` per key — the other time-series join Spark
    has no efficient built-in for (a raw non-equi join plans as a
    nested-loop / per-key cross product).

    Spark mapping: bucketize time. Each left row lands in exactly one
    ``bucket_seconds`` bucket; each right range explodes over the
    buckets it covers (fan-out ≤ range/bucket + 1); the join becomes a
    plain equi-join on (keys, bucket) — shuffle-hash/broadcast,
    AQE-optimizable — followed by the exact containment filter. Pick
    ``bucket_seconds`` near the typical range length so fan-out stays
    ~2×. Output: all left columns + all right columns (ranges)."""
    from pyspark.sql import types as T

    def seconds(df: DataFrame, col: str):
        # TIMESTAMP_NTZ has no direct numeric cast (AnalysisException);
        # route timestamps through TIMESTAMP (identity under the
        # engine's pinned UTC session) to fractional epoch seconds.
        if isinstance(
            df.schema[col].dataType, (T.TimestampType, T.TimestampNTZType)
        ):
            return F.col(col).cast("timestamp").cast("double")
        return F.col(col).cast("double")

    keys = list(keys)
    lb = left.withColumn(
        "_bucket",
        F.floor(seconds(left, ts_col) / bucket_seconds).cast("long"),
    )
    rb = right.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(seconds(right, start_col) / bucket_seconds).cast("long"),
                F.floor(seconds(right, end_col) / bucket_seconds).cast("long"),
            )
        ),
    )
    cond = [lb[k] == rb[k] for k in keys] + [lb["_bucket"] == rb["_bucket"]]
    joined = lb.join(rb, cond).filter(
        (lb[ts_col] >= rb[start_col]) & (lb[ts_col] < rb[end_col])
    )
    return joined.select(
        *[lb[c] for c in left.columns],
        *[rb[c] for c in right.columns if c not in (*keys, "_bucket")],
    )
