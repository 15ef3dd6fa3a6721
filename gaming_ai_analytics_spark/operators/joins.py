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
