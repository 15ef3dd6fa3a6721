"""Slowly-changing-dimension maintenance (SCD type 2).

Extension surface: the reference maintains overwrite-refreshed dims
(reference: src/notebooks/modelling/auxillary_dims.py:34-152 rebuilds
dims wholesale each run), which loses history. This operator is the
history-preserving upgrade a warehouse on the same star schema runs:
each tracked-attribute change CLOSES the open row (valid_to = the
update's effective date) and OPENS a new version; unchanged keys pass
through untouched; unseen keys insert as fresh open rows.

Scale shape: the daily update batch is dim-churn-sized — tiny next to
the accumulated history — so it broadcasts; the history table never
shuffles for the change detection (broadcast hash join + anti join),
and the output is a union of narrow projections. The changed set is
referenced twice (close + reopen); at real scale persist it before the
union — here it is cheap enough to recompute.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    key_col: str,
    tracked_cols: list[str],
    eff_col: str = "eff",
) -> DataFrame:
    """Apply one update batch to an SCD2 dimension.

    ``current``: key + tracked attrs + ``valid_from``/``valid_to``
    (NULL valid_to = open version). ``updates``: key + tracked attrs +
    ``eff_col`` (the effective date of the new values). Returns the
    full new dimension state with ``is_current`` derived.

    Change detection is null-safe (``eqNullSafe`` per tracked column),
    so NULL → value and value → NULL transitions version correctly.
    """
    closed_hist = current.filter(F.col("valid_to").isNotNull())
    open_rows = current.filter(F.col("valid_to").isNull())
    upd = F.broadcast(updates)

    differs = reduce(
        lambda a, b: a | b,
        [
            ~F.col(f"c.{t}").eqNullSafe(F.col(f"u.{t}"))
            for t in tracked_cols
        ],
    )
    changed = (
        open_rows.alias("c")
        .join(upd.alias("u"), F.col(f"c.{key_col}") == F.col(f"u.{key_col}"))
        .filter(differs)
    )

    closing = changed.select(
        F.col(f"c.{key_col}").alias(key_col),
        *[F.col(f"c.{t}").alias(t) for t in tracked_cols],
        F.col("c.valid_from").alias("valid_from"),
        F.col(f"u.{eff_col}").alias("valid_to"),
    )
    opening = changed.select(
        F.col(f"u.{key_col}").alias(key_col),
        *[F.col(f"u.{t}").alias(t) for t in tracked_cols],
        F.col(f"u.{eff_col}").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
    )
    fresh = (
        updates.join(open_rows, key_col, "left_anti")
        .select(
            key_col,
            *tracked_cols,
            F.col(eff_col).alias("valid_from"),
            F.lit(None).cast("date").alias("valid_to"),
        )
    )
    untouched = open_rows.join(
        changed.select(F.col(f"c.{key_col}").alias(key_col)),
        key_col,
        "left_anti",
    ).select(key_col, *tracked_cols, "valid_from", "valid_to")

    out_cols = [key_col, *tracked_cols, "valid_from", "valid_to"]
    result = reduce(
        DataFrame.unionByName,
        [closed_hist.select(*out_cols), untouched, closing, opening, fresh],
    )
    return result.withColumn("is_current", F.col("valid_to").isNull())
