"""Skew-mitigation join: key salting.

The 100 TB failure mode AQE can't always save you from: a join key
whose hottest value holds a double-digit percentage of the rows (the
viral game, the bot reviewer). AQE's skew-join splitting
(``spark.sql.adaptive.skewJoin``) handles skewed *sort-merge* joins at
runtime and is our first line of defense (on in ``session.py``), but it
only splits map-side partitions of one side; a salted join is the
explicit, planner-independent fix that also works for aggregations and
for builds AQE won't split.

Mechanics (standard): the skewed (large) side gets a uniform random
salt in ``[0, salt_buckets)`` appended to its key; the small side is
replicated ``salt_buckets``× with every salt value. The join key
becomes ``(key, salt)``, spreading each hot key over ``salt_buckets``
reducers. Replication cost is |small side| × buckets — keep the
replicated side the smaller one (or broadcast and skip salting
entirely; salting targets the case where the small side is too big to
broadcast but small enough to replicate).

``F.rand`` is seeded for reproducibility; results are identical to the
unsalted join (asserted in tests/test_skew.py) because salt values
agree by construction.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT = "__salt"


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str | Sequence[str],
    how: str = "inner",
    salt_buckets: int = 16,
    seed: int = 7,
) -> DataFrame:
    """Equi-join ``skewed ⋈ other`` on ``on`` with the skewed side
    salted and ``other`` replicated across all salt values. Supported
    ``how``: inner / left (semantics preserved vs the unsalted join;
    output drops the salt column)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)

    left = skewed.withColumn(
        SALT, (F.rand(seed) * salt_buckets).cast("int")
    )
    right = other.withColumn(
        SALT,
        F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))),
    )
    return left.join(right, on=[*keys, SALT], how=how).drop(SALT)


def hot_key_isolated_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    how: str = "inner",
    hot_keys: Sequence | None = None,
    top_n: int = 8,
    min_share: float = 0.05,
) -> DataFrame:
    """Equi-join with the hot keys isolated onto a broadcast side-path.

    The other planner-independent skew fix (the one ``top_keys``'s
    docstring points at): split the skewed side on membership in a
    SMALL explicit hot-key set; the hot slice joins against a broadcast
    of ``other``'s matching rows (no shuffle at all for the heavy
    keys), the cold slice joins normally (its key distribution is
    uniform by construction). Unlike ``salted_join`` this pays no
    |other| × buckets replication — its cost is a second scan of the
    skewed side (each branch scans with an ``isin`` pushed to parquet;
    cache upstream if the input is not a scan).

    ``hot_keys=None`` auto-detects: keys among the ``top_n`` heaviest
    holding ≥ ``min_share`` of rows. Detection is one bounded
    aggregation (``top_keys``) plus a count — at real scale run it on a
    sample and pass the result explicitly.

    Semantics are identical to ``skewed.join(other, on, how)`` for
    inner/left (asserted in tests/test_skew.py): rows with NULL or
    non-hot keys ride the cold branch unchanged, and a hot key absent
    from ``other`` still emits its left row (the broadcast subset
    simply has no match).
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"hot_key_isolated_join supports inner/left, got {how!r}"
        )
    if hot_keys is None:
        total = skewed.count()
        hot_keys = [
            r[on]
            for r in top_keys(skewed, on, top_n).collect()
            if r["rows"] >= min_share * total and r[on] is not None
        ]
    # A None in an explicit hot_keys list would poison isin(): every
    # non-hot comparison becomes SQL NULL, which BOTH branch filters
    # drop (NULL is not true, and ~NULL is still NULL) — silently
    # losing all cold rows. NULL keys never equi-match anyway and the
    # cold branch keeps them via the isNull() clause, so strip them.
    hot_keys = [k for k in hot_keys if k is not None]
    if not hot_keys:
        return skewed.join(other, on=on, how=how)

    is_hot = F.col(on).isin(hot_keys)
    hot_part = skewed.filter(is_hot).join(
        F.broadcast(other.filter(is_hot)), on=on, how=how
    )
    # NULL keys fail isin() both ways; keep them on the cold branch
    # explicitly so a left join still emits them.
    cold_part = skewed.filter(~is_hot | F.col(on).isNull()).join(
        other, on=on, how=how
    )
    return hot_part.unionByName(cold_part)


def top_keys(df: DataFrame, key: str, n: int = 10) -> DataFrame:
    """Diagnostic: the ``n`` heaviest values of ``key`` with row counts
    — run at a sampled fraction first at real scale. Feed the result
    into a decision to salt (or to isolate hot keys into a broadcast
    side-path)."""
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("rows"))
        .orderBy(F.desc("rows"), key)  # key tie-break: deterministic top-n
        .limit(n)
    )
