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
