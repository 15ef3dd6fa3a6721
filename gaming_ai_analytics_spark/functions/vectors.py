"""Vector math over ``array<float>`` embedding columns — pure built-ins.

No reference analog (the reference has no vector data; SURVEY §2.11
extension surface). Everything here stays JVM-side: ``zip_with`` /
``aggregate`` / ``transform`` higher-order functions compile into
Catalyst expressions — no Python in the hot path, no UDF serde.

Accumulation is forced to double (float32 inputs) so results are
deterministic and match the DuckDB oracle's double fold.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ in double precision, sequential left fold."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; for L2-normalized inputs this equals dot()
    but the general form keeps the operator correct for raw vectors."""
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
