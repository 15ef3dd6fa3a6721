"""Vector math over ``array<float>`` embedding columns — pure built-ins.

No reference analog (the reference has no vector data; SURVEY §2.11
extension surface). Everything here stays JVM-side: ``zip_with`` /
``aggregate`` / ``transform`` higher-order functions compile into
Catalyst expressions — no Python in the hot path, no UDF serde.

Accumulation is forced to double (float32 inputs) so results are
deterministic and match the DuckDB oracle's double fold.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def matrix_lit(matrix) -> Column:
    """A 2-D literal ``array<array<double>>`` built from ONE SQL-parsed
    expression. The obvious ``F.array(*[F.lit(x) ...])`` nesting costs
    one py4j round-trip per element — ~0.4 s of driver time for a
    16×256 hyperplane battery, paid at every plan construction. A
    single ``F.expr`` string parses JVM-side in one call; ``repr``
    keeps full float64 precision."""
    rows = ",".join(
        "array(" + ",".join(f"{float(x)!r}D" for x in row) + ")"
        for row in np.asarray(matrix, dtype=np.float64)
    )
    return F.expr(f"array({rows})")


def long_array_lit(values) -> Column:
    """Literal ``array<long>`` via one SQL parse (see matrix_lit)."""
    return F.expr("array(" + ",".join(f"{int(v)}L" for v in values) + ")")


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


def dot_many_pandas(vec_col: Column, matrix) -> Column:
    """Arrow-vectorized batch kernel: dot of each row's vector against
    EVERY row of a (small, driver-side) ``matrix`` at once — returns
    ``array<double>`` of length ``len(matrix)``.

    This is the scale path for dense-vector fan-out (probe sets,
    hyperplane batteries, centroid tables): Catalyst higher-order
    functions are CodegenFallback — lambdas evaluate interpreted, one
    element at a time — so k dots of dim d cost k·d lambda evals per
    row, while this kernel does the same work as ONE numpy matmul per
    Arrow batch (SIMD, zero Python per row). Measured, 64-dim × 16
    planes: 2.1× faster end-to-end at 256k rows (1.70 → 0.81 s/run,
    local[32]; the gap widens with k·d), but SLOWER below ~10⁴ rows
    per partition, where Arrow transfer + Python worker dispatch
    dominate — keep the expression form for small inputs and oracle
    parity paths. Float64 accumulation order differs from the
    sequential fold, so results can differ in the last ulp.
    """
    m = np.ascontiguousarray(np.asarray(matrix, dtype=np.float64).T)

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def _kernel(vecs: pd.Series) -> pd.Series:
        stacked = np.stack(vecs.to_numpy()).astype(np.float64)  # (n, d)
        out = stacked @ m  # (n, k)
        return pd.Series(list(out))

    return _kernel(vec_col)
