"""Data-layout optimization: Z-order (Morton) clustering.

At 100 TB the scan is the query plan's floor, and single-column sort
layouts only help predicates on that column. Interleaving the bits of
two dimension keys into one Z-order key and range-sorting the write
on it gives files whose min/max statistics are tight in BOTH
dimensions — parquet row-group / file skipping then prunes
two-dimensional predicates (the technique behind Delta/Iceberg
``OPTIMIZE ZORDER BY``; public literature: Morton, 1966). Everything
here is JVM bit arithmetic and a range-partitioned write — no UDFs,
no shuffle beyond the one the layout itself requires.

The write path normalizes both dimensions onto the interleave width
first; without it the experiment that graded this operator
(tools/exp_zorder_skipping.py, 10 M rows) measured ZERO pruning on
the narrower dimension — the raw interleave had quietly degraded to
a user_id sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(a: Column, b: Column, bits: int = 16) -> Column:
    """Interleave the low ``bits`` bits of two non-negative ints into
    a Morton key (``a`` on even bit positions, ``b`` on odd). Built
    entirely from shift/and/or expressions — codegen'd, no Python.
    Values beyond ``bits`` bits fold onto their low bits (both engines
    apply the same mask, so layout quality degrades gracefully but
    deterministically)."""
    key = F.lit(0).cast("long")
    for i in range(bits):
        key = key.bitwiseOR(
            F.shiftleft(
                F.shiftrightunsigned(a.cast("long"), i).bitwiseAND(F.lit(1)),
                2 * i,
            )
        ).bitwiseOR(
            F.shiftleft(
                F.shiftrightunsigned(b.cast("long"), i).bitwiseAND(F.lit(1)),
                2 * i + 1,
            )
        )
    return key


def zorder_key_sql(a: str, b: str, bits: int = 16) -> str:
    """The identical Morton interleave as portable SQL (oracle twin)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " | ".join(terms) + ")"


def _scale_to_bits(c: Column, lo: int, hi: int, bits: int) -> Column:
    """Min-max normalize ``c`` from [lo, hi] onto [0, 2**bits) so both
    interleave inputs occupy the SAME bit width.

    Interleaving RAW values breaks Z-order whenever the dimensions have
    unequal magnitudes: the wider dimension's high bits monopolize the
    key's top bits, the range partitioner splits files on those bits
    alone, and the narrow dimension gets ZERO file-level pruning —
    measured on the sf10 events fixture (user_id 18 bits vs
    minute-of-day 11 bits): minute-band skip was 0.0% un-normalized vs
    75.0% normalized (tools/exp_zorder_skipping.py). Same reason
    Delta/Iceberg OPTIMIZE ZORDER rank-normalizes each column before
    interleaving."""
    span = max(hi - lo, 1)
    top = (1 << bits) - 1
    scaled = ((c.cast("long") - F.lit(lo)) * F.lit(top) / F.lit(span))
    return F.floor(scaled).cast("long")


def save_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    bits: int = 16,
    num_files: int = 8,
    fmt: str = "parquet",
) -> None:
    """Write ``df`` clustered on the Z-order of (col_a, col_b): range
    partition on the Morton key (totally ordered files — each file
    owns a disjoint key interval) and sort within each partition so
    row-group statistics are tight. Each dimension is min-max
    normalized onto ``bits`` bits first (see ``_scale_to_bits`` — raw
    interleave silently degrades to a single-column sort when the
    dimensions' magnitudes differ), which costs one bounded 4-value
    min/max aggregation before the ONE shuffle — the range exchange
    the layout is. Readers need nothing special: parquet min/max
    skipping on col_a/col_b does the pruning."""
    lo_a, hi_a, lo_b, hi_b = df.agg(
        F.min(col_a), F.max(col_a), F.min(col_b), F.max(col_b)
    ).first()
    # Empty input (a nightly increment with no rows) or an all-NULL
    # dimension yields None bounds; the layout is then meaningless but
    # the write must still succeed as a no-op-shaped overwrite, not a
    # driver-side TypeError in the span arithmetic.
    if None in (lo_a, hi_a, lo_b, hi_b):
        (
            df.repartition(1)
            .write.mode("overwrite")
            .format(fmt)
            .save(path)
        )
        return
    z = zorder_key(
        _scale_to_bits(F.col(col_a), lo_a, hi_a, bits),
        _scale_to_bits(F.col(col_b), lo_b, hi_b, bits),
        bits,
    )
    (
        df.withColumn("_z", z)
        .repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .format(fmt)
        .save(path)
    )
