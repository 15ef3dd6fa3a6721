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
    row-group statistics are tight. ONE shuffle — the range exchange
    the layout is. Readers need nothing special: parquet min/max
    skipping on col_a/col_b does the pruning."""
    z = zorder_key(F.col(col_a), F.col(col_b), bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(num_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .format(fmt)
        .save(path)
    )
