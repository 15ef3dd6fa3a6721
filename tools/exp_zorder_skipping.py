"""Measure what the Z-order layout actually buys (r7).

`operators/layout.py` claims the Morton-key range-sorted write makes
parquet min/max statistics tight in BOTH dimensions so predicates on
EITHER (or both) prune row groups. This experiment puts numbers on it:
the same 10 M-row sf10 `events` table is written three ways —

  natural   hash-repartitioned (what an unclustered ingest produces)
  sorted    range-sorted on user_id alone (the single-column layout)
  zorder    range-sorted on zorder_key(user_id, minute, bits=18)

and graded against THREE predicate shapes (each dimension band = 10%
of its key space): user-band only, minute-band only, and the 2-D box.
Two measures per (layout, predicate):

  skip fraction  deterministic, from the parquet footers: the fraction
                 of row groups whose [min,max] box does NOT intersect
                 the predicate in at least one dimension (what any
                 stats-based reader — Spark, Trino, DuckDB, Iceberg —
                 is allowed to skip);
  scan time      Spark warm wall time (median of 5) of filter+agg.

The expected shape — and the reason Z-order exists: the single-column
sort is unbeatable on ITS column and useless on the other; Z-order is
nearly as good on both.

Usage: python tools/exp_zorder_skipping.py [src_parquet] [out_dir]
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SRC = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
    REPO, ".benchdata", "sf10", "events.parquet"
)
OUT = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
    REPO, ".benchdata", "zorder_exp"
)

N_FILES = 64
BITS = 18  # user_id spans 150k (18 bits); minute-of-day fits in 11

#: predicate name -> (user bounds | None, minute bounds | None);
#: each band covers 10% of its dimension's key space
PREDICATES = {
    "user_band": ((10_000, 25_000), None),
    "minute_band": (None, (480, 624)),
    "box_2d": ((10_000, 25_000), (480, 624)),
}


def _intersects(stats, bounds) -> bool:
    if bounds is None:
        return True
    if stats is None:
        return True  # no stats -> reader must read
    lo, hi = bounds
    return stats.min < hi and stats.max >= lo


def must_read_fraction(path: str, ub, mb) -> tuple[int, int]:
    """(row groups intersecting the predicate, total row groups) from
    footer min/max only — engine-independent."""
    import pyarrow.parquet as pq

    hit = total = 0
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        pf = pq.ParquetFile(f)
        idx = {
            pf.schema_arrow.names[i]: i
            for i in range(len(pf.schema_arrow.names))
        }
        for rg in range(pf.metadata.num_row_groups):
            g = pf.metadata.row_group(rg)
            total += 1
            if _intersects(
                g.column(idx["user_id"]).statistics, ub
            ) and _intersects(g.column(idx["minute"]).statistics, mb):
                hit += 1
    return hit, total


def _filtered(spark, path: str, ub, mb):
    from pyspark.sql import functions as F

    df = spark.read.parquet(path)
    if ub is not None:
        df = df.filter(
            (F.col("user_id") >= ub[0]) & (F.col("user_id") < ub[1])
        )
    if mb is not None:
        df = df.filter(
            (F.col("minute") >= mb[0]) & (F.col("minute") < mb[1])
        )
    return df


def timed_scan(spark, path: str, ub, mb, runs: int = 5) -> float:
    from pyspark.sql import functions as F

    ts = []
    for _ in range(runs):
        t0 = time.perf_counter()
        _filtered(spark, path, ub, mb).agg(
            F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv")
        ).collect()
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def main() -> None:
    from pyspark.sql import functions as F

    from gaming_ai_analytics_spark.operators.layout import save_zordered
    from gaming_ai_analytics_spark.session import get_spark

    spark = get_spark("zorder-exp")
    ev = spark.read.parquet(SRC).withColumn(
        "minute", F.hour("ts") * 60 + F.minute("ts")
    )

    shutil.rmtree(OUT, ignore_errors=True)
    paths = {k: os.path.join(OUT, k) for k in ("natural", "sorted", "zorder")}

    ev.repartition(N_FILES).write.mode("overwrite").parquet(paths["natural"])
    (
        ev.repartitionByRange(N_FILES, "user_id")
        .sortWithinPartitions("user_id")
        .write.mode("overwrite")
        .parquet(paths["sorted"])
    )
    save_zordered(ev, paths["zorder"], "user_id", "minute",
                  bits=BITS, num_files=N_FILES)

    out: dict[str, dict] = {}
    for pname, (ub, mb) in PREDICATES.items():
        # ground truth: identical result on all three layouts
        truths = {
            k: _filtered(spark, p, ub, mb).count() for k, p in paths.items()
        }
        assert len(set(truths.values())) == 1, (pname, truths)
        row: dict[str, dict] = {"rows": truths["natural"]}
        for k, p in paths.items():
            hit, total = must_read_fraction(p, ub, mb)
            row[k] = {
                "rg_must_read": hit,
                "rg_total": total,
                "skip_pct": round(100 * (1 - hit / total), 1),
                "scan_s": round(timed_scan(spark, p, ub, mb), 3),
            }
            print(f"{pname}/{k}: must-read {hit}/{total} "
                  f"({row[k]['skip_pct']}% skippable), "
                  f"median scan {row[k]['scan_s']}s", flush=True)
        out[pname] = row

    print(json.dumps({
        "n_files": N_FILES, "bits": BITS,
        "predicates": {
            k: {"user_id": ub, "minute": mb}
            for k, (ub, mb) in PREDICATES.items()
        },
        "results": out,
    }))


if __name__ == "__main__":
    main()
