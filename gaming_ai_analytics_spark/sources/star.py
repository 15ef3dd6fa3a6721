"""Loader for the synthetic star-schema fixtures (TESTDATA.md).

One parquet file per table under ``{sf_dir}/{name}.parquet``. Parquet
scans give Catalyst pushdown + pruning for free; every query in the
engine starts here (the analog of the reference's ``spark.read.table``
catalog scans, utilities.py:27-30).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from gaming_ai_analytics_spark.constants import Star

DEFAULT_SF_DIR = "/root/testdata/sf0.001"

#: (app id, sf_dir, table) → resolved DataFrame. A DataFrame is an
#: immutable logical plan, so handing the same object out repeatedly is
#: safe — this is the catalog-resolution cache every warehouse has
#: (``spark.table`` resolves from a catalog once, not per query).
#: Without it every query call pays ~100-150 ms of py4j round-trips
#: re-listing and re-inferring the same parquet footers, which at
#: bench scale is a measurable slice of each sub-second query. Keyed
#: by applicationId so a stopped-and-recreated session never serves
#: plans bound to a dead JVM context.
_TABLE_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir, name)
    df = _TABLE_CACHE.get(key)
    if df is None:
        if name == "events":
            df = _read_events(spark, sf_dir)
        else:
            df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        _TABLE_CACHE[key] = df
    return df


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")


def _read_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events fixture stores ``ts`` as parquet TIMESTAMP(NANOS),
    which Spark's vectorized reader rejects. Read it as a long
    (``nanosAsLong``, runtime-settable) and normalize to a
    microsecond-precision timestamp column — the precision every
    downstream window/date function expects.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    if isinstance(df.schema["ts"].dataType, T.LongType):
        # integer division: ns-epoch longs exceed double's 53-bit
        # mantissa, so a float divide would round the microsecond off.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # else: the file already carries µs timestamps (e.g. the derived
    # sf1 bench copy, rewritten by a writer without TIMESTAMP(NANOS))
    return df


def load_star(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Load every fixture table as a dict of DataFrames."""
    return {t: load_table(spark, sf_dir, t) for t in Star.TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register all fixture tables as temp views for the SQL API."""
    for name, df in load_star(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
