"""Flagship query: star join + metric-view-style aggregation.

Transposes the reference's semantic-layer measures
(reference: src/notebooks/modelling/semantic_layer.sql:76-93 —
``review_count`` COUNT(*), ``avg_weighted_score`` AVG, positive/negative
conditional percentages, ``median_review_length`` PERCENTILE 0.5) and its
star joins (semantic_layer.sql:15-30) plus view-level null filter
(semantic_layer.sql:14) onto the driver's synthetic star schema:

    lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region
    → groupBy region name → count / avg / pct>thr / pct<thr / median

Exercises S-scan, F-filter, P-project, J3-star-join, A1-A4 in one plan
(SURVEY.md §7.1 M1).

Scale shape: one shuffle for lineitem⋈orders on the order key, then
broadcast joins for customer/nation/region (no further fact shuffle),
then a partial-agg → final-agg on the 5-value region key. Float
aggregates are rounded so results are bit-stable across partition
orderings (double addition is not associative).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from gaming_ai_analytics_spark.operators.joins import star_join
from gaming_ai_analytics_spark.sources.star import load_table


def flagship_star_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")

    # orders at full scale is a fact too — join it un-broadcast (AQE
    # picks sort-merge / shuffled hash); the true dims broadcast.
    joined = star_join(
        lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey, "left"),
        [
            (customer, orders.o_custkey == customer.c_custkey),
            (nation, customer.c_nationkey == nation.n_nationkey),
            (region, nation.n_regionkey == region.r_regionkey),
        ],
    )

    # Two-level aggregation: level 1 groups by (region, quantity) —
    # l_quantity is low-cardinality (~50 values), so this compresses
    # 600k rows/SF0.1 to |regions|·|quantities| with a fully
    # codegen'd, map-side-partial HashAggregate. Level 2 derives every
    # measure from the compressed rows, including the EXACT
    # interpolated median from (value, count) pairs — which removes
    # the built-in Percentile entirely (it forces the whole
    # aggregation into a slow ObjectHashAggregate buffering every
    # value per group; measured ~0.3 s of the flagship at sf0.1, and
    # unbounded per-group state at 100 TB).
    inter = (
        joined.filter(F.col("l_quantity").isNotNull())  # semantic_layer.sql:14
        .groupBy("r_name", "l_quantity")
        .agg(
            F.count(F.lit(1)).alias("_cnt"),
            F.sum("l_extendedprice").alias("_sum_price"),
            F.sum(
                F.when(F.col("l_discount") > 0.05, 1).otherwise(0)
            ).alias("_hi"),
            F.sum(
                F.when(F.col("l_discount") < 0.02, 1).otherwise(0)
            ).alias("_lo"),
        )
    )
    n = F.sum("_cnt")
    agg = inter.groupBy("r_name").agg(
        n.alias("line_count"),  # review_count analog (A1)
        F.round(F.sum("_sum_price") / n, 2).alias("avg_price"),  # A2
        F.round(F.sum("_hi") / n, 4).alias(  # positive_review_pct (A3)
            "high_discount_pct"
        ),
        F.round(F.sum("_lo") / n, 4).alias(  # negative_review_pct (A3)
            "low_discount_pct"
        ),
        F.array_sort(  # (value, count) histogram for the exact median
            F.collect_list(F.struct(F.col("l_quantity").alias("v"), F.col("_cnt").alias("c")))
        ).alias("_hist"),
    )
    # exact interpolated median from the per-group histogram (A4):
    # rank pos = 1 + (n-1)·0.5; walk the sorted (v, c) pairs once,
    # grabbing the values covering ranks floor(pos) and ceil(pos).
    pos = F.lit(1.0) + (F.col("line_count") - 1) * 0.5
    lo, hi = F.floor(pos), F.ceiling(pos)
    zero = F.struct(
        F.lit(0).cast("long").alias("cum"),
        F.lit(None).cast("double").alias("vlo"),
        F.lit(None).cast("double").alias("vhi"),
    )

    def step(acc, x):
        cum = acc["cum"] + x["c"]
        return F.struct(
            cum.alias("cum"),
            F.coalesce(acc["vlo"], F.when(cum >= lo, x["v"])).alias("vlo"),
            F.coalesce(acc["vhi"], F.when(cum >= hi, x["v"])).alias("vhi"),
        )

    sel = F.aggregate(F.col("_hist"), zero, step)
    median = F.round(
        sel["vlo"] + (sel["vhi"] - sel["vlo"]) * (pos - lo), 2
    )
    return agg.select(
        "r_name",
        "line_count",
        "avg_price",
        "high_discount_pct",
        "low_discount_pct",
        median.alias("median_qty"),
    )


FLAGSHIP_ORACLE_SQL = """
SELECT r_name,
       COUNT(*) AS line_count,
       ROUND(AVG(l_extendedprice), 2) AS avg_price,
       ROUND(SUM(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) * 1.0
             / COUNT(*), 4) AS high_discount_pct,
       ROUND(SUM(CASE WHEN l_discount < 0.02 THEN 1 ELSE 0 END) * 1.0
             / COUNT(*), 4) AS low_discount_pct,
       ROUND(quantile_cont(l_quantity, 0.5), 2) AS median_qty
FROM lineitem
LEFT JOIN orders   ON l_orderkey  = o_orderkey
LEFT JOIN customer ON o_custkey   = c_custkey
LEFT JOIN nation   ON c_nationkey = n_nationkey
LEFT JOIN region   ON n_regionkey = r_regionkey
WHERE l_quantity IS NOT NULL
GROUP BY r_name
"""
