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

    n = F.count(F.lit(1))
    return (
        joined.filter(F.col("l_quantity").isNotNull())  # semantic_layer.sql:14
        .groupBy("r_name")
        .agg(
            n.alias("line_count"),  # review_count analog (A1)
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),  # A2
            F.round(  # positive_review_pct analog (A3)
                F.sum(F.when(F.col("l_discount") > 0.05, 1).otherwise(0)) / n, 4
            ).alias("high_discount_pct"),
            F.round(  # negative_review_pct analog (A3)
                F.sum(F.when(F.col("l_discount") < 0.02, 1).otherwise(0)) / n, 4
            ).alias("low_discount_pct"),
            F.round(  # median_review_length analog (A4)
                F.percentile("l_quantity", F.lit(0.5)), 2
            ).alias("median_qty"),
        )
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
