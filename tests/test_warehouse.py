"""Warehouse report-shape tests: each classic decision-support query
is re-derived with independent DataFrame ops on sf0.001 and the
registered query's output must agree (the DuckDB oracle parity is
covered separately by tools/verify_local.py / the driver gate)."""

from __future__ import annotations

from pyspark.sql import functions as F

from gaming_ai_analytics_spark.queries_warehouse import (
    q_late_ship_priority_counts,
    q_pricing_summary,
    q_priority_class_mix,
    q_returned_item_customers,
    q_top_revenue_orders,
)
from gaming_ai_analytics_spark.sources.star import load_table


def test_pricing_summary_totals(spark, sf_dir):
    out = q_pricing_summary(spark, sf_dir)
    rows = out.collect()
    # grouping key is (returnflag, linestatus) — must be unique
    keys = [(r.l_returnflag, r.l_linestatus) for r in rows]
    assert len(keys) == len(set(keys)) > 0
    # count_order must total exactly the filtered fact rows
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.to_timestamp(F.lit("2000-01-01"))
    )
    assert sum(r.count_order for r in rows) == li.count()
    # avg is consistent with sum/count at the rounding grain
    for r in rows:
        assert abs(r.avg_qty - r.sum_qty / r.count_order) < 0.01


def test_top_revenue_orders_ranking(spark, sf_dir):
    rows = q_top_revenue_orders(spark, sf_dir).collect()
    assert len(rows) <= 10
    revs = [r.revenue for r in rows]
    assert revs == sorted(revs, reverse=True)
    # every surviving order belongs to the filtered segment
    seg_keys = {
        r.c_custkey
        for r in load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
        .collect()
    }
    custof = {
        r.o_orderkey: r.o_custkey
        for r in load_table(spark, sf_dir, "orders").collect()
    }
    assert all(custof[r.o_orderkey] in seg_keys for r in rows)


def test_returned_item_customers_revenue(spark, sf_dir):
    rows = q_returned_item_customers(spark, sf_dir).collect()
    assert 0 < len(rows) <= 20
    revs = [r.revenue for r in rows]
    assert revs == sorted(revs, reverse=True)
    # independently recompute the top customer's lost revenue
    top = rows[0]
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1998-01-01")))
        & (F.col("o_custkey") == top.c_custkey)
    )
    expect = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                2,
            )
        )
        .collect()[0][0]
    )
    assert abs(top.revenue - expect) < 0.01


def test_priority_class_mix_partition(spark, sf_dir):
    rows = q_priority_class_mix(spark, sf_dir).collect()
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    joined = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    # high + low line counts partition the join exactly
    assert sum(r.high_line_count + r.low_line_count for r in rows) == joined


def test_late_ship_exists_semantics(spark, sf_dir):
    rows = q_late_ship_priority_counts(spark, sf_dir).collect()
    # recompute via a distinct-count formulation of the EXISTS
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1998-01-01")))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late_orders = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .select("o_orderkey", "o_orderpriority")
        .distinct()
        .groupBy("o_orderpriority")
        .count()
    )
    expect = {r.o_orderpriority: r["count"] for r in late_orders.collect()}
    got = {r.o_orderpriority: r.order_count for r in rows}
    assert got == expect and sum(got.values()) > 0
