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


def test_regional_supplier_volume_nation_consistency(spark, sf_dir):
    from gaming_ai_analytics_spark.queries_warehouse import (
        q_regional_supplier_volume,
    )

    rows = q_regional_supplier_volume(spark, sf_dir).collect()
    # every reported nation belongs to ASIA, and names are unique
    asia = {
        r.n_name
        for r in load_table(spark, sf_dir, "nation")
        .join(
            load_table(spark, sf_dir, "region").filter(
                F.col("r_name") == "ASIA"
            ),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .collect()
    }
    names = [r.n_name for r in rows]
    assert len(names) == len(set(names))
    assert set(names) <= asia
    assert all(r.revenue > 0 for r in rows)


def test_nation_trade_flows_directions(spark, sf_dir):
    from gaming_ai_analytics_spark.queries_warehouse import (
        q_nation_trade_flows,
    )

    rows = q_nation_trade_flows(spark, sf_dir).collect()
    dirs = {(r.supp_nation, r.cust_nation) for r in rows}
    assert dirs <= {("NATION_1", "NATION_2"), ("NATION_2", "NATION_1")}
    assert all(1995 <= r.l_year <= 2001 for r in rows)
    # independent derivation — full-set parity (may be empty at
    # sf0.001; the sf0.01 oracle gate covers the populated case)
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    nk = {r.n_name: r.n_nationkey for r in nation.collect()}
    want = set()
    for sn, cn in (("NATION_1", "NATION_2"), ("NATION_2", "NATION_1")):
        flows = (
            li.join(supp.filter(F.col("s_nationkey") == nk[sn]),
                    F.col("l_suppkey") == F.col("s_suppkey"))
            .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
            .join(cust.filter(F.col("c_nationkey") == nk[cn]),
                  F.col("o_custkey") == F.col("c_custkey"))
            .groupBy(F.year("l_shipdate").alias("y"))
            .agg(F.round(F.sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("rev"))
        )
        want |= {(sn, cn, r.y, r.rev) for r in flows.collect()}
    got = {(r.supp_nation, r.cust_nation, r.l_year, r.revenue) for r in rows}
    assert got == want


def test_market_share_bounded(spark, sf_dir):
    from gaming_ai_analytics_spark.queries_warehouse import q_market_share

    rows = q_market_share(spark, sf_dir).collect()
    assert rows
    assert all(0.0 <= r.mkt_share <= 1.0 for r in rows)
    years = [r.o_year for r in rows]
    assert len(years) == len(set(years))


def test_grouping_sets_matches_three_separate_aggregates(spark, sf_dir):
    from gaming_ai_analytics_spark.queries_warehouse import (
        q_agg_grouping_sets,
    )

    orders = load_table(spark, sf_dir, "orders")
    rows = q_agg_grouping_sets(spark, sf_dir).collect()
    by_status = {
        r.o_orderstatus: r.n_orders
        for r in rows
        if r.o_orderstatus is not None
    }
    by_prio = {
        r.o_orderpriority: r.n_orders
        for r in rows
        if r.o_orderpriority is not None
    }
    grand = [
        r for r in rows if r.o_orderstatus is None and r.o_orderpriority is None
    ]
    want_status = {
        r.o_orderstatus: r.cnt
        for r in orders.groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert by_status == want_status
    assert sum(by_prio.values()) == orders.count()
    assert len(grand) == 1 and grand[0].n_orders == orders.count()
    # one pass: a single Expand feeds a single aggregate
    plan = (
        q_agg_grouping_sets(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Expand") >= 1
    assert "Union" not in plan


def test_lateral_topk_equals_window_topk(spark, sf_dir):
    from gaming_ai_analytics_spark.queries_warehouse import (
        q_lateral_topk_suppliers,
    )
    from pyspark.sql import Window

    got = {
        (r.n_name, r.s_name, r.s_acctbal)
        for r in q_lateral_topk_suppliers(spark, sf_dir).collect()
    }
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    w = Window.partitionBy("s_nationkey").orderBy(
        F.col("s_acctbal").desc(), "s_name"
    )
    want = {
        (r.n_name, r.s_name, r.s_acctbal)
        for r in supp.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 2)
        .join(nation, F.col("s_nationkey") == F.col("n_nationkey"))
        .select("n_name", "s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
        .collect()
    }
    assert got == want


def test_supplier_value_concentration_threshold(spark, sf_dir):
    from gaming_ai_analytics_spark.queries_warehouse import (
        q_supplier_value_concentration,
    )

    rows = q_supplier_value_concentration(spark, sf_dir).collect()
    assert rows
    # every survivor clears the 0.1% share bar; shares are consistent
    for r in rows:
        assert r.value_share > 0.001
    keys = [r.l_suppkey for r in rows]
    assert len(keys) == len(set(keys))


def test_idle_rich_customers_are_rich_and_idle(spark, sf_dir):
    from gaming_ai_analytics_spark.queries_warehouse import (
        q_idle_rich_customers,
    )

    out = q_idle_rich_customers(spark, sf_dir).collect()
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(F.avg("c_acctbal").alias("a"))
        .first()
        .a
    )
    with_orders = {r.o_custkey for r in orders.select("o_custkey").collect()}
    want = {}
    for r in cust.collect():
        if r.c_acctbal > avg_bal and r.c_custkey not in with_orders:
            n, t = want.get(r.c_mktsegment, (0, 0.0))
            want[r.c_mktsegment] = (n + 1, t + r.c_acctbal)
    got = {r.c_mktsegment: (r.n_customers, round(r.total_balance, 2)) for r in out}
    want = {k: (n, round(t, 2)) for k, (n, t) in want.items()}
    assert got == want


def test_promo_share_bounded_and_consistent(spark, sf_dir):
    from gaming_ai_analytics_spark.queries_warehouse import (
        q_promo_revenue_share,
    )

    row = q_promo_revenue_share(spark, sf_dir).first()
    assert row.promo_revenue_pct is None or 0.0 <= row.promo_revenue_pct <= 100.0


def test_small_quantity_revenue_decorrelated_no_rescan_blowup(spark, sf_dir):
    from gaming_ai_analytics_spark.queries_warehouse import (
        q_small_quantity_revenue,
    )

    df = q_small_quantity_revenue(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the per-part average must be a JOINED aggregate, not a per-row
    # correlated subquery execution
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoop" not in plan
    df.collect()  # executes


def test_disjunctive_join_stays_hash_join(spark, sf_dir):
    from gaming_ai_analytics_spark.queries_warehouse import (
        q_disjunctive_predicate_join,
    )

    df = q_disjunctive_predicate_join(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the OR residual must not defeat equi-key extraction
    assert "BroadcastHashJoin" in plan or "SortMergeJoin" in plan
    assert "BroadcastNestedLoop" not in plan
    rows = df.collect()
    assert all(
        r.p_brand in ("Brand#12", "Brand#23", "Brand#34") for r in rows
    )
