"""Classic warehouse report shapes (TPC-H-style) over the star schema.

The reference's exploration surface
(``/root/reference/exploration/analysis.sql:20-59``) runs ad-hoc
join + aggregate reports; these register the canonical decision-support
shapes every warehouse user expects — pricing summary, segment top-k
revenue, returned-item customers, priority mix, EXISTS-style late-ship
counts — each adapted to the available star columns and paired with a
full DuckDB oracle.

Scale notes (100 TB): every query is one fact scan with filters pushed
to parquet, dims broadcast, and a single hash-aggregate shuffle on
low-cardinality keys; the top-k reports finish with
TakeOrderedAndProject (never a global sort). The one fact⋈fact join
(orders⋈lineitem) is an AQE sort-merge join on the natural key — the
co-located-bucketing path in ``sources/io.py`` removes even that
shuffle when both tables are bucketed by orderkey.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from gaming_ai_analytics_spark.registry import register
from gaming_ai_analytics_spark.sources.star import load_table

def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: one-pass pricing summary by (returnflag,
    linestatus).  Pure map-side-combine aggregate — the 9 measures ride
    a single shuffle on a ~6-value grouping key; at 100 TB the partial
    aggregation compresses each input split to ≤6 rows before the
    exchange."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.to_timestamp(F.lit("2000-01-01"))
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(charge), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 2).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


register(
    "pricing_summary",
    q_pricing_summary,
    """
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)
               AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
               AS sum_charge,
           ROUND(AVG(l_quantity), 2) AS avg_qty,
           ROUND(AVG(l_extendedprice), 2) AS avg_price,
           ROUND(AVG(l_discount), 4) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-01-01'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)


def q_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: top-10 open orders by discounted revenue for one
    market segment.  The segment-filtered customer dim broadcasts into
    orders; the surviving orders broadcast-or-SMJ into lineitem under
    AQE; the final top-k is TakeOrderedAndProject over the aggregated
    frame (k rows per partition → k rows total, no global sort)."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.to_timestamp(F.lit("1998-01-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.to_timestamp(F.lit("1998-01-01"))
    )
    return (
        li.join(
            orders.join(
                F.broadcast(cust),
                orders.o_custkey == cust.c_custkey,
            ).select("o_orderkey", "o_orderdate", "o_orderpriority"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("_rev")
        )
        .orderBy(F.col("_rev").desc(), F.col("o_orderkey"))
        .limit(10)
        .select(
            "o_orderkey",
            F.round(F.col("_rev"), 2).alias("revenue"),
            "o_orderdate",
            "o_orderpriority",
        )
    )


register(
    "top_revenue_orders",
    q_top_revenue_orders,
    """
    SELECT o_orderkey, ROUND(_rev, 2) AS revenue, o_orderdate,
           o_orderpriority
    FROM (
      SELECT o.o_orderkey, o.o_orderdate, o.o_orderpriority,
             SUM(l.l_extendedprice * (1 - l.l_discount)) AS _rev
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      WHERE c.c_mktsegment = 'BUILDING'
        AND o.o_orderdate < TIMESTAMP '1998-01-01'
        AND l.l_shipdate > TIMESTAMP '1998-01-01'
      GROUP BY 1, 2, 3
    )
    ORDER BY _rev DESC, o_orderkey LIMIT 10
    """,
)


def q_returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returns in
    one quarter, flattened with nation.  Two broadcast dims (customer
    at 100 TB is still ≪ fact — if not, AQE falls back to SMJ), one
    grouping shuffle on custkey, TakeOrdered finish."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1998-01-01")))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(
            orders.select("o_orderkey", "o_custkey"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(cust.select("c_custkey", "c_name", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(
            F.sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount"))
            ).alias("_rev")
        )
        .orderBy(F.col("_rev").desc(), F.col("c_custkey"))
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            F.round(F.col("_rev"), 2).alias("revenue"),
            F.col("n_name").alias("nation"),
        )
    )


register(
    "returned_item_customers",
    q_returned_item_customers,
    """
    SELECT c_custkey, c_name, ROUND(_rev, 2) AS revenue, nation
    FROM (
      SELECT c.c_custkey, c.c_name, n.n_name AS nation,
             SUM(l.l_extendedprice * (1 - l.l_discount)) AS _rev
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      WHERE l.l_returnflag = 'R'
        AND o.o_orderdate >= TIMESTAMP '1997-01-01'
        AND o.o_orderdate < TIMESTAMP '1998-01-01'
      GROUP BY 1, 2, 3
    )
    ORDER BY _rev DESC, c_custkey LIMIT 20
    """,
)


def q_priority_class_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (adapted: the star has no shipmode column, so
    the mix is measured per returnflag): high- vs low-priority line
    counts.  Fact⋈fact equi-join (AQE SMJ; zero-shuffle when bucketed)
    then a 3-key aggregate."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_returnflag"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(high.cast("long")).alias("high_line_count"),
            F.sum((~high).cast("long")).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


register(
    "priority_class_mix",
    q_priority_class_mix,
    """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY l_returnflag ORDER BY l_returnflag
    """,
)


def q_late_ship_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: orders-by-priority where EXISTS a line shipped
    more than 60 days after the order date.  The EXISTS compiles to a
    LEFT SEMI join — probe side carries only (orderkey, shipdate), and
    the semi join short-circuits on first match instead of multiplying
    fact rows."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1998-01-01")))
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (
                li.l_shipdate
                > orders.o_orderdate + F.expr("INTERVAL 60 DAYS")
            ),
            "leftsemi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


register(
    "late_ship_priority_counts",
    q_late_ship_priority_counts,
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
)


def q_regional_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: local-supplier revenue by nation for one region
    and year.  Six-table star: the four dims (customer, supplier,
    nation, region) broadcast; lineitem⋈orders is the one fact⋈fact
    sort-merge join (bucketing removes it, sources/io.py); the
    ``c_nationkey = s_nationkey`` residual is a post-join filter on
    broadcast columns, so the whole plan carries exactly one big
    shuffle plus a 25-key aggregate."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.to_timestamp(F.lit("1996-01-01")))
        & (F.col("o_orderdate") < F.to_timestamp(F.lit("1997-01-01")))
    )
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "ASIA"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


register(
    "regional_supplier_volume",
    q_regional_supplier_volume,
    """
    SELECT n_name,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1997-01-01'
    GROUP BY n_name
    """,
)


def q_nation_trade_flows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral shipping volume between two nations by
    year.  Both nation dims broadcast (aliased twice); the OR of the
    two direction tuples is evaluated on broadcast columns after the
    fact joins, so no extra shuffle; grouping key is (2 nations × 2
    directions × years) — tiny."""
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), supp.s_nationkey == n1.s_nkey)
        .join(F.broadcast(n2), cust.c_nationkey == n2.c_nkey)
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


register(
    "nation_trade_flows",
    q_nation_trade_flows,
    """
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM supplier, lineitem, orders, customer, nation n1, nation n2
    WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
      AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
      AND c_nationkey = n2.n_nationkey
      AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    GROUP BY 1, 2, 3
    """,
)


def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: one nation's supplier share of a region's
    ECONOMY-part market by order year.  The share is a conditional-sum
    ratio inside one aggregate over the joined fact — numerator and
    denominator ride the same shuffle (no second pass, no join of two
    aggregates)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_type") == "ECONOMY"
    )
    n_cust = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"),
        F.col("n_regionkey").alias("cn_rkey"),
    )
    n_supp = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"),
        F.col("n_name").alias("supp_nation"),
    )
    region = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "EUROPE"
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n_cust), cust.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(region), F.col("cn_rkey") == region.r_regionkey)
        .join(F.broadcast(n_supp), supp.s_nationkey == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", volume).otherwise(
                        F.lit(0.0)
                    )
                )
                / F.sum(volume),
                4,
            ).alias("mkt_share")
        )
    )


register(
    "market_share",
    q_market_share,
    """
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
           ROUND(SUM(CASE WHEN n2.n_name = 'NATION_3'
                          THEN l_extendedprice * (1 - l_discount)
                          ELSE 0 END)
                 / SUM(l_extendedprice * (1 - l_discount)), 4) AS mkt_share
    FROM part, lineitem, orders, customer, supplier,
         nation n1, nation n2, region
    WHERE p_partkey = l_partkey AND o_orderkey = l_orderkey
      AND c_custkey = o_custkey AND s_suppkey = l_suppkey
      AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
      AND s_nationkey = n2.n_nationkey
      AND r_name = 'EUROPE' AND p_type = 'ECONOMY'
    GROUP BY 1
    """,
)


def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS — the general form beyond ROLLUP/CUBE
    (``agg_rollup`` / ``agg_cube``): per-status totals, per-priority
    totals, and the grand total in ONE pass.  Spark plans this as a
    single Expand + hash aggregate: each input row fans out once per
    set, partials combine map-side, so the three reports cost one
    shuffle instead of three scans."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupingSets(
        [["o_orderstatus"], ["o_orderpriority"], []],
        "o_orderstatus",
        "o_orderpriority",
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


register(
    "agg_grouping_sets",
    q_agg_grouping_sets,
    """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)


def q_lateral_topk_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery — the SQL surface for per-row
    dependent joins (top-2 suppliers by balance per nation).  Catalyst
    decorrelates the LATERAL into a ranked window over one
    nation-keyed shuffle — same physical plan as
    ``window_topk_per_group``, so the scale properties carry over; the
    point here is the SQL-language surface, exercised verbatim on both
    engines.  Tables bind via ``parquet.`path``` scans, not session
    temp views, so concurrent callers at different scale factors never
    race on view names."""
    return spark.sql(
        f"""
        SELECT n.n_name, t.s_name, ROUND(t.s_acctbal, 2) AS s_acctbal
        FROM parquet.`{sf_dir}/nation.parquet` n,
        LATERAL (
            SELECT s_name, s_acctbal
            FROM parquet.`{sf_dir}/supplier.parquet` s
            WHERE s.s_nationkey = n.n_nationkey
            ORDER BY s_acctbal DESC, s_name
            LIMIT 2
        ) t
        """
    )


register(
    "lateral_topk_suppliers",
    q_lateral_topk_suppliers,
    """
    SELECT n.n_name, t.s_name, ROUND(t.s_acctbal, 2) AS s_acctbal
    FROM nation n,
    LATERAL (
        SELECT s_name, s_acctbal
        FROM supplier s
        WHERE s.s_nationkey = n.n_nationkey
        ORDER BY s_acctbal DESC, s_name
        LIMIT 2
    ) t
    """,
)


def q_supplier_value_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: suppliers whose revenue exceeds a FRACTION of
    the global total — the uncorrelated scalar-subquery surface
    (HAVING ... > scalar).  The fact aggregates ONCE (map-side
    partial combine); the global total then derives from the compact
    per-supplier relation via an empty-partition window, so the plan
    scans the fact exactly once BY CONSTRUCTION (plan-pinned). No
    driver-side constant smuggling."""
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    per_supp = li.groupBy("l_suppkey").agg(
        F.sum(revenue).alias("_value")
    )
    # the global total derives from the ALREADY-AGGREGATED per-supplier
    # relation via an empty-partition window (|suppliers| rows through
    # one reducer — trivial), NOT from a second aggregation over the
    # fact: referencing the fact twice relies on cross-branch exchange
    # reuse, which proved fragile (late-r5 plan audit: an unrelated
    # broadcast join above the pattern defeats canonical matching and
    # the executed plan scans the fact TWICE). This shape scans it
    # once STRUCTURALLY.
    per = per_supp.withColumn(
        "_total", F.sum("_value").over(Window.partitionBy())
    )
    return (
        per.filter(F.col("_value") > F.col("_total") * 0.001)
        .select(
            "l_suppkey",
            F.round("_value", 2).alias("supp_value"),
            F.round(F.col("_value") / F.col("_total"), 6).alias("value_share"),
        )
    )


register(
    "supplier_value_concentration",
    q_supplier_value_concentration,
    """
    SELECT l_suppkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS supp_value,
           ROUND(SUM(l_extendedprice * (1 - l_discount))
                 / (SELECT SUM(l_extendedprice * (1 - l_discount))
                    FROM lineitem), 6) AS value_share
    FROM lineitem
    GROUP BY l_suppkey
    HAVING SUM(l_extendedprice * (1 - l_discount))
           > (SELECT SUM(l_extendedprice * (1 - l_discount))
              FROM lineitem) * 0.001
    """,
)


def q_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with NO
    orders — scalar subquery (global average) + NOT EXISTS (anti
    join).  The average is a 1-row broadcast; the anti join probes the
    orders key set (left_anti — the same incremental-idempotence
    primitive as J2); grouping by market segment keeps the report
    small.  One fact-side shuffle total."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("_avg")
    )
    rich = (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg"))
    )
    idle = rich.join(
        orders.select("o_custkey"),
        rich.c_custkey == F.col("o_custkey"),
        "left_anti",
    )
    return idle.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.round(F.sum("c_acctbal"), 2).alias("total_balance"),
    )


register(
    "idle_rich_customers",
    q_idle_rich_customers,
    """
    SELECT c_mktsegment, COUNT(*) AS n_customers,
           ROUND(SUM(c_acctbal), 2) AS total_balance
    FROM customer c
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer
                       WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey)
    GROUP BY 1
    """,
)


def q_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: share of one month's revenue carried by a
    promo-class part — conditional numerator and denominator in ONE
    aggregate over the part-joined fact (no second pass), part dim
    broadcast, month filter pushed to the fact scan."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-03-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-04-01")))
    )
    part = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            F.round(
                F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                * 100.0
                / F.sum(rev),
                4,
            ).alias("promo_revenue_pct")
        )
    )


register(
    "promo_revenue_share",
    q_promo_revenue_share,
    """
    SELECT ROUND(
             SUM(CASE WHEN p_type = 'PROMO'
                      THEN l_extendedprice * (1 - l_discount)
                      ELSE 0 END) * 100.0
             / SUM(l_extendedprice * (1 - l_discount)), 4)
               AS promo_revenue_pct
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND l_shipdate >= TIMESTAMP '1997-03-01'
      AND l_shipdate < TIMESTAMP '1997-04-01'
    """,
)


def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from orders far below a part's own
    average quantity — the CORRELATED scalar subquery surface.
    Catalyst decorrelates the per-part average into an aggregate
    joined back on the key; expressed directly as that decorrelated
    plan (aggregate below a broadcast join; the fact is read once
    per branch — scan twice, but each branch's shuffle is the compact
    aggregate, never the raw fact; a windowed per-part average would
    instead shuffle the ENTIRE fact by part key, strictly worse at
    scale — no per-row subquery execution ever)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand") == "Brand#23"
    )
    avg_qty = li.groupBy(F.col("l_partkey").alias("_pk")).agg(
        (F.avg("l_quantity") * 0.5).alias("_half_avg")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(avg_qty, li.l_partkey == F.col("_pk"))
        .filter(F.col("l_quantity") < F.col("_half_avg"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias(
                "avg_yearly_loss"
            )
        )
    )


register(
    "small_quantity_revenue",
    q_small_quantity_revenue,
    """
    SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly_loss
    FROM lineitem l, part
    WHERE l.l_partkey = p_partkey AND p_brand = 'Brand#23'
      AND l_quantity < (SELECT 0.5 * AVG(l_quantity) FROM lineitem
                        WHERE l_partkey = l.l_partkey)
    """,
)


def q_disjunctive_predicate_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: a join whose residual is an OR of predicate
    conjunctions mixing both sides — the optimizer must still extract
    the common `l_partkey = p_partkey` equi-key (hash join, never a
    nested loop) and push the single-side conjuncts
    (`l_quantity`, `p_size` bounds) below the join.  Revenue from
    the union of three bracket combinations in one pass."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    b1 = (
        (F.col("p_brand") == "Brand#12")
        & (F.col("p_size") <= 5)
        & F.col("l_quantity").between(1, 11)
    )
    b2 = (
        (F.col("p_brand") == "Brand#23")
        & (F.col("p_size") <= 10)
        & F.col("l_quantity").between(10, 20)
    )
    b3 = (
        (F.col("p_brand") == "Brand#34")
        & (F.col("p_size") <= 15)
        & F.col("l_quantity").between(20, 30)
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        j.filter(b1 | b2 | b3)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.round(F.sum(rev), 2).alias("revenue"),
        )
    )


register(
    "disjunctive_predicate_join",
    q_disjunctive_predicate_join,
    """
    SELECT p_brand, COUNT(*) AS n_lines,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND ((p_brand = 'Brand#12' AND p_size <= 5
            AND l_quantity BETWEEN 1 AND 11)
        OR (p_brand = 'Brand#23' AND p_size <= 10
            AND l_quantity BETWEEN 10 AND 20)
        OR (p_brand = 'Brand#34' AND p_size <= 15
            AND l_quantity BETWEEN 20 AND 30))
    GROUP BY 1
    """,
)


def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: the supplier(s) offering each qualifying part
    at its MINIMUM price — the correlated-min-subquery surface. The
    schema has no partsupp table, so the part-supplier offer relation
    derives from lineitem (avg unit price per (part, supplier) —
    exactly the aggregation a 100 TB catalog build would
    materialize). The correlated ``= (SELECT MIN ...)`` decorrelates
    into a per-part MIN WINDOW over the aggregated (part, supplier)
    offers relation — one fact scan by construction (plan-pinned),
    the window shuffles only the compact offers; the part filter
    broadcasts, and supplier/nation are broadcast dims. No per-row
    subquery execution ever."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "LARGE")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    offers = li.groupBy("l_partkey", "l_suppkey").agg(
        F.round(F.avg(F.col("l_extendedprice") / F.col("l_quantity")), 4)
        .alias("offer_price")
    )
    # per-part min via a window over the aggregated offers relation —
    # one fact scan structurally (the aggregate-and-join-back form
    # referenced `offers` twice and depended on exchange reuse, which
    # the late-r5 plan audit showed the surrounding broadcast joins
    # defeat: the executed plan scanned lineitem twice)
    best = offers.withColumn(
        "_min_price",
        F.min("offer_price").over(Window.partitionBy("l_partkey")),
    ).filter(F.col("offer_price") == F.col("_min_price"))
    return (
        best.join(F.broadcast(part), best.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), best.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .select("p_partkey", "s_name", "n_name", "offer_price")
        .orderBy("p_partkey", "s_name")
    )


register(
    "min_cost_supplier",
    q_min_cost_supplier,
    """
    WITH offers AS (
      SELECT l_partkey, l_suppkey,
             ROUND(AVG(l_extendedprice / l_quantity), 4) AS offer_price
      FROM lineitem GROUP BY 1, 2)
    SELECT p.p_partkey, s.s_name, n.n_name, o.offer_price
    FROM offers o
    JOIN part p ON o.l_partkey = p_partkey
    JOIN supplier s ON o.l_suppkey = s_suppkey
    JOIN nation n ON s.s_nationkey = n_nationkey
    WHERE p_size = 15 AND p_type = 'LARGE'
      AND o.offer_price = (SELECT MIN(o2.offer_price) FROM offers o2
                           WHERE o2.l_partkey = o.l_partkey)
    ORDER BY p_partkey, s_name
    """,
)


def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: top-10 unshipped orders by revenue for one market
    segment. Customer filter broadcasts into orders, the date
    predicates push to both fact scans, revenue aggregates on the
    order key (one fact shuffle), and the top-10 finishes as
    TakeOrderedAndProject — never a global sort."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.to_timestamp(F.lit("1998-03-15"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.to_timestamp(F.lit("1998-03-15"))
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(rev), 2).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(
            F.col("revenue").desc(), "o_orderdate", "l_orderkey"
        )
        .limit(10)
    )


register(
    "shipping_priority",
    q_shipping_priority,
    """
    SELECT l_orderkey,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           o_orderdate, o_orderpriority
    FROM customer, orders, lineitem
    WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)


def q_forecast_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure filter-and-sum forecast — the canonical
    predicate-pushdown probe. Every predicate (date range, discount
    band, quantity cap) reaches the parquet scan as a PushedFilter;
    the aggregate is a zero-group map-side fold to a single row."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1998-01-01")))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2)
        .alias("revenue_delta"),
        F.count(F.lit(1)).alias("n_lines"),
    )


register(
    "forecast_revenue_delta",
    q_forecast_revenue_delta,
    """
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue_delta,
           COUNT(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """,
)


def q_product_profit_by_nation_year(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q9 shape: profit on a product line by supplier nation and
    ship year. The LIKE filter prunes the part dim BEFORE broadcast
    (a 100 TB part table would instead semi-join), supplier/nation
    broadcast, and the aggregate shuffles once on the tiny
    (nation, year) key. No partsupp/supplycost in this schema, so
    profit is discounted revenue."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%red%")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(
            "n_name", F.year("l_shipdate").alias("o_year")
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))),
                2,
            ).alias("profit")
        )
        .orderBy("n_name", F.col("o_year").desc())
    )


register(
    "product_profit_by_nation_year",
    q_product_profit_by_nation_year,
    """
    SELECT n_name, EXTRACT(year FROM l_shipdate) AS o_year,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS profit
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%red%'
    GROUP BY 1, 2 ORDER BY n_name, o_year DESC
    """,
)


def q_customer_order_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TPC-H Q13: the distribution of order counts per customer,
    INCLUDING zero-order customers — the left-outer-join-then-
    regroup surface. The join condition carries a non-key predicate
    (priority filter) so it cannot be pushed below the outer join;
    ``F.count(col)`` counts only matched rows, preserving the
    zero bucket. Two shuffles: customer-key count, then the tiny
    count-of-counts."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per_cust = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


register(
    "customer_order_distribution",
    q_customer_order_distribution,
    """
    WITH c_orders AS (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey)
    SELECT c_count, COUNT(*) AS custdist
    FROM c_orders GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)


def q_top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: the supplier(s) with maximum quarterly revenue —
    the view-plus-scalar-max surface. The revenue aggregate is
    computed ONCE and the scalar max derives from it via an
    empty-partition window (|suppliers| rows through one reducer), so
    the fact is scanned exactly once by construction (plan-pinned);
    supplier is a broadcast dim. Revenue rounds BEFORE the max
    comparison on both engines, so the equality is ulp-stable."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.to_timestamp(F.lit("1997-01-01")))
        & (F.col("l_shipdate") < F.to_timestamp(F.lit("1997-04-01")))
    )
    supp = load_table(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("total_revenue")
    )
    # scalar max via an empty-partition window over the aggregated
    # |suppliers|-row relation — one fact scan structurally. (The
    # previous agg-and-broadcast-back form referenced `revenue` in two
    # branches and DEPENDED on exchange reuse, which the late-r5 plan
    # audit showed silently breaks once the supplier broadcast join
    # sits above it: the executed plan scanned lineitem twice.)
    top = revenue.withColumn(
        "_max", F.max("total_revenue").over(Window.partitionBy())
    ).filter(F.col("total_revenue") == F.col("_max"))
    return (
        top.join(F.broadcast(supp), F.col("supplier_no") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


register(
    "top_supplier_revenue",
    q_top_supplier_revenue,
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1997-04-01'
      GROUP BY 1)
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s_suppkey
    """,
)


def q_supplier_part_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: supplier variety per part category, excluding
    a brand, a type, and a supplier denylist — the NOT-IN-subquery
    surface. The part-supplier relation derives from lineitem
    (distinct pairs — one map-side-combined shuffle); the denylist
    (negative-balance suppliers) is a broadcast LEFT ANTI join (the
    keys are non-null, so NOT IN ≡ anti join); the distinct-count
    aggregate shuffles on the small (brand, type, size) key."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#12")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
    )
    deny = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    partsupp = li.select("l_partkey", "l_suppkey").distinct()
    return (
        partsupp.join(
            F.broadcast(deny),
            partsupp.l_suppkey == deny.s_suppkey,
            "left_anti",
        )
        .join(F.broadcast(part), F.col("l_partkey") == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size"
        )
    )


register(
    "supplier_part_variety",
    q_supplier_part_variety,
    """
    WITH partsupp AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM partsupp JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#12' AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_acctbal < 0)
    GROUP BY 1, 2, 3
    ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
    """,
)


def q_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18: customers behind the largest-volume orders — the
    IN-over-HAVING-subquery surface. The quantity aggregate both
    FILTERS (the HAVING) and SUPPLIES the output column, so the plan
    aggregates lineitem once on the order key, filters, and joins the
    survivors (a tiny set) to orders and the customer dim — broadcast
    both ways. Top-20 via TakeOrderedAndProject on a unique sort."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > 280)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select(
            "c_name", "o_orderkey", "o_orderdate", "o_totalprice",
            "total_qty",
        )
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(20)
    )


register(
    "large_volume_customers",
    q_large_volume_customers,
    """
    WITH big AS (
      SELECT l_orderkey, ROUND(SUM(l_quantity), 2) AS total_qty
      FROM lineitem GROUP BY 1 HAVING SUM(l_quantity) > 280)
    SELECT c_name, o_orderkey, o_orderdate, o_totalprice, total_qty
    FROM big JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 20
    """,
)


def q_dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers holding a dominant share of some
    product line's volume — the nested-correlated-aggregate surface
    (share of a per-part total). The (part, supplier) aggregate is
    computed once; per-part totals come from a window over that
    compact relation, so the fact is scanned exactly once by
    construction (plan-pinned); the name-filtered part dim
    broadcasts; supplier/nation broadcast for labeling."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("%red%")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    part_qty = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("supp_qty")
    )
    # per-part totals via a window over the aggregated (part, supplier)
    # relation — one fact scan structurally (see q_min_cost_supplier
    # for the exchange-reuse fragility this avoids)
    pq = part_qty.withColumn(
        "total_qty",
        F.sum("supp_qty").over(Window.partitionBy("l_partkey")),
    )
    return (
        pq.join(F.broadcast(part), pq.l_partkey == part.p_partkey)
        .filter(F.col("supp_qty") > F.col("total_qty") * 0.12)
        .join(F.broadcast(supp), pq.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy("s_name", "n_name")
        .agg(F.count(F.lit(1)).alias("n_dominated_parts"))
        .orderBy(F.col("n_dominated_parts").desc(), "s_name")
        .limit(10)
    )


register(
    "dominant_part_suppliers",
    q_dominant_part_suppliers,
    """
    WITH part_qty AS (
      SELECT l_partkey, l_suppkey, SUM(l_quantity) AS supp_qty
      FROM lineitem GROUP BY 1, 2),
    tot AS (SELECT l_partkey, SUM(supp_qty) AS total_qty
            FROM part_qty GROUP BY 1)
    SELECT s_name, n_name, COUNT(*) AS n_dominated_parts
    FROM part_qty pq
    JOIN tot USING (l_partkey)
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON pq.l_suppkey = s_suppkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE p_name LIKE '%red%' AND pq.supp_qty > 0.12 * tot.total_qty
    GROUP BY 1, 2
    ORDER BY n_dominated_parts DESC, s_name
    LIMIT 10
    """,
)


def q_sole_return_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the ONLY supplier with
    returned lines on a multi-supplier finalized order — the
    EXISTS + NOT EXISTS double-correlation surface.

    ONE fact pass, ONE fact-scale shuffle (r6 rewrite; the oracle
    keeps the textbook EXISTS form to pin the equivalence): the fact
    repartitions on the order key — ``HashPartitioning(l_orderkey)``
    satisfies the clustering requirement of BOTH the
    ``(l_orderkey, l_suppkey)`` aggregate and the order-key window
    above it, so neither inserts another exchange. Per (order,
    supplier) the aggregate keeps the returned-line count; the window
    derives ``n_supp`` (distinct suppliers = rows in the partition)
    and ``n_ret_supp`` without a second fact scan or a join-back, and
    (n_supp > 1, n_ret_supp = 1) on a row with returns is EXACTLY the
    EXISTS/NOT-EXISTS conjunction; ``SUM(_nr)`` restores the
    per-returned-LINE count the textbook form emits. Map-side combine
    is deliberately forfeited: lines per (order, supplier) ≈ 1.07, so
    combining saves ~7% of shuffle bytes while costing a second
    exchange — measured 1.39 → 0.86 s at sf0.1 and 2.63 → 1.79 s at
    sf1 vs the previous two-scan EXISTS-flattening plan (the earlier
    double ``countDistinct`` also rode an Expand, doubling pre-shuffle
    rows). Window state per order key is bounded by suppliers/order
    (~4), valid at any scale."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    supp = load_table(spark, sf_dir, "supplier")
    lvl1 = (
        li.select("l_orderkey", "l_suppkey", "l_returnflag")
        .repartition("l_orderkey")
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.sum(
                F.when(F.col("l_returnflag") == "R", 1).otherwise(0)
            ).alias("_nr")
        )
    )
    w = Window.partitionBy("l_orderkey")
    winners = (
        lvl1.withColumn("_ns", F.count(F.lit(1)).over(w))
        .withColumn(
            "_nrs", F.sum(F.when(F.col("_nr") > 0, 1).otherwise(0)).over(w)
        )
        .filter((F.col("_nr") > 0) & (F.col("_ns") > 1) & (F.col("_nrs") == 1))
    )
    return (
        winners.join(
            orders.select("o_orderkey"),
            winners.l_orderkey == F.col("o_orderkey"),
        )
        .join(F.broadcast(supp), winners.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.sum("_nr").cast("long").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(10)
    )


register(
    "sole_return_suppliers",
    q_sole_return_suppliers,
    """
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier, lineitem l1, orders
    WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 10
    """,
)


def q_fulfillment_latency_profile(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Order-to-first-ship latency distribution by priority — the
    operations dashboard for SLA tracking. Per-order first ship date
    is one order-key aggregation of the fact (map-side combined); the
    day-difference joins the orders side (AQE picks the strategy) and
    the profile aggregates on the 5-value priority key. The exact
    median's aggregation state is a value→count map over day-diffs —
    cardinality-bounded (a few hundred distinct day values), the same
    bounded-percentile argument as the flagship's quantity median."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    first_ship = li.groupBy("l_orderkey").agg(
        F.min("l_shipdate").alias("_first_ship")
    )
    lat = first_ship.join(
        orders, first_ship.l_orderkey == orders.o_orderkey
    ).select(
        "o_orderpriority",
        F.datediff("_first_ship", "o_orderdate").alias("_days"),
    )
    return (
        lat.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.avg("_days"), 4).alias("avg_days"),
            F.round(F.expr("percentile(_days, 0.5D)"), 2).alias(
                "median_days"
            ),
            F.max("_days").alias("max_days"),
        )
        .orderBy("o_orderpriority")
    )


register(
    "fulfillment_latency_profile",
    q_fulfillment_latency_profile,
    """
    WITH lat AS (
      SELECT o_orderpriority,
             date_diff('day', o_orderdate, fs) AS _days
      FROM (SELECT l_orderkey, MIN(l_shipdate) AS fs
            FROM lineitem GROUP BY 1) f
      JOIN orders ON l_orderkey = o_orderkey)
    SELECT o_orderpriority, COUNT(*) AS n_orders,
           ROUND(AVG(_days), 4) AS avg_days,
           ROUND(quantile_cont(_days, 0.5), 2) AS median_days,
           MAX(_days) AS max_days
    FROM lat GROUP BY 1 ORDER BY o_orderpriority
    """,
)


# --------------------------------------------------------------------------
# Benford first-digit profile (Newcomb 1881 / Benford 1938)
# --------------------------------------------------------------------------
def q_benford_price_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of order totals against
    the Benford expectation log10(1 + 1/d) — the classic anomaly /
    fabrication screen auditors run on money columns (naturally-grown
    multiplicative amounts follow it; range-clamped synthetic ones,
    like TPC-H prices, visibly don't — which is exactly what the
    report is for).

    Digit extraction is EXACT on both engines: the price is lifted to
    integer cents (ROUND(p·100) on the bit-identical double, then a
    BIGINT cast) and the digit is the first character of the
    integer's decimal string — no log10-of-double boundary hazard
    where 999.99999… and 1000 disagree about their digit. One scan,
    one 9-group aggregate; the Benford column is closed-form per
    digit. Shares round at 6 dp (the nine log10 constants sit ≥4e-9
    from any rounding boundary, far beyond cross-engine libm drift).
    """
    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("bigint")
    digit = F.substring(cents.cast("string"), 1, 1).cast("int")
    counts = (
        orders.filter(F.col("o_totalprice") > 0)
        .groupBy(digit.alias("digit"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    w = Window.partitionBy()  # 9 rows — driver-scale by construction
    return counts.select(
        "digit",
        "n_orders",
        F.round(
            F.col("n_orders") / F.sum("n_orders").over(w), 6
        ).alias("observed_share"),
        F.round(
            F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit")), 6
        ).alias("benford_share"),
    ).orderBy("digit")


register(
    "benford_price_digits",
    q_benford_price_digits,
    """
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(ROUND(o_totalprice * 100) AS BIGINT)
                              AS VARCHAR), 1, 1) AS INTEGER) AS digit
      FROM orders WHERE o_totalprice > 0),
    counts AS (SELECT digit, COUNT(*) AS n_orders FROM d GROUP BY 1),
    t AS (SELECT SUM(n_orders) AS tot FROM counts)
    SELECT digit, n_orders,
           ROUND(n_orders * 1.0 / tot, 6) AS observed_share,
           ROUND(LOG10(1.0 + 1.0 / digit), 6) AS benford_share
    FROM counts, t ORDER BY digit
    """,
)
