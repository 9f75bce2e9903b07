"""TPC-H-shape analytics plans over the testdata star schema.

Scale notes (100 TB posture):
- Every plan is a declarative DataFrame expression — Catalyst pushes
  filters/projections into the parquet scan and picks join order.
- Dimension tables (region/nation/supplier/part/customer at typical
  ratios) are broadcast explicitly so the fact-table scan never
  shuffles for them.
- Aggregates are partial (map-side combine) by construction.
- Money aggregates use the fixed-point integer-unit pattern
  (functions/numeric.py): double summation is partition-order-
  dependent and round(x, k>=1) tie-handling differs across engines,
  so rounded double sums are not hash-stable. Integer-valued
  columns (l_quantity) keep plain sums — those are exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..functions.numeric import fixed_avg, fixed_avg_int, fixed_sum
from ..sources.readers import load_table


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan → pushed filter → groupBy agg (TPC-H Q1 shape)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            fixed_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            fixed_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc_price"),
            fixed_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
            ).alias("sum_charge"),
            fixed_avg_int(F.col("l_quantity")).alias("avg_qty"),
            fixed_avg(F.col("l_extendedprice")).alias("avg_price"),
            fixed_avg(F.col("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2) AS sum_qty,
       sum(CAST(round(l_extendedprice * 1e2) AS BIGINT)) / 1e2 AS sum_base_price,
       sum(CAST(round(l_extendedprice * (1 - l_discount) * 1e2) AS BIGINT)) / 1e2 AS sum_disc_price,
       sum(CAST(round(l_extendedprice * (1 - l_discount) * (1 + l_tax) * 1e2) AS BIGINT)) / 1e2 AS sum_charge,
       CAST(round(sum(l_quantity) * 1e2 / count(l_quantity)) AS BIGINT) / 1e2 AS avg_qty,
       CAST(round(sum(CAST(round(l_extendedprice * 1e2) AS BIGINT)) * 1e0 / count(*)) AS BIGINT) / 1e2 AS avg_price,
       CAST(round(sum(CAST(round(l_discount * 1e4) AS BIGINT)) * 1e0 / count(*)) AS BIGINT) / 1e4 AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer ⋈ orders ⋈ lineitem, agg, top-10 by revenue."""
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < F.lit("1998-03-15"))
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1995-03-15"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        # customer scales with SF — no broadcast hint; AQE picks
        # broadcast at small SF and sort-merge at cluster scale.
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(fixed_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


Q3_SQL = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       sum(CAST(round(l_extendedprice * (1 - l_discount) * 1e2) AS BIGINT)) / 1e2 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
"""


def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake join: region→nation→(customer, supplier)→orders→lineitem."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    # Pre-filter BOTH SF-scaling dimensions through the tiny
    # nation⋈region slice before they meet the fact tables (guide
    # §3.2): the region predicate only reaches customer/supplier via
    # a multi-join inference Catalyst does not make (the r14 plan
    # broadcast the FULL customer and supplier tables and dropped
    # non-ASIA rows only at the last join). Semantically identical —
    # inner-join reordering plus c_nationkey == s_nationkey pins the
    # customer's nation to the same ASIA nation — and strictly
    # better at cluster scale, where the unfiltered sides would be
    # shuffle-join inputs 5x their useful size. Hash re-gated at
    # sf0.01 and sf0.1.
    asia_n = nation.join(
        broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name")
    cust = cust.join(
        broadcast(asia_n.select(F.col("n_nationkey").alias("cn_key"))),
        cust.c_nationkey == F.col("cn_key"),
        "left_semi",
    )
    supp = supp.join(broadcast(asia_n), supp.s_nationkey == asia_n.n_nationkey)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        # customer/supplier scale with SF — leave broadcast-vs-SMJ to
        # AQE; only fixed-cardinality nation/region keep the hint.
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .filter(cust.c_nationkey == supp.s_nationkey)
        .groupBy("n_name")
        .agg(fixed_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


Q5_SQL = """
SELECT n_name,
       sum(CAST(round(l_extendedprice * (1 - l_discount) * 1e2) AS BIGINT)) / 1e2 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Highly-selective filter + scalar aggregate — pure pushdown."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(fixed_sum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"))
    )


Q6_SQL = """
SELECT sum(CAST(round(l_extendedprice * l_discount * 1e2) AS BIGINT)) / 1e2 AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount >= 0.03 AND l_discount <= 0.07
  AND l_quantity < 24
"""


def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + agg + rank window: top-3 customers by revenue per nation."""
    from pyspark.sql import Window as W

    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        orders.groupBy("o_custkey")
        .agg(fixed_sum(F.col("o_totalprice")).alias("total_spent"), F.count("*").alias("n_orders"))
        # customer scales with SF — AQE decides; nation stays hinted.
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        .join(broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    )
    w = W.partitionBy("n_name").orderBy(F.desc("total_spent"), F.asc("c_custkey"))
    return (
        per_cust.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("n_name", "c_custkey", "c_name", "total_spent", "n_orders", "rnk")
        .orderBy("n_name", "rnk")
    )


Q_TOP_CUSTOMERS_SQL = """
WITH per_cust AS (
  SELECT o_custkey, sum(CAST(round(o_totalprice * 1e2) AS BIGINT)) / 1e2 AS total_spent, count(*) AS n_orders
  FROM orders GROUP BY o_custkey
), ranked AS (
  SELECT n_name, c_custkey, c_name, total_spent, n_orders,
         row_number() OVER (PARTITION BY n_name ORDER BY total_spent DESC, c_custkey ASC) AS rnk
  FROM per_cust
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
)
SELECT n_name, c_custkey, c_name, total_spent, n_orders, rnk
FROM ranked WHERE rnk <= 3 ORDER BY n_name, rnk
"""


def q_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXISTS semi-join: orders having at least one late lineitem."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > F.lit("1998-01-01"))
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q_ORDER_PRIORITY_SQL = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE EXISTS (
  SELECT 1 FROM lineitem
  WHERE l_orderkey = o_orderkey AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q_part_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: quantity shipped by part brand × return flag."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    flags = ["A", "N", "R"]
    piv = (
        # part scales with SF — no broadcast hint, AQE decides.
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .pivot("l_returnflag", flags)
        .agg(F.round(F.sum("l_quantity"), 2))
    )
    cols = [F.col("p_brand")] + [F.coalesce(F.col(f), F.lit(0.0)).alias(f"qty_{f}") for f in flags]
    return piv.select(*cols).orderBy("p_brand")


Q_PART_PIVOT_SQL = """
SELECT p_brand,
       coalesce(round(sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END), 2), 0.0) AS qty_A,
       coalesce(round(sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END), 2), 0.0) AS qty_N,
       coalesce(round(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 2), 0.0) AS qty_R
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand ORDER BY p_brand
"""


def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup region → nation over customer balances."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    joined = cust.join(broadcast(nation), cust.c_nationkey == nation.n_nationkey).join(
        broadcast(region), nation.n_regionkey == region.r_regionkey
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(fixed_sum(F.col("c_acctbal")).alias("total_bal"), F.count("*").alias("n_cust"))
        .orderBy(F.col("r_name").asc_nulls_first(), F.col("n_name").asc_nulls_first())
    )


Q_ROLLUP_SQL = """
SELECT r_name, n_name, sum(CAST(round(c_acctbal * 1e2) AS BIGINT)) / 1e2 AS total_bal, count(*) AS n_cust
FROM customer
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST
"""


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for each purchase event, the same user's latest
    view/click at or before the purchase (classic trade←quote as-of).

    Spark lacks a native as-of join; expressed as a composition —
    union-tag both streams, one per-user ordered window carrying the
    last-seen quote forward (a single hash exchange on user_id; no
    join blowup, unlike the naive range-join + dedup formulation).
    """
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    quotes = ev.filter(F.col("event_type").isin("view", "click"))
    tagged = purchases.select(
        "user_id", "ts", "event_id", F.lit(1).alias("is_purchase")
    ).unionByName(quotes.select("user_id", "ts", "event_id", F.lit(0).alias("is_purchase")))
    w = W.partitionBy("user_id").orderBy("ts", "is_purchase", "event_id").rowsBetween(
        W.unboundedPreceding, -1
    )
    lastq = tagged.withColumn(
        "quote_event_id",
        F.last(F.when(F.col("is_purchase") == 0, F.col("event_id")), ignorenulls=True).over(w),
    ).withColumn(
        "quote_ts",
        F.last(F.when(F.col("is_purchase") == 0, F.col("ts")), ignorenulls=True).over(w),
    )
    return (
        lastq.filter(F.col("is_purchase") == 1)
        .select("user_id", F.col("event_id").alias("purchase_event_id"), F.col("ts").alias("purchase_ts"), "quote_event_id", "quote_ts")
        .orderBy("user_id", "purchase_event_id")
    )


Q_ASOF_SQL = """
WITH tagged AS (
  SELECT user_id, ts, event_id, 1 AS is_purchase FROM events WHERE event_type = 'purchase'
  UNION ALL
  SELECT user_id, ts, event_id, 0 AS is_purchase FROM events WHERE event_type IN ('view', 'click')
), lastq AS (
  SELECT user_id, ts, event_id, is_purchase,
         last_value(CASE WHEN is_purchase = 0 THEN event_id END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, is_purchase, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS quote_event_id,
         last_value(CASE WHEN is_purchase = 0 THEN ts END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, is_purchase, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS quote_ts
  FROM tagged
)
SELECT user_id, event_id AS purchase_event_id, ts AS purchase_ts, quote_event_id, quote_ts
FROM lastq WHERE is_purchase = 1 ORDER BY user_id, purchase_event_id
"""


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: lineitems shipped within 7 days after their order date."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    j = li.join(orders, li.l_orderkey == orders.o_orderkey).filter(
        (li.l_shipdate >= orders.o_orderdate)
        & (li.l_shipdate <= F.date_add(orders.o_orderdate.cast("date"), 7))
    )
    return (
        j.groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_fast_ship"), fixed_avg_int(F.col("l_quantity")).alias("avg_qty"))
        .orderBy("o_orderpriority")
    )


Q_RANGE_JOIN_SQL = """
SELECT o_orderpriority, count(*) AS n_fast_ship,
       CAST(round(sum(l_quantity) * 1e2 / count(l_quantity)) AS BIGINT) / 1e2 AS avg_qty
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= o_orderdate
  AND l_shipdate <= CAST(o_orderdate AS DATE) + INTERVAL 7 DAY
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier": q5_local_supplier,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q_top_customers": q_top_customers,
    "q_order_priority": q_order_priority,
    "q_part_pivot": q_part_pivot,
    "q_rollup": q_rollup,
    "q_asof_join": q_asof_join,
    "q_range_join": q_range_join,
}

ORACLES = {
    "q1_pricing_summary": Q1_SQL,
    "q3_shipping_priority": Q3_SQL,
    "q5_local_supplier": Q5_SQL,
    "q6_forecast_revenue": Q6_SQL,
    "q_top_customers": Q_TOP_CUSTOMERS_SQL,
    "q_order_priority": Q_ORDER_PRIORITY_SQL,
    "q_part_pivot": Q_PART_PIVOT_SQL,
    "q_rollup": Q_ROLLUP_SQL,
    "q_asof_join": Q_ASOF_SQL,
    "q_range_join": Q_RANGE_JOIN_SQL,
}
