"""Deeper TPC-H-shaped plans: the classic multi-join / outer-join /
correlated / anti-join query shapes (Q7, Q9, Q13, Q17, Q22), adapted
to the trimmed testdata schema (no partsupp, no commit/receipt dates,
no comments/phones — substitutions noted per query).

Scale posture shared by all five: only the fixed-cardinality
``nation`` (25 rows) carries an explicit broadcast hint; every
SF-scaling join (orders, lineitem, customer, supplier, part) is left
to AQE to pick broadcast vs shuffle at runtime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..functions.numeric import fixed_point, fixed_sum
from ..sources.readers import load_table


def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral shipping volume between supplier and
    customer nations by year (all distinct pairs instead of the
    spec's FRANCE/GERMANY literals — the testdata's nations are
    synthetic). Two independent nation lookups on one fact join."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    joined = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(broadcast(nat.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))), F.col("s_nationkey") == F.col("sn_key"))
        .join(broadcast(nat.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))), F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
    )
    return (
        joined.groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(fixed_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q7_SQL = """
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       year(l_shipdate) AS l_year,
       sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) / 1e2 AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND sn.n_name <> cn.n_name
GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
"""


def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and order year for a
    product-name family ('widget' parts; profit = discounted revenue —
    the schema has no partsupp, so the supplycost term is dropped)."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").contains("widget")).select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    joined = (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
    )
    return (
        joined.groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(fixed_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("profit"))
        .orderBy("nation", F.col("o_year").desc())
    )


Q9_SQL = """
SELECT n_name AS nation, year(o_orderdate) AS o_year,
       sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) / 1e2 AS profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY 1, 2 ORDER BY nation, o_year DESC
"""


def q13_cust_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of customers by order count,
    excluding urgent orders (standing in for the spec's comment
    filter). LEFT join so zero-order customers land in the c_count=0
    bucket; two cascaded aggregations."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "1-URGENT"
    ).select("o_orderkey", "o_custkey")
    counts = (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        counts.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


Q13_SQL = """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count ORDER BY custdist DESC, c_count DESC
"""


def q17_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: average yearly revenue lost if small-quantity
    orders (below 20% of the part's mean quantity) for one brand were
    not taken. The correlated scalar subquery decorrelates into a
    per-part aggregate joined back to the fact — the standard
    rewrite; Catalyst plans both sides off one scan."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#2").select("p_partkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity", "l_extendedprice")
    li_branded = li.join(part, li.l_partkey == part.p_partkey)
    thresholds = li_branded.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (0.2 * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        li_branded.join(thresholds, F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        # Cents-sum first (order-independent), then one scale-0 round
        # of the deterministic /7 quotient.
        .agg(
            fixed_point(
                F.sum(F.round(F.col("l_extendedprice") * 100.0).cast("long")) / 100.0 / 7.0
            ).alias("avg_yearly")
        )
    )


Q17_SQL = """
SELECT CAST(round(sum(CAST(round(l_extendedprice * 1e2) AS BIGINT)) / 1e2 / 7.0 * 1e2) AS BIGINT) / 1e2 AS avg_yearly
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand = 'Brand#2'
  AND l_quantity < (
    SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
"""


def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: well-funded customers with no RECENT orders
    (none since 2000-01-01 — the spec's "no orders for 7 years") —
    acctbal above the positive-balance average (broadcast scalar via
    cross join, no driver collect) with an ANTI join against the
    recent-order set; reported per nation (the schema has no phone
    country codes). The date filter pushes to the orders scan before
    the anti join builds."""
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_acctbal")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01"))
        .select("o_custkey")
    )
    nat = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    # Exact-cents mean: the threshold is a FILTER boundary, so an
    # order-dependent double avg could flip a borderline customer's
    # membership between engines.
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(
        (
            F.sum(F.round(F.col("c_acctbal") * 100.0).cast("long")) / F.count("*") / 100.0
        ).alias("avg_pos_bal")
    )
    return (
        cust.crossJoin(broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_pos_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .join(broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count("*").alias("numcust"),
            fixed_sum(F.col("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("nation")
    )


Q22_SQL = """
SELECT n_name AS nation, count(*) AS numcust,
       sum(CAST(round(c_acctbal * 1e2) AS BIGINT)) / 1e2 AS totacctbal
FROM customer JOIN nation ON c_nationkey = n_nationkey
WHERE c_acctbal > (SELECT sum(CAST(round(c_acctbal * 1e2) AS BIGINT)) / count(*) / 1e2
                   FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY 1 ORDER BY nation
"""

def q21_blame_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q21 "suppliers who kept orders waiting" shape (reference has
    no commit/receipt dates, so "failed" = shipped a RETURNED line):
    in orders touched by ≥2 distinct suppliers, find the supplier who
    was the ONLY one with a returned line, and rank by blame count.

    Classic Q21 is EXISTS + NOT EXISTS self-joins on the fact table —
    three scans and two shuffles of lineitem. Reformulated Spark-first:
    both conditions are per-order aggregates (distinct-supplier count,
    distinct-returning-supplier count), so ONE groupBy(l_orderkey)
    pass computes them together; the blamed supplier falls out of the
    same aggregate via min(CASE). Fact table is shuffled once on the
    natural key, the supplier dim joins AQE-broadcast at the end."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    per_order = li.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("n_ret_supp"),
        F.min(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("blamed_suppkey"),
    )
    blamed = per_order.filter((F.col("n_supp") >= 2) & (F.col("n_ret_supp") == 1))
    return (
        blamed.groupBy("blamed_suppkey")
        .agg(F.count("*").alias("numwait"))
        .join(supp, F.col("blamed_suppkey") == F.col("s_suppkey"))
        .select("s_name", "numwait")
        .orderBy(F.desc("numwait"), "s_name")
        .limit(20)
    )


Q21_SQL = """
WITH per_order AS (
  SELECT l_orderkey,
         count(DISTINCT l_suppkey) AS n_supp,
         count(DISTINCT CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS n_ret_supp,
         min(CASE WHEN l_returnflag = 'R' THEN l_suppkey END) AS blamed_suppkey
  FROM lineitem GROUP BY 1
)
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM per_order JOIN supplier ON blamed_suppkey = s_suppkey
WHERE n_supp >= 2 AND n_ret_supp = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 20
"""


def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q8 national-market-share shape: of all revenue flowing to
    customers in region ASIA, what fraction was supplied by NATION_0
    suppliers, per order year. The two-level aggregate (conditional
    revenue / total revenue) over a 5-way join.

    Only nation and region — fixed-cardinality catalogs — carry
    broadcast hints; customer/supplier/lineitem/orders joins are
    AQE's call. The share division happens after ONE grouped pass
    (sum + conditional sum together), not two joins of separate
    aggregates."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    cust_region = (
        cust.join(
            broadcast(
                nation.join(
                    broadcast(region.filter(F.col("r_name") == "ASIA")),
                    nation.n_regionkey == region.r_regionkey,
                )
            ),
            cust.c_nationkey == F.col("n_nationkey"),
        )
        .select("c_custkey")
    )
    supp_nation = supp.join(
        broadcast(nation.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))),
        supp.s_nationkey == F.col("sn_key"),
    ).select("s_suppkey", "supp_nation")
    # Integer-cents sums so the share ratio is a deterministic
    # double; one scale-0 round at 1e-6 units replaces round(x, 6).
    rev_cents = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100.0).cast("long")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust_region, orders.o_custkey == cust_region.c_custkey, "left_semi")
        .join(supp_nation, li.l_suppkey == supp_nation.s_suppkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            fixed_point(
                F.sum(F.when(F.col("supp_nation") == "NATION_0", rev_cents).otherwise(F.lit(0)))
                * 1e0
                / F.sum(rev_cents),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


Q8_SQL = """
SELECT CAST(year(o_orderdate) AS INT) AS o_year,
       CAST(round(sum(CASE WHEN n2.n_name = 'NATION_0'
                      THEN CAST(round(l_extendedprice * (1 - l_discount) * 1e2) AS BIGINT) ELSE 0 END)
             * 1e0 / sum(CAST(round(l_extendedprice * (1 - l_discount) * 1e2) AS BIGINT))
             * 1e6) AS BIGINT) / 1e6 AS mkt_share
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE o_custkey IN (
  SELECT c_custkey FROM customer
  JOIN nation ON c_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'
)
GROUP BY 1 ORDER BY o_year
"""


def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q15 top-supplier shape: revenue per supplier over one quarter,
    return the supplier(s) hitting the maximum — the classic
    view + scalar-subquery pattern. The revenue view materializes
    once (it feeds both the max and the filter; supplier cardinality
    scales with SF, so a partitionless window would funnel it all to
    one task — the scalar max joins back broadcast instead), and
    lineitem is scanned exactly once."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    supp = load_table(spark, sf_dir, "supplier")
    rev = (
        li.groupBy("l_suppkey")
        .agg(fixed_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total_revenue"))
        .localCheckpoint(eager=True)
    )
    max_rev = rev.agg(F.max("total_revenue").alias("max_rev"))
    top = (
        rev.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_rev"))
        .drop("max_rev")
    )
    return (
        top.join(supp, top.l_suppkey == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


Q15_SQL = """
WITH revenue AS (
  SELECT l_suppkey, sum(CAST(round(l_extendedprice * (1 - l_discount) * 1e2) AS BIGINT)) / 1e2 AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM revenue JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
ORDER BY s_suppkey
"""


def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock identification). No partsupp
    in the testdata, so lineitem is the part<->supplier bridge (same
    substitution as q2): a part's "stock value" is the cents sum of
    extendedprice shipped by suppliers of one region's nations, and
    the HAVING keeps parts above 0.1% of the grand total.

    The correlated scalar aggregate is decorrelated into a 1-row
    broadcast cross join; the threshold compare is exact integer
    (value*1000 > total) so the gate hash is engine-stable. At scale:
    one shuffle for the part-level agg, a 1-row broadcast for the
    total, nation broadcast — the fact table shuffles once."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nat = (
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_regionkey") == 0)
        .select("n_nationkey")
    )
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    val = (
        li.join(supp, li.l_suppkey == supp.s_suppkey)
        .join(broadcast(nat), supp.s_nationkey == nat.n_nationkey)
        .groupBy("l_partkey")
        .agg(F.sum(cents).alias("value_cents"))
    )
    total = val.agg(F.sum("value_cents").alias("total_cents"))
    return (
        val.join(broadcast(total))
        .filter(F.col("value_cents") * 1000 > F.col("total_cents"))
        .select(F.col("l_partkey").alias("p_partkey"), "value_cents")
        .orderBy(F.desc("value_cents"), "p_partkey")
    )


Q11_SQL = """
WITH val AS (
  SELECT l_partkey AS p_partkey,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS value_cents
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_regionkey = 0
  GROUP BY 1
)
SELECT p_partkey, value_cents
FROM val
WHERE value_cents * 1000 > (SELECT CAST(sum(value_cents) AS BIGINT) FROM val)
ORDER BY value_cents DESC, p_partkey
"""


def q20_potential_promo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion). No partsupp
    availqty, so the "supplier holds excess stock of a promoted part"
    predicate becomes "supplier dominates a small part's 1997 supply":
    per (part, supplier) shipped quantity in [1997, 1998) for parts
    with p_size <= 5, a supplier qualifies when its share exceeds 1/4
    of the part's total (4*supp_qty > part_qty — exact integers).
    The qualifying-supplier set semi-joins back to supplier, keeping
    the original nested IN-subquery shape.

    Scale: one shuffle for the (part, supplier) agg, the per-part
    total reuses that partitioning as a window, and the final
    left-semi join is AQE-sized."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    part = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_size") <= 5)
        .select("p_partkey")
    )
    supp = load_table(spark, sf_dir, "supplier")
    qty = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("supp_qty"))
    )
    dom = (
        qty.withColumn("part_qty", F.sum("supp_qty").over(W.partitionBy("l_partkey")))
        .filter(F.col("supp_qty") * 4 > F.col("part_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        supp.join(dom, supp.s_suppkey == dom.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


Q20_SQL = """
WITH qty AS (
  SELECT l_partkey, l_suppkey,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS supp_qty
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  WHERE p_size <= 5
    AND l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate < TIMESTAMP '1998-01-01'
  GROUP BY 1, 2
), dom AS (
  SELECT l_suppkey
  FROM (SELECT l_suppkey, supp_qty,
               sum(supp_qty) OVER (PARTITION BY l_partkey) AS part_qty
        FROM qty)
  WHERE supp_qty * 4 > part_qty
)
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (SELECT l_suppkey FROM dom)
ORDER BY s_suppkey
"""


QUERIES = {
    "q7_volume_shipping": q7_volume_shipping,
    "q11_important_stock": q11_important_stock,
    "q20_potential_promo": q20_potential_promo,
    "q8_market_share": q8_market_share,
    "q15_top_supplier": q15_top_supplier,
    "q21_blame_supplier": q21_blame_supplier,
    "q9_product_profit": q9_product_profit,
    "q13_cust_distribution": q13_cust_distribution,
    "q17_small_qty_revenue": q17_small_qty_revenue,
    "q22_idle_customers": q22_idle_customers,
}

ORACLES = {
    "q7_volume_shipping": Q7_SQL,
    "q11_important_stock": Q11_SQL,
    "q20_potential_promo": Q20_SQL,
    "q8_market_share": Q8_SQL,
    "q15_top_supplier": Q15_SQL,
    "q21_blame_supplier": Q21_SQL,
    "q9_product_profit": Q9_SQL,
    "q13_cust_distribution": Q13_SQL,
    "q17_small_qty_revenue": Q17_SQL,
    "q22_idle_customers": Q22_SQL,
}
