"""Extended analytics coverage: correlated subqueries, disjunctive
predicates, anti-joins, having-filters, JSON extraction, exact
percentiles — the remaining query shapes a reference user would
expect from a complete engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from ..functions.numeric import fixed_avg, fixed_avg_int, fixed_point, fixed_sum
from ..sources.readers import load_table


def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-subquery shape (TPC-H Q2): per part, the supplier(s)
    with the minimum account balance — decorrelated into a window
    min over the join."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    supp = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    j = (
        # part/supplier scale with SF — AQE picks the join strategy.
        li.join(part, li.l_partkey == part.p_partkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal")
        .distinct()
    )
    w = W.partitionBy("p_partkey")
    return (
        j.withColumn("min_bal", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("min_bal"))
        .select("p_partkey", "p_name", "s_suppkey", "s_name", F.round("s_acctbal", 2).alias("s_acctbal"))
        .orderBy("p_partkey", "s_suppkey")
    )


Q2_SQL = """
WITH j AS (
  SELECT DISTINCT p_partkey, p_name, s_suppkey, s_name, s_acctbal
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  WHERE p_size <= 10
)
SELECT p_partkey, p_name, s_suppkey, s_name, round(s_acctbal, 2) AS s_acctbal
FROM (SELECT *, min(s_acctbal) OVER (PARTITION BY p_partkey) AS min_bal FROM j)
WHERE s_acctbal = min_bal
ORDER BY p_partkey, s_suppkey
"""


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue lost to returns per customer (TPC-H Q10 shape)."""
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        # customer scales with SF — AQE decides; nation stays hinted.
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(fixed_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


Q10_SQL = """
SELECT c_custkey, c_name, n_name,
       sum(CAST(round(l_extendedprice * (1 - l_discount) * 1e2) AS BIGINT)) / 1e2 AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey LIMIT 20
"""


def q12_shipmode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation by priority class (TPC-H Q12 shape)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~urgent, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


Q12_SQL = """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_linestatus ORDER BY l_linestatus
"""


def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promo revenue share (TPC-H Q14 shape): conditional / total."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    rev_cents = F.round(rev * 100.0).cast("long")
    return (
        # part scales with SF — no broadcast hint, AQE decides.
        li.join(part, li.l_partkey == part.p_partkey)
        # Both sums as integer cents (order-independent); the ratio of
        # two exact BIGINTs is a deterministic double, so one scale-0
        # round at 1e-4 units is hash-safe (round(x, 4) is not).
        .agg(
            fixed_point(
                100.0
                * F.sum(F.when(F.col("p_type").startswith("PROMO"), rev_cents).otherwise(F.lit(0)))
                / F.sum(rev_cents),
                4,
            ).alias("promo_revenue_pct")
        )
    )


Q14_SQL = """
SELECT CAST(round(1e2 * sum(CASE WHEN p_type LIKE 'PROMO%'
                              THEN CAST(round(l_extendedprice * (1 - l_discount) * 1e2) AS BIGINT) ELSE 0 END)
             / sum(CAST(round(l_extendedprice * (1 - l_discount) * 1e2) AS BIGINT))
             * 1e4) AS BIGINT) / 1e4 AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
"""


def q16_supplier_cnt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-count grouped by part attributes with an anti-join
    exclusion (TPC-H Q16 shape)."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    bad_supp = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0)
    return (
        # part/supplier scale with SF — AQE picks the join strategy
        # (at small SF it broadcasts both on its own).
        li.join(part, li.l_partkey == part.p_partkey)
        .join(bad_supp, li.l_suppkey == bad_supp.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type")
        .limit(20)
    )


Q16_SQL = """
SELECT p_brand, p_type, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type
ORDER BY supplier_cnt DESC, p_brand, p_type LIMIT 20
"""


def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING-filter shape (TPC-H Q18): orders whose total quantity
    exceeds a threshold, joined back to customers."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .filter(F.col("total_qty") > 200)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        # customer scales with SF — AQE decides.
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate", "total_qty")
        .orderBy(F.desc("total_qty"), "o_orderkey")
        .limit(20)
    )


Q18_SQL = """
SELECT c_custkey, c_name, o_orderkey, o_orderdate, total_qty
FROM (
  SELECT l_orderkey, round(sum(l_quantity), 2) AS total_qty
  FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 200
)
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY total_qty DESC, o_orderkey LIMIT 20
"""


def q19_disjunctive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive multi-predicate join filter (TPC-H Q19 shape)."""
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    cond = (
        ((F.col("p_brand") == "Brand#1") & (F.col("p_size") <= 5) & (F.col("l_quantity") >= 10))
        | ((F.col("p_brand") == "Brand#2") & (F.col("p_size") <= 10) & (F.col("l_quantity") >= 20))
        | ((F.col("p_brand") == "Brand#3") & (F.col("p_size") <= 15) & (F.col("l_quantity") >= 30))
    )
    return (
        # part scales with SF — AQE decides.
        li.join(part, li.l_partkey == part.p_partkey)
        .filter(cond)
        .agg(
            fixed_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
            F.count("*").alias("n_lines"),
        )
    )


Q19_SQL = """
SELECT sum(CAST(round(l_extendedprice * (1 - l_discount) * 1e2) AS BIGINT)) / 1e2 AS revenue,
       count(*) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size <= 5 AND l_quantity >= 10)
   OR (p_brand = 'Brand#2' AND p_size <= 10 AND l_quantity >= 20)
   OR (p_brand = 'Brand#3' AND p_size <= 15 AND l_quantity >= 30)
"""


def q_events_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: parse the props JSON column and
    aggregate on an extracted field."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            fixed_avg_int(F.col("k"), 4).alias("avg_k"),
            F.max("k").alias("max_k"),
            F.count(F.when(F.col("k") > 50, 1)).alias("n_high_k"),
        )
        .orderBy("event_type")
    )


Q_EVENTS_JSON_SQL = """
SELECT event_type, count(*) AS n,
       CAST(round(sum(CAST(json_extract_string(props, '$.k') AS INT)) * 1e4
                  / count(CAST(json_extract_string(props, '$.k') AS INT))) AS BIGINT) / 1e4 AS avg_k,
       max(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k,
       count(CASE WHEN CAST(json_extract_string(props, '$.k') AS INT) > 50 THEN 1 END) AS n_high_k
FROM events GROUP BY event_type ORDER BY event_type
"""


def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (linear interpolation) of lineitem prices
    per return flag — Spark ``percentile`` ≡ DuckDB
    ``quantile_cont``."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias("p90"),
            F.round(F.expr("percentile(l_extendedprice, 0.99)"), 4).alias("p99"),
            F.count("*").alias("n"),
        )
        .orderBy("l_returnflag")
    )


Q_PERCENTILES_SQL = """
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
       round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
       round(quantile_cont(l_extendedprice, 0.99), 4) AS p99,
       count(*) AS n
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""

_PCT_PS = (0.5, 0.9, 0.99)


def q_percentiles_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact grouped percentiles at 100 TB scale: ``percentile()``
    buffers every group value in one task's heap, so this variant
    computes the SAME numbers by DISTRIBUTED RANK instead — one
    ``grouped_rank`` pass (deterministic literal-cut buckets on the
    value, per-(group, bucket) local windows + broadcast prefix
    offsets), tiny per-group count collect (one row per group), then
    the interpolation ``v_lo + frac·(v_hi − v_lo)`` reads exactly TWO
    ranked rows per (group, percentile) via a broadcast join. No
    task ever holds more than its bucket slice; nothing buffers a
    group. The oracle replays the identical rank-and-interpolate
    arithmetic in SQL (not quantile_cont), so the gate compares
    bitwise-identical formulas."""
    import math

    from ..operators.ranking import grouped_rank

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    ranked = grouped_rank(
        li,
        ["l_returnflag"],
        [F.col("l_extendedprice"), F.col("l_orderkey"), F.col("l_linenumber")],
        F.col("l_extendedprice"),
    )
    # one row per group — catalog-bounded (return flags)
    cnts = sorted(
        li.groupBy("l_returnflag").agg(F.count("*").alias("n")).collect(),
        key=lambda r: r["l_returnflag"],
    )
    need = []
    for r in cnts:
        n_g = r["n"]
        for p in _PCT_PS:
            pos = p * (n_g - 1)  # float64, same IEEE ops as the oracle
            lo0 = math.floor(pos)
            need.append(
                (r["l_returnflag"], p, lo0 + 1, min(lo0 + 2, n_g), pos - lo0, n_g)
            )
    need_df = spark.createDataFrame(
        need, "l_returnflag string, p double, lo_rk long, hi_rk long, frac double, n long"
    )
    hit = ranked.join(
        F.broadcast(need_df),
        (ranked["l_returnflag"] == need_df["l_returnflag"])
        & ((F.col("_grank") == F.col("lo_rk")) | (F.col("_grank") == F.col("hi_rk"))),
    ).select(
        need_df["l_returnflag"], "p", "lo_rk", "hi_rk", "frac", "n",
        "_grank", "l_extendedprice",
    )
    interp = (
        hit.groupBy("l_returnflag", "p", "frac", "n")
        .agg(
            F.max(F.when(F.col("_grank") == F.col("lo_rk"), F.col("l_extendedprice"))).alias("v1"),
            F.max(F.when(F.col("_grank") == F.col("hi_rk"), F.col("l_extendedprice"))).alias("v2"),
        )
        .withColumn("val", F.col("v1") + F.col("frac") * (F.col("v2") - F.col("v1")))
    )
    return (
        interp.groupBy("l_returnflag", "n")
        .agg(
            F.round(F.max(F.when(F.col("p") == 0.5, F.col("val"))), 4).alias("p50"),
            F.round(F.max(F.when(F.col("p") == 0.9, F.col("val"))), 4).alias("p90"),
            F.round(F.max(F.when(F.col("p") == 0.99, F.col("val"))), 4).alias("p99"),
        )
        .select("l_returnflag", "p50", "p90", "p99", "n")
        .orderBy("l_returnflag")
    )


Q_PERCENTILES_DIST_SQL = """
WITH cnt AS (
  SELECT l_returnflag, count(*) AS n FROM lineitem GROUP BY 1
), ranked AS (
  SELECT l_returnflag, l_extendedprice AS v,
         row_number() OVER (PARTITION BY l_returnflag
                            ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rk
  FROM lineitem
), need AS (
  SELECT c.l_returnflag, p.p, c.n,
         CAST(floor(p.p * (c.n - 1)) AS BIGINT) + 1 AS lo_rk,
         least(CAST(floor(p.p * (c.n - 1)) AS BIGINT) + 2, c.n) AS hi_rk,
         p.p * (c.n - 1) - floor(p.p * (c.n - 1)) AS frac
  FROM cnt c CROSS JOIN (SELECT CAST(unnest([0.5, 0.9, 0.99]) AS DOUBLE) AS p) p
), interp AS (
  SELECT nd.l_returnflag, nd.p, nd.frac, nd.n,
         max(CASE WHEN r.rk = nd.lo_rk THEN r.v END) AS v1,
         max(CASE WHEN r.rk = nd.hi_rk THEN r.v END) AS v2
  FROM need nd JOIN ranked r
    ON r.l_returnflag = nd.l_returnflag
   AND (r.rk = nd.lo_rk OR r.rk = nd.hi_rk)
  GROUP BY 1, 2, 3, 4
)
SELECT l_returnflag,
       round(max(CASE WHEN p = 0.5 THEN v1 + frac * (v2 - v1) END), 4) AS p50,
       round(max(CASE WHEN p = 0.9 THEN v1 + frac * (v2 - v1) END), 4) AS p90,
       round(max(CASE WHEN p = 0.99 THEN v1 + frac * (v2 - v1) END), 4) AS p99,
       n
FROM interp GROUP BY l_returnflag, n ORDER BY l_returnflag
"""

PCT_APPROX_ACC = 10000  # Greenwald-Khanna accuracy (rank error <= n/acc)


def q_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based grouped percentiles — the cheap scale face next
    to ``q_percentiles``/``q_percentiles_dist``: one map-side
    mergeable Greenwald-Khanna sketch per group, O(acc·log n) state
    per task instead of buffering values. Rank error is bounded by
    n/accuracy; tests pin ≤1% value error vs the exact key at sf0.1.
    [rows-only: DuckDB's approx_quantile is a different sketch
    (t-digest), so no cross-engine hash can exist by construction]"""
    li = load_table(spark, sf_dir, "lineitem")
    pct = F.expr(
        f"approx_percentile(l_extendedprice, array(0.5, 0.9, 0.99), {PCT_APPROX_ACC})"
    )
    return (
        li.groupBy("l_returnflag")
        .agg(pct.alias("ps"), F.count("*").alias("n"))
        .select(
            "l_returnflag",
            F.round(F.col("ps")[0], 4).alias("p50"),
            F.round(F.col("ps")[1], 4).alias("p90"),
            F.round(F.col("ps")[2], 4).alias("p99"),
            "n",
        )
        .orderBy("l_returnflag")
    )


def q_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation for skewed keys: event_type has
    only 5 values, so a naive groupBy funnels 1/5 of 100 TB into one
    reducer. Salt the key (16 shards), pre-aggregate, then combine —
    the result is identical (and hash-checked); the heavy shuffle is
    spread over key×16 reducers."""
    ev = load_table(spark, sf_dir, "events")
    salted = ev.withColumn("salt", F.pmod(F.col("event_id"), F.lit(16)))
    # Partials carry integer cents so the two-level (salted) sum is
    # exact and order-independent — a double `ps` partial would make
    # the final sum partition-order-dependent.
    partial = salted.groupBy("event_type", "salt").agg(
        F.count("*").alias("pn"),
        F.sum(F.round(F.col("value") * 100.0).cast("long")).alias("ps"),
        F.min("value").alias("pmin"),
        F.max("value").alias("pmax"),
    )
    return (
        partial.groupBy("event_type")
        .agg(
            F.sum("pn").alias("n_events"),
            (F.sum("ps") / 100.0).alias("total_value"),
            (F.round(F.sum("ps") * 100.0 / F.sum("pn")).cast("long") / 10000.0).alias("avg_value"),
            fixed_point(F.min("pmin")).alias("min_value"),
            fixed_point(F.max("pmax")).alias("max_value"),
        )
        .orderBy("event_type")
    )


Q_SALTED_AGG_SQL = """
SELECT event_type, count(*) AS n_events,
       sum(CAST(round(value * 1e2) AS BIGINT)) / 1e2 AS total_value,
       CAST(round(sum(CAST(round(value * 1e2) AS BIGINT)) * 1e2 / count(*)) AS BIGINT) / 1e4 AS avg_value,
       CAST(round(min(value) * 1e2) AS BIGINT) / 1e2 AS min_value,
       CAST(round(max(value) * 1e2) AS BIGINT) / 1e2 AS max_value
FROM events GROUP BY event_type ORDER BY event_type
"""


def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus): all grouping-set combos."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count("*").alias("n"))
        .orderBy(
            F.col("l_returnflag").asc_nulls_first(), F.col("l_linestatus").asc_nulls_first()
        )
    )


Q_CUBE_SQL = """
SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST
"""


def q_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-semantics battery, cross-engine-proved: a NULLable group
    key (``nullif``) so one aggregation group IS NULL, a NULL-SAFE
    left join (Spark ``eqNullSafe`` ≡ SQL ``IS NOT DISTINCT FROM``)
    against a partial dimension that keeps its NULL row — the NULL
    group must MATCH (a plain equi-join would drop it) while two
    non-null groups go unmatched — and NULLS FIRST presentation
    order. The hash gate proves both engines agree on NULL grouping,
    null-safe equality, and outer-join NULL introduction."""
    cust = load_table(spark, sf_dir, "customer")
    grp = F.expr("nullif(c_nationkey % 5, 0)")
    g = cust.groupBy(grp.alias("grp")).agg(
        F.count("*").alias("n_cust"),
        (F.sum(F.round(F.col("c_acctbal") * 100.0).cast("long")) / 100.0).alias(
            "total_bal"
        ),
    )
    dim = (
        cust.select(grp.alias("dgrp"))
        .filter(F.col("dgrp").isNull() | (F.col("dgrp") >= 3))
        .distinct()
        .withColumn("in_dim", F.lit(1))
    )
    return (
        g.join(dim, g["grp"].eqNullSafe(dim["dgrp"]), "left")
        .select(
            "grp",
            "n_cust",
            "total_bal",
            F.col("in_dim").isNotNull().cast("int").alias("matched"),
        )
        .orderBy(F.col("grp").asc_nulls_first())
    )


Q_NULL_SEMANTICS_SQL = """
WITH g AS (
  SELECT nullif(c_nationkey % 5, 0) AS grp,
         CAST(count(*) AS BIGINT) AS n_cust,
         sum(CAST(round(c_acctbal * 1e2) AS BIGINT)) / 1e2 AS total_bal
  FROM customer GROUP BY 1
), dim AS (
  SELECT DISTINCT nullif(c_nationkey % 5, 0) AS dgrp, 1 AS in_dim
  FROM customer
  WHERE nullif(c_nationkey % 5, 0) IS NULL OR nullif(c_nationkey % 5, 0) >= 3
)
SELECT g.grp, n_cust, total_bal,
       CAST(in_dim IS NOT NULL AS INT) AS matched
FROM g LEFT JOIN dim ON g.grp IS NOT DISTINCT FROM dim.dgrp
ORDER BY g.grp ASC NULLS FIRST
"""


def q_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-outer join with null-side aggregation: customers with and
    without orders per market segment."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(F.count("*").alias("n_orders"))
    return (
        cust.join(per_cust, cust.c_custkey == per_cust.o_custkey, "left")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_customers"),
            F.count(F.when(F.col("n_orders").isNull(), 1)).alias("n_without_orders"),
            fixed_avg_int(F.coalesce("n_orders", F.lit(0)), 4).alias("avg_orders"),
        )
        .orderBy("c_mktsegment")
    )


Q_OUTER_JOIN_SQL = """
SELECT c_mktsegment, count(*) AS n_customers,
       count(CASE WHEN n_orders IS NULL THEN 1 END) AS n_without_orders,
       CAST(round(sum(coalesce(n_orders, 0)) * 1e4 / count(coalesce(n_orders, 0))) AS BIGINT) / 1e4 AS avg_orders
FROM customer
LEFT JOIN (SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey)
  ON c_custkey = o_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


def q_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window frame: 7-event moving average of purchase value
    per user."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-6, 0)
    return (
        ev.select(
            "user_id",
            "event_id",
            # Integer-cents window sum / window count: sliding-frame
            # double sums differ across engines (segment-tree vs
            # running re-add) — exact BIGINT frames do not.
            (
                F.round(
                    F.sum(F.round(F.col("value") * 100.0).cast("long")).over(w)
                    * 100.0
                    / F.count("*").over(w)
                ).cast("long")
                / 10000.0
            ).alias("ma7"),
        )
        .orderBy("user_id", "event_id")
    )


Q_MOVING_AVG_SQL = """
SELECT user_id, event_id,
       CAST(round(sum(CAST(round(value * 1e2) AS BIGINT))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
                  * 1e2
                  / count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
            AS BIGINT) / 1e4 AS ma7
FROM events WHERE event_type = 'purchase'
ORDER BY user_id, event_id
"""


def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide → long) via stack(): part price/size measures as
    (measure, value) rows, aggregated per brand."""
    part = load_table(spark, sf_dir, "part")
    long = part.selectExpr(
        "p_brand",
        "stack(2, 'retailprice', p_retailprice, 'size', CAST(p_size AS DOUBLE)) AS (measure, value)",
    )
    return (
        long.groupBy("p_brand", "measure")
        .agg(fixed_avg(F.col("value"), 4).alias("avg_value"), F.count("*").alias("n"))
        .orderBy("p_brand", "measure")
    )


Q_UNPIVOT_SQL = """
WITH long AS (
  SELECT p_brand, 'retailprice' AS measure, p_retailprice AS value FROM part
  UNION ALL
  SELECT p_brand, 'size' AS measure, CAST(p_size AS DOUBLE) AS value FROM part
)
SELECT p_brand, measure,
       CAST(round(sum(CAST(round(value * 1e4) AS BIGINT)) * 1e0 / count(*)) AS BIGINT) / 1e4 AS avg_value,
       count(*) AS n
FROM long GROUP BY p_brand, measure ORDER BY p_brand, measure
"""


def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function battery: per-(year, quarter) order stats
    with month-end and day-diff arithmetic."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(
            F.year("o_orderdate").alias("yr"),
            F.quarter("o_orderdate").alias("qtr"),
            F.datediff(F.last_day(F.col("o_orderdate").cast("date")), F.col("o_orderdate").cast("date")).alias(
                "days_to_month_end"
            ),
            "o_totalprice",
        )
        .groupBy("yr", "qtr")
        .agg(
            F.count("*").alias("n_orders"),
            fixed_avg_int(F.col("days_to_month_end"), 4).alias("avg_days_to_month_end"),
            fixed_sum(F.col("o_totalprice")).alias("total"),
        )
        .orderBy("yr", "qtr")
    )


Q_DATE_FUNCS_SQL = """
SELECT extract(year FROM o_orderdate) AS yr,
       extract(quarter FROM o_orderdate) AS qtr,
       count(*) AS n_orders,
       CAST(round(sum(date_diff('day', CAST(o_orderdate AS DATE),
                                last_day(CAST(o_orderdate AS DATE)))) * 1e4
                  / count(date_diff('day', CAST(o_orderdate AS DATE),
                                    last_day(CAST(o_orderdate AS DATE))))) AS BIGINT) / 1e4 AS avg_days_to_month_end,
       sum(CAST(round(o_totalprice * 1e2) AS BIGINT)) / 1e2 AS total
FROM orders GROUP BY 1, 2 ORDER BY yr, qtr
"""


def q_set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTISET set operations — ``INTERSECT ALL`` / ``EXCEPT ALL``
    (bag semantics: duplicates counted, not collapsed — the variant
    ``q_set_ops``'s distinct forms don't cover): per customer-key
    bags drawn from the two order-key halves, count the multiset
    intersection and asymmetric differences, plus the sum identity
    |A| = |A∩B| + |A∖B| as an in-result invariant."""
    orders = load_table(spark, sf_dir, "orders")
    first = orders.filter(F.col("o_orderkey") % 2 == 0).select("o_custkey")
    second = orders.filter(F.col("o_orderkey") % 2 == 1).select("o_custkey")
    n_a = first.count()
    both = first.intersectAll(second).count()
    only_a = first.exceptAll(second).count()
    only_b = second.exceptAll(first).count()
    return spark.createDataFrame(
        [(int(n_a), int(both), int(only_a), int(only_b), int(both + only_a))],
        "n_even long, n_both_all long, n_only_even_all long, "
        "n_only_odd_all long, n_identity long",
    )


Q_SET_OPS_ALL_SQL = """
SELECT
  (SELECT count(*) FROM orders WHERE o_orderkey % 2 = 0) AS n_even,
  (SELECT count(*) FROM (
     SELECT o_custkey FROM orders WHERE o_orderkey % 2 = 0
     INTERSECT ALL
     SELECT o_custkey FROM orders WHERE o_orderkey % 2 = 1)) AS n_both_all,
  (SELECT count(*) FROM (
     SELECT o_custkey FROM orders WHERE o_orderkey % 2 = 0
     EXCEPT ALL
     SELECT o_custkey FROM orders WHERE o_orderkey % 2 = 1)) AS n_only_even_all,
  (SELECT count(*) FROM (
     SELECT o_custkey FROM orders WHERE o_orderkey % 2 = 1
     EXCEPT ALL
     SELECT o_custkey FROM orders WHERE o_orderkey % 2 = 0)) AS n_only_odd_all,
  (SELECT count(*) FROM (
     SELECT o_custkey FROM orders WHERE o_orderkey % 2 = 0
     INTERSECT ALL
     SELECT o_custkey FROM orders WHERE o_orderkey % 2 = 1))
  + (SELECT count(*) FROM (
     SELECT o_custkey FROM orders WHERE o_orderkey % 2 = 0
     EXCEPT ALL
     SELECT o_custkey FROM orders WHERE o_orderkey % 2 = 1)) AS n_identity
"""


def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT set operations: customers who bought in
    both halves of the key space vs only the first."""
    orders = load_table(spark, sf_dir, "orders")
    first = orders.filter(F.col("o_orderkey") % 2 == 0).select("o_custkey")
    second = orders.filter(F.col("o_orderkey") % 2 == 1).select("o_custkey")
    both = first.intersect(second).count()
    only_first = first.distinct().subtract(second.distinct()).count()
    only_second = second.distinct().subtract(first.distinct()).count()
    return spark.createDataFrame(
        [(int(both), int(only_first), int(only_second))],
        "n_both long, n_only_even long, n_only_odd long",
    )


Q_SET_OPS_SQL = """
SELECT
  (SELECT count(*) FROM (
     SELECT o_custkey FROM orders WHERE o_orderkey % 2 = 0
     INTERSECT
     SELECT o_custkey FROM orders WHERE o_orderkey % 2 = 1)) AS n_both,
  (SELECT count(*) FROM (
     SELECT DISTINCT o_custkey FROM orders WHERE o_orderkey % 2 = 0
     EXCEPT
     SELECT o_custkey FROM orders WHERE o_orderkey % 2 = 1)) AS n_only_even,
  (SELECT count(*) FROM (
     SELECT DISTINCT o_custkey FROM orders WHERE o_orderkey % 2 = 1
     EXCEPT
     SELECT o_custkey FROM orders WHERE o_orderkey % 2 = 0)) AS n_only_odd
"""


def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-subquery filter: orders above the global average price,
    counted per priority. The scalar stays IN-PLAN — a 1-row
    aggregate crossJoin(broadcast(...)) against the fact scan, the
    same decorrelation Catalyst performs for a SQL scalar subquery —
    so no driver action runs at plan-build time."""
    orders = load_table(spark, sf_dir, "orders")
    # Exact-cents mean for the threshold: it's a filter boundary, so
    # an order-dependent double avg could flip borderline rows.
    cents = F.round(F.col("o_totalprice") * 100.0).cast("long")
    avg_row = orders.agg((F.sum(cents) / F.count("*") / 100.0).alias("avg_price"))
    return (
        orders.crossJoin(F.broadcast(avg_row))
        .filter(F.col("o_totalprice") > F.col("avg_price"))
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_above_avg"), fixed_avg(F.col("o_totalprice")).alias("avg_above"))
        .orderBy("o_orderpriority")
    )


Q_SCALAR_SUBQUERY_SQL = """
SELECT o_orderpriority, count(*) AS n_above_avg,
       CAST(round(sum(CAST(round(o_totalprice * 1e2) AS BIGINT)) * 1e0 / count(*)) AS BIGINT) / 1e2 AS avg_above
FROM orders
WHERE o_totalprice > (SELECT sum(CAST(round(o_totalprice * 1e2) AS BIGINT)) / count(*) / 1e2 FROM orders)
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""


def q_generator_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generator-function surface: ``posexplode(split(...))`` fans
    each part's type string into (position, word) rows — the
    explode-shaped row multiplication every tokenization pipeline
    uses — then aggregates word frequency per position. One shuffle
    on the (pos, word) agg key; the fan-out happens map-side."""
    part = load_table(spark, sf_dir, "part")
    words = part.select(
        "p_partkey", F.posexplode(F.split("p_type", " ")).alias("pos", "word")
    )
    return (
        words.groupBy("pos", "word")
        .agg(F.count("*").alias("n_parts"), F.sum("p_partkey").alias("key_checksum"))
        .orderBy("pos", "word")
    )


Q_GENERATOR_FUNCS_SQL = """
WITH words AS (
  SELECT p_partkey, i - 1 AS pos, string_split(p_type, ' ')[i] AS word
  FROM part, UNNEST(generate_series(1, len(string_split(p_type, ' ')))) AS t(i)
)
SELECT pos, word, count(*) AS n_parts,
       CAST(sum(p_partkey) AS BIGINT) AS key_checksum
FROM words GROUP BY pos, word ORDER BY pos, word
"""


def q_lateral_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL join (SQL:2016 surface): for every nation,
    its top-2 customers by account balance — the per-group top-k as
    a correlated subquery instead of a window. Expressed through
    ``spark.sql`` to exercise the SQL face; Catalyst decorrelates
    the lateral into a ranked join, so no per-nation re-scan
    survives into the physical plan."""
    from ..sources.readers import load_table as _lt

    _lt(spark, sf_dir, "nation").createOrReplaceTempView("v_nation")
    _lt(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    return spark.sql(
        """
        SELECT n.n_name, c.c_name, c.c_acctbal
        FROM v_nation n,
        LATERAL (
          SELECT c_name, c_acctbal FROM v_customer
          WHERE c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_custkey LIMIT 2
        ) c
        ORDER BY n.n_name, c.c_acctbal DESC, c.c_name
        """
    )


Q_LATERAL_JOIN_SQL = """
SELECT n.n_name, c.c_name, c.c_acctbal
FROM nation n,
LATERAL (
  SELECT c_name, c_acctbal FROM customer
  WHERE c_nationkey = n.n_nationkey
  ORDER BY c_acctbal DESC, c_custkey LIMIT 2
) c
ORDER BY n.n_name, c.c_acctbal DESC, c.c_name
"""


def q_higher_order_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array-function battery over the embedding column
    — filter / exists / forall / transform+aggregate, the lambda
    surface this engine leans on everywhere, exercised and hash-gated
    in one place. Per vector: positive-component count, any>0.9 /
    all<1.0 flags, and the exact integer-milli sum of positive
    components (map-side only until the final sort)."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = F.transform("embedding", lambda x: x.cast("double"))
    pos = F.filter(v, lambda x: x > 0)
    return (
        emb.select(
            "vec_id",
            F.size(pos).alias("n_pos"),
            F.exists(v, lambda x: x > 0.9).alias("has_gt09"),
            F.forall(v, lambda x: x < 1.0).alias("all_lt1"),
            F.aggregate(
                F.transform(pos, lambda x: F.round(x * 1000.0).cast("long")),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("pos_milli_sum"),
        )
        .orderBy("vec_id")
    )


Q_HIGHER_ORDER_FUNCS_SQL = """
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
)
SELECT vec_id,
       CAST(len(list_filter(v, x -> x > 0)) AS INT) AS n_pos,
       len(list_filter(v, x -> x > 0.9)) > 0 AS has_gt09,
       len(list_filter(v, x -> x >= 1.0)) = 0 AS all_lt1,
       CAST(coalesce(list_sum(list_transform(list_filter(v, x -> x > 0),
                                             x -> CAST(round(x * 1000) AS BIGINT))), 0) AS BIGINT)
         AS pos_milli_sum
FROM v ORDER BY vec_id
"""


def q_json_schema_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed schema-on-read JSON (the face ``q_events_json``'s
    path-string extraction doesn't cover): ``from_json`` parses
    ``props`` into a STRUCT under an explicit schema (corrupt rows →
    NULL, not errors), the struct is enriched and serialized back
    with ``to_json``, re-parsed, and aggregated — the full
    typed-JSON round-trip a schema-evolving event pipeline performs.
    A hash match proves from_json/to_json are mutually inverse under
    the schema and that the enrichment survived the cycle."""
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.select(
        "event_type",
        F.from_json("props", "k INT").alias("p"),
    )
    enriched = parsed.select(
        "event_type",
        F.to_json(
            F.struct(
                F.col("p.k").alias("k"),
                (F.col("p.k") * 2).alias("k2"),
            )
        ).alias("j"),
    )
    back = enriched.select(
        "event_type", F.from_json("j", "k INT, k2 INT").alias("q")
    )
    return (
        back.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("q.k").alias("sum_k"),
            F.sum("q.k2").alias("sum_k2"),
            F.count(F.when(F.col("q.k").isNull(), 1)).alias("n_null_k"),
        )
        .orderBy("event_type")
    )


Q_JSON_SCHEMA_ROUNDTRIP_SQL = """
SELECT event_type, count(*) AS n,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS INT) * 2) AS BIGINT) AS sum_k2,
       CAST(count(CASE WHEN json_extract_string(props, '$.k') IS NULL THEN 1 END) AS BIGINT) AS n_null_k
FROM events GROUP BY event_type ORDER BY event_type
"""


def q_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``GROUP BY ALL`` — the analyst-ergonomics clause DuckDB
    introduced and Spark 4 adopted: every non-aggregate select item
    becomes a grouping key automatically, including the COMPUTED
    year bucket. Run verbatim on both engines (the same SQL text is
    the plan AND the oracle — zero translation), proving the
    dialects' inference rules agree."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders_gba")
    return spark.sql(Q_GROUP_BY_ALL_SQL.replace("FROM orders", "FROM v_orders_gba"))


Q_GROUP_BY_ALL_SQL = """
SELECT o_orderstatus,
       year(o_orderdate) AS yr,
       o_orderpriority,
       count(*) AS n,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
FROM orders
GROUP BY ALL
ORDER BY o_orderstatus, yr, o_orderpriority
"""


def q_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``try_*`` error-safe family — NULL-on-failure semantics
    that keep a 10⁹-row job alive where ANSI mode would kill it on
    one bad row: ``try_divide`` (zero denominators → NULL),
    ``try_cast`` (unparseable strings → NULL), ``try_add`` at the
    BIGINT overflow edge. Derived adversarial inputs from orders
    (every 7th row gets a zero denominator, every 5th an unparseable
    string); the oracle replays with TRY_CAST / NULLIF division."""
    orders = load_table(spark, sf_dir, "orders")
    denom = F.when(F.col("o_orderkey") % 7 == 0, 0).otherwise(
        (F.col("o_orderkey") % 9) + 1
    )
    s = F.when(F.col("o_orderkey") % 5 == 0, F.lit("oops")).otherwise(
        F.col("o_orderkey").cast("string")
    )
    parsed = orders.select(
        "o_orderstatus",
        F.try_divide(F.round(F.col("o_totalprice") * 100).cast("long"), denom).alias("ratio"),
        s.try_cast("long").alias("parsed"),
    )
    return (
        parsed.groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n"),
            F.count("ratio").alias("n_ratio_ok"),
            F.count(F.when(F.col("ratio").isNull(), 1)).alias("n_div_zero"),
            F.count("parsed").alias("n_parsed_ok"),
            F.sum("parsed").alias("sum_parsed"),
        )
        .orderBy("o_orderstatus")
    )


Q_TRY_ARITHMETIC_SQL = """
WITH t AS (
  SELECT o_orderstatus,
         CAST(round(o_totalprice * 1e2) AS BIGINT)
           / nullif(CASE WHEN o_orderkey % 7 = 0 THEN 0 ELSE (o_orderkey % 9) + 1 END, 0) AS ratio,
         TRY_CAST(CASE WHEN o_orderkey % 5 = 0 THEN 'oops'
                       ELSE CAST(o_orderkey AS VARCHAR) END AS BIGINT) AS parsed
  FROM orders
)
SELECT o_orderstatus, count(*) AS n,
       count(ratio) AS n_ratio_ok,
       CAST(count(CASE WHEN ratio IS NULL THEN 1 END) AS BIGINT) AS n_div_zero,
       count(parsed) AS n_parsed_ok,
       CAST(sum(parsed) AS BIGINT) AS sum_parsed
FROM t GROUP BY 1 ORDER BY o_orderstatus
"""


def q_ignore_nulls_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``IGNORE NULLS`` window semantics — the gap-carry pattern
    (last observation carried forward): null out a sentinel priority
    value, then per customer take the LAST NON-NULL priority seen up
    to each order (``last(..., ignorenulls=True)`` over the running
    frame) — how a sparse dimension is forward-filled at scale with
    one partition-key shuffle. Aggregated to (carried priority →
    order count) so the oracle (DuckDB's IGNORE NULLS) hash-gates the
    fill."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    sparse = F.nullif("o_orderpriority", F.lit("3-MEDIUM"))
    filled = orders.select(
        "o_custkey",
        F.last(sparse, ignorenulls=True).over(w).alias("carried_priority"),
    )
    return (
        filled.groupBy(
            F.coalesce("carried_priority", F.lit("<none-yet>")).alias("carried_priority")
        )
        .agg(F.count("*").alias("n_orders"), F.countDistinct("o_custkey").alias("n_customers"))
        .orderBy("carried_priority")
    )


Q_IGNORE_NULLS_WINDOW_SQL = """
WITH filled AS (
  SELECT o_custkey,
         last_value(nullif(o_orderpriority, '3-MEDIUM') IGNORE NULLS)
           OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                 ROWS UNBOUNDED PRECEDING) AS carried_priority
  FROM orders
)
SELECT coalesce(carried_priority, '<none-yet>') AS carried_priority,
       count(*) AS n_orders,
       count(DISTINCT o_custkey) AS n_customers
FROM filled GROUP BY 1 ORDER BY carried_priority
"""


def q_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``explode_outer`` vs ``explode`` — the NULL-preserving fan-out
    semantics (rows whose array is EMPTY survive as a NULL row
    instead of vanishing): extract 4-digit runs from each document
    (many have none), explode_outer them, and count per language the
    documents retained with no match, the match rows, and the
    distinct matched values. The oracle replays it as a LEFT JOIN
    against the unnested matches — exactly what explode_outer
    desugars to."""
    docs = load_table(spark, sf_dir, "documents")
    nums = F.regexp_extract_all("text", F.lit("[0-9]{4}"), 0)
    ex = docs.select(
        "doc_id", "lang", F.explode_outer(nums).alias("num")
    )
    return (
        ex.groupBy("lang")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("num").alias("n_match_rows"),
            F.countDistinct("num").alias("n_distinct_nums"),
            F.count(F.when(F.col("num").isNull(), 1)).alias("n_docs_no_match"),
        )
        .orderBy("lang")
    )


Q_EXPLODE_OUTER_SQL = """
WITH m AS (
  SELECT doc_id, lang, regexp_extract_all(text, '[0-9]{4}') AS nums
  FROM documents
), ex AS (
  SELECT d.doc_id, d.lang, u.num
  FROM m d LEFT JOIN (
    SELECT doc_id, unnest(nums) AS num FROM m
  ) u USING (doc_id)
)
SELECT lang,
       count(DISTINCT doc_id) AS n_docs,
       count(num) AS n_match_rows,
       CAST(count(DISTINCT num) AS BIGINT) AS n_distinct_nums,
       CAST(count(CASE WHEN num IS NULL THEN 1 END) AS BIGINT) AS n_docs_no_match
FROM ex GROUP BY lang ORDER BY lang
"""


def q_observed_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Observation API — pipeline TELEMETRY without a second
    pass: ``df.observe`` attaches accumulator-backed metrics (row
    count, exact-cents revenue, null counter) to the scan of a
    normal aggregate; the metrics materialize as a side effect of
    the one execution, where a naive monitor would re-run the query.
    The returned aggregate is hash-gated; tests assert the observed
    metrics equal the aggregate's own totals (the consistency the
    API promises)."""
    from pyspark.sql import Observation

    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100.0).cast("long")
    obs = Observation("q_observed_metrics")
    observed = orders.observe(
        obs,
        F.count(F.lit(1)).alias("rows_seen"),
        F.sum(cents).alias("cents_seen"),
        F.count(F.when(F.col("o_orderpriority").isNull(), 1)).alias("null_prios"),
    )
    result = (
        observed.groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"), F.sum(cents).alias("total_cents"))
        .orderBy("o_orderstatus")
        # eager: the observation only fills after an action, and the
        # test reads obs.get — pin both in one execution
        .localCheckpoint(eager=True)
    )
    # stash for tests (Observation.get blocks until the action ran)
    q_observed_metrics.last_observation = obs  # type: ignore[attr-defined]
    return result


Q_OBSERVED_METRICS_SQL = """
SELECT o_orderstatus, count(*) AS n,
       CAST(sum(CAST(round(o_totalprice * 1e2) AS BIGINT)) AS BIGINT) AS total_cents
FROM orders GROUP BY 1 ORDER BY o_orderstatus
"""


def q_variant_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4's VARIANT type — the open-format semi-structured
    column (the Parquet/Iceberg/Delta variant spec): ``parse_json``
    ingests props into VARIANT once, then ``variant_get`` extracts
    typed paths with per-access casts. Unlike the string-path face
    (``q_events_json``) the parse cost is paid once per row, not per
    extraction, and unlike ``from_json`` no schema is fixed at read
    time — the schema-later contract. Aggregated per event type so
    the oracle (plain json_extract) hash-gates the typed access."""
    ev = load_table(spark, sf_dir, "events")
    parsed = ev.select("event_type", F.parse_json("props").alias("v")).select(
        "event_type",
        F.expr("variant_get(v, '$.k', 'int')").alias("k"),
    )
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


Q_VARIANT_TYPE_SQL = """
SELECT event_type, count(*) AS n,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
       CAST(min(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS min_k,
       CAST(max(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS max_k
FROM events GROUP BY event_type ORDER BY event_type
"""


def q_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE (new in Spark 4) — iterative SQL without
    leaving the engine: walk each customer key's halving chain
    (k → k÷2 → … → 1, a synthetic org hierarchy) and report how many
    customers sit at each depth with an id checksum. The recursion is
    data-bounded (≤⌈log₂ max_key⌉ steps); Spark executes it as an
    iterated union with the same semantics DuckDB replays. Spark
    spells integer division ``DIV`` and DuckDB ``//`` — the only
    difference between the two texts."""
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    return spark.sql(
        """
        WITH RECURSIVE chain(start, k, depth) AS (
          SELECT c_custkey, c_custkey, 0 FROM v_customer WHERE c_custkey <= 200
          UNION ALL
          SELECT start, k DIV 2, depth + 1 FROM chain WHERE k > 1
        )
        SELECT depth AS steps_to_root,
               count(*) AS n_customers,
               sum(start) AS key_checksum
        FROM chain WHERE k = 1
        GROUP BY depth ORDER BY depth
        """
    )


Q_RECURSIVE_CTE_SQL = """
WITH RECURSIVE chain(start, k, depth) AS (
  SELECT c_custkey, c_custkey, 0 FROM customer WHERE c_custkey <= 200
  UNION ALL
  SELECT start, k // 2, depth + 1 FROM chain WHERE k > 1
)
SELECT depth AS steps_to_root,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(sum(start) AS BIGINT) AS key_checksum
FROM chain WHERE k = 1
GROUP BY depth ORDER BY depth
"""


def q_complex_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Complex-type round-trip: per-customer priority histogram
    packed into a MAP column (``map_from_entries(collect_list(
    struct(...)))``), carried with a nested STRUCT of order-date
    bounds, then EXPLODED back to rows and re-aggregated. The output
    equals the direct relational aggregate, so the hash gate proves
    the map/struct construction, transport, and explosion lose
    nothing — the fidelity contract for nested-schema tables
    (collect_list order is nondeterministic, but map semantics make
    the round-trip order-insensitive by construction)."""
    orders = load_table(spark, sf_dir, "orders")
    pc = orders.groupBy("o_custkey", "o_orderpriority").agg(
        F.count("*").alias("cnt")
    )
    bounds = orders.groupBy("o_custkey").agg(
        F.struct(
            F.min("o_orderdate").alias("first_order"),
            F.max("o_orderdate").alias("last_order"),
        ).alias("span")
    )
    mapped = (
        pc.groupBy("o_custkey")
        .agg(
            F.map_from_entries(
                F.collect_list(F.struct("o_orderpriority", "cnt"))
            ).alias("prio_map")
        )
        .join(bounds, "o_custkey")
    )
    back = mapped.select(
        "o_custkey",
        F.col("span.first_order").alias("first_order"),
        F.explode("prio_map").alias("prio", "cnt"),
    )
    return (
        back.groupBy("prio")
        .agg(
            F.count("*").alias("n_customers"),
            F.sum("cnt").alias("n_orders"),
            F.min("first_order").alias("earliest_first_order"),
        )
        .orderBy("prio")
    )


Q_COMPLEX_TYPES_SQL = """
SELECT o_orderpriority AS prio,
       count(DISTINCT o_custkey) AS n_customers,
       count(*) AS n_orders,
       min(first_order) AS earliest_first_order
FROM orders
JOIN (SELECT o_custkey AS ck, min(o_orderdate) AS first_order
      FROM orders GROUP BY 1) b ON o_custkey = b.ck
GROUP BY 1 ORDER BY prio
"""


_JOIN_STRATEGIES = ("broadcast", "merge", "shuffle_hash")


def q_join_strategies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-strategy equivalence proof: the SAME orders⋈customer
    aggregate executed under all three physical join strategies —
    broadcast-hash, sort-merge, shuffled-hash — must produce
    IDENTICAL numbers (tests additionally assert each branch's plan
    really carries its strategy). This is the safety property that
    lets an operator pick strategy by cost alone at 100 TB: broadcast
    while the dim fits, spill to SMJ/SHJ when it doesn't, results
    bit-identical either way. Exact-cents revenue so the three
    branches (different partition orders!) still agree to the cent."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    cents = F.round(F.col("o_totalprice") * 100.0).cast("long")
    out = None
    for strat in _JOIN_STRATEGIES:
        j = orders.join(customer.hint(strat), orders.o_custkey == customer.c_custkey)
        agg = j.agg(
            F.lit(strat).alias("strategy"),
            F.count("*").alias("n_rows"),
            F.sum(cents).alias("total_cents"),
            F.countDistinct("c_mktsegment").alias("n_segments"),
        )
        out = agg if out is None else out.unionByName(agg)
    return out.orderBy("strategy")


Q_JOIN_STRATEGIES_SQL = f"""
WITH one AS (
  SELECT count(*) AS n_rows,
         CAST(sum(CAST(round(o_totalprice * 1e2) AS BIGINT)) AS BIGINT) AS total_cents,
         CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS n_segments
  FROM orders JOIN customer ON o_custkey = c_custkey
)
SELECT s.strategy, one.n_rows, one.total_cents, one.n_segments
FROM one CROSS JOIN (
  SELECT unnest({list(_JOIN_STRATEGIES)}) AS strategy
) s
ORDER BY s.strategy
"""


# Per-user row cap for q_asof_grouped's pandas path: a grouped-map
# stage materializes EACH GROUP as one in-memory Arrow/pandas frame
# with no spill, so a single hot user above ~a few million rows OOMs
# its task no matter how many executors exist. Users above the cap
# are routed through the window formulation (q_asof_join's plan),
# whose sort/window operators spill to disk — same answer (the two
# faces are row-equality-tied by tests), bounded memory.
ASOF_GROUP_CAP = 2_000_000


def q_asof_grouped(
    spark: SparkSession, sf_dir: str, group_cap: int = ASOF_GROUP_CAP
) -> DataFrame:
    """As-of join, grouped-map formulation: per-user
    ``pd.merge_asof`` inside ``applyInPandas`` (the alternative to
    the union+window formulation in ``q_asof_join``; same semantics,
    different engine path — each user's events sort-merge in pandas).
    Compact per-user summary output; oracle expresses the backward
    as-of match as a correlated EXISTS.

    Hot-group fallback (r11): users whose event count exceeds
    ``group_cap`` skip the pandas path (one unspillable in-memory
    frame per group — a 50%-hot user OOMs its task no matter the
    cluster size) and flow through the spill-safe window formulation.
    The gate is one map-side-combined count agg (shuffles only
    per-partition (user, count) partials, never event rows) whose
    over-cap survivors are a driver list bounded by total/cap; when
    it is empty — every production-shaped corpus — the plan is
    byte-identical to the ungated one."""
    import pandas as pd

    ev0 = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "view", "click")
    ).select("user_id", "ts", "event_id", "event_type")
    # EXPLICIT fixed-width repartition on the group key: the grouped
    # pandas stage's cost is per-GROUP Python/Arrow overhead, not
    # bytes, so AQE's size-based coalescing is wrong here — on a
    # small corpus it collapses the post-shuffle stage to ONE task
    # and serializes every group (measured 9.7s -> 1.5s at sf0.1).
    # A user-specified partition count is exempt from coalescing, and
    # the groupBy below reuses this exchange (same hash distribution)
    ev = ev0.repartition(spark.sparkContext.defaultParallelism, "user_id")

    # hot-group gate (bounded driver list: <= total_rows / group_cap
    # users can exceed the cap). Map-side partial aggregation means
    # this job shuffles per-partition (user, count) partials only.
    hot_ids = [
        r[0]
        for r in ev0.groupBy("user_id")
        .agg(F.count("*").alias("__n"))
        .filter(F.col("__n") > group_cap)
        .select("user_id")
        .collect()
    ]

    # one shuffle on user_id; merge_asof runs on each user's slice
    def asof(pdf: pd.DataFrame) -> pd.DataFrame:
        p = pdf[pdf["event_type"] == "purchase"].sort_values(["ts", "event_id"])
        q = pdf[pdf["event_type"] != "purchase"].sort_values(["ts", "event_id"])
        if len(p) == 0:
            return pd.DataFrame(columns=["user_id", "n_purchases", "n_with_quote"]).astype(
                {"user_id": "int64", "n_purchases": "int64", "n_with_quote": "int64"}
            )
        if len(q):
            m = pd.merge_asof(
                p[["ts", "event_id"]],
                q[["ts", "event_id"]].rename(columns={"event_id": "q_id"}),
                on="ts",
                direction="backward",
            )
            n_with = int(m["q_id"].notna().sum())
        else:
            n_with = 0
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n_purchases": [len(p)],
                "n_with_quote": [n_with],
            }
        )

    if not hot_ids:
        # fast path (every production-shaped corpus): plan identical
        # to the ungated formulation — one exchange, one pandas stage
        return (
            ev.groupBy("user_id")
            .applyInPandas(asof, schema="user_id long, n_purchases long, n_with_quote long")
            .orderBy("user_id")
        )

    cold = (
        ev.filter(~F.col("user_id").isin(hot_ids))
        .groupBy("user_id")
        .applyInPandas(asof, schema="user_id long, n_purchases long, n_with_quote long")
    )

    # window formulation for the hot users (q_asof_join's plan shape:
    # union-tag + last-quote carry — Spark's window/sort operators
    # spill to disk, so a 50%-hot user streams through instead of
    # OOMing one pandas frame)
    tagged = ev.filter(F.col("user_id").isin(hot_ids)).select(
        "user_id",
        "ts",
        "event_id",
        (F.col("event_type") == "purchase").cast("int").alias("is_purchase"),
    )
    w = W.partitionBy("user_id").orderBy("ts", "is_purchase", "event_id").rowsBetween(
        W.unboundedPreceding, -1
    )
    hot_out = (
        tagged.withColumn(
            "q_id",
            F.last(
                F.when(F.col("is_purchase") == 0, F.col("event_id")), ignorenulls=True
            ).over(w),
        )
        .filter(F.col("is_purchase") == 1)
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n_purchases"),
            F.count("q_id").alias("n_with_quote"),
        )
    )
    return cold.unionByName(hot_out).orderBy("user_id")


RANGE_FRAME_S = 3600  # trailing 1-hour value window


def q_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window (the VALUE-based frame ``q_window_funcs``'
    ROWS battery doesn't cover): per user, the exact-cents sum and
    count of purchases in the trailing ONE HOUR of event time —
    ``RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW`` over epoch
    seconds, so rows with EQUAL timestamps share a frame (the
    semantic difference from a ROWS frame). One user-key shuffle;
    the frame is time-bounded, not n-sized."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    epoch = F.col("ts").cast("timestamp").cast("long")
    w = (
        W.partitionBy("user_id")
        .orderBy(epoch)
        .rangeBetween(-RANGE_FRAME_S, 0)
    )
    cents = F.round(F.col("value") * 100.0).cast("long")
    return (
        ev.select(
            "user_id",
            "event_id",
            epoch.alias("epoch_s"),
            (F.sum(cents).over(w) / 100.0).alias("hour_value"),
            F.count("*").over(w).alias("hour_events"),
        )
        .orderBy("user_id", "epoch_s", "event_id")
    )


Q_RANGE_FRAME_SQL = f"""
SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS epoch_s,
       sum(CAST(round(value * 1e2) AS BIGINT))
           OVER (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                 RANGE BETWEEN {RANGE_FRAME_S} PRECEDING AND CURRENT ROW) / 1e2 AS hour_value,
       count(*) OVER (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
                 RANGE BETWEEN {RANGE_FRAME_S} PRECEDING AND CURRENT ROW) AS hour_events
FROM events WHERE event_type = 'purchase'
ORDER BY user_id, epoch_s, event_id
"""


def q_window_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-function battery: lead/lag, ntile, percent_rank,
    cume_dist, first_value over per-customer order history — the
    remaining analytic-window surface (one shuffle on the partition
    key; every function shares the same window spec)."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") % 20 == 0)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wf = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.round(F.lag("o_totalprice").over(w), 2).alias("prev_price"),
            F.round(F.lead("o_totalprice").over(w), 2).alias("next_price"),
            F.ntile(4).over(w).alias("quartile"),
            F.round(F.percent_rank().over(w), 4).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 4).alias("cume"),
            F.round(F.first("o_totalprice").over(wf), 2).alias("first_price"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


Q_WINDOW_FUNCS_SQL = """
SELECT o_custkey, o_orderkey,
       round(lag(o_totalprice) OVER w, 2) AS prev_price,
       round(lead(o_totalprice) OVER w, 2) AS next_price,
       ntile(4) OVER w AS quartile,
       round(percent_rank() OVER w, 4) AS pct_rank,
       round(cume_dist() OVER w, 4) AS cume,
       round(first_value(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                                             ROWS UNBOUNDED PRECEDING), 2) AS first_price
FROM orders WHERE o_custkey % 20 = 0
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
ORDER BY o_custkey, o_orderkey
"""


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS with grouping_id — finer-grained than
    cube/rollup (exactly the requested set combinations, one pass)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping_id() AS BIGINT) AS gid,
               count(*) AS n,
               -- 1e2: a plain 100.0 literal is DECIMAL in Spark
               -- SQL and would make the division decimal-typed
               sum(CAST(round(o_totalprice * 1e2) AS BIGINT)) / 1e2D AS total
        FROM orders_v
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                                (o_orderstatus, o_orderpriority))
        ORDER BY gid, o_orderstatus, o_orderpriority
        """
    )


Q_GROUPING_SETS_SQL = """
SELECT o_orderstatus, o_orderpriority,
       CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS BIGINT) AS gid,
       count(*) AS n,
       sum(CAST(round(o_totalprice * 1e2) AS BIGINT)) / 1e2 AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                        (o_orderstatus, o_orderpriority))
ORDER BY gid, o_orderstatus, o_orderpriority
"""


def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: a generated calendar spine left-joins
    daily order totals so missing days appear as explicit zeros, then
    a 7-day trailing average runs over the dense series. The spine is
    a sequence() explode — no driver loop; at 100 TB the spine is
    tiny (days) and broadcast into the join."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.count("*").alias("n_orders"),
        fixed_sum(F.col("o_totalprice")).alias("revenue"),
    )
    bounds = orders.agg(
        F.to_date(F.min("o_orderdate")).alias("lo"), F.to_date(F.max("o_orderdate")).alias("hi")
    )
    spine = bounds.select(
        F.explode(F.expr("sequence(lo, hi, interval 1 day)")).alias("day")
    )
    dense = (
        spine.join(daily, "day", "left")
        .select(
            "day",
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("revenue", F.lit(0.0)).alias("revenue"),
        )
    )
    w7 = W.orderBy("day").rowsBetween(-6, 0)
    # revenue is exact cents/100, so round(revenue*100) recovers exact
    # cents; integer window sums are engine-order-independent.
    return (
        dense.withColumn(
            "avg_7d",
            F.round(
                F.sum(F.round(F.col("revenue") * 100.0).cast("long")).over(w7)
                / F.count("*").over(w7)
            ).cast("long")
            / 100.0,
        )
        .orderBy("day")
    )


Q_GAP_FILL_SQL = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n_orders,
         sum(CAST(round(o_totalprice * 1e2) AS BIGINT)) / 1e2 AS revenue
  FROM orders GROUP BY 1
), spine AS (
  SELECT unnest(generate_series((SELECT min(day) FROM daily),
                                (SELECT max(day) FROM daily),
                                INTERVAL 1 DAY))::DATE AS day
), dense AS (
  SELECT s.day, coalesce(d.n_orders, 0) AS n_orders,
         coalesce(d.revenue, 0.0) AS revenue
  FROM spine s LEFT JOIN daily d ON s.day = d.day
)
SELECT day, n_orders, revenue,
       CAST(round(sum(CAST(round(revenue * 1e2) AS BIGINT))
                    OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
                  * 1e0
                  / count(*) OVER (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
            AS BIGINT) / 1e2 AS avg_7d
FROM dense ORDER BY day
"""


# merge_asof(direction='backward') matches a purchase iff ANY
# view/click exists at ts <= purchase ts for the same user.
Q_ASOF_GROUPED_SQL = """
WITH ev AS (
  SELECT user_id, ts, event_type FROM events
  WHERE event_type IN ('purchase', 'view', 'click')
), p AS (SELECT * FROM ev WHERE event_type = 'purchase'),
   q AS (SELECT * FROM ev WHERE event_type <> 'purchase')
SELECT p.user_id AS user_id, count(*) AS n_purchases,
       CAST(sum(CASE WHEN EXISTS (
                  SELECT 1 FROM q WHERE q.user_id = p.user_id AND q.ts <= p.ts
                ) THEN 1 ELSE 0 END) AS BIGINT) AS n_with_quote
FROM p GROUP BY 1 ORDER BY 1
"""


def q_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join/agg-key skew diagnostics — the measurement behind every
    salting / AQE-skew-join decision: per candidate shuffle key,
    cardinality, row mass, heaviest-key size, p50/p99 key sizes, and
    the skew factor (max key / mean key). A skew factor near 1 means
    hash partitioning balances; ≫1 means the heaviest reducer owns
    the job's tail latency and the key needs salting.

    One count-shuffle per profiled key, then an O(distinct-keys)
    aggregate — the profile itself never materializes row-level
    data, so it is safe to run against the full 100 TB fact table."""

    def profile(df: DataFrame, key: str) -> DataFrame:
        counts = df.groupBy(key).agg(F.count("*").alias("n"))
        return counts.agg(
            F.lit(key).alias("key_name"),
            F.count("*").alias("n_keys"),
            F.sum("n").alias("n_rows"),
            F.max("n").alias("max_key_rows"),
            F.round(F.percentile("n", 0.5), 2).alias("p50_key_rows"),
            F.round(F.percentile("n", 0.99), 2).alias("p99_key_rows"),
            # fixed-point, not round(x, 2): max·keys/sum lands on exact
            # 2dp ties (fuzz seed 1201: 70·49/400 = 8.575 → Spark 8.58
            # vs DuckDB's binary-double 8.57). One scale-0 round of the
            # scaled ratio — the r10 doctrine — kills the tie class.
            fixed_point(F.max("n") * F.count("*") / F.sum("n"), 2).alias("skew_factor"),
        )

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    ev = load_table(spark, sf_dir, "events")
    return (
        profile(li, "l_suppkey")
        .unionByName(profile(li, "l_orderkey"))
        .unionByName(profile(orders, "o_custkey"))
        .unionByName(profile(ev, "event_type"))
        .orderBy("key_name")
    )


_SKEW_PROFILE_ONE = """
SELECT '{key}' AS key_name,
       CAST(count(*) AS BIGINT) AS n_keys,
       CAST(sum(n) AS BIGINT) AS n_rows,
       CAST(max(n) AS BIGINT) AS max_key_rows,
       round(quantile_cont(n, 0.5), 2) AS p50_key_rows,
       round(quantile_cont(n, 0.99), 2) AS p99_key_rows,
       CAST(round((max(n) * count(*) * 1e0 / sum(n)) * 1e2) AS BIGINT) / 1e2 AS skew_factor
FROM (SELECT {key}, CAST(count(*) AS BIGINT) AS n FROM {table} GROUP BY {key})
"""

Q_KEY_SKEW_PROFILE_SQL = (
    " UNION ALL ".join(
        _SKEW_PROFILE_ONE.format(key=k, table=t)
        for k, t in [
            ("l_suppkey", "lineitem"),
            ("l_orderkey", "lineitem"),
            ("o_custkey", "orders"),
            ("event_type", "events"),
        ]
    )
    + " ORDER BY key_name"
)


N_HIST_BINS = 20


def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of order totals with data-derived bounds:
    pass 1 computes min/max (tiny aggregate, broadcast back), pass 2
    buckets every row map-side — the standard two-pass distributed
    histogram; no sort, no sampling, exact counts.

    The bucket expression uses floor() (not int-cast) so Spark and
    any oracle engine agree on boundary values (CAST rounds in some
    engines, truncates in others)."""
    orders = load_table(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    width = (F.col("hi") - F.col("lo")) / N_HIST_BINS
    return (
        orders.crossJoin(F.broadcast(bounds))
        .select(
            F.least(
                F.floor((F.col("o_totalprice") - F.col("lo")) / width),
                F.lit(N_HIST_BINS - 1),
            )
            .cast("long")
            .alias("bin"),
            (F.col("o_totalprice")).alias("p"),
            "lo",
        )
        .groupBy("bin")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.min("p"), 2).alias("bin_min"),
            F.round(F.max("p"), 2).alias("bin_max"),
        )
        .orderBy("bin")
    )


Q_HISTOGRAM_SQL = f"""
WITH bounds AS (
  SELECT min(o_totalprice) AS lo, max(o_totalprice) AS hi FROM orders
)
SELECT CAST(least(floor((o_totalprice - lo) / ((hi - lo) / {N_HIST_BINS})),
                  {N_HIST_BINS - 1}) AS BIGINT) AS bin,
       CAST(count(*) AS BIGINT) AS n_orders,
       round(min(o_totalprice), 2) AS bin_min,
       round(max(o_totalprice), 2) AS bin_max
FROM orders, bounds
GROUP BY 1 ORDER BY bin
"""


Z_BITS = 8  # bits per dimension in the z-key
Z_BUCKET_SHIFT = 10  # bucket = zkey >> shift → 64 buckets


def _zkey_expr(a, b):
    """Bit-interleave two Z_BITS-wide ints: bit i of a → position 2i,
    bit i of b → position 2i+1. Pure integer shifts — identical in
    any engine."""
    expr = F.lit(0)
    for i in range(Z_BITS):
        expr = (
            expr
            + F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
            + F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        )
    return expr


def q_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout analysis — the math behind
    Delta/Iceberg `OPTIMIZE ZORDER BY`: interleave the bits of two
    query dimensions (customer bucket × order month) into one sort
    key, bucket the keyspace, and report each bucket's span in BOTH
    dimensions. Tight per-bucket min/max ranges on both columns are
    exactly what lets a 100 TB scan skip files on either predicate;
    a single-column sort would leave the other dimension's span at
    full width.

    Everything is integer bit arithmetic (shifts + masks), exact in
    any engine, one aggregate over the mapped keys."""
    orders = load_table(spark, sf_dir, "orders")
    cust_b = F.pmod(F.col("o_custkey"), F.lit(1 << Z_BITS)).cast("long")
    month_b = F.pmod(
        (F.year("o_orderdate") - 1995) * 12 + F.month("o_orderdate") - 1,
        F.lit(1 << Z_BITS),
    ).cast("long")
    z = _zkey_expr(cust_b, month_b)
    return (
        orders.select(
            F.shiftright(z, Z_BUCKET_SHIFT).alias("z_bucket"),
            cust_b.alias("cb"),
            month_b.alias("mb"),
        )
        .groupBy("z_bucket")
        .agg(
            F.count("*").alias("n_orders"),
            F.min("cb").alias("cust_min"),
            F.max("cb").alias("cust_max"),
            F.min("mb").alias("month_min"),
            F.max("mb").alias("month_max"),
        )
        .orderBy("z_bucket")
    )


def _zkey_sql(a: str, b: str) -> str:
    # every term fully parenthesized: DuckDB's << binds LOOSER than +,
    # so bare `x << 2 + y << 3` nests the shifts instead of summing
    terms = []
    for i in range(Z_BITS):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


Q_ZORDER_LAYOUT_SQL = f"""
WITH mapped AS (
  SELECT o_custkey % {1 << Z_BITS} AS cb,
         ((year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1) % {1 << Z_BITS} AS mb
  FROM orders
)
SELECT CAST(({_zkey_sql("cb", "mb")}) >> {Z_BUCKET_SHIFT} AS BIGINT) AS z_bucket,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(min(cb) AS BIGINT) AS cust_min,
       CAST(max(cb) AS BIGINT) AS cust_max,
       CAST(min(mb) AS BIGINT) AS month_min,
       CAST(max(mb) AS BIGINT) AS month_max
FROM mapped GROUP BY 1 ORDER BY z_bucket
"""


def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 dimension building — the warehouse pattern for
    keeping full history of a changing attribute: each customer's
    order stream becomes versioned rows with [valid_from, valid_to)
    ranges and a current-row flag. One window pass (lead over the
    per-customer order sequence) — no self-join, no correlated
    subquery; at scale this is a single hash-shuffle on the
    dimension key. Limited to 3 customers' histories for a readable
    result; the plan shape is identical unbounded."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 3)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    nxt = F.lead("o_orderdate").over(w)
    return orders.select(
        "o_custkey",
        F.row_number().over(w).alias("version"),
        F.round("o_totalprice", 2).alias("attr_totalprice"),
        F.col("o_orderdate").cast("date").alias("valid_from"),
        F.coalesce(nxt.cast("date"), F.lit("9999-12-31").cast("date")).alias("valid_to"),
        nxt.isNull().alias("is_current"),
    ).orderBy("o_custkey", "version")


Q_SCD2_HISTORY_SQL = """
SELECT o_custkey,
       row_number() OVER w AS version,
       round(o_totalprice, 2) AS attr_totalprice,
       CAST(o_orderdate AS DATE) AS valid_from,
       CAST(coalesce(lead(o_orderdate) OVER w, TIMESTAMP '9999-12-31') AS DATE) AS valid_to,
       lead(o_orderdate) OVER w IS NULL AS is_current
FROM orders
WHERE o_custkey <= 3
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
ORDER BY o_custkey, version
"""


_CORR_COLS = {
    # column → integer scaling (exact in int64 even at SF 1000:
    # dollars ≤ 1e5 → squares 1e10 × 1e9 rows ≈ 1e19... price scaled
    # to whole dollars keeps Σx² within int64 through sf ~100; the
    # oracle's HUGEINT and Spark's long agree on every value here)
    "qty": ("l_quantity", 1),
    "price_usd": ("l_extendedprice", 0),  # floor to whole dollars
    "discount_bp": ("l_discount", 10000),
    "tax_bp": ("l_tax", 10000),
}


def q_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlations between lineitem's numeric
    columns, computed from EXACT integer sufficient statistics
    (n, Σx, Σx², Σxy) — one map-side pass, one tiny aggregate, and a
    result no float summation order can perturb (the reason this is
    hash-gated while a naive corr() over doubles is not). The same
    single-pass moment formulation BFR's sufficient statistics use.
    """
    li = load_table(spark, sf_dir, "lineitem")
    ints = {}
    for name, (col, scale) in _CORR_COLS.items():
        c = F.col(col) * scale if scale else F.floor(F.col(col))
        ints[name] = F.round(c, 0).cast("long") if scale else c.cast("long")
    sel = li.select(*[v.alias(k) for k, v in ints.items()])
    names = list(_CORR_COLS)
    # sums stay EXACT int64; the derived moments are computed in
    # double (cast each exact sum once, identical expression tree on
    # both engines) because n·Σx² overflows int64
    aggs = [F.count("*").cast("double").alias("n")]
    for k in names:
        aggs.append(F.sum(F.col(k)).cast("double").alias(f"s_{k}"))
        aggs.append(F.sum(F.col(k) * F.col(k)).cast("double").alias(f"ss_{k}"))
    pairs = [(a, b) for i, a in enumerate(names) for b in names[i + 1 :]]
    for a, b in pairs:
        aggs.append(F.sum(F.col(a) * F.col(b)).cast("double").alias(f"sp_{a}_{b}"))
    # materialize the single-row moment table: each pair's SELECT
    # below reads it, and without lineage truncation every union
    # branch would re-run the full fact scan
    m = sel.agg(*aggs).localCheckpoint(eager=True)
    rows = []
    for a, b in pairs:
        num = F.col("n") * F.col(f"sp_{a}_{b}") - F.col(f"s_{a}") * F.col(f"s_{b}")
        va = F.col("n") * F.col(f"ss_{a}") - F.col(f"s_{a}") * F.col(f"s_{a}")
        vb = F.col("n") * F.col(f"ss_{b}") - F.col(f"s_{b}") * F.col(f"s_{b}")
        rows.append(
            m.select(
                F.lit(a).alias("col_a"),
                F.lit(b).alias("col_b"),
                F.round(num / (F.sqrt(va) * F.sqrt(vb)), 6).alias("pearson_r"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("col_a", "col_b")


def _corr_sql() -> str:
    names = list(_CORR_COLS)
    exprs = []
    for name, (col, scale) in _CORR_COLS.items():
        if scale:
            exprs.append(f"CAST(round({col} * {scale}, 0) AS BIGINT) AS {name}")
        else:
            exprs.append(f"CAST(floor({col}) AS BIGINT) AS {name}")
    # exact BIGINT sums cast ONCE to double; all derived arithmetic
    # in double with the same expression tree as the Spark plan
    aggs = ["CAST(count(*) AS DOUBLE) AS n"]
    for k in names:
        aggs.append(f"CAST(CAST(sum({k}) AS BIGINT) AS DOUBLE) AS s_{k}")
        aggs.append(f"CAST(CAST(sum({k} * {k}) AS BIGINT) AS DOUBLE) AS ss_{k}")
    pairs = [(a, b) for i, a in enumerate(names) for b in names[i + 1 :]]
    for a, b in pairs:
        aggs.append(f"CAST(CAST(sum({a} * {b}) AS BIGINT) AS DOUBLE) AS sp_{a}_{b}")
    selects = []
    for a, b in pairs:
        selects.append(
            f"SELECT '{a}' AS col_a, '{b}' AS col_b, "
            f"round((n * sp_{a}_{b} - s_{a} * s_{b}) / "
            f"(sqrt(n * ss_{a} - s_{a} * s_{a}) * sqrt(n * ss_{b} - s_{b} * s_{b})), 6) AS pearson_r "
            f"FROM m"
        )
    return (
        "WITH ints AS (SELECT "
        + ", ".join(exprs)
        + " FROM lineitem), m AS (SELECT "
        + ", ".join(aggs)
        + " FROM ints) "
        + " UNION ALL ".join(selects)
        + " ORDER BY col_a, col_b"
    )


Q_CORR_MATRIX_SQL = _corr_sql()


def q_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation: quintile scores for Recency (last
    order date), Frequency (order count), Monetary (total spend),
    combined into a segment code — the classic marketing rollup.

    One groupBy(customer) pass for the three metrics, then EXACT
    ntile(5) per metric via ``operators.ranking.global_ntile`` —
    deterministic literal-cut buckets on the metric, rank locally per
    bucket, add broadcast prefix offsets. Same bit-exact output as a
    bare ``ntile(5) OVER (ORDER BY …)`` (the oracle's formulation)
    but with NO unpartitioned window: at 10⁹ customers each scoring
    pass is a parallel bucketed shuffle instead of one task
    swallowing the whole aggregate. The only driver materializations
    are the three bucket-cut sketches (≤P doubles each) — and those
    are skipped entirely when the counted aggregate is under
    ``ranking.SMALL_TOTAL``, where global_ntile's size gate uses the
    plain window (both paths bit-equal, tests/test_ranking.py)."""
    from ..operators.ranking import SMALL_TOTAL, bucket_cuts, global_ntile

    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").alias("frequency"),
        # Exact cents: monetary is an ntile SORT key, so even a
        # last-ulp cross-engine difference could flip a quintile.
        fixed_sum(F.col("o_totalprice")).alias("monetary"),
    ).persist()
    # bucket expressions are negated: leading sort is DESC (and the
    # keys are non-null groupBy aggregates; nulls='last' documents
    # the DESC alignment anyway). All three cut sketches come from
    # ONE action over the persisted aggregate — only on the
    # distributed path — and the known total lets each ntile skip
    # its in-plan count.
    r_b = -F.col("last_order").cast("timestamp").cast("double")
    f_b = -F.col("frequency")
    m_b = -F.col("monetary")
    n_cust = per_cust.count()
    if n_cust > SMALL_TOTAL:
        cut_r, cut_f, cut_m = bucket_cuts(per_cust, [r_b, f_b, m_b])
    else:
        cut_r = cut_f = cut_m = None
    scored = global_ntile(
        per_cust, 5, [F.desc("last_order"), F.col("o_custkey")],
        r_b, "r_score", cut_r, n_cust, nulls="last",
    )
    scored = global_ntile(
        scored, 5, [F.desc("frequency"), F.col("o_custkey")],
        f_b, "f_score", cut_f, n_cust, nulls="last",
    )
    scored = global_ntile(
        scored, 5, [F.desc("monetary"), F.col("o_custkey")],
        m_b, "m_score", cut_m, n_cust, nulls="last",
    )
    result = (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(F.count("*").alias("n_customers"))
        .filter(F.col("n_customers") >= 5)
        .orderBy(F.desc("n_customers"), "r_score", "f_score", "m_score")
        # the ntile passes already ran eager per-partition count jobs;
        # pin the (small) segment table and release the cached
        # customer aggregate
        .localCheckpoint(eager=True)
    )
    per_cust.unpersist()
    return result


Q_RFM_SEGMENTATION_SQL = """
WITH per_cust AS (
  SELECT o_custkey, max(o_orderdate) AS last_order,
         count(*) AS frequency,
         sum(CAST(round(o_totalprice * 1e2) AS BIGINT)) / 1e2 AS monetary
  FROM orders GROUP BY 1
), scored AS (
  SELECT o_custkey,
         ntile(5) OVER (ORDER BY last_order DESC, o_custkey) AS r_score,
         ntile(5) OVER (ORDER BY frequency DESC, o_custkey) AS f_score,
         ntile(5) OVER (ORDER BY monetary DESC, o_custkey) AS m_score
  FROM per_cust
)
SELECT r_score, f_score, m_score, CAST(count(*) AS BIGINT) AS n_customers
FROM scored GROUP BY 1, 2, 3
HAVING count(*) >= 5
ORDER BY n_customers DESC, r_score, f_score, m_score
"""


def q_market_basket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association rules over part BRANDS: for brand
    pairs co-occurring in an order, support, confidence(A→B), and
    lift — the classic recommendation primer. Per-order brand sets
    are bounded (a handful of lines), so pairs come from an in-row
    combination explode, never an order-keyed self-join; the
    brand-count table is catalog-sized and broadcasts."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    ob = (
        li.join(part, li.l_partkey == part.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    n_orders = ob.select("l_orderkey").distinct().count()
    per_order = ob.groupBy("l_orderkey").agg(F.array_sort(F.collect_set("p_brand")).alias("bs"))
    pairs = per_order.select(
        F.explode(
            F.expr(
                "flatten(transform(bs, (x, i) -> "
                "transform(slice(bs, i + 2, size(bs)), y -> struct(x AS a, y AS b))))"
            )
        ).alias("p")
    ).select("p.a", "p.b")
    pair_n = pairs.groupBy("a", "b").agg(F.count("*").alias("n_ab"))
    brand_n = ob.groupBy("p_brand").agg(F.count("*").alias("n"))
    na = brand_n.select(F.col("p_brand").alias("a"), F.col("n").alias("n_a"))
    nb = brand_n.select(F.col("p_brand").alias("b"), F.col("n").alias("n_b"))
    return (
        pair_n.join(F.broadcast(na), "a")
        .join(F.broadcast(nb), "b")
        .select(
            F.col("a").alias("brand_a"),
            F.col("b").alias("brand_b"),
            # scale-0 fixed rounds — round(k/n, 5) ties flip across
            # engines when n is 5-smooth (the q_events_anomaly class)
            (F.round(F.col("n_ab") * 100000.0 / n_orders).cast("long") / 1e5).alias("support"),
            (F.round(F.col("n_ab") * 100000.0 / F.col("n_a")).cast("long") / 1e5).alias("confidence"),
            (
                F.round(F.col("n_ab") * n_orders * 10000.0 / (F.col("n_a") * F.col("n_b"))).cast("long")
                / 1e4
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "brand_a", "brand_b")
        .limit(20)
    )


Q_MARKET_BASKET_SQL = """
WITH ob AS (
  SELECT DISTINCT l_orderkey, p_brand FROM lineitem JOIN part ON l_partkey = p_partkey
), tot AS (SELECT count(DISTINCT l_orderkey) AS n_orders FROM ob),
pair_n AS (
  SELECT o1.p_brand AS a, o2.p_brand AS b, count(*) AS n_ab
  FROM ob o1 JOIN ob o2 ON o1.l_orderkey = o2.l_orderkey AND o1.p_brand < o2.p_brand
  GROUP BY 1, 2
), brand_n AS (
  SELECT p_brand, count(*) AS n FROM ob GROUP BY 1
)
SELECT a AS brand_a, b AS brand_b,
       CAST(round(n_ab * 1e5 / n_orders) AS BIGINT) / 1e5 AS support,
       CAST(round(n_ab * 1e5 / na.n) AS BIGINT) / 1e5 AS confidence,
       CAST(round(n_ab * n_orders * 1e4 / (na.n * nb.n)) AS BIGINT) / 1e4 AS lift
FROM pair_n, tot
JOIN brand_n na ON pair_n.a = na.p_brand
JOIN brand_n nb ON pair_n.b = nb.p_brand
ORDER BY lift DESC, brand_a, brand_b
LIMIT 20
"""


def q_mv_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-view rollup — the aggregate-reuse pattern every
    lakehouse runs: materialize DAILY partial aggregates to storage
    (the MV), then answer the MONTHLY question by re-aggregating the
    partials, never rescanning the fact table. The oracle computes
    monthly straight from the facts, so the hash match PROVES the
    partials re-aggregate losslessly (counts/sums are mergeable;
    averages are re-derived from them, never averaged-of-averages).
    """
    import tempfile

    orders = load_table(spark, sf_dir, "orders")
    # Partials carry integer cents: BIGINT sums merge losslessly AND
    # deterministically (a double `rev` partial re-sums in partition
    # order, which flips the last bit across engines — r4 hash-FAIL).
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        F.count("*").alias("n"), F.sum(cents).alias("rev_cents")
    )
    mv = tempfile.mkdtemp(prefix="mv_daily_")
    daily.write.mode("overwrite").parquet(mv)
    daily_mv = spark.read.parquet(mv)
    return (
        daily_mv.groupBy(F.date_trunc("month", "day").cast("date").alias("month"))
        .agg(
            F.sum("n").alias("n_orders"),
            (F.sum("rev_cents") / 100.0).alias("revenue"),
            # avg to 4 dp via integer units of 1e-4: cents/100/n * 1e4
            (F.round(F.sum("rev_cents") * 100.0 / F.sum("n")).cast("long") / 10000.0).alias(
                "avg_order_value"
            ),
        )
        .orderBy("month")
    )


def q_mv_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view MAINTENANCE — the delta-merge
    pattern that keeps a lakehouse MV fresh without rescanning
    history: the standing MV holds per-month mergeable partials
    (count + integer-cents sum) materialized from the base facts; a
    new ingest delta (o_orderkey % 10 == 0 — a deterministic 10%
    "late batch") is aggregated ALONE and folded into the MV with one
    full-outer join + coalesced sums. The oracle recomputes the view
    straight from the full fact table, so the hash match PROVES
    merge-maintenance ≡ full recompute — the algebraic property
    (commutative mergeable partials) that makes incremental MV
    correct at any scale.

    Scale: the merge shuffles |months| + |delta months| partial rows
    — never the base facts; the delta scan is the only fact-table
    read per refresh. Same discipline as ``q_mv_rollup``: BIGINT
    cents partials (double partials re-sum in partition order and
    flip last bits), averages re-derived from merged sums."""
    import tempfile

    orders = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    month = F.date_trunc("month", F.to_date("o_orderdate")).cast("date")
    is_delta = F.col("o_orderkey") % 10 == 0
    mv0 = (
        orders.filter(~is_delta)
        .groupBy(month.alias("month"))
        .agg(F.count("*").alias("n"), F.sum(cents).alias("rev_cents"))
    )
    mv_dir = tempfile.mkdtemp(prefix="mv_inc_")
    mv0.write.mode("overwrite").parquet(mv_dir)
    standing = spark.read.parquet(mv_dir)
    dp = (
        orders.filter(is_delta)
        .groupBy(month.alias("month"))
        .agg(F.count("*").alias("n"), F.sum(cents).alias("rev_cents"))
    )
    merged = (
        standing.alias("b")
        .join(dp.alias("d"), "month", "full_outer")
        .select(
            "month",
            (F.coalesce(F.col("b.n"), F.lit(0)) + F.coalesce(F.col("d.n"), F.lit(0))).alias(
                "n"
            ),
            (
                F.coalesce(F.col("b.rev_cents"), F.lit(0))
                + F.coalesce(F.col("d.rev_cents"), F.lit(0))
            ).alias("rev_cents"),
        )
    )
    return merged.select(
        "month",
        F.col("n").alias("n_orders"),
        (F.col("rev_cents") / 100.0).alias("revenue"),
        (F.round(F.col("rev_cents") * 100.0 / F.col("n")).cast("long") / 10000.0).alias(
            "avg_order_value"
        ),
    ).orderBy("month")


# the oracle IS a full recompute from the facts — identical text to
# Q_MV_ROLLUP_SQL by design: the key's claim is that delta-merge
# maintenance produces EXACTLY the recomputed view
Q_MV_INCREMENTAL_SQL = """
WITH cents AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         CAST(round(o_totalprice * 100) AS BIGINT) AS c
  FROM orders
)
SELECT month,
       CAST(count(*) AS BIGINT) AS n_orders,
       sum(c) / 1e2 AS revenue,
       CAST(round(sum(c) * 1e2 / count(*)) AS BIGINT) / 1e4 AS avg_order_value
FROM cents GROUP BY 1 ORDER BY month
"""


Q_MV_ROLLUP_SQL = """
WITH cents AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         CAST(round(o_totalprice * 100) AS BIGINT) AS c
  FROM orders
)
SELECT month,
       CAST(count(*) AS BIGINT) AS n_orders,
       sum(c) / 1e2 AS revenue,
       CAST(round(sum(c) * 1e2 / count(*)) AS BIGINT) / 1e4 AS avg_order_value
FROM cents GROUP BY 1 ORDER BY month
"""


QUERIES = {
    "q_mv_rollup": q_mv_rollup,
    "q_mv_incremental": q_mv_incremental,
    "q_rfm_segmentation": q_rfm_segmentation,
    "q_market_basket": q_market_basket,
    "q_corr_matrix": q_corr_matrix,
    "q_scd2_history": q_scd2_history,
    "q_zorder_layout": q_zorder_layout,
    "q_histogram": q_histogram,
    "q_key_skew_profile": q_key_skew_profile,
    "q_asof_grouped": q_asof_grouped,
    "q_set_ops": q_set_ops,
    "q_set_ops_all": q_set_ops_all,
    "q_scalar_subquery": q_scalar_subquery,
    "q_join_strategies": q_join_strategies,
    "q_range_frame": q_range_frame,
    "q_generator_funcs": q_generator_funcs,
    "q_lateral_join": q_lateral_join,
    "q_higher_order_funcs": q_higher_order_funcs,
    "q_recursive_cte": q_recursive_cte,
    "q_complex_types": q_complex_types,
    "q_json_schema_roundtrip": q_json_schema_roundtrip,
    "q_variant_type": q_variant_type,
    "q_observed_metrics": q_observed_metrics,
    "q_explode_outer": q_explode_outer,
    "q_ignore_nulls_window": q_ignore_nulls_window,
    "q_try_arithmetic": q_try_arithmetic,
    "q_group_by_all": q_group_by_all,
    "q_date_funcs": q_date_funcs,
    "q_unpivot": q_unpivot,
    "q_cube": q_cube,
    "q_outer_join": q_outer_join,
    "q_null_semantics": q_null_semantics,
    "q_moving_avg": q_moving_avg,
    "q_salted_agg": q_salted_agg,
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q10_returned_items": q10_returned_items,
    "q12_shipmode": q12_shipmode,
    "q14_promo_revenue": q14_promo_revenue,
    "q16_supplier_cnt": q16_supplier_cnt,
    "q18_large_orders": q18_large_orders,
    "q19_disjunctive": q19_disjunctive,
    "q_events_json": q_events_json,
    "q_percentiles": q_percentiles,
    "q_percentiles_dist": q_percentiles_dist,
    "q_percentiles_approx": q_percentiles_approx,
    "q_window_funcs": q_window_funcs,
    "q_grouping_sets": q_grouping_sets,
    "q_gap_fill": q_gap_fill,
}

ORACLES = {
    "q_mv_rollup": Q_MV_ROLLUP_SQL,
    "q_mv_incremental": Q_MV_INCREMENTAL_SQL,
    "q_rfm_segmentation": Q_RFM_SEGMENTATION_SQL,
    "q_market_basket": Q_MARKET_BASKET_SQL,
    "q_corr_matrix": Q_CORR_MATRIX_SQL,
    "q_scd2_history": Q_SCD2_HISTORY_SQL,
    "q_zorder_layout": Q_ZORDER_LAYOUT_SQL,
    "q_histogram": Q_HISTOGRAM_SQL,
    "q_key_skew_profile": Q_KEY_SKEW_PROFILE_SQL,
    "q_asof_grouped": Q_ASOF_GROUPED_SQL,
    "q_set_ops": Q_SET_OPS_SQL,
    "q_set_ops_all": Q_SET_OPS_ALL_SQL,
    "q_scalar_subquery": Q_SCALAR_SUBQUERY_SQL,
    "q_join_strategies": Q_JOIN_STRATEGIES_SQL,
    "q_range_frame": Q_RANGE_FRAME_SQL,
    "q_generator_funcs": Q_GENERATOR_FUNCS_SQL,
    "q_lateral_join": Q_LATERAL_JOIN_SQL,
    "q_higher_order_funcs": Q_HIGHER_ORDER_FUNCS_SQL,
    "q_recursive_cte": Q_RECURSIVE_CTE_SQL,
    "q_complex_types": Q_COMPLEX_TYPES_SQL,
    "q_json_schema_roundtrip": Q_JSON_SCHEMA_ROUNDTRIP_SQL,
    "q_variant_type": Q_VARIANT_TYPE_SQL,
    "q_observed_metrics": Q_OBSERVED_METRICS_SQL,
    "q_explode_outer": Q_EXPLODE_OUTER_SQL,
    "q_ignore_nulls_window": Q_IGNORE_NULLS_WINDOW_SQL,
    "q_try_arithmetic": Q_TRY_ARITHMETIC_SQL,
    "q_group_by_all": Q_GROUP_BY_ALL_SQL,
    "q_date_funcs": Q_DATE_FUNCS_SQL,
    "q_unpivot": Q_UNPIVOT_SQL,
    "q_cube": Q_CUBE_SQL,
    "q_outer_join": Q_OUTER_JOIN_SQL,
    "q_null_semantics": Q_NULL_SEMANTICS_SQL,
    "q_moving_avg": Q_MOVING_AVG_SQL,
    "q_salted_agg": Q_SALTED_AGG_SQL,
    "q2_min_cost_supplier": Q2_SQL,
    "q10_returned_items": Q10_SQL,
    "q12_shipmode": Q12_SQL,
    "q14_promo_revenue": Q14_SQL,
    "q16_supplier_cnt": Q16_SQL,
    "q18_large_orders": Q18_SQL,
    "q19_disjunctive": Q19_SQL,
    "q_events_json": Q_EVENTS_JSON_SQL,
    "q_percentiles": Q_PERCENTILES_SQL,
    "q_percentiles_dist": Q_PERCENTILES_DIST_SQL,
    "q_window_funcs": Q_WINDOW_FUNCS_SQL,
    "q_grouping_sets": Q_GROUPING_SETS_SQL,
    "q_gap_fill": Q_GAP_FILL_SQL,
}
