"""Data-quality checks — the Deequ/Great-Expectations shape as a
single declarative query: every constraint compiles to one aggregate
or one anti-join, the union of results is the quality report, and
the whole report is hash-gated (a DQ framework whose own numbers
aren't verified is worthless).

Scale posture: each check is one scan+agg over exactly the columns
it needs (column pruning keeps the scan narrow), referential checks
are LEFT ANTI joins (no row explosion, AQE-sized), and the final
UNION of one-row frames is free. At 100 TB you run the checks you
need; nothing here holds more than a counter per check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table


def _check(name: str, df: DataFrame, violation) -> DataFrame:
    return df.agg(
        F.lit(name).alias("check_name"),
        F.count("*").alias("n_checked"),
        F.sum(violation.cast("long")).alias("n_violations"),
    )


def q_dq_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality report over the warehouse tables: primary-key
    uniqueness, foreign-key orphans, domain ranges, null guards,
    and content emptiness — one row per check with checked/violation
    counts (exact integers)."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cust = load_table(spark, sf_dir, "customer")
    docs = load_table(spark, sf_dir, "documents")

    # PK uniqueness: excess rows beyond one per key
    pk = orders.agg(
        F.lit("orders_pk_unique").alias("check_name"),
        F.count("*").alias("n_checked"),
        (F.count("*") - F.countDistinct("o_orderkey")).alias("n_violations"),
    )
    # FK orphans via LEFT ANTI (the scan stays on the fact side)
    li_orphans = li.select("l_orderkey").join(
        orders.select("o_orderkey"), li.l_orderkey == orders.o_orderkey, "left_anti"
    )
    fk_li = li_orphans.agg(
        F.lit("lineitem_fk_orders").alias("check_name"),
        F.lit(0).cast("long").alias("n_checked"),
        F.count("*").alias("n_violations"),
    )
    ord_orphans = orders.select("o_custkey").join(
        cust.select("c_custkey"), orders.o_custkey == cust.c_custkey, "left_anti"
    )
    fk_ord = ord_orphans.agg(
        F.lit("orders_fk_customer").alias("check_name"),
        F.lit(0).cast("long").alias("n_checked"),
        F.count("*").alias("n_violations"),
    )
    ranges = [
        _check(
            "lineitem_qty_range",
            li.select("l_quantity"),
            (F.col("l_quantity") < 1) | (F.col("l_quantity") > 50),
        ),
        _check(
            "lineitem_discount_range",
            li.select("l_discount"),
            (F.col("l_discount") < 0) | (F.col("l_discount") > 0.5),
        ),
        _check(
            "orders_custkey_notnull",
            orders.select("o_custkey"),
            F.col("o_custkey").isNull(),
        ),
        _check(
            "documents_text_nonempty",
            docs.select("text"),
            F.col("text").isNull() | (F.length("text") == 0),
        ),
    ]
    out = pk
    for frame in [fk_li, fk_ord, *ranges]:
        out = out.unionByName(frame)
    return out.orderBy("check_name")


Q_DQ_CHECKS_SQL = """
SELECT * FROM (
  SELECT 'orders_pk_unique' AS check_name,
         CAST(count(*) AS BIGINT) AS n_checked,
         CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS n_violations
  FROM orders
  UNION ALL
  SELECT 'lineitem_fk_orders', CAST(0 AS BIGINT),
         CAST(count(*) AS BIGINT)
  FROM lineitem ANTI JOIN orders ON l_orderkey = o_orderkey
  UNION ALL
  SELECT 'orders_fk_customer', CAST(0 AS BIGINT),
         CAST(count(*) AS BIGINT)
  FROM orders ANTI JOIN customer ON o_custkey = c_custkey
  UNION ALL
  SELECT 'lineitem_qty_range', CAST(count(*) AS BIGINT),
         CAST(sum(CASE WHEN l_quantity < 1 OR l_quantity > 50 THEN 1 ELSE 0 END) AS BIGINT)
  FROM lineitem
  UNION ALL
  SELECT 'lineitem_discount_range', CAST(count(*) AS BIGINT),
         CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.5 THEN 1 ELSE 0 END) AS BIGINT)
  FROM lineitem
  UNION ALL
  SELECT 'orders_custkey_notnull', CAST(count(*) AS BIGINT),
         CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
  FROM orders
  UNION ALL
  SELECT 'documents_text_nonempty', CAST(count(*) AS BIGINT),
         CAST(sum(CASE WHEN text IS NULL OR length(text) = 0 THEN 1 ELSE 0 END) AS BIGINT)
  FROM documents
) ORDER BY check_name
"""

QUERIES = {"q_dq_checks": q_dq_checks}
ORACLES = {"q_dq_checks": Q_DQ_CHECKS_SQL}
