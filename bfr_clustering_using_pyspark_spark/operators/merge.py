"""Upsert/merge (SCD-1) and per-group model fitting.

``merge_upsert`` is the lakehouse MERGE INTO shape expressed with
plain DataFrame ops: updates win on key match, inserts pass through —
one outer join, no driver involvement. At 100 TB both sides shuffle
once on the merge key (or zero times if the base is bucketed on it —
see ``sources.sinks.write_bucketed``).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import fixed_sum
from ..sources.readers import load_table


def merge_upsert(base: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """MERGE INTO semantics: rows in ``updates`` replace matching
    ``base`` rows (by ``key``) and append otherwise."""
    cols = base.columns
    b, u = base.alias("b"), updates.alias("u")
    joined = b.join(u, F.col(f"b.{key}") == F.col(f"u.{key}"), "full_outer")
    picked = [
        F.coalesce(F.col(f"u.{c}"), F.col(f"b.{c}")).alias(c) for c in cols
    ]
    return joined.select(*picked)


def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic merge demo: orders where o_orderkey % 7 == 0 get
    a 10% price bump (updates); synthetic new orders (max_key +
    1..100) are inserted; result aggregated by status for a compact
    hash-stable output."""
    orders = load_table(spark, sf_dir, "orders")
    # Bumped price computed as integer cents (round(x*110) =
    # x*1.1 in cents) so the double is exactly cents/100 on both
    # engines — Spark's decimal-string round(x, 2) and DuckDB's
    # binary round can differ in the last cent otherwise.
    updates = (
        orders.filter(F.col("o_orderkey") % 7 == 0)
        .withColumn(
            "o_totalprice",
            F.round(F.col("o_totalprice") * 110).cast("long") / 100.0,
        )
        .withColumn("o_orderstatus", F.lit("U"))
    )
    # the max key stays IN-PLAN: a 1-row aggregate broadcast into the
    # 100-row insert generator (no driver action at plan-build time)
    max_key_row = orders.agg(F.max("o_orderkey").alias("_max_key"))
    inserts = (
        spark.range(1, 101)
        .crossJoin(F.broadcast(max_key_row))
        .select(
            (F.col("id") + F.col("_max_key")).alias("o_orderkey"),
            (F.col("id") % 50).alias("o_custkey"),
            F.lit("I").alias("o_orderstatus"),
            F.lit(100.0).alias("o_totalprice"),
            F.lit("2024-01-01 00:00:00").cast("timestamp").alias("o_orderdate"),
            F.lit("3-MEDIUM").alias("o_orderpriority"),
        )
    )
    merged = merge_upsert(orders, updates.unionByName(inserts), "o_orderkey")
    return (
        merged.groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"), fixed_sum(F.col("o_totalprice")).alias("total"))
        .orderBy("o_orderstatus")
    )


Q_MERGE_UPSERT_SQL = """
WITH updates AS (
  SELECT o_orderkey, o_custkey, 'U' AS o_orderstatus,
         CAST(round(o_totalprice * 110) AS BIGINT) / 1e2 AS o_totalprice, o_orderdate, o_orderpriority
  FROM orders WHERE o_orderkey % 7 = 0
), inserts AS (
  SELECT (SELECT max(o_orderkey) FROM orders) + i AS o_orderkey,
         i % 50 AS o_custkey, 'I' AS o_orderstatus, 100.0 AS o_totalprice,
         TIMESTAMP '2024-01-01 00:00:00' AS o_orderdate, '3-MEDIUM' AS o_orderpriority
  FROM generate_series(1, 100) AS t(i)
), delta AS (
  SELECT * FROM updates UNION ALL SELECT * FROM inserts
), merged AS (
  SELECT coalesce(d.o_orderkey, b.o_orderkey) AS o_orderkey,
         coalesce(d.o_orderstatus, b.o_orderstatus) AS o_orderstatus,
         coalesce(d.o_totalprice, b.o_totalprice) AS o_totalprice
  FROM orders b FULL OUTER JOIN delta d ON b.o_orderkey = d.o_orderkey
)
SELECT o_orderstatus, count(*) AS n,
       sum(CAST(round(o_totalprice * 100) AS BIGINT)) / 1e2 AS total
FROM merged GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


def q_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Built-in OLS per group: slope/intercept of totalprice vs order
    epoch-day per market segment (regr_slope ≡ DuckDB)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    # customer scales with SF — no broadcast hint, AQE decides.
    j = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        "c_mktsegment",
        (F.unix_timestamp("o_orderdate") / 86400.0).alias("day"),
        "o_totalprice",
    )
    return (
        j.groupBy("c_mktsegment")
        .agg(
            F.round(F.expr("regr_slope(o_totalprice, day)"), 6).alias("slope"),
            F.round(F.expr("regr_intercept(o_totalprice, day)"), 4).alias("intercept"),
            F.count("*").alias("n"),
        )
        .orderBy("c_mktsegment")
    )


Q_REGRESSION_SQL = """
SELECT c_mktsegment,
       round(regr_slope(o_totalprice, epoch(o_orderdate) / 86400.0), 6) AS slope,
       round(regr_intercept(o_totalprice, epoch(o_orderdate) / 86400.0), 4) AS intercept,
       count(*) AS n
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""


def model_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom grouped-map operator: fit an independent model per key
    with ``applyInPandas`` (here: NumPy OLS per market segment; in a
    real pipeline, any sklearn-style per-segment fit). The grouped-map
    pattern shuffles each group to one worker — model state never
    touches the driver. Oracle: ``Q_REGRESSION_SQL`` — NumPy OLS and
    regr_slope/intercept agree exactly after rounding (verified at
    sf0.001/sf0.01)."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    # customer scales with SF — no broadcast hint, AQE decides.
    j = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        "c_mktsegment",
        (F.unix_timestamp("o_orderdate") / 86400.0).alias("day"),
        "o_totalprice",
    )

    def fit(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["day"].to_numpy()
        y = pdf["o_totalprice"].to_numpy()
        slope, intercept = np.polyfit(x, y, 1)
        return pd.DataFrame(
            {
                "c_mktsegment": [pdf["c_mktsegment"].iloc[0]],
                "slope": [round(float(slope), 6)],
                "intercept": [round(float(intercept), 4)],
                "n": [len(pdf)],
            }
        )

    return (
        j.groupBy("c_mktsegment")
        .applyInPandas(fit, schema="c_mktsegment string, slope double, intercept double, n long")
        .orderBy("c_mktsegment")
    )


def q_cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture between two table snapshots — the diff
    feed every incremental pipeline consumes (Delta CDF / Iceberg
    changelog shape). Two deterministic snapshots derive from
    orders: the OLD snapshot lacks keys %7==0 (later inserts), the
    NEW snapshot lacks keys %5==0 (deletes) and bumps price by $5
    where key %11==0 (updates). One full-outer join on the key
    classifies every row I/D/U; unchanged rows are dropped. All
    prices travel as integer cents, so the row-level feed itself is
    hash-gated, not a summary of it.

    Scale: the only shuffle is the outer join's key exchange (none
    at all if both snapshots are bucketed on the key); the change
    classification is a projection."""
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", cents.alias("price_cents")
    )
    old = orders.filter(F.col("o_orderkey") % 7 != 0).select(
        F.col("o_orderkey").alias("key"), F.col("price_cents").alias("old_cents")
    )
    new = (
        orders.filter(F.col("o_orderkey") % 5 != 0)
        .select(
            F.col("o_orderkey").alias("key"),
            F.when(F.col("o_orderkey") % 11 == 0, F.col("price_cents") + 500)
            .otherwise(F.col("price_cents"))
            .alias("new_cents"),
        )
    )
    j = old.join(new, "key", "full_outer")
    return (
        j.withColumn(
            "change_type",
            F.when(F.col("old_cents").isNull(), F.lit("I"))
            .when(F.col("new_cents").isNull(), F.lit("D"))
            .when(F.col("old_cents") != F.col("new_cents"), F.lit("U")),
        )
        .filter(F.col("change_type").isNotNull())
        .select("key", "change_type", "old_cents", "new_cents")
        .orderBy("key")
    )


Q_CDC_SNAPSHOT_DIFF_SQL = """
WITH orders_c AS (
  SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents FROM orders
), old AS (
  SELECT o_orderkey AS key, price_cents AS old_cents FROM orders_c WHERE o_orderkey % 7 <> 0
), new AS (
  SELECT o_orderkey AS key,
         CASE WHEN o_orderkey % 11 = 0 THEN price_cents + 500 ELSE price_cents END AS new_cents
  FROM orders_c WHERE o_orderkey % 5 <> 0
)
SELECT coalesce(old.key, new.key) AS key,
       CASE WHEN old_cents IS NULL THEN 'I'
            WHEN new_cents IS NULL THEN 'D'
            WHEN old_cents <> new_cents THEN 'U' END AS change_type,
       old_cents, new_cents
FROM old FULL OUTER JOIN new ON old.key = new.key
WHERE (CASE WHEN old_cents IS NULL THEN 'I'
            WHEN new_cents IS NULL THEN 'D'
            WHEN old_cents <> new_cents THEN 'U' END) IS NOT NULL
ORDER BY 1
"""


QUERIES = {
    "q_merge_upsert": q_merge_upsert,
    "q_regression": q_regression,
    "model_per_key": model_per_key,
    "q_cdc_snapshot_diff": q_cdc_snapshot_diff,
}

ORACLES = {
    "q_merge_upsert": Q_MERGE_UPSERT_SQL,
    "q_regression": Q_REGRESSION_SQL,
    # same output contract as q_regression; per-group NumPy OLS ==
    # built-in regr_* after round(6)/round(4)
    "model_per_key": Q_REGRESSION_SQL,
    "q_cdc_snapshot_diff": Q_CDC_SNAPSHOT_DIFF_SQL,
}
