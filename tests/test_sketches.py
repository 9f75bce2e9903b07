"""Sketch operators: CMS overcount property, bloom no-false-negative
property — the invariants that make the sketches trustworthy."""

from bfr_clustering_using_pyspark_spark.operators.sketches import (
    q_bloom_filter_join,
    q_countmin_topk,
)
from tests.conftest import SF_SMALL


def test_cms_never_undercounts(spark):
    rows = q_countmin_topk(spark, SF_SMALL).collect()
    assert len(rows) == 20
    for r in rows:
        assert r["estimate"] >= r["exact"]  # CMS one-sided error
        assert r["overcount"] == r["estimate"] - r["exact"]
    exacts = [r["exact"] for r in rows]
    assert exacts == sorted(exacts, reverse=True)


def test_bloom_no_false_negatives(spark):
    """Every truly-matching order must pass the bloom filter: the
    true_positive count equals the exact semi-join count."""
    import pyspark.sql.functions as F

    rows = {r["verdict"]: r["n_orders"] for r in q_bloom_filter_join(spark, SF_SMALL).collect()}
    cust = spark.read.parquet(f"{SF_SMALL}/customer.parquet").filter(
        F.col("c_mktsegment") == "AUTOMOBILE"
    )
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    exact = orders.join(
        cust.select(F.col("c_custkey").alias("o_custkey")), "o_custkey", "left_semi"
    ).count()
    assert rows.get("true_positive", 0) == exact
    # FP rate is bounded: (1-e^{-kn/m})^k is tiny at this build size
    assert rows.get("false_positive", 0) <= orders.count() * 0.05
    assert sum(rows.values()) == orders.count()


def test_linear_count_accuracy(spark):
    """At load factor ~2 (7k keys into 4096 buckets) linear counting
    should land within a few percent of exact."""
    from bfr_clustering_using_pyspark_spark.operators.sketches import q_linear_count
    from tests.conftest import SF_MED

    rows = q_linear_count(spark, SF_MED).collect()
    assert rows
    for r in rows:
        assert r["rel_err"] <= 0.05
        assert r["lc_estimate"] > 0
