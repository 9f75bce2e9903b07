"""Merge/upsert semantics, per-key model fitting, stream-stream join
batch equivalence."""

import pandas as pd
from pyspark.sql import functions as F

from bfr_clustering_using_pyspark_spark.operators.merge import (
    merge_upsert,
    model_per_key,
    q_regression,
)
from bfr_clustering_using_pyspark_spark.sources.readers import load_table
from bfr_clustering_using_pyspark_spark.streaming import QUERIES as STREAM_QUERIES
from tests.conftest import SF_SMALL


def test_merge_upsert_semantics(spark):
    base = spark.createDataFrame(
        pd.DataFrame({"k": [1, 2, 3], "v": ["a", "b", "c"]})
    )
    updates = spark.createDataFrame(
        pd.DataFrame({"k": [2, 4], "v": ["B", "D"]})
    )
    out = {r["k"]: r["v"] for r in merge_upsert(base, updates, "k").collect()}
    assert out == {1: "a", 2: "B", 3: "c", 4: "D"}


def test_model_per_key_matches_builtin_regr(spark):
    ols = {r["c_mktsegment"]: r for r in model_per_key(spark, SF_SMALL).collect()}
    reg = {r["c_mktsegment"]: r for r in q_regression(spark, SF_SMALL).collect()}
    assert set(ols) == set(reg)
    for seg in ols:
        assert abs(ols[seg]["slope"] - reg[seg]["slope"]) < 1e-3
        assert ols[seg]["n"] == reg[seg]["n"]


def test_stream_stream_join_matches_batch(spark):
    streamed = {
        r["user_id"]: (r["n_pairs"], r["n_purchases_with_click"])
        for r in STREAM_QUERIES["stream_stream_join"](spark, SF_SMALL).collect()
    }
    ev = load_table(spark, SF_SMALL, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts"), F.col("event_id").alias("p_id")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"), F.col("event_id").alias("c_id")
    )
    batch = {
        r["user_id"]: (r["n_pairs"], r["n_purchases_with_click"])
        for r in (
            p.join(
                c,
                (F.col("p_user") == F.col("c_user"))
                & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
                & (F.col("c_ts") <= F.col("p_ts")),
            )
            .groupBy(F.col("p_user").alias("user_id"))
            .agg(
                F.count("*").alias("n_pairs"),
                F.countDistinct("p_id").alias("n_purchases_with_click"),
            )
            .collect()
        )
    }
    assert streamed == batch
