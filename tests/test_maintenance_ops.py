"""sink_compact_small_files and q_join_strategies: the physical
claims behind the hash-gated outputs — files really compact, hints
really select their join strategies."""

import glob
import shutil
import tempfile

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def test_compaction_reduces_file_count(spark):
    from bfr_clustering_using_pyspark_spark.operators.formats import (
        COMPACT_SMALL,
        COMPACT_TARGET,
    )
    from bfr_clustering_using_pyspark_spark.sources.readers import load_table

    docs = load_table(spark, SF_SMALL, "documents")
    out = tempfile.mkdtemp(prefix="compact_test_")
    try:
        docs.repartition(COMPACT_SMALL).write.mode("overwrite").parquet(f"{out}/small")
        n_small = len(glob.glob(f"{out}/small/part-*"))
        spark.read.parquet(f"{out}/small").repartition(COMPACT_TARGET).write.mode(
            "overwrite"
        ).parquet(f"{out}/big")
        n_big = len(glob.glob(f"{out}/big/part-*"))
        assert n_small == COMPACT_SMALL
        assert n_big <= COMPACT_TARGET
        # row fidelity through the two rewrites
        assert spark.read.parquet(f"{out}/big").count() == docs.count()
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_join_hints_select_their_strategies(spark):
    """Each hinted branch must carry its physical join operator."""
    from bfr_clustering_using_pyspark_spark.sources.readers import load_table

    orders = load_table(spark, SF_SMALL, "orders")
    customer = load_table(spark, SF_SMALL, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    want = {
        "broadcast": "BroadcastHashJoin",
        "merge": "SortMergeJoin",
        "shuffle_hash": "ShuffledHashJoin",
    }
    for strat, node in want.items():
        j = orders.join(customer.hint(strat), orders.o_custkey == customer.c_custkey)
        plan = j._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
        )
        assert node in plan, (strat, plan)


def test_join_strategies_rows_identical(spark):
    from bfr_clustering_using_pyspark_spark.plans.tpch_ext import q_join_strategies

    rows = q_join_strategies(spark, SF_SMALL).collect()
    assert len(rows) == 3
    vals = {(r["n_rows"], r["total_cents"], r["n_segments"]) for r in rows}
    assert len(vals) == 1  # all strategies agree exactly


def test_skew_join_aqe_split_fires(spark):
    """Under aggressive skew thresholds, AQE must split the hot
    partition (executed plan carries the skew marker) and the result
    must equal the unsplit run bit-for-bit."""
    from bfr_clustering_using_pyspark_spark.plans.events import q_skew_join

    confs = {
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "2KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        # the post-join aggregation means the split adds a shuffle,
        # which AQE declines by default — force it (the production
        # knob for exactly this join-then-aggregate shape)
        "spark.sql.adaptive.forceOptimizeSkewedJoin": "true",
    }
    old = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        df = q_skew_join(spark, SF_SMALL)
        rows_split = [tuple(r) for r in df.collect()]
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:4000]
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    rows_plain = [tuple(r) for r in q_skew_join(spark, SF_SMALL).collect()]
    assert rows_split == rows_plain


def test_pandas_udf_matches_jvm_builtins(spark):
    """The scalar @pandas_udf face must be row-identical to the
    pure-JVM formulation — the exchangeability proof behind 'use
    built-ins unless you need a library call'."""
    from pyspark.sql import functions as F

    from bfr_clustering_using_pyspark_spark.operators.textstats import (
        udf_pandas_scalar,
    )
    from bfr_clustering_using_pyspark_spark.sources.readers import load_table

    got = {r["doc_id"]: (r["n_ws_tokens"], r["n_letters"])
           for r in udf_pandas_scalar(spark, SF_SMALL).collect()}
    docs = load_table(spark, SF_SMALL, "documents")
    want = {
        r["doc_id"]: (r["a"], r["b"])
        for r in docs.select(
            "doc_id",
            F.size(F.split("text", " ")).alias("a"),
            F.size(F.regexp_extract_all("text", F.lit("[A-Za-z]"), 0)).alias("b"),
        ).collect()
    }
    assert got == want


def test_observed_metrics_consistent_with_result(spark):
    """df.observe metrics must equal the aggregate's own totals —
    telemetry from the same single execution."""
    from bfr_clustering_using_pyspark_spark.plans.tpch_ext import q_observed_metrics

    rows = q_observed_metrics(spark, SF_SMALL).collect()
    obs = q_observed_metrics.last_observation.get
    assert obs["rows_seen"] == sum(r["n"] for r in rows)
    assert obs["cents_seen"] == sum(r["total_cents"] for r in rows)
    assert obs["null_prios"] == 0
