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
