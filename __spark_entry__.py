"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` maps every implemented operator from SURVEY.md §2 to a
(spark, sf_dir) -> DataFrame callable; ``oracle_sql()`` provides the
DuckDB-equivalent SQL for the hash-match correctness gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: TPC-H-shape pricing summary at sf0.001."""
    from bfr_clustering_using_pyspark_spark.plans.tpch import q1_pricing_summary

    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from bfr_clustering_using_pyspark_spark.plans import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from bfr_clustering_using_pyspark_spark.plans import all_oracles

    return all_oracles()
