"""User-facing engine facade: one object that exposes the whole
surface — tables, ad-hoc SQL, and the named operator registry — the
way a user of the reference repo would drive this one.

>>> eng = AnalyticsEngine(spark, "/root/testdata/sf0.01")
>>> eng.tables()                      # available views
>>> eng.table("lineitem")             # DataFrame
>>> eng.sql("SELECT count(*) FROM orders")
>>> eng.queries()                     # every named operator
>>> eng.query("q1_pricing_summary")   # run one by name
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .sources.readers import TABLES, load_table, register_views


class AnalyticsEngine:
    """Session + dataset handle. Registers the dataset's tables as
    temp views once, then serves DataFrames from either the SQL
    front-end or the named-operator registry (both compile to the
    same Catalyst plans — see tests/test_sql_api.py)."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = spark
        self.sf_dir = sf_dir
        register_views(spark, sf_dir)

    def tables(self) -> tuple[str, ...]:
        return TABLES

    def table(self, name: str) -> DataFrame:
        if name not in TABLES:
            raise KeyError(f"unknown table {name!r}; available: {TABLES}")
        return load_table(self.spark, self.sf_dir, name)

    def sql(self, query: str) -> DataFrame:
        return self.spark.sql(query)

    def queries(self) -> list[str]:
        from .plans import all_queries

        return list(all_queries())

    def query(self, name: str) -> DataFrame:
        from .plans import all_queries

        registry = all_queries()
        if name not in registry:
            raise KeyError(f"unknown query {name!r}; see .queries()")
        return registry[name](self.spark, self.sf_dir)
