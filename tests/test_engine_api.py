"""AnalyticsEngine facade: one handle for tables, SQL, and the
named-operator registry."""

import pytest

from bfr_clustering_using_pyspark_spark.engine import AnalyticsEngine
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def eng(spark):
    return AnalyticsEngine(spark, SF_SMALL)


def test_tables_and_sql(eng):
    assert "lineitem" in eng.tables()
    n_df = eng.table("orders").count()
    n_sql = eng.sql("SELECT count(*) AS n FROM orders").collect()[0]["n"]
    assert n_df == n_sql > 0


def test_query_registry_roundtrip(eng):
    names = eng.queries()
    assert "q1_pricing_summary" in names and len(names) >= 90
    rows = eng.query("q1_pricing_summary").collect()
    assert rows and "sum_qty" in rows[0].asDict()


def test_unknown_names_raise(eng):
    with pytest.raises(KeyError):
        eng.table("nope")
    with pytest.raises(KeyError):
        eng.query("nope")
