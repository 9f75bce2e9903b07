"""SQL front-end parity: for oracle strings in the Spark-compatible
ANSI subset, running them through ``spark.sql`` over registered views
must produce byte-identical results to the DataFrame plans — the
engine serves both APIs from the same Catalyst plans."""

import pytest

from bfr_clustering_using_pyspark_spark.sources.readers import register_views
from tests.conftest import SF_SMALL
from tools.check_correctness import table_hash

# oracle strings that are valid in BOTH DuckDB and Spark SQL
SPARK_COMPATIBLE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q6_forecast_revenue",
    "q_top_customers",
    "q_order_priority",
    "q_part_pivot",
    "q_rollup",
    "q10_returned_items",
    "q12_shipmode",
    "q14_promo_revenue",
    "q16_supplier_cnt",
    "q18_large_orders",
    "q19_disjunctive",
    "q_cube",
    "q_outer_join",
    "q_moving_avg",
    "q_running_total",
    "q_events_funnel",
    "q_salted_agg",
]


@pytest.fixture(scope="module")
def views(spark):
    register_views(spark, SF_SMALL)
    return spark


@pytest.mark.parametrize("name", SPARK_COMPATIBLE)
def test_sql_api_matches_dataframe_api(views, name):
    import __spark_entry__ as m

    spark = views
    df_plan = m.queries()[name](spark, SF_SMALL)
    sql_plan = spark.sql(m.oracle_sql()[name])
    drows = [tuple(r) for r in df_plan.collect()]
    srows = [tuple(r) for r in sql_plan.collect()]
    assert len(drows) == len(srows)
    assert table_hash(df_plan.columns, drows) == table_hash(sql_plan.columns, srows)
