"""The grouped merge_asof formulation must agree with the
union+window formulation (two engine paths, one semantics)."""

from bfr_clustering_using_pyspark_spark.plans.tpch import q_asof_join
from bfr_clustering_using_pyspark_spark.plans.tpch_ext import q_asof_grouped
from tests.conftest import SF_SMALL


def test_asof_grouped_matches_window_formulation(spark):
    grouped = {
        r["user_id"]: (r["n_purchases"], r["n_with_quote"])
        for r in q_asof_grouped(spark, SF_SMALL).collect()
    }
    window_rows = q_asof_join(spark, SF_SMALL).collect()
    window = {}
    for r in window_rows:
        n, w = window.get(r["user_id"], (0, 0))
        window[r["user_id"]] = (n + 1, w + (1 if r["quote_event_id"] is not None else 0))
    assert grouped == window
