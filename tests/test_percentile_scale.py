"""Percentile-family scale variants: the distributed-rank exact face
must equal the buffering exact face; the sketch faces must sit within
their documented error bounds."""

import pytest

from bfr_clustering_using_pyspark_spark.plans.events import (
    q_mad_outliers,
    q_mad_outliers_approx,
)
from bfr_clustering_using_pyspark_spark.plans.tpch_ext import (
    q_percentiles,
    q_percentiles_approx,
    q_percentiles_dist,
)
from tests.conftest import SF_SMALL, SF_LARGE


def _rows(df, key):
    return {r[key]: r.asDict() for r in df.collect()}


def _sf_large_or_skip():
    import os

    if not os.path.exists(f"{SF_LARGE}/lineitem.parquet"):
        pytest.skip(f"{SF_LARGE} testdata not present")
    return SF_LARGE


def test_percentiles_dist_equals_exact(spark):
    """Distributed rank + interpolation must reproduce percentile()
    to float tolerance (both are the same mathematical definition)."""
    for sf in (SF_SMALL,):
        exact = _rows(q_percentiles(spark, sf), "l_returnflag")
        dist = _rows(q_percentiles_dist(spark, sf), "l_returnflag")
        assert set(exact) == set(dist)
        for k in exact:
            assert exact[k]["n"] == dist[k]["n"]
            for c in ("p50", "p90", "p99"):
                assert abs(exact[k][c] - dist[k][c]) <= 1e-6, (k, c)


def test_percentiles_approx_error_bound(spark):
    """GK sketch at accuracy 10000: ≤1% relative value error vs the
    exact percentiles at sf0.1 (the documented bound)."""
    sf = _sf_large_or_skip()
    exact = _rows(q_percentiles(spark, sf), "l_returnflag")
    approx = _rows(q_percentiles_approx(spark, sf), "l_returnflag")
    assert set(exact) == set(approx)
    for k in exact:
        assert exact[k]["n"] == approx[k]["n"]
        for c in ("p50", "p90", "p99"):
            rel = abs(exact[k][c] - approx[k][c]) / abs(exact[k][c])
            assert rel <= 0.01, (k, c, rel)


def test_mad_outliers_dist_equals_exact(spark):
    """Distributed-rank MAD must reproduce the percentile() screen to
    float tolerance (same mathematical definition), including the
    derived cutoff and outlier counts."""
    from bfr_clustering_using_pyspark_spark.plans.events import q_mad_outliers_dist

    exact = _rows(q_mad_outliers(spark, SF_SMALL), "event_type")
    dist = _rows(q_mad_outliers_dist(spark, SF_SMALL), "event_type")
    assert set(exact) == set(dist)
    for k in exact:
        assert exact[k]["n_events"] == dist[k]["n_events"]
        assert exact[k]["n_outliers"] == dist[k]["n_outliers"]
        for c in ("med", "mad", "cutoff"):
            assert abs(exact[k][c] - dist[k][c]) <= 1e-6, (k, c)


def test_mad_outliers_approx_error_bound(spark):
    """Sketched MAD: med/mad within 1%, outlier count within 5% of
    the exact screen at sf0.1."""
    sf = _sf_large_or_skip()
    exact = _rows(q_mad_outliers(spark, sf), "event_type")
    approx = _rows(q_mad_outliers_approx(spark, sf), "event_type")
    assert set(exact) == set(approx)
    for k in exact:
        assert exact[k]["n_events"] == approx[k]["n_events"]
        for c in ("med", "mad"):
            rel = abs(exact[k][c] - approx[k][c]) / max(abs(exact[k][c]), 1e-9)
            assert rel <= 0.01, (k, c, rel)
        n_ex, n_ap = exact[k]["n_outliers"], approx[k]["n_outliers"]
        assert abs(n_ex - n_ap) <= max(5, 0.05 * max(n_ex, 1)), (k, n_ex, n_ap)
