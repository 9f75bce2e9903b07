"""BFR edge cases: single chunk, empty mid-stream chunk, duplicate
points, tiny d."""

import numpy as np
import pandas as pd

from bfr_clustering_using_pyspark_spark.ml import BFR, BFRConfig
from tests.test_ml import make_blobs, to_df


def test_single_chunk(spark):
    X, y = make_blobs(n=800, k=3, d=4)
    bfr = BFR(BFRConfig(n_clusters=3, n_chunks=1))
    out = bfr.fit(to_df(spark, X, y))
    assert out.count() == 800
    assert len(bfr.round_stats) == 1


def test_empty_middle_chunk(spark):
    # ids leave a hole so one range-chunk is empty
    X, y = make_blobs(n=600, k=3, d=4)
    ids = np.concatenate([np.arange(300), np.arange(900, 1200)])
    pdf = pd.DataFrame({"id": ids, "features": list(X), "label": y})
    pts = spark.createDataFrame(pdf)
    bfr = BFR(BFRConfig(n_clusters=3, n_chunks=4))
    out = bfr.fit(pts)
    assert out.count() == 600


def test_duplicate_points(spark):
    X, y = make_blobs(n=200, k=2, d=4)
    X = np.repeat(X, 3, axis=0)
    y = np.repeat(y, 3)
    bfr = BFR(BFRConfig(n_clusters=2, n_chunks=2))
    out = bfr.fit(to_df(spark, X, y))
    assert out.count() == 600


def test_use_cs_false_path(spark):
    """CS machinery disabled: RS overflow must not compress; points
    still assigned exactly once."""
    X, y = make_blobs(n=2000, k=4, d=6, outliers=30)
    perm = np.random.default_rng(8).permutation(len(X))
    bfr = BFR(BFRConfig(n_clusters=4, n_chunks=3, rs_max=5, use_cs=False))
    out = bfr.fit(to_df(spark, X[perm], y[perm])).toPandas()
    assert len(out) == len(X)
    assert out["id"].nunique() == len(X)
    stats = bfr.intermediate_stats()
    assert (stats["nof_cluster_compression"] == 0).all()


def test_each_point_assigned_exactly_once(spark):
    X, y = make_blobs(n=2000, k=5, d=8, outliers=20)
    perm = np.random.default_rng(2).permutation(len(X))
    bfr = BFR(BFRConfig(n_clusters=5, n_chunks=3, rs_max=8))
    out = bfr.fit(to_df(spark, X[perm], y[perm])).toPandas()
    assert len(out) == len(X)
    assert out["id"].nunique() == len(X)
