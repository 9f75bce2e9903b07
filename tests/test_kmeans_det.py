"""kmeans_lloyd_det: the hash-gated deterministic Lloyd's face must
actually CLUSTER (SSE improves over the mod-K init), be exactly
reproducible, and agree with an independent numpy replay."""

import numpy as np

from bfr_clustering_using_pyspark_spark.plans.ml_queries import (
    KDET_ITERS,
    KDET_K,
    KDET_SCALE,
    kmeans_lloyd_det,
)
from tests.conftest import SF_SMALL


def _data(spark):
    rows = (
        spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([[float(v) for v in r["embedding"]] for r in rows])
    order = np.argsort(ids)
    return ids[order], X[order]


def _numpy_replay(ids, X):
    """Bit-exact replay of the shipped algorithm: micro-unit integer
    sums, s/n/SCALE centroids, sequential-fold distances."""
    Xi = np.round(X * KDET_SCALE).astype(np.int64)
    assign = (ids % KDET_K).astype(int)
    for _ in range(KDET_ITERS):
        cents = {}
        for c in np.unique(assign):
            m = assign == c
            s = Xi[m].sum(axis=0)
            n = int(m.sum())
            cents[c] = np.array([int(v) / n / KDET_SCALE for v in s])
        keys = sorted(cents)
        C = np.stack([cents[c] for c in keys])
        d2 = ((Xi[:, None, :] / KDET_SCALE - C[None, :, :]) ** 2).sum(axis=2)
        assign = np.array([keys[j] for j in d2.argmin(axis=1)])
    return assign


def _sse(X, assign):
    tot = 0.0
    for c in np.unique(assign):
        m = assign == c
        tot += ((X[m] - X[m].mean(axis=0)) ** 2).sum()
    return tot


def test_matches_numpy_replay_and_improves_sse(spark):
    ids, X = _data(spark)
    got = {r["vec_id"]: r["cluster"] for r in kmeans_lloyd_det(spark, SF_SMALL).collect()}
    want = dict(zip(ids.tolist(), _numpy_replay(ids, X).tolist()))
    assert got == want
    assign = np.array([got[i] for i in ids])
    init = (ids % KDET_K).astype(int)
    # Lloyd's must strictly improve within-cluster SSE over the
    # arbitrary mod-K init on any non-degenerate data
    assert _sse(X, assign) < _sse(X, init)
    assert set(np.unique(assign)) <= set(range(KDET_K))


def test_deterministic_across_runs(spark):
    a = {tuple(r) for r in kmeans_lloyd_det(spark, SF_SMALL).collect()}
    b = {tuple(r) for r in kmeans_lloyd_det(spark, SF_SMALL).collect()}
    assert a == b
