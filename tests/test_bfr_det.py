"""bfr_lloyd_det: the hash-gated deterministic chunked-BFR epoch must
match an independent numpy replay bit-for-bit, keep every point
exactly once, and actually exercise the Mahalanobis RETAIN path on
data that contains outliers (the driver corpus has none, so the gate
there is always-accept by design — see plans/ml_queries.py)."""

import os

import numpy as np
import pandas as pd
import pytest

from bfr_clustering_using_pyspark_spark.plans.ml_queries import (
    BDET_CHUNKS,
    BDET_EPS,
    BDET_INIT_ITERS,
    BDET_K,
    BDET_SCALE,
    BDET_THRESH,
    bfr_lloyd_det,
)
from tests.conftest import SF_SMALL

KD = 64


def _numpy_replay(ids, X):
    """Independent replay of the shipped semantics: farthest-point
    seeds (min vec_id first, argmax of min-distance, ties → smaller
    vec_id), BDET_INIT_ITERS Lloyd rounds on chunk 0, then per-chunk
    Mahalanobis-gated assignment with integer moment accumulation."""
    S = BDET_SCALE
    Xi = np.round(X * S).astype(np.int64)
    order = np.argsort(ids)
    ids, Xi = ids[order], Xi[order]
    chunk = ids % BDET_CHUNKS
    m0 = chunk == 0
    ids0, X0 = ids[m0], Xi[m0]

    seeds = [0]  # ids sorted ascending → index 0 is min vec_id
    for _ in range(BDET_K - 1):
        dmin = np.min(
            ((X0[:, None, :] / S - X0[None, seeds, :] / S) ** 2).sum(axis=2), axis=1
        )
        seeds.append(int(dmin.argmax()))  # first max = smaller vec_id

    cents = {j: X0[s] / S for j, s in enumerate(seeds)}
    for it in range(BDET_INIT_ITERS):
        keys = sorted(cents)
        C = np.stack([cents[c] for c in keys])
        d2 = ((X0[:, None, :] / S - C[None]) ** 2).sum(axis=2)
        a0 = np.array([keys[j] for j in d2.argmin(axis=1)])
        if it < BDET_INIT_ITERS - 1:
            cents = {}
            for c in np.unique(a0):
                m = a0 == c
                s = X0[m].sum(axis=0)
                cents[c] = np.array([int(v) / int(m.sum()) / S for v in s])

    mom = {}
    for c in np.unique(a0):
        m = a0 == c
        mom[c] = [
            int(m.sum()),
            [int(v) for v in X0[m].sum(axis=0)],
            [int(v) for v in (X0[m].astype(object) ** 2).sum(axis=0)],
        ]
    out = dict(zip(ids0.tolist(), a0.tolist()))
    for t in range(1, BDET_CHUNKS):
        keys = sorted(mom)
        mu = np.stack([np.array([s / mom[c][0] / S for s in mom[c][1]]) for c in keys])
        sg = np.stack(
            [
                np.array(
                    [
                        max(q / mom[c][0] / S / S - (s / mom[c][0] / S) ** 2, BDET_EPS)
                        for s, q in zip(mom[c][1], mom[c][2])
                    ]
                )
                for c in keys
            ]
        )
        mt = chunk == t
        Xt = Xi[mt]
        maha = (((Xt[:, None, :] / S - mu[None]) ** 2) / sg[None]).sum(axis=2)
        best = maha.argmin(axis=1)
        aT = np.where(maha.min(axis=1) <= BDET_THRESH, np.array(keys)[best], -1)
        for c in np.unique(aT[aT >= 0]):
            m = aT == c
            n, s, q = mom[c]
            mom[c] = [
                n + int(m.sum()),
                [a + int(b) for a, b in zip(s, Xt[m].sum(axis=0))],
                [a + int(b) for a, b in zip(q, (Xt[m].astype(object) ** 2).sum(axis=0))],
            ]
        out.update(zip(ids[mt].tolist(), aT.tolist()))
    return out


def test_matches_numpy_replay(spark):
    rows = (
        spark.read.parquet(f"{SF_SMALL}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    )
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([[float(v) for v in r["embedding"]] for r in rows])
    want = _numpy_replay(ids, X)
    got = {r["vec_id"]: r["cluster"] for r in bfr_lloyd_det(spark, SF_SMALL).collect()}
    assert got == want
    # every point exactly once, all DS clusters live on this corpus
    assert sorted(got) == sorted(ids.tolist())
    live = {c for c in got.values() if c >= 0}
    assert len(live) >= 2


def test_outliers_are_retained(spark, tmp_path):
    """Far-away points in later chunks must fail the α²·d gate and
    come back as cluster −1; inlier blob points must not."""
    rng = np.random.default_rng(7)
    n = 480
    ids = np.arange(n)
    X = rng.normal(0.0, 0.05, size=(n, KD))
    blob = (ids // BDET_CHUNKS) % BDET_K  # decorrelated from chunk=id%4
    for b in range(BDET_K):  # K well-separated tight blobs
        X[blob == b, b] += 2.0
    outlier_ids = [17, 53, 101]  # all with vec_id % 4 != 0 → gated chunks
    for o in outlier_ids:
        X[o] = 30.0  # ~600σ away from every blob
    pdf = pd.DataFrame(
        {
            "vec_id": ids,
            "embedding": [row.astype(np.float32).tolist() for row in X],
            "label": blob.astype(np.int32),
        }
    )
    d = tmp_path / "embeddings.parquet"
    pdf.to_parquet(d)
    got = {r["vec_id"]: r["cluster"] for r in bfr_lloyd_det(spark, str(tmp_path)).collect()}
    for o in outlier_ids:
        assert got[o] == -1, f"outlier {o} was not retained (got {got[o]})"
    inliers_retained = sum(
        1 for i, c in got.items() if c == -1 and i not in outlier_ids
    )
    # blob-aligned K: the gate accepts blob members (a handful of
    # boundary rejects tolerated — sample variance on a ~15-point
    # init cluster underestimates)
    assert inliers_retained <= n // 20
    # and the replay agrees on this corpus too (gate path included)
    assert got == _numpy_replay(ids, X)


@pytest.mark.skipif(
    not os.path.isdir("/root/testdata/sf0.01"), reason="testdata missing"
)
def test_chunks_partition_points(spark):
    df = bfr_lloyd_det(spark, "/root/testdata/sf0.01")
    n = df.count()
    assert df.select("vec_id").distinct().count() == n
    assert df.filter("cluster < -1 or cluster >= %d" % BDET_K).count() == 0
