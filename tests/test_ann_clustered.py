"""ANN recall on a CLUSTERED embedding fixture (r11, VERDICT item 4).

The package testdata embeddings are near-isotropic — NN-Descent's
documented worst case and nobody's production distribution. This
suite pins recall@5 floors on a 10-blob mixture-of-Gaussians corpus
(the BFR-generator shape), the regime real embedding corpora live in:

- nndescent graph:  measured 0.90 (isotropic floor: 0.60)
- graph search:     measured 0.78 with the r11 IVF-routed entries
                    (md5-random entries alone measured 0.36 here —
                    1-(1-1/k)^GS_ENTRIES cluster-hit probability —
                    vs 0.54 isotropic; routing fixes the clustered
                    regime without hurting the isotropic one)
- product quantization: measured 0.98 (isotropic floor: 0.60) —
  per-subspace codebooks collapse onto the blob structure
"""

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import bfr_clustering_using_pyspark_spark.operators.similarity as S


@pytest.fixture(scope="module")
def clustered_dir(tmp_path_factory):
    rng = np.random.default_rng(42)
    n, d, k = 500, 64, 10
    centers = rng.normal(size=(k, d))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    labels = rng.integers(0, k, n)
    X = centers[labels] + 0.15 * rng.normal(size=(n, d))
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    df = pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": [r.astype(np.float32) for r in X],
            "label": labels.astype(np.int32),
        }
    )
    dirp = tmp_path_factory.mktemp("clustered_emb")
    pq.write_table(
        pa.Table.from_pandas(df, preserve_index=False),
        os.path.join(str(dirp), "embeddings.parquet"),
    )
    return str(dirp)


def _nsets(rows, qcol="q_id", vcol="vec_id"):
    out = {}
    for r in rows:
        out.setdefault(r[qcol], set()).add(r[vcol])
    return out


@pytest.fixture(scope="module")
def truth(spark, clustered_dir):
    return _nsets(S.ann_bruteforce(spark, clustered_dir).collect())


def test_nndescent_clustered_recall(spark, clustered_dir, truth):
    g = {}
    for r in S.ann_nndescent_graph(spark, clustered_dir).collect():
        if r["rank"] <= S.TOP_K:
            g.setdefault(r["vec_id"], set()).add(r["nbr_id"])
    hits = sum(len(truth[q] & g.get(q, set())) for q in truth)
    total = sum(len(v) for v in truth.values())
    assert hits / total >= 0.8  # measured 0.90


def test_graph_search_clustered_recall(spark, clustered_dir, truth):
    t = {q: v for q, v in truth.items() if q in S.GS_QUERY_IDS}
    approx = _nsets(S.ann_graph_search(spark, clustered_dir).collect())
    hits = sum(len(t[q] & approx.get(q, set())) for q in t)
    assert hits / sum(len(v) for v in t.values()) >= 0.6  # measured 0.78


def test_pq_clustered_recall(spark, clustered_dir, truth):
    t = {q: v for q, v in truth.items() if q in S.PQ_QUERY_IDS}
    approx = _nsets(S.ann_pq(spark, clustered_dir).collect())
    hits = sum(len(t[q] & approx.get(q, set())) for q in t)
    assert hits / sum(len(v) for v in t.values()) >= 0.85  # measured 0.98


def test_recall_curve_monotone_and_bounded(spark):
    """The operating curve's contract: recall is non-decreasing in
    nprobe (probing more lists can only add candidates), bounded in
    [0, 1], and the truth denominator is constant across rows."""
    from tests.conftest import SF_SMALL

    rows = S.ann_recall_curve(spark, SF_SMALL).collect()
    assert [r["nprobe"] for r in rows] == list(S.RECALL_CURVE_NPROBES)
    assert len({r["n_truth"] for r in rows}) == 1
    recalls = [r["recall"] for r in rows]
    assert all(0.0 <= r <= 1.0 for r in recalls)
    assert recalls == sorted(recalls)
    assert all(r["n_hit"] <= r["n_truth"] for r in rows)
