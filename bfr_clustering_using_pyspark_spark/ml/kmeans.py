"""Distributed k-means, two flavors.

``mllib_kmeans`` — the Spark-first default: delegate to MLlib's
KMeans (k-means|| init, DataFrame-native, JVM execution). This is
what replaces the reference's driver-side ``HCluster`` whenever the
point set is distributed.

``dataframe_kmeans`` — an explicit DataFrame-native Lloyd's loop with
broadcast centers and map-side partial aggregation. Exists to (a)
mirror the reference's algorithm exactly (farthest-point init,
fixed iteration count) and (b) demonstrate the scale pattern used by
BFR: per-iteration shuffle volume is O(num_batches × k × d),
independent of n.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mllib_kmeans(points: DataFrame, k: int, max_iter: int = 20, seed: int = 42,
                 features_col: str = "features",
                 n_seeds: int = 1) -> tuple[DataFrame, np.ndarray]:
    """MLlib KMeans over (id, features array<double>).

    ``n_seeds`` mirrors sklearn's ``n_init`` (and the reference's
    ``num_seeds = 10`` restart loop, /root/reference/code/
    test_sklearn.py:16): fit once per seed ``seed+i`` and keep the
    run with the lowest within-cluster SSE (``summary.trainingCost``
    — the reference's ``get_inertia``, test_sklearn.py:50). Ties →
    the lower seed, so the selection is deterministic.

    Returns (assignments DataFrame (id, cluster), centers ndarray).
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    # Pin the vectorized input with an EAGER localCheckpoint, not
    # persist(): MLlib's Lloyd loop takes max_iter passes over the
    # input (plus the k-means|| init rounds), so an unpinned frame
    # re-runs the parquet scan + array→vector conversion on every one
    # (guide §5 — 5.0 s → 2.2 s at sf0.1, r15). But a persist() is
    # WORSE than the checkpoint: MLlib skips caching its internal
    # (vector, norm) RDD when the input reports a storage level, so
    # every pass still decoded cached rows back into vectors —
    # measured min-of-3 at sf0.1: persist 1.98 s, no cache 1.59 s,
    # eager localCheckpoint 1.41 s, bit-identical centers (this was
    # the one confirmed r15 bench regression). The checkpoint blocks
    # are freed by the ContextCleaner when the frame goes out of
    # scope; durability is not needed inside one fit call.
    vecs = points.withColumn("_vec", array_to_vector(F.col(features_col))).localCheckpoint(
        eager=True
    )
    best_model, best_cost = None, None
    for i in range(max(n_seeds, 1)):
        model = KMeans(
            k=k, maxIter=max_iter, seed=seed + i, featuresCol="_vec", predictionCol="cluster"
        ).fit(vecs)
        cost = model.summary.trainingCost
        if best_cost is None or cost < best_cost:
            best_model, best_cost = model, cost
    assigned = best_model.transform(vecs).select("id", "cluster")
    centers = np.array(best_model.clusterCenters())
    # materialize the winner before vecs goes out of scope — the
    # returned frame must not re-run the fit lineage when the caller
    # finally collects (ADVICE r13)
    assigned = assigned.localCheckpoint(eager=True)
    return assigned, centers


def get_inertia(points: DataFrame, centers: np.ndarray,
                features_col: str = "features") -> float:
    """Within-cluster SSE of ``points`` against ``centers`` —
    distributed parity of reference ``get_inertia``
    (/root/reference/code/test_sklearn.py:50). One Arrow-batched
    mapInPandas pass emitting ONE partial sum per batch; the driver
    collect is O(num_batches)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c = centers
        c_sq = (c**2).sum(axis=1)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            pts = np.stack(pdf[features_col].to_numpy())
            d2 = (pts**2).sum(axis=1)[:, None] - 2.0 * pts @ c.T + c_sq[None, :]
            yield pd.DataFrame({"sse": [float(np.maximum(d2.min(axis=1), 0.0).sum())]})

    partials = points.select(features_col).mapInPandas(fn, schema="sse double")
    row = partials.agg(F.sum("sse").alias("sse")).head()
    return float(row["sse"] or 0.0)


def _assign_and_partials(centers: np.ndarray):
    """mapInPandas kernel: for each Arrow batch, assign points to the
    nearest broadcast center and emit ONE partial row per touched
    cluster: (cluster, n, sums). Map-side combine by construction."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c = centers
        c_sq = (c**2).sum(axis=1)
        for pdf in batches:
            pts = np.stack(pdf["features"].to_numpy())
            d2 = (pts**2).sum(axis=1)[:, None] - 2.0 * pts @ c.T + c_sq[None, :]
            labels = d2.argmin(axis=1)
            uniq = np.unique(labels)
            rows = {
                "cluster": uniq.astype(np.int64),
                "n": np.array([(labels == u).sum() for u in uniq], dtype=np.int64),
                "sums": [pts[labels == u].sum(axis=0).tolist() for u in uniq],
            }
            yield pd.DataFrame(rows)

    return fn


def dataframe_kmeans(points: DataFrame, k: int, n_iterations: int = 5, seed: int = 42,
                     sample_cap: int = 100_000,
                     n_seeds: int = 1) -> tuple[DataFrame, np.ndarray]:
    """DataFrame-native Lloyd's with the reference's semantics
    (farthest-point init — ref bfr.py:18-40; fixed iterations with
    empty-cluster carry-over — ref bfr.py:60-90).

    ``n_seeds > 1`` restarts the whole fit with seeds ``seed+i`` and
    keeps the run with the lowest inertia (reference restart loop,
    test_sklearn.py:16/:50; ties → lower seed — deterministic).

    Init runs on a driver-side sample capped at ``sample_cap``;
    iterations are fully distributed: broadcast centers → one
    mapInPandas pass emitting per-batch partial sums → tiny collect
    (num_batches × k rows) → NumPy center update.
    """
    if n_seeds > 1:
        cached = points.persist()
        best = None
        for i in range(n_seeds):
            assigned, centers = dataframe_kmeans(
                cached, k, n_iterations=n_iterations, seed=seed + i,
                sample_cap=sample_cap, n_seeds=1,
            )
            sse = get_inertia(cached, centers)
            if best is None or sse < best[0]:
                best = (sse, assigned, centers)
        # materialize the winning assignments while the input is still
        # cached — the lazy mapInPandas would otherwise replay the
        # whole lineage post-unpersist (ADVICE r13)
        winner = best[1].localCheckpoint(eager=True)
        cached.unpersist()
        return winner, best[2]

    from .local_kmeans import LocalKMeans

    spark = points.sparkSession
    n_total = points.count()
    frac = min(1.0, sample_cap / max(n_total, 1))
    sample = np.stack(
        points.sample(fraction=frac, seed=seed).select("features").toPandas()["features"].to_numpy()
    )
    centers = LocalKMeans(k, n_iterations=1, seed=seed).fit(sample).centers

    partial_schema = "cluster long, n long, sums array<double>"
    for _ in range(n_iterations):
        partials = points.select("features").mapInPandas(
            _assign_and_partials(centers), schema=partial_schema
        ).toPandas()
        agg = partials.groupby("cluster")
        new_centers = centers.copy()
        for cluster, grp in agg:
            total_n = grp["n"].sum()
            if total_n > 0:
                new_centers[int(cluster)] = np.sum(np.stack(grp["sums"].to_numpy()), axis=0) / total_n
        centers = new_centers

    final_centers = centers

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        c_sq = (final_centers**2).sum(axis=1)
        for pdf in batches:
            pts = np.stack(pdf["features"].to_numpy())
            d2 = (pts**2).sum(axis=1)[:, None] - 2.0 * pts @ final_centers.T + c_sq[None, :]
            yield pd.DataFrame({"id": pdf["id"], "cluster": d2.argmin(axis=1).astype(np.int64)})

    assigned = points.select("id", "features").mapInPandas(assign, schema="id long, cluster long")
    return assigned, centers
