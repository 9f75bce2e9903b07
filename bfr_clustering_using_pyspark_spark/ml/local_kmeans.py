"""Driver-local vectorized k-means for SMALL point sets.

This is the analogue of the reference's ``HCluster``
(``/root/reference/code/bfr.py:13-103``): farthest-point
(k-means++-flavored) init + Lloyd iterations. The reference runs it
over every chunk on the driver; here it is only ever applied to
bounded sets (the retained-set pool and init samples — capped by
config), so driver memory stays O(sample), never O(dataset).

Implementation is NumPy-vectorized (the reference is pure-Python
loops); semantics match: farthest-point init from a seeded first
pick, Lloyd with empty-cluster carry-over.
"""

from __future__ import annotations

import numpy as np


class LocalKMeans:
    def __init__(self, n_clusters: int, n_iterations: int = 5, seed: int = 42):
        self.k = n_clusters
        self.n_iterations = n_iterations
        self.seed = seed
        self.centers: np.ndarray | None = None
        self.labels: np.ndarray | None = None

    def _init_centers(self, points: np.ndarray) -> np.ndarray:
        """Farthest-point init (ref ``HCluster.get_centroids``,
        bfr.py:18-40): first center random, each next center is the
        point maximizing its distance to the nearest chosen center."""
        rng = np.random.default_rng(self.seed)
        n = len(points)
        k = min(self.k, n)
        centers = np.empty((k, points.shape[1]), dtype=np.float64)
        centers[0] = points[rng.integers(n)]
        # min squared distance to any chosen center, updated incrementally
        d2 = ((points - centers[0]) ** 2).sum(axis=1)
        for i in range(1, k):
            centers[i] = points[int(np.argmax(d2))]
            d2 = np.minimum(d2, ((points - centers[i]) ** 2).sum(axis=1))
        return centers

    def fit(self, points: np.ndarray) -> "LocalKMeans":
        points = np.asarray(points, dtype=np.float64)
        centers = self._init_centers(points)
        k = len(centers)
        labels = np.zeros(len(points), dtype=np.int64)
        for _ in range(self.n_iterations):
            # pairwise squared distances via (x-c)^2 = x^2 - 2xc + c^2
            d2 = (
                (points**2).sum(axis=1)[:, None]
                - 2.0 * points @ centers.T
                + (centers**2).sum(axis=1)[None, :]
            )
            labels = d2.argmin(axis=1)
            for c in range(k):
                mask = labels == c
                if mask.any():
                    centers[c] = points[mask].mean(axis=0)
                # empty cluster: keep previous center (ref
                # update_centroids, bfr.py:50-53)
        self.centers = centers
        self.labels = labels
        return self
