"""Reference-parity CLI: chunked indexed-CSV in, JSON cluster map +
intermediate CSV out (reference sh_commands / Runner contract)."""

import csv
import json

import numpy as np

from bfr_clustering_using_pyspark_spark import cli


def test_cli_end_to_end(spark, tmp_path):
    rng = np.random.default_rng(11)
    k, d, n = 4, 6, 1200
    centers = rng.normal(0, 12, (k, d))
    labels = rng.integers(0, k, n)
    X = centers[labels] + rng.normal(0, 0.4, (n, d))
    indir = tmp_path / "chunks"
    indir.mkdir()
    per = n // 2
    for ci in range(2):
        with open(indir / f"chunk_{ci}.txt", "w") as f:
            for i in range(ci * per, (ci + 1) * per):
                f.write(f"{i}," + ",".join(f"{v:.6f}" for v in X[i]) + "\n")

    clust_out = tmp_path / "clust.json"
    int_out = tmp_path / "int.csv"
    cli.run(str(indir), k, str(clust_out), str(int_out))

    with open(clust_out) as f:
        m = json.load(f)
    assert len(m) == n
    assert set(map(int, m.values())) <= set(range(-1, k))

    with open(int_out) as f:
        rows = list(csv.reader(f))
    # reference intermediate header, bfr.py:197-198
    assert rows[0] == [
        "round_id",
        "nof_cluster_discard",
        "nof_point_discard",
        "nof_cluster_compression",
        "nof_point_compression",
        "nof_point_retained",
    ]
    assert len(rows) == 3  # header + one row per chunk
