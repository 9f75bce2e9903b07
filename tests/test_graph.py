"""PageRank semantic properties (the oracle gate covers values)."""

from bfr_clustering_using_pyspark_spark.operators.graph import _edges, graph_pagerank
from tests.conftest import SF_SMALL


def test_pagerank_top20_properties(spark):
    rows = graph_pagerank(spark, SF_SMALL).collect()
    assert len(rows) == 20
    ranks = [r["rank"] for r in rows]
    assert ranks == sorted(ranks, reverse=True)
    assert all(r > 0 for r in ranks)
    # suppliers aggregate many customers' edges -> they dominate the top
    assert sum(1 for r in rows if r["node_type"] == "supplier") >= 10


def test_pagerank_mass_conserved(spark):
    """Symmetrized graph has no dangling nodes, so total rank mass
    stays 1 through damped iterations."""
    from pyspark.sql import functions as F

    edges = _edges(spark, SF_SMALL)
    n = edges.select("src").distinct().count()
    assert n > 0
    # one iteration of the same update must preserve sum(rank) = 1
    out_w = edges.groupBy("src").agg(F.sum("w").alias("out_w"))
    trans = edges.join(out_w, "src").select("src", "dst", (F.col("w") / F.col("out_w")).alias("p"))
    nodes = edges.select(F.col("src").alias("node")).distinct()
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    contrib = (
        trans.join(ranks, trans.src == ranks.node)
        .groupBy(F.col("dst").alias("node"))
        .agg(F.sum(F.col("p") * F.col("rank")).alias("inflow"))
    )
    new_ranks = nodes.join(contrib, "node", "left").select(
        ((1.0 - 0.85) / n + 0.85 * F.coalesce("inflow", F.lit(0.0))).alias("rank")
    )
    total = new_ranks.agg(F.sum("rank")).collect()[0][0]
    assert abs(total - 1.0) < 1e-9


def test_triangles_invariants(spark):
    """Every triangle participant's degree must be ≥ 2, and triangle
    participation is bounded by C(degree, 2) (a node can't be in
    more triangles than pairs of its neighbors)."""
    from bfr_clustering_using_pyspark_spark.operators.graph import graph_triangles
    from tests.conftest import SF_MED

    # sf0.001's thresholded graph has 5 edges and no triangles —
    # the co-occurrence structure only emerges at sf0.01+
    rows = graph_triangles(spark, SF_MED).collect()
    assert rows
    for r in rows:
        assert r["degree"] >= 2
        assert 1 <= r["n_tri"] <= r["degree"] * (r["degree"] - 1) // 2
    # top-20 is sorted by participation
    tris = [r["n_tri"] for r in rows]
    assert tris == sorted(tris, reverse=True)
