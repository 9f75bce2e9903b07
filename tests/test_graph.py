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


def test_pagerank_partitioning_invariant(spark):
    """The fixed-point iteration must produce BIT-IDENTICAL ranks under
    different shuffle layouts — the property the old double-sum
    formulation could not guarantee (partition-order-dependent fp
    addition).  Integer partials merge exactly, so any drift here is a
    real defect, not noise."""
    results = []
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for parts in ("5", "13", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            rows = graph_pagerank(spark, SF_SMALL).collect()
            results.append([(r["node_id"], r["node_type"], r["rank"]) for r in rows])
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert results[0] == results[1] == results[2]


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


def test_label_prop_converges_on_planted_components(spark, tmp_path, duck=None):
    """Two disconnected cliques must end up in two communities, each
    labelled by its smallest node id (the deterministic tie-break)."""
    import pandas as pd

    from bfr_clustering_using_pyspark_spark.operators.graph import (
        _SUPP_OFFSET,
        graph_label_prop,
    )

    # orders/lineitem implying: customers {1,2} <-> suppliers {1,2}
    # and customers {10,11} <-> suppliers {10,11}, no cross edges
    orders, lineitem, ok = [], [], 0
    for custs, supps in ([(1, 2), (1, 2)], [(10, 11), (10, 11)]):
        for c in custs:
            ok += 1
            orders.append((ok, c))
            for s in supps:
                lineitem.append((ok, s))
    pd.DataFrame(orders, columns=["o_orderkey", "o_custkey"]).to_parquet(
        f"{tmp_path}/orders.parquet", index=False
    )
    pd.DataFrame(lineitem, columns=["l_orderkey", "l_suppkey"]).to_parquet(
        f"{tmp_path}/lineitem.parquet", index=False
    )
    rows = {r["community"]: (r["n_nodes"], r["n_customers"], r["n_suppliers"])
            for r in graph_label_prop(spark, str(tmp_path)).collect()}
    # odd iteration count on a bipartite graph: labels propagate from
    # the opposite side; communities keyed by each side's min node
    assert sum(n for n, _, _ in rows.values()) == 8
    # labels are node ids, so each community's label names its clique;
    # no mixing means each clique's communities sum to exactly its 4
    def clique(label):
        return 0 if (label in (1, 2) or label in (_SUPP_OFFSET + 1, _SUPP_OFFSET + 2)) else 1
    per_clique = {0: 0, 1: 0}
    for comm, (n, nc, ns) in rows.items():
        assert n == nc + ns
        per_clique[clique(comm)] += n
    assert per_clique == {0: 4, 1: 4}


def test_triangle_orientation_equivalence_on_hub_graph(spark):
    """Degree-ordering vs id-ordering must produce IDENTICAL per-node
    triangle counts (the orientation-invariance the r10 degree-order
    upgrade rests on), exercised on the adversarial shape for
    id-ordering: a low-id hub connected to everything (one supplier
    in 30%+ of orders), plus a ring among the spokes so triangles
    exist. Also pins the wedge bound: the degree-ordered hub emits
    no wedges from the hub pivot."""
    from bfr_clustering_using_pyspark_spark.operators.graph import _triangles_per_node

    # hub = node 0 joined to 1..60; spokes form a ring (i, i+1)
    hub_edges = [(0, i) for i in range(1, 61)] + [(i, i + 1) for i in range(1, 60)]
    edges = spark.createDataFrame(hub_edges, "a long, b long").localCheckpoint()
    by_deg = {
        (r["node"]): (r["degree"], r["n_tri"])
        for r in _triangles_per_node(edges, "degree").collect()
    }
    by_id = {
        (r["node"]): (r["degree"], r["n_tri"])
        for r in _triangles_per_node(edges, "id").collect()
    }
    assert by_deg == by_id
    # the ring closes 59 triangles through the hub
    assert by_deg[0] == (60, 59)


def test_cc_deep_graph_auto_switches_to_star(spark):
    """r11 VERDICT item 6: a component deeper than max_rounds must
    not return half-propagated labels — the non-convergence detector
    falls back to the large/small-star face and the output matches
    driver union-find exactly."""
    import pandas as pd

    from bfr_clustering_using_pyspark_spark.operators.dedup import (
        connected_components,
        uf_labels,
        uf_union,
    )

    n = 200  # chain diameter 200 >> max_rounds=4 below
    pdf = pd.DataFrame({"doc_a": range(n - 1), "doc_b": range(1, n)})
    pairs = spark.createDataFrame(pdf)
    got = {
        r[0]: r[1]
        for r in connected_components(pairs, max_rounds=4, small_gate=0).collect()
    }
    parent = {}
    for a, b in zip(pdf["doc_a"], pdf["doc_b"]):
        uf_union(parent, int(a), int(b))
    assert got == dict(uf_labels(parent))
    assert set(got.values()) == {0}
