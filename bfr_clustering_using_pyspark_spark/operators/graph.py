"""Graph operators over relational data.

``graph_pagerank`` runs weighted PageRank on the customer↔supplier
interaction graph implied by the fact tables (edge weight = number of
lineitems customer c bought from supplier s; reverse edges added so
rank flows both ways — the standard symmetrization for a bipartite
interaction graph).

Scale design: one shuffle per iteration (join ranks→edges on src,
re-aggregate on dst), which is exactly GraphX/Pregel's cost model
expressed in DataFrames. Each iteration ends in
``localCheckpoint(eager=True)`` — without lineage truncation the
self-referencing plan doubles per iteration and Catalyst analysis
goes exponential (same lesson as ``connected_components``). Fixed
iteration count keeps the op deterministic and lets the DuckDB
oracle UNROLL the same iterations as chained CTEs — a hash-gated
iterative algorithm, not rows-only."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.tuning import scoped_shuffle_width, sized_width
from ..sources.readers import load_table

# damping 0.85 carried as the exact rational 17/20 so the iteration can
# run in integer arithmetic (see graph_pagerank)
DAMP_NUM, DAMP_DEN = 17, 20
N_ITER = 5
_SUPP_OFFSET = 1_000_000  # supplier node ids = s_suppkey + offset
# fixed-point scales: rank in units of 1e-12, transition prob in units
# of 1e-6.  Bound: a node's inflow sum Σ p_q·rank_q ≤ P_SCALE·R_SCALE
# = 1e18 < int64 max (total rank mass ≤ 1), at ANY node/edge count —
# the per-product and per-sum headroom is n-independent.
R_SCALE = 10**12
P_SCALE = 10**6
# broadcast the O(nodes) side of graph-iteration joins below this
# node count (a 1M-row (node, long) frame is tens of MB serialized
# — safe on a default driver); hash-partitioned joins beyond it
GRAPH_BCAST_NODES = 1_000_000


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    fwd = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + _SUPP_OFFSET).alias("dst"),
        )
        .agg(F.count("*").alias("w"))
    )
    rev = fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    return fwd.union(rev)


def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 nodes by weighted PageRank after 5 damped iterations.
    Returns (node_id, node_type, rank).

    Numeric determinism: all iteration state is FIXED-POINT int64 —
    rank in 1e-12 units, transition probabilities floored to 1e-6
    units, damping applied as the exact rational 17/20 with integer
    floor-division.  Integer partials merge exactly under any
    partitioning / executor count, so the result (and its hash) is
    invariant to shuffle layout — the same doctrine as
    ``kmeans_lloyd_det`` / ``pca_power_det``; the double-sum
    formulation this replaces was partition-order-dependent in the
    last ulp.  The DuckDB oracle unrolls the identical integer
    recurrence, so this stays a hash-gated iterative algorithm."""
    edges = _edges(spark, sf_dir).localCheckpoint(eager=True)
    # per-src outflow doubles as the NODE table: distinct(src) is
    # exactly out_w's key set (and the graph is symmetrized, so that
    # is every node) — one grouped pass replaces the former separate
    # distinct+checkpoint job over the edge list (guide §2.4: two
    # operations keyed the same way share one exchange)
    out_w = edges.groupBy("src").agg(F.sum("w").alias("out_w")).localCheckpoint(eager=True)
    n_nodes = out_w.count()
    # the edge build above ran at deployment width (it scans the fact
    # tables); the ITERATION only ever shuffles O(edges) rows, so size
    # its width to the materialized edge count.  Safe because every
    # round executes inside the swap via eager localCheckpoint.
    n_edges = edges.count()
    r0 = R_SCALE // n_nodes  # initial rank, 1e-12 units
    base = ((DAMP_DEN - DAMP_NUM) * R_SCALE) // (DAMP_DEN * n_nodes)  # (1-d)/n
    with scoped_shuffle_width(spark, sized_width(spark, n_edges)):
        # transition weight: fraction of src's outflow carried by this
        # edge, floored to 1e-6 units (exact integer division)
        trans = (
            edges.join(out_w, "src")
            .select("src", "dst", F.expr(f"(w * {P_SCALE}) DIV out_w").alias("p_q"))
            .localCheckpoint(eager=True)
        )
        ranks = out_w.select(F.col("src").alias("node"), F.lit(r0).alias("rank_q"))
        # rank/contrib frames are O(nodes); when that side is small
        # enough to broadcast (counted above — a customer/supplier
        # graph has nodes << edges), each iteration becomes a
        # map-side join + one partial-aggregated shuffle of O(edges)
        # contributions instead of re-shuffling the pinned transition
        # table every round. Beyond the gate both joins fall back to
        # hash-partitioned — the default scale path; the integer math
        # is identical either way. Gate sized for the broadcast's
        # DRIVER cost: 1M (node, rank) rows ≈ tens of MB serialized,
        # well inside a default driver heap.
        maybe_b = F.broadcast if n_nodes <= GRAPH_BCAST_NODES else (lambda df: df)
        for _ in range(N_ITER):
            # every node has outgoing AND incoming edges here
            # (symmetrized graph: distinct(src) == distinct(dst)), so
            # (a) no dangling-mass term is needed and (b) the grouped
            # inflow below already carries EVERY node — the former
            # nodes-side left join per iteration was a no-op re-keying
            # of the same row set and is removed (guide §2.4: one
            # join+shuffle per iteration, not two joins).  Descale the
            # inflow first (÷P_SCALE) so the ×DAMP_NUM product stays
            # well inside int64.
            ranks = (
                trans.join(maybe_b(ranks), trans.src == ranks.node)
                .groupBy(F.col("dst").alias("node"))
                .agg(F.sum(F.col("p_q") * F.col("rank_q")).alias("inflow_q2"))
                .select(
                    "node",
                    (
                        F.lit(base)
                        + F.expr(f"({DAMP_NUM} * (inflow_q2 DIV {P_SCALE})) DIV {DAMP_DEN}")
                    ).alias("rank_q"),
                )
                .localCheckpoint(eager=True)
            )
    return (
        ranks.select(
            F.when(F.col("node") >= _SUPP_OFFSET, F.col("node") - _SUPP_OFFSET)
            .otherwise(F.col("node"))
            .alias("node_id"),
            F.when(F.col("node") >= _SUPP_OFFSET, F.lit("supplier"))
            .otherwise(F.lit("customer"))
            .alias("node_type"),
            # report at 1e-8 precision: truncate the exact integer state,
            # then ONE division — both engines compute the identical
            # double from the identical int (no decimal-tie rounding)
            F.expr("(rank_q DIV 10000) / 1e8").alias("rank"),
        )
        .orderBy(F.col("rank").desc(), "node_type", "node_id")
        .limit(20)
    )


def _pagerank_sql() -> str:
    base = f"""
WITH fwd AS (
  SELECT o_custkey AS src, l_suppkey + {_SUPP_OFFSET} AS dst, CAST(count(*) AS BIGINT) AS w
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2
), edges AS (
  SELECT src, dst, w FROM fwd UNION ALL SELECT dst, src, w FROM fwd
), nodes AS (
  SELECT DISTINCT src AS node FROM edges
), nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM nodes),
trans AS MATERIALIZED (
  SELECT src, dst,
         CAST((w * {P_SCALE}) // CAST(sum(w) OVER (PARTITION BY src) AS BIGINT) AS BIGINT) AS p_q
  FROM edges
), r0 AS (
  SELECT node, CAST({R_SCALE} // (SELECT n FROM nn) AS BIGINT) AS rank_q FROM nodes
)"""
    steps = []
    for i in range(N_ITER):
        steps.append(f""", r{i + 1} AS MATERIALIZED (
  SELECT nodes.node,
         CAST(({DAMP_DEN - DAMP_NUM} * {R_SCALE}) // ({DAMP_DEN} * (SELECT n FROM nn))
         + ({DAMP_NUM} * (coalesce(CAST(sum(t.p_q * r.rank_q) AS BIGINT), 0)
            // {P_SCALE})) // {DAMP_DEN} AS BIGINT) AS rank_q
  FROM nodes
  LEFT JOIN trans t ON t.dst = nodes.node
  LEFT JOIN r{i} r ON r.node = t.src
  GROUP BY nodes.node
)""")
    final = f"""
SELECT CASE WHEN node >= {_SUPP_OFFSET} THEN node - {_SUPP_OFFSET} ELSE node END AS node_id,
       CASE WHEN node >= {_SUPP_OFFSET} THEN 'supplier' ELSE 'customer' END AS node_type,
       (rank_q // 10000) / 1e8 AS rank
FROM r{N_ITER}
ORDER BY rank DESC, node_type, node_id
LIMIT 20"""
    return base + "".join(steps) + final


GRAPH_PAGERANK_SQL = _pagerank_sql()

TRI_Q = 0.95  # keep the top-5% strongest co-occurrence ties


def _triangles_per_node(edges: DataFrame, orientation: str = "degree") -> DataFrame:
    """Per-node triangle participation over an undirected (a, b)
    edge list (a < b, deduped). Enumeration is the oriented two-hop
    join; each triangle is counted exactly once under ANY acyclic
    orientation, so the RESULT is orientation-invariant (pinned by
    tests/test_graph.py's hub equivalence) while the JOIN POPULATION
    is not:

    - ``degree``: orient every edge low-degree → high-degree (ties by
      id) — the standard wedge bound. Out-degree is O(sqrt(m)) for
      every node including hubs, so the wedge join emits
      O(m^1.5) rows worst-case instead of O(m·max_degree).
    - ``id``: the textbook a<b orientation (the pre-r10 path, kept
      for the equivalence test) — a low-id hub pivots all its wedges:
      a hub in 30% of orders makes the join output quadratic in its
      degree.
    """
    degree = (
        edges.select(F.explode(F.array("a", "b")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("degree"))
    )
    if orientation == "id":
        oe = edges.select(
            F.col("a").alias("src"), F.col("b").alias("dst"), F.col("b").alias("okey")
        )
    else:
        # total order (degree, id): strict, hence acyclic; carried as
        # one sortable struct column so the wedge inequality below is
        # a single comparison
        da = degree.select(F.col("node").alias("a"), F.col("degree").alias("dega"))
        db = degree.select(F.col("node").alias("b"), F.col("degree").alias("degb"))
        ranked = edges.join(da, "a").join(db, "b")
        fwd = (F.col("dega") < F.col("degb")) | (
            (F.col("dega") == F.col("degb")) & (F.col("a") < F.col("b"))
        )
        oe = ranked.select(
            F.when(fwd, F.col("a")).otherwise(F.col("b")).alias("src"),
            F.when(fwd, F.col("b")).otherwise(F.col("a")).alias("dst"),
            F.when(
                fwd, F.struct(F.col("degb").alias("d"), F.col("b").alias("n"))
            ).otherwise(
                F.struct(F.col("dega").alias("d"), F.col("a").alias("n"))
            ).alias("okey"),
        )
    o1, o2, o3 = oe.alias("o1"), oe.alias("o2"), oe.alias("o3")
    # wedge (src, v, w) with ord(v) < ord(w), closed by the oriented
    # edge v→w — the closing edge's direction is FORCED by the same
    # total order, so one equi-join probes it
    tri = (
        o1.join(
            o2,
            (F.col("o1.src") == F.col("o2.src")) & (F.col("o1.okey") < F.col("o2.okey")),
        )
        .join(
            o3,
            (F.col("o3.src") == F.col("o1.dst")) & (F.col("o3.dst") == F.col("o2.dst")),
        )
        .select(F.col("o1.src").alias("x"), F.col("o1.dst").alias("y"), F.col("o2.dst").alias("z"))
    )
    per_node = (
        tri.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").alias("n_tri"))
    )
    return per_node.join(degree, "node").select("node", "degree", "n_tri")


def graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting on the supplier co-occurrence graph (edge =
    two suppliers serving the same order at least p95-many times —
    the threshold is a QUANTILE of the tie-strength distribution, so
    the graph stays sparse at any scale factor). Returns the top-20
    suppliers by triangle participation with their degree — the
    clustering-structure signal behind community detection.

    Scale design: per-order supplier sets are bounded (orders hold a
    handful of lines), so pairs come from an in-row combination
    explode over collect_set — NOT a lineitem self-join, whose
    output would be quadratic in lines-per-order before the dedup.
    Triangle enumeration is the DEGREE-ORDERED two-hop join
    (``_triangles_per_node``): hubs never pivot their own wedges, so
    the join output is bounded O(m^1.5) even on a one-supplier-in-
    30%-of-orders graph. The result is provably orientation-invariant
    — the id-ordered SQL oracle replays it exactly."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    per_order = li.groupBy("l_orderkey").agg(
        F.array_sort(F.collect_set("l_suppkey")).alias("ss")
    )
    pairs = per_order.select(
        F.explode(
            F.expr(
                "flatten(transform(ss, (x, i) -> "
                "transform(slice(ss, i + 2, size(ss)), y -> struct(x AS a, y AS b))))"
            )
        ).alias("p")
    ).select("p.a", "p.b")
    pc = pairs.groupBy("a", "b").agg(F.count("*").alias("c"))
    thr = pc.agg(F.ceil(F.percentile("c", TRI_Q)).alias("t"))
    edges = (
        pc.crossJoin(F.broadcast(thr))
        .filter(F.col("c") >= F.col("t"))
        .select("a", "b")
        .localCheckpoint(eager=True)  # reused 5× (degrees + orient + 3-way self-join)
    )
    return (
        _triangles_per_node(edges)
        .orderBy(F.desc("n_tri"), "node")
        .limit(20)
    )


GRAPH_TRIANGLES_SQL = f"""
WITH pc AS (
  SELECT l1.l_suppkey AS a, l2.l_suppkey AS b, count(DISTINCT l1.l_orderkey) AS c
  FROM lineitem l1 JOIN lineitem l2 USING (l_orderkey)
  WHERE l1.l_suppkey < l2.l_suppkey
  GROUP BY 1, 2
), thr AS (
  SELECT CAST(ceil(quantile_cont(c, {TRI_Q})) AS BIGINT) AS t FROM pc
), e AS (
  SELECT a, b FROM pc, thr WHERE c >= t
), tri AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM e e1 JOIN e e2 ON e1.b = e2.a
  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
), per_node AS (
  SELECT node, CAST(count(*) AS BIGINT) AS n_tri FROM (
    SELECT x AS node FROM tri UNION ALL SELECT y FROM tri UNION ALL SELECT z FROM tri
  ) GROUP BY node
), degree AS (
  SELECT node, CAST(count(*) AS BIGINT) AS degree FROM (
    SELECT a AS node FROM e UNION ALL SELECT b FROM e
  ) GROUP BY node
)
SELECT per_node.node, degree, n_tri
FROM per_node JOIN degree USING (node)
ORDER BY n_tri DESC, node
LIMIT 20
"""

LP_ITER = 3


def graph_label_prop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection by synchronous label propagation on the
    customer↔supplier interaction graph: labels start as node ids;
    each round every node adopts the label with the greatest total
    edge weight among its neighbours (ties → smallest label — the
    determinism rule that makes an iterative heuristic hash-gateable).
    Fixed ``LP_ITER`` rounds, unrolled in the oracle as chained CTEs.
    Returns the 20 largest communities with member-type counts.

    Scale: one (join + groupBy + window) per round — Pregel's cost
    model in DataFrames, same as ``graph_pagerank``; integer edge
    weights keep every wt sum exact. ``localCheckpoint`` per round
    truncates the self-referencing lineage."""
    from pyspark.sql import Window as W

    edges = (
        _edges(spark, sf_dir)
        .select("src", "dst", F.col("w").cast("long").alias("w"))
        .localCheckpoint(eager=True)
    )
    labels = edges.select(F.col("src").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    rn_w = W.partitionBy("node").orderBy(F.desc("wt"), F.asc("label"))
    # iteration width sized to the materialized edge count — same
    # reasoning and bounds as graph_pagerank above
    n_edges = edges.count()
    # the label table is O(nodes): count it once and apply the SAME
    # node-count broadcast gate as graph_pagerank (gating on edges
    # would over-broadcast sparse graphs — a 5M-edge graph can have
    # ~10M nodes); each gated round is then a map-side join + one
    # partial-aggregated shuffle instead of re-shuffling the pinned
    # edge table
    labels = labels.localCheckpoint(eager=True)
    n_nodes = labels.count()
    maybe_b = F.broadcast if n_nodes <= GRAPH_BCAST_NODES else (lambda df: df)
    with scoped_shuffle_width(spark, sized_width(spark, n_edges)):
        for _ in range(LP_ITER):
            labels = (
                edges.join(maybe_b(labels), edges.src == labels.node)
                .groupBy(F.col("dst").alias("node"), "label")
                .agg(F.sum("w").alias("wt"))
                .withColumn("rn", F.row_number().over(rn_w))
                .filter(F.col("rn") == 1)
                .select("node", "label")
                .localCheckpoint(eager=True)
            )
    return (
        labels.groupBy(F.col("label").alias("community"))
        .agg(
            F.count("*").alias("n_nodes"),
            F.sum(F.when(F.col("node") < _SUPP_OFFSET, 1).otherwise(0)).alias("n_customers"),
            F.sum(F.when(F.col("node") >= _SUPP_OFFSET, 1).otherwise(0)).alias("n_suppliers"),
        )
        .orderBy(F.desc("n_nodes"), "community")
        .limit(20)
    )


_LP_ROUND_SQL = """
{out} AS (
  SELECT node, label FROM (
    SELECT e.dst AS node, l.label, sum(e.w) AS wt,
           row_number() OVER (PARTITION BY e.dst
                              ORDER BY sum(e.w) DESC, l.label) AS rn
    FROM sym e JOIN {prev} l ON e.src = l.node
    GROUP BY e.dst, l.label
  ) WHERE rn = 1
)"""

GRAPH_LABEL_PROP_SQL = f"""
WITH edges AS (
  SELECT o_custkey AS src, l_suppkey + {_SUPP_OFFSET} AS dst,
         CAST(count(*) AS BIGINT) AS w
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2
), sym AS (
  SELECT src, dst, w FROM edges
  UNION ALL
  SELECT dst AS src, src AS dst, w FROM edges
), l0 AS (
  SELECT DISTINCT src AS node, src AS label FROM sym
),{_LP_ROUND_SQL.format(out="l1", prev="l0")},{_LP_ROUND_SQL.format(out="l2", prev="l1")},{_LP_ROUND_SQL.format(out="l3", prev="l2")}
SELECT label AS community,
       CAST(count(*) AS BIGINT) AS n_nodes,
       CAST(sum(CASE WHEN node < {_SUPP_OFFSET} THEN 1 ELSE 0 END) AS BIGINT) AS n_customers,
       CAST(sum(CASE WHEN node >= {_SUPP_OFFSET} THEN 1 ELSE 0 END) AS BIGINT) AS n_suppliers
FROM l3 GROUP BY label
ORDER BY n_nodes DESC, community
LIMIT 20
"""

QUERIES = {
    "graph_pagerank": graph_pagerank,
    "graph_triangles": graph_triangles,
    "graph_label_prop": graph_label_prop,
}
ORACLES = {
    "graph_pagerank": GRAPH_PAGERANK_SQL,
    "graph_triangles": GRAPH_TRIANGLES_SQL,
    "graph_label_prop": GRAPH_LABEL_PROP_SQL,
}
