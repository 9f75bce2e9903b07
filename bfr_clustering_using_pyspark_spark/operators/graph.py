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

from ..sources.readers import load_table

DAMPING = 0.85
N_ITER = 5
_SUPP_OFFSET = 1_000_000  # supplier node ids = s_suppkey + offset


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    fwd = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            F.col("o_custkey").alias("src"),
            (F.col("l_suppkey") + _SUPP_OFFSET).alias("dst"),
        )
        .agg(F.count("*").cast("double").alias("w"))
    )
    rev = fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "w")
    return fwd.union(rev)


def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 nodes by weighted PageRank after 5 damped iterations.
    Returns (node_id, node_type, rank)."""
    edges = _edges(spark, sf_dir).localCheckpoint(eager=True)
    nodes = edges.select(F.col("src").alias("node")).distinct().localCheckpoint(eager=True)
    n_nodes = nodes.count()
    out_w = edges.groupBy("src").agg(F.sum("w").alias("out_w"))
    # transition weight: fraction of src's outflow carried by this edge
    trans = (
        edges.join(out_w, "src")
        .select("src", "dst", (F.col("w") / F.col("out_w")).alias("p"))
        .localCheckpoint(eager=True)
    )
    ranks = nodes.select("node", F.lit(1.0 / n_nodes).alias("rank"))
    for _ in range(N_ITER):
        contrib = (
            trans.join(ranks, trans.src == ranks.node)
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("p") * F.col("rank")).alias("inflow"))
        )
        # every node has outgoing AND incoming edges here (symmetrized
        # graph), so no dangling-mass term is needed
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                ((1.0 - DAMPING) / n_nodes + DAMPING * F.coalesce("inflow", F.lit(0.0))).alias("rank"),
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
            F.round("rank", 8).alias("rank"),
        )
        .orderBy(F.col("rank").desc(), "node_type", "node_id")
        .limit(20)
    )


def _pagerank_sql() -> str:
    base = f"""
WITH fwd AS (
  SELECT o_custkey AS src, l_suppkey + {_SUPP_OFFSET} AS dst, CAST(count(*) AS DOUBLE) AS w
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  GROUP BY 1, 2
), edges AS (
  SELECT src, dst, w FROM fwd UNION ALL SELECT dst, src, w FROM fwd
), nodes AS (
  SELECT DISTINCT src AS node FROM edges
), nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
trans AS (
  SELECT src, dst, w / sum(w) OVER (PARTITION BY src) AS p FROM edges
), r0 AS (
  SELECT node, 1.0 / (SELECT n FROM nn) AS rank FROM nodes
)"""
    steps = []
    for i in range(N_ITER):
        steps.append(f""", r{i + 1} AS (
  SELECT nodes.node,
         (1.0 - {DAMPING}) / (SELECT n FROM nn)
         + {DAMPING} * coalesce(sum(t.p * r.rank), 0.0) AS rank
  FROM nodes
  LEFT JOIN trans t ON t.dst = nodes.node
  LEFT JOIN r{i} r ON r.node = t.src
  GROUP BY nodes.node
)""")
    final = f"""
SELECT CASE WHEN node >= {_SUPP_OFFSET} THEN node - {_SUPP_OFFSET} ELSE node END AS node_id,
       CASE WHEN node >= {_SUPP_OFFSET} THEN 'supplier' ELSE 'customer' END AS node_type,
       round(rank, 8) AS rank
FROM r{N_ITER}
ORDER BY rank DESC, node_type, node_id
LIMIT 20"""
    return base + "".join(steps) + final


GRAPH_PAGERANK_SQL = _pagerank_sql()

QUERIES = {"graph_pagerank": graph_pagerank}
ORACLES = {"graph_pagerank": GRAPH_PAGERANK_SQL}
