"""Empirical scale-up probe: replicate the FACT tables (lineitem /
orders / events / documents / embeddings) K-fold with key offsets —
dimensions stay small, like a real warehouse — and time headline
operators at x1 / x10 / x30. The point is measured CURVATURE: an
operator whose time grows ~linearly in rows has no hidden all-pairs
stage, driver materialization, or width cliff; super-linear growth
at 30x flags exactly the failure class that kills a 100 TB run.

Replication is done BY SPARK (crossJoin with a small replica-index
range + key offsets), so the probe itself exercises the distributed
write path instead of pandas-side generation.

Usage:
    python tools/scale_probe.py [multipliers...]   # default: 1 10 30

Prints one line per (multiplier, query): wall seconds + output rows,
then a per-query linearity ratio table (t_K / (K * t_1)) — ~1.0 is
linear, <1 is sub-linear (fixed overhead amortizing), >>1 is the
red flag.
"""

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

DIM_TABLES = ("region", "nation", "customer", "supplier", "part")
FACTS = {
    # table -> (key columns to offset, optional perturbations)
    "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey"],
    "events": ["event_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

# headline operators spanning the main scale designs: hash-agg,
# shuffle join, banded LSH, bucketed ANN, windowed sessionize,
# distributed MAD, text Arrow kernel
PROBE_QUERIES = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q_salted_agg",
    "dedup_exact",
    "dedup_minhash_lsh",
    "text_quality",
    "ann_ivf",
    "dedup_embedding",
    "q_events_sessionize",
    "q_mad_outliers_dist",
    # iterative/stateful families (added r8): the two-tier streaming
    # component maintainer and the graph iteration ops
    "stream_components",
    "dedup_components",
    "graph_pagerank",
    # r9: distributed exact rank (the other grouped_rank user is
    # q_mad_outliers_dist above) and index-backed graph search (query
    # cost should stay near-flat once the NND build amortizes)
    "q_percentiles_dist",
    "ann_graph_search",
    # r11: retrieval faces (inverted-index postings join + salted
    # top-k; the fused two-leg ranker) and the shuffle-and-shard rank
    "text_bm25",
    "q_hybrid_rrf",
    "corpus_train_shuffle",
]
# probed r9 via SPARK_GRAFT_PROBE_QUERIES (kept off the default
# tier-0 list for cost): stream_late_data / stream_update_counts /
# stream_checkpoint_recovery x10 ratios 0.05 / 0.09 / 0.09;
# ann_nndescent_graph 0.18; q_asof_grouped via skew_probe_asof.py
# targeted runs: SPARK_GRAFT_PROBE_QUERIES=dedup_containment,text_tokens
if os.environ.get("SPARK_GRAFT_PROBE_QUERIES"):
    PROBE_QUERIES = os.environ["SPARK_GRAFT_PROBE_QUERIES"].split(",")

# Duplicate-heavy probe shape (SPARK_GRAFT_PROBE_DUPHEAVY=1): every
# CLIQUE_MOD-th base doc/vector additionally spawns CLIQUE_PER_K * k
# UNMUTATED replicas — exact-copy cliques whose size grows with the
# multiplier (x10 -> 200-clique, x30 -> 600-clique with the defaults)
# and crosses the hot-bucket caps (LSH_BUCKET_CAP 128 /
# CONTAIN_DF_CAP 256 / EMB_BUCKET_CAP 256). This is the corpus shape
# the standard replica mutation deliberately avoids (mutation keeps
# the dup graph sparse so the x-ratios measure corpus growth); here
# the point is the opposite — proving the capped band-bucket joins
# stay bounded when a shard IS boilerplate.
DUPHEAVY = os.environ.get("SPARK_GRAFT_PROBE_DUPHEAVY") == "1"
CLIQUE_MOD = 200
CLIQUE_PER_K = 20
# r10 measured rows (src sf0.01, x1/x10/x30 cliques of 20/200/600):
#   dedup_minhash_lsh   t1=9.05s x10=0.04 x30=0.02  (star at >=x10)
#   dedup_containment   t1=2.58s x10=0.15 x30=0.32  (cap at x30)
#   dedup_embedding     t1=1.65s x10=0.26 x30=0.11  (61k all-pairs
#                       rows at x10's 200-clique -> 4.5k star at x30)
#   dedup_components    t1=3.81s x10=0.07 x30=0.05  (one comp/clique)


def _scale_table(spark, src_dir: str, dst_dir: str, table: str, k: int) -> None:
    from pyspark.sql import functions as F

    df = spark.read.parquet(os.path.join(src_dir, f"{table}.parquet"))
    out = os.path.join(dst_dir, f"{table}.parquet")
    if k == 1 and not (DUPHEAVY and table in ("documents", "embeddings")):
        df.write.mode("overwrite").parquet(out)
        return
    keys = FACTS[table]
    # one offset unit per key column = (max over the source) + 1, so
    # replicas never collide; FK pairs (o_orderkey / l_orderkey) use
    # the SAME unit because both derive from the orders keyspace
    unit_col = "o_orderkey" if table in ("orders", "lineitem") else keys[0]
    unit_src = "orders" if table in ("orders", "lineitem") else table
    unit = (
        spark.read.parquet(os.path.join(src_dir, f"{unit_src}.parquet"))
        .agg(F.max(unit_col))
        .collect()[0][0]
        + 1
    )
    if k == 1:
        scaled = df.withColumn("__rep", F.lit(0))
    else:
        rep = spark.range(k).withColumnRenamed("id", "__rep")
        scaled = df.crossJoin(F.broadcast(rep))
    for c in keys:
        scaled = scaled.withColumn(c, F.col(c) + F.col("__rep") * F.lit(int(unit)))
    if table == "events":
        # shift replica timestamps by k seconds so event streams stay
        # strictly increasing-cardinality instead of perfectly stacked
        scaled = scaled.withColumn(
            "ts", F.col("ts") + (F.col("__rep") * F.expr("INTERVAL 1 SECOND"))
        )
    if table == "embeddings":
        # rotate replica vectors by __rep components: replicas are no
        # longer near-duplicates of their source (cosine vs a rotation
        # is ~random), so the dup GRAPH stays sparse while the corpus
        # grows — exact copies would make every vector a true near-dup
        # of K-1 others, a quadratically denser ANSWER, not a bigger
        # corpus
        scaled = scaled.withColumn(
            "__rot", F.expr("CAST(pmod(__rep, size(embedding)) AS INT)")
        ).withColumn(
            "embedding",
            F.expr(
                "concat(slice(embedding, __rot + 1, size(embedding) - __rot), "
                "slice(embedding, 1, __rot))"
            ),
        ).drop("__rot")
    if table == "documents":
        # Mutate every 8th TOKEN of replica text so near-dup groups
        # stay bounded. A suffix tag is NOT enough: appending never
        # breaks an existing shingle, so the replica stays a
        # near-superset of its source (J ≈ 0.93, containment ≈ 1.0)
        # and every replica family forms a true dup CLIQUE — the
        # ANSWER grows ~K² (measured: containment 499 → 482k pairs at
        # x10), which probes answer density, not corpus growth.
        # Changing one token in eight breaks ~3 shingles per change
        # (spacing > shingle width), pushing replica-vs-source
        # J ≈ 0.43 and containment ≈ 0.6 — both below their
        # thresholds, so the dup graph stays sparse as K grows.
        scaled = scaled.withColumn(
            "text",
            F.when(F.col("__rep") == 0, F.col("text")).otherwise(
                F.expr(
                    "concat_ws(' ', transform(split(text, ' '), (t, i) ->"
                    " CASE WHEN i % 8 = pmod(__rep, 8)"
                    " THEN concat(t, 'q', CAST(__rep AS STRING)) ELSE t END))"
                )
            ),
        ).withColumn("n_chars", F.length("text").cast("long"))
    scaled = scaled.drop("__rep")
    if DUPHEAVY and table in ("documents", "embeddings"):
        # exact-copy cliques from the ORIGINAL rows (no mutation, no
        # rotation): ids live in the offset range [k, k + 10*k*...)
        # above the replicas' [0, k), so nothing collides
        key = keys[0]
        seeds = df.filter(F.col(key) % CLIQUE_MOD == 0)
        reps = spark.range(CLIQUE_PER_K * k).withColumnRenamed("id", "__crep")
        clique = (
            seeds.crossJoin(F.broadcast(reps))
            .withColumn(key, F.col(key) + (F.col("__crep") + F.lit(k)) * F.lit(int(unit)))
            .drop("__crep")
        )
        scaled = scaled.unionByName(clique)
    scaled.write.mode("overwrite").parquet(out)


def build_scaled_dir(spark, src_dir: str, dst_dir: str, k: int) -> None:
    os.makedirs(dst_dir, exist_ok=True)
    for t in DIM_TABLES:
        dst = os.path.join(dst_dir, f"{t}.parquet")
        srcp = os.path.join(src_dir, f"{t}.parquet")
        if not os.path.exists(dst):
            if os.path.isdir(srcp):
                shutil.copytree(srcp, dst)
            else:
                shutil.copy(srcp, dst)
    for t in FACTS:
        _scale_table(spark, src_dir, dst_dir, t, k)


def main() -> None:
    mults = [int(a) for a in sys.argv[1:]] or [1, 10, 30]
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from bfr_clustering_using_pyspark_spark.session import get_spark

    import __spark_entry__ as m

    spark = get_spark("scale_probe")
    spark.sparkContext.setLogLevel("ERROR")
    qs = m.queries()

    results: dict[str, dict[int, float]] = {q: {} for q in PROBE_QUERIES}
    base = tempfile.mkdtemp(prefix="scale_probe_")
    try:
        for k in mults:
            d = os.path.join(base, f"x{k}")
            t0 = time.time()
            build_scaled_dir(spark, src, d, k)
            print(f"# built x{k} corpus in {time.time() - t0:.1f}s", flush=True)
            for q in PROBE_QUERIES:
                t0 = time.time()
                n = len(qs[q](spark, d).collect())
                dt = time.time() - t0
                results[q][k] = dt
                print(f"x{k:<3d} {q:24s} {dt:7.2f}s  ({n} rows)", flush=True)
        print("\n# linearity ratios t_K / (K * t_1)  (~1 linear, >>1 red flag)")
        for q in PROBE_QUERIES:
            t1 = results[q].get(1)
            if not t1:
                continue
            ratios = "  ".join(
                f"x{k}={results[q][k] / (k * t1):.2f}" for k in mults if k != 1
            )
            print(f"{q:24s} t1={t1:.2f}s  {ratios}", flush=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


if __name__ == "__main__":
    main()
