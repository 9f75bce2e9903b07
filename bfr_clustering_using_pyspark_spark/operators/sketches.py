"""Probabilistic sketch operators with ENGINE-PORTABLE hashing.

Sketches are the workhorse of 100 TB analytics (bounded state,
map-side mergeable, one pass), but most implementations are
engine-specific and therefore untestable across engines. Every hash
here derives from md5 — available bit-identically in Spark, DuckDB,
and any serious engine — so the sketches themselves are
deterministic and the correctness gate hash-matches their CONTENTS,
not just their shapes:

- ``q_countmin_topk``: count-min sketch over corpus tokens, with
  the CMS estimate vs the exact count for the top-20 tokens (the
  overcount column IS the sketch's error, measured not assumed).
- ``q_bloom_filter_join``: bloom-filter semi-join pruning — the
  standard trick for cutting a fact-table shuffle before a join —
  with the false-positive rate measured against the exact semi-join.

Scale: both sketches are fixed-size (d×w counters / m bits)
regardless of input cardinality, build map-side in one groupBy, and
broadcast to the probe side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table
from .dedup import _tokens

CMS_D = 4  # hash rows
CMS_W = 1024  # counters per row
CMS_TOPK = 20


def _md5_bucket(col, seed: int, width: int):
    """Portable hash_seed(x) % width: 60 bits of md5(seed || ':' || x)."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{seed}:"), col.cast("string"))), 1, 15),
            16,
            10,
        ).cast("long")
        % width
    )


def _md5_bucket_sql(expr: str, seed: int, width: int) -> str:
    return f"('0x' || substr(md5('{seed}:' || {expr}), 1, 15))::BIGINT % {width}"


def q_countmin_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch over document tokens: build the d×w counter
    matrix, then read back estimates for the exact top-20 tokens and
    report each token's overcount (estimate − exact ≥ 0 always; how
    much is the collision error at w=1024).

    Build is one token-keyed count (the same shuffle the exact count
    needs) followed by a d-way in-row explode to (seed, bucket) —
    counters are CMS_D×CMS_W cells total, a broadcast-sized object at
    any corpus size. The estimate lookup joins 20×d rows against the
    counter table."""
    toks = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(_tokens(F.col("text"))).alias("tok"))
    )
    lm = toks.groupBy("tok").agg(F.count("*").alias("cnt"))
    cells = lm.select(
        "cnt",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("seed"),
                        _md5_bucket(F.col("tok"), s, CMS_W).alias("bucket"),
                    )
                    for s in range(CMS_D)
                ]
            )
        ).alias("sb"),
    )
    counters = cells.groupBy("sb.seed", "sb.bucket").agg(F.sum("cnt").alias("counter"))
    top = lm.orderBy(F.desc("cnt"), "tok").limit(CMS_TOPK)
    probes = top.select(
        "tok",
        F.col("cnt").alias("exact"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(s).alias("seed"),
                        _md5_bucket(F.col("tok"), s, CMS_W).alias("bucket"),
                    )
                    for s in range(CMS_D)
                ]
            )
        ).alias("sb"),
    ).select("tok", "exact", "sb.seed", "sb.bucket")
    return (
        probes.join(F.broadcast(counters), ["seed", "bucket"])
        .groupBy("tok", "exact")
        .agg(F.min("counter").alias("estimate"))
        .select(
            "tok",
            "exact",
            "estimate",
            (F.col("estimate") - F.col("exact")).alias("overcount"),
        )
        .orderBy(F.desc("exact"), "tok")
    )


_CMS_BUCKETS_SQL = " UNION ALL ".join(
    f"SELECT tok, cnt, {s} AS seed, {_md5_bucket_sql('tok', s, CMS_W)} AS bucket FROM lm"
    for s in range(CMS_D)
)

Q_COUNTMIN_TOPK_SQL = f"""
WITH toks AS (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok FROM documents
), lm AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM toks GROUP BY tok
), cells AS (
  {_CMS_BUCKETS_SQL}
), counters AS (
  SELECT seed, bucket, CAST(sum(cnt) AS BIGINT) AS counter FROM cells GROUP BY 1, 2
), top AS (
  SELECT tok, cnt AS exact FROM lm ORDER BY cnt DESC, tok LIMIT {CMS_TOPK}
), probes AS (
  {" UNION ALL ".join(
    f"SELECT tok, exact, {s} AS seed, {_md5_bucket_sql('tok', s, CMS_W)} AS bucket FROM top"
    for s in range(CMS_D)
  )}
)
SELECT tok, exact, min(counter) AS estimate, min(counter) - exact AS overcount
FROM probes JOIN counters USING (seed, bucket)
GROUP BY tok, exact
ORDER BY exact DESC, tok
"""


BLOOM_K = 5  # hash functions
BLOOM_M = 8192  # bits


def q_bloom_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join pruning, with its error measured: build
    an m=8192/k=5 bloom filter over the custkeys of AUTOMOBILE-
    segment customers, probe every order against it, and compare to
    the exact semi-join. Output: per-verdict order counts — bloom
    true-positives, false positives (pass bloom, not in segment),
    and rejects. The FP row is the pruning waste a real deployment
    pays; rejects never shuffle.

    The filter is the distinct set of set bits (≤ m values) — a
    broadcast-sized object regardless of build-side cardinality; the
    probe is k portable md5 hashes + a size-k array check, all
    JVM-side. This is what Spark's runtime row-level bloom pruning
    (spark.sql.optimizer.runtime.bloomFilter) does under the hood,
    spelled out and cross-engine-verified."""
    cust = load_table(spark, sf_dir, "customer")
    build = cust.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_custkey")
    bits = (
        build.select(
            F.explode(
                F.array(*[_md5_bucket(F.col("c_custkey"), s, BLOOM_M) for s in range(BLOOM_K)])
            ).alias("bit")
        )
        .distinct()
        .agg(F.array_sort(F.collect_set("bit")).alias("bits"))
    )
    # pack the set-bit list into a real m-bit bitmap (BLOOM_M/64
    # longs) once on the 1-row build side: the former probe ran
    # array_contains — a LINEAR scan of the ≤8192-entry bit list —
    # K times per order row (~5 × 5000 comparisons × |orders|; this
    # key was 49 s at sf0.1, by far the slowest operator in the
    # registry). An O(1) word-index + shift probe against the packed
    # mask computes the identical membership booleans (guide §1.2:
    # per-task work, after the plan shape is already right).
    mask = bits.select(
        F.expr(
            f"transform(sequence(0, {BLOOM_M // 64 - 1}), w -> "
            "aggregate(filter(bits, b -> b DIV 64 = w), CAST(0 AS BIGINT), "
            "(acc, b) -> acc | shiftleft(CAST(1 AS BIGINT), CAST(b % 64 AS INT))))"
        ).alias("mask")
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    probed = orders.crossJoin(F.broadcast(mask)).select(
        "o_orderkey",
        "o_custkey",
        F.expr(
            "forall(array("
            + ", ".join(
                f"cast(conv(substring(md5(concat('{s}:', cast(o_custkey as string))), 1, 15), 16, 10) as bigint) % {BLOOM_M}"
                for s in range(BLOOM_K)
            )
            + "), b -> (shiftright(element_at(mask, CAST(b DIV 64 AS INT) + 1), "
            "CAST(b % 64 AS INT)) & 1) = 1)"
        ).alias("bloom_pass"),
    )
    truth = build.withColumnRenamed("c_custkey", "o_custkey").withColumn(
        "in_segment", F.lit(True)
    )
    verdict = (
        probed.join(F.broadcast(truth), "o_custkey", "left")
        .select(
            F.when(F.col("bloom_pass") & F.col("in_segment").isNotNull(), "true_positive")
            .when(F.col("bloom_pass"), "false_positive")
            .otherwise("rejected")
            .alias("verdict")
        )
    )
    return verdict.groupBy("verdict").agg(F.count("*").alias("n_orders")).orderBy("verdict")


_BLOOM_HASHES_SQL = ", ".join(
    _md5_bucket_sql("CAST(o_custkey AS VARCHAR)", s, BLOOM_M) for s in range(BLOOM_K)
)

Q_BLOOM_FILTER_JOIN_SQL = f"""
WITH build AS (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
), bits AS (
  SELECT DISTINCT bit FROM (
    {" UNION ALL ".join(
      f"SELECT {_md5_bucket_sql('CAST(c_custkey AS VARCHAR)', s, BLOOM_M)} AS bit FROM build"
      for s in range(BLOOM_K)
    )}
  )
), probed AS (
  -- list_has_all mirrors Spark's forall exactly: a key whose K
  -- hashes internally COLLIDE (~K²/2m of keys — 24 custkeys at
  -- sf0.1) still passes when its distinct buckets are all set; the
  -- old "count(matching bits) = K" formulation undercounted those
  -- and flipped their verdict
  SELECT o_orderkey, o_custkey,
         list_has_all(bl.bitlist, [{_BLOOM_HASHES_SQL}]) AS bloom_pass
  FROM orders, (SELECT list(bit) AS bitlist FROM bits) bl
)
SELECT CASE WHEN bloom_pass AND b.c_custkey IS NOT NULL THEN 'true_positive'
            WHEN bloom_pass THEN 'false_positive'
            ELSE 'rejected' END AS verdict,
       CAST(count(*) AS BIGINT) AS n_orders
FROM probed LEFT JOIN build b ON probed.o_custkey = b.c_custkey
GROUP BY 1 ORDER BY verdict
"""


# Linear-counting bitmap size. 2^16 keeps the load factor sane to
# ~1M distinct keys per group (4096 SATURATED at sf0.1 — every
# bucket hit, ln(m/0) divide-by-zero under ANSI mode); the estimator
# also carries an explicit saturation guard because ANY fixed m
# saturates at some scale.
LC_M = 65536


def q_linear_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear-counting cardinality sketch next to the exact count:
    hash every order key into an m=4096 bitmap per return flag,
    estimate distinct = m·ln(m / empty_buckets), report the
    relative error. The portable-hash counterpart to
    ``q_approx_distinct``'s HLL (engine-specific, rows-only) — this
    sketch the gate can hash-match, error and all.

    One grouped pass computes the exact distinct and the occupied-
    bucket count together; sketch state is m bits per group. Keys
    are distinct-ed BEFORE hashing so the md5 runs once per distinct
    key, not once per fact row."""
    keys = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_orderkey")
        .distinct()
    )
    bucket = _md5_bucket(F.col("l_orderkey"), 0, LC_M)
    agg = keys.groupBy("l_returnflag").agg(
        F.count("l_orderkey").alias("exact"),
        F.countDistinct(bucket).alias("used"),
    )
    # saturation guard: with zero empty buckets the estimator is
    # undefined (ln(m/0)) — report NULL rather than erroring, the
    # signal to rebuild with a bigger m (or switch to HLL)
    est = F.when(
        F.col("used") < LC_M,
        F.round(LC_M * F.log(F.lit(float(LC_M)) / (LC_M - F.col("used"))), 2),
    )
    return (
        agg.select(
            "l_returnflag",
            "exact",
            est.alias("lc_estimate"),
            F.round(F.abs(est - F.col("exact")) / F.col("exact"), 4).alias("rel_err"),
        )
        .orderBy("l_returnflag")
    )


Q_LINEAR_COUNT_SQL = f"""
WITH keys AS (
  SELECT DISTINCT l_returnflag, l_orderkey FROM lineitem
), agg AS (
  SELECT l_returnflag,
         CAST(count(l_orderkey) AS BIGINT) AS exact,
         CAST(count(DISTINCT {_md5_bucket_sql("CAST(l_orderkey AS VARCHAR)", 0, LC_M)}) AS BIGINT) AS used
  FROM keys
  GROUP BY 1
)
SELECT l_returnflag, exact,
       CASE WHEN used < {LC_M}
            THEN round({LC_M} * ln({LC_M} * 1e0 / ({LC_M} - used)), 2) END AS lc_estimate,
       CASE WHEN used < {LC_M}
            THEN round(abs(round({LC_M} * ln({LC_M} * 1e0 / ({LC_M} - used)), 2) - exact) / exact, 4) END AS rel_err
FROM agg ORDER BY l_returnflag
"""


KMV_K = 256
KMV_M = 1 << 60  # hash domain: 15 hex digits of md5


def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values / bottom-k theta) distinct sketch per
    return flag: keep the k=256 smallest md5 hash values of the
    order keys; distinct ≈ (k-1)·M/h_k where h_k is the k-th
    smallest. Unlike HLL the state is mergeable by a trivial
    merge-and-truncate AND portable — both engines replay the same
    md5, so the gate hash-matches the estimate and its measured
    error, not just the shape.

    Scale: state is k hashes per group regardless of input size; the
    distinct-before-hash keeps md5 to one call per distinct key; the
    k-th order statistic is one bounded window per group."""
    from pyspark.sql import Window as W

    keys = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_orderkey")
        .distinct()
    )
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("kmv:"), F.col("l_orderkey").cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    hashed = keys.select("l_returnflag", h.alias("h"))
    w = W.partitionBy("l_returnflag").orderBy("h")
    kth = (
        hashed.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == KMV_K)
        .select("l_returnflag", F.col("h").alias("h_k"))
    )
    exact = hashed.groupBy("l_returnflag").agg(F.count("*").alias("exact"))
    est = F.round(F.lit(float(KMV_K - 1)) * KMV_M / F.col("h_k"), 2)
    return (
        exact.join(kth, "l_returnflag")
        .select(
            "l_returnflag",
            "exact",
            "h_k",
            est.alias("kmv_estimate"),
            F.round(F.abs(est - F.col("exact")) / F.col("exact"), 4).alias("rel_err"),
        )
        .orderBy("l_returnflag")
    )


Q_KMV_DISTINCT_SQL = f"""
WITH keys AS (
  SELECT DISTINCT l_returnflag, l_orderkey FROM lineitem
), hashed AS (
  SELECT l_returnflag,
         ('0x' || substr(md5('kmv:' || CAST(l_orderkey AS VARCHAR)), 1, 15))::BIGINT AS h
  FROM keys
), kth AS (
  SELECT l_returnflag, h AS h_k FROM (
    SELECT l_returnflag, h,
           row_number() OVER (PARTITION BY l_returnflag ORDER BY h) AS rk
    FROM hashed
  ) WHERE rk = {KMV_K}
), exact AS (
  SELECT l_returnflag, CAST(count(*) AS BIGINT) AS exact FROM hashed GROUP BY 1
)
SELECT l_returnflag, exact, h_k,
       round({KMV_K - 1}.0 * {KMV_M} / h_k, 2) AS kmv_estimate,
       round(abs(round({KMV_K - 1}.0 * {KMV_M} / h_k, 2) - exact) / exact, 4) AS rel_err
FROM exact JOIN kth USING (l_returnflag)
ORDER BY l_returnflag
"""


QUERIES = {
    "q_countmin_topk": q_countmin_topk,
    "q_bloom_filter_join": q_bloom_filter_join,
    "q_linear_count": q_linear_count,
    "q_kmv_distinct": q_kmv_distinct,
}

ORACLES = {
    "q_countmin_topk": Q_COUNTMIN_TOPK_SQL,
    "q_bloom_filter_join": Q_BLOOM_FILTER_JOIN_SQL,
    "q_linear_count": Q_LINEAR_COUNT_SQL,
    "q_kmv_distinct": Q_KMV_DISTINCT_SQL,
}
