"""Embedding-column operators: normalization, TF-IDF, distributed
PCA — the preprocessing stages a similarity/dedup pipeline runs
before ANN at scale.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..functions.vectors import l2_norm, to_double_array
from ..sources.readers import load_table


def embedding_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2-normalize embeddings; emit per-vector norm before/after
    (rounded) — unit-norm vectors make cosine == dot downstream."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = to_double_array("embedding")
    nrm = l2_norm(v)
    unit = F.transform(v, lambda x: x / nrm)
    return emb.select(
        "vec_id",
        F.round(nrm, 4).alias("norm_before"),
        F.round(l2_norm(unit), 4).alias("norm_after"),
        F.round(F.element_at(unit, 1), 6).alias("unit_d0"),
    ).orderBy("vec_id")


EMBEDDING_NORMALIZE_SQL = """
WITH base AS (
  SELECT vec_id,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
         sqrt(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
  FROM embeddings
)
SELECT vec_id,
       round(nrm, 4) AS norm_before,
       round(sqrt(list_sum(list_transform(v, x -> (x / nrm) * (x / nrm)))), 4) AS norm_after,
       round(v[1] / nrm, 6) AS unit_d0
FROM base ORDER BY vec_id
"""


def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization (the SQ in IVF+SQ): per-vector
    min/max range, codes q = floor((x − min)/scale + 0.5), and the
    reconstruction MSE — the compression/recall trade every
    vector store at 100 TB makes (4× memory cut for float32).

    Pure ``F.transform``/``F.aggregate`` — quantization is
    elementwise, so it stays JVM-side with zero Python."""
    emb = load_table(spark, sf_dir, "embeddings")
    v = to_double_array("embedding")
    vmin = F.array_min(v)
    vmax = F.array_max(v)
    scale = (vmax - vmin) / F.lit(255.0)
    # degenerate all-constant vector → scale 0 → all codes 0
    q = F.transform(v, lambda x: F.when(scale > 0, F.floor((x - vmin) / scale + 0.5)).otherwise(F.lit(0.0)))
    recon = F.zip_with(q, v, lambda qi, xi: (vmin + qi * scale - xi) * (vmin + qi * scale - xi))
    mse = F.aggregate(recon, F.lit(0.0), lambda a, x: a + x) / F.size(v)
    return emb.select(
        "vec_id",
        F.round(vmin, 4).alias("vmin"),
        F.round(vmax, 4).alias("vmax"),
        F.aggregate(q, F.lit(0.0), lambda a, x: a + x).cast("long").alias("code_sum"),
        F.round(mse, 8).alias("mse"),
    ).orderBy("vec_id")


EMBEDDING_QUANTIZE_SQL = """
WITH base AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
), rng AS (
  SELECT vec_id, v, list_min(v) AS vmin, list_max(v) AS vmax,
         (list_max(v) - list_min(v)) / 255.0 AS scale
  FROM base
), qd AS (
  SELECT vec_id, v, vmin, vmax, scale,
         list_transform(v, x -> CASE WHEN scale > 0
                                     THEN floor((x - vmin) / scale + 0.5)
                                     ELSE 0.0 END) AS q
  FROM rng
)
SELECT vec_id,
       round(vmin, 4) AS vmin,
       round(vmax, 4) AS vmax,
       CAST(list_sum(q) AS BIGINT) AS code_sum,
       round(list_sum(list_transform(list_zip(q, v),
                                     p -> (vmin + p[1] * scale - p[2]) * (vmin + p[1] * scale - p[2])))
             / len(v), 8) AS mse
FROM qd ORDER BY vec_id
"""


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-3 terms by TF-IDF (idf = ln(N/df)) — the
    classic text-feature pipeline, fully relational: one explode, a
    broadcast df join, a per-doc window."""
    from ..functions.text import word_tokens

    docs = load_table(spark, sf_dir, "documents")
    n_docs = docs.count()
    tok = docs.select("doc_id", F.explode(word_tokens(F.col("text"))).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_ = tok.select("doc_id", "term").distinct().groupBy("term").agg(F.count("*").alias("df"))
    scored = tf.join(F.broadcast(df_), "term").select(
        "doc_id",
        "term",
        F.round(F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6).alias("tfidf"),
    )
    w = W.partitionBy("doc_id").orderBy(F.desc("tfidf"), "term")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .orderBy("doc_id", "rnk")
    )


TFIDF_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
  FROM documents
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term
), df_ AS (
  SELECT term, count(*) AS df FROM (SELECT DISTINCT doc_id, term FROM tok) GROUP BY term
), tot AS (SELECT count(*) AS n FROM documents),
scored AS (
  SELECT doc_id, term, round(tf * ln(n * 1e0 / df), 6) AS tfidf
  FROM tf JOIN df_ USING (term) CROSS JOIN tot
)
SELECT doc_id, term, tfidf, rnk
FROM (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rnk
      FROM scored)
WHERE rnk <= 3 ORDER BY doc_id, rnk
"""


def _gram_partials(d: int):
    """mapInPandas: per-batch partial (n, Σx, flattened ΣxxT) — the
    distributed half of covariance/PCA. Shuffle-free; driver gets
    O(batches) rows of size d²."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            pts = np.stack(pdf["v"].to_numpy())
            yield pd.DataFrame(
                {
                    "n": [len(pts)],
                    "s": [pts.sum(axis=0).tolist()],
                    "g": [(pts.T @ pts).ravel().tolist()],
                }
            )

    return fn


def pca_project(spark: SparkSession, sf_dir: str, n_components: int = 8) -> DataFrame:
    """Distributed PCA: Gram-matrix partials per Arrow batch → tiny
    driver collect → eigendecomposition → broadcast components →
    projection pass. Two scans of the data, zero shuffles; driver
    work is O(d²·batches + d³), independent of n. [rows-only]"""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", to_double_array("embedding").alias("v")
    )
    d = len(emb.select("v").first()[0])
    part = emb.select("v").mapInPandas(
        _gram_partials(d), schema="n long, s array<double>, g array<double>"
    ).toPandas()
    n = part["n"].sum()
    s = np.sum(np.stack(part["s"].to_numpy()), axis=0)
    g = np.sum(np.stack(part["g"].to_numpy()), axis=0).reshape(d, d)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    eigvals, eigvecs = np.linalg.eigh(cov)
    order = np.argsort(eigvals)[::-1][:n_components]
    comps = eigvecs[:, order]  # (d, k)
    explained = eigvals[order]

    def project(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            pts = np.stack(pdf["v"].to_numpy()) - mean
            proj = pts @ comps
            yield pd.DataFrame({"vec_id": pdf["vec_id"], "pc": list(np.round(proj, 6))})

    out = emb.mapInPandas(project, schema="vec_id long, pc array<double>").orderBy("vec_id")
    out._pca_explained_variance = explained  # introspection for tests
    return out


DRIFT_SCALE = 1_000_000  # embedding components → exact scaled ints
DRIFT_T = 0.05  # flag labels whose centroid moved more than this


def q_drift_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-distribution drift monitor: split the corpus into
    two halves by vec_id parity (standing in for before/after a
    pipeline change), compute each label's centroid in both halves,
    and report the L2 shift — the standard production check that a
    new ingest batch hasn't moved the representation space.

    Components are rounded to scaled integers BEFORE summation
    (float sums are partition-order-dependent; integer sums are
    exact), so the centroids — and therefore the drift metric — are
    bit-reproducible and hash-gated. One posexplode + one grouped
    sum: dims × labels × 2 rows of state, independent of corpus
    size."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "label", to_double_array("embedding").alias("v")
    )
    cells = emb.select(
        "label",
        (F.col("vec_id") % 2).alias("half"),
        F.posexplode(F.expr(f"transform(v, x -> cast(round(x * {DRIFT_SCALE}, 0) as bigint))")),
    )
    sums = cells.groupBy("label", "half", "pos").agg(
        F.sum("col").alias("s"), F.count("*").alias("n")
    )
    a = sums.filter(F.col("half") == 0).select(
        "label", "pos", F.col("s").alias("s0"), F.col("n").alias("n0")
    )
    b = sums.filter(F.col("half") == 1).select(
        "label", "pos", F.col("s").alias("s1"), F.col("n").alias("n1")
    )
    diff = (
        F.col("s0").cast("double") / F.col("n0") - F.col("s1").cast("double") / F.col("n1")
    ) / DRIFT_SCALE
    per_label = (
        a.join(b, ["label", "pos"])
        .groupBy("label")
        .agg(
            F.max("n0").alias("n_first"),
            F.max("n1").alias("n_second"),
            F.round(F.sqrt(F.sum(diff * diff)), 6).alias("centroid_shift"),
        )
    )
    return per_label.select(
        "label",
        "n_first",
        "n_second",
        "centroid_shift",
        (F.col("centroid_shift") > DRIFT_T).alias("drifted"),
    ).orderBy("label")


Q_DRIFT_DETECT_SQL = f"""
WITH cells AS (
  -- no WITH ORDINALITY / lateral generate_series in DuckDB: fixed
  -- 64-wide series + bounds filter (embeddings are 64-dim)
  SELECT label, vec_id % 2 AS half, g.p - 1 AS pos,
         CAST(round(CAST(embedding[g.p] AS DOUBLE) * {DRIFT_SCALE}, 0) AS BIGINT) AS c
  FROM embeddings, generate_series(1, 64) AS g(p)
  WHERE g.p <= len(embedding)
), sums AS (
  SELECT label, half, pos, CAST(sum(c) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n
  FROM cells GROUP BY 1, 2, 3
), joined AS (
  SELECT a.label, a.pos,
         (CAST(a.s AS DOUBLE) / a.n - CAST(b.s AS DOUBLE) / b.n) / {DRIFT_SCALE} AS d,
         a.n AS n0, b.n AS n1
  FROM sums a JOIN sums b ON a.label = b.label AND a.pos = b.pos
  WHERE a.half = 0 AND b.half = 1
)
SELECT label,
       CAST(max(n0) AS BIGINT) AS n_first,
       CAST(max(n1) AS BIGINT) AS n_second,
       round(sqrt(sum(d * d)), 6) AS centroid_shift,
       round(sqrt(sum(d * d)), 6) > {DRIFT_T} AS drifted
FROM joined GROUP BY label ORDER BY label
"""


# --- deterministic PCA (hash-gated face) ----------------------------
# pca_project's eigh is engine-specific (sign/order ambiguous), so it
# stays rows-only. This face makes the TOP component cross-engine
# bit-exact with the kmeans_lloyd_det recipe: quantize to micro-unit
# integers, keep every data-sized sum in exact int64 arithmetic, and
# run a FIXED number of power-iteration rounds from an md5-seeded
# start vector, renormalizing to integer micro-units each round. The
# only floating point is division of exactly-representable ints —
# identical in both engines — so the oracle replays it bit-for-bit.
PCA_SCALE = 100_000     # micro-units: |x| < 1 → |xq| ≤ 1e5
PCA_M_DIV = 1_000_000   # raw gram-entry shrink before normalization
PCA_M_NORM = 100_000_000  # matrix renormalization scale (1e8)
PCA_SQUARINGS = 7
# Matrix SQUARING, not plain vector iteration: the synthetic
# embeddings are near-isotropic (λ2/λ1 ≈ 0.93), so plain power
# iteration needs ~40 rounds for 3-digit alignment; M^(2^k) converges
# as ratio^(2^k) — 7 squarings align to machine cosine (measured
# cos(v, eigh top) = 1.0 at sf0.001). Exactness budget (int64): gram
# entries ≤ n·4e10 exact to n ≈ 2×10⁸ (shrink PCA_SCALE beyond);
# normalized entries ≤ 1e8 → squaring terms ≤ 64·1e16 ≈ 2^59.5 —
# exact; the ×1e8/max renormalization casts int64 → double (IEEE
# nearest, identical in Spark / DuckDB / NumPy even above 2^53) and
# rounds, so every engine walks the same integer sequence.


def _pca_v0() -> list[int]:
    """md5-seeded integer start vector — the same formula the oracle
    computes in SQL (`('0x'||substr(md5('pca_'||pos),1,15))::BIGINT`)."""
    import hashlib

    return [
        int(hashlib.md5(f"pca_{p}".encode()).hexdigest()[:15], 16) % 2001 - 1000
        for p in range(64)
    ]


def pca_power_det(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-principal-component scores, cross-engine BIT-EXACT: center
    on the micro-unit-rounded mean, build the integer gram matrix
    with one map-side nested-transform explode (n·d² products
    partial-aggregated to d² cells — no n-sized join), then run the
    fixed-round integer matrix squarings on the collected d²-cell
    matrix in NumPy (int64-exact, same sequence both engines — see
    the convergence note above), apply the md5-seeded start vector,
    and project every vector onto the resulting direction with an
    exact integer dot product. Output: (vec_id, pc1_q) — the score
    in squared micro-units; a pytest pins bit-equality to a NumPy
    replay AND |cos| ≈ 1 vs eigh's top eigenvector.

    Scale: the only n-sized stages are the gram build (one narrow
    shuffle, ≤d² partial-agg cells per task) and the final broadcast
    zip_with projection (map-only). Driver state is the 64-int mean
    and the d²=4096-int gram matrix — the same bounded O(d²) driver
    step as pca_project's eigh (whitelisted); iterating 4096-row
    frames on executors measured 12 s of pure scheduler overhead for
    work NumPy does in microseconds."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", to_double_array("embedding").alias("v")
    )
    xq_expr = F.expr(
        f"transform(v, x -> cast(round(x * {PCA_SCALE}, 0) as bigint))"
    )
    base = emb.select("vec_id", xq_expr.alias("xq"))
    # 64-int mean: exact int sums / count, rounded back to micro-units
    mean_rows = (
        base.select(F.posexplode("xq").alias("pos", "c"))
        .groupBy("pos")
        .agg(
            F.round(F.sum("c").cast("double") / F.count("*"), 0)
            .cast("long")
            .alias("mu")
        )
        .collect()
    )
    # empty corpus: both faces agree on an EMPTY result (the oracle's
    # CTE chain yields zero rows) instead of raising from the driver —
    # ADVICE r7 symmetry fix
    if not mean_rows:
        return spark.createDataFrame([], "vec_id bigint, pc1_q bigint")
    # fail fast on a non-64-dim corpus: the oracle's generate_series,
    # the v0 seed length, and the int64 exactness budget are all
    # calibrated for d=64 — a shorter/longer embedding would NULL-pad
    # the zip_with (silent hash divergence) or index out of range.
    # The oracle raises on the same condition (chk CTE), so the two
    # faces fail symmetrically on malformed corpora.
    if len(mean_rows) != 64:
        raise ValueError(
            f"pca_power_det is calibrated for 64-dim embeddings; got d={len(mean_rows)}"
        )
    mu = [0] * 64
    for r in mean_rows:
        mu[r["pos"]] = int(r["mu"])
    mu_lit = F.array(*[F.lit(m) for m in mu])
    cdf = base.select(
        "vec_id",
        F.zip_with("xq", mu_lit, lambda a, b: a - b).alias("cq"),
    )
    # integer gram matrix: per-row outer product exploded map-side,
    # partial-agg collapses to the cell count per task before the
    # shuffle. r15: only the UPPER TRIANGLE (j >= i) is computed —
    # the gram matrix is symmetric and ci*cj == cj*ci is the same
    # int64, so mirroring on the driver reproduces the full matrix
    # bit-for-bit while the explode volume halves (n·d²→n·d(d+1)/2;
    # measured 3.25 → 2.14 s at sf0.1, cells verified mirror-equal)
    pairs = cdf.select(
        F.explode(
            F.expr(
                "flatten(transform(cq, (ci, i) -> "
                "transform(slice(cq, i + 1, 64 - i), "
                "(cj, dj) -> struct(i, i + dj as j, ci * cj as p))))"
            )
        ).alias("s")
    ).select("s.i", "s.j", "s.p")
    m_rows = (
        pairs.groupBy("i", "j")
        .agg(
            F.round(F.sum("p").cast("double") / PCA_M_DIV, 0)
            .cast("long")
            .alias("m")
        )
        .collect()
    )

    import numpy as np

    # Spark F.round / DuckDB round() are HALF AWAY FROM ZERO;
    # np.round is banker's — use the engines' rule so the driver-side
    # squarings walk the identical integer sequence.
    def _r(a):
        return (np.sign(a) * np.floor(np.abs(a) + 0.5)).astype(np.int64)

    m = np.zeros((64, 64), dtype=np.int64)
    for row in m_rows:
        # upper-triangle cells mirrored into both halves (symmetric
        # gram; identical ints — see the pairs comment above)
        m[row["i"], row["j"]] = int(row["m"])
        m[row["j"], row["i"]] = int(row["m"])
    # every normalization divisor floors at 1: a corpus whose
    # variance is below the quantization granularity has an all-zero
    # gram matrix, and 0/0 would diverge across engines (nan vs
    # NULL) — with the floor, both engines deterministically score
    # every vector 0; non-degenerate inputs are untouched (the max
    # is >= 1 whenever any cell is nonzero)
    m = _r(m.astype(np.float64) * PCA_M_NORM / max(np.abs(m).max(), 1))
    for _ in range(PCA_SQUARINGS):
        sq = m @ m  # exact in int64: |entries| <= 64 * 1e16 < 2^63
        m = _r(sq.astype(np.float64) * PCA_M_NORM / max(np.abs(sq).max(), 1))
    w = m @ np.array(_pca_v0(), dtype=np.int64)
    v = _r(w.astype(np.float64) * PCA_SCALE / max(np.abs(w).max(), 1))
    v_lit = F.array(*[F.lit(int(x)) for x in v])
    return (
        cdf.select(
            "vec_id",
            F.aggregate(
                F.zip_with("cq", v_lit, lambda a, b: a * b),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias("pc1_q"),
        )
        .orderBy("vec_id")
    )


def _pca_power_oracle() -> str:
    # Every CTE that is referenced more than once (directly or via
    # the scalar-subquery max) is AS MATERIALIZED: DuckDB inlines
    # plain CTEs, and an inlined 7-round squaring chain doubles the
    # expression tree per round — 2^7 parquet re-scans exhausts file
    # descriptors before it exhausts patience.
    prelude = f"""
WITH chk AS MATERIALIZED (
  -- fail on a non-64-dim corpus exactly like the Spark face's
  -- ValueError (empty corpora pass and yield an empty result)
  SELECT CASE WHEN count(*) = 0
               OR (min(len(embedding)) = 64 AND max(len(embedding)) = 64)
              THEN 1 ELSE error('pca_power_det requires 64-dim embeddings') END AS ok
  FROM embeddings
), q AS MATERIALIZED (
  SELECT vec_id, g.p - 1 AS pos,
         CAST(round(CAST(embedding[g.p] AS DOUBLE) * {PCA_SCALE}, 0) AS BIGINT) AS xq
  FROM embeddings, generate_series(1, 64) AS g(p)
  WHERE (SELECT ok FROM chk) = 1
), mean_r AS MATERIALIZED (
  SELECT pos, CAST(round(CAST(sum(xq) AS DOUBLE) / count(*), 0) AS BIGINT) AS mu
  FROM q GROUP BY pos
), c AS MATERIALIZED (
  SELECT q.vec_id, q.pos, q.xq - m.mu AS cq FROM q JOIN mean_r m USING (pos)
), mraw AS MATERIALIZED (
  SELECT a.pos AS i, b.pos AS j,
         CAST(round(CAST(sum(a.cq * b.cq) AS DOUBLE) / {PCA_M_DIV}, 0) AS BIGINT) AS m
  FROM c a JOIN c b USING (vec_id) GROUP BY 1, 2
), m0 AS MATERIALIZED (
  SELECT i, j, CAST(round(CAST(m AS DOUBLE) * {PCA_M_NORM}
                    / (SELECT greatest(max(abs(m)), 1) FROM mraw), 0) AS BIGINT) AS m
  FROM mraw
), v0 AS (
  SELECT g.p - 1 AS pos,
         ('0x' || substr(md5('pca_' || (g.p - 1)), 1, 15))::BIGINT % 2001 - 1000 AS val
  FROM generate_series(1, 64) AS g(p)
)"""
    rounds = []
    for t in range(1, PCA_SQUARINGS + 1):
        rounds.append(f""", sq{t} AS MATERIALIZED (
  SELECT a.i, b.j, CAST(sum(a.m * b.m) AS BIGINT) AS m
  FROM m{t - 1} a JOIN m{t - 1} b ON a.j = b.i GROUP BY 1, 2
), m{t} AS MATERIALIZED (
  SELECT i, j, CAST(round(CAST(m AS DOUBLE) * {PCA_M_NORM}
                    / (SELECT greatest(max(abs(m)), 1) FROM sq{t}), 0) AS BIGINT) AS m
  FROM sq{t}
)""")
    k = PCA_SQUARINGS
    return (
        prelude
        + "".join(rounds)
        + f""", w AS MATERIALIZED (
  SELECT m{k}.i AS pos, CAST(sum(m{k}.m * v0.val) AS BIGINT) AS w
  FROM m{k} JOIN v0 ON m{k}.j = v0.pos GROUP BY 1
), v AS (
  SELECT pos,
         CAST(round(CAST(w AS DOUBLE) * {PCA_SCALE}
                    / (SELECT greatest(max(abs(w)), 1) FROM w), 0) AS BIGINT) AS val
  FROM w
)
SELECT c.vec_id, CAST(sum(c.cq * v.val) AS BIGINT) AS pc1_q
FROM c JOIN v ON c.pos = v.pos
GROUP BY 1 ORDER BY 1"""
    )


PCA_POWER_DET_SQL = _pca_power_oracle()


def pca_project_flat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registry wrapper: flatten the ``pc array<double>`` column to
    scalar pc0..pc7 — the gate's pandas canonicalizer can't sort/hash
    array cells (same fix as points_source). [rows-only: eigenvector
    signs are data-order ambiguous, so values aren't oracle-stable]"""
    out = pca_project(spark, sf_dir)
    k = 8
    return out.select(
        "vec_id", *[F.col("pc")[i].alias(f"pc{i}") for i in range(k)]
    ).orderBy("vec_id")


QUERIES = {
    "q_drift_detect": q_drift_detect,
    "embedding_normalize": embedding_normalize,
    "embedding_quantize": embedding_quantize,
    "tfidf_top_terms": tfidf_top_terms,
    "pca_project": pca_project_flat,
    "pca_power_det": pca_power_det,
}

ORACLES = {
    "q_drift_detect": Q_DRIFT_DETECT_SQL,
    "embedding_normalize": EMBEDDING_NORMALIZE_SQL,
    "embedding_quantize": EMBEDDING_QUANTIZE_SQL,
    "tfidf_top_terms": TFIDF_SQL,
    "pca_power_det": PCA_POWER_DET_SQL,
}
