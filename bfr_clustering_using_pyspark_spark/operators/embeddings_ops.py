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
}

ORACLES = {
    "q_drift_detect": Q_DRIFT_DETECT_SQL,
    "embedding_normalize": EMBEDDING_NORMALIZE_SQL,
    "embedding_quantize": EMBEDDING_QUANTIZE_SQL,
    "tfidf_top_terms": TFIDF_SQL,
}
