"""End-to-end corpus curation funnel.

``corpus_curate`` chains the individual pipeline operators this
package already ships — quality gate → canonical exact-dedup →
benchmark decontamination → RAG chunking — into ONE DataFrame plan
and reports the funnel: one row per stage with docs-in / docs-out.
This is the shape of a real training-data build: the per-stage
operators (textstats.text_quality, dedup.dedup_exact,
sampling.decontaminate, textstats.doc_chunk) are the unit-testable
faces; this is the composition a pipeline run would actually submit.

Scale notes:
- All per-doc flags are computed in ONE pass over the documents
  scan; the only shuffles are the canonical-key window (hash on
  k_canon) and the shingle join (hash on the 4-gram), both keyed on
  data-bounded values — the same posture as the standalone ops.
- The eval-suite side of the decontamination join is fixed-size in
  production (eval suites don't grow with the corpus) and would
  broadcast; here it scales with SF so the hint is left to AQE.
- Every output is an integer count — nothing in the result depends
  on float summation order or rounding, so the oracle hash is exact
  by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from ..sources.readers import load_table
from .sampling import DECON_N, _DECON_SHINGLE, _ngram_shingles
from .textstats import (
    CHUNK_STRIDE,
    TOKEN_RE,
    _tokens,
    quality_flag_expr,
    quality_gate_sql,
)


def corpus_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation funnel. Stage semantics (each stage filters the
    previous stage's survivors):

    1. ``quality`` — the composite gate from ``text_quality``.
    2. ``dedup`` — keep the smallest doc_id per canonical
       (normalized-token-stream) md5 key AMONG quality survivors.
    3. ``decontam`` — drop eval-suite members (doc_id % 97 == 0, the
       same held-out convention as ``decontaminate``) and any doc
       sharing a 4-token shingle with that suite.
    4. ``chunk`` — docs_out is the TOTAL CHUNK COUNT the survivors
       produce under ``doc_chunk``'s 32/24 windows (ceil(n/24), one
       chunk per stride boundary).
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.select(
        "doc_id",
        _tokens(F.col("text")).alias("toks"),
        quality_flag_expr(F.col("text")).alias("q"),
        F.md5(F.array_join(_tokens(F.col("text")), " ")).alias("k_canon"),
    ).withColumn("n_toks", F.size("toks"))
    # PIN the tokenized/flagged base: five lineage branches consume it
    # (dedup window, bench + corpus shingle splits, the funnel counts,
    # the final anti-join) and each would re-run the tokenizer +
    # quality regexps + canonical md5 from the scan
    base = base.localCheckpoint(eager=True)
    # dedup among quality survivors: smallest passing doc_id per key
    keep_id = F.min(F.when(F.col("q"), F.col("doc_id"))).over(W.partitionBy("k_canon"))
    flagged = base.withColumn("survives_dedup", F.col("q") & (F.col("doc_id") == keep_id))
    # eval-suite shingles come from the FULL corpus (the suite is
    # external input — its members' quality is irrelevant)
    sh = base.filter(F.size("toks") >= DECON_N).select(
        "doc_id", F.explode(_ngram_shingles(DECON_N)).alias("sh")
    )
    bench = sh.filter(F.col("doc_id") % 97 == 0).select("sh").distinct()
    contaminated = (
        sh.filter(F.col("doc_id") % 97 != 0).join(bench, "sh").select("doc_id").distinct()
    )
    final = (
        flagged.filter("survives_dedup")
        .filter(F.col("doc_id") % 97 != 0)
        .join(contaminated, "doc_id", "left_anti")
    )
    # exact integer chunk count: one chunk per stride boundary < n
    n_chunks = F.sum(F.expr(f"CAST((n_toks + {CHUNK_STRIDE - 1}) DIV {CHUNK_STRIDE} AS BIGINT)"))
    counts = flagged.agg(
        F.count("*").alias("n0"),
        F.sum(F.col("q").cast("long")).alias("n1"),
        F.sum(F.col("survives_dedup").cast("long")).alias("n2"),
    )
    finals = final.agg(F.count("*").alias("n3"), n_chunks.alias("n4"))
    # PIN the 1-row funnel totals: the 4-stage union below selects
    # from this frame four times, and without the pin each select
    # RE-EXECUTES the whole funnel lineage (observed: 4 copies of the
    # decontamination filters in one plan) — the cheapest possible
    # checkpoint, one row
    row = counts.crossJoin(F.broadcast(finals)).localCheckpoint(eager=True)
    stages = [
        ("1_quality", "n0", "n1"),
        ("2_dedup", "n1", "n2"),
        ("3_decontam", "n2", "n3"),
        ("4_chunk", "n3", "n4"),
    ]
    out = None
    for name, cin, cout in stages:
        stage_row = row.select(
            F.lit(name).alias("stage"),
            F.col(cin).alias("docs_in"),
            F.col(cout).alias("docs_out"),
        )
        out = stage_row if out is None else out.unionByName(stage_row)
    return out.orderBy("stage")


CORPUS_CURATE_SQL = f"""
WITH base AS (
  SELECT doc_id, text,
         regexp_extract_all(lower(text), '{TOKEN_RE}') AS toks,
         md5(coalesce(array_to_string(regexp_extract_all(lower(text), '{TOKEN_RE}'), ' '), '')) AS k_canon,
         {quality_gate_sql('text')} AS q
  FROM documents
), flagged AS (
  SELECT *, len(toks) AS n_toks,
         q AND doc_id = min(CASE WHEN q THEN doc_id END) OVER (PARTITION BY k_canon)
           AS survives_dedup
  FROM base
), sh AS (
  SELECT doc_id, unnest(list_distinct([{_DECON_SHINGLE}
                                       for i in generate_series(1, len(toks) - {DECON_N - 1})])) AS sh
  FROM base WHERE len(toks) >= {DECON_N}
), contaminated AS (
  SELECT DISTINCT c.doc_id
  FROM sh c JOIN (SELECT DISTINCT sh FROM sh WHERE doc_id % 97 = 0) b USING (sh)
  WHERE c.doc_id % 97 <> 0
), final AS (
  SELECT f.* FROM flagged f
  WHERE survives_dedup AND doc_id % 97 <> 0
    AND NOT EXISTS (SELECT 1 FROM contaminated c WHERE c.doc_id = f.doc_id)
), counts AS (
  SELECT (SELECT count(*) FROM flagged) AS n0,
         (SELECT count(*) FROM flagged WHERE q) AS n1,
         (SELECT count(*) FROM flagged WHERE survives_dedup) AS n2,
         (SELECT count(*) FROM final) AS n3,
         (SELECT coalesce(sum((n_toks + {CHUNK_STRIDE - 1}) // {CHUNK_STRIDE}), 0) FROM final) AS n4
)
SELECT '1_quality' AS stage, CAST(n0 AS BIGINT) AS docs_in, CAST(n1 AS BIGINT) AS docs_out FROM counts
UNION ALL
SELECT '2_dedup', CAST(n1 AS BIGINT), CAST(n2 AS BIGINT) FROM counts
UNION ALL
SELECT '3_decontam', CAST(n2 AS BIGINT), CAST(n3 AS BIGINT) FROM counts
UNION ALL
SELECT '4_chunk', CAST(n3 AS BIGINT), CAST(n4 AS BIGINT) FROM counts
ORDER BY stage
"""


def corpus_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix — the mixture-design audit
    every multi-source corpus needs before setting sampling weights:
    for every pair of sources, how much verbatim phrasing they share
    (distinct 4-token shingles in both), plus the shingle-set
    Jaccard. Two sources with high overlap double-count their
    content in a training mix; this is the measurement that catches
    it (the pairwise face of ``decontaminate``, which compares the
    corpus against one benchmark side).

    Scale: one tokenize+shingle pass reduced to DISTINCT
    (source, shingle) — the frame is min(corpus shingles, sources ×
    vocabulary) and catalog-bounded in the source dimension; the
    self-join fans out ≤ |sources| rows per shingle (never doc×doc),
    and the pair matrix is |sources|² — a few thousand rows for any
    real catalog. The pair spine is built from per-source totals, so
    zero-overlap pairs report 0 (no-vanishing doctrine). Jaccard is
    floored at 6dp from exact integer counts."""
    docs = load_table(spark, sf_dir, "documents").select(
        "source", _tokens(F.col("text")).alias("toks")
    ).filter(F.size("toks") >= DECON_N)
    # one materialized shingle-set frame serving the self-join's BOTH
    # sides and the per-source totals (the decontaminate doctrine:
    # without truncation the tokenizer re-runs per consumer)
    sh = (
        docs.select("source", F.explode(_ngram_shingles(DECON_N)).alias("sh"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    per_src = sh.groupBy("source").agg(F.count("*").alias("n_sh"))
    pairs = (
        sh.alias("a")
        .join(
            sh.alias("b"),
            (F.col("a.sh") == F.col("b.sh")) & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"), F.col("b.source").alias("source_b")
        )
        .agg(F.count("*").alias("n_shared"))
    )
    spine = (
        per_src.alias("x")
        .crossJoin(F.broadcast(per_src.alias("y")))
        .filter(F.col("x.source") < F.col("y.source"))
        .select(
            F.col("x.source").alias("source_a"),
            F.col("y.source").alias("source_b"),
            F.col("x.n_sh").alias("n_a"),
            F.col("y.n_sh").alias("n_b"),
        )
    )
    shared = F.coalesce(F.col("n_shared"), F.lit(0))
    return (
        spine.join(pairs, ["source_a", "source_b"], "left")
        .select(
            "source_a",
            "source_b",
            shared.cast("long").alias("n_shared"),
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            (
                F.floor(shared * F.lit(1e6) / (F.col("n_a") + F.col("n_b") - shared))
                / F.lit(1e6)
            ).alias("jaccard"),
        )
        .orderBy("source_a", "source_b")
    )


CORPUS_SOURCE_OVERLAP_SQL = f"""
WITH t AS (
  SELECT source, regexp_extract_all(lower(text), '{TOKEN_RE}') AS toks FROM documents
), sh AS (
  SELECT DISTINCT source, unnest(list_distinct([{_DECON_SHINGLE}
                                 for i in generate_series(1, len(toks) - {DECON_N - 1})])) AS sh
  FROM t WHERE len(toks) >= {DECON_N}
), ps AS (
  SELECT source, count(*) AS n_sh FROM sh GROUP BY source
), pr AS (
  SELECT a.source AS source_a, b.source AS source_b, count(*) AS n_shared
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.source < b.source
  GROUP BY 1, 2
), spine AS (
  SELECT x.source AS source_a, y.source AS source_b, x.n_sh AS n_a, y.n_sh AS n_b
  FROM ps x JOIN ps y ON x.source < y.source
)
SELECT s.source_a, s.source_b,
       CAST(coalesce(p.n_shared, 0) AS BIGINT) AS n_shared,
       CAST(s.n_a AS BIGINT) AS n_a,
       CAST(s.n_b AS BIGINT) AS n_b,
       floor(coalesce(p.n_shared, 0) * 1e6 / (s.n_a + s.n_b - coalesce(p.n_shared, 0))) / 1e6
         AS jaccard
FROM spine s LEFT JOIN pr p ON s.source_a = p.source_a AND s.source_b = p.source_b
ORDER BY s.source_a, s.source_b
"""


# Quality-staged epoch weighting ("data-constrained scaling" plan):
# high-quality long docs are worth several epochs, marginal docs one,
# gate failures zero. The per-stage token budgets + effective epochs
# are the artifact a pretraining data plan actually ships next to
# corpus_mix's source weights.
EPOCH_STAGES = (
    # (stage, epochs): 0 = high (quality AND >= EPOCH_MIN_TOKS), 1 =
    # mid (quality, shorter), 2 = dropped (fails the gate)
    (0, 3),
    (1, 1),
    (2, 0),
)
EPOCH_MIN_TOKS = 50


def corpus_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stage epoch plan over the corpus: stage each document by
    the composite quality gate + token-count threshold, attach the
    stage's epoch multiplier, and report per-stage doc/token masses,
    effective (epoch-weighted) tokens, and each stage's share of the
    total effective budget (scale-0 fixed point).

    One scan + one 3-row aggregation + a broadcast total join —
    embarrassingly parallel at any corpus size."""
    from ..operators.textstats import quality_flag_expr

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_toks = F.size(_tokens(F.col("text")))
    q = quality_flag_expr(F.col("text"))
    stage = (
        F.when(q & (n_toks >= EPOCH_MIN_TOKS), F.lit(0))
        .when(q, F.lit(1))
        .otherwise(F.lit(2))
    )
    epochs_map = {s: e for s, e in EPOCH_STAGES}
    epochs = F.create_map(
        *[F.lit(x) for kv in epochs_map.items() for x in kv]
    )[stage]
    staged = docs.select(
        stage.alias("stage"), epochs.alias("epochs"), n_toks.alias("t")
    )
    per = staged.groupBy("stage", "epochs").agg(
        F.count("*").alias("n_docs"), F.sum("t").alias("n_tokens")
    )
    per = per.withColumn(
        "effective_tokens", (F.col("epochs") * F.col("n_tokens")).cast("long")
    )
    tot = per.agg(F.sum("effective_tokens").alias("tot"))
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            F.col("stage").cast("int").alias("stage"),
            F.col("epochs").cast("int").alias("epochs"),
            F.col("n_docs").cast("long").alias("n_docs"),
            F.col("n_tokens").cast("long").alias("n_tokens"),
            "effective_tokens",
            (
                F.round(
                    F.col("effective_tokens")
                    * F.lit(10000.0)
                    / F.greatest(F.col("tot"), F.lit(1))
                ).cast("long")
                / 10000.0
            ).alias("token_share"),
        )
        .orderBy("stage")
    )


CORPUS_EPOCH_PLAN_SQL = f"""
WITH base AS (
  SELECT doc_id,
         len(regexp_extract_all(lower(text), '{TOKEN_RE}')) AS t,
         {quality_gate_sql('text')} AS q
  FROM documents
), staged AS (
  SELECT CASE WHEN q AND t >= {EPOCH_MIN_TOKS} THEN 0
              WHEN q THEN 1 ELSE 2 END AS stage, t
  FROM base
), per AS (
  SELECT stage,
         CASE stage WHEN 0 THEN 3 WHEN 1 THEN 1 ELSE 0 END AS epochs,
         count(*) AS n_docs, sum(t) AS n_tokens
  FROM staged GROUP BY stage
), eff AS (
  SELECT stage, epochs, n_docs, n_tokens,
         CAST(epochs * n_tokens AS BIGINT) AS effective_tokens
  FROM per
), tot AS (SELECT sum(effective_tokens) AS tot FROM eff)
SELECT CAST(stage AS INT) AS stage, CAST(epochs AS INT) AS epochs,
       CAST(n_docs AS BIGINT) AS n_docs, CAST(n_tokens AS BIGINT) AS n_tokens,
       effective_tokens,
       CAST(round(effective_tokens * 1e4 / greatest(t.tot, 1)) AS BIGINT) / 1e4 AS token_share
FROM eff CROSS JOIN tot t
ORDER BY stage
"""


QUERIES = {
    "corpus_epoch_plan": corpus_epoch_plan,
    "corpus_curate": corpus_curate,
    "corpus_source_overlap": corpus_source_overlap,
}
ORACLES = {
    "corpus_epoch_plan": CORPUS_EPOCH_PLAN_SQL,
    "corpus_curate": CORPUS_CURATE_SQL,
    "corpus_source_overlap": CORPUS_SOURCE_OVERLAP_SQL,
}
