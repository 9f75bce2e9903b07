"""Deterministic sampling / splitting / decontamination operators —
the reproducibility layer of a training-data pipeline.

``rand()``-based sampling is not reproducible across engines, runs,
or partitionings; every op here derives membership from a
content-independent hash of the primary key
(``conv(substr(md5(id),1,15),16,10)`` — 60 bits, portable to any
engine with md5), so the same document lands in the same
sample/split on Spark, DuckDB, or a 1000-executor cluster, and the
ops are hash-gated end to end.

Scale: all three are single-pass map-side hash + one keyed
aggregation — no joins except decontamination's shingle semi-join,
whose build side is the benchmark set (fixed cardinality in real
deployments: benchmarks don't grow with the corpus)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.numeric import fixed_point
from ..sources.readers import load_table
from .dedup import _spread, _tokens

SAMPLE_PCT = 20  # deterministic 20% sample
TRAIN_PCT, VAL_PCT = 80, 10  # 80/10/10 split


def _bucket(col):
    """Stable 0..99 bucket from the md5 of the key — identical in
    Spark and DuckDB (and any engine with md5 + hex parse)."""
    return (
        F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("long") % 100
    )


def sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language stats of a deterministic 20% document sample.
    ``sampled_id_sum`` pins exact membership (the gate hash then
    proves both engines selected the same documents, not just the
    same counts)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", (_bucket(F.col("doc_id")) < SAMPLE_PCT).alias("in_sample")
    )
    flag = F.col("in_sample").cast("long")
    return (
        docs.groupBy("lang")
        .agg(
            F.count("*").alias("n_total"),
            F.sum(flag).alias("n_sampled"),
            F.sum(flag * F.col("doc_id")).alias("sampled_id_sum"),
            fixed_point(F.sum(flag) / F.count("*"), 4).alias("frac"),
        )
        .orderBy("lang")
    )


SAMPLE_STRATIFIED_SQL = f"""
WITH h AS (
  SELECT doc_id, lang,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS bucket
  FROM documents
)
SELECT lang,
       CAST(count(*) AS BIGINT) AS n_total,
       CAST(sum(CASE WHEN bucket < {SAMPLE_PCT} THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled,
       CAST(sum(CASE WHEN bucket < {SAMPLE_PCT} THEN doc_id ELSE 0 END) AS BIGINT) AS sampled_id_sum,
       CAST(round((sum(CASE WHEN bucket < {SAMPLE_PCT} THEN 1 ELSE 0 END) * 1e0 / count(*)) * 1e4) AS BIGINT) / 1e4 AS frac
FROM h GROUP BY lang ORDER BY lang
"""


def sample_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test assignment, reported as
    per-(split, lang) counts with a membership checksum."""
    b = _bucket(F.col("doc_id"))
    split = (
        F.when(b < TRAIN_PCT, F.lit("train"))
        .when(b < TRAIN_PCT + VAL_PCT, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", split.alias("split")
    )
    return (
        docs.groupBy("split", "lang")
        .agg(F.count("*").alias("n_docs"), F.sum("doc_id").alias("id_sum"))
        .orderBy("split", "lang")
    )


SAMPLE_TRAIN_SPLIT_SQL = f"""
WITH h AS (
  SELECT doc_id, lang,
         ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS bucket
  FROM documents
)
SELECT CASE WHEN bucket < {TRAIN_PCT} THEN 'train'
            WHEN bucket < {TRAIN_PCT + VAL_PCT} THEN 'val'
            ELSE 'test' END AS split,
       lang,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(doc_id) AS BIGINT) AS id_sum
FROM h GROUP BY 1, 2 ORDER BY split, lang
"""

# 4-token shingles: long enough that cross-doc collisions mean real
# shared phrasing (3-grams flag a third of the synthetic corpus),
# short enough to produce hits; real decontamination uses 8-13
DECON_N = 4


def _ngram_shingles(n: int):
    idx = ", ".join(f"toks[i+{j}]" for j in range(n))
    return F.expr(
        f"array_distinct(transform(sequence(0, size(toks) - {n}), i -> concat_ws(' ', {idx})))"
    )


def decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag corpus documents that share at
    least one 4-token shingle with the held-out benchmark set (here:
    every 97th document, standing in for an eval suite).

    Map-side shingle explode on both sides, then a shingle-keyed join
    against the DISTINCT benchmark shingles. In production the
    benchmark side is fixed-size (eval suites don't scale with the
    corpus) and broadcasts; here the hint is left to AQE because the
    synthetic benchmark grows with SF. Output: contaminated doc_id +
    how many distinct benchmark shingles it shares."""
    docs = _spread(
        load_table(spark, sf_dir, "documents").select("doc_id", "text"), "doc_id"
    )
    toks = docs.select("doc_id", _tokens(F.col("text")).alias("toks")).filter(
        F.size("toks") >= DECON_N
    )
    # PIN the tokenized table before deriving both split branches:
    # the size(toks) filter is a genuine semantic predicate, but
    # pushed to the scan it re-evaluates the regexp tokenizer in the
    # Filter AND again in the Project, on each of the two branches —
    # 4 tokenizer passes over the corpus. The checkpoint runs it
    # once, full width, and both branches read the materialized toks.
    toks = toks.localCheckpoint(eager=True)
    sh = toks.select("doc_id", F.explode(_ngram_shingles(DECON_N)).alias("sh"))
    bench = sh.filter(F.col("doc_id") % 97 == 0).select("sh").distinct()
    corpus = sh.filter(F.col("doc_id") % 97 != 0)
    return (
        corpus.join(bench, "sh")
        .groupBy("doc_id")
        .agg(F.countDistinct("sh").alias("n_shared"))
        .orderBy("doc_id")
    )


_DECON_SHINGLE = " || ' ' || ".join(f"toks[i+{j}]" for j in range(DECON_N))

DECONTAMINATE_SQL = f"""
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents
), sh AS (
  SELECT doc_id, unnest(list_distinct([{_DECON_SHINGLE}
                                       for i in generate_series(1, len(toks) - {DECON_N - 1})])) AS sh
  FROM t WHERE len(toks) >= {DECON_N}
)
SELECT c.doc_id, CAST(count(DISTINCT c.sh) AS BIGINT) AS n_shared
FROM sh c JOIN (SELECT DISTINCT sh FROM sh WHERE doc_id % 97 = 0) b USING (sh)
WHERE c.doc_id % 97 <> 0
GROUP BY c.doc_id ORDER BY c.doc_id
"""

MIX_ALPHA = 0.7  # temperature exponent: upsample small sources


def corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixing: weight_s ∝ tokens_s^0.7 —
    the standard move for balancing corpus sources in a training mix
    (plain proportional sampling starves small sources; uniform
    over-trains them). Emits each source's share and its doc quota
    per 1000 sampled.

    One groupBy(source) over a map-side token count, then a global
    normalizer joined back via an unpartitioned window — safe because
    the grouped frame has one row per SOURCE (a catalog-sized set,
    thousands at most), not per document."""
    from pyspark.sql import Window as W

    per_src = (
        load_table(spark, sf_dir, "documents")
        .select("source", F.size(_tokens(F.col("text"))).alias("n_toks"))
        .groupBy("source")
        .agg(F.count("*").alias("n_docs"), F.sum("n_toks").alias("n_tokens"))
    )
    # Integer 1e-3 units of the temperature-scaled mass: the global
    # normalizer is then an exact BIGINT sum (a double sum over
    # sources is order-dependent), and every share below is a
    # deterministic ratio of exact integers.
    u = F.round(F.pow(F.col("n_tokens"), MIX_ALPHA) * 1000.0).cast("long")
    tot = F.sum(u).over(W.partitionBy())
    return (
        per_src.select(
            "source",
            "n_docs",
            "n_tokens",
            (F.round(u * 1e0 / tot * 10000.0).cast("long") / 10000.0).alias("weight"),
            F.floor(u * 1e0 / tot * 1000.0).cast("long").alias("docs_per_1000"),
        )
        .orderBy("source")
    )


CORPUS_MIX_SQL = f"""
WITH s AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(regexp_extract_all(lower(text), '[a-z0-9]+'))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
), su AS (
  SELECT source, n_docs, n_tokens,
         CAST(round(pow(n_tokens, {MIX_ALPHA}) * 1e3) AS BIGINT) AS u
  FROM s
), t AS (SELECT sum(u) AS tot FROM su)
SELECT source, n_docs, n_tokens,
       CAST(round(u * 1e0 / tot * 1e4) AS BIGINT) / 1e4 AS weight,
       CAST(floor(u * 1e0 / tot * 1e3) AS BIGINT) AS docs_per_1000
FROM su, t ORDER BY source
"""

PACK_BUDGET = 512  # tokens per training sequence
PACK_SHARDS = 8  # independent packing shards (scale: ~n_docs/50k)


def seq_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: place documents into fixed token-budget
    training sequences (budget 512 word-tokens), the step between a
    cleaned corpus and a dataloader. Greedy next-fit in doc_id order
    within each of 8 md5-hash shards; a doc longer than the budget
    gets a bin of its own (fill_frac > 1 marks it for truncation
    downstream). Emits one row per bin: size, token fill, and a
    doc_id checksum pinning exact membership.

    Scale: packing is inherently sequential, so the corpus is hash-
    sharded and each shard packs independently inside one Arrow batch
    (applyInPandas, O(shard) single pass); shard count grows with the
    corpus (~50k docs/shard) so no task sees unbounded data, and the
    kernel emits bin-level rows, not per-doc rows. The only shuffle
    is the shard hash-partition."""
    import pandas as pd

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        (
            F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
            .cast("long") % PACK_SHARDS
        ).alias("shard"),
        F.size(_tokens(F.col("text"))).alias("t"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        shard = int(pdf["shard"].iloc[0])
        out, bin_id, fill, n, chk = [], -1, 0, 0, 0
        for doc_id, t in zip(pdf["doc_id"], pdf["t"]):
            t = int(t)
            if bin_id < 0 or fill + t > PACK_BUDGET:
                if bin_id >= 0:
                    out.append((shard, bin_id, n, fill, chk))
                bin_id, fill, n, chk = bin_id + 1, t, 1, int(doc_id)
            else:
                fill, n, chk = fill + t, n + 1, chk + int(doc_id)
        if bin_id >= 0:
            out.append((shard, bin_id, n, fill, chk))
        return pd.DataFrame(
            out, columns=["shard", "bin", "n_docs", "bin_tokens", "id_checksum"]
        )

    packed = docs.groupBy("shard").applyInPandas(
        pack,
        schema="shard long, bin long, n_docs long, bin_tokens long, id_checksum long",
    )
    # fill_frac JVM-side: F.round is HALF_UP like DuckDB's round();
    # pandas .round is half-to-even and diverges on exact ties (k/512).
    return packed.select(
        "shard",
        "bin",
        "n_docs",
        "bin_tokens",
        F.round(F.col("bin_tokens") / PACK_BUDGET, 4).alias("fill_frac"),
        "id_checksum",
    ).orderBy("shard", "bin")


SEQ_PACK_SQL = f"""
WITH RECURSIVE d AS (
  SELECT shard, row_number() OVER (PARTITION BY shard ORDER BY doc_id) AS rn, doc_id, t
  FROM (
    SELECT ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % {PACK_SHARDS} AS shard,
           doc_id,
           len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t
    FROM documents)
), packed AS (
  SELECT shard, rn, doc_id, t, 0 AS bin, t AS fill FROM d WHERE rn = 1
  UNION ALL
  SELECT d.shard, d.rn, d.doc_id, d.t,
         CASE WHEN p.fill + d.t > {PACK_BUDGET} THEN p.bin + 1 ELSE p.bin END AS bin,
         CASE WHEN p.fill + d.t > {PACK_BUDGET} THEN d.t ELSE p.fill + d.t END AS fill
  FROM packed p JOIN d ON d.shard = p.shard AND d.rn = p.rn + 1
)
SELECT shard, CAST(bin AS BIGINT) AS bin,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(t) AS BIGINT) AS bin_tokens,
       round(sum(t) * 1e0 / {PACK_BUDGET}, 4) AS fill_frac,
       CAST(sum(doc_id) AS BIGINT) AS id_checksum
FROM packed GROUP BY shard, bin ORDER BY shard, bin
"""


def seq_pack_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing-efficiency report over ``seq_pack``'s bins — the eval
    face of the packing family (the dataloader-utilization numbers a
    training team actually reviews before committing a packing
    strategy): per shard, bin count, docs, token mass, PADDING tokens
    (budget minus fill over non-oversize bins), oversize-bin count
    (single docs past the budget, truncated downstream), and the
    padding fraction in scale-0 fixed point.

    Pure aggregation of the packer output — integer-only inputs, no
    new scale surface."""
    bins = seq_pack(spark, sf_dir)
    pad = F.greatest(F.lit(PACK_BUDGET) - F.col("bin_tokens"), F.lit(0))
    over = (F.col("bin_tokens") > PACK_BUDGET).cast("long")
    return (
        bins.groupBy("shard")
        .agg(
            F.count("*").alias("n_bins"),
            F.sum("n_docs").alias("n_docs"),
            F.sum("bin_tokens").alias("total_tokens"),
            F.sum(pad).alias("padding_tokens"),
            F.sum(over).alias("oversize_bins"),
            (
                F.round(
                    F.sum(pad) * F.lit(10000.0) / (F.count("*") * F.lit(PACK_BUDGET))
                ).cast("long")
                / 10000.0
            ).alias("padding_frac"),
        )
        .orderBy("shard")
    )


SEQ_PACK_EVAL_SQL = f"""
SELECT shard,
       CAST(count(*) AS BIGINT) AS n_bins,
       CAST(sum(n_docs) AS BIGINT) AS n_docs,
       CAST(sum(bin_tokens) AS BIGINT) AS total_tokens,
       CAST(sum(pad_t) AS BIGINT) AS padding_tokens,
       CAST(sum(CASE WHEN bin_tokens > {PACK_BUDGET} THEN 1 ELSE 0 END) AS BIGINT) AS oversize_bins,
       -- scale-0 round of an exact-integer ratio: a tie quotient
       -- k+0.5 is binary-exact, and both engines round it HALF_UP
       CAST(round(sum(pad_t) * 1e4 / (count(*) * {PACK_BUDGET})) AS BIGINT) / 1e4 AS padding_frac
FROM (
  SELECT p.*, greatest({PACK_BUDGET} - bin_tokens, 0) AS pad_t FROM ({{inner}}) p
) b
GROUP BY shard ORDER BY shard
""".format(inner=SEQ_PACK_SQL)


def seq_pack_contig(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concatenate-and-chunk packing — the OTHER industry packing
    mode next to ``seq_pack``'s greedy next-fit: conceptually
    concatenate every document's tokens in doc_id order into one
    stream and slice it into fixed PACK_BUDGET-token context
    windows; documents SPLIT across window boundaries (GPT-style
    pretraining packing, zero padding waste). Emits each doc's span
    in chunk space: (doc_id, n_tokens, start_offset, first_chunk,
    last_chunk, n_chunks, spans_boundary).

    Scale: the whole operator is one exact global token prefix sum —
    computed by ``ranking.global_prefix_sum``'s two-phase
    distributed scan (literal-cut buckets → parallel local running
    sums → bounded bucket-offset window → broadcast join), so no
    task ever sees an n-sized window. The oracle replays it as the
    naive ``sum() OVER (ORDER BY doc_id)`` — the hash match PROVES
    the distributed scan equals the single-window semantics. All
    arithmetic is int64 (token counts), so the result is
    partitioning-invariant by construction. Zero-token docs span
    nothing: n_chunks=0, NULL chunk ids (they still appear — the
    no-vanishing doctrine)."""
    from .ranking import global_prefix_sum

    docs = _spread(
        load_table(spark, sf_dir, "documents").select(
            "doc_id", F.size(_tokens(F.col("text"))).cast("long").alias("t")
        ),
        "doc_id",
    )
    ps = global_prefix_sum(
        docs, [F.col("doc_id")], F.col("doc_id"), F.col("t"), out="end_off"
    )
    start = F.col("end_off") - F.col("t")
    first = F.expr(f"(end_off - t) div {PACK_BUDGET}")
    last = F.expr(f"(end_off - 1) div {PACK_BUDGET}")
    has = F.col("t") > 0
    return ps.select(
        "doc_id",
        F.col("t").alias("n_tokens"),
        start.cast("long").alias("start_offset"),
        F.when(has, first).cast("long").alias("first_chunk"),
        F.when(has, last).cast("long").alias("last_chunk"),
        F.when(has, last - first + 1).otherwise(F.lit(0)).cast("long").alias("n_chunks"),
        F.coalesce(last > first, F.lit(False)).alias("spans_boundary"),
    ).orderBy("doc_id")


SEQ_PACK_CONTIG_SQL = f"""
WITH t AS (
  SELECT doc_id, len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS t FROM documents
), ps AS (
  SELECT doc_id, t,
         sum(t) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS end_off
  FROM t
)
SELECT doc_id,
       CAST(t AS BIGINT) AS n_tokens,
       CAST(end_off - t AS BIGINT) AS start_offset,
       CAST(CASE WHEN t > 0 THEN (end_off - t) // {PACK_BUDGET} END AS BIGINT) AS first_chunk,
       CAST(CASE WHEN t > 0 THEN (end_off - 1) // {PACK_BUDGET} END AS BIGINT) AS last_chunk,
       CAST(CASE WHEN t > 0 THEN (end_off - 1) // {PACK_BUDGET} - (end_off - t) // {PACK_BUDGET} + 1
                 ELSE 0 END AS BIGINT) AS n_chunks,
       coalesce((end_off - 1) // {PACK_BUDGET} > (end_off - t) // {PACK_BUDGET}, false)
         AS spans_boundary
FROM ps ORDER BY doc_id
"""


WS_K = 50  # weighted-sample size


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis):
    each doc draws u ∈ (0,1] from a DETERMINISTIC md5 hash of its id
    and is ranked by -ln(u)/w with w = n_chars; the k smallest keys
    are an exact weighted sample — long docs proportionally more
    likely, same selection on every engine and every run. This is
    how a pipeline takes a quality- or length-weighted subsample
    reproducibly (rand()-based sampling can't be replayed or gated).

    One map-side key computation + a global top-k (TakeOrdered — no
    full sort at scale).

    Zero-weight docs (n_chars = 0, i.e. empty text) are excluded up
    front: Efraimidis–Spirakis requires w > 0, and a weight of zero
    means "never sampled" — filtering is the exact semantics (and
    avoids an ANSI divide-by-zero on real corpora, which do contain
    empty documents)."""
    docs = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "n_chars")
        .filter(F.col("n_chars") > 0)
    )
    # 60-bit md5 → u in (0, 1]; +1 avoids u=0
    u = (
        F.conv(F.substring(F.md5(F.concat(F.lit("ws:"), F.col("doc_id").cast("string"))), 1, 15), 16, 10)
        .cast("double")
        + 1.0
    ) / float(1 << 60)
    key = -F.log(u) / F.col("n_chars")
    return (
        docs.select("doc_id", "n_chars", F.round(key * 1e6, 6).alias("sample_key"))
        .orderBy("sample_key", "doc_id")
        .limit(WS_K)
    )


Q_WEIGHTED_SAMPLE_SQL = f"""
SELECT doc_id, n_chars,
       round(-ln((('0x' || substr(md5('ws:' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT::DOUBLE + 1.0)
                 / {float(1 << 60)}) / n_chars * 1e6, 6) AS sample_key
FROM documents
WHERE n_chars > 0
ORDER BY sample_key, doc_id
LIMIT {WS_K}
"""


SHUF_SEED = "shuf1:"
SHUF_SHARD_SIZE = 64  # docs per training shard


def corpus_train_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training shuffle: every document gets a
    seeded 60-bit md5 permutation key, the corpus is EXACTLY ranked
    in key order, and rank is folded into fixed-size training shards
    (shard = rank div SHUF_SHARD_SIZE, pos = rank mod
    SHUF_SHARD_SIZE) — the "shuffle then shard" step every
    pretraining pipeline runs before writing webdataset /
    arrayrecord-style shards. Seeded hash (not rand()) means the
    same permutation on every engine, every run, every partitioning
    — resumable and auditable.

    Scale: the rank comes from operators.ranking.global_rank (range
    bucketing by the key + per-bucket local windows + broadcast
    prefix offsets) — there is NO unpartitioned n-sized window and
    no driver-side sort; output is shuffled once by the rank's
    bucket key. The oracle replays the identical permutation with a
    plain row_number() at gate scale."""
    from .ranking import global_rank

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    skey = F.conv(
        F.substring(F.md5(F.concat(F.lit(SHUF_SEED), F.col("doc_id").cast("string"))), 1, 15),
        16,
        10,
    ).cast("long")
    keyed = docs.select("doc_id", skey.alias("skey"))
    ranked = global_rank(
        keyed, [F.col("skey"), F.col("doc_id")], F.col("skey"), out="rank"
    )
    r0 = F.col("rank") - 1
    return ranked.select(
        "doc_id",
        "skey",
        (r0 / SHUF_SHARD_SIZE).cast("long").alias("shard"),
        (r0 % SHUF_SHARD_SIZE).cast("long").alias("pos"),
    ).orderBy("shard", "pos")


CORPUS_TRAIN_SHUFFLE_SQL = f"""
WITH keyed AS (
  SELECT doc_id,
         ('0x' || substr(md5('{SHUF_SEED}' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS skey
  FROM documents
), ranked AS (
  SELECT doc_id, skey,
         row_number() OVER (ORDER BY skey, doc_id) - 1 AS r0
  FROM keyed
)
SELECT doc_id, skey,
       CAST(r0 // {SHUF_SHARD_SIZE} AS BIGINT) AS shard,
       CAST(r0 % {SHUF_SHARD_SIZE} AS BIGINT) AS pos
FROM ranked ORDER BY shard, pos
"""


QUERIES = {
    "corpus_train_shuffle": corpus_train_shuffle,
    "q_weighted_sample": q_weighted_sample,
    "sample_stratified": sample_stratified,
    "corpus_mix": corpus_mix,
    "sample_train_split": sample_train_split,
    "decontaminate": decontaminate,
    "seq_pack": seq_pack,
    "seq_pack_eval": seq_pack_eval,
    "seq_pack_contig": seq_pack_contig,
}

ORACLES = {
    "corpus_train_shuffle": CORPUS_TRAIN_SHUFFLE_SQL,
    "q_weighted_sample": Q_WEIGHTED_SAMPLE_SQL,
    "sample_stratified": SAMPLE_STRATIFIED_SQL,
    "corpus_mix": CORPUS_MIX_SQL,
    "sample_train_split": SAMPLE_TRAIN_SPLIT_SQL,
    "decontaminate": DECONTAMINATE_SQL,
    "seq_pack": SEQ_PACK_SQL,
    "seq_pack_eval": SEQ_PACK_EVAL_SQL,
    "seq_pack_contig": SEQ_PACK_CONTIG_SQL,
}
