"""Source/sink format coverage beyond parquet: ORC and JSON-lines
roundtrips, hash-gated END TO END — each query writes the documents
table through the Spark sink, reads it back through the matching
source, and aggregates; the DuckDB oracle computes the same
aggregate from the original parquet, so a hash match proves the
sink + source preserved every row and column it touched.

Scale: both writes are plain distributed sinks (one file per
partition, no driver materialization); the readback is a normal
distributed scan. The aggregate includes sum(length(text)) so text
content — the column most at risk under JSON escaping — is part of
the proof, not just row counts.
"""

from __future__ import annotations

import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table


def _pin_and_cleanup(df: DataFrame, tmpdir: str) -> DataFrame:
    """Pin a SMALL result with an eager localCheckpoint, then delete
    the staging directory — repeated bench/gate runs must not leak
    shard/chunk dirs on disk. The checkpoint severs the plan's
    reference to the staged files, so the rmtree is safe."""
    try:
        return df.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmpdir, ignore_errors=True)


def _roundtrip(spark: SparkSession, sf_dir: str, fmt: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    out = tempfile.mkdtemp(prefix=f"{fmt}_rt_")
    docs.write.mode("overwrite").format(fmt).save(out)
    back = spark.read.format(fmt).load(out)
    return _pin_and_cleanup(
        back.groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.sum(F.length("text")).alias("sum_text_len"),
            F.sum("doc_id").alias("id_checksum"),
        )
        .orderBy("lang", "source"),
        out,
    )


def orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents → ORC sink → ORC source → per-(lang, source)
    aggregate. ORC is Spark's second first-class columnar format
    (vectorized reader, predicate pushdown); the hash gate proves
    the full write/read path, not a smoke test."""
    return _roundtrip(spark, sf_dir, "orc")


def json_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents → JSON-lines sink → schema'd JSON source →
    aggregate. Exercises string escaping (newlines, quotes) through
    a real serialize/parse cycle."""
    return _roundtrip(spark, sf_dir, "json")


def csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents → CSV sink → schema'd CSV source → the same
    hash-gated aggregate. CSV is the interchange format most likely
    to CORRUPT data (delimiters, quotes, embedded newlines), so the
    readback uses explicit schema + header + multiLine + matching
    quote/escape — and the content fingerprint in the aggregate
    proves every text byte survived the quoting cycle. (Avro's
    DataSource connector is an external package not present in this
    environment; CSV completes the built-in format matrix
    parquet/ORC/JSON/CSV.)

    Scale note: multiLine CSV is not split-within-file (quoted
    newlines defeat offset splitting), so read parallelism equals the
    FILE count — which the distributed writer already made one per
    partition; keep files bounded (maxRecordsPerFile) and the
    non-splittable parse stays fully parallel."""
    docs = load_table(spark, sf_dir, "documents")
    out = tempfile.mkdtemp(prefix="csv_rt_")
    (
        docs.write.mode("overwrite")
        .options(header=True, quote='"', escape='"')
        .csv(out)
    )
    back = spark.read.options(
        header=True, multiLine=True, quote='"', escape='"'
    ).schema("doc_id long, text string, lang string, source string, n_chars long").csv(out)
    return _pin_and_cleanup(
        back.groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.sum(F.length("text")).alias("sum_text_len"),
            F.sum("doc_id").alias("id_checksum"),
        )
        .orderBy("lang", "source"),
        out,
    )


_ROUNDTRIP_SQL = """
SELECT lang, source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       CAST(sum(length(text)) AS BIGINT) AS sum_text_len,
       CAST(sum(doc_id) AS BIGINT) AS id_checksum
FROM documents GROUP BY lang, source ORDER BY lang, source
"""

N_BUCKETS = 8


def q_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-located fact-to-fact join via bucketed storage — the layout
    that kills the #1 cost at 100 TB. Both orders and lineitem are
    written ``bucketBy(8, orderkey)`` + ``sortBy``; Spark's bucketed
    scan then feeds the sort-merge join with NO Exchange on either
    side (tests assert exactly one shuffle in the whole query — the
    final year rollup — vs three for the plain-parquet plan). At
    scale this is the difference between re-shuffling two fact tables
    on every join and a map-side merge forever after.

    Revenue is exact scaled-integer (price-cents × discount-bps), so
    the hash gate is engine-stable end to end: write → bucketed scan
    → merge join → rollup."""
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    # an in-memory catalog forgets tables between sessions but the
    # warehouse directory persists — clear both or saveAsTable fails
    # with LOCATION_ALREADY_EXISTS on the next fresh session
    import os
    import shutil
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")).path
    for t in ("bkt_orders", "bkt_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(os.path.join(wh, t), ignore_errors=True)
    (
        orders.write.bucketBy(N_BUCKETS, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("bkt_orders")
    )
    (
        li.write.bucketBy(N_BUCKETS, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("bkt_lineitem")
    )
    o, l = spark.table("bkt_orders"), spark.table("bkt_lineitem")
    rev_e4 = F.round(F.col("l_extendedprice") * 100).cast("long") * (
        100 - F.round(F.col("l_discount") * 100).cast("long")
    )
    # hint("merge") keeps the join an SMJ (the fact-fact strategy the
    # bucketing serves) even where AQE would broadcast at small SF
    return (
        l.join(o.hint("merge"), l.l_orderkey == o.o_orderkey)
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(F.count("*").alias("n_items"), F.sum(rev_e4).alias("rev_e4"))
        .orderBy("o_year")
    )


Q_BUCKETED_JOIN_SQL = """
SELECT year(o_orderdate) AS o_year,
       CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS rev_e4
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1 ORDER BY o_year
"""

COMPACT_SMALL = 64  # deliberately-fragmented input file count
COMPACT_TARGET = 4  # files after compaction


def sink_compact_small_files(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-files compaction — the table-maintenance op every
    long-lived 100 TB lake runs: stage the documents table as
    ``COMPACT_SMALL`` deliberately tiny parquet files (the streaming-
    ingest fragmentation pattern), compact by reading them back and
    rewriting at ``COMPACT_TARGET`` files, then prove NO ROW was
    lost or duplicated with the same hash-gated aggregate the
    roundtrip keys use. Tests separately assert the physical file
    count actually shrank 64 → ≤4.

    Scale: compaction is a plain distributed read → repartition →
    write (at real scale pick partitions from bytes/target-size and
    bound files with maxRecordsPerFile); nothing touches the driver.
    """
    docs = load_table(spark, sf_dir, "documents")
    out = tempfile.mkdtemp(prefix="compact_")
    small_dir, big_dir = f"{out}/small", f"{out}/compacted"
    docs.repartition(COMPACT_SMALL).write.mode("overwrite").parquet(small_dir)
    spark.read.parquet(small_dir).repartition(COMPACT_TARGET).write.mode(
        "overwrite"
    ).parquet(big_dir)
    back = spark.read.parquet(big_dir)
    return _pin_and_cleanup(
        back.groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.sum(F.length("text")).alias("sum_text_len"),
            F.sum("doc_id").alias("id_checksum"),
        )
        .orderBy("lang", "source"),
        out,
    )


def q_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet SCHEMA EVOLUTION via ``mergeSchema`` — the lake-format
    reality that a table's files span schema versions: write an old
    "v1" slice of orders (no priority column) and a new "v2" slice
    (priority added) as separate file groups in one table directory,
    read the whole table back with ``mergeSchema=true`` (v1 rows
    surface NULL priority), and aggregate per status × priority.
    The hash gate proves the merged read loses no rows and NULLs
    exactly the pre-evolution slice — replayed by the oracle as a
    CASE on the version split."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )
    out = tempfile.mkdtemp(prefix="schevo_")
    v1 = orders.filter(F.col("o_orderkey") % 2 == 0).drop("o_orderpriority")
    v2 = orders.filter(F.col("o_orderkey") % 2 == 1)
    v1.write.mode("overwrite").parquet(f"{out}/part=v1")
    v2.write.mode("overwrite").parquet(f"{out}/part=v2")
    back = spark.read.option("mergeSchema", "true").parquet(out)
    cents = F.round(F.col("o_totalprice") * 100.0).cast("long")
    return _pin_and_cleanup(
        back.groupBy(
            "o_orderstatus",
            F.coalesce("o_orderpriority", F.lit("<pre-evolution>")).alias("priority"),
        )
        .agg(F.count("*").alias("n"), F.sum(cents).alias("total_cents"))
        .orderBy("o_orderstatus", "priority"),
        out,
    )


Q_SCHEMA_EVOLUTION_SQL = """
SELECT o_orderstatus,
       CASE WHEN o_orderkey % 2 = 0 THEN '<pre-evolution>'
            ELSE o_orderpriority END AS priority,
       count(*) AS n,
       CAST(sum(CAST(round(o_totalprice * 1e2) AS BIGINT)) AS BIGINT) AS total_cents
FROM orders
GROUP BY 1, 2 ORDER BY o_orderstatus, priority
"""


N_SHARDS = 16


def sink_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data delivery sink: hash-shard the documents table
    into N_SHARDS JSONL shard directories (``partitionBy`` on a
    portable md5-derived shard key), read the shards BACK through
    the JSON source, and emit the delivery manifest — per shard: row
    count, char count, and an ORDER-INSENSITIVE content fingerprint
    (exact BIGINT sum of a 40-bit md5 prefix per row). A hash match
    against the oracle — the same stats straight off the original
    parquet — proves the sharded write → read cycle preserved every
    row, not just the counts.

    Scale: the shard key is a pure per-row expression and
    ``partitionBy`` lets every task write to every shard (no
    single-writer bottleneck; at 100 TB add maxRecordsPerFile to
    bound file sizes within shards). The 40-bit row fingerprint
    keeps a shard's sum under 2^63 to ~8e6 rows/shard — add shards,
    not prefix bits, beyond that."""
    docs = load_table(spark, sf_dir, "documents")
    shard = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("int")
        % N_SHARDS
    )
    out = tempfile.mkdtemp(prefix="shards_")
    (
        docs.withColumn("shard", shard)
        .write.mode("overwrite")
        .partitionBy("shard")
        .json(out)
    )
    back = spark.read.json(out)  # shard restored from partition dirs
    row_fp = F.conv(F.substring(F.md5("text"), 1, 10), 16, 10).cast("long")
    return _pin_and_cleanup(
        back.groupBy(F.col("shard").cast("int").alias("shard"))
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.length("text")).alias("n_chars"),
            F.sum(row_fp).alias("content_fp"),
        )
        .orderBy("shard"),
        out,
    )


SINK_SHARD_MANIFEST_SQL = f"""
SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::BIGINT
            % {N_SHARDS} AS INT) AS shard,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(length(text)) AS BIGINT) AS n_chars,
       CAST(sum(('0x' || substr(md5(text), 1, 10))::BIGINT) AS BIGINT) AS content_fp
FROM documents GROUP BY 1 ORDER BY shard
"""


QUERIES = {
    "orc_roundtrip": orc_roundtrip,
    "json_roundtrip": json_roundtrip,
    "csv_roundtrip": csv_roundtrip,
    "sink_compact_small_files": sink_compact_small_files,
    "q_schema_evolution": q_schema_evolution,
    "q_bucketed_join": q_bucketed_join,
    "sink_shard_manifest": sink_shard_manifest,
}

ORACLES = {
    "orc_roundtrip": _ROUNDTRIP_SQL,
    "json_roundtrip": _ROUNDTRIP_SQL,
    "csv_roundtrip": _ROUNDTRIP_SQL,
    "sink_compact_small_files": _ROUNDTRIP_SQL,
    "q_schema_evolution": Q_SCHEMA_EVOLUTION_SQL,
    "q_bucketed_join": Q_BUCKETED_JOIN_SQL,
    "sink_shard_manifest": SINK_SHARD_MANIFEST_SQL,
}
