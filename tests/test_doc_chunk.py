"""doc_chunk: RAG-style overlapping token-window chunking."""

from tests.conftest import SF_SMALL
from tools.check_correctness import table_hash


def test_doc_chunk_matches_duckdb(spark, duck):
    from bfr_clustering_using_pyspark_spark.operators.textstats import (
        DOC_CHUNK_SQL,
        doc_chunk,
    )

    sdf = doc_chunk(spark, SF_SMALL)
    srows = [tuple(r) for r in sdf.collect()]
    cur = duck.execute(DOC_CHUNK_SQL)
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()
    assert len(srows) == len(orows) > 0
    assert table_hash(sdf.columns, srows) == table_hash(ocols, orows)


def test_doc_chunk_coverage_and_overlap(spark):
    from pyspark.sql import functions as F

    from bfr_clustering_using_pyspark_spark.operators.textstats import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
        _tokens,
        doc_chunk,
    )
    from bfr_clustering_using_pyspark_spark.sources.readers import load_table

    chunks = doc_chunk(spark, SF_SMALL)
    docs = (
        load_table(spark, SF_SMALL, "documents")
        .select("doc_id", F.size(_tokens(F.col("text"))).alias("n"))
        .filter(F.col("n") > 0)
    )
    per_doc = chunks.groupBy("doc_id").agg(
        F.count("*").alias("n_chunks"),
        F.max(F.col("chunk_start") + F.col("n_chunk_tokens")).alias("covered_to"),
        F.min("chunk_start").alias("first_start"),
        F.max("chunk_start").alias("last_start"),
        F.sum("n_chunk_tokens").alias("tok_sum"),
    )
    j = docs.join(per_doc, "doc_id")
    expected_chunks = F.floor((F.col("n") + CHUNK_STRIDE - 1) / CHUNK_STRIDE)
    bad = j.filter(
        (F.col("covered_to") != F.col("n"))  # every token covered, none invented
        | (F.col("first_start") != 0)
        | (F.col("last_start") >= F.col("n"))  # no empty trailing chunk
        | (F.col("n_chunks") != expected_chunks)  # one chunk per stride boundary
    )
    assert bad.count() == 0
    # every doc produced at least one chunk; chunk sizes are capped
    assert j.count() == docs.count()
    assert chunks.filter(F.col("n_chunk_tokens") > CHUNK_TOKENS).count() == 0


def test_chunk_boilerplate_matches_duckdb(spark, duck):
    from bfr_clustering_using_pyspark_spark.operators.textstats import (
        CHUNK_BOILERPLATE_SQL,
        chunk_boilerplate,
    )

    sdf = chunk_boilerplate(spark, SF_SMALL)
    srows = [tuple(r) for r in sdf.collect()]
    cur = duck.execute(CHUNK_BOILERPLATE_SQL)
    assert len(srows) > 0
    assert table_hash(sdf.columns, srows) == table_hash(
        [d[0] for d in cur.description], cur.fetchall()
    )


def test_chunk_boilerplate_bounds(spark):
    from pyspark.sql import functions as F

    from bfr_clustering_using_pyspark_spark.operators.textstats import chunk_boilerplate

    out = chunk_boilerplate(spark, SF_SMALL)
    bad = out.filter(
        (F.col("n_boiler") > F.col("n_chunks"))
        | (F.col("n_boiler") < 0)
        | (F.col("boiler_frac") < 0)
        | (F.col("boiler_frac") > 1)
    )
    assert bad.count() == 0


def test_udtf_face_equals_jvm_face(spark):
    """The Python UDTF face and the JVM plan must produce identical
    rows — same chunking semantics through two APIs."""
    from bfr_clustering_using_pyspark_spark.operators.textstats import (
        doc_chunk,
        udtf_doc_chunk,
    )

    a = [tuple(r) for r in doc_chunk(spark, SF_SMALL).collect()]
    b = [tuple(r) for r in udtf_doc_chunk(spark, SF_SMALL).collect()]
    assert a == b
