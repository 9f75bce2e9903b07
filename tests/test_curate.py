"""corpus_curate: the end-to-end curation funnel must agree with the
standalone operators it composes."""

from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from tools.check_correctness import table_hash


def _funnel(spark):
    from bfr_clustering_using_pyspark_spark.operators.curate import corpus_curate

    rows = corpus_curate(spark, SF_SMALL).collect()
    return {r["stage"]: (r["docs_in"], r["docs_out"]) for r in rows}


def test_funnel_matches_duckdb(spark, duck):
    from bfr_clustering_using_pyspark_spark.operators.curate import (
        CORPUS_CURATE_SQL,
        corpus_curate,
    )

    sdf = corpus_curate(spark, SF_SMALL)
    srows = [tuple(r) for r in sdf.collect()]
    cur = duck.execute(CORPUS_CURATE_SQL)
    assert table_hash(sdf.columns, srows) == table_hash(
        [d[0] for d in cur.description], cur.fetchall()
    )


def test_funnel_is_monotone_and_chained(spark):
    f = _funnel(spark)
    assert set(f) == {"1_quality", "2_dedup", "3_decontam", "4_chunk"}
    # each filter stage can only shrink the corpus
    for stage in ("1_quality", "2_dedup", "3_decontam"):
        din, dout = f[stage]
        assert 0 <= dout <= din
    # stages chain: docs_in of stage k+1 == docs_out of stage k
    assert f["2_dedup"][0] == f["1_quality"][1]
    assert f["3_decontam"][0] == f["2_dedup"][1]
    assert f["4_chunk"][0] == f["3_decontam"][1]
    # chunking expands: >= one chunk per surviving doc
    assert f["4_chunk"][1] >= f["4_chunk"][0]


def test_funnel_stage1_matches_text_quality(spark):
    from bfr_clustering_using_pyspark_spark.operators.textstats import text_quality

    f = _funnel(spark)
    tq = text_quality(spark, SF_SMALL)
    n_pass = tq.filter(F.col("passes_quality") == 1).count()
    assert f["1_quality"] == (tq.count(), n_pass)


def test_funnel_stage3_consistent_with_decontaminate(spark):
    from bfr_clustering_using_pyspark_spark.operators.sampling import decontaminate

    f = _funnel(spark)
    # the funnel's decontam drop (eval members + contaminated docs
    # among dedup survivors) can never exceed the corpus-wide
    # contaminated count plus the eval-member count
    contaminated_all = decontaminate(spark, SF_SMALL).count()
    din, dout = f["3_decontam"]
    dropped = din - dout
    from bfr_clustering_using_pyspark_spark.sources.readers import load_table

    n_eval = load_table(spark, SF_SMALL, "documents").filter(F.col("doc_id") % 97 == 0).count()
    assert 0 <= dropped <= contaminated_all + n_eval


def test_dedup_recall_eval_sane(spark):
    """The blocking eval's numbers must be internally consistent and
    match known corpus behavior: minsh blocking beats simhash-bucket
    recall at J>=0.7 on this corpus, hits never exceed truth or
    candidates, and ratios are exact fixed-point of the counts."""
    from bfr_clustering_using_pyspark_spark.operators.dedup import dedup_recall_eval
    from tests.conftest import SF_SMALL

    rows = {r["method"]: r for r in dedup_recall_eval(spark, SF_SMALL).collect()}
    assert set(rows) == {"minsh_block", "simhash"}
    for r in rows.values():
        assert r["n_hit"] <= r["n_truth"] and r["n_hit"] <= r["n_cand"]
        if r["n_truth"] > 0:
            assert r["recall_x1e4"] == round(r["n_hit"] * 1e4 / r["n_truth"])
        if r["n_cand"] > 0:
            assert r["precision_x1e4"] == round(r["n_hit"] * 1e4 / r["n_cand"])
    assert rows["minsh_block"]["n_truth"] == rows["simhash"]["n_truth"]
    if rows["minsh_block"]["n_truth"] > 0:
        assert rows["minsh_block"]["recall_x1e4"] >= rows["simhash"]["recall_x1e4"]


def test_source_overlap_matrix_semantics(spark):
    """Pair matrix covers every source pair exactly once (a < b),
    overlap counts match a from-scratch Python recompute on the
    shingle sets, and Jaccard is consistent with the counts."""
    import re
    from math import floor

    from bfr_clustering_using_pyspark_spark.operators.curate import (
        corpus_source_overlap,
    )
    from tests.conftest import SF_SMALL

    rows = corpus_source_overlap(spark, SF_SMALL).collect()
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select(
        "source", "text"
    ).collect()
    sets: dict[str, set] = {}
    for d in docs:
        toks = re.findall("[a-z0-9]+", d["text"].lower())
        for i in range(len(toks) - 3):
            sets.setdefault(d["source"], set()).add(" ".join(toks[i : i + 4]))
    srcs = sorted(sets)
    assert [(r["source_a"], r["source_b"]) for r in rows] == [
        (a, b) for a in srcs for b in srcs if a < b
    ]
    assert any(r["n_shared"] > 0 for r in rows), "corpus must contain overlap"
    for r in rows:
        a, b = sets[r["source_a"]], sets[r["source_b"]]
        assert r["n_a"] == len(a) and r["n_b"] == len(b)
        assert r["n_shared"] == len(a & b)
        assert r["jaccard"] == floor(len(a & b) * 1e6 / len(a | b)) / 1e6
