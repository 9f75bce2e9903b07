"""Structured Streaming operators: batch-equivalence of the windowed
aggregation (modulo watermark-held tail windows) and incremental
summary maintenance."""

from bfr_clustering_using_pyspark_spark.plans.events import q_events_windowed
from bfr_clustering_using_pyspark_spark.streaming import QUERIES
from tests.conftest import SF_SMALL


def test_stream_window_matches_batch(spark):
    sw = QUERIES["stream_events_window"](spark, SF_SMALL)
    batch = q_events_windowed(spark, SF_SMALL)
    srows = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in sw.collect()
    }
    brows = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in batch.collect()
    }
    # append mode holds back windows newer than (max_ts - watermark)
    assert set(srows) <= set(brows)
    assert len(srows) >= len(brows) - 10
    for k, v in srows.items():
        assert brows[k] == v


def test_stream_bfr_update_totals(spark):
    out = QUERIES["stream_bfr_update"](spark, SF_SMALL).collect()
    assert sum(r["n"] for r in out) == 1000  # all events folded in
    assert all(r["std_value"] >= 0 for r in out)


def test_stream_components_matches_batch(spark):
    """Incremental multi-batch component maintenance must converge to
    the same labelling as the batch LSH + connected-components path."""
    from bfr_clustering_using_pyspark_spark.operators.dedup import dedup_components

    sc_rows = {
        (r["doc_id"], r["comp"])
        for r in QUERIES["stream_components"](spark, SF_SMALL).collect()
    }
    batch_rows = {
        (r["doc_id"], r["comp"]) for r in dedup_components(spark, SF_SMALL).collect()
    }
    assert sc_rows == batch_rows
    assert sc_rows  # non-trivial: testdata contains near-dup groups


def test_stream_countmin_equals_batch_sketch(spark):
    """Mergeability proof: the streamed sketch's per-seed mass must
    equal the corpus token count exactly (every token lands in
    exactly one bucket per seed), and merge order cannot matter."""
    import pyspark.sql.functions as F

    from bfr_clustering_using_pyspark_spark.operators.dedup import _tokens
    from bfr_clustering_using_pyspark_spark.streaming.docs_stream import stream_countmin
    from tests.conftest import SF_SMALL

    rows = stream_countmin(spark, SF_SMALL).collect()
    assert [r["seed"] for r in rows] == [0, 1, 2, 3]
    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    n_tokens = docs.select(F.sum(F.size(_tokens(F.col("text")))).alias("s")).first()["s"]
    for r in rows:
        assert r["total_count"] == n_tokens
        assert r["max_counter"] >= n_tokens // 1024
        assert r["n_buckets_used"] <= 1024
