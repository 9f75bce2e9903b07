"""The retrieval family's session cache (_TOK_CACHE) carries the
persisted (doc,term,tf) frame across keys in one session; the
distinct-postings accessor is a projection of that one tokenize pass
(r15: the tf frame's key set IS the postings relation, so the second
full explode+array_distinct build was removed). Pin the eviction
contract the minhash cache was ADVICE'd on: hits return the same
persisted frame, superseded corpus versions are unpersisted (not
leaked), the cache stays bounded, and postings == tf keys."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from bfr_clustering_using_pyspark_spark.operators import retrieval as R

_VOCAB = "the a and of to in is on spark data table join merge filter".split()


def _write_corpus(d, seed=11, n=60):
    rng = np.random.default_rng(seed)
    texts = [
        " ".join(rng.choice(_VOCAB, size=int(rng.integers(20, 50)))) for _ in range(n)
    ]
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": texts,
            "lang": ["en"] * n,
            "source": ["web"] * n,
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )
    pq.write_table(
        pa.Table.from_pandas(docs, preserve_index=False), str(d / "documents.parquet")
    )


def test_cache_hit_returns_same_persisted_frame(spark, tmp_path):
    d = tmp_path / "c1"
    d.mkdir()
    _write_corpus(d)
    a = R._bm25_tf(spark, str(d))
    b = R._bm25_tf(spark, str(d))
    assert a is b
    assert a.storageLevel.useMemory or a.storageLevel.useDisk  # persisted
    # postings rides the SAME cache entry: no second tokenize pass is
    # registered, and its rows are exactly the tf frame's key pairs
    n_entries = len(R._TOK_CACHE)
    post = R._distinct_postings(spark, str(d))
    assert len(R._TOK_CACHE) == n_entries  # no new cache kind
    assert sorted(map(tuple, post.collect())) == sorted(
        map(tuple, a.select("doc_id", "term").collect())
    )


def test_superseded_corpus_version_is_unpersisted(spark, tmp_path):
    d = tmp_path / "c2"
    d.mkdir()
    _write_corpus(d, seed=1)
    old = R._bm25_tf(spark, str(d))
    assert old.storageLevel.useMemory or old.storageLevel.useDisk
    # storageLevel can't witness the release here: old and the
    # rebuild share a logical plan (same parquet path), and Spark's
    # CacheManager keys cached data by plan — so spy on the STORED
    # frame's unpersist instead
    released = []
    orig = old.unpersist

    def spy(*a, **k):
        released.append(1)
        return orig(*a, **k)

    old.unpersist = spy
    _write_corpus(d, seed=2)  # mtime + content change
    new = R._bm25_tf(spark, str(d))
    assert new is not old
    assert released, "superseded entry was not unpersisted"


def test_cache_is_bounded_oldest_first(spark, tmp_path):
    frames = []
    for i in range(R._TOK_CACHE_MAX + 2):
        d = tmp_path / f"c3_{i}"
        d.mkdir()
        _write_corpus(d, seed=10 + i)
        frames.append(R._bm25_tf(spark, str(d)))
    assert len(R._TOK_CACHE) <= R._TOK_CACHE_MAX
    # the oldest entries were evicted AND unpersisted
    evicted = frames[: len(frames) - R._TOK_CACHE_MAX]
    for f in evicted:
        assert not (f.storageLevel.useMemory or f.storageLevel.useDisk)
    # the newest survive persisted
    assert frames[-1].storageLevel.useMemory or frames[-1].storageLevel.useDisk
