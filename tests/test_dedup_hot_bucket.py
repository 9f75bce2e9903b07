"""Hot-bucket cap behavior for the three LSH-bucketed dedup ops on a
DUPLICATE-DENSE corpus (a 300-replica clique — the boilerplate-heavy
web-crawl shard the sparse gate corpora never exhibit):

- ``dedup_minhash_lsh``: band buckets above LSH_BUCKET_CAP emit STAR
  pairs only — in-clique output is exactly {(min_id, member)}, and
  downstream ``dedup_components`` still forms ONE component.
- ``dedup_containment``: per-A candidate fan-out is bounded by
  CONTAIN_DF_CAP, every clique member still finds >= 1 container,
  and the SQL oracle REPLAYS the cap bit-for-bit (cross-engine set
  equality in the fired regime).
- ``dedup_embedding``: hot sign-buckets emit star pairs; oracle
  replays (cross-engine set equality in the fired regime).
"""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bfr_clustering_using_pyspark_spark.operators.dedup import (
    CONTAIN_DF_CAP,
    EMB_BUCKET_CAP,
    LSH_BUCKET_CAP,
    DEDUP_CONTAINMENT_SQL,
    DEDUP_EMBEDDING_SQL,
    dedup_components,
    dedup_containment,
    dedup_embedding,
    dedup_minhash_lsh,
)

CLIQUE = 300  # > LSH_BUCKET_CAP (128) and > CONTAIN_DF_CAP / EMB cap (256)
N_FILLER = 50

_VOCAB = (
    "the a and of to in is on spark data table join merge filter sort "
    "group window hash scan batch stream row column key value query"
).split()


@pytest.fixture(scope="module")
def clique_dir(tmp_path_factory):
    """documents.parquet: ids 0..299 share ONE text (the clique),
    300..349 are random distinct docs. embeddings.parquet: ids
    0..299 share one vector, 300..499 random."""
    rng = np.random.default_rng(7)
    boiler = " ".join(rng.choice(_VOCAB, size=40))
    texts = [boiler] * CLIQUE + [
        " ".join(rng.choice(_VOCAB, size=int(rng.integers(25, 60))))
        for _ in range(N_FILLER)
    ]
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(len(texts), dtype=np.int64),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["web"] * len(texts),
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )
    vec = rng.normal(size=64)
    vec /= np.linalg.norm(vec)
    vecs = [vec] * CLIQUE + [
        v / np.linalg.norm(v) for v in rng.normal(size=(200, 64))
    ]
    emb = pd.DataFrame(
        {
            "vec_id": np.arange(len(vecs), dtype=np.int64),
            "embedding": [np.asarray(v, dtype=np.float32) for v in vecs],
        }
    )
    d = tmp_path_factory.mktemp("clique_sf")
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False), str(d / "documents.parquet"))
    pq.write_table(pa.Table.from_pandas(emb, preserve_index=False), str(d / "embeddings.parquet"))
    return str(d)


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


@pytest.fixture()
def _capped_regime(monkeypatch):
    """This corpus DELIBERATELY exceeds LSH_BUCKET_CAP to exercise the
    star-cap scale contract; opt it out of the oracle-domain guard
    (LSH_ORACLE_N) that protects gate corpora from silently tripping
    the cap."""
    import bfr_clustering_using_pyspark_spark.operators.dedup as dd

    monkeypatch.setattr(dd, "LSH_ORACLE_N", -1)


def test_minhash_hot_bucket_emits_star_pairs(spark, clique_dir, _capped_regime):
    rows = dedup_minhash_lsh(spark, clique_dir).collect()
    in_clique = {(r["doc_a"], r["doc_b"]) for r in rows if r["doc_b"] < CLIQUE}
    # star, not all-pairs: exactly (0, m) for every other member
    assert in_clique == {(0, m) for m in range(1, CLIQUE)}
    assert all(r["jaccard"] == 1.0 for r in rows if r["doc_b"] < CLIQUE)
    # the cap actually fired: all-pairs would be CLIQUE*(CLIQUE-1)/2
    assert len(in_clique) == CLIQUE - 1 < CLIQUE * (CLIQUE - 1) // 2


def test_components_survive_star_capping(spark, clique_dir, _capped_regime):
    comp = {r["doc_id"]: r["comp"] for r in dedup_components(spark, clique_dir).collect()}
    clique_members = {i for i in comp if i < CLIQUE}
    assert clique_members == set(range(CLIQUE))
    assert {comp[i] for i in clique_members} == {0}


def test_containment_cap_bounds_fanout_and_oracle_replays(spark, clique_dir):
    rows = dedup_containment(spark, clique_dir).collect()
    by_a: dict[int, int] = {}
    for r in rows:
        by_a[r["doc_contained"]] = by_a.get(r["doc_contained"], 0) + 1
    # bounded fan-out per contained doc; everyone still finds a container
    assert max(by_a.values()) <= CONTAIN_DF_CAP
    assert set(range(CLIQUE)) <= set(by_a)
    # the cap fired (uncapped would be CLIQUE-1 containers each)
    assert max(by_a[i] for i in range(CLIQUE)) < CLIQUE - 1
    # oracle replays the cap exactly
    got = {(r["doc_contained"], r["doc_container"], r["containment"]) for r in rows}
    con = _duck(clique_dir)
    oracle = {(r[0], r[1], r[2]) for r in con.sql(DEDUP_CONTAINMENT_SQL).fetchall()}
    assert got == oracle


def test_embedding_hot_bucket_star_and_oracle_replays(spark, clique_dir):
    rows = dedup_embedding(spark, clique_dir).collect()
    in_clique = {
        (r["vec_a"], r["vec_b"]) for r in rows if r["vec_a"] < CLIQUE and r["vec_b"] < CLIQUE
    }
    assert in_clique == {(0, m) for m in range(1, CLIQUE)}
    assert len(in_clique) == CLIQUE - 1 < CLIQUE * (CLIQUE - 1) // 2
    got = {(r["vec_a"], r["vec_b"], r["cosine"]) for r in rows}
    con = _duck(clique_dir)
    oracle = {(r[0], r[1], r[2]) for r in con.sql(DEDUP_EMBEDDING_SQL).fetchall()}
    assert got == oracle
    assert EMB_BUCKET_CAP < CLIQUE  # the regime under test
    assert LSH_BUCKET_CAP < CLIQUE


def test_ngram_hot_block_star_and_oracle_replays(spark, clique_dir):
    from bfr_clustering_using_pyspark_spark.operators.dedup import (
        NGRAM_BLOCK_CAP,
        DEDUP_NGRAM_JACCARD_SQL,
        dedup_ngram_jaccard,
    )

    rows = dedup_ngram_jaccard(spark, clique_dir).collect()
    in_clique = {
        (r["doc_a"], r["doc_b"]) for r in rows if r["doc_a"] < CLIQUE and r["doc_b"] < CLIQUE
    }
    assert in_clique == {(0, m) for m in range(1, CLIQUE)}
    assert NGRAM_BLOCK_CAP < CLIQUE  # the regime under test
    got = {(r["doc_a"], r["doc_b"], r["jaccard"]) for r in rows}
    con = _duck(clique_dir)
    oracle = {(r[0], r[1], r[2]) for r in con.sql(DEDUP_NGRAM_JACCARD_SQL).fetchall()}
    assert got == oracle


def test_minhash_oracle_domain_guard_raises(spark, tmp_path):
    """On an ORACLE-DOMAIN-sized corpus (<= LSH_ORACLE_N docs) whose
    band buckets exceed LSH_BUCKET_CAP, the signature build must
    raise loudly instead of silently degrading the pair list to
    star-only (r11 ADVICE: a silent degrade hash-mismatches the
    exhaustive oracle indistinguishably from a real defect)."""
    rng = np.random.default_rng(3)
    boiler = " ".join(rng.choice(_VOCAB, size=40))
    n = LSH_BUCKET_CAP + 30
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": [boiler] * n,
            "lang": ["en"] * n,
            "source": ["web"] * n,
            "n_chars": np.array([len(boiler)] * n, dtype=np.int64),
        }
    )
    pq.write_table(
        pa.Table.from_pandas(docs, preserve_index=False),
        str(tmp_path / "documents.parquet"),
    )
    with pytest.raises(RuntimeError, match="LSH_BUCKET_CAP"):
        dedup_minhash_lsh(spark, str(tmp_path)).collect()
