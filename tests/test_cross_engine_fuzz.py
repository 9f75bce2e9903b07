"""Cross-engine fuzz over RANDOM corpora: the documents/embeddings
single-table keys must hash-match their DuckDB oracles on generated
data, not just the shipped testdata tables — oracle parity that only
holds for one dataset is a coincidence, not a contract.

Data is generated schema-faithful to TESTDATA.md (no NULLs, n_chars
== length(text), non-degenerate vectors) with deliberate edge shapes:
empty and 1-token texts, exact duplicates, high-overlap near-dups,
punctuation/unicode noise.
"""

import sys
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
from check_correctness import table_hash  # noqa: E402

# deterministic keys only: probabilistic-recall blockers
# (dedup_minhash_lsh's banded collisions, dedup_containment's 1-perm
# block) are excluded by design — on a random corpus a borderline
# J≈0.7 pair can legitimately miss its bucket, which is the scheme's
# documented recall, not an engine divergence
DOC_KEYS = [
    "dedup_exact",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "text_tokens",
    "text_quality",
    "text_fingerprint",
    "text_top_terms",
    "text_bigrams",
    "text_repetition",
    "tfidf_top_terms",
    "text_langid",
    "text_clean_pipeline",
    "text_winnow_fingerprint",
    "text_pii_scrub",
    "text_unigram_logprob",
    "doc_chunk",
    "chunk_boilerplate",
]
EMB_KEYS = [
    "embedding_normalize",
    "embedding_quantize",
    "ann_bruteforce",
    "ann_lsh",
    "dedup_embedding",
]

_VOCAB = (
    "the a and of to in is on spark data table join merge filter sort "
    "group window hash scan batch stream row column key value query "
    "fast slow big small line part order customer vector dup agg"
).split()


def _gen_documents(rng: np.random.Generator, n: int) -> pd.DataFrame:
    texts = []
    for i in range(n):
        k = int(rng.integers(0, 80))
        toks = list(rng.choice(_VOCAB, size=k)) if k else []
        texts.append(" ".join(toks))
    # edge shapes: exact dups, near-dups, empty, 1-token, noise
    for i in range(0, n, 10):
        texts[(i + 1) % n] = texts[i]  # exact duplicate
    for i in range(5, n, 10):
        base = texts[i].split()
        if len(base) > 6:
            base[2] = "mutated"
            texts[(i + 2) % n] = " ".join(base)  # near-duplicate
    texts[0] = ""
    texts[1] = "solo"
    texts[2] = "Ünïcode!! *** 42 --- the THE The"
    texts[3] = "contact me at foo.bar@example.com or 555-123-4567 today"
    return pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": texts,
            "lang": rng.choice(["en", "de", "fr", "xx"], size=n),
            "source": rng.choice(["web", "book", "code"], size=n),
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )


def _gen_embeddings(rng: np.random.Generator, n: int, d: int = 64) -> pd.DataFrame:
    X = rng.uniform(-0.9, 0.9, size=(n, d))
    # keep vectors non-degenerate (the data contract has no zero
    # vectors; a zero norm is undefined for cosine operators)
    norms = np.linalg.norm(X, axis=1)
    X[norms < 0.5] += 0.3
    return pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": [row.astype(np.float32) for row in X],
            "label": rng.integers(0, 7, size=n).astype(np.int32),
        }
    )


def _compare(spark, key: str, fn, sql: str, sf_dir: str, con) -> None:
    sdf = fn(spark, sf_dir)
    srows = sdf.collect()
    scols = sdf.columns
    ores = con.execute(sql)
    ocols = [c[0] for c in ores.description]
    orows = ores.fetchall()
    assert sorted(scols) == sorted(ocols), f"{key}: schema {scols} vs {ocols}"
    assert len(srows) == len(orows), f"{key}: {len(srows)} vs {len(orows)} rows"
    sh = table_hash(scols, [[r[c] for c in scols] for r in srows])
    oh = table_hash(ocols, orows)
    assert sh == oh, f"{key}: value hash mismatch on fuzzed corpus"


@pytest.mark.parametrize("seed", [11, 23])
def test_single_table_keys_hash_match_on_random_corpora(spark, tmp_path, seed):
    import __spark_entry__ as m

    rng = np.random.default_rng(seed)
    d = tmp_path / f"fuzz{seed}"
    d.mkdir()
    spark.createDataFrame(_gen_documents(rng, 150)).write.parquet(
        str(d / "documents.parquet")
    )
    spark.createDataFrame(_gen_embeddings(rng, 150)).write.parquet(
        str(d / "embeddings.parquet")
    )
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet/*.parquet')"
        )
    qs, sqls = m.queries(), m.oracle_sql()
    for key in DOC_KEYS + EMB_KEYS:
        _compare(spark, key, qs[key], sqls[key], str(d), con)
