"""BPE tokenizer train/encode: DuckDB parity at sf0.001, an
INDEPENDENT pure-Python greedy-BPE reimplementation reproducing the
merge table and per-doc token counts bit-for-bit, overlap-semantics
unit cases, and the session cache (train+encode share one fit)."""

import re
from collections import Counter

import pytest

from tests.conftest import SF_SMALL

from bfr_clustering_using_pyspark_spark.operators.bpe import (
    R_MERGES,
    TEXT_BPE_ENCODE_SQL,
    TEXT_BPE_TRAIN_SQL,
    _BPE_CACHE,
    text_bpe_encode,
    text_bpe_train,
)

TOKEN = re.compile("[a-z0-9]+")


def _merge_word(syms, lhs, rhs):
    """Greedy left-to-right non-overlapping pair merge."""
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == lhs and syms[i + 1] == rhs:
            out.append(lhs + rhs)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _py_bpe(word_counts, rounds):
    """Reference BPE trainer: dict word -> (symbols, count)."""
    state = {w: [list(w), c] for w, c in word_counts.items()}
    merges = []
    for rnd in range(1, rounds + 1):
        pairs = Counter()
        for syms, c in state.values():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        (lhs, rhs), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rnd, lhs, rhs, cnt))
        for v in state.values():
            v[0] = _merge_word(v[0], lhs, rhs)
    return merges, {w: v[0] for w, v in state.items()}


@pytest.fixture(scope="module")
def corpus(spark):
    rows = spark.read.parquet(f"{SF_SMALL}/documents.parquet").select("doc_id", "text").collect()
    return {r["doc_id"]: TOKEN.findall(r["text"].lower()) for r in rows}


def test_train_matches_duckdb_and_python(spark, duck, corpus):
    got = [tuple(r) for r in text_bpe_train(spark, SF_SMALL).collect()]
    want = [tuple(r) for r in duck.execute(TEXT_BPE_TRAIN_SQL).fetchall()]
    assert got == want
    wc = Counter(w for toks in corpus.values() for w in toks)
    py_merges, _ = _py_bpe(wc, R_MERGES)
    assert got == py_merges
    # merge table invariants: rounds 1..n contiguous, counts positive
    assert [r for (r, *_rest) in got] == list(range(1, len(got) + 1))
    assert all(cnt > 0 for (*_x, cnt) in got)
    assert len(got) == R_MERGES, "sf0.001 corpus must support all rounds"


def test_encode_matches_duckdb_and_python(spark, duck, corpus):
    got = text_bpe_encode(spark, SF_SMALL).collect()
    want = [tuple(r) for r in duck.execute(TEXT_BPE_ENCODE_SQL).fetchall()]
    assert [tuple(r) for r in got] == want
    wc = Counter(w for toks in corpus.values() for w in toks)
    _, final = _py_bpe(wc, R_MERGES)
    by_id = {r["doc_id"]: r for r in got}
    assert set(by_id) == set(corpus), "every doc appears exactly once"
    for doc_id, toks in corpus.items():
        r = by_id[doc_id]
        assert r["n_words"] == len(toks)
        assert r["n_chars"] == sum(len(w) for w in toks)
        n_bpe = sum(len(final[w]) for w in toks)
        assert r["n_bpe_tokens"] == n_bpe
        if n_bpe:
            # merging only ever shrinks the token stream
            assert r["n_bpe_tokens"] <= r["n_chars"]
            assert r["chars_per_token"] >= 1.0
        else:
            assert r["chars_per_token"] == 0.0


def test_merge_overlap_semantics():
    """The aaa / abab cases both engines were probed on: greedy
    left-to-right, no re-merge within a round."""
    assert _merge_word(list("aaa"), "a", "a") == ["aa", "a"]
    assert _merge_word(list("abab"), "a", "b") == ["ab", "ab"]
    assert _merge_word(["ab", "a", "b"], "a", "b") == ["ab", "ab"]


def test_fit_is_cached_per_session(spark):
    text_bpe_train(spark, SF_SMALL)
    n = len(_BPE_CACHE)
    assert n >= 1
    text_bpe_encode(spark, SF_SMALL)  # must reuse, not refit
    assert len(_BPE_CACHE) == n


def test_vocab_matches_python_and_conserves_tokens(spark, duck, corpus):
    from bfr_clustering_using_pyspark_spark.operators.bpe import (
        TEXT_BPE_VOCAB_SQL,
        text_bpe_vocab,
    )

    rows = text_bpe_vocab(spark, SF_SMALL).collect()
    want = [tuple(r) for r in duck.execute(TEXT_BPE_VOCAB_SQL).fetchall()]
    assert [tuple(r) for r in rows] == want
    wc = Counter(w for toks in corpus.values() for w in toks)
    _, final = _py_bpe(wc, R_MERGES)
    occ, words = Counter(), {}
    for w, syms in final.items():
        for s in syms:
            occ[s] += wc[w]
            words.setdefault(s, set()).add(w)
    assert {r["token"]: r["total_occurrences"] for r in rows} == dict(occ)
    for r in rows:
        assert r["token_len"] == len(r["token"])
        assert r["n_words"] == len(words[r["token"]])
    # conservation: vocabulary occurrences == total encoded stream
    enc = text_bpe_encode(spark, SF_SMALL).collect()
    assert sum(r["total_occurrences"] for r in rows) == sum(
        r["n_bpe_tokens"] for r in enc
    )


class TestDeepTraining:
    """text_bpe_train_deep: the rows-only realistic-depth face —
    pinned by properties instead of an (intractable) unrolled oracle."""

    def test_deep_properties_and_termination(self, spark):
        from bfr_clustering_using_pyspark_spark.operators.bpe import (
            R_DEEP,
            _bpe_fit,
            text_bpe_train_deep,
        )
        from tests.conftest import SF_MED

        rows = text_bpe_train_deep(spark, SF_MED).collect()
        assert 0 < len(rows) <= R_DEEP
        # prefix property: the first R_MERGES rounds are EXACTLY the
        # oracle-gated shallow table (same loop, same tie-break)
        from bfr_clustering_using_pyspark_spark.operators.bpe import text_bpe_train

        shallow = text_bpe_train(spark, SF_MED).collect()
        deep_prefix = [tuple(r) for r in rows[: len(shallow)]]
        assert deep_prefix == [tuple(r) for r in shallow]
        # monotone selection: each round's chosen pair count never
        # exceeds the previous round's (standard BPE invariant — a
        # pair created by a merge inherits at most the merged count)
        cnts = [r["pair_count"] for r in rows]
        assert all(a >= b for a, b in zip(cnts, cnts[1:]))
        # conservation: stripping delimiters from every final symbol
        # string reproduces the word exactly (no characters created
        # or destroyed by any number of merges)
        wf, merges = _bpe_fit(spark, SF_MED, n_merges=R_DEEP)
        bad = wf.filter(
            __import__("pyspark").sql.functions.replace(
                "sym",
                __import__("pyspark").sql.functions.lit("|"),
                __import__("pyspark").sql.functions.lit(""),
            )
            != __import__("pyspark").sql.functions.col("word")
        ).count()
        assert bad == 0
        # termination: the tiny-vocab gate corpus exhausts its pair
        # table well under the cap (the break path really runs)
        assert len(rows) < R_DEEP

    def test_deep_is_deterministic(self, spark):
        from bfr_clustering_using_pyspark_spark.operators.bpe import (
            _BPE_CACHE,
            text_bpe_train_deep,
        )
        from tests.conftest import SF_MED

        a = [tuple(r) for r in text_bpe_train_deep(spark, SF_MED).collect()]
        _BPE_CACHE.clear()  # force a re-fit, not a cache hit
        b = [tuple(r) for r in text_bpe_train_deep(spark, SF_MED).collect()]
        assert a == b
