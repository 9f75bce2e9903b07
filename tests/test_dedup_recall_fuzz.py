"""Measured-recall harness for the two probabilistic-recall dedup
keys excluded from cross-engine hash fuzz (`dedup_minhash_lsh`,
`dedup_containment`): on seeded RANDOM corpora with planted duplicate
structure, compute the EXACT all-pairs truth in pure Python (same
tokenizer/shingler/rounding as both engines) and assert

- perfect precision: every reported pair is a true pair (the exact
  verification stage guarantees it — a violation means tokenizer or
  rounding drift), and
- measured recall ≥ the documented banding/containment bound.

Everything is deterministic given the corpus (the hash families are
fixed), so these are exact regression pins, not flaky samples:
MinHash(64)=16x4 banding catches a J=0.7 pair w.p. 1-(1-0.7^4)^16 ≈
0.986 and our planted pairs sit at J ≥ 0.85 where it is ~1; the
1-perm containment block catches a fully-contained doc w.p. 1.0
(its min shingle hash IS in the container's list)."""

import math
import re

import numpy as np
import pandas as pd
import pytest

_VOCAB = (
    "the a and of to in is on spark data table join merge filter sort "
    "group window hash scan batch stream row column key value query "
    "fast slow big small line part order customer vector dup agg"
).split()

MINHASH_T = 0.7
RECALL_FLOOR_MINHASH = 0.9
RECALL_FLOOR_CONTAIN = 0.8  # CONTAIN_T - 0.1 slack for partial pairs


def _shingles(text: str) -> frozenset:
    toks = re.findall(r"[a-z0-9]+", text.lower())
    if len(toks) < 3:
        return frozenset()
    return frozenset(
        " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
    )


def _round4(x: float) -> float:
    # both engines compute round(ratio * 1e4) / 1e4 with HALF_UP
    return math.floor(x * 10000.0 + 0.5) / 10000.0


def _gen_corpus(rng: np.random.Generator):
    """100 random base docs + 40 planted docs: 10 exact dups,
    10 one-token near-dups (J ≈ 0.85), 10 full containments
    (base tokens + suffix), 10 heavy mutations (J well below 0.7)."""
    texts = [
        " ".join(rng.choice(_VOCAB, size=int(rng.integers(20, 60))))
        for _ in range(100)
    ]
    for i in range(10):  # exact duplicates of docs 0..9
        texts.append(texts[i])
    for i in range(10, 20):  # near-duplicates: mutate ONE middle token
        base = texts[i].split()
        base[len(base) // 2] = "zzmutant"
        texts.append(" ".join(base))
    for i in range(20, 30):  # containments: all tokens + a suffix
        extra = " ".join(rng.choice(_VOCAB, size=6))
        texts.append(texts[i] + " zznovel " + extra)
    for i in range(30, 40):  # distractors: 40% of tokens replaced
        base = texts[i].split()
        for j in rng.choice(len(base), size=max(1, int(0.4 * len(base))), replace=False):
            base[j] = f"zz{j}"
        texts.append(" ".join(base))
    return pd.DataFrame(
        {
            "doc_id": np.arange(len(texts), dtype=np.int64),
            "text": texts,
            "lang": rng.choice(["en", "de"], size=len(texts)),
            "source": rng.choice(["web", "book"], size=len(texts)),
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )


def _write_docs(d, df):
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(d / "documents.parquet"))


def _truth_sets(df):
    sh = {r.doc_id: _shingles(r.text) for r in df.itertuples()}
    sh = {k: v for k, v in sh.items() if v}
    ids = sorted(sh)
    jacc_truth, contain_truth = set(), set()
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(sh[a] & sh[b])
            if not inter:
                continue
            union = len(sh[a]) + len(sh[b]) - inter
            if _round4(inter / union) >= MINHASH_T:
                jacc_truth.add((a, b))
            if _round4(inter / len(sh[a])) >= 0.9:
                contain_truth.add((a, b))  # a contained in b
            if _round4(inter / len(sh[b])) >= 0.9:
                contain_truth.add((b, a))
    return jacc_truth, contain_truth


@pytest.mark.parametrize("seed", [421, 422, 423])
def test_measured_recall_on_random_corpora(spark, tmp_path, seed):
    from bfr_clustering_using_pyspark_spark.operators.dedup import (
        dedup_containment,
        dedup_minhash_lsh,
    )

    rng = np.random.default_rng(seed)
    df = _gen_corpus(rng)
    d = tmp_path / f"sf_recall_{seed}"
    d.mkdir()
    _write_docs(d, df)
    jacc_truth, contain_truth = _truth_sets(df)
    # the planted structure must actually produce enough positives
    # for the recall ratio to mean something
    assert len(jacc_truth) >= 15 and len(contain_truth) >= 15

    found_j = {
        (r["doc_a"], r["doc_b"])
        for r in dedup_minhash_lsh(spark, str(d)).collect()
    }
    assert found_j <= jacc_truth, f"false positives: {found_j - jacc_truth}"
    recall_j = len(found_j) / len(jacc_truth)
    assert recall_j >= RECALL_FLOOR_MINHASH, (
        f"minhash recall {recall_j:.3f} < {RECALL_FLOOR_MINHASH}"
        f" ({len(found_j)}/{len(jacc_truth)})"
    )

    found_c = {
        (r["doc_contained"], r["doc_container"])
        for r in dedup_containment(spark, str(d)).collect()
    }
    assert found_c <= contain_truth, f"false positives: {found_c - contain_truth}"
    recall_c = len(found_c) / len(contain_truth)
    assert recall_c >= RECALL_FLOOR_CONTAIN, (
        f"containment recall {recall_c:.3f} < {RECALL_FLOOR_CONTAIN}"
        f" ({len(found_c)}/{len(contain_truth)})"
    )
