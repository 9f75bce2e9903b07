"""Oracle-vs-oracle equivalence for the r11 scalable variants
(tools/scalable_oracles.py): on randomized corpora, the inverted-
index pair oracle must equal the quadratic all-pairs oracle, and the
union-find closure must equal the recursive-CTE closure. Pure
DuckDB/Python — no Spark session — so these run in seconds and fuzz
the REWRITE itself (the gate only ever compares one oracle against
Spark)."""

import sys
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from scalable_oracles import (  # noqa: E402
    DEDUP_MINHASH_LSH_INVERTED_SQL,
    _components_rows,
    _seq_pack_rows,
)

_VOCAB = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lam mu "
    "nu xi omicron pi rho sigma tau upsilon phi chi psi omega spark"
).split()


def _corpus(seed: int, n: int = 120, dup_groups: int = 8) -> pd.DataFrame:
    """Random docs with planted near-dup families: each family shares
    a base text; members mutate a few tokens (J straddles 0.7)."""
    rng = np.random.default_rng(seed)
    texts = []
    for g in range(dup_groups):
        base = list(rng.choice(_VOCAB, size=int(rng.integers(12, 40))))
        fam = int(rng.integers(2, 5))
        for m in range(fam):
            t = list(base)
            for _ in range(int(rng.integers(0, 4))):
                t[int(rng.integers(0, len(t)))] = str(rng.choice(_VOCAB)) + str(m)
            texts.append(" ".join(t))
    while len(texts) < n:
        texts.append(" ".join(rng.choice(_VOCAB, size=int(rng.integers(5, 30)))))
    return pd.DataFrame(
        {
            "doc_id": np.arange(len(texts), dtype=np.int64),
            "text": texts,
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )


QUADRATIC_PAIRS_SQL = """
WITH t AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS toks FROM documents
), sh AS MATERIALIZED (
  SELECT doc_id, list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                                for i in generate_series(1, len(toks) - 2)]) AS shingles
  FROM t WHERE len(toks) >= 3
)
SELECT * FROM (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(round(len(list_intersect(a.shingles, b.shingles)) * 1e0 /
               (len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles)))
               * 1e4) AS BIGINT) / 1e4 AS jaccard
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
) WHERE jaccard >= 0.7 ORDER BY doc_a, doc_b
"""


@pytest.mark.parametrize("seed", range(8))
def test_inverted_index_equals_quadratic_pairs(seed):
    con = duckdb.connect()
    con.register("documents", _corpus(seed))
    quad = con.sql(QUADRATIC_PAIRS_SQL).fetchall()
    inv = con.sql(DEDUP_MINHASH_LSH_INVERTED_SQL).fetchall()
    assert inv == quad
    if seed == 0:
        assert len(quad) > 0  # the fixture actually plants dup pairs


@pytest.mark.parametrize("seed", range(8))
def test_union_find_closure_equals_recursive_cte(seed):
    con = duckdb.connect()
    con.register("documents", _corpus(seed))
    cols, rows = _components_rows(con)
    assert cols == ["doc_id", "comp"]
    rec = con.sql(
        f"""
WITH RECURSIVE pr AS ({QUADRATIC_PAIRS_SQL.replace("ORDER BY doc_a, doc_b", "")}),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pr
  UNION SELECT doc_b, doc_a FROM pr
), reach(node, comp) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.b, r.comp FROM reach r JOIN edges e ON e.a = r.node
)
SELECT node AS doc_id, min(comp) AS comp FROM reach GROUP BY node ORDER BY doc_id
"""
    ).fetchall()
    assert [tuple(r) for r in rows] == [tuple(r) for r in rec]


@pytest.mark.parametrize("seed", range(4))
def test_seq_pack_fold_equals_recursive_cte(seed):
    from bfr_clustering_using_pyspark_spark.operators.sampling import SEQ_PACK_SQL

    con = duckdb.connect()
    con.register("documents", _corpus(seed, n=200))
    cols, rows = _seq_pack_rows(con)
    rec = con.sql(SEQ_PACK_SQL).fetchall()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, rec))


# ------------------------------------------------------ r13 variants


@pytest.mark.parametrize("seed", [0, 1, 2, 3, 4])
def test_bloom_inverted_equals_quadratic(seed):
    """The distinct-key inverted bloom oracle must equal the
    per-order list_has_all original on randomized customer/orders
    corpora (keys chosen so some collide into set buckets → real
    false positives)."""
    from scalable_oracles import _bloom_inverted_sql
    from bfr_clustering_using_pyspark_spark.operators.sketches import (
        Q_BLOOM_FILTER_JOIN_SQL,
    )

    rng = np.random.default_rng(seed)
    n_cust = 400
    custkeys = np.arange(1, n_cust + 1, dtype=np.int64)
    segs = rng.choice(
        ["AUTOMOBILE", "BUILDING", "MACHINERY"], size=n_cust, p=[0.3, 0.4, 0.3]
    )
    customer = pd.DataFrame({"c_custkey": custkeys, "c_mktsegment": segs})
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(1, 2001, dtype=np.int64),
            "o_custkey": rng.choice(custkeys, size=2000),
        }
    )
    con = duckdb.connect()
    con.register("customer", customer)
    con.register("orders", orders)
    a = con.execute(Q_BLOOM_FILTER_JOIN_SQL).fetchall()
    b = con.execute(_bloom_inverted_sql()).fetchall()
    assert a == b


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_silhouette_blas_replay_equals_sql(seed):
    """The exact-integer BLAS replay must equal the pair-join SQL
    oracle bit-for-bit on randomized labeled embeddings (including
    near-tie b-vs-a configurations)."""
    from scalable_oracles import _silhouette_rows
    from bfr_clustering_using_pyspark_spark.plans.ml_queries import (
        SILHOUETTE_EVAL_SQL,
    )

    rng = np.random.default_rng(seed)
    n, d, k = 150, 16, 4
    labels = rng.integers(0, k, size=n)
    X = rng.normal(0, 0.3, size=(n, d)) + labels[:, None] * 0.05
    emb = pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": [row.astype(np.float32).tolist() for row in X],
            "label": labels.astype(np.int32),
        }
    )
    con = duckdb.connect()
    con.register("embeddings", emb)
    want = [tuple(r) for r in con.execute(SILHOUETTE_EVAL_SQL).fetchall()]
    cols, got = _silhouette_rows(con)
    assert cols == ["label", "n_points", "mean_silhouette"]
    assert [tuple(r) for r in got] == want


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_seq_pack_eval_iterative_equals_recursive(seed):
    from scalable_oracles import _seq_pack_eval_rows
    from bfr_clustering_using_pyspark_spark.operators.sampling import (
        SEQ_PACK_EVAL_SQL,
    )

    con = duckdb.connect()
    con.register("documents", _corpus(seed, n=200))
    want = [tuple(r) for r in con.execute(SEQ_PACK_EVAL_SQL).fetchall()]
    cols, got = _seq_pack_eval_rows(con)
    assert [tuple(r) for r in got] == want
