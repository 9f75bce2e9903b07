"""Edge-case tests for the round-2 operators: connected components on
constructed graphs (chains force multi-round convergence the testdata
never exercises), and gap-fill / repetition / PII scrub behavior on
hand-built tables written to a temp sf_dir."""

import pandas as pd
import pytest

from bfr_clustering_using_pyspark_spark.operators.dedup import connected_components
from bfr_clustering_using_pyspark_spark.operators.textstats import (
    text_pii_scrub,
    text_repetition,
)
from bfr_clustering_using_pyspark_spark.plans.tpch_ext import q_gap_fill


def _comp_map(df):
    return {r["doc_id"]: r["comp"] for r in df.collect()}


class TestConnectedComponents:
    def test_chain_converges_to_one_component(self, spark):
        # 0-1-2-3-4-5-6-7: diameter 7 needs several propagation rounds
        pairs = spark.createDataFrame(
            pd.DataFrame({"doc_a": list(range(7)), "doc_b": list(range(1, 8))})
        )
        comp = _comp_map(connected_components(pairs))
        assert comp == {i: 0 for i in range(8)}

    def test_two_components_stay_separate(self, spark):
        pairs = spark.createDataFrame(
            pd.DataFrame({"doc_a": [1, 2, 10], "doc_b": [2, 3, 11]})
        )
        comp = _comp_map(connected_components(pairs))
        assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}

    def test_empty_pairs_empty_result(self, spark):
        pairs = spark.createDataFrame([], "doc_a long, doc_b long")
        assert connected_components(pairs).count() == 0

    @pytest.mark.parametrize("seed", [3, 11, 29])
    def test_driver_gate_equals_distributed(self, spark, seed):
        """The small-edge driver union-find must produce EXACTLY the
        distributed propagation's labelling (same rows, same min-id
        comps) on random graphs: chains, hubs, and sparse noise in
        one corpus. small_gate=0 forces the distributed path on the
        same input."""
        import numpy as np

        rng = np.random.default_rng(seed)
        n = 200
        a = rng.integers(0, n, 150)
        b = (a + rng.integers(1, 10, 150)) % n
        pairs = spark.createDataFrame(
            pd.DataFrame({"doc_a": a.astype("int64"), "doc_b": b.astype("int64")})
        ).filter("doc_a != doc_b")
        fast = _comp_map(connected_components(pairs))
        # union-find is exact at any depth; give propagation enough
        # rounds for whatever diameter the random graph drew (the
        # default 16-round cap is the documented shallow-graph bound
        # -- deep graphs are connected_components_star's territory)
        slow = _comp_map(connected_components(pairs, small_gate=0, max_rounds=250))
        assert fast == slow
        assert fast  # non-degenerate
        # production shape: caller-pinned input, lazy symmetrize
        # union feeding the distributed propagation (the streaming
        # fold's escalated path above the driver gate)
        pinned = _comp_map(
            connected_components(
                pairs.localCheckpoint(eager=True),
                small_gate=0,
                max_rounds=250,
                pinned=True,
            )
        )
        assert pinned == slow


@pytest.fixture()
def tiny_sf(tmp_path, spark):
    """A minimal sf_dir with hand-built documents + orders tables."""
    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "text": [
                "spam spam spam spam spam spam",  # maximal repetition
                "one two three four five six seven eight",  # all distinct
                "hi",  # < 3 tokens -> excluded from repetition
                "alpha beta gamma alpha beta gamma alpha beta gamma",
            ],
            "lang": ["en"] * 4,
            "source": ["t"] * 4,
            "n_chars": [29, 39, 2, 49],
        }
    )
    orders = pd.DataFrame(
        {
            "o_orderkey": [1, 2, 3],
            "o_custkey": [1, 1, 2],
            "o_orderstatus": ["F", "F", "O"],
            "o_totalprice": [10.0, 20.0, 30.0],
            # day 2024-01-02 is missing -> gap-fill must emit a zero row
            "o_orderdate": pd.to_datetime(["2024-01-01", "2024-01-03", "2024-01-04"]),
            "o_orderpriority": ["1-URGENT"] * 3,
        }
    )
    spark.createDataFrame(docs).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    spark.createDataFrame(orders).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet")
    )
    return str(tmp_path)


class TestTextEdges:
    def test_repetition_extremes(self, spark, tiny_sf):
        rows = {r["doc_id"]: r for r in text_repetition(spark, tiny_sf).collect()}
        assert 2 not in rows  # < 3 tokens excluded
        assert rows[0]["dup_3gram_frac"] > 0.7  # spam x6 -> 4 identical grams
        assert rows[0]["top_token_frac"] == 1.0
        assert rows[1]["dup_3gram_frac"] == 0.0  # all distinct
        assert rows[3]["dup_3gram_frac"] > 0.5  # periodic text

    def test_pii_scrub_counts_and_redaction(self, spark, tiny_sf):
        rows = {r["doc_id"]: r for r in text_pii_scrub(spark, tiny_sf).collect()}
        # doc_id % 5 injection: 0 -> email, 1 -> url, 2 -> phone, 3 -> none
        assert (rows[0]["n_emails"], rows[0]["n_urls"], rows[0]["n_phones"]) == (1, 0, 0)
        assert (rows[1]["n_emails"], rows[1]["n_urls"], rows[1]["n_phones"]) == (0, 1, 0)
        assert (rows[2]["n_emails"], rows[2]["n_urls"], rows[2]["n_phones"]) == (0, 0, 1)
        assert (rows[3]["n_emails"], rows[3]["n_urls"], rows[3]["n_phones"]) == (0, 0, 0)
        # hashes of scrubbed text differ from raw only where PII existed
        import hashlib

        raw3 = hashlib.md5("alpha beta gamma alpha beta gamma alpha beta gamma".encode()).hexdigest()
        assert rows[3]["clean_hash"] == raw3


class TestGapFill:
    def test_missing_day_zero_filled(self, spark, tiny_sf):
        rows = {str(r["day"]): r for r in q_gap_fill(spark, tiny_sf).collect()}
        assert set(rows) == {"2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"}
        assert rows["2024-01-02"]["n_orders"] == 0
        assert rows["2024-01-02"]["revenue"] == 0.0
        # trailing average includes the explicit zero day
        assert rows["2024-01-03"]["avg_7d"] == 10.0  # (10 + 0 + 20) / 3


class TestStarComponents:
    """large-star/small-star must agree with min-label propagation on
    every graph shape (it is the O(log n)-round scale path)."""

    def _both(self, spark, pairs_df):
        from bfr_clustering_using_pyspark_spark.operators.dedup import (
            connected_components_star,
        )

        prop = _comp_map(connected_components(pairs_df))
        star = _comp_map(connected_components_star(pairs_df))
        return prop, star

    def test_chain(self, spark):
        pairs = spark.createDataFrame(
            pd.DataFrame({"doc_a": list(range(9)), "doc_b": list(range(1, 10))})
        )
        prop, star = self._both(spark, pairs)
        assert prop == star == {i: 0 for i in range(10)}

    @pytest.mark.parametrize("seed,n,m", [(7, 60, 45), (21, 40, 80), (99, 80, 30)])
    def test_random_graph_matches_propagation(self, spark, seed, n, m):
        import random

        rng = random.Random(seed)
        edges = sorted({(min(a, b), max(a, b)) for a, b in
                        ((rng.randrange(n), rng.randrange(n)) for _ in range(m))
                        if a != b})
        pairs = spark.createDataFrame(
            pd.DataFrame({"doc_a": [e[0] for e in edges], "doc_b": [e[1] for e in edges]})
        )
        prop, star = self._both(spark, pairs)
        assert prop == star

    def test_star_graph_one_round_shape(self, spark):
        # hub-and-spoke: already a star; must converge immediately
        pairs = spark.createDataFrame(
            pd.DataFrame({"doc_a": [0] * 6, "doc_b": list(range(1, 7))})
        )
        prop, star = self._both(spark, pairs)
        assert prop == star == {i: 0 for i in range(7)}


def test_unigram_logprob_semantics(spark):
    """Common tokens score low, rare tokens high; the flag rate is
    ~10% by construction of the quantile cut."""
    from bfr_clustering_using_pyspark_spark.operators.textstats import (
        text_unigram_logprob,
    )
    from tests.conftest import SF_SMALL

    rows = text_unigram_logprob(spark, SF_SMALL).collect()
    assert rows
    flagged = sum(r["flag_surprising"] for r in rows)
    assert 0.03 <= flagged / len(rows) <= 0.15
    for r in rows:
        assert r["avg_neg_logprob"] > 0
        assert r["n_tokens"] > 0


def test_bigram_logprob_semantics(spark):
    """Transitions the corpus LM has seen often score low; the flag
    rate is ~10%; sub-2-token docs report zero and are never
    flagged. Cross-checks one doc's score against a pure-Python
    recompute of the interpolated LM."""
    import math
    import re
    from collections import Counter

    from bfr_clustering_using_pyspark_spark.operators.textstats import (
        BIGRAM_LAMBDA,
        LOGPROB_SCALE,
        text_bigram_logprob,
    )
    from tests.conftest import SF_SMALL

    rows = text_bigram_logprob(spark, SF_SMALL).collect()
    assert rows
    flagged = sum(r["flag_surprising"] for r in rows)
    assert 0.03 <= flagged / len(rows) <= 0.15
    for r in rows:
        if r["n_bigrams"] == 0:
            assert r["avg_neg_logprob"] == 0.0 and not r["flag_surprising"]
        else:
            assert r["avg_neg_logprob"] > 0

    docs = {
        d["doc_id"]: re.findall("[a-z0-9]+", d["text"].lower())
        for d in spark.read.parquet(f"{SF_SMALL}/documents.parquet").collect()
    }
    uni = Counter(t for ts in docs.values() for t in ts)
    big = Counter(p for ts in docs.values() for p in zip(ts, ts[1:]))
    total = sum(uni.values())
    target = max(docs, key=lambda d: len(docs[d]))
    toks = docs[target]
    qs = [
        round(
            -math.log(
                BIGRAM_LAMBDA * big[(a, b)] / uni[a]
                + (1 - BIGRAM_LAMBDA) * uni[b] / total
            )
            * LOGPROB_SCALE
        )
        for a, b in zip(toks, toks[1:])
    ]
    n = len(qs)
    want = ((sum(qs) * 20000 + LOGPROB_SCALE * n) // (2 * LOGPROB_SCALE * n)) / 1e4
    got = {r["doc_id"]: r for r in rows}[target]
    assert got["n_bigrams"] == n
    assert got["avg_neg_logprob"] == want


def test_time_range_frame_ties_are_peers(spark, tmp_path):
    """RANGE interval frames treat tied timestamps as peers: rows at
    the same instant include EACH OTHER in their frames (a ROWS frame
    cannot express this). Also checks the 6h trailing bound and the
    calendar-day partition reset."""
    import datetime as dt

    from bfr_clustering_using_pyspark_spark.plans.events import q_time_range_agg

    base = dt.datetime(2024, 1, 5, 12, 0, 0)
    rows = [
        # two events at the SAME instant -> peers, both frames n=2
        (1, base, "purchase", 1.0),
        (2, base, "purchase", 2.0),
        # 5h59m later: inside the 6h trailing bound of nothing before
        # it except the peers -> n=3
        (3, base + dt.timedelta(hours=5, minutes=59), "purchase", 4.0),
        # 6h01m after base: base pair now outside -> frame = row 3 + self
        (4, base + dt.timedelta(hours=6, minutes=1), "purchase", 8.0),
        # next calendar day: partition resets -> n=1
        (5, base + dt.timedelta(days=1), "purchase", 16.0),
        # different type, same instant as base: separate partition
        (6, base, "view", 32.0),
    ]
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "event_type", "value"]
    )
    pdf["user_id"] = 1
    pdf["props"] = "{}"
    sf_dir = str(tmp_path)
    pdf.to_parquet(f"{sf_dir}/events.parquet", index=False)

    out = {
        r["event_id"]: (r["n_6h"], r["v_6h"])
        for r in q_time_range_agg(spark, sf_dir).collect()
    }
    assert out[1] == (2, 3.0) and out[2] == (2, 3.0)  # peers see each other
    assert out[3] == (3, 7.0)
    assert out[4] == (2, 12.0)  # base pair aged out of the 6h bound
    assert out[5] == (1, 16.0)  # day partition reset
    assert out[6] == (1, 32.0)  # per-type partition


def test_dedup_substring_planted_runs(spark, tmp_path):
    """Planted verbatim runs: the reported longest run must equal the
    planted length exactly, a doc sharing only scattered (non-
    consecutive) shingles must NOT pair, and short docs must not
    crash the shingle builder."""
    from bfr_clustering_using_pyspark_spark.operators.dedup import (
        SUBSTR_K,
        SUBSTR_MIN_RUN,
        dedup_substring,
    )

    shared = [f"s{i}" for i in range(30)]  # 30-token verbatim run
    docs = [
        (1, " ".join([f"a{i}" for i in range(20)] + shared)),
        (2, " ".join(shared + [f"b{i}" for i in range(20)])),
        # scattered: every shared shingle broken by unique tokens
        (3, " ".join(x for p in zip(shared, [f"c{i}" for i in range(30)]) for x in p)),
        (4, "short doc"),  # < K tokens
    ]
    pdf = pd.DataFrame(docs, columns=["doc_id", "text"])
    pdf["lang"], pdf["source"] = "en", "t"
    pdf["n_chars"] = pdf["text"].str.len()
    pdf.to_parquet(f"{tmp_path}/documents.parquet", index=False)

    out = {(r["doc_a"], r["doc_b"]): r["max_run_shingles"]
           for r in dedup_substring(spark, str(tmp_path)).collect()}
    # 30 shared tokens -> 30 - K + 1 consecutive shingles
    assert out == {(1, 2): 30 - SUBSTR_K + 1}
    assert 30 - SUBSTR_K + 1 >= SUBSTR_MIN_RUN


def test_ks_test_detects_planted_shift(spark, tmp_path):
    """Positive control: values in arm 1 shifted by +50 must reject;
    identical distributions must not. Arms are md5-replayable, so the
    test computes each user's arm in Python the same way."""
    import datetime as dt
    import hashlib

    from bfr_clustering_using_pyspark_spark.plans.events import q_ks_test

    def arm(uid: int) -> int:
        return int(hashlib.md5(f"ab:{uid}".encode()).hexdigest()[:15], 16) % 2

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for uid in range(200):
        for k in range(5):
            v = 10.0 + (uid * 7 + k * 13) % 40
            if arm(uid) == 1:
                v += 50.0  # planted distribution shift
            rows.append((eid, base, uid, "purchase", v, "{}"))
            eid += 1
    pdf = pd.DataFrame(
        rows, columns=["event_id", "ts", "user_id", "event_type", "value", "props"]
    )
    pdf.to_parquet(f"{tmp_path}/events.parquet", index=False)
    r = q_ks_test(spark, str(tmp_path)).collect()[0]
    assert r["reject_5pct"] is True and r["ks_stat"] > 0.5
    assert r["n_a"] + r["n_b"] == 1000

    # A/A: same generator without the shift must NOT reject
    pdf["value"] = [10.0 + (u * 7 + k) % 40 for u in range(200) for k in range(5)]
    pdf.to_parquet(f"{tmp_path}/events.parquet", index=False)
    r2 = q_ks_test(spark, str(tmp_path)).collect()[0]
    assert r2["reject_5pct"] is False


class TestPandasScalarUdfNulls:
    def test_null_text_yields_null_not_crash(self, spark):
        """The scalar pandas UDFs must match built-in NULL semantics:
        NULL text in → NULL counts out (the nullable-Int32 fix; a
        plain int32 astype raised on the NaN the string ops emit)."""
        from bfr_clustering_using_pyspark_spark.operators.textstats import (
            _pandas_scalar_udfs,
        )

        ws_tokens, ascii_letters = _pandas_scalar_udfs()
        df = spark.createDataFrame(
            [(0, "a b c"), (1, None), (2, ""), (3, "Xy z9")],
            "doc_id long, text string",
        )
        rows = {
            r["doc_id"]: (r["t"], r["l"])
            for r in df.select(
                "doc_id",
                ws_tokens("text").alias("t"),
                ascii_letters("text").alias("l"),
            ).collect()
        }
        assert rows[0] == (3, 3)
        assert rows[1] == (None, None)
        assert rows[2] == (1, 0)  # ''.split(' ') -> [''] like the JVM
        assert rows[3] == (2, 3)


class TestAnnSharedGraphAndPqAssert:
    def test_nnd_graph_cached_per_session(self, spark):
        """ann_nndescent_graph and ann_graph_search share one
        materialized build: the second _nnd_graph call must return
        the SAME checkpointed frame, not rebuild."""
        import bfr_clustering_using_pyspark_spark.operators.similarity as S

        g1 = S._nnd_graph(spark, "/root/testdata/sf0.001")
        g2 = S._nnd_graph(spark, "/root/testdata/sf0.001")
        assert g1 is g2

    def test_pq_sparse_anchor_range_fails_fast(self, spark):
        """A gap in the PQ anchor id range must raise immediately
        (positional codebook indexing would silently diverge from
        the oracle's id-offset indexing)."""
        import bfr_clustering_using_pyspark_spark.operators.similarity as S

        old_hi = S.PQ_ANCHOR_HI
        S.PQ_ANCHOR_HI = old_hi + 10_000_000  # beyond any vec_id
        try:
            with pytest.raises(ValueError, match="sparse"):
                S._pq_anchor_units(spark, "/root/testdata/sf0.001")
        finally:
            S.PQ_ANCHOR_HI = old_hi


class TestCcDriverTypes:
    def test_mixed_width_pair_columns_widen(self, spark):
        """_cc_driver's output schema must use the WIDER of the two
        pair-column types: comp values sourced from doc_b ids would
        otherwise be created under doc_a's narrower type, diverging
        from the distributed path's union coercion."""
        from bfr_clustering_using_pyspark_spark.operators.dedup import _cc_driver

        pairs = spark.createDataFrame(
            [(1, 2), (2, 3)], "doc_a int, doc_b bigint"
        )
        out = _cc_driver(spark, pairs, sort=True)
        assert [f.dataType.simpleString() for f in out.schema.fields] == [
            "bigint",
            "bigint",
        ]
        assert {r["doc_id"]: r["comp"] for r in out.collect()} == {1: 1, 2: 1, 3: 1}


def test_ivf_oracle_guard_fails_fast_beyond_pinned_domain():
    """Above IVF_SMALL_N the Spark IVF face adapts its list count but
    the static SQL oracle stays pinned at N_IVF_LISTS — the oracle
    must REFUSE loudly there instead of hash-mismatching."""
    import duckdb

    from bfr_clustering_using_pyspark_spark.operators.similarity import (
        ANN_IVF_SQL,
        IVF_SMALL_N,
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT i AS vec_id,"
        f" list_transform(range(64), x -> 0.1 + x * 0.001) AS embedding"
        f" FROM range({IVF_SMALL_N + 1}) t(i)"
    )
    with pytest.raises(duckdb.Error, match="IVF oracle replay domain"):
        con.execute(ANN_IVF_SQL).fetchall()
