"""Cross-engine fuzz over RANDOM corpora: the documents/embeddings
single-table keys must hash-match their DuckDB oracles on generated
data, not just the shipped testdata tables — oracle parity that only
holds for one dataset is a coincidence, not a contract.

Data is generated schema-faithful to TESTDATA.md (no NULLs, n_chars
== length(text), non-degenerate vectors) with deliberate edge shapes:
empty and 1-token texts, exact duplicates, high-overlap near-dups,
punctuation/unicode noise.
"""

import os
import sys
from pathlib import Path

import duckdb
import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))
from check_correctness import table_hash  # noqa: E402


def _seeds(default: list[int]) -> list[int]:
    """Per-wave seed list; SPARK_GRAFT_FUZZ_SEEDS=101,102 replaces
    every wave's seeds for one-off fresh-seed evidence sweeps without
    touching the committed regression pins."""
    env = os.environ.get("SPARK_GRAFT_FUZZ_SEEDS")
    return [int(x) for x in env.split(",")] if env else default

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
    "text_bigram_logprob",
    "text_bpe_train",
    "text_bpe_encode",
    "text_bpe_vocab",
    "seq_pack_contig",
    "corpus_source_overlap",
    "doc_chunk",
    "chunk_boilerplate",
    "text_bm25",
    "corpus_train_shuffle",
    # r13: conjunctive retrieval family + packing-efficiency eval
    "text_bm25_conj",
    "retrieval_conj_eval",
    "seq_pack_eval",
    "corpus_epoch_plan",
    # r14: fertility audit (rides the BPE fit on the random corpus);
    # sequential 4-stage cascade (the generator's exact + near dups
    # exercise every stage's attrition)
    "tokenizer_fertility",
    "dedup_cascade",
]
EMB_KEYS = [
    "embedding_normalize",
    "embedding_quantize",
    "ann_bruteforce",
    "ann_lsh",
    "dedup_embedding",
    # need BOTH views (documents lexical leg + embeddings vector
    # leg); deterministic — every candidate is scored, no
    # probabilistic blocking
    "q_hybrid_rrf",
    "retrieval_eval",
    # r13: deterministic ML-eval + contrastive mining keys
    "kmeans_inertia_eval",
    "davies_bouldin_eval",
    "silhouette_eval",
    "contrastive_pairs",
    "emb_truncate_eval",
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


def _compare(spark, key: str, fn, sql: str, sf_dir: str, con) -> int:
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
    return len(srows)


@pytest.mark.parametrize("seed", _seeds([11, 23]))
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


# ---------------------------------------------------------------------------
# Multi-table fuzz: join-heavy TPC-H/events keys on random generated
# star-schema corpora. The r7 verdict's top evidence gap — these keys
# were oracle-proven only on the shipped generator's distributions.
# Deliberate edge shapes beyond random values:
#   - a HOT customer holding ~15% of all orders (join/agg skew)
#   - customers with ZERO orders (q13's zero bucket, outer-join null side)
#   - ORPHAN orders (o_custkey not in customer) and orders with no
#     lineitems (referential-integrity-free behavior must agree)
#   - money values on a 2-decimal grid (the engines' shared cents domain)
# ---------------------------------------------------------------------------

TPCH_KEYS = [
    "q3_shipping_priority",
    "q5_local_supplier",
    "q7_volume_shipping",
    "q_outer_join",
    "q_null_semantics",
    "q_asof_join",
    "q13_cust_distribution",
    "q_merge_upsert",
    "q_cdc_snapshot_diff",
    "q_survivorship",
    "q_top_customers",
    "q_order_priority",
    "q10_returned_items",
    "q12_shipmode",
    # second wave: decorrelated / anti-join / window-over-join shapes
    "q18_large_orders",
    "q2_min_cost_supplier",
    "q_range_join",
    "q9_product_profit",
    "q17_small_qty_revenue",
    "q22_idle_customers",
    "q21_blame_supplier",
    "q8_market_share",
    "q16_supplier_cnt",
    # events-family join/window keys (skewed hot user, random arrivals)
    "q_events_retention",
    "q_events_sessionize",
    "q_events_funnel",
    "q_skew_join",
    "q_time_to_convert",
    "q_key_skew_profile",
    # cross-domain: PK/FK/range checks spanning customer/orders/
    # lineitem/documents — orphan rows make the FK counters nonzero
    "q_dq_checks",
    # fourth wave: the remaining deterministic SQL-surface keys —
    # language/typing features (lateral, generators, higher-order,
    # variant, try_, recursive CTE, set ops, scalar subqueries),
    # regression/model-per-key, and the asof-grouped shape
    "q_asof_grouped",
    "q_complex_types",
    "q_corr_matrix",
    "q_date_funcs",
    "q_events_json",
    "q_explode_outer",
    "q_generator_funcs",
    "q_group_by_all",
    "q_higher_order_funcs",
    "q_ignore_nulls_window",
    "q_join_strategies",
    "q_json_schema_roundtrip",
    "q_lateral_join",
    "q_observed_metrics",
    "q_range_frame",
    "q_recursive_cte",
    "q_regression",
    "q_scalar_subquery",
    "q_set_ops",
    "q_set_ops_all",
    "q_try_arithmetic",
    "q_unpivot",
    "q_variant_type",
    "model_per_key",
    # fourth wave: md5-deterministic sampling + sketches + curation
    # (the fuzz corpus's EMPTY document is what exposed the
    # q_weighted_sample zero-weight division — keep it covered)
    "q_weighted_sample",
    "sample_stratified",
    "sample_train_split",
    "seq_pack",
    "q_kmv_distinct",
    "q_linear_count",
    "q_countmin_topk",
    "q_bloom_filter_join",
    "corpus_mix",
    "decontaminate",
    "corpus_curate",
    # fourth wave: graph + component/substring dedup over the star
    # tables' co-occurrence edges and the documents corpus
    "dedup_components",
    "graph_pagerank",
    "graph_triangles",
    "graph_label_prop",
    "dedup_substring",
    "dedup_recall_eval",
    # third wave: aggregation/window/warehouse shapes over the star
    # tables — single-table but previously fuzzed on no random corpus
    "q1_pricing_summary",
    "q6_forecast_revenue",
    "q14_promo_revenue",
    "q19_disjunctive",
    "q15_top_supplier",
    "q11_important_stock",
    "q20_potential_promo",
    "q_rollup",
    "q_cube",
    "q_grouping_sets",
    "q_part_pivot",
    "q_window_funcs",
    "q_moving_avg",
    "q_running_total",
    "q_gap_fill",
    "q_mv_rollup",
    # r15: delta-merge maintenance ≡ recompute on random orders
    "q_mv_incremental",
    "q_scd2_history",
    "q_rfm_segmentation",
    "q_market_basket",
    "q_histogram",
    "q_salted_agg",
    "q_zorder_layout",
    "dedup_fuzzy_names",
    "q_events_windowed",
    "q_events_anomaly",
    "q_mad_outliers",
    "q_mad_outliers_dist",
    "q_path_3grams",
    "q_ks_test",
    "q_ab_test",
    "q_time_range_agg",
    "q_percentiles",
    "q_percentiles_dist",
]

_MKT = ["MACHINERY", "HOUSEHOLD", "FURNITURE", "BUILDING", "AUTOMOBILE"]
_PRIO = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_EVT = ["signup", "click", "error", "view", "purchase"]


def _money(rng, lo, hi, n):
    return np.round(rng.uniform(lo, hi, size=n), 2)


def _write(d, name, df):
    """Write via pyarrow so timestamps land as plain timestamp[us]
    (no tz) — byte-compatible with the shipped testdata files."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(d / f"{name}.parquet"))


def _gen_events(rng: np.random.Generator, n_cust: int, n_ev: int, span_days: int) -> pd.DataFrame:
    ev_base = np.datetime64("2024-01-01T00:00:00.000000")
    ev_ts = ev_base + rng.integers(0, span_days * 86400 * 10**6, size=n_ev).astype(
        "timedelta64[us]"
    )
    return pd.DataFrame({
        "event_id": np.arange(n_ev, dtype=np.int64),
        "ts": pd.Series(ev_ts.astype("datetime64[us]")),
        # user skew mirrors order skew: user 0 is hot
        "user_id": np.where(
            rng.uniform(size=n_ev) < 0.2, 0, rng.integers(0, n_cust, size=n_ev)
        ).astype(np.int64),
        "event_type": rng.choice(_EVT, size=n_ev),
        "value": _money(rng, 0.01, 330, n_ev),
        "props": [f'{{"k": {int(rng.integers(0, 100))}}}' for _ in range(n_ev)],
    })


def _gen_tpch(rng: np.random.Generator, d) -> None:
    n_cust, n_supp, n_part, n_ord = 60, 8, 80, 400
    region = pd.DataFrame({
        "r_regionkey": np.arange(5, dtype=np.int32),
        "r_name": ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"],
    })
    nation = pd.DataFrame({
        "n_nationkey": np.arange(25, dtype=np.int32),
        "n_name": [f"NATION_{i}" for i in range(25)],
        "n_regionkey": rng.integers(0, 5, size=25).astype(np.int32),
    })
    customer = pd.DataFrame({
        "c_custkey": np.arange(n_cust, dtype=np.int64),
        "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
        "c_nationkey": rng.integers(0, 25, size=n_cust).astype(np.int32),
        "c_acctbal": _money(rng, -900, 9900, n_cust),
        "c_mktsegment": rng.choice(_MKT, size=n_cust),
    })
    supplier = pd.DataFrame({
        "s_suppkey": np.arange(n_supp, dtype=np.int64),
        "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
        "s_nationkey": rng.integers(0, 25, size=n_supp).astype(np.int32),
        "s_acctbal": _money(rng, -900, 9900, n_supp),
    })
    part = pd.DataFrame({
        "p_partkey": np.arange(n_part, dtype=np.int64),
        "p_name": [
            f"{rng.choice(['cold', 'small', 'large', 'blue', 'green'])} "
            f"{rng.choice(['widget', 'bolt', 'rod', 'gear'])}"
            for _ in range(n_part)
        ],
        "p_brand": [f"Brand#{int(rng.integers(1, 25))}" for _ in range(n_part)],
        "p_type": rng.choice(
            ["ECONOMY", "SMALL", "LARGE", "STANDARD", "MEDIUM", "PROMO"], size=n_part
        ),
        "p_size": rng.integers(1, 51, size=n_part).astype(np.int32),
        "p_retailprice": _money(rng, 900, 920, n_part),
    })
    # order ownership: hot customer 0 gets ~15% of orders; the TOP
    # QUARTER of custkeys get none (zero bucket / outer-join nulls);
    # ~2% of orders are orphans (custkey beyond the customer table)
    owners = np.where(
        rng.uniform(size=n_ord) < 0.15,
        0,
        rng.integers(0, (3 * n_cust) // 4, size=n_ord),
    ).astype(np.int64)
    orphans = rng.uniform(size=n_ord) < 0.02
    owners[orphans] = n_cust + rng.integers(0, 5, size=int(orphans.sum()))
    base = np.datetime64("1995-01-01")
    odates = base + rng.integers(0, 2400, size=n_ord).astype("timedelta64[D]")
    orders = pd.DataFrame({
        "o_orderkey": np.arange(n_ord, dtype=np.int64),
        "o_custkey": owners,
        "o_orderstatus": rng.choice(["O", "F", "P"], size=n_ord, p=[0.45, 0.45, 0.1]),
        "o_totalprice": _money(rng, 1000, 500000, n_ord),
        "o_orderdate": pd.Series(odates.astype("datetime64[us]")),
        "o_orderpriority": rng.choice(_PRIO, size=n_ord),
    })
    # lineitems: 0-7 per order (some orders empty), plus a few orphan
    # lineitems pointing at a nonexistent order
    counts = rng.integers(0, 8, size=n_ord)
    l_ok = np.repeat(orders["o_orderkey"].to_numpy(), counts)
    l_ok = np.concatenate([l_ok, np.array([n_ord + 1, n_ord + 2], dtype=np.int64)])
    n_li = len(l_ok)
    l_ln = np.concatenate(
        [np.arange(1, c + 1) for c in counts if c > 0] + [np.array([1, 1])]
    ).astype(np.int32)
    odate_by_key = orders.set_index("o_orderkey")["o_orderdate"]
    ship_base = odate_by_key.reindex(l_ok).to_numpy()
    # orphan lineitems get a fixed shipdate
    ship_base[pd.isna(ship_base)] = np.datetime64("1996-06-01", "us")
    shipdates = ship_base + rng.integers(1, 120, size=n_li).astype("timedelta64[D]")
    lineitem = pd.DataFrame({
        "l_orderkey": l_ok,
        "l_partkey": rng.integers(0, n_part, size=n_li).astype(np.int64),
        "l_suppkey": rng.integers(0, n_supp, size=n_li).astype(np.int64),
        "l_linenumber": l_ln,
        "l_quantity": rng.integers(1, 51, size=n_li).astype(np.float64),
        "l_extendedprice": _money(rng, 900, 105000, n_li),
        "l_discount": np.round(rng.integers(0, 11, size=n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, size=n_li) / 100.0, 2),
        "l_returnflag": rng.choice(["R", "A", "N"], size=n_li),
        "l_linestatus": rng.choice(["O", "F"], size=n_li),
        "l_shipdate": pd.Series(shipdates.astype("datetime64[us]")),
    })
    events = _gen_events(rng, n_cust, n_ev=500, span_days=30)
    for name, df in [
        ("region", region), ("nation", nation), ("customer", customer),
        ("supplier", supplier), ("part", part), ("orders", orders),
        ("lineitem", lineitem), ("events", events),
    ]:
        _write(d, name, df)


@pytest.mark.parametrize("seed", _seeds([5, 17, 41]))
def test_join_keys_hash_match_on_random_star_schema(spark, tmp_path, seed):
    import __spark_entry__ as m

    rng = np.random.default_rng(seed)
    d = tmp_path / f"tpchfuzz{seed}"
    d.mkdir()
    _gen_tpch(rng, d)
    _write(d, "documents", _gen_documents(rng, 120))
    spark.createDataFrame(_gen_embeddings(rng, 150)).write.parquet(
        str(d / "embeddings.parquet")
    )
    con = duckdb.connect()
    for t in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents",
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')"
        )
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{d}/embeddings.parquet/*.parquet')"
    )
    qs, sqls = m.queries(), m.oracle_sql()
    for key in TPCH_KEYS:
        _compare(spark, key, qs[key], sqls[key], str(d), con)


# ---------------------------------------------------------------------------
# Fifth wave: ML / ANN / multimodal / format keys on random corpora.
# These need embeddings alongside the star tables. All are
# deterministic by construction (md5-seeded inits, hash-derived
# codecs, exact mirrored assignment rules), so their oracles must
# agree on ANY data — two seeds keeps the suite's added cost bounded
# while still ruling out single-corpus coincidences.
# ---------------------------------------------------------------------------

ML_MM_KEYS = [
    # k-means / BFR deterministic faces
    "kmeans_assign",
    "kmeans_lloyd_det",
    # r14: det-BFR family — deterministic epoch + accounting + CS tier
    # (on 150-row corpora the 32-per-chunk cap retains ~86% of every
    # gated chunk, so the compression pass is stressed far harder
    # than on the driver corpus)
    "bfr_lloyd_det",
    "bfr_lloyd_stats",
    "bfr_lloyd_cs",
    "bfr_lloyd_cs_stats",
    "bfr_lloyd_regate",
    "bfr_lloyd_final",
    # r15: headline NMI over the lifecycle labels (contingency tail
    # stressed on tiny fuzz corpora where the outlier class is big)
    "bfr_nmi_eval",
    # r15: frozen-model inference face (raw maha doubles hash-gated)
    "bfr_lloyd_predict",
    "mahalanobis_assign",
    "suffstats",
    "cluster_profile",
    "silhouette_eval",
    "ch_index_eval",
    "nmi_eval",
    "knn_classify_eval",
    "pca_power_det",
    "q_drift_detect",
    "points_source",
    "source_custom_points",
    # ANN ladder (bucketed assignment mirrored exactly in SQL)
    "ann_lsh_multiprobe",
    "ann_ivf",
    "ann_ivf_rerank",
    "ann_ivf_partitioned",
    "ann_pq",
    "ann_recall_eval",
    "ann_recall_curve",
    "ann_nndescent_graph",
    "ann_graph_search",
    # Arrow-batched python surfaces
    "udf_pandas_scalar",
    "udtf_doc_chunk",
    # multimodal codecs (hash-derived; mm_decode's oracle byte-sums
    # the UTF-8 encoding, which the unicode fuzz doc exercises)
    "mm_decode",
    "mm_pipeline",
    "mm_pgm_roundtrip",
    "mm_pgm_resize",
    "mm_wav_roundtrip",
    "mm_audio_features",
    "mm_video_frames",
    # format roundtrips + sinks + bucketed join
    "csv_roundtrip",
    "json_roundtrip",
    "orc_roundtrip",
    "q_schema_evolution",
    "sink_compact_small_files",
    "sink_shard_manifest",
    "q_bucketed_join",
]


@pytest.mark.parametrize("seed", _seeds([7, 29]))
def test_ml_ann_mm_keys_hash_match_on_random_corpora(spark, tmp_path, seed):
    import __spark_entry__ as m

    rng = np.random.default_rng(seed)
    d = tmp_path / f"mlfuzz{seed}"
    d.mkdir()
    _gen_tpch(rng, d)
    _write(d, "documents", _gen_documents(rng, 120))
    spark.createDataFrame(_gen_embeddings(rng, 150)).write.parquet(
        str(d / "embeddings.parquet")
    )
    con = duckdb.connect()
    for t in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents",
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')"
        )
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{d}/embeddings.parquet/*.parquet')"
    )
    qs, sqls = m.queries(), m.oracle_sql()
    for key in ML_MM_KEYS:
        _compare(spark, key, qs[key], sqls[key], str(d), con)


# ---------------------------------------------------------------------------
# Sixth wave: the staged-replay streaming keys on random corpora.
# The watermark-rule oracles were EMPIRICALLY CALIBRATED on the
# shipped generator's batch shapes — this wave is the proof they are
# engine semantics, not distribution coincidences. Events span 2 days
# instead of 30 so interval joins and session gaps actually fire
# (clicks within an hour of a purchase are vanishingly rare on a
# sparse 30-day stream).
# ---------------------------------------------------------------------------

STREAM_KEYS = [
    "stream_events_window",
    "stream_sliding_window",
    "stream_session_window",
    "stream_dedup",
    "stream_static_join",
    "stream_stream_join",
    "stream_sessionize_stateful",
    "stream_quality_filter",
    "stream_countmin",
    "stream_update_counts",
    "stream_late_data",
    "stream_upsert_sink",
    "stream_checkpoint_recovery",
    "stream_bfr_update",
    "stream_components",
]


@pytest.mark.parametrize("seed", _seeds([13, 37]))
def test_streaming_keys_hash_match_on_random_corpora(spark, tmp_path, seed):
    import __spark_entry__ as m

    rng = np.random.default_rng(seed)
    d = tmp_path / f"streamfuzz{seed}"
    d.mkdir()
    _gen_tpch(rng, d)
    _write(d, "events", _gen_events(rng, n_cust=60, n_ev=600, span_days=2))
    _write(d, "documents", _gen_documents(rng, 120))
    spark.createDataFrame(_gen_embeddings(rng, 150)).write.parquet(
        str(d / "embeddings.parquet")
    )
    con = duckdb.connect()
    for t in (
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents",
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')"
        )
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{d}/embeddings.parquet/*.parquet')"
    )
    qs, sqls = m.queries(), m.oracle_sql()
    rows = {}
    for key in STREAM_KEYS:
        rows[key] = _compare(spark, key, qs[key], sqls[key], str(d), con)
    # the dense stream must actually exercise the interval join
    assert rows["stream_stream_join"] > 0, (
        "dense 2-day stream produced no purchase-click pairs"
    )


# ---------------------------------------------------------------------------
# graph_triangles on the star fixture matches at 0 rows (the p95-ceil
# tie-strength threshold keeps ≤2 edges among 8 suppliers — a correct
# but TRIVIAL agreement). This corpus plants a hot supplier trio that
# always rides the same orders: their three pairwise co-occurrence
# counts tie exactly, all survive the quantile threshold, and the
# two-hop triangle join must actually fire on both engines.
# ---------------------------------------------------------------------------


def _gen_lineitem_hot_trio(rng: np.random.Generator) -> pd.DataFrame:
    n_ord, n_supp = 300, 8
    rows = []
    for o in range(n_ord):
        if rng.uniform() < 0.5:
            supps = [0, 1, 2]  # the trio is all-or-nothing, so its
            if rng.uniform() < 0.5:  # pair counts tie EXACTLY
                supps.append(int(rng.integers(3, n_supp)))
        else:
            supps = list(
                rng.choice(np.arange(3, n_supp), size=int(rng.integers(1, 4)), replace=False)
            )
        for ln, s in enumerate(supps, 1):
            rows.append((o, s, ln))
    n_li = len(rows)
    lo, ls, ln_ = zip(*rows)
    base = np.datetime64("1995-06-01", "us")
    return pd.DataFrame({
        "l_orderkey": np.array(lo, dtype=np.int64),
        "l_partkey": rng.integers(0, 50, size=n_li).astype(np.int64),
        "l_suppkey": np.array(ls, dtype=np.int64),
        "l_linenumber": np.array(ln_, dtype=np.int32),
        "l_quantity": rng.integers(1, 51, size=n_li).astype(np.float64),
        "l_extendedprice": _money(rng, 900, 105000, n_li),
        "l_discount": np.round(rng.integers(0, 11, n_li) / 100.0, 2),
        "l_tax": np.round(rng.integers(0, 9, n_li) / 100.0, 2),
        "l_returnflag": rng.choice(["R", "A", "N"], n_li),
        "l_linestatus": rng.choice(["O", "F"], n_li),
        "l_shipdate": pd.Series(
            (base + rng.integers(0, 500, n_li).astype("timedelta64[D]")).astype("datetime64[us]")
        ),
    })


@pytest.mark.parametrize("seed", _seeds([3, 19, 47]))
def test_triangles_fire_and_match_on_hot_trio_corpus(spark, tmp_path, seed):
    import __spark_entry__ as m

    rng = np.random.default_rng(seed)
    d = tmp_path / f"trifuzz{seed}"
    d.mkdir()
    _write(d, "lineitem", _gen_lineitem_hot_trio(rng))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{d}/lineitem.parquet')"
    )
    n = _compare(
        spark, "graph_triangles",
        m.queries()["graph_triangles"], m.oracle_sql()["graph_triangles"],
        str(d), con,
    )
    assert n >= 3, "hot-trio corpus produced no triangles"
