"""Plan audit: print physical plans for headline queries and check
scale properties — pushed filters, pruned scans (ReadSchema),
broadcast joins where expected, whole-stage codegen coverage,
exchange (shuffle) counts.

Usage: python tools/explain_audit.py [query ...]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

AUDIT = {
    # name: (expect_pushed_filter, expect_broadcast, max_exchanges)
    # max_exchanges includes the final presentation orderBy (1 range
    # exchange) — the hash gate doesn't need it but users get
    # deterministic output
    "q1_pricing_summary": (True, False, 2),
    "q3_shipping_priority": (True, True, 4),
    "q5_local_supplier": (True, True, 4),
    "q6_forecast_revenue": (True, False, 1),
    "q_top_customers": (False, True, 3),
    "q_order_priority": (True, True, 3),
    "q_events_windowed": (False, False, 3),  # countDistinct = 2-phase agg
    "q_events_sessionize": (False, False, 2),
    "q_asof_join": (True, False, 2),
    "text_quality": (False, False, 1),
    "dedup_exact": (False, False, 4),  # 3 windows (one per key kind) + sort
    "dedup_ngram_jaccard": (False, False, 3),
    "ann_bruteforce": (False, True, 2),
    "cluster_profile": (False, False, 2),
    "q10_returned_items": (True, True, 3),
    "q16_supplier_cnt": (True, True, 4),  # distinct-count = 2-phase
    "q18_large_orders": (False, True, 4),
    "q_salted_agg": (False, False, 3),
    "q_merge_upsert": (False, False, 4),
    "tfidf_top_terms": (False, True, 5),
    "q_regression": (False, True, 2),
    "embedding_normalize": (False, False, 1),
    "dedup_fuzzy_names": (False, False, 3),
    "q_date_funcs": (False, False, 2),
    "q7_volume_shipping": (True, True, 3),
    "q9_product_profit": (True, True, 3),
    "q13_cust_distribution": (True, True, 3),
    "q17_small_qty_revenue": (True, True, 4),
    "q22_idle_customers": (True, True, 3),
    "sample_stratified": (False, False, 2),
    "sample_train_split": (False, False, 2),
    "decontaminate": (True, True, 5),
    "q21_blame_supplier": (False, True, 4),  # one fact shuffle + agg + dim join + sort
    "q_events_anomaly": (True, False, 2),  # one user_id shuffle + final sort
    "seq_pack": (False, False, 2),  # one shard shuffle + final sort
    "text_unigram_logprob": (False, True, 5),  # dict build + broadcast scalar + score
    "q_countmin_topk": (False, True, 5),
    "q_bloom_filter_join": (True, True, 3),
    "q_histogram": (False, True, 3),  # bounds broadcast + bucket agg + sort
    "q_scd2_history": (True, False, 2),  # one dim-key window + sort
    "q_mad_outliers": (False, True, 5),  # two percentile passes are inherent to MAD
    "q_path_3grams": (False, False, 3),  # user window + path agg + sort
    "q_corr_matrix": (False, False, 2),  # one map pass; materialized moments feed the branches
    "q_survivorship": (False, False, 2),  # one block-key window + sort
    "q_time_to_convert": (False, False, 2),  # user agg + scalar percentile agg
    "q8_market_share": (False, True, 4),
    "q15_top_supplier": (False, True, 3),
    "q_mv_rollup": (False, False, 3),  # daily agg (materialized) + monthly agg + sort
    "q_time_range_agg": (False, False, 2),  # one (type,day) window shuffle + sort
    "mm_pgm_resize": (False, False, 1),  # pure map pipeline, sort only
    "dedup_substring": (False, True, 6),  # h window + self-join + diag window + 2 aggs + sort
    "q_ks_test": (True, True, 4),  # value-grid agg + ECDF window + broadcast totals + max agg
    "sink_shard_manifest": (False, False, 2),  # readback agg + sort (write is a side effect)
    "source_custom_points": (False, False, 1),  # custom source scan + sort
}


def main() -> None:
    from bfr_clustering_using_pyspark_spark.plans import all_queries
    from bfr_clustering_using_pyspark_spark.session import get_spark

    spark = get_spark("explain_audit")
    qs = all_queries()
    only = set(sys.argv[1:])
    sf_dir = "/root/testdata/sf0.01"
    failures = []
    for name, (want_push, want_bcast, max_exch) in AUDIT.items():
        if only and name not in only:
            continue
        df = qs[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        pushed = "PushedFilters: [" in plan and re.search(r"PushedFilters: \[[^\]]+\]", plan)
        bcast = "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
        # count only real shuffles ("Exchange (n)" tree nodes), not
        # BroadcastExchange
        n_exch = len(re.findall(r"(?<!Broadcast)Exchange \(\d+\)", plan))
        codegen = len(set(re.findall(r"codegen id : (\d+)", plan)))
        probs = []
        if want_push and not pushed:
            probs.append("no pushed filters")
        if want_bcast and not bcast:
            probs.append("no broadcast join")
        if n_exch > max_exch:
            probs.append(f"{n_exch} exchanges (max {max_exch})")
        status = "OK " if not probs else "BAD"
        print(f"{status} {name}: exchanges={n_exch} codegen_spans={codegen} "
              f"pushed={bool(pushed)} broadcast={bcast} {'; '.join(probs)}")
        if probs:
            failures.append(name)
            if only:
                print(plan)
    print("\nfailures:", failures or "none")
    spark.stop()


if __name__ == "__main__":
    main()
