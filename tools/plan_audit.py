"""Plan auditor: dump formatted physical plans for the headline queries and
flag scale anti-patterns mechanically. Regenerates PLANS.md:

    python tools/plan_audit.py [sf_dir]

Red flags checked per plan:
* CartesianProduct / BroadcastNestedLoopJoin where an equi-join was intended
* parquet scans with no pushed filters when the query filters that table
* scans reading every column (no pruning) — ReadSchema width == table width
"""

from __future__ import annotations

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from etl_weather_jabar_spark.queries import QUERIES  # noqa: E402
from etl_weather_jabar_spark.session import get_spark  # noqa: E402

AUDIT_QUERIES = [
    "pricing_summary",
    "order_lineitem_join_agg",
    "shipping_priority_topk",
    "local_supplier_volume",
    "promo_revenue_share",
    "recap_daily_agg",
    "dedup_keep_first",
    "grid_align_hours",
    "broadcast_dim_join",
    "campaign_range_join",
    "semi_join_open_order_customers",
    "first_order_per_customer",
    "exact_stats_by_type",
    "json_props_extract",
    "minhash_lsh_neardup",
    "ann_cosine_topk",
    "skew_safe_distinct_users",
    "forecast_revenue_change",
    "top_revenue_supplier",
    "small_quantity_revenue",
    "nation_product_profit",
    "sliding_window_30min",
    "rolling_1h_user_value",
    "unpivot_lineitem_measures",
    "lsh_neardup_clusters",
    "pack_sequences_512",
    "tfidf_top_terms",
    "embedding_quantize_error",
    "profile_orders",
    "weighted_sample_docs",
    "ewma_user_value",
    "session_window_native",
    "snapshot_diff_orders",
    "scd2_user_status",
    "standardize_event_values",
    "ngram_jaccard_pairs",
    "apply_cdc_snapshot",
    "benchmark_decontaminate",
    "mixture_resample_docs",
    "lateral_topk_orders",
    "recursive_cte_rollup",
    "map_functions_surface",
    "triangle_count",
    "apply_cdc_joined_snapshot",
    "min_cost_supplier_per_part",
    "inventory_value_share",
    "srp_lsh_ann_topk",
    "embedding_neardup_pairs",
    "semantic_dedup_docs",
    "embedding_covariance_topk",
    "pagerank_exact_int",
    "rollup_grand_total_empty",
    "crossdoc_repeated_ngrams",
    "incremental_agg_view_orders",
    "skyline_parts",
    "linear_interp_gap_fill",
    "hash_range_reconcile_orders",
    "rolling_median_5",
    "ohlc_hourly_value",
    "source_vocab_overlap",
    "equidepth_histogram_totalprice",
    "correlation_exact_moments",
    "ks_two_sample_values",
    "excess_stock_suppliers",
    "topk_per_group_scalable",
    "zorder_cluster_audit",
    "doc_rarity_score",
    "vocab_coverage_docs",
    "param_sql_group_by_all",
    "copurchase_pairs_topk",
    "abc_classification_parts",
    "rfm_segment_counts",
    "quality_cascade_audit",
    "governance_mask_try_surface",
    "relational_division_ranked",
    "session_transition_matrix",
    "benford_digit_audit",
    "gini_revenue_concentration",
    "regression_surface",
    "argmax_filter_surface",
    "collation_group_counts",
    "pii_redact_stats",
    "pit_scd2_lookup",
    "percentile_disc_surface",
    "weighted_median_price",
    "contamination_score_topk",
    "embedding_dim_stats",
    "key_skew_report",
    "corpus_datasheet",
    "ntile_cume_dist_customers",
    "bag_set_ops_suppliers",
    "explode_outer_tokens",
    "chunk_dedup_docs",
    "classifier_filter_docs",
    "perceptron_train_filter",
    "bm25_topk_docs",
    "hybrid_rrf_topk",
    "bm25_indexed_topk",
    "bm25_incremental_topk",
    "stream_bm25_topk",
    "bm25_pruned_topk",
    "bm25_delete_serve",
    "bm25_compacted_topk",
    "ivfpq_rerank_topk",
    "ivfpq_delete_serve",
    "phrase_kwic_snippets",
    "label_propagation_communities",
    "ivfpq_append_serve_topk",
    "ivfpq_compacted_topk",
    "stream_ivfpq_topk",
    "ivfpq_drift_report",
    "incremental_minhash_gate",
    "incremental_exact_gate",
    "contrastive_negatives_docs",
    "bpe_merge_rounds",
    "bpe_encode_stats",
    "pmi_topk_bigrams",
    "jl_project_embeddings",
    "pca_power_iteration",
    "token_diversity_by_source",
    "count_min_sketch_tokens",
    "exact_substring_dedup_docs",
    "bigram_lm_quality",
    "domain_cap_docs",
    "phrase_search_topgram",
    "source_target_l1_shift",
    "video_frame_sample_stats",
    "curation_funnel_docs",
    "bloom_filter_fp_rate",
    "gopher_rules_docs",
    "frame_timeline_sample",
    "bloom_prejoin_revenue",
    "ivf_trained_exact_topk",
    "ivf_append_serve_topk",
    "script_share_docs",
    "pq_adc_topk",
    "ivf_pq_topk",
    "knn_graph_topk",
    "embedding_dup_clusters",
    "kmv_distinct_users",
    "source_shingle_jaccard",
    "curation_funnel_semantic",
    "neardup_ensemble_pairs",
    "ivfpq_indexed_topk",
    "token_budget_mix",
    "source_quality_card",
    "source_card_overlap",
    "ivfpq_residual_topk",
    "ivfpq_residual_indexed_topk",
    "cluster_survivor_selection",
    "pmi_skipgram_window",
    # round-7 overtime additions
    "trigram_backoff_ppl",
    "record_linkage_customers",
    "wordpiece_encode_stats",
    "orc_roundtrip_agg",
    "audio_codec_survey",
    "ppl_bucket_split",
    "ann_recall_report",
    "langid_confusion_eval",
    "classifier_eval_holdout",
    "minhash_pr_eval",
    # round-8 additions
    "neardup_cluster_eval",
    "unigram_encode_stats",
    "kneser_ney_ppl",
    "winnowing_fingerprints",
    "winnowing_overlap_pairs",
    "rater_agreement_kappa",
    "snapshot_dv_delete_agg",
    "snapshot_bloom_lookup",
    "stream_dv_deletes",
    "blocklist_phrase_filter",
]


def formatted_plan(spark, df) -> str:
    qe = df._jdf.queryExecution()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return qe.explainString(mode)


# queries whose nested-loop join is the point: a deliberate cross join
# against a tiny broadcast side (generated grid dim; handful of ANN probes)
EXPECTED_NESTED_LOOP = {
    "grid_align_hours": "6-row generated minute grid, broadcast by design",
    "ann_cosine_topk": "brute-force baseline scans corpus × ~5 probe vectors",
    "mixture_resample_docs": "per-stratum stats × 1-row Σw broadcast (rows = #strata)",
    "triangle_count": "two single-row aggregates cross-joined for the output row",
    "inventory_value_share": "per-part values × 1-row grand-total broadcast (Q11 scalar)",
    "zorder_cluster_audit": "rows × 1-row min/max bounds broadcast (bucket scaling)",
    "abc_classification_parts": "per-part aggregate × 1-row grand-total broadcast",
    "relational_division_ranked": "per-customer aggregate × 1-row class-count broadcast",
    "benford_digit_audit": "9 digit counts × 1-row total broadcast",
    "gini_revenue_concentration": "rank×value sums × 1-row n/total broadcast",
    "pit_scd2_lookup": "SCD2 intervals × 1-row probe-time broadcast",
    "weighted_median_price": "per-flag aggregate feeds the window output",
    "contingency_expected_counts": "cell table × category-sized marginal totals broadcast",
    "inactive_high_balance_customers": "customers × 1-row avg-balance threshold broadcast (Q22 scalar)",
    "ivf_trained_exact_topk": "corpus probes × centroid-count-sized model broadcast (exact-Lloyd IVF)",
    "ivf_append_serve_topk": "corpus probes × centroid-count-sized model broadcast (plan-only uses the unindexed IVF shape)",
    "pq_adc_topk": "subvectors × codebook-sized model broadcast (PQ encode + ADC table)",
    "ivf_pq_topk": "subvectors/probes × model-sized broadcasts (IVF centroids + PQ codebooks)",
    "ivfpq_indexed_topk": "subvectors/probes × model-sized broadcasts (plan-only uses the unindexed IVF+PQ shape)",
    "ivfpq_residual_topk": "residual subvectors/probes × model-sized broadcasts (IVF centroids + residual PQ codebooks)",
    "ivfpq_residual_indexed_topk": "residual subvectors/probes × model-sized broadcasts (plan-only uses the unindexed residual shape)",
    "ivfpq_append_serve_topk": "residual subvectors/probes × model-sized broadcasts (plan-only uses the unindexed residual shape)",
    "ivfpq_compacted_topk": "residual subvectors/probes × model-sized broadcasts (plan-only uses the unindexed residual shape)",
    "stream_ivfpq_topk": "residual subvectors/probes × model-sized broadcasts (plan-only uses the unindexed residual shape)",
    "ivfpq_drift_report": "residual subvectors/probes × model-sized broadcasts (plan-only uses the unindexed residual shape)",
    "curation_funnel_semantic": "survivor embeddings × centroid-count-sized model broadcast (SemDeDup stage)",
    "source_shingle_jaccard": "source-pair grid join (src_a < src_b over a sources-count-sized side)",
    "source_card_overlap": "source-pair grid join (src_a < src_b over a sources-count-sized side)",
    "hybrid_rrf_topk": "brute-force cosine side scans corpus × 1 probe vector; 1-row S/D totals broadcast",
    "bm25_topk_docs": "per-doc scores × 1-row S/D corpus totals broadcast",
    "bm25_indexed_topk": "per-doc scores × 1-row S/D corpus totals broadcast (plan-only uses the unindexed scorer)",
    "bm25_incremental_topk": "per-doc scores × 1-row S/D corpus totals broadcast (plan-only uses the unindexed scorer)",
    "stream_bm25_topk": "per-doc scores × 1-row S/D corpus totals broadcast (plan-only uses the unindexed scorer)",
    "bm25_pruned_topk": "per-doc scores × 1-row S/D corpus totals broadcast (plan-only uses the unindexed scorer)",
    "bm25_delete_serve": "per-doc scores × 1-row S/D corpus totals broadcast (plan-only uses the unindexed scorer)",
    "bm25_compacted_topk": "per-doc scores × 1-row S/D corpus totals broadcast (plan-only uses the unindexed scorer)",
    "ivfpq_rerank_topk": "residual subvectors/probes × model-sized broadcasts (plan-only uses the unindexed residual shape for stage 1)",
    "ivfpq_delete_serve": "residual subvectors/probes × model-sized broadcasts (plan-only uses the unindexed residual shape)",
    "ivf_fixed_centroids_topk": "corpus × centroid-count-sized model broadcast (fixed-centroid IVF)",
    "theta_sketch_setops_users": "1-row sketch aggregates cross-combined for set algebra",
    # round 8: windows.py prefix offsets became a strict-< triangular
    # broadcast self-join over the |buckets|-row counts frame (replacing
    # the unpartitioned Window that tripped WindowExec warnings) — the
    # broadcast side is bucket-count-sized by construction
    "ppl_bucket_split": "bucket-count-sized triangular prefix-sum offsets broadcast (scalable_ntile)",
    "ntile_cume_dist_customers": "bucket-count-sized triangular prefix-sum offsets broadcast (scalable_ntile)",
    "equidepth_histogram_totalprice": "bucket-count-sized triangular prefix-sum offsets broadcast (scalable_ntile)",
    "pack_sequences_512": "bucket-count-sized triangular prefix-sum offsets broadcast (scalable_prefix_sum)",
    "neardup_cluster_eval": "1-row metric aggregates cross-combined for the output row",
    "kneser_ney_ppl": "eval transitions × 1-row distinct-bigram-type total broadcast",
    "ks_two_sample_values": "distinct-value CDF rows × 1-row (n1, n2) totals broadcast",
    "semantic_dedup_docs": "corpus × centroid-count-sized model broadcast (SemDeDup assignment)",
    "pagerank_exact_int": "ranks × 1-row node-count/dangling-mass broadcasts per unrolled iteration",
    "pmi_topk_bigrams": "bigram stats × 1-row N and M totals broadcasts",
    "pmi_skipgram_window": "window-pair stats × 1-row N and M totals broadcasts",
    "pca_power_iteration": "d²-sized covariance × 1-row max-|w| rescale broadcast per unrolled round",
    "bpe_merge_rounds": "vocab-sized symbol table × 1-row best-pair broadcast per round",
    "bpe_encode_stats": "same training chain: 1-row best-pair broadcast per round",
    "phrase_search_topgram": "per-doc matches × 1-row phrase-string broadcast",
    "source_target_l1_shift": "sources × fixed 64-slot grid and 1-row target-total broadcasts",
    "bloom_filter_fp_rate": "1-row summary × 1-row build-count broadcast",
    "bloom_prejoin_revenue": "probe rows × 1-row broadcast lane-map (lazy bloom prefilter)",
    "trigram_backoff_ppl": "unigram stats × 1-row train-token-total broadcast",
    "ann_recall_report": "brute-force ground-truth side scans corpus × ~5 probe vectors; residual model broadcasts (plan-only uses the unindexed shape)",
    "minhash_pr_eval": "three 1-row metric aggregates cross-combined for the output row",
}


def audit(plan: str, name: str) -> list[str]:
    flags = []
    if "CartesianProduct" in plan:
        flags.append("CartesianProduct present")
    if "BroadcastNestedLoopJoin" in plan:
        if name in EXPECTED_NESTED_LOOP:
            flags.append(
                f"BroadcastNestedLoopJoin — expected: {EXPECTED_NESTED_LOOP[name]}"
            )
        else:
            flags.append("BroadcastNestedLoopJoin present (non-equi join path)")
    for m in re.finditer(r"PushedFilters: \[\]", plan):
        # un-pushed filters are only a smell when the scan's table is
        # actually filtered; report count and let the reader judge
        flags.append("a scan has no pushed filters")
        break
    return flags


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    out = [
        "# PLANS — physical plans of the headline queries",
        "",
        f"Generated by `python tools/plan_audit.py {sf_dir}`. Spark "
        f"{spark.version}, AQE on. Read these top-down: scans should show "
        "`PushedFilters` + narrow `ReadSchema`; joins on dims should be "
        "`BroadcastHashJoin`; aggregates should be partial→final "
        "`HashAggregate` pairs.",
        "",
    ]
    any_flags = False
    from etl_weather_jabar_spark.planmode import plan_only

    for name in AUDIT_QUERIES:
        # plan-only: iterative builders emit one representative round and
        # skip checkpoints/convergence probes — the audit reads plans, it
        # must not execute queries
        with plan_only():
            df = QUERIES[name](spark, sf_dir)
        plan = formatted_plan(spark, df)
        flags = audit(plan, name)
        any_flags = any_flags or bool(flags)
        out.append(f"## {name}")
        if flags:
            out.append("")
            out.extend(f"> ⚠ {f}" for f in flags)
        out.append("")
        out.append("```")
        # keep the operator tree + scan details, drop the long codegen ids
        out.append(plan.strip())
        out.append("```")
        out.append("")
    path = os.path.join(REPO, "PLANS.md")
    with open(path, "w") as f:
        f.write("\n".join(out))
    print(f"wrote {path}  ({'flags raised' if any_flags else 'no flags'})")


if __name__ == "__main__":
    main()
