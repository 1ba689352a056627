"""Repo-wide physical-plan lint: every registry query's executed plan,
checked for the antipatterns that kill 100 TB runs.

Rules (allowlists document the reviewed exceptions):
- no CartesianProduct anywhere;
- BroadcastNestedLoopJoin only for 1-row scalar / tiny-literal
  broadcasts (the scalar-subquery pattern) — queries where the pattern
  is structural are allowlisted by name after review;
- no row-at-a-time Python (BatchEvalPython); Arrow paths
  (ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas) only in the
  allowlisted Pandas-operator queries;
- no SinglePartition window outside the documented post-aggregate
  global-series queries.

tests/test_plan_lint.py runs this over the FULL registry — adding a
query with a bad plan fails CI, not the next 100 TB run.

Usage: PYTHONPATH=. python tools/plan_lint.py [--sf /root/testdata/sf0.001]
"""

from __future__ import annotations

import argparse
import sys

#: Arrow/pandas execution is the documented design for these (grouped
#: EWMA fold; multimodal decode plumbing).
PANDAS_OK = {
    "ewma_daily_value",
    "multimodal_feature_extract",
    # real WAV encode+decode round trip — the codec call is the
    # documented Python step (stdlib struct), everything else JVM-side
    "multimodal_wav_rms",
    # real PNG encode+decode (stdlib zlib + numpy unfilter) — same
    # reviewed codec-in-Arrow-batch shape as the WAV pair
    "multimodal_png_stats",
    "multimodal_png_resize",
    # real BMP encode+decode (stdlib struct) — same reviewed
    # codec-in-Arrow-batch shape as the PNG/WAV entries
    "multimodal_bmp_stats",
    # real binary-netpbm (P5/P6) encode+decode — same reviewed
    # codec-in-Arrow-batch shape
    "multimodal_ppm_stats",
    # real baseline-JPEG (SOF0) encode+decode — same reviewed
    # codec-in-Arrow-batch shape; lossy, so the query asserts error
    # bounds instead of byte-exact stats
    "multimodal_jpeg_stats",
    # real lossless-WebP VP8L encode+decode (pure-Python RFC 9649
    # bitstream) — reviewed: same codec-in-Arrow-batch shape as the
    # PNG/JPEG/BMP entries; lossless, so the query hash-matches a
    # SQL oracle that recomputes every pixel
    "multimodal_webp_stats",
    # broadcast-GEMM exact-pair / exact-NN kernels
    # (similarity.gemm_threshold_pairs / gemm_nearest_neighbor):
    # reviewed numeric kernel in an Arrow batch — chunked float64
    # B @ M^T against the broadcast unit matrix; replaces the
    # >300s-at-20k-vectors BroadcastNestedLoopJoin pair stage
    "embedding_neardup_pairs",
    "mutual_nearest_embeddings",
    "dup_clusters",
    "near_dedup_survivors",
    "dup_cluster_size_distribution",
    # broadcast-GEMM NN with a disjoint probe side (r08): corpus is
    # the broadcast matrix, the eval sample the distributed side —
    # replaces an interpreted |Q|x|C| broadcast-NLJ cosine scan
    "eval_embedding_leakage",
    # grouped per-cell GEMM NN (similarity.grouped_gemm_nearest_neighbor):
    # applyInPandas keyed on the IVF cell — distributed, no broadcast
    "mutual_nearest_ivf",
    "mutual_nn_ivf_recall",
    # grouped per-cell GEMM drop scan (similarity.grouped_gemm_dropped_ids):
    # same applyInPandas-on-cid shape; replaces the interpreted
    # within-cell self-join that tripped the 600s budget at x100
    "semdedup_survivors",
    "semdedup_two_level_survivors",
    "embedding_curation_pipeline",
    # same grouped-GEMM drop kernel, min-id rule over (old ∪ new) with
    # old rows keyed below every new row — replaces the interpreted
    # two-join verdict scan that blew the r10 ×100 budget once the
    # value-hash invariant stopped count() from pruning it
    "incremental_embedding_dedup",
}

#: BroadcastNestedLoopJoin accepted: 1-row scalar broadcasts
#: (cross-join of a grand aggregate) or reviewed tiny-side patterns.
BNLJ_OK = {
    "scalar_subquery_ratio",
    "above_avg_orders",
    "global_stats",
    "tfidf_top_terms",
    "bm25_doc_retrieval",
    "token_entropy_quality",
    "zipf_term_slope",
    "unigram_logprob_quality",
    "bigram_lm_perplexity",
    "corpus_duplicate_ngrams",
    "vocab_growth_by_source",
    "decontaminate_eval_overlap",
    "hll_union_event_types",
    "bigram_pmi_collocations",  # vocabulary scalar totals broadcast
    "recent_days",  # 1-row max-date scalar broadcast

    "hll_user_overlap_estimate",
    "hll_user_overlap_audit",
    "minhash_estimate_accuracy",
    "kmeans_refined_centroids",
    "sim_bruteforce_topk",
    "hard_negative_mining",
    "embedding_dimension_whitening",
    "embedding_cluster_separation",
    "quantize_embeddings_int8",
    "random_projection_embeddings",
    "cluster_balanced_sample",
    "sim_ivf_topk",
    "ivf_multiprobe_recall",
    "lsh_banding_recall",
    "sim_lsh_ann_topk",
    "semantic_doc_retrieval",
    "recsys_negative_samples",
    "source_mixture_weights",
    "epoch_upsample_documents",
    "weighted_sample_documents",
    "source_calibrated_quality",
    "price_distribution_psi",
    "customers_active_every_quarter",
    "cusum_changepoint_days",
    "join_key_skew_report",
    "join_key_skew_profile",
    "seasonal_decomposition_daily",
    "ab_test_conversion_lift",
    "discount_revenue_forecast",
    "dormant_premium_customers",
    "supplier_value_concentration",
    "national_market_share",
    "promo_revenue_ratio",
    "cumulative_distinct_users",
    "trending_event_types",
    "kmv_distinct_users",
    "bpe_merge_induction",
    "bpe_apply_merges",
    "pq_adc_topk",
    "multi_regression_price",
    "nation_trade_pagerank",
    "timed_conversion_rate",
    "truncation_audit",
    "pack_training_sequences",
    "equidepth_deciles",
    "winsorize_values",
    "approx_percentile_check",
    "histogram_totalprice",
    "distribution_moments",
    "measure_correlation_matrix",
    "price_quantity_regression",
    "price_percentile_ranks",
    "global_stats",
    "null_profile_enriched",
    "training_corpus",
    "leakage_safe_split",
    "acf_multi_lag",
    "curriculum_order_documents",  # 1-row quantile-cutoff scalar + 4-row tier-offset self-join
    "embedding_outlier_docs",  # broadcast k-centroid quantizer + 1-row p95 scalar
    "hybrid_retrieval_rrf",  # |Q|-row query-vector broadcast (brute_force_topk dense side)
    "ks_price_drift",  # 1-row period-totals scalar broadcast
    "benford_first_digit",  # 1-row digit-total scalar broadcast
    "chi2_event_type_weekday",  # 1-row grand-total/dims scalar broadcast
    "kaplan_meier_retention",  # 1-row observation-end scalar broadcast
    "source_unigram_jsd",  # 1-row corpus-token-total scalar broadcast
    "nation_trade_assortativity",  # 1-row mean-edge-weight scalar broadcast
    "trade_community_modularity",  # 1-row total-edge-mass scalar broadcast
    "revenue_theil_decomposition",  # 1-row grand-total scalar broadcast
    "lang_id_agreement_kappa",  # three 1-row confusion-scalar broadcasts
    "dsir_importance_weights",  # 1-row bucket-totals + 1-row p80-threshold scalar broadcasts
    "nation_trade_kcore",  # 1-row mean-edge-weight scalar broadcast (backbone threshold)
    "bpe_fertility_by_lang",  # two 1-row merge-rule broadcasts (the bpe_apply_merges shape)
    "fellegi_sunter_part_linkage",  # 1-row u-probability scalar broadcast
    "doremi_domain_weights",  # 1-row corpus-token-total scalar broadcast
    "quantile_normalize_scores",  # bounded value-domain ECDF broadcast (inequality rank->value lookup)
    "eval_embedding_leakage",  # tiny eval-query side broadcast (brute_force_topk dense side)
    "association_rules_parts",  # 1-row basket-count scalar broadcast
    "nation_link_prediction",  # 1-row mean-edge-weight scalar broadcast (backbone threshold)
    "nation_trade_anf",  # 1-row mean-edge-weight + node-count scalar broadcasts
    "quality_gate_threshold_sweep",  # 1-row corpus-totals scalar broadcast
    "join_size_estimate",  # 1-row exact/sampled estimate scalar broadcast
    "selectivity_estimate_audit",  # 1-row min/max/count stats scalar broadcast
    "selectivity_equidepth_compare",  # 1-row stats + vigintile-boundary scalar broadcasts
    "runs_test_randomness",  # 1-row median scalar broadcast
    "capture_recapture_estimate",  # three 1-row sample/overlap/truth scalar broadcasts
    "ann_label_mrr",  # 20-query dense-side broadcast (sim_bruteforce_topk shape) + 1-row metric agg
    "lorenz_curve_deciles",  # 1-row revenue-total scalar broadcast
    "mutual_nearest_ivf",  # 8-row centroid broadcast (the sim_ivf_topk quantizer shape)
    "mutual_nn_ivf_recall",  # centroid broadcast + three 1-row pair-count scalar crosses
}

#: Documented post-aggregate global series (days-sized input) where an
#: unpartitioned window is the stated design.
SINGLE_PARTITION_OK = {
    "daily_rollup_7day",
    "gap_fill_daily",
    "interpolate_daily",
    "locf_fill_daily",
    "sliding_window_rollup",
    "cumulative_distinct_users",
    "discount_revenue_forecast",
    "autocorr_lag1_users",  # global rank over per-user rollup output
    "seasonal_decomposition_daily",
    "cusum_changepoint_days",
    "open_orders_timeline",
    "acf_multi_lag",
    "dow_seasonality_profile",
    "equidepth_deciles",
    "zipf_term_slope",
    "rfm_customer_segments",  # ntile over entity-sized rollup
    "rank_distribution",
    "price_percentile_ranks",
    "supplier_value_concentration",
    "top_revenue_supplier",
    "cohort_retention",
    "cohort_retention_matrix",
    "vocab_growth_by_source",
    "source_mixture_weights",
    "bpe_merge_induction",
    "bpe_apply_merges",
    "approx_top_event_types",
    "trending_event_types",
    "kmv_distinct_users",
    "minhash_estimate_accuracy",
    "lsh_banding_recall",
    "word_count_topk",
    "tfidf_top_terms",
    "bigram_pmi_collocations",
    "heavy_hitters_cms",
    "user_value_ohlc_daily",
    "join_key_skew_report",
    "join_key_skew_profile",
    "ab_test_conversion_lift",
    "weighted_median_unit_price",
    "first_touch_attribution",
    "bm25_doc_retrieval",  # df window over the term-count-sized tf rollup
    "customer_revenue_gini",  # ordered cumulative over the entity rollup
    "ks_price_drift",  # ECDF cumulative over the <=1000-bucket rollup
    "kaplan_meier_retention",  # life-table windows over the duration-period rollup
    "mann_whitney_price_drift",  # midrank window over the <=1000-bucket rollup
    "source_unigram_jsd",  # SinglePartition is the 1-row corpus-total agg; both windows are keyed (source/term)
    "rolling_7day_distinct_users",  # day-rank + sketch-union windows over the days-sized rollup
    "nation_trade_pagerank",  # final rank over the 25-node graph
    "recsys_negative_samples",  # item-index window over the part DIMENSION
    "revenue_contribution",  # percent-of-total over the entity rollup
    "small_order_revenue",  # per-part avg window over the part-sized rollup
    "curriculum_order_documents",  # SinglePartition is the 1-row quantile-cutoff agg; the only window is keyed on tier
    "temperature_mix_sources",  # quota window over the per-source rollup (#sources rows); the doc rank window is keyed on source
    "skyline_parts",  # running dominance max over the price-grain rollup (bounded by the price domain)
    "quality_classifier_calibration",  # N-total sum over the 10-row confidence-bin rollup
    "doremi_domain_weights",  # min/sum windows over the #sources-row rollup
    "quantile_normalize_scores",  # cumulative window over the bounded value-grain ECDF rollup
    "compaction_plan",  # cumulative-offset window over the days-sized file-stats rollup
    "runs_test_randomness",  # lag window over the days-sized daily rollup
    "lorenz_curve_deciles",  # ntile over the entity rollup + cumulative over 10 decile rows
    "ann_label_mrr",  # rank window over the 20-query broadcast side (sim_bruteforce_topk shape)
}

#: Streaming queries execute sinks on build — lint the batch surface.
SKIP = {
    "streaming_daily_rollup_live",
    "streaming_session_rollup_live",
    "streaming_dedup_live",
    "streaming_join_live",
    "streaming_corpus_gate_live",
    "streaming_enrich_join_live",
}


def lint(spark, sf_dir: str, names=None) -> dict[str, list[str]]:
    from covid19_etl_pipeline_spark.plans.queries import REGISTRY

    problems: dict[str, list[str]] = {}
    for name, spec in REGISTRY.items():
        if name in SKIP or (names and name not in names):
            continue
        plan = spec.fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        issues = []
        if "CartesianProduct" in plan:
            issues.append("CartesianProduct")
        if "BatchEvalPython" in plan:
            issues.append("BatchEvalPython (row-at-a-time Python)")
        if (
            ("ArrowEvalPython" in plan or "MapInPandas" in plan
             or "FlatMapGroupsInPandas" in plan)
            and name not in PANDAS_OK
        ):
            issues.append("unreviewed Pandas/Arrow exec node")
        if "BroadcastNestedLoopJoin" in plan and name not in BNLJ_OK:
            issues.append("unreviewed BroadcastNestedLoopJoin")
        if (
            "Window" in plan
            and "SinglePartition" in plan
            and name not in SINGLE_PARTITION_OK
        ):
            issues.append("unreviewed SinglePartition window")
        if issues:
            problems[name] = issues
    return problems


def main(argv=None) -> int:
    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    p = argparse.ArgumentParser()
    p.add_argument("--sf", default="/root/testdata/sf0.001")
    args = p.parse_args(argv)

    from covid19_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name="plan-lint")
    problems = lint(spark, args.sf)
    from covid19_etl_pipeline_spark.plans.queries import REGISTRY

    n_checked = len(REGISTRY) - len(SKIP)
    if problems:
        for name, issues in sorted(problems.items()):
            print(f"{name}: {', '.join(issues)}")
        print(f"\n{len(problems)}/{n_checked} queries flagged")
    else:
        print(f"all {n_checked} query plans clean")
    spark.stop()
    return 1 if problems else 0


if __name__ == "__main__":
    raise SystemExit(main())
