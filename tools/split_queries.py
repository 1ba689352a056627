"""One-shot refactoring tool: split plans/queries.py (18.4k LoC, 297
queries) into family modules (VERDICT r4 ask #1).

Mechanics (AST-driven, no regex surgery on function bodies):

1. Parse the monolith; segment it into top-level statements, each segment
   carrying its preceding comment lines (``#:`` annotations survive; the
   old ``# ---`` section-divider triples are dropped — family docstrings
   replace them).
2. Assign every ``@_register``-decorated query to a family via the
   explicit FAMILY map below (the tool errors on any unmapped or unknown
   name, so the map can never silently drift from the registry).
3. Place each helper (plain def / module constant) in the single family
   that uses it, or in ``_shared.py`` when >= 2 families (computed to a
   fixpoint so helper->helper references stay importable).
4. Emit one module per family with only the imports its code actually
   references, plus ``_registry.py`` (QuerySpec/REGISTRY/_register),
   ``_shared.py``, ``_order.py`` (the pinned canonical registration
   order), and a thin aggregator ``queries.py`` that imports every family
   and re-sorts REGISTRY into canonical order so downstream consumers
   (driver sampling, bench) observe the exact same iteration order as the
   monolith.

Run once from the repo root: ``python tools/split_queries.py``.
"""

from __future__ import annotations

import ast
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
PLANS = ROOT / "covid19_etl_pipeline_spark" / "plans"
SRC = PLANS / "queries.py"
PKG = "covid19_etl_pipeline_spark.plans"

# ---------------------------------------------------------------------------
# Family assignment: every registered query name, exactly once.
# ---------------------------------------------------------------------------

FAMILIES: dict[str, list[str]] = {
    # Core SURVEY §2 parity + relational breadth (projections, filters,
    # sorts, joins, windows, set ops, aggregate surface, SCD/CDC).
    "relational": [
        "rollup_entity", "daily_rollup_7day", "date_parts", "guarded_ratio",
        "inlist_filter", "notnull_threshold", "topk_orders", "recent_days",
        "top_orders_per_priority", "dim_join_rollup", "fact_join_agg",
        "semi_join_customers", "anti_join_customers", "user_daily_7day_avg",
        "user_daily_delta", "incremental_upsert", "distinct_agg",
        "global_stats", "percentile_agg", "rollup_grouping_sets",
        "pivot_linestatus", "json_extract_props", "above_avg_orders",
        "cube_agg", "intersect_customers", "string_funcs", "date_arithmetic",
        "except_customers", "rank_distribution", "running_total_user",
        "user_range_7day_avg", "histogram_totalprice", "minmax_by_priority",
        "approx_distinct_users", "events_before_purchase",
        "scalar_subquery_ratio", "collect_orders_list", "stats_by_returnflag",
        "sql_surface_revenue", "null_profile_enriched", "tumbling_6h_rollup",
        "gap_fill_daily", "equidepth_deciles", "approx_percentile_check",
        "unpivot_measures", "humanized_revenue", "salted_brand_revenue",
        "skewed_key_rollup_plain", "skewed_key_rollup_salted",
        "grouping_sets_matrix", "bloom_pruned_revenue", "close_order_pairs",
        "period_revenue_reconciliation", "variant_props_stats",
        "paged_orders", "bag_setops_orders", "modal_priority_by_nation",
        "sessionize", "asof_join_orders", "price_extremes_window",
        "price_percentile_ranks", "scd2_customer_tiers",
        "cdc_latest_user_state", "scd2_point_in_time_lookup",
    ],
    # TPC-H decision-support shapes (Q2..Q22) + derived star analytics.
    "tpch": [
        "top_unshipped_orders", "regional_revenue", "supplier_nation_profit",
        "order_count_distribution", "sole_returner_suppliers",
        "small_order_revenue", "nation_pair_trade_volume",
        "cheapest_supplier_per_part", "late_shipment_priority_count",
        "returned_item_top_customers", "priority_class_line_counts",
        "promo_revenue_ratio", "large_volume_customers",
        "disjunctive_brand_revenue", "supplier_value_concentration",
        "dormant_premium_customers", "discount_revenue_forecast",
        "national_market_share", "top_revenue_supplier",
        "supplier_part_variety", "promo_heavy_suppliers",
        "customers_active_every_quarter", "revenue_contribution",
    ],
    # Document dedup (exact / MinHash-LSH / SimHash / Jaccard / CDC) and
    # record linkage / entity resolution.
    "dedup": [
        "exact_dedup", "minhash_signatures", "lsh_candidate_pairs",
        "ngram_jaccard_pairs", "simhash_signatures", "doc_fingerprint",
        "winnowing_fingerprints", "dup_clusters", "near_dedup_survivors",
        "decontaminate_eval_overlap", "dup_cluster_size_distribution",
        "lsh_banding_recall", "simhash_near_pairs", "corpus_duplicate_ngrams",
        "prefix_jaccard_pairs", "minhash_estimate_accuracy",
        "containment_doc_pairs", "doc_novelty_fraction",
        "incremental_corpus_dedup", "source_overlap_matrix",
        "cdc_chunk_documents", "chunk_dedup_ratio", "source_shingle_overlap",
        "maximal_repeated_substrings", "cross_source_dup_flow",
        "neardup_threshold_sweep", "fuzzy_name_matches",
        "fuzzy_part_duplicates", "fellegi_sunter_part_linkage",
        "golden_record_parts",
    ],
    # Text analysis: quality scoring, lang-id, tokenization, BPE, lexical
    # statistics, PII scrubbing.
    "text": [
        "text_quality", "lang_id", "word_count_topk", "text_normalize_redact",
        "chunk_documents", "repetition_quality", "tfidf_top_terms",
        "token_entropy_quality", "bigram_pmi_collocations",
        "vocab_growth_by_source", "zipf_term_slope",
        "unigram_logprob_quality", "bpe_merge_induction", "bpe_apply_merges",
        "feature_hashing_vectors", "bigram_lm_perplexity",
        "readability_scores", "redact_pii_documents",
        "linear_quality_classifier", "bpe_fertility_by_lang",
        "bm25_doc_retrieval",
        "lang_id_agreement_kappa", "lang_id_class_prf", "source_unigram_jsd",
        "source_diversity_by_lang", "quality_classifier_calibration",
        "quality_gate_threshold_sweep",
    ],
    # Embedding / vector: ANN (LSH, IVF, PQ), semantic dedup, retrieval,
    # clustering, PCA, quantization.
    "embedding": [
        "sim_bruteforce_topk", "sim_lsh_ann_topk", "embedding_neardup_pairs",
        "sim_ivf_topk", "embedding_component_stats",
        "kmeans_refined_centroids", "semantic_doc_retrieval",
        "random_projection_embeddings", "cluster_balanced_sample",
        "ivf_multiprobe_recall", "hard_negative_mining",
        "quantize_embeddings_int8", "embedding_dimension_whitening",
        "semdedup_survivors", "embedding_outlier_docs",
        "embedding_curation_pipeline", "incremental_embedding_dedup",
        "hybrid_retrieval_rrf", "mutual_nearest_embeddings",
        "embedding_pca_top_component", "eval_embedding_leakage",
        "pq_adc_topk", "embedding_cluster_separation", "ann_label_mrr",
    ],
    # Training-corpus assembly: splits, sampling, mixing weights,
    # curriculum, packing, datacards.
    "corpus": [
        "hash_split_documents", "source_mixture_weights",
        "stratified_sample_documents", "sample_k_per_group",
        "training_corpus", "pack_training_sequences", "temporal_split_events",
        "next_event_training_pairs", "weighted_sample_documents",
        "epoch_upsample_documents", "recsys_negative_samples",
        "leakage_safe_split", "truncation_audit",
        "curriculum_order_documents", "length_bucketed_batches",
        "corpus_datacard", "temperature_mix_sources",
        "dsir_importance_weights", "doremi_domain_weights",
        "quantile_normalize_scores", "source_calibrated_quality",
        "loo_target_encoding",
    ],
    # Event-stream / time-series analytics: funnels, cohorts, resampling,
    # smoothing, attribution, survival.
    "timeseries": [
        "anomaly_mad_events", "funnel_conversion", "cohort_retention",
        "interpolate_daily", "sliding_window_rollup", "locf_fill_daily",
        "winsorize_values", "ewma_daily_value", "rolling_median_value",
        "autocorr_lag1_users", "acf_multi_lag", "cusum_changepoint_days",
        "seasonal_decomposition_daily", "holt_forecast_users",
        "user_value_ohlc_daily", "twap_user_value", "trending_event_types",
        "dow_seasonality_profile", "rolling_corr_activity_value",
        "longest_daily_streak", "timed_conversion_rate",
        "windowed_funnel_conversion", "cohort_retention_matrix",
        "first_touch_attribution", "linear_attribution_revenue",
        "time_decay_attribution", "event_path_funnel_users",
        "event_transition_entropy", "user_event_burstiness",
        "frequent_event_sequences", "throttled_events",
        "open_orders_timeline", "rfm_customer_segments",
        "user_activity_trend", "kaplan_meier_retention",
    ],
    # Statistics & sketches: hypothesis tests, drift, inequality measures,
    # regression, HLL/CMS/KMV/bitmap distinct machinery.
    "stats": [
        "price_quantity_regression", "heavy_hitters_cms",
        "approx_top_event_types", "hll_union_event_types",
        "hll_user_overlap_estimate", "hll_user_overlap_audit",
        "kmv_distinct_users", "bitmap_exact_distinct_users",
        "rolling_7day_distinct_users", "cumulative_distinct_users",
        "price_distribution_psi", "ks_price_drift", "benford_first_digit",
        "chi2_event_type_weekday", "mann_whitney_price_drift",
        "distribution_moments", "measure_correlation_matrix",
        "multi_regression_price", "bootstrap_mean_ci",
        "customer_revenue_gini", "revenue_theil_decomposition",
        "lorenz_curve_deciles", "weighted_median_unit_price",
        "k_anonymity_audit", "ab_test_conversion_lift",
        "capture_recapture_estimate", "event_count_overdispersion",
        "runs_test_randomness", "lead_time_percentiles",
    ],
    # Market-basket / pattern mining.
    "mining": [
        "frequent_part_pairs", "frequent_part_pairs_pcy",
        "association_rules_parts", "brand_affinity_lift", "skyline_parts",
    ],
    # Distributed graph algorithms over the trade graph.
    "graph": [
        "nation_trade_pagerank", "nation_trade_triangles",
        "bfs_shortest_hops", "cheapest_trade_route",
        "nation_trade_communities", "nation_trade_assortativity",
        "nation_trade_kcore", "trade_community_modularity",
        "nation_link_prediction", "nation_trade_anf",
        "trade_edge_truss_support",
    ],
    # Multimodal (binary asset) plumbing + real stdlib codecs.
    "multimodal": [
        "multimodal_asset_stats", "multimodal_feature_extract",
        "multimodal_wav_rms", "multimodal_png_stats",
        "multimodal_png_resize", "multimodal_bmp_stats",
        "multimodal_frame_sample", "multimodal_resize_dims",
        "multimodal_audio_segments",
    ],
    # Live Structured Streaming executions.
    "streaming": [
        "streaming_daily_rollup_live", "streaming_session_rollup_live",
        "streaming_dedup_live", "streaming_join_live",
        "streaming_corpus_gate_live", "streaming_enrich_join_live",
    ],
    # Lakehouse operations: integrity audits, quality gates, layout,
    # optimizer statistics, incremental view maintenance.
    "lakehouse": [
        "referential_integrity_audit", "join_key_skew_profile",
        "join_key_skew_report", "data_quality_report",
        "orders_month_digests", "star_schema_fk_audit", "compaction_plan",
        "zorder_layout_parts", "incremental_rollup_maintenance",
        "join_size_estimate", "selectivity_estimate_audit",
        "selectivity_equidepth_compare",
    ],
}

DOCSTRINGS = {
    "relational": "Core relational parity surface (SURVEY §2): scans, "
    "projections,\nfilters, sorts, joins, windows, set ops, aggregates, "
    "SCD/CDC shapes.",
    "tpch": "TPC-H decision-support query shapes (Q2–Q22) and derived "
    "star-schema\nanalytics.",
    "dedup": "Document deduplication (exact / MinHash-LSH / SimHash / "
    "Jaccard /\nwinnowing / CDC) and record-linkage / entity-resolution "
    "queries.",
    "text": "Text analysis: quality scoring, language ID, tokenization and "
    "BPE,\nlexical statistics, PII scrubbing.",
    "embedding": "Embedding-column queries: ANN (LSH / IVF / PQ), semantic "
    "dedup,\nretrieval, clustering, PCA, quantization.",
    "corpus": "Training-corpus assembly: splits, sampling, mixture weights, "
    "curriculum,\nsequence packing, datacards.",
    "timeseries": "Event-stream / time-series analytics: funnels, cohorts, "
    "resampling,\nsmoothing, attribution, survival analysis.",
    "stats": "Statistical tests, drift metrics, inequality measures, "
    "regression, and\nmergeable-sketch (HLL / CMS / KMV / bitmap) queries.",
    "mining": "Market-basket and pattern mining (a-priori, PCY, association "
    "rules,\nskyline).",
    "graph": "Distributed graph algorithms over the nation trade graph "
    "(PageRank,\ntriangles, communities, k-core, trusses, ANF).",
    "multimodal": "Multimodal binary-asset plumbing and the real stdlib "
    "codecs (WAV PCM16,\nPNG, BMP).",
    "streaming": "Live Structured Streaming executions (rows-only entries; "
    "correctness is\ncarried by the stream==batch equality tests).",
    "lakehouse": "Lakehouse operations: integrity audits, quality gates, "
    "data layout,\noptimizer statistics, incremental view maintenance.",
}

# Names provided by the monolith's import block, keyed to the exact import
# statement that provides them.
IMPORT_PROVIDERS = {
    "annotations": "from __future__ import annotations",
    "Callable": "from collections.abc import Callable",
    "dataclass": "from dataclasses import dataclass",
    "reduce": "from functools import reduce",
    "DataFrame": "from pyspark.sql import DataFrame, SparkSession, Window",
    "SparkSession": "from pyspark.sql import DataFrame, SparkSession, Window",
    "Window": "from pyspark.sql import DataFrame, SparkSession, Window",
    "F": "from pyspark.sql import functions as F",
    "TABLES": "from covid19_etl_pipeline_spark.catalog import TABLES, load_table",
    "load_table": "from covid19_etl_pipeline_spark.catalog import TABLES, load_table",
    "dedup": "from covid19_etl_pipeline_spark.operators import dedup",
    "graph": "from covid19_etl_pipeline_spark.operators import graph",
    "similarity": "from covid19_etl_pipeline_spark.operators import similarity",
    "text": "from covid19_etl_pipeline_spark.operators import text",
    "anti_join_membership": "from covid19_etl_pipeline_spark.operators.joins import anti_join_membership",
    "broadcast_dim_join": "from covid19_etl_pipeline_spark.operators.joins import broadcast_dim_join",
    "equi_join": "from covid19_etl_pipeline_spark.operators.joins import equi_join",
    "semi_join_membership": "from covid19_etl_pipeline_spark.operators.joins import semi_join_membership",
    "salted_equi_join": "from covid19_etl_pipeline_spark.operators.partitioning import salted_equi_join",
    "spread": "from covid19_etl_pipeline_spark.operators.partitioning import spread",
    "guarded_ratio_expr": "from covid19_etl_pipeline_spark.operators.projection import guarded_ratio",
    "guarded_ratio": "from covid19_etl_pipeline_spark.operators.projection import guarded_ratio",
    "upsert_on_key": "from covid19_etl_pipeline_spark.operators.setops import upsert_on_key",
    "moving_average": "from covid19_etl_pipeline_spark.operators.windows import moving_average",
    "top_n_per_group": "from covid19_etl_pipeline_spark.operators.windows import top_n_per_group",
}

IMPORT_ORDER = [
    "from __future__ import annotations",
    "from collections.abc import Callable",
    "from dataclasses import dataclass",
    "from functools import reduce",
    "from pyspark.sql import DataFrame, SparkSession, Window",
    "from pyspark.sql import functions as F",
    "from covid19_etl_pipeline_spark.catalog import TABLES, load_table",
    "from covid19_etl_pipeline_spark.operators import dedup",
    "from covid19_etl_pipeline_spark.operators import graph",
    "from covid19_etl_pipeline_spark.operators import similarity",
    "from covid19_etl_pipeline_spark.operators import text",
    "from covid19_etl_pipeline_spark.operators.joins import anti_join_membership",
    "from covid19_etl_pipeline_spark.operators.joins import broadcast_dim_join",
    "from covid19_etl_pipeline_spark.operators.joins import equi_join",
    "from covid19_etl_pipeline_spark.operators.joins import semi_join_membership",
    "from covid19_etl_pipeline_spark.operators.partitioning import salted_equi_join",
    "from covid19_etl_pipeline_spark.operators.partitioning import spread",
    "from covid19_etl_pipeline_spark.operators.projection import guarded_ratio",
    "from covid19_etl_pipeline_spark.operators.setops import upsert_on_key",
    "from covid19_etl_pipeline_spark.operators.windows import moving_average",
    "from covid19_etl_pipeline_spark.operators.windows import top_n_per_group",
]


def main() -> None:
    if (PLANS / "_registry.py").exists() and "--force" not in sys.argv:
        sys.exit(
            "the split already ran (plans/_registry.py exists); re-running "
            "would clobber post-split hand edits (cross-family imports, "
            "_order.py additions). Pass --force only if you know why."
        )
    src_text = SRC.read_text()
    lines = src_text.splitlines(keepends=True)
    tree = ast.parse(src_text)

    name_to_family: dict[str, str] = {}
    for fam, names in FAMILIES.items():
        for n in names:
            assert n not in name_to_family, f"{n} mapped twice"
            name_to_family[n] = fam

    # --- segment the file ---------------------------------------------------
    segments = []  # (kind, key, stmt, text)
    prev_end = 0
    canonical_order: list[str] = []
    for stmt in tree.body:
        start, end = prev_end, stmt.end_lineno  # leading comments included
        raw = "".join(lines[start:end])
        prev_end = end
        if isinstance(stmt, ast.Expr) and isinstance(stmt.value, ast.Constant):
            segments.append(("docstring", None, stmt, raw))
            continue
        if isinstance(stmt, (ast.Import, ast.ImportFrom)):
            segments.append(("import", None, stmt, raw))
            continue
        if isinstance(stmt, ast.ClassDef) and stmt.name == "QuerySpec":
            segments.append(("infra", "QuerySpec", stmt, raw))
            continue
        if isinstance(stmt, (ast.Assign, ast.AnnAssign)):
            tgt = stmt.targets[0] if isinstance(stmt, ast.Assign) else stmt.target
            nm = tgt.id if isinstance(tgt, ast.Name) else None
            if nm == "REGISTRY":
                segments.append(("infra", "REGISTRY", stmt, raw))
            else:
                segments.append(("helper", nm, stmt, raw))
            continue
        if isinstance(stmt, ast.FunctionDef):
            reg = [
                d for d in stmt.decorator_list
                if isinstance(d, ast.Call)
                and getattr(d.func, "id", "") == "_register"
            ]
            if reg:
                qname = reg[0].args[0].value
                if qname not in name_to_family:
                    sys.exit(f"UNMAPPED query: {qname}")
                canonical_order.append(qname)
                segments.append(("query", qname, stmt, raw))
            elif stmt.name == "_register":
                segments.append(("infra", "_register", stmt, raw))
            else:
                segments.append(("helper", stmt.name, stmt, raw))
            continue
        sys.exit(f"unhandled stmt {type(stmt)} at line {stmt.lineno}")

    mapped = set(name_to_family)
    seen = set(canonical_order)
    if mapped - seen:
        sys.exit(f"mapped but not in file: {sorted(mapped - seen)}")

    # --- name usage ----------------------------------------------------------
    def used_names(node: ast.AST) -> set[str]:
        out = set()
        for n in ast.walk(node):
            if isinstance(n, ast.Name):
                out.add(n.id)
        return out

    helper_names = {k for kind, k, _, _ in segments if kind == "helper"}

    # family -> directly used top-level names
    fam_uses: dict[str, set[str]] = {f: set() for f in FAMILIES}
    for kind, key, stmt, _ in segments:
        if kind == "query":
            fam_uses[name_to_family[key]] |= used_names(stmt)

    helper_uses: dict[str, set[str]] = {}
    for kind, key, stmt, _ in segments:
        if kind == "helper":
            helper_uses[key] = used_names(stmt) & (
                helper_names | set(IMPORT_PROVIDERS)
            )

    # helper -> set of families needing it (transitively)
    helper_fams: dict[str, set[str]] = {h: set() for h in helper_names}
    for fam, uses in fam_uses.items():
        frontier = list(uses & helper_names)
        seen_h = set()
        while frontier:
            h = frontier.pop()
            if h in seen_h:
                continue
            seen_h.add(h)
            helper_fams[h].add(fam)
            frontier.extend(helper_uses[h] & helper_names)

    placement: dict[str, str] = {}
    for h, fams in helper_fams.items():
        if len(fams) == 1:
            placement[h] = next(iter(fams))
        elif len(fams) > 1:
            placement[h] = "_shared"
        else:
            sys.exit(f"helper {h} unused by any family")
    # a _shared helper's helper deps must live in _shared too
    changed = True
    while changed:
        changed = False
        for h, place in list(placement.items()):
            if place == "_shared":
                for dep in helper_uses[h] & helper_names:
                    if placement[dep] != "_shared":
                        placement[dep] = "_shared"
                        changed = True

    # --- emit ----------------------------------------------------------------
    def strip_dividers(text: str) -> str:
        out, in_div = [], False
        for ln in text.splitlines(keepends=True):
            if ln.rstrip("\n").startswith("# ---------------"):
                in_div = not in_div
                continue
            if in_div and ln.lstrip().startswith("#"):
                continue
            out.append(ln)
        # collapse runs of >2 blank lines left behind
        cleaned, blanks = [], 0
        for ln in out:
            if ln.strip() == "":
                blanks += 1
                if blanks > 2:
                    continue
            else:
                blanks = 0
            cleaned.append(ln)
        return "".join(cleaned)

    def needed_imports(body_text: str) -> list[str]:
        node = ast.parse(body_text)
        used = used_names(node)
        stmts = {IMPORT_PROVIDERS[n] for n in used if n in IMPORT_PROVIDERS}
        stmts.add("from __future__ import annotations")
        return [s for s in IMPORT_ORDER if s in stmts]

    shared_body = "".join(
        strip_dividers(raw)
        for kind, key, _, raw in segments
        if kind == "helper" and placement[key] == "_shared"
    )
    shared_names = sorted(
        h for h, p in placement.items() if p == "_shared"
    )

    # _registry.py
    doc = (
        '"""Query-registry infrastructure: QuerySpec, the REGISTRY dict, and\n'
        "the @_register decorator family modules use.\n"
        "\n"
        "Cross-engine determinism conventions every entry follows (Spark\n"
        "DataFrame plan vs DuckDB oracle SQL):\n"
        "\n"
        "- every computed column is aliased IDENTICALLY in Spark and SQL;\n"
        "- multi-row float aggregates (sum/avg over doubles) are rounded to 4\n"
        "  decimals in BOTH engines at output (summation order differs between\n"
        "  engines; per-row arithmetic is left exact — IEEE ops are\n"
        "  deterministic);\n"
        "- every top-k / rank has a unique tie-break key;\n"
        "- regexes are RE2-safe (no lookarounds) so Spark (Java regex) and\n"
        "  DuckDB (RE2) agree;\n"
        "- a rounded value that can be zero gets `+ 0.0` appended on BOTH\n"
        "  sides (engines disagree on the sign of an IEEE -0.0 rounding\n"
        "  result);\n"
        "- DuckDB returns BIGINT from year/week/row_number/ntile (CAST AS INT\n"
        "  to match Spark) and HUGEINT from sum(int) (CAST AS BIGINT);\n"
        "- engine-specific sketch values (HLL, quantile sketches) are never\n"
        "  hash-compared — the checked contract is an error bound against the\n"
        "  exact value, which IS deterministic.\n"
        '"""\n'
    )
    infra = {k: raw for kind, k, _, raw in segments if kind == "infra"}
    registry_py = (
        doc
        + "\nfrom __future__ import annotations\n\n"
        + "from collections.abc import Callable\n"
        + "from dataclasses import dataclass\n\n"
        + "from pyspark.sql import DataFrame, SparkSession\n\n"
        + strip_dividers(infra["QuerySpec"]).lstrip("\n")
        + strip_dividers(infra["REGISTRY"])
        + strip_dividers(infra["_register"])
    )
    (PLANS / "_registry.py").write_text(registry_py)

    # _shared.py
    shared_py = (
        '"""Oracle-SQL fragments and helpers shared by multiple query-family\n'
        "modules (kept in exact lockstep with the operator-package\n"
        'expressions they mirror — see each helper\'s comment).\n"""\n'
        + "\n"
        + "\n".join(needed_imports(shared_body))
        + "\n\n"
        + shared_body
    )
    (PLANS / "_shared.py").write_text(shared_py)

    # family modules
    fam_files = {}
    for fam in FAMILIES:
        parts = [
            strip_dividers(raw)
            for kind, key, _, raw in segments
            if (kind == "query" and name_to_family[key] == fam)
            or (kind == "helper" and placement[key] == fam)
        ]
        # preserve original file order: segments list is already in order
        body = "".join(parts)
        node = ast.parse(body)
        used = used_names(node)
        shared_used = sorted(set(shared_names) & used)
        imports = needed_imports(body)
        header = f'"""{DOCSTRINGS[fam]}\n\nRegistered query family ({len(FAMILIES[fam])} entries); split from the\noriginal monolithic plans/queries.py.\n"""\n\n'
        header += "\n".join(imports) + "\n\n"
        header += f"from {PKG}._registry import _register\n"
        if shared_used:
            joined = ",\n    ".join(shared_used)
            header += f"from {PKG}._shared import (\n    {joined},\n)\n"
        fam_files[fam] = header + "\n" + body.lstrip("\n")
        (PLANS / f"{fam}.py").write_text(fam_files[fam])

    # _order.py
    order_py = (
        '"""Canonical registration order — pinned so REGISTRY iteration order\n'
        "is identical to the original monolith (the driver's sampling and the\n"
        "bench baselines key off names, but order stability costs nothing and\n"
        'removes a variable). New queries append here.\n"""\n\n'
        + "CANONICAL_ORDER = [\n"
        + "".join(f'    "{n}",\n' for n in canonical_order)
        + "]\n"
    )
    (PLANS / "_order.py").write_text(order_py)

    # aggregator queries.py
    fam_list = ", ".join(FAMILIES)
    agg = (
        '"""Named query registry — every implemented operator as a (Spark\n'
        "query, ANSI-SQL oracle) pair over the synthetic catalog\n"
        "(TESTDATA.md).\n"
        "\n"
        "The registry is populated by the family modules (imported below for\n"
        "their @_register side effects) and re-sorted into the pinned\n"
        "canonical order; determinism conventions are documented in\n"
        "plans/_registry.py. Families: " + fam_list + ".\n"
        '"""\n'
        "\n"
        "from __future__ import annotations\n"
        "\n"
        f"from {PKG} import (  # noqa: F401 — imported for @_register side effects\n"
        + "".join(f"    {fam},\n" for fam in FAMILIES)
        + ")\n"
        f"from {PKG}._order import CANONICAL_ORDER\n"
        f"from {PKG}._registry import REGISTRY, QuerySpec\n"
        "\n"
        "__all__ = [\"REGISTRY\", \"QuerySpec\"]\n"
        "\n"
        "_missing = [n for n in CANONICAL_ORDER if n not in REGISTRY]\n"
        "assert not _missing, f\"canonical order names missing: {_missing}\"\n"
        "_ordered = {n: REGISTRY[n] for n in CANONICAL_ORDER}\n"
        "# any query registered but not yet pinned appends in import order\n"
        "_ordered.update({n: s for n, s in REGISTRY.items() if n not in _ordered})\n"
        "REGISTRY.clear()\n"
        "REGISTRY.update(_ordered)\n"
    )
    (PLANS / "queries.py").write_text(agg)

    print(f"queries: {len(canonical_order)}  helpers: {len(helper_names)}")
    for fam in FAMILIES:
        n_lines = fam_files[fam].count("\n")
        print(f"  {fam}: {len(FAMILIES[fam])} queries, {n_lines} lines")
    print(f"  _shared helpers: {shared_names}")
    for h, p in sorted(placement.items()):
        if p != "_shared":
            print(f"    helper {h} -> {p}")


if __name__ == "__main__":
    main()
