"""Regenerate PLANS.md — executed physical plans of the flagship queries.

Usage: PYTHONPATH=. python tools/gen_plans_md.py

Kept as a script (not a test) so the doc can be refreshed whenever an
operator's plan changes; tests/test_plans.py is what ENFORCES the
shapes, this file just shows them.
"""

from __future__ import annotations

import io
import re

SF_DIR = "/root/testdata/sf0.001"

#: (query, one-line shape summary) — the flagship set PLANS.md documents.
FLAGSHIPS = (
    ("rollup_entity", "flagship rollup — partial+final hash agg, pruned scan"),
    ("dim_join_rollup", "star join — all dims broadcast, fact never shuffles"),
    ("fact_join_agg", "fact-fact join — broadcast build under threshold, AQE otherwise"),
    ("topk_orders", "top-k — TakeOrderedAndProject, no global sort"),
    ("user_daily_7day_avg", "partitioned window — no single-task stage"),
    ("lsh_candidate_pairs", "LSH banding — band-key equi-join, no O(n^2)"),
    (
        "prefix_jaccard_pairs",
        "prefix-filter exact similarity join — all equi-joins, PPJoin size + positional bounds",
    ),
    ("bloom_pruned_revenue", "runtime-filter shape (bloom injects at scale thresholds)"),
    ("training_corpus", "corpus capstone — composed dedup pipeline"),
    ("nation_trade_pagerank", "iterative graph — checkpointed rounds"),
    ("bpe_merge_induction", "BPE — vocab-sized aggs, 1-row rule broadcast"),
    ("sim_bruteforce_topk", "embedding top-k — JVM-side higher-order functions"),
    ("windowed_funnel_conversion", "ordered funnel — user-keyed min-agg cascade, no windows"),
    ("nation_trade_triangles", "triangle counting — oriented equi-joins over checkpointed edges"),
    ("open_orders_timeline", "sweep-line concurrency — partial-agg to days before the one ordered window"),
    ("pq_adc_topk", "product-quantization ANN — broadcast distance tables over 4-byte codes"),
    ("bigram_lm_perplexity", "bigram LM scoring — vocabulary stats broadcast onto the corpus stream"),
    ("incremental_corpus_dedup", "incremental ingest dedup — batch probes persisted fingerprint + band indexes"),
    ("bfs_shortest_hops", "distributed BFS — rounds behind a checkpoint barrier"),
    ("semdedup_survivors", "semantic dedup — cell-keyed cosine pair join, broadcast quantizer"),
    ("maximal_repeated_substrings", "substring dedup — hashed-gram semi-join, per-doc interval-merge windows"),
    ("embedding_pca_top_component", "PCA — single-scan Gram cells, dims-grain power-iteration matvecs"),
    ("embedding_neardup_pairs", "exact pair tier — broadcast unit matrix, Arrow-batched chunked B@Mᵀ GEMM"),
    ("mutual_nearest_ivf", "IVF mutual-NN — cell-keyed grouped GEMM (applyInPandas), reciprocity self-join"),
)

HEADER = """# PLANS — executed physical plans of the flagship queries

Auto-generated (`python tools/gen_plans_md.py`; `python -m pytest
tests/test_plans.py` enforces the shapes; this file shows them).
Source SF: sf0.001; shapes are size-independent except where AQE swaps
join strategies at runtime.
"""


def main() -> None:
    from covid19_etl_pipeline_spark.plans.queries import REGISTRY
    from covid19_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name="gen_plans")
    out = io.StringIO()
    out.write(HEADER)
    for name, blurb in FLAGSHIPS:
        df = REGISTRY[name].fn(spark, SF_DIR)
        plan = df._jdf.queryExecution().executedPlan().treeString()
        # keep it readable: trim trailing whitespace, cap line length
        lines = []
        for ln in plan.splitlines():
            ln = ln.rstrip()
            if len(ln) > 140:
                ln = ln[:137] + "..."
            lines.append(ln)
        # drop reused-exchange noise tails beyond 40 lines
        if len(lines) > 40:
            lines = lines[:40] + [f"... ({len(lines) - 40} more lines)"]
        out.write(f"\n## {name}\n\n{blurb}\n\n```\n" + "\n".join(lines) + "\n```\n")
    spark.stop()
    text = re.sub(r"#\d+", lambda m: m.group(0), out.getvalue())
    with open("PLANS.md", "w") as fh:
        fh.write(text)
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
