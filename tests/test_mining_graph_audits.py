"""Invariant tests for the round-3 mining / graph / maintenance query
batch — independent recomputations and structural invariants on top of
the oracle parity sweep (a defect mirrored into both engines would
pass parity; these catch it).
"""

from __future__ import annotations

from collections import defaultdict

import duckdb

from covid19_etl_pipeline_spark.catalog import table_path
from covid19_etl_pipeline_spark.plans.queries import REGISTRY

SF_DIR = "/root/testdata/sf0.001"


def test_association_rules_bounds_and_consistency(spark):
    rows = REGISTRY["association_rules_parts"].fn(spark, SF_DIR).collect()
    assert rows
    n_orders = duckdb.sql(
        f"SELECT count(DISTINCT l_orderkey) FROM "
        f"'{table_path(SF_DIR, 'lineitem')}'"
    ).fetchone()[0]
    for r in rows:
        # support can't exceed either item's support; confidence in
        # (0, 1]; lift consistent with its closed form
        assert r["pair_support"] <= min(r["ante_support"], r["cons_support"])
        assert 0.0 < r["confidence"] <= 1.0
        expect_lift = round(
            r["pair_support"] * 1.0 * n_orders
            / (r["ante_support"] * 1.0 * r["cons_support"]),
            4,
        )
        assert abs(r["lift"] - expect_lift) < 1e-9


def test_link_prediction_excludes_backbone_edges(spark):
    preds = REGISTRY["nation_link_prediction"].fn(spark, SF_DIR).collect()
    assert preds
    bb = duckdb.sql(
        f"""
        WITH w AS (
            SELECT least(cn.n_name, sn.n_name) AS a,
                   greatest(cn.n_name, sn.n_name) AS b, count(*) AS w
            FROM '{table_path(SF_DIR, 'lineitem')}' l
            JOIN '{table_path(SF_DIR, 'orders')}' o ON l.l_orderkey = o.o_orderkey
            JOIN '{table_path(SF_DIR, 'customer')}' c ON o.o_custkey = c.c_custkey
            JOIN '{table_path(SF_DIR, 'nation')}' cn ON c.c_nationkey = cn.n_nationkey
            JOIN '{table_path(SF_DIR, 'supplier')}' s ON l.l_suppkey = s.s_suppkey
            JOIN '{table_path(SF_DIR, 'nation')}' sn ON s.s_nationkey = sn.n_nationkey
            WHERE cn.n_name <> sn.n_name GROUP BY a, b
        )
        SELECT a, b FROM w WHERE w > (SELECT avg(w) FROM w)
        """
    ).fetchall()
    edges = {tuple(e) for e in bb}
    for r in preds:
        pair = (r["nation_a"], r["nation_b"])
        assert pair not in edges  # predicted links must be NEW
        assert r["nation_a"] < r["nation_b"]
        assert r["common_neighbors"] >= 1
        assert r["adamic_adar"] > 0


def test_mutual_nn_pairs_are_symmetric_best(spark):
    rows = REGISTRY["mutual_nearest_embeddings"].fn(spark, SF_DIR).collect()
    assert rows
    seen = set()
    for r in rows:
        assert r["vec_a"] < r["vec_b"]
        assert -1.0 - 1e-9 <= r["cosine_sim"] <= 1.0 + 1e-9
        key = (r["vec_a"], r["vec_b"])
        assert key not in seen  # each mutual pair reported once
        seen.add(key)
    # a vector can appear in at most one mutual pair (its single NN)
    members = [v for p in seen for v in p]
    assert len(members) == len(set(members))


def test_anf_reach_is_monotone_and_bounded(spark):
    rows = {
        r["radius"]: r
        for r in REGISTRY["nation_trade_anf"].fn(spark, SF_DIR).collect()
    }
    assert set(rows) == {1, 2, 3}
    assert rows[1]["n_pairs"] <= rows[2]["n_pairs"] <= rows[3]["n_pairs"]
    for r in rows.values():
        assert 0.0 < r["reach_frac"] <= 1.0


def test_compaction_plan_partitions_days_in_order(spark):
    rows = REGISTRY["compaction_plan"].fn(spark, SF_DIR).collect()
    assert rows
    n_days = duckdb.sql(
        f"SELECT count(DISTINCT CAST(ts AS DATE)) FROM "
        f"'{table_path(SF_DIR, 'events')}'"
    ).fetchone()[0]
    assert sum(r["n_source_files"] for r in rows) == n_days
    ordered = sorted(rows, key=lambda r: r["file_id"])
    for prev, cur in zip(ordered, ordered[1:]):
        # day ranges of consecutive compacted files must not overlap
        assert prev["day_max"] < cur["day_min"]
    # every file except possibly the last stays under target + one day
    for r in ordered[:-1]:
        assert r["total_bytes"] > 0


def test_dup_flow_totals_match_pair_count(spark):
    flows = REGISTRY["cross_source_dup_flow"].fn(spark, SF_DIR).collect()
    assert flows
    from covid19_etl_pipeline_spark.operators.dedup import (
        prefix_filter_jaccard_pairs,
    )
    from covid19_etl_pipeline_spark.catalog import load_table

    docs = load_table(spark, SF_DIR, "documents")
    n_pairs = prefix_filter_jaccard_pairs(
        docs, "doc_id", text_col="text", threshold=0.5
    ).count()
    assert sum(r["n_pairs"] for r in flows) == n_pairs


def test_doremi_weights_normalize_and_order(spark):
    rows = REGISTRY["doremi_domain_weights"].fn(spark, SF_DIR).collect()
    assert rows
    total = sum(r["updated_weight"] for r in rows)
    assert abs(total - 1.0) < 0.01  # rounding tolerance over ~20 sources
    # hardest source (max NLL) must gain at least as much weight as the
    # easiest (min NLL): the update is monotone in excess loss
    hardest = max(rows, key=lambda r: r["mean_nll"])
    easiest = min(rows, key=lambda r: r["mean_nll"])
    assert hardest["updated_weight"] >= easiest["updated_weight"]


def test_quantile_normalization_uniformizes_sources(spark):
    rows = REGISTRY["quantile_normalize_scores"].fn(spark, SF_DIR).collect()
    assert rows
    by_source = defaultdict(list)
    for r in rows:
        by_source[r["source"]].append(r)
        assert 0.0 <= r["source_pct"] <= 1.0
        assert r["normalized_score"] >= min(x["raw_score"] for x in rows)
    for src, docs in by_source.items():
        # within a source, normalization preserves the raw-score order
        docs.sort(key=lambda r: (r["raw_score"], r["doc_id"]))
        norm = [d["normalized_score"] for d in docs]
        assert norm == sorted(norm), f"order broken for {src}"


def test_pca_component_matches_numpy_replication(spark):
    import numpy as np

    rows = REGISTRY["embedding_pca_top_component"].fn(spark, SF_DIR).collect()
    got = np.array([r["loading"] for r in sorted(rows, key=lambda r: r["dim"])])
    X = np.array(
        duckdb.sql(
            f"SELECT embedding FROM '{table_path(SF_DIR, 'embeddings')}' "
            f"ORDER BY vec_id"
        ).fetchall()
    )[:, 0].tolist()
    X = np.array(X, dtype=np.float64)
    n, d = X.shape
    gram = X.T @ X
    mu = X.sum(axis=0) / n
    C = np.round(gram / n - np.outer(mu, mu), 6)
    v = np.ones(d)
    for _ in range(3):  # replicate the exact unrolled recipe
        v = C @ v
        piv = v[np.lexsort((np.arange(d), -np.abs(v)))[0]]
        v = np.round(v / piv, 8)
    assert np.allclose(got, v, atol=1e-6)
    # and the result is genuinely principal: its Rayleigh quotient must
    # dominate any coordinate direction's variance
    rq = (got @ C @ got) / (got @ got)
    assert rq >= C.diagonal().max() * 0.99


def test_attribution_models_conserve_revenue(spark):
    lin = REGISTRY["linear_attribution_revenue"].fn(spark, SF_DIR).collect()
    dec = REGISTRY["time_decay_attribution"].fn(spark, SF_DIR).collect()
    assert lin and dec
    # both models split the SAME touched-purchase revenue pool — total
    # attributed revenue must agree (weights renormalize per purchase)
    assert abs(
        sum(r["attributed_revenue"] for r in lin)
        - sum(r["attributed_revenue"] for r in dec)
    ) < 0.01
    # recency weighting must not create or destroy purchases
    assert {r["channel"] for r in lin} == {r["channel"] for r in dec}


def test_mode_matches_bruteforce(spark):
    rows = REGISTRY["modal_priority_by_nation"].fn(spark, SF_DIR).collect()
    assert rows
    truth = duckdb.sql(
        f"""
        SELECT n.n_name, o.o_orderpriority, count(*) AS c
        FROM '{table_path(SF_DIR, 'orders')}' o
        JOIN '{table_path(SF_DIR, 'customer')}' c ON o.o_custkey = c.c_custkey
        JOIN '{table_path(SF_DIR, 'nation')}' n ON c.c_nationkey = n.n_nationkey
        GROUP BY 1, 2
        """
    ).fetchall()
    best = {}
    for nation, pri, c in truth:
        cur = best.get(nation)
        if cur is None or (c, ) > (cur[1], ) or (c == cur[1] and pri < cur[0]):
            best[nation] = (pri, c)
    for r in rows:
        assert best[r["nation"]] == (r["modal_priority"], r["modal_count"])


def test_retrieval_metrics_bounded(spark):
    r = REGISTRY["ann_label_mrr"].fn(spark, SF_DIR).collect()[0]
    assert 0.0 <= r["mrr_at_10"] <= 1.0
    assert 0.0 <= r["precision_at_10"] <= 1.0
    assert r["queries_with_hit"] <= r["n_queries"]
    # MRR can't be below P@10's implied floor when every hit is rank 10
    assert r["mrr_at_10"] >= r["precision_at_10"] / 10.0 - 1e-9


def test_truss_support_counts_triangles(spark):
    rows = REGISTRY["trade_edge_truss_support"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["triangle_support"] >= 0
        assert r["in_4_truss"] == (r["triangle_support"] >= 2)
