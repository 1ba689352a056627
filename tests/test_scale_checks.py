"""Tiered scale-oracle machinery (tools/scale_checks.py).

The ×10 sweep's verdicts now ride on these checks, so the checkers
themselves are pinned here: the union-find twin of
dedup.connected_components, the schema-driven spark-only invariant
engine (including that planted violations actually flip it), and a
planted-defect test proving a tiered check FAILS when the Spark output
is wrong — a checker that cannot fail is not a check.
"""

from __future__ import annotations

import duckdb
import pytest

from tools.scale_checks import (
    CHECKS,
    CheckCtx,
    spark_only_invariants,
    union_find_labels,
)

TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()


def test_union_find_min_labels():
    # two components {1,2,3,7} and {5,9}; 11 isolated via self-free edges
    edges = [(2, 3), (7, 3), (1, 2), (5, 9), (9, 5)]
    labels = union_find_labels(edges)
    assert labels == {1: 1, 2: 1, 3: 1, 7: 1, 5: 5, 9: 5}
    # long path (worst case for naive propagation): still min-labeled
    chain = [(i, i + 1) for i in range(1000, 0, -1)]
    lab = union_find_labels(chain)
    assert set(lab.values()) == {1} and len(lab) == 1001
    assert union_find_labels([]) == {}


def test_union_find_matches_distributed_cc(spark):
    """The driver-side twin agrees with dedup.connected_components on
    a randomish banded graph."""
    from covid19_etl_pipeline_spark.operators import dedup

    edges = [(i, (i * 7) % 50) for i in range(50) if i != (i * 7) % 50]
    df = spark.createDataFrame(edges, "a long, b long")
    got = {
        r["node"]: r["label"]
        for r in dedup.connected_components(df, "a", "b").collect()
    }
    assert got == union_find_labels(edges)


def test_spark_only_invariants_pass_and_fail(spark):
    ok_df = spark.createDataFrame(
        [(1, 2, 0.5), (3, 4, 1.0)],
        "vec_id_a long, vec_id_b long, cosine_sim double",
    )
    n, inv, notes = spark_only_invariants(ok_df)
    assert notes.get("value_hash", "").lstrip("-").isdigit()
    assert n == 2 and all(inv.values())
    assert "pair_ordered_a_lt_b" in inv and "cosine_sim_in_cosine_range" in inv
    # planted violations flip exactly the right invariants
    bad_df = spark.createDataFrame(
        [(5, 2, 0.5), (3, 4, 1.5)],
        "vec_id_a long, vec_id_b long, cosine_sim double",
    )
    _, inv, _n = spark_only_invariants(bad_df)
    assert inv["pair_ordered_a_lt_b"] is False
    assert inv["cosine_sim_in_cosine_range"] is False
    # a duplicated pair is caught when it lands in the sampled bucket —
    # force it by duplicating EVERY pair so some bucket must collide
    dup_rows = [(i, i + 1, 0.1) for i in range(600)] * 2
    dup_df = spark.createDataFrame(
        dup_rows, "vec_id_a long, vec_id_b long, cosine_sim double"
    )
    _, inv, _n = spark_only_invariants(dup_df)
    assert inv["no_dup_pairs_sampled_bucket"] is False
    # unit-interval columns
    _, inv, _n = spark_only_invariants(
        spark.createDataFrame([(1.2,)], "recall double")
    )
    assert inv["recall_in_unit_interval"] is False


@pytest.fixture()
def duck_small(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    yield con
    con.close()


def test_tiered_check_catches_planted_defect(spark, duck_small, sf_dir):
    """dup_clusters' tiered check must FAIL when the Spark output lies:
    perturb one cluster label and the exact-label compare flips."""
    from pyspark.sql import functions as F

    from covid19_etl_pipeline_spark.plans.queries import REGISTRY

    good = REGISTRY["dup_clusters"].fn(spark, sf_dir)
    ctx = CheckCtx(spark, duck_small, sf_dir, good)
    try:
        res = CHECKS["dup_clusters"](ctx)
        assert all(res["checks"].values())
    finally:
        ctx.cleanup()
    # plant: bump one row's cluster_id
    bad = good.withColumn(
        "cluster_id",
        F.when(
            F.col("vec_id") == good.select(F.min("vec_id")).collect()[0][0],
            F.col("cluster_id") + 1,
        ).otherwise(F.col("cluster_id")),
    )
    ctx = CheckCtx(spark, duck_small, sf_dir, bad)
    try:
        res = CHECKS["dup_clusters"](ctx)
        assert res["checks"]["labels_and_sizes_exact"] is False
    finally:
        ctx.cleanup()


def test_tiered_pair_check_catches_planted_pair(spark, duck_small, sf_dir):
    """lsh_candidate_pairs' soundness leg must flag an invented pair."""
    from covid19_etl_pipeline_spark.plans.queries import REGISTRY

    good = REGISTRY["lsh_candidate_pairs"].fn(spark, sf_dir)
    ctx = CheckCtx(spark, duck_small, sf_dir, good)
    try:
        res = CHECKS["lsh_candidate_pairs"](ctx)
        assert all(res["checks"].values())
    finally:
        ctx.cleanup()
    # plant a pair of unrelated docs (min and max doc ids, not already
    # a pair — they sit in different md5 bands with probability ~1)
    fake = spark.createDataFrame([(1, 2)], "doc_id_a long, doc_id_b long")
    bad = good.unionByName(fake)
    ctx = CheckCtx(spark, duck_small, sf_dir, bad)
    try:
        res = CHECKS["lsh_candidate_pairs"](ctx)
        assert res["checks"]["pairs_sound"] is False
    finally:
        ctx.cleanup()


def test_python_recompute_extras_match_engine(spark, sf_dir):
    """The pure-Python md5/tokenization twins (minhash, simhash,
    winnowing, fingerprint) agree with the Spark operators on the
    sampled bucket — and a planted wrong row flips the verdict."""
    from pyspark.sql import functions as F

    from covid19_etl_pipeline_spark.plans.queries import REGISTRY
    from tools.scale_checks import SPARK_ONLY_EXTRA

    for name in (
        "minhash_signatures",
        "simhash_signatures",
        "doc_fingerprint",
        "winnowing_fingerprints",
    ):
        sdf = REGISTRY[name].fn(spark, sf_dir)
        inv = SPARK_ONLY_EXTRA[name](spark, sf_dir, sdf)
        assert inv == {"python_recompute_sampled": True}, name
    # planted defect: shift every fingerprint -> recompute must fail
    bad = (
        REGISTRY["doc_fingerprint"]
        .fn(spark, sf_dir)
        .withColumn("fp", F.concat(F.lit("x"), F.col("fp")))
    )
    inv = SPARK_ONLY_EXTRA["doc_fingerprint"](spark, sf_dir, bad)
    assert inv == {"python_recompute_sampled": False}


def test_algebra_extras_catch_planted_defects(spark, sf_dir):
    """Value-bearing extras must FAIL on doctored results — a checker
    that cannot fail is not a check."""
    from pyspark.sql import functions as F

    from covid19_etl_pipeline_spark.plans.queries import REGISTRY
    from tools.scale_checks import SPARK_ONLY_EXTRA

    # dup_cluster_size_distribution: break the members identity
    good = REGISTRY["dup_cluster_size_distribution"].fn(spark, sf_dir)
    assert all(
        SPARK_ONLY_EXTRA["dup_cluster_size_distribution"](
            spark, sf_dir, good
        ).values()
    )
    bad = good.withColumn("n_members", F.col("n_members") + 1)
    res = SPARK_ONLY_EXTRA["dup_cluster_size_distribution"](
        spark, sf_dir, bad
    )
    assert res["members_eq_size_times_clusters"] is False
    # neardup_threshold_sweep: break monotonicity
    good = REGISTRY["neardup_threshold_sweep"].fn(spark, sf_dir)
    assert all(
        SPARK_ONLY_EXTRA["neardup_threshold_sweep"](
            spark, sf_dir, good
        ).values()
    )
    bad = good.withColumn(
        "n_pairs",
        F.when(F.col("threshold") > 0.7, F.lit(10**12)).otherwise(
            F.col("n_pairs")
        ),
    )
    res = SPARK_ONLY_EXTRA["neardup_threshold_sweep"](spark, sf_dir, bad)
    assert res["n_pairs_monotone_nonincreasing"] is False
    # PCA: a wrong loading vector must fail the 3-iteration recompute
    good = REGISTRY["embedding_pca_top_component"].fn(spark, sf_dir)
    assert SPARK_ONLY_EXTRA["embedding_pca_top_component"](
        spark, sf_dir, good
    ) == {"loading_recomputed_3_iterations": True}
    bad = good.withColumn("loading", F.col("loading") * -0.5 + 0.1)
    assert SPARK_ONLY_EXTRA["embedding_pca_top_component"](
        spark, sf_dir, bad
    ) == {"loading_recomputed_3_iterations": False}
