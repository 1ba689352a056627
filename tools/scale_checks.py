"""Tiered scale oracles (VERDICT r08 #2).

At the ×10 fixtures, 14 registry queries had no verdict: 11 oracle
twins are legitimately super-linear SQL forms that exist for small-sf
correctness (quadratic pair joins, full-corpus NN scans) and tripped
the 450s budget, and 3 connected-components twins exhaust DuckDB's
non-spillable recursive-CTE materialization. The Spark side of every
one finished — what was missing is an INDEPENDENT check of the values
at scale.

This module replaces those monolithic twins with LINEAR (or
sampled-quadratic) property checks run over the SPARK OUTPUT:

- **CC family** (`dup_clusters`, `near_dedup_survivors`,
  `dup_cluster_size_distribution`): the edge set
  (`embedding_neardup_pairs`) is value-verified by its own oracle at
  ×10, so labels are recomputed EXACTLY by an independent union-find
  over the exported edges (driver-side, O(E α(E)) — 424k edges at
  ×10) and compared value-for-value. This is full value-level
  verification, not an invariant.
- **Pair queries** (`lsh_candidate_pairs`, `prefix_jaccard_pairs`,
  `containment_doc_pairs`): SOUNDNESS is verified globally — every
  emitted pair's predicate/score is recomputed in DuckDB over only
  the involved docs (linear in output size); COMPLETENESS is
  verified exactly within seeded content-free md5(doc_id) blocks
  (the pair predicates are purely pairwise, so oracle-on-subset ==
  Spark-output ∩ subset²) plus, for prefix-jaccard, containment of
  the independently-verified blocked `ngram_jaccard_pairs` results.
- **Composite pipelines** (`training_corpus`, `leakage_safe_split`,
  `cross_source_dup_flow`, `neardup_threshold_sweep`,
  `incremental_corpus_dedup`): decomposed — exact-dedup and per-row
  derived columns recomputed linearly in DuckDB, near-dup clusters
  via the union-find over exported pair frames, rollups recomputed in
  DuckDB from the verified pair exports.
- **Mutual-NN family** (`mutual_nearest_embeddings`,
  `mutual_nn_ivf_recall`): every output pair's cosine recomputed
  (linear); mutuality verified for seeded samples by true full-corpus
  NN scans in DuckDB (k scans of n rows, never n²); recall/precision
  arithmetic recomputed from exported pair sets.
- **`lsh_banding_recall`**: the truth side is (source, tblk)-block-
  local, so both engines recompute truth∩subset and its banding
  capture on a seeded sub-block exactly; global output checked for
  arithmetic consistency.

Every check returns {"checks": {name: bool}, "notes": {...}}; the
sweep records the dict and treats any False as a failure. Checks are
deterministic (md5-seeded samples, no RNG).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from covid19_etl_pipeline_spark.plans._shared import (
    _D_SHINGLES,
    _d_minhash,
    adaptive_blk_width,
)

#: registry: query name -> check(ctx) -> {"checks": {...}, "notes": {...}}
CHECKS: dict = {}


def _check(name):
    def deco(fn):
        CHECKS[name] = fn
        return fn

    return deco


class CheckCtx:
    """Everything a tiered check needs: the live SparkSession, a DuckDB
    cursor with the base-table views already registered (the sweep's),
    the fixture dir, and the Spark result DataFrame of the query under
    check. Exported frames become DuckDB views over temp parquet."""

    def __init__(self, spark, cur, sf_dir, sdf):
        self.spark = spark
        self.cur = cur
        self.sf_dir = sf_dir
        self.sdf = sdf
        self._tmp = None
        self._views = []

    def export(self, df, name: str) -> str:
        """Write a Spark DataFrame to temp parquet and register it as a
        DuckDB view ``name``. Returns the view name."""
        if self._tmp is None:
            self._tmp = tempfile.mkdtemp(prefix="scale_check_")
        path = os.path.join(self._tmp, name)
        df.write.mode("overwrite").parquet(path)
        self.cur.execute(
            f"CREATE OR REPLACE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{path}/*.parquet')"
        )
        self._views.append(name)
        return name

    def cleanup(self):
        for v in self._views:
            try:
                self.cur.execute(f"DROP VIEW IF EXISTS {v}")
            except Exception:
                pass
        if self._tmp:
            shutil.rmtree(self._tmp, ignore_errors=True)


def union_find_labels(edges) -> dict:
    """Min-label connected components over an iterable of (a, b) id
    pairs — the independent twin of dedup.connected_components, O(E
    α(E)) with path compression, no recursion depth, no SQL. Returns
    {node: min_id_of_component}."""
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for a, b in edges:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by MIN root so the final root is the component min
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {n: find(n) for n in parent}


def _neardup_edges(ctx) -> list:
    """The CC family's edge set: embedding_neardup_pairs — its OWN
    oracle (the quadratic pair join) is value-verified at ×10 via the
    agg-hash sweep, so these edges are trusted input here."""
    from covid19_etl_pipeline_spark.plans.queries import REGISTRY

    pairs = REGISTRY["embedding_neardup_pairs"].fn(ctx.spark, ctx.sf_dir)
    return [
        (r["vec_id_a"], r["vec_id_b"])
        for r in pairs.select("vec_id_a", "vec_id_b").collect()
    ]


# ---------------------------------------------------------------- CC family


@_check("dup_clusters")
def check_dup_clusters(ctx) -> dict:
    edges = _neardup_edges(ctx)
    labels = union_find_labels(edges)
    from collections import Counter

    sizes = Counter(labels.values())
    expected = {
        n: (lab, sizes[lab]) for n, lab in labels.items()
    }
    got = {
        r["vec_id"]: (r["cluster_id"], r["cluster_size"])
        for r in ctx.sdf.collect()
    }
    return {
        "checks": {
            "membership_exact": set(got) == set(expected),
            "labels_and_sizes_exact": got == expected,
        },
        "notes": {"n_edges": len(edges), "n_nodes": len(expected)},
    }


@_check("near_dedup_survivors")
def check_near_dedup_survivors(ctx) -> dict:
    labels = union_find_labels(_neardup_edges(ctx))
    dropped = {n for n, lab in labels.items() if n != lab}
    all_ids = {
        r[0]
        for r in ctx.cur.execute("SELECT vec_id FROM embeddings").fetchall()
    }
    expected = all_ids - dropped
    got = {r["vec_id"] for r in ctx.sdf.select("vec_id").collect()}
    return {
        "checks": {"survivor_set_exact": got == expected},
        "notes": {"n_survivors": len(got), "n_dropped": len(dropped)},
    }


@_check("dup_cluster_size_distribution")
def check_dup_cluster_size_distribution(ctx) -> dict:
    from collections import Counter

    labels = union_find_labels(_neardup_edges(ctx))
    sizes = Counter(Counter(labels.values()).values())  # size -> n_clusters
    expected = {
        s: (nc, s * nc, (s - 1) * nc) for s, nc in sizes.items()
    }
    got = {
        r["cluster_size"]: (r["n_clusters"], r["n_members"], r["n_removable"])
        for r in ctx.sdf.collect()
    }
    return {
        "checks": {"histogram_exact": got == expected},
        "notes": {"n_size_classes": len(expected)},
    }


# ------------------------------------------------------------- pair queries


def _doc_subset_pred(prefixes, col="doc_id") -> str:
    """Content-free seeded doc subset: md5(id) hex prefix in a fixed
    set. Deterministic, unbiased w.r.t. content, and identical in both
    engines."""
    width = len(prefixes[0])
    opts = ", ".join(f"'{p}'" for p in prefixes)
    return f"substr(md5(CAST({col} AS VARCHAR)), 1, {width}) IN ({opts})"


#: 4 two-hex blocks = ~1/64 of the corpus; brute-force pair joins over
#: the subset stay in the hundreds of thousands of pairs at ×10.
_BLOCKS_2HEX = ("0a", "3c", "7e", "b1")
#: one-hex block = 1/16 — cheap enough when the per-pair predicate is
#: a signature equality, not a list intersection.
_BLOCKS_1HEX = ("7",)


@_check("lsh_candidate_pairs")
def check_lsh_candidate_pairs(ctx) -> dict:
    cur = ctx.cur
    ctx.export(ctx.sdf, "sc_lsh_pairs")
    mh = ", ".join(f"{_d_minhash(i)} AS m{i}" for i in range(8))
    bands = (
        "SELECT doc_id, 0 AS band, concat_ws('|', m0, m1) AS sig FROM sigs "
        "UNION ALL SELECT doc_id, 1, concat_ws('|', m2, m3) FROM sigs "
        "UNION ALL SELECT doc_id, 2, concat_ws('|', m4, m5) FROM sigs "
        "UNION ALL SELECT doc_id, 3, concat_ws('|', m6, m7) FROM sigs"
    )
    # SOUNDNESS (global, linear in output): every emitted pair shares
    # >= 1 non-empty band signature — sigs recomputed for involved
    # docs only
    # set-based (a correlated NOT EXISTS nested-loops per pair here):
    # all shared-band pairs among involved docs, then one anti-join
    unsound = cur.execute(
        f"""
        WITH involved AS (
            SELECT doc_id_a AS d FROM sc_lsh_pairs
            UNION SELECT doc_id_b FROM sc_lsh_pairs
        ),
        s AS MATERIALIZED (SELECT doc_id, {_D_SHINGLES} AS sh FROM documents
              WHERE doc_id IN (SELECT d FROM involved)),
        sigs AS MATERIALIZED (SELECT doc_id, {mh} FROM s),
        b AS ({bands}),
        f AS (SELECT * FROM b WHERE sig IS NOT NULL AND sig <> ''),
        shared AS (
            SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
            FROM f x JOIN f y ON x.band = y.band AND x.sig = y.sig
             AND x.doc_id < y.doc_id
        )
        SELECT count(*) FROM sc_lsh_pairs p
        LEFT JOIN shared s ON s.a = p.doc_id_a AND s.b = p.doc_id_b
        WHERE s.a IS NULL
        """
    ).fetchone()[0]
    # COMPLETENESS (exact within a 1/16 seeded subset): the pair
    # predicate is purely pairwise, so the subset oracle must equal
    # the Spark output restricted to both-endpoints-in-subset
    pred = _doc_subset_pred(_BLOCKS_1HEX)
    sub = set(
        cur.execute(
            f"""
            WITH s AS MATERIALIZED (SELECT doc_id, {_D_SHINGLES} AS sh FROM documents
                       WHERE {pred}),
            sigs AS MATERIALIZED (SELECT doc_id, {mh} FROM s),
            b AS ({bands}),
            f AS (SELECT * FROM b WHERE sig IS NOT NULL AND sig <> '')
            SELECT DISTINCT x.doc_id, y.doc_id FROM f x JOIN f y
              ON x.band = y.band AND x.sig = y.sig
             AND x.doc_id < y.doc_id
            """
        ).fetchall()
    )
    got_sub = set(
        cur.execute(
            f"SELECT doc_id_a, doc_id_b FROM sc_lsh_pairs "
            f"WHERE {_doc_subset_pred(_BLOCKS_1HEX, 'doc_id_a')} "
            f"AND {_doc_subset_pred(_BLOCKS_1HEX, 'doc_id_b')}"
        ).fetchall()
    )
    dups = cur.execute(
        "SELECT count(*) - count(DISTINCT (doc_id_a, doc_id_b)) "
        "FROM sc_lsh_pairs"
    ).fetchone()[0]
    ordered = cur.execute(
        "SELECT count(*) FROM sc_lsh_pairs WHERE doc_id_a >= doc_id_b"
    ).fetchone()[0]
    return {
        "checks": {
            "pairs_sound": unsound == 0,
            "subset_complete_exact": sub == got_sub,
            "no_dup_pairs": dups == 0,
            "ordered_a_lt_b": ordered == 0,
        },
        "notes": {"n_pairs": len(got_sub), "n_subset_oracle": len(sub)},
    }


def _jaccard_pair_checks(
    ctx,
    pair_view: str,
    threshold: float,
    score_col: str | None,
    rounded: bool = True,
) -> dict:
    """Shared soundness + subset-completeness for exact-Jaccard pair
    frames (columns doc_id_a, doc_id_b[, jaccard]). ``rounded``: the
    frame's score column is round(j, 4) (registered query contract)
    vs the raw double (internal pair exports — both engines divide
    the same two integers, so the doubles compare exactly)."""
    cur = ctx.cur
    score_sql = (
        "len(list_intersect(a.sh, b.sh)) * 1.0 / "
        "(len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh)))"
    )
    score_cmp = f"round(j, 4)" if rounded else "j"
    # soundness: recompute jaccard for every emitted pair (linear)
    q = f"""
        WITH involved AS (
            SELECT doc_id_a AS d FROM {pair_view}
            UNION SELECT doc_id_b FROM {pair_view}
        ),
        s AS MATERIALIZED (SELECT doc_id, list_distinct({_D_SHINGLES}) AS sh
              FROM documents WHERE doc_id IN (SELECT d FROM involved)),
        r AS (
            SELECT p.doc_id_a, p.doc_id_b,
                   {score_sql} AS j
                   {', p.' + score_col if score_col else ''}
            FROM {pair_view} p
            JOIN s a ON a.doc_id = p.doc_id_a
            JOIN s b ON b.doc_id = p.doc_id_b
        )
        SELECT
          count(*) FILTER (WHERE j < {threshold}) AS below,
          count(*) FILTER (
            WHERE {f'abs({score_cmp} - {score_col}) > 1e-12'
                   if score_col else 'FALSE'}) AS wrong_score
        FROM r
    """
    below, wrong_score = cur.execute(q).fetchone()
    # completeness: brute-force within the seeded 2-hex block union
    pred = _doc_subset_pred(_BLOCKS_2HEX)
    sub = set(
        cur.execute(
            f"""
            WITH s AS (SELECT doc_id, list_distinct({_D_SHINGLES}) AS sh
                       FROM documents WHERE {pred}),
            ne AS (SELECT * FROM s WHERE len(sh) > 0)
            SELECT a.doc_id, b.doc_id
            FROM ne a JOIN ne b ON a.doc_id < b.doc_id
            WHERE {score_sql} >= {threshold}
            """
        ).fetchall()
    )
    got_sub = set(
        cur.execute(
            f"SELECT doc_id_a, doc_id_b FROM {pair_view} "
            f"WHERE {_doc_subset_pred(_BLOCKS_2HEX, 'doc_id_a')} "
            f"AND {_doc_subset_pred(_BLOCKS_2HEX, 'doc_id_b')}"
        ).fetchall()
    )
    return {
        "pairs_sound_threshold": below == 0,
        "scores_exact": wrong_score == 0,
        "subset_complete_exact": sub == got_sub,
    }


@_check("prefix_jaccard_pairs")
def check_prefix_jaccard_pairs(ctx) -> dict:
    from pyspark.sql import functions as F

    from covid19_etl_pipeline_spark.catalog import load_table
    from covid19_etl_pipeline_spark.operators import dedup as _dedup
    from covid19_etl_pipeline_spark.plans._shared import adaptive_blk_width

    ctx.export(ctx.sdf, "sc_pj_pairs")
    checks = _jaccard_pair_checks(ctx, "sc_pj_pairs", 0.6, "jaccard")
    # cross-check vs the independently oracle-verified BLOCKED exact
    # jaccard construction: every (source, blk)-cohabiting pair at
    # j >= 0.6 must be in the prefix-filtered output. Restricted to
    # the deterministic 1/16 of blocks whose id starts with '7' —
    # exact within the sample, and an INDEPENDENT sample from the
    # _BLOCKS_2HEX universe the DuckDB completeness leg brute-forces.
    # The unrestricted form re-ran the full ngram_jaccard_pairs query
    # (~80 s of this check's 92 s solo wall at ×10, dominating the
    # sweep entry); the sampled form keeps the cross-engine
    # completeness claim at ~1/16 the pair volume.
    docs = load_table(ctx.spark, ctx.sf_dir, "documents")
    blk_w = adaptive_blk_width(docs.count())
    a = docs.select(
        "doc_id",
        "source",
        F.substring(
            F.md5(F.col("doc_id").cast("string")), 1, blk_w
        ).alias("blk"),
    ).filter(F.col("blk").startswith("7"))
    cand = (
        a.alias("a")
        .join(a.alias("b"), on=["source", "blk"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
        )
    )
    ngram = _dedup.jaccard_pairs(docs, "doc_id", candidates=cand)
    sample = ngram.filter(
        F.col("jaccard").isNotNull() & (F.col("jaccard") >= 0.6)
    ).select("doc_id_a", "doc_id_b")
    ctx.export(sample, "sc_ngram_06")
    missed, n_sample = ctx.cur.execute(
        "SELECT count(*) FILTER (WHERE NOT EXISTS ("
        "SELECT 1 FROM sc_pj_pairs p WHERE p.doc_id_a = n.doc_id_a "
        "AND p.doc_id_b = n.doc_id_b)), count(*) FROM sc_ngram_06 n"
    ).fetchone()
    checks["contains_blocked_exact_pairs"] = missed == 0
    return {"checks": checks, "notes": {"n_blocked_sample_pairs": n_sample}}


@_check("containment_doc_pairs")
def check_containment_doc_pairs(ctx) -> dict:
    cur = ctx.cur
    ctx.export(ctx.sdf, "sc_cont_pairs")
    score_sql = "len(list_intersect(a.sh, b.sh)) * 1.0 / len(a.sh)"
    below, wrong = cur.execute(
        f"""
        WITH involved AS (
            SELECT id_inner AS d FROM sc_cont_pairs
            UNION SELECT id_outer FROM sc_cont_pairs
        ),
        s AS MATERIALIZED (SELECT doc_id, list_distinct({_D_SHINGLES}) AS sh
              FROM documents WHERE doc_id IN (SELECT d FROM involved)),
        r AS (
            SELECT {score_sql} AS c, p.containment
            FROM sc_cont_pairs p
            JOIN s a ON a.doc_id = p.id_inner
            JOIN s b ON b.doc_id = p.id_outer
        )
        SELECT count(*) FILTER (WHERE c < 0.8),
               count(*) FILTER (WHERE abs(round(c, 4) - containment) > 1e-12)
        FROM r
        """
    ).fetchone()
    pred = _doc_subset_pred(_BLOCKS_2HEX)
    sub = set(
        cur.execute(
            f"""
            WITH s AS (SELECT doc_id, list_distinct({_D_SHINGLES}) AS sh
                       FROM documents WHERE {pred}),
            ne AS (SELECT * FROM s WHERE len(sh) > 0)
            SELECT a.doc_id, b.doc_id
            FROM ne a JOIN ne b ON a.doc_id <> b.doc_id
            WHERE {score_sql} >= 0.8
            """
        ).fetchall()
    )
    got_sub = set(
        cur.execute(
            f"SELECT id_inner, id_outer FROM sc_cont_pairs "
            f"WHERE {_doc_subset_pred(_BLOCKS_2HEX, 'id_inner')} "
            f"AND {_doc_subset_pred(_BLOCKS_2HEX, 'id_outer')}"
        ).fetchall()
    )
    return {
        "checks": {
            "pairs_sound_threshold": below == 0,
            "scores_exact": wrong == 0,
            "subset_complete_exact": sub == got_sub,
        },
        "notes": {"n_subset_oracle": len(sub)},
    }


# ------------------------------------------------------ composite pipelines


def _export_prefix_pairs(ctx, threshold: float, view: str) -> str:
    """Re-run the Spark prefix-filtered jaccard pair op at ``threshold``
    and export — the composite queries consume this pair stream
    internally without exposing it."""
    from covid19_etl_pipeline_spark.catalog import load_table
    from covid19_etl_pipeline_spark.operators import dedup
    from covid19_etl_pipeline_spark.operators.partitioning import spread

    docs = spread(load_table(ctx.spark, ctx.sf_dir, "documents"), "doc_id")
    pairs = dedup.prefix_filter_jaccard_pairs(
        docs, "doc_id", text_col="text", threshold=threshold
    )
    return ctx.export(
        pairs.select("doc_id_a", "doc_id_b", "jaccard"), view
    )


@_check("neardup_threshold_sweep")
def check_neardup_threshold_sweep(ctx) -> dict:
    cur = ctx.cur
    _export_prefix_pairs(ctx, 0.3, "sc_sweep_pairs")
    checks = _jaccard_pair_checks(
        ctx, "sc_sweep_pairs", 0.3, "jaccard", rounded=False
    )
    # the 6-row rollup recomputed in DuckDB from the verified pairs
    expected = {
        r[0]: (r[1], r[2])
        for r in cur.execute(
            """
            SELECT thr, count(*), count(DISTINCT doc_id_b)
            FROM sc_sweep_pairs,
                 (SELECT CAST(unnest([0.3,0.4,0.5,0.6,0.7,0.8]) AS DOUBLE)
                     AS thr) t
            WHERE jaccard >= thr GROUP BY thr
            """
        ).fetchall()
    }
    got = {
        r["threshold"]: (r["n_pairs"], r["removable_docs_upper"])
        for r in ctx.sdf.collect()
    }
    checks["rollup_exact_from_pairs"] = got == expected
    return {"checks": checks, "notes": {"thresholds": len(got)}}


@_check("cross_source_dup_flow")
def check_cross_source_dup_flow(ctx) -> dict:
    cur = ctx.cur
    _export_prefix_pairs(ctx, 0.5, "sc_flow_pairs")
    checks = _jaccard_pair_checks(
        ctx, "sc_flow_pairs", 0.5, "jaccard", rounded=False
    )
    expected = {
        (r[0], r[1]): (r[2], r[3])
        for r in cur.execute(
            """
            SELECT sa.source, sb.source, count(*), sum(sb.n_chars)
            FROM sc_flow_pairs p
            JOIN documents sa ON sa.doc_id = p.doc_id_a
            JOIN documents sb ON sb.doc_id = p.doc_id_b
            GROUP BY sa.source, sb.source
            """
        ).fetchall()
    }
    got = {
        (r["source_kept"], r["source_dropped"]): (
            r["n_pairs"],
            r["dropped_chars"],
        )
        for r in ctx.sdf.collect()
    }
    checks["rollup_exact_from_pairs"] = got == expected
    return {"checks": checks, "notes": {"n_cells": len(got)}}


#: DuckDB twins of text.normalized_text / token_count — lifted from the
#: training_corpus oracle so the per-row column recompute stays in
#: lockstep with the original twin expressions.
_D_NORM = r"regexp_replace(lower(trim(text)), '\s+', ' ', 'g')"
_D_NTOK = r"len(regexp_split_to_array(trim(text), '\s+'))"
_D_SPLIT = (
    "CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) "
    "BETWEEN '0' AND 'b' THEN 'train' "
    "WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('c','d') "
    "THEN 'val' ELSE 'test' END"
)


def _lsh_pairs_on(ctx, df, view: str, distinct=True) -> str:
    from covid19_etl_pipeline_spark.operators import dedup

    pairs = dedup.lsh_candidate_pairs(df, "doc_id", "text", distinct=distinct)
    return ctx.export(pairs.select("doc_id_a", "doc_id_b"), view)


@_check("training_corpus")
def check_training_corpus(ctx) -> dict:
    from covid19_etl_pipeline_spark.catalog import load_table
    from covid19_etl_pipeline_spark.operators import dedup
    from covid19_etl_pipeline_spark.operators import text as text_ops
    from pyspark.sql import functions as F

    cur = ctx.cur
    ctx.export(ctx.sdf, "sc_corpus")
    # per-row derived columns recomputed linearly in DuckDB
    col_bad = cur.execute(
        f"""
        SELECT count(*) FROM sc_corpus c JOIN documents d USING (doc_id)
        WHERE c.fingerprint <> md5({_D_NORM})
           OR c.n_tokens <> {_D_NTOK}
           OR c.split <> {_D_SPLIT}
           OR c.lang <> d.lang
           OR {_D_NTOK} < 5
        """
    ).fetchone()[0]
    # exact-dedup stage recomputed exactly (linear): qualifying docs,
    # min doc_id per normalized-text fingerprint
    ex_surv = {
        r[0]
        for r in cur.execute(
            f"""
            SELECT min(doc_id) FROM documents
            WHERE {_D_NTOK} >= 5 GROUP BY md5({_D_NORM})
            """
        ).fetchall()
    }
    # near-dup stage: union-find over the SAME pair stream the query
    # consumes (LSH banding over exact-dedup survivors)
    qual = load_table(ctx.spark, ctx.sf_dir, "documents").withColumn(
        "__ntext", text_ops.normalized_text("text")
    ).filter(text_ops.token_count("text") >= 5)
    docs1 = dedup.drop_exact_dups(qual, "doc_id", "__ntext").localCheckpoint(
        eager=False
    )
    pairs = dedup.lsh_candidate_pairs(
        docs1, "doc_id", "text", distinct=False
    )
    edges = [
        (r["doc_id_a"], r["doc_id_b"])
        for r in pairs.select("doc_id_a", "doc_id_b").distinct().collect()
    ]
    labels = union_find_labels(edges)
    near_dropped = {n for n, lab in labels.items() if n != lab}
    expected = ex_surv - near_dropped
    got = {r["doc_id"] for r in ctx.sdf.select("doc_id").collect()}
    # the LSH pair stream itself: spot soundness via the lsh check's
    # machinery is covered by lsh_candidate_pairs' own tiered check —
    # the band predicate here is identical code
    return {
        "checks": {
            "derived_columns_exact": col_bad == 0,
            "survivor_set_exact": got == expected,
        },
        "notes": {
            "n_exact_survivors": len(ex_surv),
            "n_near_dropped": len(near_dropped),
            "n_out": len(got),
        },
    }


@_check("leakage_safe_split")
def check_leakage_safe_split(ctx) -> dict:
    from covid19_etl_pipeline_spark.catalog import load_table

    cur = ctx.cur
    ctx.export(ctx.sdf, "sc_split")
    docs = load_table(ctx.spark, ctx.sf_dir, "documents")
    _lsh_pairs_on(ctx, docs, "sc_split_pairs")
    edges = cur.execute(
        "SELECT doc_id_a, doc_id_b FROM sc_split_pairs"
    ).fetchall()
    labels = union_find_labels(edges)
    # expected cluster_id: min-label for clustered docs, self otherwise
    exp_rows = cur.execute("SELECT doc_id FROM documents").fetchall()
    expected = {d: labels.get(d, d) for (d,) in exp_rows}
    got = {
        r["doc_id"]: r["cluster_id"] for r in ctx.sdf.collect()
    }
    # THE leakage-safety property: no LSH pair straddles two splits
    straddle = cur.execute(
        """
        SELECT count(*) FROM sc_split_pairs p
        JOIN sc_split a ON a.doc_id = p.doc_id_a
        JOIN sc_split b ON b.doc_id = p.doc_id_b
        WHERE a.split <> b.split OR a.cluster_id <> b.cluster_id
        """
    ).fetchone()[0]
    # split column = hex rule of cluster_id (linear recompute)
    split_bad = cur.execute(
        """
        SELECT count(*) FROM sc_split
        WHERE split <> CASE
            WHEN substr(md5(CAST(cluster_id AS VARCHAR)), 1, 1)
                 BETWEEN '0' AND 'b' THEN 'train'
            WHEN substr(md5(CAST(cluster_id AS VARCHAR)), 1, 1)
                 IN ('c','d') THEN 'val' ELSE 'test' END
        """
    ).fetchone()[0]
    return {
        "checks": {
            "cluster_ids_exact": got == expected,
            "no_pair_straddles_splits": straddle == 0,
            "split_rule_exact": split_bad == 0,
            "row_count_is_corpus": len(got) == len(expected),
        },
        "notes": {"n_edges": len(edges)},
    }


@_check("incremental_corpus_dedup")
def check_incremental_corpus_dedup(ctx) -> dict:
    from covid19_etl_pipeline_spark.catalog import load_table
    from covid19_etl_pipeline_spark.operators import dedup

    cur = ctx.cur
    ctx.export(ctx.sdf, "sc_incr")
    # exact stage recomputed EXACTLY in DuckDB (linear md5 joins —
    # the oracle's exdup CTE without the near stage)
    exact_bad = cur.execute(
        """
        WITH newdocs AS (SELECT doc_id, md5(text) AS fp FROM documents
                         WHERE doc_id % 5 = 0),
        oldfp AS (SELECT DISTINCT md5(text) AS fp FROM documents
                  WHERE doc_id % 5 <> 0),
        exdup AS (
            SELECT n.doc_id FROM newdocs n JOIN oldfp o ON n.fp = o.fp
            UNION
            SELECT n.doc_id FROM newdocs n
            JOIN newdocs m ON n.fp = m.fp AND m.doc_id < n.doc_id
        )
        SELECT count(*) FROM sc_incr s
        WHERE (s.status = 'exact_dup')
              <> (s.doc_id IN (SELECT doc_id FROM exdup))
        """
    ).fetchone()[0]
    # near stage: the band table over the full corpus via the SAME
    # Spark operator the query uses, exported; near statuses follow
    # from band-sig joins over that export (linear equi-joins in
    # DuckDB — the piece DuckDB cannot afford is only the minhash
    # list-fold over 50k+ docs)
    docs = load_table(ctx.spark, ctx.sf_dir, "documents")
    bands = dedup.lsh_band_table(docs, "doc_id", "text")
    ctx.export(bands.select("doc_id", "band", "sig"), "sc_incr_bands")
    # soundness of the band export on a seeded 1/16 subset: recompute
    # sigs in DuckDB and compare exactly
    mh = ", ".join(f"{_d_minhash(i)} AS m{i}" for i in range(8))
    pred = _doc_subset_pred(_BLOCKS_1HEX)
    band_diff = cur.execute(
        f"""
        WITH s AS MATERIALIZED (SELECT doc_id, {_D_SHINGLES} AS sh FROM documents
                   WHERE {pred}),
        sigs AS MATERIALIZED (SELECT doc_id, {mh} FROM s),
        b AS (
            SELECT doc_id, 0 AS band, concat_ws('|', m0, m1) AS sig FROM sigs
            UNION ALL SELECT doc_id, 1, concat_ws('|', m2, m3) FROM sigs
            UNION ALL SELECT doc_id, 2, concat_ws('|', m4, m5) FROM sigs
            UNION ALL SELECT doc_id, 3, concat_ws('|', m6, m7) FROM sigs
        ),
        f AS (SELECT * FROM b WHERE sig IS NOT NULL AND sig <> ''),
        x AS (SELECT * FROM sc_incr_bands WHERE {pred})
        SELECT (SELECT count(*) FROM (SELECT * FROM f EXCEPT SELECT * FROM x))
             + (SELECT count(*) FROM (SELECT * FROM x EXCEPT SELECT * FROM f))
        """
    ).fetchone()[0]
    near_bad = cur.execute(
        """
        WITH exsurv AS (
            SELECT doc_id FROM sc_incr WHERE status <> 'exact_dup'
        ),
        near AS (
            SELECT DISTINCT a.doc_id
            FROM sc_incr_bands a
            JOIN exsurv s ON a.doc_id = s.doc_id
            JOIN sc_incr_bands b ON a.band = b.band AND a.sig = b.sig
                                AND a.doc_id <> b.doc_id
            WHERE b.doc_id % 5 <> 0
               OR (b.doc_id < a.doc_id
                   AND b.doc_id IN (SELECT doc_id FROM exsurv))
        )
        SELECT count(*) FROM sc_incr s
        WHERE s.status <> 'exact_dup'
          AND (s.status = 'near_dup')
              <> (s.doc_id IN (SELECT doc_id FROM near))
        """
    ).fetchone()[0]
    n_new = cur.execute(
        "SELECT count(*) FROM documents WHERE doc_id % 5 = 0"
    ).fetchone()[0]
    return {
        "checks": {
            "exact_stage_exact": exact_bad == 0,
            "band_table_subset_exact": band_diff == 0,
            "near_stage_exact_from_bands": near_bad == 0,
            "covers_every_new_doc": ctx.sdf.count() == n_new,
        },
        "notes": {},
    }


# --------------------------------------------------------- mutual-NN family

_NN_SCAN = """
    SELECT c.vec_id AS nn, round(
        list_dot_product(q.v, c.v)
        / (sqrt(list_dot_product(q.v, q.v))
           * sqrt(list_dot_product(c.v, c.v))), 6) AS sim
    FROM c JOIN q ON c.vec_id <> q.vec_id
    ORDER BY list_dot_product(q.v, c.v)
             / (sqrt(list_dot_product(q.v, q.v))
                * sqrt(list_dot_product(c.v, c.v))) DESC, c.vec_id
    LIMIT 1
"""


def _true_nn(cur, vec_id) -> tuple:
    """(nn_id, sim_rounded6) by a full-corpus scan — linear per call,
    tie-break (sim DESC, id ASC) mirrors the kernel contract."""
    row = cur.execute(
        f"""
        WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                   FROM embeddings),
        q AS (SELECT vec_id, v FROM c WHERE vec_id = {vec_id})
        {_NN_SCAN}
        """
    ).fetchone()
    return row


@_check("mutual_nearest_embeddings")
def check_mutual_nearest_embeddings(ctx) -> dict:
    cur = ctx.cur
    ctx.export(ctx.sdf, "sc_mutual")
    # global soundness: every output pair's cosine recomputed (linear)
    wrong_sim = cur.execute(
        """
        WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
                   FROM embeddings)
        SELECT count(*) FROM sc_mutual m
        JOIN c a ON a.vec_id = m.vec_a JOIN c b ON b.vec_id = m.vec_b
        WHERE abs(round(list_dot_product(a.v, b.v)
              / (sqrt(list_dot_product(a.v, a.v))
                 * sqrt(list_dot_product(b.v, b.v))), 6)
              - m.cosine_sim) > 1e-12
        """
    ).fetchone()[0]
    ordered = cur.execute(
        "SELECT count(*) FROM sc_mutual WHERE vec_a >= vec_b"
    ).fetchone()[0]
    # each id participates in at most one mutual pair
    multi = cur.execute(
        """
        SELECT count(*) FROM (
            SELECT id FROM (
                SELECT vec_a AS id FROM sc_mutual
                UNION ALL SELECT vec_b FROM sc_mutual
            ) GROUP BY id HAVING count(*) > 1)
        """
    ).fetchone()[0]
    # seeded sample: true-NN scans decide mutual membership exactly
    sample = [
        r[0]
        for r in cur.execute(
            "SELECT vec_id FROM embeddings "
            "ORDER BY md5('nnseed' || CAST(vec_id AS VARCHAR)) LIMIT 60"
        ).fetchall()
    ]
    out_pairs = {
        (r[0], r[1])
        for r in cur.execute("SELECT vec_a, vec_b FROM sc_mutual").fetchall()
    }
    sample_bad = 0
    for q in sample:
        nn, _ = _true_nn(cur, q)
        nn2, _ = _true_nn(cur, nn)
        is_mutual = nn2 == q
        pair = (min(q, nn), max(q, nn))
        if is_mutual != (pair in out_pairs):
            sample_bad += 1
    return {
        "checks": {
            "cosines_exact": wrong_sim == 0,
            "ordered_a_lt_b": ordered == 0,
            "one_pair_per_id": multi == 0,
            "sampled_mutuality_exact": sample_bad == 0,
        },
        "notes": {"n_sampled": len(sample), "n_pairs": len(out_pairs)},
    }


@_check("mutual_nn_ivf_recall")
def check_mutual_nn_ivf_recall(ctx) -> dict:
    from pyspark.sql import functions as F  # noqa: F401

    from covid19_etl_pipeline_spark.plans.embedding import (
        _ivf_mutual_pairs,
        mutual_nearest_embeddings,
    )

    cur = ctx.cur
    exact = mutual_nearest_embeddings(ctx.spark, ctx.sf_dir).select(
        "vec_a", "vec_b"
    )
    ctx.export(exact, "sc_rec_exact")
    got = {r["probes"]: r for r in ctx.sdf.collect()}
    checks = {}
    for p in (1, 3):
        ivf = _ivf_mutual_pairs(ctx.spark, ctx.sf_dir, p).select(
            "vec_a", "vec_b"
        )
        ctx.export(ivf, f"sc_rec_ivf{p}")
        n_exact, n_ivf, n_cap = cur.execute(
            f"""
            SELECT (SELECT count(*) FROM sc_rec_exact),
                   (SELECT count(*) FROM sc_rec_ivf{p}),
                   (SELECT count(*) FROM sc_rec_exact e
                    JOIN sc_rec_ivf{p} i
                      ON e.vec_a = i.vec_a AND e.vec_b = i.vec_b)
            """
        ).fetchone()
        r = got.get(p)

        def _ratio_ok(val, num, den):
            # query contract: NULL when the denominator is zero
            if den == 0:
                return val is None
            return val is not None and abs(val - round(num / den, 4)) < 1e-12

        arith_ok = r is not None and (
            r["n_exact_pairs"] == n_exact
            and r["n_ivf_pairs"] == n_ivf
            and r["n_captured"] == n_cap
            and _ratio_ok(r["recall"], n_cap, n_exact)
            and _ratio_ok(r["precision_"], n_cap, n_ivf)
        )
        checks[f"counts_and_ratios_exact_p{p}"] = bool(arith_ok)
        checks[f"captured_le_both_p{p}"] = n_cap <= min(n_exact, n_ivf)
        checks[f"ratios_in_unit_interval_p{p}"] = r is not None and all(
            v is None or 0 <= v <= 1 for v in (r["recall"], r["precision_"])
        )
    # note: the IVF pair sets' cell-restricted NN semantics are
    # Spark-side re-derivations (centroid pipeline); their cosine
    # soundness is covered by mutual_nearest_embeddings' check and the
    # exact set is sample-verified there.
    return {"checks": checks, "notes": {}}


@_check("lsh_banding_recall")
def check_lsh_banding_recall(ctx) -> dict:
    """Truth pairs are (source, tblk)-block-local, so truth AND its
    banding capture are recomputed EXACTLY on a seeded sub-block in
    both engines; the global 1-row output gets arithmetic invariants.
    """
    from covid19_etl_pipeline_spark.catalog import load_table
    from covid19_etl_pipeline_spark.operators import dedup
    from covid19_etl_pipeline_spark.operators import text as text_ops
    from pyspark.sql import functions as F

    cur = ctx.cur
    docs_n = cur.execute("SELECT count(*) FROM documents").fetchone()[0]
    tblk_w = adaptive_blk_width(docs_n) - 1
    # seeded sub-block: tblk prefix '7' plus a 1/4 second-char slice to
    # keep the brute-force quadratic bounded (~800 docs at ×10)
    sub_pred = (
        f"substr(md5(CAST(doc_id AS VARCHAR)), 1, {tblk_w}) = '7' AND "
        "substr(md5(CAST(doc_id AS VARCHAR)), "
        f"{tblk_w + 1}, 1) IN ('0','1','2','3')"
        if tblk_w > 0
        else "substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) IN "
        "('0a','3c','7e','b1')"
    )
    mh = ", ".join(f"{_d_minhash(i)} AS m{i}" for i in range(8))
    truth_cap = cur.execute(
        f"""
        WITH s AS (
            SELECT doc_id, source, list_distinct({_D_SHINGLES}) AS shd,
                   {_D_SHINGLES} AS sh
            FROM documents WHERE {sub_pred}
        ),
        sigs AS MATERIALIZED (SELECT doc_id, {mh} FROM s),
        b AS (
            SELECT doc_id, 0 AS band, concat_ws('|', m0, m1) AS sig FROM sigs
            UNION ALL SELECT doc_id, 1, concat_ws('|', m2, m3) FROM sigs
            UNION ALL SELECT doc_id, 2, concat_ws('|', m4, m5) FROM sigs
            UNION ALL SELECT doc_id, 3, concat_ws('|', m6, m7) FROM sigs
        ),
        f AS (SELECT * FROM b WHERE sig IS NOT NULL AND sig <> ''),
        truth AS (
            SELECT a.doc_id AS da, b.doc_id AS db
            FROM s a JOIN s b
              ON a.source = b.source AND a.doc_id < b.doc_id
            WHERE len(list_distinct(list_cat(a.shd, b.shd))) > 0
              AND len(list_intersect(a.shd, b.shd)) * 1.0
                  / len(list_distinct(list_cat(a.shd, b.shd))) >= 0.5
        ),
        shared AS (
            SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
            FROM f x JOIN f y ON x.band = y.band AND x.sig = y.sig
             AND x.doc_id < y.doc_id
        )
        SELECT count(*), count(sh.a)
        FROM truth
        LEFT JOIN shared sh ON sh.a = truth.da AND sh.b = truth.db
        """
    ).fetchone()
    # Spark recomputes the same sub-block slice through the SAME
    # operators the full query uses
    docs = load_table(ctx.spark, ctx.sf_dir, "documents").filter(
        F.expr(
            sub_pred.replace(
                "md5(CAST(doc_id AS VARCHAR))",
                "md5(CAST(doc_id AS STRING))",
            )
        )
    )
    sets = docs.select(
        "doc_id",
        "source",
        F.array_distinct(
            text_ops.shingles(text_ops.tokens("text"))
        ).alias("shd"),
    )
    a = sets.select(
        F.col("doc_id").alias("doc_id_a"), "source",
        F.col("shd").alias("sh_a"),
    )
    b = sets.select(
        F.col("doc_id").alias("doc_id_b"), "source",
        F.col("shd").alias("sh_b"),
    )
    union_sz = F.size(F.array_union("sh_a", "sh_b"))
    jac = F.when(
        union_sz > 0, F.size(F.array_intersect("sh_a", "sh_b")) / union_sz
    )
    truth_sp = (
        a.join(b, on=["source"])
        .filter(F.col("doc_id_a") < F.col("doc_id_b"))
        .filter(jac >= 0.5)
        .select("doc_id_a", "doc_id_b")
    )
    cand_sp = dedup.lsh_candidate_pairs(docs, "doc_id", "text")
    cap_sp = truth_sp.join(
        cand_sp, ["doc_id_a", "doc_id_b"], "left_semi"
    ).count()
    truth_sp_n = truth_sp.count()
    out = ctx.sdf.collect()[0]
    arith = (
        out["n_captured"] <= out["n_true_pairs"]
        and (
            out["recall"] is None
            if out["n_true_pairs"] == 0
            else abs(
                out["recall"]
                - round(out["n_captured"] / out["n_true_pairs"], 4)
            )
            < 1e-12
        )
    )
    return {
        "checks": {
            "subblock_truth_exact": truth_sp_n == truth_cap[0],
            "subblock_capture_exact": cap_sp == truth_cap[1],
            "global_arithmetic_consistent": bool(arith),
        },
        "notes": {
            "subblock_truth": truth_cap[0],
            "subblock_captured": truth_cap[1],
        },
    }


# ------------------------------------------ spark-only invariants (×100)

#: columns whose values must sit in [0, 1] wherever they appear
_UNIT_COLS = {
    "recall",
    "precision_",
    "jaccard",
    "containment",
    "novel_frac",
    "contamination",
    "pad_waste_frac",
    "stopword_ratio",
    "alpha_ratio",
    "dup_line_frac",
    "train_frac",
    "quality_score",
    "dup_fraction",
    "dup_token_fraction",
    "exact_dup_frac",
    "kept_token_fraction",
    "mrr_at_10",
    "precision_at_10",
    "recall_at_10",
    "source_pct",
    "source_pctl",
    "mixture_weight",
    "transition_p",
}
#: columns bounded to [-1, 1] (cosines)
_COSINE_COLS = {"cosine_sim", "sim", "max_cosine", "mean_cosine"}
#: (a, b) column pairs that must satisfy a < b and contain no
#: duplicate (a, b) rows
_PAIR_KEYS = [
    ("doc_id_a", "doc_id_b"),
    ("vec_id_a", "vec_id_b"),
    ("part_a", "part_b"),
    ("vec_a", "vec_b"),
    ("a_partkey", "b_partkey"),
    ("name_a", "name_b"),
]


def spark_only_invariants(sdf, name=None) -> tuple[int, dict, dict]:
    """Value invariants for ``--spark-only`` fixtures past every
    oracle's reach (VERDICT r08 #3): schema-driven self-checks folded
    into ONE aggregate pass (which also supplies the row count, so
    this costs no extra action over the plain count), plus — for pair
    frames — an EXACT duplicate-pair check on one hashed 1/256 bucket
    (duplicates of a pair always land in the same bucket, so the
    sampled check has no false negatives within its bucket).

    The same pass folds in the agghash canonical row-hash SUM over
    EVERY column (VERDICT r09 #6): Catalyst cannot prune a column the
    hash consumes, so "pass" can never again mean "a count()-pruned
    skeleton executed" (the r09 ×100 lesson — two queries' budgets
    were flattered by plans whose expensive measures the optimizer
    had deleted). The (count, hash_sum) pair is recorded in the
    artifact so later rounds diff values, not just row counts, on the
    deterministic fixtures.

    Returns (row_count, {invariant_name: bool}, notes).
    """
    from pyspark.sql import functions as F

    notes = {}
    # xxhash64 over EVERY column, not agghash's md5-canonical-string:
    # there is no second engine in spark-only mode, so the hash only
    # needs to (a) reference every column — unprunable — and (b) be
    # deterministic for cross-round diffs. The codegen-native hash is
    # ~10x cheaper than concat-canonicalize-md5-conv: on the 4.52B-row
    # fuzzy pair frame the md5 form cost 1025s for the whole pass, the
    # xxhash64 form fits the same pass in the budget.
    #
    # Float columns are rounded to 9dp BEFORE hashing (the sweep's own
    # _canon convention): a raw-double hash flips on 1-ulp
    # partition-order summation jitter in unrounded columns, which
    # would false-alarm a cross-round value diff (r10 ADVICE). Hashes
    # recorded from r11 on are the comparison baseline; r10's raw
    # hashes are not comparable for float-bearing queries.
    from pyspark.sql import types as T

    def _hashable(field, col):
        if isinstance(field.dataType, (T.DoubleType, T.FloatType)):
            return F.round(col, 9)
        if isinstance(field.dataType, T.ArrayType) and isinstance(
            field.dataType.elementType, (T.DoubleType, T.FloatType)
        ):
            return F.transform(col, lambda x: F.round(x, 9))
        return col

    hash_col = (
        F.coalesce(
            F.sum(
                F.xxhash64(
                    *[_hashable(f, F.col(f.name)) for f in sdf.schema.fields]
                ).cast("decimal(20,0)")
            ),
            F.lit(0).cast("decimal(20,0)"),
        ).alias("__hsum")
    )
    cols = set(sdf.columns)
    aggs = [F.count(F.lit(1)).alias("__n")]
    names = []

    def viol(name, cond):
        aggs.append(
            F.coalesce(
                F.sum(F.when(cond, 1).otherwise(0)), F.lit(0)
            ).alias(f"__v{len(names)}")
        )
        names.append(name)

    eps = 1e-9
    for c in cols & _UNIT_COLS:
        col = F.col(c)
        viol(f"{c}_in_unit_interval", col.isNotNull() & ((col < -eps) | (col > 1 + eps)))
    for c in cols & _COSINE_COLS:
        col = F.col(c)
        viol(f"{c}_in_cosine_range", col.isNotNull() & ((col < -1 - eps) | (col > 1 + eps)))
    pair_key = next((p for p in _PAIR_KEYS if set(p) <= cols), None)
    if pair_key:
        a, b = pair_key
        viol("pair_ordered_a_lt_b", F.col(a) >= F.col(b))
    for c in cols:
        if c.startswith("n_") or c.endswith(("_count", "_pairs", "_docs")):
            f = sdf.schema[c].dataType.typeName()
            if f in ("long", "integer", "short", "double", "float"):
                viol(f"{c}_nonnegative", F.col(c) < 0)
    if name is not None and name in SPARK_ONLY_COND_EXTRA:
        # per-query conditions folded into the SAME pass — a separate
        # extra action re-executes the whole plan, which at the ×100
        # pair frames (4.52B rows) is the difference between one
        # 900 s budget and three
        for inv_name, cond in SPARK_ONLY_COND_EXTRA[name](F):
            viol(inv_name, cond)

    if hash_col is not None:
        aggs.append(hash_col)
    if pair_key:
        # exact duplicate-pair check on one content-hashed bucket,
        # IN the same pass: a duplicated (a, b) collides into its
        # xxhash64%256 bucket, so bucket_rows == distinct bucket pairs
        # proves the sample clean. Spark plans the single countDistinct
        # as a two-stage partial-distinct aggregate (no Expand), so the
        # expensive pair production still runs exactly once — folding
        # this saved a full second execution of every pair plan
        # (fuzzy_part_duplicates ×100: 3 × >900 s → one pass).
        a, b = pair_key
        in_bucket = F.pmod(F.xxhash64(F.col(a), F.col(b)), F.lit(256)) == 17
        aggs.append(
            F.coalesce(
                F.sum(F.when(in_bucket, 1).otherwise(0)), F.lit(0)
            ).alias("__bucket_n")
        )
        aggs.append(
            F.countDistinct(
                F.when(in_bucket, F.struct(F.col(a), F.col(b)))
            ).alias("__bucket_d")
        )
    row = sdf.agg(*aggs).collect()[0]
    n = row["__n"]
    if hash_col is not None:
        notes["value_hash"] = str(int(row["__hsum"]))
    out = {nm: row[f"__v{i}"] == 0 for i, nm in enumerate(names)}
    if pair_key:
        out["no_dup_pairs_sampled_bucket"] = (
            row["__bucket_n"] == row["__bucket_d"]
        )
    return n, out, notes


def _subset_of_table(spark, sf_dir, sdf, id_col, table):
    """True iff every sdf id exists in the base table (anti-join)."""
    from covid19_etl_pipeline_spark.catalog import load_table
    from pyspark.sql import functions as F  # noqa: F401

    base = load_table(spark, sf_dir, table).select(id_col)
    return sdf.select(id_col).join(base, id_col, "left_anti").limit(1).count() == 0


def _extra_survivor_family(id_col, table):
    def fn(spark, sf_dir, sdf):
        return {f"survivors_subset_of_{table}": _subset_of_table(
            spark, sf_dir, sdf, id_col, table
        )}

    return fn


def _extra_dup_clusters(spark, sf_dir, sdf):
    from pyspark.sql import functions as F

    row = sdf.agg(
        F.sum((F.col("cluster_id") > F.col("vec_id")).cast("int")).alias("a"),
        F.sum((F.col("cluster_size") < 2).cast("int")).alias("b"),
    ).collect()[0]
    return {
        "cluster_id_is_min_le_member": (row["a"] or 0) == 0,
        "cluster_size_ge_2": (row["b"] or 0) == 0,
    }


def _extra_leakage_split(spark, sf_dir, sdf):
    from pyspark.sql import functions as F

    row = sdf.agg(
        F.sum(
            (~F.col("split").isin("train", "val", "test")).cast("int")
        ).alias("a"),
        F.sum((F.col("cluster_id") > F.col("doc_id")).cast("int")).alias("b"),
    ).collect()[0]
    return {
        "split_values_valid": (row["a"] or 0) == 0,
        "cluster_id_is_min_le_member": (row["b"] or 0) == 0,
    }


def _extra_incremental(spark, sf_dir, sdf):
    from covid19_etl_pipeline_spark.catalog import load_table
    from pyspark.sql import functions as F

    n_new = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 5 == 0)
        .count()
    )
    row = sdf.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            (~F.col("status").isin("exact_dup", "near_dup", "kept")).cast(
                "int"
            )
        ).alias("bad"),
    ).collect()[0]
    return {
        "status_values_valid": (row["bad"] or 0) == 0,
        "covers_every_new_doc": row["n"] == n_new,
    }


#: per-query violation CONDITIONS folded into spark_only_invariants'
#: single aggregate pass (each receives the functions module, returns
#: [(invariant_name, violation_condition)]) — for frames where a
#: separate extra action would re-execute a multi-hundred-second plan
SPARK_ONLY_COND_EXTRA = {
    "fuzzy_part_duplicates": lambda F: [
        (
            "edit_dist_in_contract_range",
            (F.col("edit_dist") < 0) | (F.col("edit_dist") > 5),
        )
    ],
}


# --- r10 value-bearing invariant battery (VERDICT r09 #6) ----------
# Every ×100 spark-only entry gets at least one check that the engine
# can only pass by COMPUTING THE MEASURES — algebra between the
# result's own columns, conservation against a base table, per-group
# rank contiguity, or an independent pure-Python recompute of a
# sampled hash bucket. A count()-pruned or garbage-valued plan fails
# these; a nonnegative count does not vouch for anything.


def _viol(sdf, pairs):
    """One aggregate pass: {name: True iff its violation count is 0}.
    ``pairs`` is [(invariant_name, violation_condition_column)]."""
    from pyspark.sql import functions as F

    row = sdf.agg(
        *[
            F.coalesce(
                F.sum(F.when(c, 1).otherwise(0)), F.lit(0)
            ).alias(f"__v{i}")
            for i, (_n, c) in enumerate(pairs)
        ]
    ).collect()[0]
    return {n: row[f"__v{i}"] == 0 for i, (n, _c) in enumerate(pairs)}


def _rank_contig(sdf, part_cols, rank_col, base=1):
    """True iff ``rank_col`` is exactly base..base+count-1 within every
    partition — one groupBy pass (min/max/count/countDistinct)."""
    from pyspark.sql import functions as F

    bad = (
        sdf.groupBy(*part_cols)
        .agg(
            F.min(rank_col).alias("mn"),
            F.max(rank_col).alias("mx"),
            F.count("*").alias("n"),
            F.countDistinct(rank_col).alias("nd"),
        )
        .filter(
            (F.col("mn") != base)
            | (F.col("mx") != F.col("n") + (base - 1))
            | (F.col("nd") != F.col("n"))
        )
        .limit(1)
        .count()
    )
    return bad == 0


def _base_count(spark, sf_dir, table, where=None):
    from covid19_etl_pipeline_spark.catalog import load_table

    t = load_table(spark, sf_dir, table)
    if where is not None:
        t = t.filter(where)
    return t.count()


def _scalar(sdf, expr_col, alias="x"):
    return sdf.agg(expr_col.alias(alias)).collect()[0][alias]


# -- pure-Python reference implementations (engine-independent:
#    hashlib.md5 + explicit Java-\s tokenization; catches row mixing,
#    shuffle corruption, and codegen bugs the Spark-vs-Spark compare
#    cannot) --

_JAVA_WS = "[ \\t\\n\\x0b\\f\\r]+"


def _py_tokens(t):
    import re

    return re.split(_JAVA_WS, t.strip())


def _py_shingles(toks, k=3):
    if len(toks) < k:
        return []
    return [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]


def _py_md5(s):
    import hashlib

    return hashlib.md5(s.encode("utf-8")).hexdigest()


def _py_minhash4(text):
    """mh0..mh3 exactly as operators/dedup.minhash_signatures with
    num_hashes=4: one md5 per shingle prefixed '0|', four 8-hex-char
    words, lexicographic min per word."""
    sh = _py_shingles(_py_tokens(text))
    if not sh:
        return (None, None, None, None)
    digs = [_py_md5("0|" + s) for s in sh]
    return tuple(min(d[8 * i : 8 * i + 8] for d in digs) for i in range(4))


def _py_simhash32(text):
    """operators/dedup.simhash bits=32: distinct tokens of normalized
    text, low-60-bit md5 int, per-bit majority vote."""
    import re

    norm = re.sub(_JAVA_WS, " ", text.strip().lower())
    toks = sorted(set(re.split(_JAVA_WS, norm)))
    votes = [0] * 32
    for tok in toks:
        h = int(_py_md5(tok)[:15], 16)
        for b in range(32):
            votes[b] += ((h >> b) & 1) * 2 - 1
    return sum(1 << b for b in range(32) if votes[b] > 0)


def _py_fingerprint(text):
    import re

    return _py_md5(re.sub(_JAVA_WS, " ", text.strip().lower()))


def _py_winnow(text, w=4):
    hv = [_py_md5(s) for s in _py_shingles(_py_tokens(text))]
    if len(hv) < w:
        return (0, None, None)
    fps = []
    for i in range(len(hv) - w + 1):
        m = min(hv[i : i + w])
        if m not in fps:
            fps.append(m)
    return (len(fps), min(fps), max(fps))


def _sample_doc_rows(spark, sf_dir, mod=512, residue=17, cap=48):
    """(doc_id, text) of a deterministic content-hash bucket of the
    documents table, capped to the lowest ids — the shared sample for
    every per-row Python recompute."""
    from covid19_etl_pipeline_spark.catalog import load_table
    from pyspark.sql import functions as F

    return (
        load_table(spark, sf_dir, "documents")
        .select("doc_id", "text")
        .filter(F.pmod(F.xxhash64("doc_id"), F.lit(mod)) == residue)
        .orderBy("doc_id")
        .limit(cap)
        .collect()
    )


def _extra_py_recompute(expected_fn, out_cols, inv_name):
    """Compare the query output for a sampled doc bucket against a
    pure-Python recompute: ``expected_fn(text) -> tuple`` must equal
    the row's ``out_cols`` exactly."""

    def fn(spark, sf_dir, sdf):
        from pyspark.sql import functions as F

        docs = _sample_doc_rows(spark, sf_dir)
        ids = [r["doc_id"] for r in docs]
        got = {
            r["doc_id"]: tuple(r[c] for c in out_cols)
            for r in sdf.filter(F.col("doc_id").isin(ids)).collect()
        }
        if set(got) != set(ids):
            return {inv_name: False}
        ok = all(
            got[r["doc_id"]] == expected_fn(r["text"]) for r in docs
        )
        return {inv_name: ok}

    return fn


def _extra_corpus_dup_ngrams(spark, sf_dir, sdf):
    from pyspark.sql import functions as F

    inv = _viol(
        sdf,
        [
            (
                "dup_le_total_shingles",
                F.col("dup_shingles") > F.col("n_shingles"),
            ),
            (
                "dup_fraction_recomputed",
                F.abs(
                    F.col("dup_fraction")
                    - F.round(F.col("dup_shingles") / F.col("n_shingles"), 4)
                )
                > 1e-9,
            ),
            ("dup_shingles_ge_1", F.col("dup_shingles") < 1),
        ],
    )
    inv["doc_ids_subset_of_documents"] = _subset_of_table(
        spark, sf_dir, sdf, "doc_id", "documents"
    )
    return inv


def _extra_dup_flow(spark, sf_dir, sdf):
    """dropped_chars is a SUM of real per-doc n_chars — bound it per
    cell by n_pairs × the dropped source's min/max n_chars, and check
    the source labels come from the documents domain."""
    from covid19_etl_pipeline_spark.catalog import load_table
    from pyspark.sql import functions as F

    rng = (
        load_table(spark, sf_dir, "documents")
        .groupBy(F.col("source").alias("source_dropped"))
        .agg(
            F.min("n_chars").alias("__minc"), F.max("n_chars").alias("__maxc")
        )
    )
    j = sdf.join(F.broadcast(rng), "source_dropped", "left")
    return _viol(
        j,
        [
            ("source_dropped_in_domain", F.col("__minc").isNull()),
            ("n_pairs_ge_1", F.col("n_pairs") < 1),
            (
                "dropped_chars_within_source_bounds",
                (F.col("dropped_chars") < F.col("n_pairs") * F.col("__minc"))
                | (F.col("dropped_chars") > F.col("n_pairs") * F.col("__maxc")),
            ),
        ],
    )


def _extra_cluster_size_dist(spark, sf_dir, sdf):
    from pyspark.sql import functions as F

    return _viol(
        sdf,
        [
            (
                "members_eq_size_times_clusters",
                F.col("n_members") != F.col("cluster_size") * F.col("n_clusters"),
            ),
            (
                "removable_eq_members_minus_clusters",
                F.col("n_removable") != F.col("n_members") - F.col("n_clusters"),
            ),
            ("cluster_size_ge_2", F.col("cluster_size") < 2),
        ],
    )


def _extra_threshold_sweep(spark, sf_dir, sdf):
    rows = sorted(
        sdf.collect(), key=lambda r: r["threshold"]
    )
    thrs = [round(r["threshold"], 6) for r in rows]
    mono_pairs = all(
        rows[i]["n_pairs"] >= rows[i + 1]["n_pairs"] for i in range(len(rows) - 1)
    )
    mono_rm = all(
        rows[i]["removable_docs_upper"] >= rows[i + 1]["removable_docs_upper"]
        for i in range(len(rows) - 1)
    )
    rm_le_pairs = all(
        r["removable_docs_upper"] <= r["n_pairs"] for r in rows
    )
    return {
        "thresholds_are_contract_grid": thrs == [0.3, 0.4, 0.5, 0.6, 0.7, 0.8],
        "n_pairs_monotone_nonincreasing": mono_pairs,
        "removable_monotone_nonincreasing": mono_rm,
        "removable_le_n_pairs": rm_le_pairs,
    }


def _extra_fellegi_sunter(spark, sf_dir, sdf):
    """match_odds is a function of the agreement pattern alone — it
    must be CONSTANT per (agree_type, agree_price, agree_name)."""
    from pyspark.sql import functions as F

    inv = _viol(
        sdf,
        [
            (
                "agreement_fields_binary",
                ~F.col("agree_type").isin(0, 1)
                | ~F.col("agree_price").isin(0, 1)
                | ~F.col("agree_name").isin(0, 1),
            ),
            ("match_odds_positive", F.col("match_odds") <= 0),
        ],
    )
    bad = (
        sdf.groupBy("agree_type", "agree_price", "agree_name")
        .agg(F.countDistinct("match_odds").alias("nd"))
        .filter(F.col("nd") != 1)
        .limit(1)
        .count()
    )
    inv["odds_constant_per_agreement_pattern"] = bad == 0
    return inv


def _extra_minhash_accuracy(spark, sf_dir, sdf):
    from pyspark.sql import functions as F

    return _viol(
        sdf,
        [
            ("avg_err_le_max_err", F.col("avg_abs_err") > F.col("max_abs_err")),
            (
                "max_err_in_unit",
                (F.col("max_abs_err") < 0) | (F.col("max_abs_err") > 1),
            ),
            (
                "corr_in_range",
                (F.col("est_exact_corr") < -1 - 1e-9)
                | (F.col("est_exact_corr") > 1 + 1e-9),
            ),
        ],
    )


def _extra_topk_group(part_cols, rank_col, order_col, descending=False):
    """Per-group rank contiguity + the order column monotone in rank —
    the top-k contract (pq_adc_topk, hybrid_retrieval_rrf)."""

    def fn(spark, sf_dir, sdf):
        from pyspark.sql import functions as F
        from pyspark.sql.window import Window

        w = Window.partitionBy(*part_cols).orderBy(rank_col)
        prev = F.lag(order_col).over(w)
        cond = (
            (prev.isNotNull()) & (F.col(order_col) < prev - 1e-9)
            if not descending
            else (prev.isNotNull()) & (F.col(order_col) > prev + 1e-9)
        )
        mono = sdf.withColumn("__bad", cond).filter("__bad").limit(1).count() == 0
        return {
            "rank_contiguous_per_group": _rank_contig(sdf, part_cols, rank_col),
            "order_col_monotone_in_rank": mono,
        }

    return fn


def _extra_pca_component(spark, sf_dir, sdf):
    """Exact recompute of the query's advertised algorithm (three
    power-iteration matvecs from all-ones, pivot-normalized per round)
    through a DIFFERENT plan: instead of materializing the 4096-cell
    gram, each matvec is one scan computing
    (C·v)_i = E[x_i (x·v)] - m_i (m·v) per dimension. The query rounds
    its covariance cells to 6dp, so the recompute agrees to ~1e-3 —
    far inside the gap to any wrong/pruned result."""
    from covid19_etl_pipeline_spark.catalog import load_table
    from pyspark.sql import functions as F

    got = {r["dim"]: r["loading"] for r in sdf.collect()}
    d = len(got)
    # dims must be exactly 1..d (the query's contract) — a renumbered
    # or gapped result is a FAILED invariant, not a KeyError
    if d == 0 or set(got) != set(range(1, d + 1)):
        return {"loading_recomputed_3_iterations": False}
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("embedding").cast("array<double>").alias("x")
    )

    def matvec(vec):
        dot = F.aggregate(
            F.zip_with(
                "x", F.array(*[F.lit(c) for c in vec]), lambda a, b: a * b
            ),
            F.lit(0.0),
            lambda acc, y: acc + y,
        )
        rows = (
            emb.withColumn("__dot", dot)
            .select(F.posexplode("x").alias("pos", "val"), "__dot")
            .groupBy("pos")
            .agg(
                F.avg("val").alias("m"),
                F.avg(F.col("val") * F.col("__dot")).alias("exd"),
                F.avg("__dot").alias("md"),
            )
            .collect()
        )
        w = [0.0] * d
        for r in rows:
            w[r["pos"]] = r["exd"] - r["m"] * r["md"]
        return w

    v = [1.0] * d
    for _ in range(3):
        w = matvec(v)
        # pivot normalization: divide by the signed largest-|.|
        # element, ties to lowest dim; 8dp per-round rounding
        piv = max(w, key=lambda x: abs(x))
        for cand in w:
            if abs(cand) == abs(piv):
                piv = cand
                break
        v = [round(x / piv, 8) for x in w]
    ok = all(abs(v[i] - got[i + 1]) < 5e-3 for i in range(d))
    return {"loading_recomputed_3_iterations": ok}


def _extra_dsir(spark, sf_dir, sdf):
    from pyspark.sql import functions as F

    inv = _viol(
        sdf,
        [
            (
                "li_per_token_recomputed",
                F.abs(
                    F.col("li_per_token")
                    - F.round(
                        F.round(F.col("log_importance") * 1e6)
                        / F.col("n_tokens")
                    )
                    / 1e6
                )
                > 1e-9,
            ),
            ("n_tokens_ge_1", F.col("n_tokens") < 1),
        ],
    )
    # threshold selection on log_importance: every selected li clears
    # every unselected li (6dp-rounding slack at the quantile boundary)
    row = sdf.agg(
        F.min(F.when(F.col("selected"), F.col("log_importance"))).alias("lo"),
        F.max(F.when(~F.col("selected"), F.col("log_importance"))).alias("hi"),
    ).collect()[0]
    inv["selected_is_threshold_set"] = (
        row["lo"] is None
        or row["hi"] is None
        or row["lo"] >= row["hi"] - 2e-6
    )
    return inv


def _extra_recsys_negatives(spark, sf_dir, sdf):
    """Negatives must not be interactions: recompute the interacted
    (custkey, partkey) set for ONE custkey hash bucket and intersect."""
    from covid19_etl_pipeline_spark.catalog import load_table
    from pyspark.sql import functions as F

    inv = {"neg_rank_contiguous_per_customer": _rank_contig(sdf, ["c_custkey"], "neg_rank")}
    bucket = F.pmod(F.xxhash64(F.col("c_custkey")), F.lit(64)) == 7
    neg = sdf.filter(bucket).select("c_custkey", "p_partkey")
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.pmod(F.xxhash64(F.col("o_custkey")), F.lit(64)) == 7)
        .select("o_orderkey", "o_custkey")
    )
    inter = (
        orders.join(
            load_table(spark, sf_dir, "lineitem").select(
                "l_orderkey", "l_partkey"
            ),
            orders.o_orderkey == F.col("l_orderkey"),
        )
        .select(
            F.col("o_custkey").alias("c_custkey"),
            F.col("l_partkey").alias("p_partkey"),
        )
        .distinct()
    )
    hit = neg.join(inter, ["c_custkey", "p_partkey"]).limit(1).count()
    inv["negatives_never_interacted_sampled_bucket"] = hit == 0
    return inv


def _extra_repeated_substrings(spark, sf_dir, sdf):
    """Runs are >=12 tokens by contract and DISJOINT per document
    (islands merge overlapping/adjacent 8-gram hits)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    inv = _viol(
        sdf,
        [
            ("run_len_ge_contract_12", F.col("run_token_len") < 12),
            ("start_pos_ge_1", F.col("start_pos") < 1),
        ],
    )
    w = Window.partitionBy("doc_id").orderBy("start_pos")
    prev_end = F.lag(F.col("start_pos") + F.col("run_token_len")).over(w)
    overlap = (
        sdf.withColumn(
            "__bad", prev_end.isNotNull() & (F.col("start_pos") < prev_end)
        )
        .filter("__bad")
        .limit(1)
        .count()
    )
    inv["runs_disjoint_per_doc"] = overlap == 0
    return inv


def _extra_ann_label_mrr(spark, sf_dir, sdf):
    from pyspark.sql import functions as F

    rows = sdf.collect()
    if not rows:
        # degenerate shape is a FAILED invariant, not a harness error
        return {"hits_le_queries": False, "mrr_bounded_by_hit_count": False}
    r = rows[0]
    n, hits = r["n_queries"], r["queries_with_hit"]
    lo = hits / (10.0 * n) - 1e-9 if n else 0
    hi = hits / float(n) + 1e-9 if n else 0
    return {
        "hits_le_queries": hits <= n,
        "mrr_bounded_by_hit_count": (lo <= r["mrr_at_10"] <= hi),
    }


def _extra_chunk_ratio(spark, sf_dir, sdf):
    from pyspark.sql import functions as F

    return _viol(
        sdf,
        [
            ("dup_chunks_le_chunks", F.col("n_dup_chunks") > F.col("n_chunks")),
            (
                "zero_dups_zero_fraction",
                (F.col("n_dup_chunks") == 0) & (F.col("dup_token_fraction") != 0),
            ),
        ],
    )


def _extra_datacard(spark, sf_dir, sdf):
    from pyspark.sql import functions as F

    inv = _viol(
        sdf,
        [
            ("p50_le_p90", F.col("p50_tokens") > F.col("p90_tokens")),
            (
                "avg_tokens_recomputed",
                F.abs(
                    F.col("avg_tokens")
                    - F.col("total_tokens") / F.col("n_docs")
                )
                > 0.001,
            ),
        ],
    )
    n_docs = _base_count(spark, sf_dir, "documents")
    # per-source rows partition the corpus; the __all__ row restates it
    inv["docs_conserved"] = (
        _scalar(
            sdf.filter(F.col("source") != "__all__"), F.sum("n_docs")
        )
        == n_docs
    )
    inv["all_row_is_corpus_total"] = (
        _scalar(
            sdf.filter(F.col("source") == "__all__"), F.sum("n_docs")
        )
        == n_docs
    )
    return inv


def _extra_conserved(sum_col, table, where_sql=None):
    """sum(result.sum_col) == count of the base table — conservation."""

    def fn(spark, sf_dir, sdf):
        from pyspark.sql import functions as F

        got = _scalar(sdf, F.sum(sum_col))
        want = _base_count(
            spark, sf_dir, table, F.expr(where_sql) if where_sql else None
        )
        return {f"{sum_col}_conserves_{table}": got == want}

    return fn


def _extra_weight_sums(cols, tol=1e-3):
    """Normalized weight columns sum to 1."""

    def fn(spark, sf_dir, sdf):
        from pyspark.sql import functions as F

        row = sdf.agg(
            *[F.sum(c).alias(c) for c in cols]
        ).collect()[0]
        return {
            f"{c}_sums_to_1": row[c] is not None and abs(row[c] - 1.0) < tol
            for c in cols
        }

    return fn


def _extra_next_event(spark, sf_dir, sdf):
    """Per from_type, transition probabilities sum to 1."""
    from pyspark.sql import functions as F

    bad = (
        sdf.groupBy("from_type")
        .agg(F.sum("transition_p").alias("s"))
        .filter(F.abs(F.col("s") - 1.0) > 1e-3)
        .limit(1)
        .count()
    )
    return {"transition_p_sums_to_1_per_from_type": bad == 0}


def _extra_loo_encoding(spark, sf_dir, sdf):
    """Leave-one-out mean recomputed from the RESULT's own rows:
    loo = (segment_sum - own_acctbal) / (segment_n - 1)."""
    from pyspark.sql import functions as F

    seg = sdf.groupBy("c_mktsegment").agg(
        F.sum("c_acctbal").alias("__s"), F.count("*").alias("__n")
    )
    j = sdf.join(F.broadcast(seg), "c_mktsegment")
    expect = (F.col("__s") - F.col("c_acctbal")) / (F.col("__n") - 1)
    return _viol(
        j,
        [
            (
                "loo_mean_recomputed",
                F.abs(F.col("segment_loo_mean") - expect) > 1e-4,
            )
        ],
    )


def _extra_epoch_upsample(spark, sf_dir, sdf):
    """repeat_idx is 1..n per doc (the LATERAL range contract)."""
    return {
        "repeat_idx_contiguous_per_doc": _rank_contig(
            sdf, ["doc_id"], "repeat_idx"
        )
    }


def _extra_quantize(spark, sf_dir, sdf):
    """Reconstruction error bound of round-to-nearest int8: max_abs_err
    <= scale/254 (the docstring's own contract)."""
    from pyspark.sql import functions as F

    return _viol(
        sdf,
        [
            (
                "reconstruction_error_bound",
                F.col("max_abs_err") > F.col("scale") / 254.0 + 1e-6,
            ),
            ("scale_positive", F.col("scale") <= 0),
        ],
    )


def _extra_outlier_docs(spark, sf_dir, sdf):
    from pyspark.sql import functions as F

    return _viol(
        sdf,
        [("outliers_exceed_p95", F.col("d2") < F.col("p95_d2"))],
    )


def _extra_whitening(spark, sf_dir, sdf):
    """The output slice is vec_id<10 but mu/sigma come from the FULL
    table — recompute them via the algebraically different
    sqrt(E[v²]-E[v]²) form and verify every emitted z."""
    from covid19_etl_pipeline_spark.catalog import load_table
    from pyspark.sql import functions as F

    flat = (
        load_table(spark, sf_dir, "embeddings")
        .select(F.posexplode("embedding").alias("pos", "valf"))
        .select(
            (F.col("pos") + 1).alias("dim"),
            F.col("valf").cast("double").alias("val"),
        )
    )
    stats = flat.groupBy("dim").agg(
        F.avg("val").alias("__mu"),
        F.sqrt(F.avg(F.col("val") * F.col("val")) - F.avg("val") ** 2).alias(
            "__sigma"
        ),
    )
    vals = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") < 10)
        .select("vec_id", F.posexplode("embedding").alias("pos", "valf"))
        .select(
            "vec_id",
            (F.col("pos") + 1).alias("dim"),
            F.col("valf").cast("double").alias("__val"),
        )
    )
    j = (
        sdf.join(vals, ["vec_id", "dim"])
        .join(F.broadcast(stats), "dim")
    )
    bad = (
        j.filter(
            F.abs(
                F.col("z")
                - (F.col("__val") - F.col("__mu")) / F.col("__sigma")
            )
            > 1e-3
        )
        .limit(1)
        .count()
    )
    return {"z_recomputed_from_corpus_stats": bad == 0}


def _extra_component_stats(spark, sf_dir, sdf):
    from pyspark.sql import functions as F

    return _viol(
        sdf,
        [
            (
                "min_le_mean_le_max",
                (F.col("min_comp") > F.col("mean_comp") + 1e-9)
                | (F.col("mean_comp") > F.col("max_comp") + 1e-9),
            ),
            ("n_positive_le_dim", F.col("n_positive") > F.col("dim")),
        ],
    )


def _extra_mutual_nn_recall(spark, sf_dir, sdf):
    from pyspark.sql import functions as F

    rows = {r["probes"]: r for r in sdf.collect()}
    ok_alg = all(
        r["n_captured"] <= min(r["n_exact_pairs"], r["n_ivf_pairs"])
        and (
            r["n_exact_pairs"] == 0
            or abs(r["recall"] - round(r["n_captured"] / r["n_exact_pairs"], 4))
            < 1e-9
        )
        and (
            r["n_ivf_pairs"] == 0
            or abs(
                r["precision_"] - round(r["n_captured"] / r["n_ivf_pairs"], 4)
            )
            < 1e-9
        )
        for r in rows.values()
    )
    mono = (
        1 not in rows
        or 3 not in rows
        or rows[3]["recall"] >= rows[1]["recall"] - 1e-9
    )
    return {
        "recall_precision_recomputed": ok_alg,
        "recall_monotone_in_probes": mono,
    }


def _extra_ivf_recall(spark, sf_dir, sdf):
    from pyspark.sql import functions as F

    return _viol(
        sdf,
        [
            ("hits_le_10", F.col("ivf_hits") > 10),
            (
                "recall_eq_hits_over_10",
                F.abs(F.col("recall_at_10") - F.col("ivf_hits") / 10.0) > 1e-9,
            ),
        ],
    )


def _extra_doc_meta_match(cols):
    """Result rows carry (doc_id, meta...) copied from documents — a
    sampled-bucket join must agree on every meta column exactly."""

    def fn(spark, sf_dir, sdf):
        from covid19_etl_pipeline_spark.catalog import load_table
        from pyspark.sql import functions as F

        bucket = F.pmod(F.xxhash64(F.col("doc_id")), F.lit(64)) == 7
        res = sdf.filter(bucket).select("doc_id", *cols)
        base = (
            load_table(spark, sf_dir, "documents")
            .filter(bucket)
            .select(
                "doc_id", *[F.col(c).alias(f"__b_{c}") for c in cols]
            )
        )
        j = res.join(base, "doc_id", "left")
        cond = F.col(f"__b_{cols[0]}").isNull()
        for c in cols:
            cond = cond | (F.col(c) != F.col(f"__b_{c}"))
        bad = j.filter(cond).limit(1).count()
        return {"doc_meta_matches_documents_sampled_bucket": bad == 0}

    return fn


def _extra_quantile_norm(spark, sf_dir, sdf):
    """The pooled quantile map is monotone: sorting by source_pct can
    never decrease normalized_score (one global-ordered window over
    the check only, not the query)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    w = (
        Window.orderBy("source_pct")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bad = (
        sdf.select("source_pct", "normalized_score")
        .withColumn("__mx", F.max("normalized_score").over(w))
        .filter(
            F.col("__mx").isNotNull()
            & (F.col("normalized_score") < F.col("__mx"))
        )
        .limit(1)
        .count()
    )
    return {"quantile_map_monotone": bad == 0}


def _extra_pack_sequences(spark, sf_dir, sdf):
    """Token conservation: the packed bins hold exactly the corpus's
    whitespace tokens (recomputed in one scan)."""
    from covid19_etl_pipeline_spark.catalog import load_table
    from pyspark.sql import functions as F

    got = _scalar(sdf, F.sum("total_tokens"))
    want = (
        load_table(spark, sf_dir, "documents")
        .agg(
            F.sum(F.size(F.split(F.trim("text"), r"\s+"))).alias("t")
        )
        .collect()[0]["t"]
    )
    return {
        "tokens_conserved": got == want,
        "bins_nonempty": _scalar(
            sdf, F.sum(F.when(F.col("n_docs") < 1, 1).otherwise(0))
        )
        == 0,
    }


def _extra_curriculum(spark, sf_dir, sdf):
    """curriculum_rank is a global permutation 1..n."""
    from pyspark.sql import functions as F

    row = sdf.agg(
        F.min("curriculum_rank").alias("mn"),
        F.max("curriculum_rank").alias("mx"),
        F.count("*").alias("n"),
        F.countDistinct("curriculum_rank").alias("nd"),
    ).collect()[0]
    return {
        "rank_is_global_permutation": row["mn"] == 1
        and row["mx"] == row["n"]
        and row["nd"] == row["n"]
    }


def _extra_kmeans(spark, sf_dir, sdf):
    from pyspark.sql import functions as F

    inv = _viol(
        sdf,
        [
            ("inertia_nonneg", F.col("inertia") < 0),
            (
                "centroid_norm_le_1",
                F.col("centroid_norm") > 1 + 1e-6,
            ),
        ],
    )
    inv["members_conserve_embeddings"] = _scalar(
        sdf, F.sum("n_members")
    ) == _base_count(spark, sf_dir, "embeddings")
    return inv


def _extra_cluster_separation(spark, sf_dir, sdf):
    from pyspark.sql import functions as F

    return {
        "vecs_conserve_embeddings": _scalar(sdf, F.sum("n_vecs"))
        == _base_count(spark, sf_dir, "embeddings")
    }


def _extra_rank_only(part_cols, rank_col):
    def fn(spark, sf_dir, sdf):
        return {
            f"{rank_col}_contiguous": _rank_contig(sdf, part_cols, rank_col)
        }

    return fn


def _extra_exact_dedup_conserve(spark, sf_dir, sdf):
    from pyspark.sql import functions as F

    inv = {"copies_conserve_documents": _scalar(
        sdf, F.sum("n_copies")
    ) == _base_count(spark, sf_dir, "documents")}
    inv.update(_viol(sdf, [("n_copies_ge_1", F.col("n_copies") < 1)]))
    return inv


def _extra_cdc_chunks(spark, sf_dir, sdf):
    return {
        "chunk_id_contiguous_per_doc": _rank_contig(
            sdf, ["doc_id"], "chunk_id", base=0
        )
    }


def _extra_splits(count_col, table, domain=None, split_col="split"):
    def fn(spark, sf_dir, sdf):
        from pyspark.sql import functions as F

        inv = {
            f"{count_col}_conserves_{table}": _scalar(sdf, F.sum(count_col))
            == _base_count(spark, sf_dir, table)
        }
        if domain:
            inv["split_domain_valid"] = (
                sdf.filter(~F.col(split_col).isin(*domain)).limit(1).count()
                == 0
            )
        return inv

    return fn


def _extra_random_projection(spark, sf_dir, sdf):
    from pyspark.sql import functions as F

    row = sdf.agg(
        F.countDistinct(F.size("projection")).alias("nd"),
        F.avg("norm_ratio").alias("avg_r"),
        F.sum(
            F.when(
                (F.col("norm_ratio") <= 0) | (F.col("norm_ratio") > 10), 1
            ).otherwise(0)
        ).alias("v"),
    ).collect()[0]
    return {
        "projection_width_constant": row["nd"] == 1,
        # per-vector JL variance is huge at small k; the MEAN ratio is
        # the isometry-in-expectation contract
        "mean_norm_ratio_near_1": row["avg_r"] is not None
        and abs(row["avg_r"] - 1.0) < 0.15,
        "norm_ratio_positive_bounded": (row["v"] or 0) == 0,
    }


def _extra_truncation(spark, sf_dir, sdf):
    from pyspark.sql import functions as F

    inv = _viol(
        sdf,
        [("over_limit_le_docs", F.col("n_over_limit") > F.col("n_docs"))],
    )
    inv["docs_conserved"] = _scalar(sdf, F.sum("n_docs")) == _base_count(
        spark, sf_dir, "documents"
    )
    return inv


def _extra_incremental_embedding(spark, sf_dir, sdf):
    from pyspark.sql import functions as F

    from covid19_etl_pipeline_spark.catalog import load_table

    inv = _viol(
        sdf,
        [
            ("only_new_vectors_scored", F.col("vec_id") % 5 != 0),
            (
                "status_domain",
                ~F.col("status").isin("kept", "dropped", "dup", "near_dup"),
            ),
        ],
    )
    # every new vector gets exactly ONE verdict (§16a hardening: the
    # sid collision changed VALUES, not shapes — conservation pins the
    # row axis, the in-plan offset assert pins the identity axis).
    # count + countDistinct in one agg = one plan execution.
    n_new = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") % 5 == 0)
        .count()
    )
    row = sdf.agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("vec_id").alias("d"),
    ).collect()[0]
    inv["one_verdict_per_new_vector"] = row["n"] == n_new == row["d"]
    return inv


def _merge_extras(*fns):
    def fn(spark, sf_dir, sdf):
        out = {}
        for f in fns:
            out.update(f(spark, sf_dir, sdf))
        return out

    return fn


#: bespoke spark-only invariants, keyed by registry query name —
#: run IN ADDITION to the schema-driven generic pass
SPARK_ONLY_EXTRA = {
    "semdedup_survivors": _extra_survivor_family("vec_id", "embeddings"),
    "semdedup_two_level_survivors": _extra_survivor_family(
        "vec_id", "embeddings"
    ),
    "embedding_curation_pipeline": _extra_survivor_family(
        "vec_id", "embeddings"
    ),
    "near_dedup_survivors": _extra_survivor_family("vec_id", "embeddings"),
    "training_corpus": _extra_survivor_family("doc_id", "documents"),
    "dup_clusters": _extra_dup_clusters,
    "leakage_safe_split": _extra_leakage_split,
    "incremental_corpus_dedup": _extra_incremental,
    # --- r10 battery: algebra / conservation / contiguity /
    #     pure-Python sampled recompute per entry ---
    "corpus_duplicate_ngrams": _extra_corpus_dup_ngrams,
    "cross_source_dup_flow": _extra_dup_flow,
    "dup_cluster_size_distribution": _extra_cluster_size_dist,
    "neardup_threshold_sweep": _extra_threshold_sweep,
    "fellegi_sunter_part_linkage": _extra_fellegi_sunter,
    "minhash_estimate_accuracy": _extra_minhash_accuracy,
    "pq_adc_topk": _extra_topk_group(
        ["query_id"], "rank", "adc_dist2", descending=False
    ),
    "hybrid_retrieval_rrf": _extra_topk_group(
        ["query_id"], "rank", "rrf_score", descending=True
    ),
    "embedding_pca_top_component": _extra_pca_component,
    "dsir_importance_weights": _extra_dsir,
    "recsys_negative_samples": _extra_recsys_negatives,
    "maximal_repeated_substrings": _extra_repeated_substrings,
    "ann_label_mrr": _extra_ann_label_mrr,
    "chunk_dedup_ratio": _extra_chunk_ratio,
    "corpus_datacard": _extra_datacard,
    "source_mixture_weights": _merge_extras(
        _extra_weight_sums(["mixture_weight"], tol=1e-4),
        _extra_conserved("n_docs", "documents"),
    ),
    "doremi_domain_weights": _extra_weight_sums(
        ["base_weight", "updated_weight"], tol=1e-3
    ),
    "next_event_training_pairs": _extra_next_event,
    "loo_target_encoding": _extra_loo_encoding,
    "epoch_upsample_documents": _extra_epoch_upsample,
    "quantize_embeddings_int8": _extra_quantize,
    "embedding_outlier_docs": _extra_outlier_docs,
    "embedding_dimension_whitening": _extra_whitening,
    "embedding_component_stats": _extra_component_stats,
    "mutual_nn_ivf_recall": _extra_mutual_nn_recall,
    "ivf_multiprobe_recall": _extra_ivf_recall,
    "quantile_normalize_scores": _extra_quantile_norm,
    "pack_training_sequences": _extra_pack_sequences,
    "curriculum_order_documents": _extra_curriculum,
    "kmeans_refined_centroids": _extra_kmeans,
    "embedding_cluster_separation": _extra_cluster_separation,
    "exact_dedup": _extra_exact_dedup_conserve,
    "cdc_chunk_documents": _extra_cdc_chunks,
    "hash_split_documents": _extra_splits(
        "n_docs", "documents", domain=("train", "val", "test")
    ),
    "temporal_split_events": _extra_splits(
        "n_events", "events", domain=("train", "val", "test")
    ),
    "truncation_audit": _extra_truncation,
    "random_projection_embeddings": _extra_random_projection,
    "incremental_embedding_dedup": _extra_incremental_embedding,
    "sample_k_per_group": _extra_rank_only(["lang"], "rk"),
    "cluster_balanced_sample": _extra_rank_only(["cluster_id"], "rk"),
    "weighted_sample_documents": _extra_rank_only([], "rk"),
    "stratified_sample_documents": _extra_doc_meta_match(
        ["lang", "source"]
    ),
    "temperature_mix_sources": _extra_doc_meta_match(["source"]),
    "source_calibrated_quality": _extra_doc_meta_match(
        ["source", "n_chars"]
    ),
    "minhash_signatures": _extra_py_recompute(
        _py_minhash4, ["mh0", "mh1", "mh2", "mh3"], "python_recompute_sampled"
    ),
    "simhash_signatures": _extra_py_recompute(
        lambda t: (_py_simhash32(t),), ["simhash"], "python_recompute_sampled"
    ),
    "doc_fingerprint": _extra_py_recompute(
        lambda t: (_py_fingerprint(t),), ["fp"], "python_recompute_sampled"
    ),
    "winnowing_fingerprints": _extra_py_recompute(
        _py_winnow,
        ["n_fingerprints", "min_fp", "max_fp"],
        "python_recompute_sampled",
    ),
}
