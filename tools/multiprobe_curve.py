"""Multiprobe recall-vs-cost curve for the two-level quantizer
(SCALE.md §12d, r05 verdict #3).

Two measurements, both against the REAL engine code paths:

1. --recall: boundary recall at a given k on the sf0.1 embeddings
   (2,000 vectors — small enough for an exact numpy ground truth).
   Metric matches §12c exactly: within-cell coverage of weakly-similar
   pairs (cosine >= 0.35) — the share of ground-truth weak pairs whose
   two vectors land in the SAME cell, for flat assignment and for
   two-level assignment at probes p = 1..4. Flat is the upper bound
   the multiprobe curve should approach.

2. --wall: wall-clock of the full semdedup pipeline at the k=100 scale
   corpus (200k vectors, tools/make_scale_fixtures.py) for two-level
   at each p (flat's 239s at k=800 is on record in §12c; the p=1
   number re-measured here calibrates host drift against its 49.3s).

Usage:
  python tools/multiprobe_curve.py --recall --k 128
  python tools/multiprobe_curve.py --wall --k 800 \
      --sf /tmp/spark_graft_sfx100 --probes 1,2,4

Prints one JSON line per measurement.
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from covid19_etl_pipeline_spark.catalog import load_table  # noqa: E402
from covid19_etl_pipeline_spark.operators import similarity  # noqa: E402
from covid19_etl_pipeline_spark.operators.partitioning import spread  # noqa: E402
from covid19_etl_pipeline_spark.session import get_spark  # noqa: E402


def _pts_cent(emb, k: int):
    """The exact pts/cent construction semdedup_survivors uses."""
    pts = spread(emb, "vec_id").select(
        F.col("vec_id").alias("pid"),
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v"),
    )
    cent = pts.filter(F.col("pid") < k).select(
        F.col("pid").alias("cid"),
        F.transform("v", lambda x: F.round(x, 6)).alias("cv"),
    )
    return pts, cent


def recall_curve(spark, sf_dir: str, k: int, probes: list[int]) -> dict:
    emb = load_table(spark, sf_dir, "embeddings")
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r["vec_id"] for r in rows])
    V = np.array([r["embedding"] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(V, axis=1)
    nz = norms > 0
    U = np.zeros_like(V)
    U[nz] = V[nz] / norms[nz, None]
    cos = U @ U.T
    iu = np.triu_indices(len(ids), 1)
    weak = cos[iu] >= 0.35
    wi, wj = iu[0][weak], iu[1][weak]
    n_weak = int(weak.sum())

    def coverage(assign_df) -> float:
        cell = {r["pid"]: r["cid"] for r in assign_df.select("pid", "cid").collect()}
        a = np.array([cell[ids[i]] for i in wi])
        b = np.array([cell[ids[j]] for j in wj])
        return round(float((a == b).mean()), 4)

    pts, cent = _pts_cent(emb, k)
    out = {
        "metric": "weak_pair_within_cell_coverage",
        "k": k,
        "n_vectors": len(ids),
        "n_weak_pairs": n_weak,
        "flat": coverage(similarity._nearest_centroid(pts, cent)),
    }
    for p in probes:
        out[f"p{p}"] = coverage(
            similarity._nearest_centroid_two_level(pts, cent, k=k, probes=p)
        )
    return out


def wall_curve(spark, sf_dir: str, k: int, probes: list[int]) -> dict:
    emb = load_table(spark, sf_dir, "embeddings")
    out = {"metric": "semdedup_two_level_wall", "k": k, "sf_dir": sf_dir}
    # warm scan so p=1 doesn't absorb the cold parquet read
    emb.write.format("noop").mode("overwrite").save()
    for p in probes:
        t0 = time.perf_counter()
        similarity.semdedup_survivors(
            emb, k=k, assign="two_level", probes=p
        ).write.format("noop").mode("overwrite").save()
        out[f"p{p}_sec"] = round(time.perf_counter() - t0, 1)
        gc.collect()
    return out


def cell_balance(spark, sf_dir: str, k: int, probes: list[int]) -> dict:
    """Σ|cell|² (the within-cell pair-join work driver) and max cell
    size per assigner config — explains WHY end-to-end wall can drop
    as probes rise: multiprobe moves boundary points out of the
    overstuffed cells a 1-probe descent creates."""
    emb = load_table(spark, sf_dir, "embeddings")
    pts, cent = _pts_cent(emb, k)

    def stats(assign_df) -> dict:
        row = (
            assign_df.groupBy("cid")
            .agg(F.count("*").alias("n"))
            .agg(
                F.sum(F.col("n") * F.col("n")).alias("sum_sq"),
                F.max("n").alias("max_cell"),
                F.count("*").alias("cells"),
            )
            .collect()[0]
        )
        return {
            "sum_sq": int(row["sum_sq"]),
            "max_cell": int(row["max_cell"]),
            "cells": int(row["cells"]),
        }

    out = {"metric": "cell_balance", "k": k, "sf_dir": sf_dir}
    out["flat"] = stats(similarity._nearest_centroid(pts, cent))
    for p in probes:
        out[f"p{p}"] = stats(
            similarity._nearest_centroid_two_level(pts, cent, k=k, probes=p)
        )
    return out


def mutual_curve(spark, sf_dir: str, probes: list[int]) -> dict:
    """Mutual-NN IVF recall/precision/wall curve (r08 verdict #7): the
    `mutual_nn_ivf_recall` measurement generalized to any probe list
    and any fixture — run it on BOTH the near-uniform synthetic
    embeddings (IVF's worst case) and the mixture-of-Gaussians fixture
    (tools/make_clustered_embeddings.py, data shaped like real
    embedding corpora) to justify the production default probes=3."""
    from covid19_etl_pipeline_spark.plans.embedding import (
        _ivf_mutual_pairs,
        mutual_nearest_embeddings,
    )

    t0 = time.perf_counter()
    exact = {
        (r["vec_a"], r["vec_b"])
        for r in mutual_nearest_embeddings(spark, sf_dir)
        .select("vec_a", "vec_b")
        .collect()
    }
    exact_sec = round(time.perf_counter() - t0, 1)
    out = {
        "metric": "mutual_nn_ivf_curve",
        "sf_dir": sf_dir,
        "n_exact_pairs": len(exact),
        "exact_kernel_sec": exact_sec,
    }
    for p in probes:
        t0 = time.perf_counter()
        ivf = {
            (r["vec_a"], r["vec_b"])
            for r in _ivf_mutual_pairs(spark, sf_dir, p)
            .select("vec_a", "vec_b")
            .collect()
        }
        sec = round(time.perf_counter() - t0, 1)
        cap = len(exact & ivf)
        out[f"p{p}"] = {
            "n_ivf_pairs": len(ivf),
            "n_captured": cap,
            "recall": round(cap / len(exact), 4) if exact else None,
            "precision": round(cap / len(ivf), 4) if ivf else None,
            "sec": sec,
        }
        gc.collect()
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--recall", action="store_true")
    ap.add_argument("--wall", action="store_true")
    ap.add_argument("--cells", action="store_true")
    ap.add_argument("--mutual", action="store_true")
    ap.add_argument("--k", type=int, default=128)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--probes", default="1,2,3,4")
    args = ap.parse_args()
    probes = [int(x) for x in args.probes.split(",")]
    spark = get_spark(
        app_name="multiprobe_curve",
        # same sizing as scale_spotcheck.py — the k=100 corpus holds
        # 200k 64-double vectors through a localCheckpoint
        extra_conf={"spark.driver.memory": "24g"},
    )
    if args.recall:
        print(json.dumps(recall_curve(spark, args.sf, args.k, probes)))
    if args.wall:
        print(json.dumps(wall_curve(spark, args.sf, args.k, probes)))
    if args.cells:
        print(json.dumps(cell_balance(spark, args.sf, args.k, probes)))
    if args.mutual:
        print(json.dumps(mutual_curve(spark, args.sf, probes)))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
