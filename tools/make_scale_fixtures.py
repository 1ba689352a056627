"""Build a k-times-scaled derivative of an sf dir for the SCALE.md §12
curvature spot-bench (r04 verdict #6). NEVER touches /root/testdata —
writes to --out (default /tmp/spark_graft_sfx{k}).

Construction: k copies of each fact table with DISJOINT key spaces
(key columns offset by copy_index * 1e8; foreign keys offset in
lockstep so referential integrity holds within every copy). The global
dimensions (region, nation) are shared, as they would be at any scale.

Copy independence is engineered so the measured queries scale by
ENGINE cost, not by data-structure artifacts:

- documents: every 2nd token gets a copy-specific suffix, so cross-copy
  shingle/fingerprint spaces are DISJOINT — naive replication would
  hand every document k-1 exact duplicates and inflate near-dup pair
  counts quadratically (a property of the synthetic data, not of the
  engine). Token counts are unchanged and ~half the stopword signal
  survives, so quality gates behave identically in every copy. The
  baseline (k=1) is built through the SAME transform, so the two
  scales compare like with like.
- embeddings: vectors are component-rotated by the copy index —
  within-copy cosine structure is exactly preserved, cross-copy
  cosines are scrambled (no artificial cross-copy near-duplicates).

Usage:
  python tools/make_scale_fixtures.py [--src /root/testdata/sf0.1]
      [--k 10] [--out /tmp/spark_graft_sfx10]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

#: key columns to offset per copy, per table (FKs in lockstep)
KEYED = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
SHARED_DIMS = ("region", "nation")
OFFSET = 100_000_000
EMB_DIM = 64


def salted_documents(df, i: int):
    toks = F.split(F.trim(F.col("text")), r"\s+")
    salted = F.concat_ws(
        " ",
        F.transform(
            toks,
            lambda x, j: F.when(
                j % 2 == 1, F.concat(x, F.lit(f"zq{i}"))
            ).otherwise(x),
        ),
    )
    return df.withColumn("text", salted).withColumn(
        "n_chars", F.length("text")
    )


def rotated_embeddings(df, i: int):
    r = i % EMB_DIM
    if r == 0:
        return df
    emb = F.col("embedding")
    return df.withColumn(
        "embedding",
        F.concat(F.slice(emb, r + 1, EMB_DIM - r), F.slice(emb, 1, r)),
    )


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--src", default="/root/testdata/sf0.1")
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--out", default=None)
    args = p.parse_args()
    out = args.out or f"/tmp/spark_graft_sfx{args.k}"
    if os.path.realpath(out).startswith("/root/testdata"):
        sys.exit("refusing to write under /root/testdata")

    from covid19_etl_pipeline_spark.catalog import load_table
    from covid19_etl_pipeline_spark.session import get_spark

    spark = get_spark(app_name="make-scale-fixtures")
    os.makedirs(out, exist_ok=True)

    for name in SHARED_DIMS:
        load_table(spark, args.src, name).write.mode("overwrite").parquet(
            os.path.join(out, f"{name}.parquet")
        )
        print(f"{name}: copied")

    for name, keys in KEYED.items():
        base = load_table(spark, args.src, name)
        copies = []
        for i in range(args.k):
            c = base
            for kcol in keys:
                c = c.withColumn(kcol, F.col(kcol) + F.lit(i * OFFSET))
            if name == "documents":
                c = salted_documents(c, i)
            elif name == "embeddings":
                c = rotated_embeddings(c, i)
            copies.append(c)
        df = copies[0]
        for c in copies[1:]:
            df = df.unionByName(c)
        df.write.mode("overwrite").parquet(os.path.join(out, f"{name}.parquet"))
        print(f"{name}: x{args.k}")

    spark.stop()
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
