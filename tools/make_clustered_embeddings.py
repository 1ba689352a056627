"""Mixture-of-Gaussians embedding fixture (r08 verdict #7).

The synthetic `embeddings` tables are near-uniform on the sphere —
the WORST case for IVF (every cell boundary cuts through uniform mass,
so cell-local NN misses are maximal and measured recall is a lower
bound). Real embedding corpora are CLUSTERED. This tool clones an sf
dir (other tables symlinked) and replaces `embeddings` with a seeded
mixture of Gaussians so the multiprobe recall/precision curve can be
recorded on data shaped like real embeddings:

    centers_c ~ N(0, I_d),  c = 1..n_clusters (unit-normalized)
    x_i = center_{c(i)} + sigma * N(0, I_d),   c(i) = i mod n_clusters

sigma controls cluster tightness — within-cluster cosine is
~1/(1 + sigma^2 * d), so the 0.09 default gives ~0.65 within vs ~0.0
between: the "topic cluster" regime of sentence-embedding spaces. The true mixture component is stored in
`label` (schema-compatible: vec_id BIGINT, embedding FLOAT[], label
INTEGER), so IVF cell purity can be audited against ground truth.

Usage:
  python tools/make_clustered_embeddings.py \
      [--src /tmp/spark_graft_sfx10] [--out /tmp/spark_graft_gauss] \
      [--n 20000] [--dim 64] [--clusters 32] [--sigma 0.09] [--seed 97]

(pass a larger --sigma, e.g. 0.35, to record a looser-cluster regime —
the ~0.65 within-cluster cosine claim above holds for the 0.09
default at d=64, not for 0.35)
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--src", default="/tmp/spark_graft_sfx10")
    p.add_argument("--out", default="/tmp/spark_graft_gauss")
    p.add_argument("--n", type=int, default=20000)
    p.add_argument("--dim", type=int, default=64)
    p.add_argument("--clusters", type=int, default=32)
    p.add_argument("--sigma", type=float, default=0.09)
    p.add_argument("--seed", type=int, default=97)
    args = p.parse_args()

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(args.seed)
    centers = rng.standard_normal((args.clusters, args.dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    comp = np.arange(args.n) % args.clusters
    x = centers[comp] + args.sigma * rng.standard_normal((args.n, args.dim))

    os.makedirs(args.out, exist_ok=True)
    table = pa.table(
        {
            "vec_id": pa.array(np.arange(args.n, dtype="int64")),
            "embedding": pa.array(
                [row for row in x.astype("float32")],
                type=pa.list_(pa.float32()),
            ),
            "label": pa.array(comp.astype("int32")),
        }
    )
    pq.write_table(table, os.path.join(args.out, "embeddings.parquet"))

    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents"
    ).split():
        src = os.path.join(args.src, f"{t}.parquet")
        dst = os.path.join(args.out, f"{t}.parquet")
        if os.path.exists(src) and not os.path.exists(dst):
            os.symlink(src, dst)

    # cluster-structure audit: mean within- vs between-cluster cosine
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    idx = rng.choice(args.n, size=min(2000, args.n), replace=False)
    sims = xn[idx] @ xn[idx].T
    same = comp[idx][:, None] == comp[idx][None, :]
    off = ~np.eye(len(idx), dtype=bool)
    print(
        f"{args.out}: n={args.n} d={args.dim} clusters={args.clusters} "
        f"sigma={args.sigma} | within-cluster cos="
        f"{sims[same & off].mean():.3f} between={sims[~same].mean():.3f}"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
