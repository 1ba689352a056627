"""Per-round scale guard (r06 verdict #6): re-measure the §12d
headline scale win — end-to-end two-level semdedup wall at the k=100
corpus (200k vectors, k=800, probes=3) — and merge the number into the
committed SCALE_GUARD.json so the next round can diff it instead of
re-discovering the measurement.

The measured quantity is the REAL engine path
(`semdedup_survivors(assign="two_level", probes=3)` over the sfx100
embeddings via the raw operator, same sizing as SCALE.md §12c/§12d:
k=800 ∝ √n per the balanced rule). §12d's recorded band is
31.7–45.1 s; flat assignment at the same k measured 239 s.

Usage:
  python tools/make_scale_fixtures.py --k 100   # once per machine
  python tools/scale_guard.py --round 7 [--sf /tmp/spark_graft_sfx100]

Merges {"r07": {...}} into SCALE_GUARD.json at the repo root and
prints one JSON line. Run it on an otherwise idle box — the guard is
a wall-clock number.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--sf", default="/tmp/spark_graft_sfx100")
    p.add_argument("--k", type=int, default=800)
    p.add_argument("--probes", type=int, default=3)
    p.add_argument("--round", type=int, required=True)
    p.add_argument(
        "--runs", type=int, default=2,
        help="independent measurements; min + all recorded (§12d keeps "
        "two runs on record because the box sees episodic host steal)",
    )
    args = p.parse_args()

    from covid19_etl_pipeline_spark.operators.similarity import (
        semdedup_survivors,
    )
    from covid19_etl_pipeline_spark.session import get_spark

    spark = get_spark(
        app_name="scale-guard",
        extra_conf={"spark.driver.memory": "24g"},
    )
    emb = spark.read.parquet(os.path.join(args.sf, "embeddings.parquet"))

    walls = []
    for _ in range(args.runs):
        t0 = time.perf_counter()
        semdedup_survivors(
            emb,
            k=args.k,
            threshold=0.35,
            assign="two_level",
            probes=args.probes,
        ).write.format("noop").mode("overwrite").save()
        walls.append(round(time.perf_counter() - t0, 1))
        print(f"# run: {walls[-1]}s", file=sys.stderr)

    rec = {
        "metric": "semdedup_two_level_wall",
        "sf_dir": args.sf,
        "k": args.k,
        "probes": args.probes,
        "wall_sec_min": min(walls),
        "wall_sec_all": walls,
    }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(repo, "SCALE_GUARD.json")
    doc = {}
    if os.path.exists(path):
        with open(path) as fh:
            doc = json.load(fh)
    doc[f"r{args.round:02d}"] = rec
    with open(path, "w") as fh:
        json.dump(doc, fh, indent=1)
    print(json.dumps({f"r{args.round:02d}": rec}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
