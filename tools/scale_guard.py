"""Per-round scale guard (r06 verdict #6, extended r08): re-measure
the recorded scale wins and merge the numbers into the committed
SCALE_GUARD.json so the next round can diff them instead of
re-discovering the measurements.

Guarded metrics:

1. ``semdedup_two_level_wall`` — the §12d headline: end-to-end
   two-level semdedup wall at the k=100 corpus (200k vectors, k=800,
   probes=3), via the raw operator
   (`semdedup_survivors(assign="two_level", probes=3)`; k=800 ∝ √n
   per the balanced rule). §12d's recorded band is 31.7–45.1 s; flat
   assignment at the same k measured 239 s.
2. ``gemm_neardup_pairs_wall`` (r08, verdict ask #5) — the §13
   broadcast-GEMM kernel: the `embedding_neardup_pairs` registry query
   at the ×10 fixture (20k × 64f vectors). r07 recorded 25.5 s; a
   kernel regression (e.g. a chunking change) shows up here as a diff
   instead of being rediscovered at the next budget kill.
3. ``fuzzy_dup_expansion_wall`` (r11, verdict ask #5) — the
   fuzzy_part_duplicates id-expansion join at the ×100 fixture
   (4.5B output pairs), measured in its own fresh subprocess. Records
   wall AND the executed partition count of the expansion frame vs
   the configured REPARTITION_BY_NUM width: the r10 fix pinned the
   width because AQE's input-byte heuristic coalesced the explosion
   onto ~3 tasks (the shape that idles 997 of 1000 executors); a
   future AQE/conf change that re-starves it shows up here as
   partitions << width, not as a mystery budget trip.

Usage:
  python tools/make_scale_fixtures.py --k 100   # once per machine
  python tools/make_scale_fixtures.py --k 10    # for the GEMM guard
  python tools/scale_guard.py --round 8 [--sf /tmp/spark_graft_sfx100]
                                        [--sf10 /tmp/spark_graft_sfx10]

Merges {"r08": {...}} into SCALE_GUARD.json at the repo root and
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
    p.add_argument("--sf10", default="/tmp/spark_graft_sfx10",
                   help="×10 fixture for the GEMM-kernel guard")
    p.add_argument("--k", type=int, default=800)
    p.add_argument("--probes", type=int, default=3)
    p.add_argument("--round", type=int, required=True)
    p.add_argument(
        "--runs", type=int, default=2,
        help="independent measurements; min + all recorded (§12d keeps "
        "two runs on record because the box sees episodic host steal)",
    )
    args = p.parse_args()

    import subprocess

    # guard 2 FIRST, before the parent session exists: the §13
    # broadcast-GEMM pair kernel at the ×10 fixture. COLD first (r08
    # verdict #6): the §13c claim this guard protects — session-level
    # BLAS pinning halving the kernel wall — is about a COLD session's
    # first run; warm in-session repeats stay fast even if the pinning
    # silently unwinds (threads already spawned, pages warm).
    # Cold AND warm both come from the fresh subprocess: measuring the
    # warm repeats in THIS session (after two 200k-vector semdedup
    # passes) inflated them 3-10x from accumulated JVM heap debris —
    # the same cross-query contamination the sweep's --restart-every
    # exists for. In a clean session the warm wall is stable (r10:
    # 2.0-3.5 s over five repeats); measured here it ranged 5.9-21.7 s
    # run to run. A guard that smears its own metric with another
    # workload's garbage can only cry wolf.
    cold_script = (
        "import time, sys; "
        "sys.path.insert(0, '.'); "
        "from covid19_etl_pipeline_spark.session import get_spark; "
        "from covid19_etl_pipeline_spark.plans.queries import REGISTRY; "
        "spark = get_spark(app_name='scale-guard-cold'); "
        f"df = REGISTRY['embedding_neardup_pairs'].fn(spark, {args.sf10!r}); "
        "t0 = time.perf_counter(); "
        "df.write.format('noop').mode('overwrite').save(); "
        "print('COLD_WALL', round(time.perf_counter() - t0, 1)); "
        f"walls = []\n"
        f"for _ in range({args.runs}):\n"
        f"    df = REGISTRY['embedding_neardup_pairs'].fn(spark, {args.sf10!r})\n"
        f"    t0 = time.perf_counter()\n"
        f"    df.write.format('noop').mode('overwrite').save()\n"
        f"    walls.append(round(time.perf_counter() - t0, 1))\n"
        f"    print('WARM_WALL', walls[-1])\n"
        "spark.stop()"
    )
    repo_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-c", cold_script],
        capture_output=True,
        text=True,
        cwd=repo_dir,
    )
    gemm_cold = None
    gemm_walls = []
    for ln in out.stdout.splitlines():
        if ln.startswith("COLD_WALL"):
            gemm_cold = float(ln.split()[1])
        elif ln.startswith("WARM_WALL"):
            gemm_walls.append(float(ln.split()[1]))
    print(
        f"# gemm cold run: {gemm_cold}s, warm: {gemm_walls}", file=sys.stderr
    )

    # guard 3, also in its own fresh subprocess (same contamination
    # rule as the GEMM guard): the fuzzy-dup id-expansion join at ×100.
    # One noop-write execution for the wall, then the executed
    # partition count of the expansion frame (a second execution — the
    # .rdd conversion finalizes the AQE plan) checked against the
    # configured REPARTITION_BY_NUM width.
    fuzzy_script = (
        "import time, sys\n"
        "sys.path.insert(0, '.')\n"
        "from covid19_etl_pipeline_spark.session import get_spark\n"
        "from covid19_etl_pipeline_spark.plans.dedup import fuzzy_part_expansion\n"
        "spark = get_spark(app_name='scale-guard-fuzzy')\n"
        f"df = fuzzy_part_expansion(spark, {args.sf!r})\n"
        "t0 = time.perf_counter()\n"
        "df.write.format('noop').mode('overwrite').save()\n"
        "print('FUZZY_WALL', round(time.perf_counter() - t0, 1))\n"
        f"df = fuzzy_part_expansion(spark, {args.sf!r})\n"
        "print('FUZZY_PARTS', df.rdd.getNumPartitions())\n"
        # expected width via the SAME function the plan uses (width is
        # now derived from the real base count, not a conf constant —
        # at the x100 fixture both resolve to cores*4)
        "from covid19_etl_pipeline_spark.plans.dedup import fuzzy_expansion_width\n"
        "from covid19_etl_pipeline_spark.catalog import load_table\n"
        f"n_base = load_table(spark, {args.sf!r}, 'part').count()\n"
        "print('FUZZY_WIDTH', fuzzy_expansion_width(n_base, "
        "int(spark.conf.get('spark.sql.shuffle.partitions'))))\n"
        "spark.stop()\n"
    )
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_DRIVER_MEM", "12g")
    fz = subprocess.run(
        [sys.executable, "-c", fuzzy_script],
        capture_output=True,
        text=True,
        cwd=repo_dir,
        env=env,
    )
    fuzzy_wall = fuzzy_parts = fuzzy_width = None
    for ln in fz.stdout.splitlines():
        if ln.startswith("FUZZY_WALL"):
            fuzzy_wall = float(ln.split()[1])
        elif ln.startswith("FUZZY_PARTS"):
            fuzzy_parts = int(ln.split()[1])
        elif ln.startswith("FUZZY_WIDTH"):
            fuzzy_width = int(ln.split()[1])
    print(
        f"# fuzzy expansion: wall {fuzzy_wall}s, partitions "
        f"{fuzzy_parts} (configured width {fuzzy_width})",
        file=sys.stderr,
    )

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
        "gemm_guard": {
            "metric": "gemm_neardup_pairs_wall",
            "query": "embedding_neardup_pairs",
            "sf_dir": args.sf10,
            # cold = fresh-session subprocess first run (the number a
            # BLAS-pinning regression actually moves); warm = repeats
            # in this already-hot session (r08 verdict #6: recording
            # only warm hid the claim under guard)
            "wall_sec_cold": gemm_cold,
            "wall_sec_warm_min": min(gemm_walls) if gemm_walls else None,
            "wall_sec_warm_all": gemm_walls,
        },
        "fuzzy_expansion_guard": {
            "metric": "fuzzy_dup_expansion_wall",
            "query": "fuzzy_part_duplicates (expansion sub-plan)",
            "sf_dir": args.sf,
            "wall_sec": fuzzy_wall,
            # the tripwire: executed partitions must be >= the
            # configured REPARTITION_BY_NUM width (AQE re-starvation
            # shows up as partitions << width)
            "expansion_partitions": fuzzy_parts,
            "configured_width": fuzzy_width,
            "width_ok": (
                fuzzy_parts is not None
                and fuzzy_width is not None
                and fuzzy_parts >= fuzzy_width
            ),
        },
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
