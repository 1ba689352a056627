"""Scale-curvature spot-bench (SCALE.md §12, r04 verdict #6): wall
clock AND shuffle volume for the heaviest registry queries at one
sf dir. Run it twice — on the real sf0.1-derived k=1 fixture and the
k=10 fixture from tools/make_scale_fixtures.py — and compare:

  python tools/scale_spotcheck.py --sf /tmp/spark_graft_sfx1
  python tools/scale_spotcheck.py --sf /tmp/spark_graft_sfx10

Shuffle bytes come from the AppStatusStore stage list (delta across
each query), so the ratio between scales is the engine's REAL shuffle
growth, not an estimate. One line of JSON per run.
"""

from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_QUERIES = (
    "prefix_jaccard_pairs",
    "frequent_part_pairs",
    "training_corpus",
    "semdedup_survivors",
    "nation_trade_pagerank",
)


def shuffle_totals(spark) -> tuple[int, int]:
    """(write, read) shuffle bytes accumulated by all stages so far."""
    jvm = spark._jvm
    gw = spark.sparkContext._gateway
    store = spark.sparkContext._jsc.sc().statusStore()
    it = store.stageList(
        jvm.java.util.ArrayList(),
        False,
        False,
        gw.new_array(jvm.double, 0),
        jvm.java.util.ArrayList(),
    ).iterator()
    w = r = 0
    while it.hasNext():
        s = it.next()
        w += s.shuffleWriteBytes()
        r += s.shuffleReadBytes()
    return w, r


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--sf", required=True)
    p.add_argument("--queries", default=",".join(DEFAULT_QUERIES))
    args = p.parse_args()

    from covid19_etl_pipeline_spark.plans.queries import REGISTRY
    from covid19_etl_pipeline_spark.session import get_spark

    spark = get_spark(
        app_name="scale-spotcheck",
        # k=10 pair expansions need a real heap (same sizing note as
        # tools/pcy_crossover.py); irrelevant at k=1
        extra_conf={"spark.driver.memory": "24g"},
    )

    def materialize(df):
        df.write.format("noop").mode("overwrite").save()

    # JVM/codegen warmup outside the measurements
    materialize(REGISTRY["rollup_entity"].fn(spark, args.sf))

    out = {}
    for name in args.queries.split(","):
        w0, r0 = shuffle_totals(spark)
        t0 = time.perf_counter()
        materialize(REGISTRY[name].fn(spark, args.sf))
        wall = round(time.perf_counter() - t0, 2)
        w1, r1 = shuffle_totals(spark)
        out[name] = {
            "wall_sec": wall,
            "shuffle_write_mb": round((w1 - w0) / 1e6, 1),
            "shuffle_read_mb": round((r1 - r0) / 1e6, 1),
        }
        print(f"# {name}: {wall}s, shuffle {out[name]['shuffle_write_mb']}MB", file=sys.stderr)
        gc.collect()

    print(json.dumps({"sf_dir": args.sf, "queries": out}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
