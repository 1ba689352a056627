"""PCY crossover measurement (r03 verdict #7).

At sf0.1 `frequent_part_pairs_pcy` benches SLOWER than the plain
a-priori `frequent_part_pairs` — its docstring promises the payoff at
larger pair spaces. This script measures WHERE that crossover actually
is, on a synthetic basket corpus whose pair space is controlled, and
exposes the load-bearing parameter the fixed-size registry query hides:
**the bucket count must scale with the candidate-pair space**. With
B = 65536 buckets and P candidate pairs, mean bucket load P/B exceeds
any reasonable min-support once P >~ 1M — NO bucket prunes and PCY is
pure overhead at every scale. Pruning returns when B ≳ P / minsup.

Both pipelines share one generated basket frame (lazily checkpointed)
and the same in-basket pair expansion:

- a-priori: expand pairs -> groupBy(pair) count -> filter minsup
  (every candidate pair enters the pair-key shuffle);
- PCY:      expand pairs -> groupBy(hash(pair) % B) count (map-side
  combined, B counters per partition) -> frequent buckets broadcast as
  a semi filter -> groupBy(pair) on survivors only.

PCY wins exactly when (pair-shuffle rows saved) x (row cost) exceeds
(second expansion pass + bucket pass + broadcast). Results are recorded
in SCALE.md §11.

Usage:
  python tools/pcy_crossover.py [--baskets 100000] [--size 20]
      [--head 50] [--tail 2000000] [--minsup 10]
      [--buckets 65536,4194304]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def build_baskets(spark, n_baskets: int, size: int, head: int, tail: int):
    """Deterministic synthetic baskets: ~30% of slots draw from a
    `head`-item popular set (these form the frequent pairs), the rest
    from a `tail`-item long tail (these form the once-seen pair noise
    PCY exists to prune). xxhash64-derived, so runs are reproducible."""
    b = spark.range(n_baskets).select(F.col("id").alias("basket"))
    slot = F.sequence(F.lit(1), F.lit(size))
    item = lambda j: F.when(  # noqa: E731
        F.pmod(F.xxhash64(F.col("basket") * 37 + j, F.lit("pick")), F.lit(10)) < 3,
        F.pmod(F.xxhash64(F.col("basket"), j, F.lit("head")), F.lit(head)),
    ).otherwise(
        F.lit(head)
        + F.pmod(F.xxhash64(F.col("basket"), j, F.lit("tail")), F.lit(tail))
    )
    return (
        b.select(
            "basket",
            F.sort_array(
                F.array_distinct(F.transform(slot, lambda j: item(j)))
            ).alias("arr"),
        )
        .filter(F.size("arr") >= 2)
        .localCheckpoint(eager=False)
    )


def pair_structs(arr="arr"):
    n = F.size(arr)
    return F.flatten(
        F.transform(
            arr,
            lambda x, i: F.transform(
                F.slice(arr, i + F.lit(2), n - i - 1),
                lambda y: F.struct(x.alias("a"), y.alias("b")),
            ),
        )
    )


def expand(baskets):
    return baskets.select(F.explode(pair_structs()).alias("p")).select(
        "p.a", "p.b"
    )


def apriori_pairs(baskets, minsup: int):
    return (
        expand(baskets)
        .groupBy("a", "b")
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= minsup)
    )


def pcy_pairs(baskets, minsup: int, n_buckets: int):
    pairs = expand(baskets)
    bkt = F.pmod(F.xxhash64("a", "b"), F.lit(n_buckets))
    freq_buckets = (
        pairs.groupBy(bkt.alias("bkt"))
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") >= minsup)
        .select("bkt")
    )
    return (
        pairs.withColumn("bkt", bkt)
        .join(F.broadcast(freq_buckets), "bkt", "left_semi")
        .groupBy("a", "b")
        .agg(F.count("*").alias("support"))
        .filter(F.col("support") >= minsup)
    )


def timed(df) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 2)


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--baskets", type=int, default=100_000)
    p.add_argument("--size", type=int, default=20)
    p.add_argument("--head", type=int, default=50)
    p.add_argument("--tail", type=int, default=2_000_000)
    p.add_argument("--minsup", type=int, default=10)
    p.add_argument("--buckets", default="65536,4194304")
    args = p.parse_args()

    from covid19_etl_pipeline_spark.session import get_spark

    # the default 1g local-mode driver heap OOMs on the ~19M-pair
    # expansion (32 concurrent tasks each holding pair arrays + the
    # lazily checkpointed basket blocks); the experiment needs a real
    # heap, it is not a plan defect
    spark = get_spark(
        app_name="pcy-crossover",
        extra_conf={"spark.driver.memory": "24g"},
    )
    baskets = build_baskets(
        spark, args.baskets, args.size, args.head, args.tail
    )
    n_baskets = baskets.count()  # materializes the checkpoint
    n_pairs = expand(baskets).count()
    truth = apriori_pairs(baskets, args.minsup)
    n_freq = truth.count()
    print(
        f"baskets={n_baskets} candidate_pairs={n_pairs} "
        f"frequent_pairs={n_freq} minsup={args.minsup}"
    )

    # warm codegen on both shapes before measuring
    timed(apriori_pairs(baskets, args.minsup))
    for run in (1, 2):
        t_ap = timed(apriori_pairs(baskets, args.minsup))
        print(f"run{run} apriori: {t_ap}s (shuffles all {n_pairs} pairs)")
        for b in (int(x) for x in args.buckets.split(",")):
            pcy = pcy_pairs(baskets, args.minsup, b)
            # lossless check once per bucket count (counts must agree —
            # a bucket holding a frequent pair always reaches minsup)
            if run == 1:
                assert pcy.count() == n_freq, f"PCY B={b} lost pairs"
            surv = (
                expand(baskets)
                .withColumn(
                    "bkt", F.pmod(F.xxhash64("a", "b"), F.lit(b))
                )
                .join(
                    F.broadcast(
                        expand(baskets)
                        .groupBy(
                            F.pmod(F.xxhash64("a", "b"), F.lit(b)).alias("bkt")
                        )
                        .agg(F.count("*").alias("c"))
                        .filter(F.col("c") >= args.minsup)
                        .select("bkt")
                    ),
                    "bkt",
                    "left_semi",
                )
                .count()
                if run == 1
                else None
            )
            t_pcy = timed(pcy)
            extra = (
                f" pair-shuffle rows {n_pairs} -> {surv} "
                f"({100.0 * surv / n_pairs:.1f}%)"
                if surv is not None
                else ""
            )
            print(f"run{run} pcy B={b}: {t_pcy}s{extra}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
