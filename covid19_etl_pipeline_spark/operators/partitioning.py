"""Physical-layout operators: parallelism spreading and skew handling.

Scale rationale (SURVEY §7.4, BASELINE north star):

- ``spread``: a parquet dataset smaller than one split executes as ONE
  task no matter how many cores exist — any expensive per-row compute
  downstream (md5 minhashing, regex feature extraction, vector math)
  becomes single-threaded. One explicit round-robin/hash repartition
  buys full parallelism for the cost of shuffling the (small) input
  once. At real 100 TB scale inputs arrive in thousands of splits and
  ``spread`` is a no-op decision — it exists for the
  small-table-expensive-compute regime (docs/embeddings side tables).
- ``salted_equi_join``: hot keys turn one shuffle partition into the
  straggler. Salting replicates the small side ``salt`` ways and
  scatters the big side's hot keys across them. AQE's skew-join split
  handles most cases at runtime; explicit salting is for the extreme
  (power-law keys) where even split partitions overwhelm one executor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def spread(df: DataFrame, *key_cols: str, partitions: int | None = None) -> DataFrame:
    """Repartition to the session's shuffle parallelism so downstream
    per-row compute uses every core (hash on ``key_cols`` when given,
    else round-robin)."""
    if partitions is None:
        partitions = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    if key_cols:
        return df.repartition(partitions, *key_cols)
    return df.repartition(partitions)


def salted_equi_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi join: salt the big side's key, replicate the
    small side across all salt values, join on (key, salt).

    Correct for 1:N joins where ``small`` has unique keys. Cost: small
    side is written ``salt``× (usually broadcast anyway); big side's hot
    partitions split ``salt`` ways.
    """
    # per-ROW salt on the big side (a per-key salt would keep the hot
    # key in one partition and defeat the point); seeded for replayability
    big_salted = big.withColumn("__salt", F.floor(F.rand(seed=42) * salt).cast("int"))
    small_salted = small.withColumn(
        "__salt_arr", F.sequence(F.lit(0), F.lit(salt - 1))
    ).withColumn("__salt", F.explode("__salt_arr")).drop("__salt_arr")
    out = big_salted.join(small_salted, on=[on, "__salt"], how=how)
    return out.drop("__salt")
