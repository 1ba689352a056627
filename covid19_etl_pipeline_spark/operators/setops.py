"""Set operations & incremental loading (SURVEY §2.7).

The reference has no set ops; its daily refresh is truncate-and-append
(data_loader.py:252-262) and its README advertises "Incremental loading
support" (README.md:328) without implementing it. The engine provides
the real thing:

- ``union_by_name`` — schema-aligned union (tolerates column drift, the
  reference's tolerant-ingest contract extended to unions);
- ``upsert_on_key`` — incremental refresh: new snapshot wins on key
  collision, implemented as union + row_number dedup (one shuffle on the
  key — the MERGE INTO emulation for plain parquet).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def union_by_name(a: DataFrame, b: DataFrame, allow_missing: bool = True) -> DataFrame:
    """Union by column name; missing columns become NULL when
    ``allow_missing`` (Spark built-in)."""
    return a.unionByName(b, allowMissingColumns=allow_missing)


def upsert_on_key(
    current: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column] | None = None,
) -> DataFrame:
    """Keep one row per key, preferring ``updates`` over ``current``.

    Default preference is source priority (updates first); pass
    ``order_by`` to override (e.g. latest timestamp wins). Single shuffle
    on ``keys``.
    """
    tagged = union_by_name(
        updates.withColumn("__src_priority", F.lit(0)),
        current.withColumn("__src_priority", F.lit(1)),
    )
    ordering = list(order_by) if order_by else [F.col("__src_priority").asc()]
    w = Window.partitionBy(*keys).orderBy(*ordering)
    return (
        tagged.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__src_priority")
    )
