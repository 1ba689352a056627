"""As-of (most-recent-match) join — an operator Spark lacks natively
(SURVEY §2.3 extension: the reference has no joins at all, but its
two time-keyed fact tables imply exactly this temporal enrichment).

Composed from built-ins via the union-merge pattern (preferred over a
per-group ``merge_asof`` pandas UDF — no Python in the path, one
shuffle):

1. tag right rows 0 / left rows 1, union by name;
2. per key, sort by (time, tag) — a right row at time T sorts BEFORE
   left rows at the same T, making the match inclusive (t_left >= t_right);
3. ``last(value, ignorenulls=True)`` over an unbounded-preceding running
   window carries each right value forward to all later left rows;
4. keep only left rows.

Scale: one hash exchange on the key + one per-partition sort — the same
cost as a sort-merge join; state per key is O(1) (the carried values),
so it survives arbitrarily long histories. Right rows should be unique
per (key, time) for deterministic semantics (pre-aggregate if not) —
this matches DuckDB's ASOF JOIN, which the oracle uses.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_time: str,
    right_time: str,
    value_cols: Sequence[str],
) -> DataFrame:
    """For each left row, attach ``value_cols`` from the latest right row
    of the same ``on`` key with ``right_time <= left_time`` (left join:
    no prior right row → NULLs).

    ``left`` and ``right`` must not share column names other than ``on``.
    """
    l_tagged = left.withColumn("__t", F.col(left_time)).withColumn("__is_left", F.lit(1))
    r_tagged = right.select(
        F.col(on),
        F.col(right_time).alias("__t"),
        F.lit(0).alias("__is_left"),
        *[F.col(c) for c in value_cols],
    )
    unioned = l_tagged.unionByName(r_tagged, allowMissingColumns=True)

    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__t").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned
    for c in value_cols:
        carried = carried.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return carried.filter(F.col("__is_left") == 1).drop("__t", "__is_left")
