"""Projection / cast / date-derivation operators.

Reference parity:
- cast-if-exists DOUBLE allowlist  → data_transformer.py:116-145, :182-196 (P2, F7)
- string → DATE                    → data_transformer.py:113, :179 (P3, F1)
- year/month/ISO-week derivations  → data_transformer.py:156-160 (F2-F4)
- allowlist projection + rename    → data_loader.py:213-249, :282-299 (P1)

All are narrow (no-shuffle) transformations; Catalyst folds chained
``withColumn`` casts into a single Project and prunes unused columns at
the parquet scan, so the 100 TB cost is exactly one pass over the
selected columns.
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def cast_if_exists(
    df: DataFrame,
    columns: Iterable[str],
    dtype: T.DataType | str = "double",
) -> DataFrame:
    """Cast each listed column to ``dtype`` — only if present.

    Reproduces the reference's tolerant-ingest contract (``if col in
    df.columns:`` loop, data_transformer.py:143-145): partial inputs must
    not fail. A single ``select`` keeps this one Project node regardless
    of allowlist length.
    """
    targets = {c for c in columns if c in df.columns}
    if not targets:
        return df
    return df.select(
        *[F.col(c).cast(dtype).alias(c) if c in targets else F.col(c) for c in df.columns]
    )


def parse_date(df: DataFrame, column: str = "date", fmt: str | None = None) -> DataFrame:
    """String → DateType via ``to_date`` (data_transformer.py:113)."""
    return df.withColumn(column, F.to_date(F.col(column), fmt) if fmt else F.to_date(F.col(column)))


def with_date_parts(df: DataFrame, date_col: str = "date") -> DataFrame:
    """Derive year / month / ISO week (data_transformer.py:156-160).

    ``F.weekofyear`` follows ISO-8601 (weeks start Monday, week 1 holds
    Jan 4) — matching DuckDB's ``weekofyear``.
    """
    d = F.col(date_col)
    return (
        df.withColumn("year", F.year(d))
        .withColumn("month", F.month(d))
        .withColumn("week", F.weekofyear(d))
    )


def select_rename(df: DataFrame, mapping: Mapping[str, str]) -> DataFrame:
    """Allowlist projection with rename, skipping absent source columns
    (data_loader.py:213-249: ``available_cols`` intersection).
    """
    cols = [F.col(src).alias(dst) for src, dst in mapping.items() if src in df.columns]
    return df.select(*cols)


def guarded_ratio(
    numerator: Column | str,
    denominator: Column | str,
    scale: float = 1.0,
    guard: Column | None = None,
) -> Column:
    """Null-guarded division (P6/F5/F6): ``when(denom > 0, num/denom*scale)``.

    Reference guards every ratio with ``F.when(cond).otherwise(None)``
    (data_transformer.py:148-154, :199-213) instead of relying on Spark's
    null-on-divide-by-zero, and we preserve that exactly so a SQL oracle
    can mirror it with CASE WHEN.
    """
    num = F.col(numerator) if isinstance(numerator, str) else numerator
    den = F.col(denominator) if isinstance(denominator, str) else denominator
    cond = guard if guard is not None else (den > 0)
    return F.when(cond, num / den * scale).otherwise(F.lit(None))
