"""Query-registry infrastructure: QuerySpec, the REGISTRY dict, and
the @_register decorator family modules use.

Cross-engine determinism conventions every entry follows (Spark
DataFrame plan vs DuckDB oracle SQL):

- every computed column is aliased IDENTICALLY in Spark and SQL;
- multi-row float aggregates (sum/avg over doubles) are rounded to 4
  decimals in BOTH engines at output (summation order differs between
  engines; per-row arithmetic is left exact — IEEE ops are
  deterministic);
- every top-k / rank has a unique tie-break key;
- regexes are RE2-safe (no lookarounds) so Spark (Java regex) and
  DuckDB (RE2) agree;
- a rounded value that can be zero gets `+ 0.0` appended on BOTH
  sides (engines disagree on the sign of an IEEE -0.0 rounding
  result);
- DuckDB returns BIGINT from year/week/row_number/ntile (CAST AS INT
  to match Spark) and HUGEINT from sum(int) (CAST AS BIGINT);
- engine-specific sketch values (HLL, quantile sketches) are never
  hash-compared — the checked contract is an error bound against the
  exact value, which IS deterministic.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    description: str


REGISTRY: dict[str, QuerySpec] = {}


def _register(name: str, oracle: str | None, description: str):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        assert name not in REGISTRY, f"duplicate registry entry: {name}"
        REGISTRY[name] = QuerySpec(name, fn, oracle, description)
        return fn

    return deco
