"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``covid19_etl_pipeline_spark.plans.queries`` — one
registry entry per implemented SURVEY.md §2 operator (plus the
training-data-pipeline extension surface), each with its ANSI-SQL
oracle twin where SQL can express the semantics.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from covid19_etl_pipeline_spark.plans.queries import REGISTRY

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (multi-measure lineitem rollup, the reference's
    aggregate_by_country shape) on /root/testdata/sf0.001."""
    return REGISTRY["rollup_entity"].fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI-SQL twin per query — every registry entry
    carries one (the live streaming entries are oracled against their
    batch twins; a fully-drained finite stream equals the batch
    computation, see plans/streaming.py)."""
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
