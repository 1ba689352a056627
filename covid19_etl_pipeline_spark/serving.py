"""Serving layer (SURVEY §2.1 S7-S10): the Spark-native replacement for
the reference's SQLite tier.

Reference mapping:
- ``create_tables`` DDL ×4 + indices (data_loader.py:59-180)
  → :func:`publish_star_schema`: partitioned parquet datasets +
  registered views (indices → partition pruning + file stats).
- truncate-and-append chunked loads (data_loader.py:200-358)
  → ``mode("overwrite")`` dataset writes (atomic per directory;
  chunking is what partitions already are).
- ``query(sql)`` ad-hoc surface (data_loader.py:406-416)
  → ``spark.sql`` over the registered views (catalog.query).
- ``print_database_stats`` (data_loader.py:393-404) → catalog.table_stats.

Every published table gets the audit ``created_at`` column the
reference's DDL defaults (data_loader.py:100 etc.).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from covid19_etl_pipeline_spark.pipeline import (
    aggregate_by_country,
    aggregate_by_date,
    transform_covid_data,
)
from covid19_etl_pipeline_spark.sources.io import write_parquet

#: Serving-table names (mirrors data_loader.py:66-160 DDL).
SERVING_TABLES = (
    "covid_cases",
    "aggregated_stats",
    "global_daily_stats",
)


def with_audit_column(df: DataFrame) -> DataFrame:
    """``created_at TIMESTAMP DEFAULT CURRENT_TIMESTAMP`` equivalent
    (data_loader.py:100) — stamped at write time."""
    return df.withColumn("created_at", F.current_timestamp())


def overwrite_table(
    spark: SparkSession,
    df: DataFrame,
    name: str,
    root: str,
    partition_by: tuple[str, ...] = (),
) -> str:
    """Truncate-and-append semantics (data_loader.py:252-262) as an
    atomic overwrite write + view registration."""
    path = write_parquet(with_audit_column(df), f"{root}/{name}", partition_by=partition_by)
    spark.read.parquet(path).createOrReplaceTempView(name)
    return path


def publish_star_schema(
    spark: SparkSession,
    covid_raw: DataFrame,
    root: str,
) -> dict[str, str]:
    """Publish the serving star: typed fact (year-partitioned), country
    rollup, global daily rollup — one cached transform, three sinks."""
    fact = transform_covid_data(covid_raw).cache()
    try:
        return {
            "covid_cases": overwrite_table(
                spark, fact, "covid_cases", root, partition_by=("year",)
            ),
            "aggregated_stats": overwrite_table(
                spark, aggregate_by_country(fact), "aggregated_stats", root
            ),
            "global_daily_stats": overwrite_table(
                spark, aggregate_by_date(fact), "global_daily_stats", root
            ),
        }
    finally:
        fact.unpersist()
