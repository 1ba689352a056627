"""Named query plans: the engine's SURVEY §2 coverage surface."""

from covid19_etl_pipeline_spark.plans.queries import REGISTRY, QuerySpec

__all__ = ["REGISTRY", "QuerySpec"]
