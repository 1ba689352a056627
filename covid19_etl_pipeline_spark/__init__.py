"""covid19_etl_pipeline_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first engine with the query and data-processing
capabilities of the reference ETL pipeline (RSangDev/covid19-etl-pipeline),
re-expressed on the DataFrame / Spark SQL API and extended with
large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing).

Design stance (SURVEY.md §7.1):
- DataFrame API + Spark SQL only; no pandas in the distributed data path.
- Explicit StructType schemas; no runtime schema inference in production paths.
- No row-at-a-time Python UDFs on the parity surface; Arrow-vectorized
  pandas UDFs only where built-ins genuinely cannot express the semantics.
- AQE on; broadcast joins for dimensions; partitioned windows at raw grain.
"""

from covid19_etl_pipeline_spark.session import get_spark, stop_spark
from covid19_etl_pipeline_spark.catalog import TABLES, register_tables, load_table

__version__ = "0.1.0"

__all__ = [
    "get_spark",
    "stop_spark",
    "TABLES",
    "register_tables",
    "load_table",
    "__version__",
]
