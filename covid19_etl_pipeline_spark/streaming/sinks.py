"""Streaming file sinks: checkpointed parquet egress.

The memory sink (tests) and foreachBatch MERGE (keyed tables) cover
two of the three sink shapes; this module adds the third — the
append-only file sink every archival/staging pipeline uses. Spark's
file sink is exactly-once BY CONSTRUCTION: the checkpoint's write-ahead
log records which micro-batch wrote which files, so a restarted query
resumes from the last committed batch and never re-emits rows
(reference parity: the truncate-and-reload loader
src/load/data_loader.py:200-262, replaced by incremental append +
recovery instead of a daily full rewrite).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def stream_to_parquet(
    df: DataFrame,
    path: str,
    checkpoint: str,
    query_name: str = "parquet_sink",
) -> StreamingQuery:
    """Append a streaming DataFrame to a parquet directory with a
    checkpointed write-ahead log.

    Restarting with the SAME checkpoint resumes after the last
    committed micro-batch: already-processed input files are never
    re-read, so output rows are exactly-once end-to-end. The caller
    drives the query (processAllAvailable/stop) — production would use
    a trigger interval instead.
    """
    return (
        df.writeStream.outputMode("append")
        .format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .queryName(query_name)
        .start()
    )
