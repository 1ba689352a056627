"""Stateful streaming: session windows + applyInPandasWithState
(SURVEY §2.9 extension surface).

The batch form of ``session_rollup`` is checked against an independent
pandas re-derivation; the streaming forms are checked against their
batch twins on the same data (the engine's stream==batch invariant).
"""

from __future__ import annotations

import os
import shutil

import pandas as pd
from pyspark.sql import functions as F

from covid19_etl_pipeline_spark.catalog import load_table
from covid19_etl_pipeline_spark.sources.io import write_parquet
from covid19_etl_pipeline_spark.streaming.daily_rollup import EVENTS_SCHEMA
from covid19_etl_pipeline_spark.streaming.stateful import (
    session_rollup,
    stateful_running_totals,
    streaming_session_rollup,
)

GAP = pd.Timedelta(minutes=30)


def _events(spark, sf_dir, max_user=10):
    return load_table(spark, sf_dir, "events").filter(F.col("user_id") < max_user)


def _pandas_sessions(pdf: pd.DataFrame) -> set[tuple]:
    """Independent session derivation: sort per user, split where the
    inter-event gap is >= 30 min (session_window half-open [start,
    start+gap) semantics), aggregate count/sum/bounds."""
    out = []
    for uid, g in pdf.sort_values(["user_id", "ts", "event_id"]).groupby("user_id"):
        cur = []
        prev = None
        for row in g.itertuples():
            if prev is not None and (row.ts - prev) >= GAP:
                out.append((uid, cur))
                cur = []
            cur.append(row)
            prev = row.ts
        out.append((uid, cur))
    return {
        (
            uid,
            rows[0].ts,
            rows[-1].ts + GAP,
            len(rows),
            round(sum(r.value for r in rows), 4),
        )
        for uid, rows in out
    }


def test_batch_session_rollup_matches_pandas_oracle(spark, sf_dir):
    ev = _events(spark, sf_dir)
    got = {
        (
            r["user_id"],
            r["session_start"],
            r["session_end"],
            r["n_events"],
            round(r["session_value"], 4),
        )
        for r in session_rollup(ev).collect()
    }
    expected = _pandas_sessions(ev.toPandas())
    assert got == expected


def _stage_stream_dir(spark, df, tmp_path, name, n_files=1):
    """Write `df` as exactly `n_files` parquet files into the staging
    area and copy them into the stream dir with increasing mtimes so the
    file source picks them up in a deterministic order."""
    stream_dir = tmp_path / name
    stream_dir.mkdir(exist_ok=True)
    stage = tmp_path / f"_stage_{name}_{len(os.listdir(stream_dir))}"
    # repartition (not coalesce): the source may have fewer partitions
    # than n_files, and coalesce can only shrink
    write_parquet(df.repartition(n_files), str(stage))
    t = 1_700_000_000 + len(os.listdir(stream_dir)) * 10
    for i, f in enumerate(sorted(p for p in os.listdir(stage) if p.endswith(".parquet"))):
        dst = stream_dir / f"{len(os.listdir(stream_dir)):03d}.parquet"
        shutil.copy(stage / f, dst)
        os.utime(dst, (t + i, t + i))
    return str(stream_dir)


def _drain(stream_df, query_name, output_mode):
    q = (
        stream_df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_streaming_session_rollup_matches_batch(spark, sf_dir, tmp_path):
    """Append-mode session windows: a far-future sentinel event advances
    the watermark so every real session finalizes and is emitted."""
    ev = _events(spark, sf_dir, max_user=5)
    src = _stage_stream_dir(spark, ev, tmp_path, "sess")

    max_ts = ev.agg(F.max("ts")).first()[0]
    sentinel = spark.createDataFrame(
        [(10**9, max_ts + pd.Timedelta(days=30), 9999, "sentinel", 0.0, "{}")],
        EVENTS_SCHEMA,
    )
    _stage_stream_dir(spark, sentinel, tmp_path, "sess")
    # second sentinel => one more micro-batch after the watermark jump,
    # guaranteeing the finalized windows are flushed to the sink
    _stage_stream_dir(
        spark,
        sentinel.withColumn("ts", F.col("ts") + F.expr("INTERVAL 1 DAY")),
        tmp_path,
        "sess",
    )

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    _drain(streaming_session_rollup(stream), "t_sessions", "append")

    got = {
        (r["user_id"], r["session_start"], r["n_events"], round(r["session_value"], 4))
        for r in spark.sql("SELECT * FROM t_sessions").collect()
        if r["user_id"] != 9999
    }
    expected = {
        (r["user_id"], r["session_start"], r["n_events"], round(r["session_value"], 4))
        for r in session_rollup(ev).collect()
    }
    assert got == expected
    assert len(got) > 0


def test_stateful_running_totals_matches_batch(spark, sf_dir, tmp_path):
    """applyInPandasWithState lifetime counters: the last update emitted
    per user (the one with the max n_events) must equal the batch
    groupBy totals, even with the input split across micro-batches."""
    ev = _events(spark, sf_dir, max_user=8)
    src = _stage_stream_dir(spark, ev, tmp_path, "totals", n_files=3)

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    _drain(stateful_running_totals(stream), "t_totals", "update")

    final = spark.sql(
        """
        SELECT user_id,
               max(n_events) AS n_events,
               max_by(total_value, n_events) AS total_value
        FROM t_totals GROUP BY user_id
        """
    ).collect()
    got = {r["user_id"]: (r["n_events"], round(r["total_value"], 4)) for r in final}
    expected = {
        r["user_id"]: (r["n"], round(r["tv"], 4))
        for r in ev.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("tv"))
        .collect()
    }
    assert got == expected
    # multiple micro-batches => at least one user saw >1 update
    n_updates = spark.sql("SELECT count(*) AS n FROM t_totals").first()["n"]
    assert n_updates > len(expected)
