"""Source/sink round-trips (SURVEY §2.1) + streaming + multimodal tests."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from covid19_etl_pipeline_spark.catalog import load_table, register_tables, table_stats
from covid19_etl_pipeline_spark.operators.multimodal import (
    extract_features,
    filter_by_metadata,
    frame_sample_plan,
)
from covid19_etl_pipeline_spark.sources.io import (
    read_csv,
    read_parquet,
    validate_source,
    write_parquet,
)
from covid19_etl_pipeline_spark.streaming.daily_rollup import (
    read_events_stream,
    run_to_memory_sink,
    streaming_daily_rollup,
)

CSV_SCHEMA = T.StructType(
    [T.StructField("col1", T.LongType()), T.StructField("col2", T.StringType())]
)


def test_csv_roundtrip_explicit_schema(spark, tmp_path):
    """Reference CSV round-trip (tests/test_transformer.py:63-78), with
    the engine's explicit-schema contract instead of inference."""
    p = tmp_path / "t.csv"
    p.write_text("col1,col2\n1,a\n2,b\n3,c\n")
    df = read_csv(spark, str(p), schema=CSV_SCHEMA)
    assert df.count() == 3
    assert dict(df.dtypes) == {"col1": "bigint", "col2": "string"}
    assert validate_source(df)


def test_parquet_roundtrip_partitioned(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a", 2020), (2, "b", 2021), (3, "c", 2021)], ["id", "v", "year"]
    )
    out = str(tmp_path / "pq")
    write_parquet(df, out, partition_by=("year",))
    back = read_parquet(spark, out)
    assert back.count() == 3
    # partition pruning: only the year=2021 directory is scanned
    pruned = back.filter(F.col("year") == 2021)
    assert pruned.count() == 2
    files = pruned.select(F.input_file_name().alias("f")).distinct().collect()
    assert all("year=2021" in r["f"] for r in files)


def test_validate_source_rejects_empty(spark):
    empty = spark.createDataFrame([], T.StructType([T.StructField("a", T.LongType())]))
    assert not validate_source(empty)


def test_register_tables_and_stats(spark, sf_dir):
    registered = register_tables(spark, sf_dir)
    assert "lineitem" in registered
    assert spark.sql("SELECT count(*) AS n FROM lineitem").first()["n"] == 6000
    stats = table_stats(spark, ("lineitem", "orders"))
    assert stats == {"lineitem": 6000, "orders": 1500}


def test_streaming_daily_rollup_matches_batch(spark, sf_dir, tmp_path):
    """Drive the file-source stream to completion; the windowed rollup
    must agree with the batch groupBy on the same data."""
    events = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "events_stream")
    write_parquet(events, src)

    stream = read_events_stream(spark, src, max_files_per_trigger=2)
    run_to_memory_sink(streaming_daily_rollup(stream), query_name="t_stream")
    got = {
        r["event_date"]: (round(r["total_value"], 4), r["users_reporting"])
        for r in spark.sql("SELECT * FROM t_stream").collect()
    }
    expected = {
        r["event_date"]: (round(r["tv"], 4), r["n"])
        for r in events.groupBy(F.to_date("ts").alias("event_date"))
        .agg(F.sum("value").alias("tv"), F.count("user_id").alias("n"))
        .collect()
    }
    assert got == expected


def _assets(spark):
    rows = [
        (1, "image/png", bytearray(b"\x89PNG fake bytes"), 640, 480, None),
        (2, "video/mp4", bytearray(b"\x00\x00ftyp fake"), 1920, 1080, 3500),
        (3, "image/jpeg", None, 32, 32, None),
    ]
    return spark.createDataFrame(
        rows, "asset_id long, mime_type string, payload binary, "
              "width int, height int, duration_ms long"
    )


def test_multimodal_feature_extraction(spark):
    out = extract_features(_assets(spark)).collect()
    by_id = {r["asset_id"]: r for r in out}
    assert by_id[1]["n_bytes"] == 15
    assert len(by_id[1]["features"]) == 8
    assert abs(sum(by_id[1]["features"]) - 1.0) < 1e-3   # histogram normalized
    assert by_id[3]["n_bytes"] == 0
    # determinism: same payload → same features
    again = {r["asset_id"]: r for r in extract_features(_assets(spark)).collect()}
    assert again[1]["features"] == by_id[1]["features"]


def test_multimodal_metadata_filters_and_frames(spark):
    assets = _assets(spark)
    assert filter_by_metadata(assets, mime_prefix="image/").count() == 2
    assert filter_by_metadata(assets, min_width=640).count() == 2
    frames = frame_sample_plan(assets, every_ms=1000).collect()
    # 3500ms video at 1fps → frames at 0,1000,2000,3000
    assert [r["frame_ts_ms"] for r in frames] == [0, 1000, 2000, 3000]


def test_wav_codec_roundtrip():
    """Pure-python WAV codec: encode→decode must be identity on
    samples, rate, and channels; extra chunks and padding tolerated."""
    import struct

    from covid19_etl_pipeline_spark.operators.multimodal import (
        decode_wav,
        encode_wav_pcm16,
    )

    samples = [0, 1, -1, 32767, -32768, 1234, -4321]
    blob = encode_wav_pcm16(samples, sample_rate=16000)
    rate, ch, back = decode_wav(blob)
    assert (rate, ch, back) == (16000, 1, samples)

    # tolerate an extra (odd-length, word-padded) chunk before data
    extra = struct.pack("<4sI", b"LIST", 3) + b"abc\x00"
    patched = blob[:12] + extra + blob[12:]
    assert decode_wav(patched)[2] == samples

    import pytest

    with pytest.raises(ValueError):
        decode_wav(b"not a wav")
    # non-PCM fmt rejected
    bad = bytearray(blob)
    bad[20] = 3  # audio_fmt = IEEE float
    with pytest.raises(ValueError):
        decode_wav(bytes(bad))


def test_wav_rms_segments(spark):
    """Distributed decode+RMS: a constant-amplitude square wave has
    RMS exactly equal to its amplitude in every window."""
    from covid19_etl_pipeline_spark.operators.multimodal import (
        encode_wav_pcm16,
        wav_rms_segments,
    )

    amp = 1000
    samples = [amp if k % 2 == 0 else -amp for k in range(300)]
    assets = spark.createDataFrame(
        [(7, bytearray(encode_wav_pcm16(samples)))], "asset_id long, payload binary"
    )
    rows = wav_rms_segments(assets, window=160, hop=80).collect()
    assert [r["seg_start"] for r in rows] == [0, 80, 160, 240]
    assert all(r["n_samples"] == 300 for r in rows)
    assert all(abs(r["rms"] - amp) < 1e-9 for r in rows)


def test_png_codec_roundtrip():
    """Pure-python PNG codec: encode→decode identity for every
    supported channel count. The encoder cycles scanline filters
    (row % 5), so any image with ≥5 rows exercises ALL five unfilter
    paths — a pixel-exact round trip proves each one."""
    import numpy as np
    import pytest

    from covid19_etl_pipeline_spark.operators.multimodal import (
        decode_image,
        decode_png,
        encode_png,
    )

    rng = np.random.default_rng(42)
    for shape in [(9, 7, 3), (6, 4, 1), (8, 5, 4), (5, 6, 2), (7, 3)]:
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        w, h, back = decode_png(encode_png(px))
        exp = px[:, :, None] if px.ndim == 2 else px
        assert (w, h) == (exp.shape[1], exp.shape[0])
        assert np.array_equal(back, exp)

    # deterministic blobs (fixture/fingerprint contract)
    assert encode_png(px) == encode_png(px)
    # decode_image dispatches PNG; a JPEG-sniffed but malformed payload
    # hits the real SOF0 codec and raises ValueError (not the stub
    # path); lossy WebP raises ValueError via the VP8L dispatch, while
    # formats with no in-repo codec (AVIF) still raise honestly
    w, h, _ = decode_image(encode_png(px))
    assert (w, h) == (3, 7)
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xe0 fake jpeg")
    with pytest.raises(ValueError):
        decode_image(b"RIFF\x10\x00\x00\x00WEBPVP8 \x04\x00\x00\x00abcd")
    with pytest.raises(NotImplementedError):
        decode_image(b"\x00\x00\x00\x1cftypavif fake avif payload")
    with pytest.raises(ValueError):
        decode_png(b"not a png")


def test_ppm_codec_roundtrip():
    """Pure-stdlib binary-netpbm codec: P6 (RGB) and P5 (grayscale)
    encode→decode identity, comment-tolerant header parsing, and the
    raise-rather-than-mis-decode contract for malformed payloads."""
    import numpy as np
    import pytest

    from covid19_etl_pipeline_spark.operators.multimodal import (
        decode_image,
        decode_ppm,
        encode_ppm,
    )

    rng = np.random.default_rng(7)
    for shape in [(9, 7, 3), (6, 4, 1), (5, 6)]:
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        w, h, back = decode_ppm(encode_ppm(px))
        exp = px[:, :, None] if px.ndim == 2 else px
        assert (w, h) == (exp.shape[1], exp.shape[0])
        assert np.array_equal(back, exp)

    # deterministic blobs + decode_image dispatch
    assert encode_ppm(px) == encode_ppm(px)
    w, h, _ = decode_image(encode_ppm(px))
    assert (w, h) == (6, 5)
    # netpbm allows '#' comments anywhere between header tokens
    commented = b"P6\n# a comment\n2 1\n# another\n255\n" + bytes(6)
    w, h, back = decode_ppm(commented)
    assert (w, h) == (2, 1) and back.shape == (1, 2, 3)
    # malformed payloads raise ValueError, never mis-decode
    with pytest.raises(ValueError):
        decode_ppm(b"P6\n2 1\n65535\n" + bytes(12))  # 16-bit maxval
    with pytest.raises(ValueError):
        decode_ppm(b"P6\n2 1\n255\n" + bytes(3))  # short raster
    with pytest.raises(ValueError):
        decode_ppm(b"P6\nx 1\n255\n" + bytes(6))  # non-numeric header
    # a 4-channel array has no netpbm form
    with pytest.raises(ValueError):
        encode_ppm(np.zeros((2, 2, 4), dtype=np.uint8))
    # non-netpbm payload falls through decode_image to the stub path
    with pytest.raises(NotImplementedError):
        decode_image(b"P9 not a real magic")
    # CRLF after maxval (Windows writers): when the length proves the
    # LF is the separator's second byte, skip it — identical pixels
    crlf = b"P6\n2 1\n255\r\n" + bytes(range(6))
    w, h, back = decode_ppm(crlf)
    assert (w, h) == (2, 1) and back.tobytes() == bytes(range(6))
    # ...when the length proves the LF is the FIRST raster byte, keep it
    strict = b"P6\n2 1\n255\r" + b"\n" + bytes(5)
    w, h, back = decode_ppm(strict)
    assert back.tobytes() == b"\n" + bytes(5)
    # ...a strict \r-separated payload whose raster begins with \n AND
    # carries trailing bytes keeps the strict reading (trailing bytes
    # were always tolerated; the exact-CRLF fit is the ONLY override —
    # ADVICE r06)
    w, h, back = decode_ppm(strict + b"trailing junk")
    assert back.tobytes() == b"\n" + bytes(5)
    # ...and a genuinely short raster still raises — never shift
    with pytest.raises(ValueError):
        decode_ppm(b"P6\n2 1\n255\r\n" + bytes(4))


def test_bmp_sniff_tolerates_zero_bfsize():
    """Many real-world BMP writers emit bfSize=0 (the field is
    unreliable in the wild); the sniff accepts 0 or the true payload
    length and still rejects a random 'BM'-prefixed blob, so external
    BMPs decode instead of bouncing to NotImplementedError."""
    import numpy as np
    import pytest

    from covid19_etl_pipeline_spark.operators.multimodal import (
        _sniff_bmp,
        decode_bmp,
        decode_image,
        encode_bmp,
    )

    px = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    blob = bytearray(encode_bmp(px))
    assert _sniff_bmp(bytes(blob))
    # zero out bfSize (bytes 2..6) — still a decodable BMP
    blob[2:6] = b"\x00\x00\x00\x00"
    assert _sniff_bmp(bytes(blob))
    w, h, back = decode_image(bytes(blob))
    assert (w, h) == (3, 2) and np.array_equal(back, px)
    # a WRONG nonzero bfSize is still rejected (not a sniff match)...
    blob[2:6] = (len(blob) + 7).to_bytes(4, "little")
    assert not _sniff_bmp(bytes(blob))
    # ...and a 'BM'-prefixed non-BMP blob never sniffs as BMP
    assert not _sniff_bmp(b"BM" + bytes(60))
    # decode_bmp itself still enforces its contract on truncated input
    good = encode_bmp(px)
    with pytest.raises(ValueError):
        decode_bmp(good[:40])


def test_png_resize_nn_and_stats(spark):
    """Distributed decode→NN-resize→re-encode→decode: a constant-color
    image stays constant through resize; dims follow the integer
    fit-into-box rule; per-channel stats read the true pixel values."""
    import numpy as np

    from covid19_etl_pipeline_spark.operators.multimodal import (
        encode_png,
        png_channel_stats,
        png_resize_nn,
    )

    px = np.full((20, 40, 3), 0, dtype=np.uint8)
    px[:, :, 0] = 7
    px[:, :, 1] = 200
    px[:, :, 2] = 55
    assets = spark.createDataFrame(
        [(3, bytearray(encode_png(px)))], "asset_id long, payload binary"
    )
    resized = png_resize_nn(assets, box=16)
    rows = png_channel_stats(resized).orderBy("channel").collect()
    # 40x20 → longer side 40 → 16x8
    assert all((r["width"], r["height"]) == (16, 8) for r in rows)
    assert [r["mean_value"] for r in rows] == [7.0, 200.0, 55.0]
    assert [r["min_value"] for r in rows] == [7, 200, 55]
    assert [r["max_value"] for r in rows] == [7, 200, 55]
    assert [r["sum_value"] for r in rows] == [v * 16 * 8 for v in (7, 200, 55)]


def test_json_roundtrip(spark, sf_dir, tmp_path):
    """JSON-lines sink/source round-trip with explicit schema; values,
    including nested arrays, must survive."""
    from covid19_etl_pipeline_spark.sources.io import read_json, write_json

    df = spark.createDataFrame(
        [(1, "a", [1.5, 2.5]), (2, "b", []), (3, None, None)],
        "id long, name string, vals array<double>",
    )
    out = str(tmp_path / "j")
    write_json(df, out)
    back = read_json(spark, out, schema=df.schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_json_partitioned_write_prunes(spark, tmp_path):
    from pyspark.sql import functions as F

    from covid19_etl_pipeline_spark.sources.io import read_json, write_json

    df = spark.createDataFrame([(1, 2020), (2, 2021), (3, 2021)], "id long, year int")
    out = str(tmp_path / "jp")
    write_json(df, out, partition_by=("year",))
    back = read_json(spark, out, schema="id long, year int")
    pruned = back.filter(F.col("year") == 2021)
    assert pruned.count() == 2
    files = pruned.select(F.input_file_name().alias("f")).distinct().collect()
    assert all("year=2021" in r["f"] for r in files)


def test_csv_write_roundtrip(spark, tmp_path):
    from covid19_etl_pipeline_spark.sources.io import read_csv, write_csv

    df = spark.createDataFrame([(1, "a"), (2, "b,with comma"), (3, None)],
                               "id long, name string")
    out = str(tmp_path / "c")
    write_csv(df, out)
    back = read_csv(spark, out, schema=df.schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_load_table_pins_utc(spark, sf_dir):
    """load_table must repair a non-UTC caller session — date bucketing
    and the TZ-naive oracle both assume UTC wall time."""
    from pyspark.sql import functions as F

    old = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
        ev = load_table(spark, sf_dir, "events")
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
        first_day = ev.agg(F.min(F.to_date("ts"))).first()[0]
        assert str(first_day) == "2024-01-01"   # UTC date, not shifted to 2023-12-31
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)


def test_read_parquet_merged_schema_evolution(spark, tmp_path):
    """Old files lack the new column; merged read unions the schemas
    and backfills nulls."""
    from covid19_etl_pipeline_spark.sources.io import read_parquet_merged

    out = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id long, v1 string").write.parquet(out)
    spark.createDataFrame([(2, "b", 9.5)], "id long, v1 string, v2 double").write.mode(
        "append"
    ).parquet(out)
    back = read_parquet_merged(spark, out)
    assert set(back.columns) == {"id", "v1", "v2"}
    rows = {r["id"]: (r["v1"], r["v2"]) for r in back.collect()}
    assert rows == {1: ("a", None), 2: ("b", 9.5)}


def test_compact_parquet_reduces_files_preserves_rows(spark, tmp_path):
    from covid19_etl_pipeline_spark.sources.io import compact_parquet

    out = str(tmp_path / "fragmented")
    df = spark.range(0, 1000).withColumn("v", F.col("id") * 2)
    df.repartition(16).write.parquet(out)
    import os
    before = sum(1 for f in os.listdir(out) if f.endswith(".parquet"))
    assert before == 16
    after = compact_parquet(spark, out, target_partitions=2)
    assert after == 2
    back = spark.read.parquet(out)
    assert back.count() == 1000
    assert back.agg(F.sum("v")).first()[0] == 2 * sum(range(1000))


def test_write_clustered_files_have_disjoint_ranges(spark, sf_dir, tmp_path):
    """Range-clustered files must carry near-disjoint min/max footer
    stats on the cluster column — the property that makes scans skip
    files. Verified from the parquet footers directly."""
    import os

    import pyarrow.parquet as pq

    from covid19_etl_pipeline_spark.sources.io import write_clustered

    orders = load_table(spark, sf_dir, "orders")
    out = str(tmp_path / "clustered")
    write_clustered(orders, out, ["o_totalprice"], num_files=4)

    ranges = []
    for f in sorted(os.listdir(out)):
        if not f.endswith(".parquet"):
            continue
        md = pq.read_metadata(os.path.join(out, f))
        col_idx = md.schema.names.index("o_totalprice")
        lo = min(md.row_group(i).column(col_idx).statistics.min for i in range(md.num_row_groups))
        hi = max(md.row_group(i).column(col_idx).statistics.max for i in range(md.num_row_groups))
        ranges.append((lo, hi))
    assert len(ranges) == 4
    ranges.sort()
    for (lo_a, hi_a), (lo_b, hi_b) in zip(ranges, ranges[1:]):
        assert hi_a <= lo_b   # disjoint (range partitioner boundaries)
    # rows survive
    assert spark.read.parquet(out).count() == orders.count()


def test_streaming_sliding_rollup_matches_batch(spark, sf_dir, tmp_path):
    """Sliding windows overlap (6h window, 3h slide) — the streamed
    result must agree with the batch F.window aggregation bucket-for-
    bucket, including events counted in two windows."""
    from covid19_etl_pipeline_spark.streaming.daily_rollup import (
        streaming_sliding_rollup,
    )

    events = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "events_sliding")
    write_parquet(events, src)

    stream = read_events_stream(spark, src, max_files_per_trigger=2)
    run_to_memory_sink(streaming_sliding_rollup(stream), query_name="s_stream")
    got = {
        (r["window_start"], r["window_end"]): (round(r["total_value"], 4), r["n_events"])
        for r in spark.sql("SELECT * FROM s_stream").collect()
    }
    expected = {
        (r["w"]["start"], r["w"]["end"]): (round(r["tv"], 4), r["n"])
        for r in events.groupBy(F.window("ts", "6 hours", "3 hours").alias("w"))
        .agg(F.sum("value").alias("tv"), F.count("*").alias("n"))
        .collect()
    }
    assert got == expected
    # every event is in exactly two overlapping 6h/3h windows
    assert sum(v[1] for v in got.values()) == 2 * events.count()


def test_streaming_distinct_users_matches_batch_and_exact(spark, sf_dir, tmp_path):
    """HLL sketch state merges register-wise (order-insensitive), so the
    streaming per-window estimate must EQUAL the batch
    approx_count_distinct on the same data — and both must sit within
    the 5% contract of the exact distinct count."""
    from covid19_etl_pipeline_spark.streaming.daily_rollup import (
        read_events_stream,
        run_to_memory_sink,
        streaming_distinct_users_rollup,
    )

    events = load_table(spark, sf_dir, "events")
    src = str(tmp_path / "events_stream_hll")
    write_parquet(events, src)

    stream = read_events_stream(spark, src, max_files_per_trigger=2)
    run_to_memory_sink(
        streaming_distinct_users_rollup(stream), query_name="t_stream_hll"
    )
    got = {
        r["event_date"]: (r["approx_users"], r["n_events"])
        for r in spark.sql("SELECT * FROM t_stream_hll").collect()
    }
    batch = {
        r["event_date"]: (r["au"], r["n"])
        for r in events.groupBy(F.to_date("ts").alias("event_date"))
        .agg(
            F.approx_count_distinct("user_id", rsd=0.05).alias("au"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    assert got == batch
    exact = {
        r["event_date"]: r["x"]
        for r in events.groupBy(F.to_date("ts").alias("event_date"))
        .agg(F.countDistinct("user_id").alias("x"))
        .collect()
    }
    for d, (au, _) in got.items():
        assert abs(au - exact[d]) <= max(1, 0.05 * exact[d]) + 2


def test_orc_roundtrip_partitioned(spark, sf_dir, tmp_path):
    """ORC sink/scan round-trip with a partitioned layout; partition
    pruning works like parquet (one directory read)."""
    from covid19_etl_pipeline_spark.sources.io import read_orc, write_orc

    nation = load_table(spark, sf_dir, "nation")
    path = str(tmp_path / "nation_orc")
    write_orc(nation, path, partition_by=("n_regionkey",))
    back = read_orc(spark, path)
    assert back.count() == nation.count()
    assert {r["n_name"] for r in back.collect()} == {
        r["n_name"] for r in nation.collect()
    }
    one = back.filter(F.col("n_regionkey") == 0)
    files = {r[0] for r in one.select(F.input_file_name()).distinct().collect()}
    assert files and all("n_regionkey=0" in f for f in files)


def test_text_lines_roundtrip(spark, tmp_path):
    """Text sink requires one string column; the scan reads one row per
    line in any order."""
    from covid19_etl_pipeline_spark.sources.io import (
        read_text_lines,
        write_text_lines,
    )

    lines = ["alpha beta", "gamma", "delta epsilon zeta"]
    df = spark.createDataFrame([(l,) for l in lines], "value string")
    path = str(tmp_path / "corpus_txt")
    write_text_lines(df, path)
    back = read_text_lines(spark, path)
    assert sorted(r["value"] for r in back.collect()) == sorted(lines)


def test_streaming_parquet_sink_exactly_once_across_restart(spark, sf_dir, tmp_path):
    """Stop the checkpointed file-sink query, add more input, restart
    with the SAME checkpoint: the second run picks up only unprocessed
    files, and the final output has every input row exactly once."""
    from covid19_etl_pipeline_spark.streaming.daily_rollup import read_events_stream
    from covid19_etl_pipeline_spark.streaming.sinks import stream_to_parquet

    events = load_table(spark, sf_dir, "events")
    half1 = events.filter(F.col("event_id") % 2 == 0)
    half2 = events.filter(F.col("event_id") % 2 == 1)
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    half1.repartition(3).write.mode("append").parquet(src)
    stream = read_events_stream(spark, src, max_files_per_trigger=2)
    proj = stream.select("event_id", "user_id", "event_type")
    q = stream_to_parquet(proj, out, ckpt, query_name="t_pq_sink_1")
    q.processAllAvailable()
    q.stop()
    first = spark.read.parquet(out).count()
    assert first == half1.count()

    half2.repartition(3).write.mode("append").parquet(src)
    q2 = stream_to_parquet(
        read_events_stream(spark, src, max_files_per_trigger=2).select(
            "event_id", "user_id", "event_type"
        ),
        out,
        ckpt,
        query_name="t_pq_sink_2",
    )
    q2.processAllAvailable()
    q2.stop()
    got = spark.read.parquet(out)
    assert got.count() == events.count()                  # no loss
    assert got.select("event_id").distinct().count() == events.count()  # no dupes


def test_write_zordered_skips_files_on_both_dims(spark, sf_dir, tmp_path):
    """Z-ordered layout concentrates any narrow predicate on EITHER
    z-dimension into a subset of files — measured by which files still
    produce rows under a selective filter, z-ordered vs random layout
    (where every file matches). Rows must survive the rewrite intact."""
    from pyspark.sql import functions as F

    from covid19_etl_pipeline_spark.sources.io import write_zordered

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    n_files = 8
    zpath = str(tmp_path / "zordered")
    rpath = str(tmp_path / "random")
    write_zordered(li, zpath, ["l_partkey", "l_suppkey"], num_files=n_files)
    li.repartition(n_files).write.parquet(rpath)

    def files_matching(path, col, hi):
        return (
            spark.read.parquet(path)
            .filter(F.col(col) <= hi)
            .select(F.input_file_name())
            .distinct()
            .count()
        )

    bounds = li.agg(
        F.expr("percentile(l_partkey, 0.15)").alias("pk"),
        F.expr("percentile(l_suppkey, 0.15)").alias("sk"),
    ).collect()[0]
    for col, hi in (("l_partkey", bounds["pk"]), ("l_suppkey", bounds["sk"])):
        z_hit = files_matching(zpath, col, hi)
        r_hit = files_matching(rpath, col, hi)
        assert z_hit < r_hit, (col, z_hit, r_hit)
    assert spark.read.parquet(zpath).count() == li.count()


def test_observe_quality_rides_the_action(spark):
    """Observation metrics must report row + null counts from the SAME
    job that materializes the DataFrame — no second scan issued."""
    from covid19_etl_pipeline_spark.sources.io import observe_quality

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c"), (4, None)], ["id", "v"]
    )
    observed, obs = observe_quality(df, columns=["v"])
    assert observed.count() == 4
    assert obs.get == {"n_rows": 4, "null_v": 2}


def test_sharded_url_source_parallel_read(spark, tmp_path):
    """Python Data Source (Spark 4): one task per URL shard, fetch runs
    executor-side; file:// exercises the same code path hermetically."""
    from covid19_etl_pipeline_spark.sources.pyds import read_sharded_urls

    f1, f2 = tmp_path / "a.txt", tmp_path / "b.txt"
    f1.write_text("alpha\nbeta\n")
    f2.write_text("gamma\n")
    urls = [f1.as_uri(), f2.as_uri()]
    df = read_sharded_urls(spark, urls)
    assert df.rdd.getNumPartitions() == 2  # one shard per URL
    rows = {(r["shard"], r["line"]) for r in df.collect()}
    assert rows == {(0, "alpha"), (0, "beta"), (1, "gamma")}
    assert set(df.columns) == {"shard", "url", "line"}


def test_sharded_url_fetch_retries_with_backoff(tmp_path):
    """The in-partition fetch honors the reference retry contract:
    N attempts, 2**attempt backoff, raises after exhaustion."""
    import pytest

    from covid19_etl_pipeline_spark.sources.pyds import _fetch_with_retry

    sleeps = []
    with pytest.raises(Exception):
        _fetch_with_retry(
            (tmp_path / "missing.txt").as_uri(),
            retries=3,
            timeout=1,
            sleep=sleeps.append,
        )
    assert sleeps == [1, 2]  # 2**0, 2**1; no sleep after the last attempt

    ok = tmp_path / "ok.txt"
    ok.write_text("payload")
    assert _fetch_with_retry(ok.as_uri(), retries=1, timeout=1) == "payload"


def test_read_parquet_resilient_skips_corrupt_file(spark, sf_dir, tmp_path):
    """A garbage .parquet object in the directory is skipped (file-level
    drop), and the surviving rows still read; the strict reader fails."""
    import pytest

    from covid19_etl_pipeline_spark.sources.io import read_parquet_resilient

    out = str(tmp_path / "res")
    spark.read.parquet(f"{sf_dir}/nation.parquet").write.parquet(out)
    (tmp_path / "res" / "part-corrupt.parquet").write_bytes(b"not a parquet file")

    good = read_parquet_resilient(spark, out)
    assert good.count() == 25

    with pytest.raises(Exception):
        spark.read.parquet(out).count()


def test_dynamic_partition_overwrite_replaces_only_landed(spark, sf_dir, tmp_path):
    """Re-landing one priority partition leaves the others intact and
    fully replaces that partition's rows (no append-duplication)."""
    from covid19_etl_pipeline_spark.sources.io import overwrite_partitions_dynamic

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_orderpriority"
    )
    out = str(tmp_path / "dyn")
    overwrite_partitions_dynamic(orders, out, ["o_orderpriority"])
    before = spark.read.parquet(out).count()

    one = orders.filter(orders.o_orderpriority == "1-URGENT")
    relanded = one.limit(3)
    overwrite_partitions_dynamic(relanded, out, ["o_orderpriority"])

    after = spark.read.parquet(out)
    assert after.filter(after.o_orderpriority == "1-URGENT").count() == 3
    assert (
        after.filter(after.o_orderpriority != "1-URGENT").count()
        == before - one.count()
    )
    # session default restored
    assert (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode").upper()
        == "STATIC"
    )


def test_reliable_checkpoint_truncates_lineage(spark, sf_dir, tmp_path):
    """The checkpointed frame reads back identical rows and its plan is
    a checkpoint scan, not the original join tree."""
    from covid19_etl_pipeline_spark.operators.partitioning import (
        reliable_checkpoint,
    )

    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    joined = nation.join(region, nation.n_regionkey == region.r_regionkey)
    ck = reliable_checkpoint(joined, str(tmp_path / "ckpt"))
    assert ck.count() == joined.count()
    plan = ck._jdf.queryExecution().executedPlan().toString()
    assert "Scan ExistingRDD" in plan and "Join" not in plan


def test_streaming_neardup_probe_matches_batch_multibatch(spark, sf_dir, tmp_path):
    """The stateless stream-static band probe must equal its batch
    twin under MULTI-batch arrival: stage documents as 4 files with
    maxFilesPerTrigger=1 so the stream drains in 4 micro-batches, and
    compare per-doc (n_band_hits, status) to the same probe computed
    as one batch join."""
    from covid19_etl_pipeline_spark.operators import dedup, text

    docs = load_table(spark, sf_dir, "documents")
    src = str(tmp_path / "docs_stream")
    docs.repartition(4).write.parquet(src)

    old_idx = (
        dedup.lsh_band_table(
            docs.filter(F.col("doc_id") % 5 != 0), "doc_id", "text"
        )
        .select("band", "sig")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    sh = text.shingles(text.tokens("text"), k=3)
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.concat_ws(
                    "|",
                    dedup.minhash_value(sh, 2 * b),
                    dedup.minhash_value(sh, 2 * b + 1),
                ).alias("sig"),
            )
            for b in range(4)
        ]
    )

    def probe(frame):
        return (
            frame.filter(F.col("doc_id") % 5 == 0)
            .select(F.col("doc_id"), F.explode(band_structs).alias("bs"))
            .select(
                "doc_id",
                F.col("bs.band").alias("band"),
                F.col("bs.sig").alias("sig"),
            )
            .join(F.broadcast(old_idx), ["band", "sig"], "left")
        )

    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    from covid19_etl_pipeline_spark.streaming.daily_rollup import (
        run_to_memory_sink,
    )

    run_to_memory_sink(probe(stream), "t_neardup_probe", output_mode="append")

    def verdicts(df):
        return {
            r["doc_id"]: r["n"]
            for r in df.groupBy("doc_id")
            .agg(
                F.sum(
                    F.when(F.col("__hit").isNotNull(), 1).otherwise(0)
                ).alias("n")
            )
            .collect()
        }

    got = verdicts(spark.table("t_neardup_probe"))
    expected = verdicts(probe(docs))
    assert got == expected
    assert got, "probe produced no verdicts"
