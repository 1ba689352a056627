"""Multimodal-column plumbing: image/audio/video as opaque binary
columns with typed metadata.

Beyond-reference extension surface (BASELINE.json). The container has
no image/audio codecs, so the DECODE step is stubbed (deterministic
fake features, clearly marked) — but the Spark-side plumbing is real
and tested: schemas, Arrow-batched ``mapInPandas`` signatures, batch
shapes, and partitioning are exactly what a production decode would
use; swapping the stub for PIL/librosa changes one function body.

Scale notes: media blobs make rows huge — the iterator-of-batches
``mapInPandas`` shape keeps peak memory to one Arrow batch per task
(tune ``spark.sql.execution.arrow.maxRecordsPerBatch`` down for large
blobs), and metadata-only predicates (width/duration/mime) are plain
columns so Catalyst prunes files before any blob is read.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: A multimodal asset row: opaque payload + typed metadata.
ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("mime_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

FEATURE_DIM = 8

_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("mime_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def decode_image(payload: bytes) -> object:
    """Real image decode — requires an image codec (PIL/opencv), which
    this container does not ship. The plumbing around this stub is
    production-shaped; replace the body to go live."""
    raise NotImplementedError(
        "image codec not available in this environment; "
        "extract_features uses the deterministic stub featurizer"
    )


def encode_wav_pcm16(samples, sample_rate: int = 8000, channels: int = 1) -> bytes:
    """Encode int16 samples as a canonical RIFF/WAVE PCM blob — pure
    stdlib ``struct``, no codec dependency. Used by the synthetic-WAV
    fixture generator so the decode path below exercises REAL container
    parsing (magic, chunk walk, fmt fields), not a byte-proxy."""
    data = struct.pack(f"<{len(samples)}h", *samples)
    byte_rate = sample_rate * channels * 2
    block_align = channels * 2
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, channels, sample_rate, byte_rate, block_align, 16
    )
    data_chunk = struct.pack("<4sI", b"data", len(data)) + data
    riff_len = 4 + len(fmt) + len(data_chunk)
    return struct.pack("<4sI4s", b"RIFF", riff_len, b"WAVE") + fmt + data_chunk


def decode_wav(payload: bytes) -> tuple[int, int, list[int]]:
    """REAL audio decode: parse a RIFF/WAVE PCM-16 blob with stdlib
    ``struct`` (the container ships no codec libraries, but WAV needs
    none). Walks the chunk list (tolerating extra chunks like LIST),
    validates the fmt tag, and returns ``(sample_rate, channels,
    samples)`` with samples as interleaved signed 16-bit ints.

    This fills the codec slot that ``decode_image`` must leave stubbed:
    image formats need external codecs, PCM audio does not."""
    if payload is None or len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, len(payload)
    sample_rate = channels = bits = None
    data = None
    while pos + 8 <= end:
        cid, clen = struct.unpack_from("<4sI", payload, pos)
        body = payload[pos + 8 : pos + 8 + clen]
        if cid == b"fmt ":
            audio_fmt, channels, sample_rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if audio_fmt != 1 or bits != 16:
                raise ValueError(f"unsupported WAV encoding: fmt={audio_fmt} bits={bits}")
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)  # chunks are word-aligned
    if sample_rate is None or data is None:
        raise ValueError("WAV missing fmt or data chunk")
    samples = list(struct.unpack(f"<{len(data) // 2}h", data[: len(data) // 2 * 2]))
    return sample_rate, channels, samples


def _stub_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic fake featurizer: byte-histogram moments over the
    payload. Stands in for a decoder+CNN; stable across runs."""
    if payload is None or len(payload) == 0:
        return [0.0] * dim
    buckets = [0] * dim
    for i, b in enumerate(payload):
        buckets[b % dim] += 1
    total = float(len(payload))
    return [round(c / total, 6) for c in buckets]


def extract_features(assets: DataFrame, dim: int = FEATURE_DIM) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``mapInPandas`` (iterator of pandas batches) — one Arrow batch in
    flight per task regardless of partition size. This is the canonical
    shape for any decode/featurize over media blobs.
    """

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "mime_type": pdf["mime_type"],
                    "n_bytes": pdf["payload"].map(
                        lambda p: 0 if p is None else len(p)
                    ),
                    "features": pdf["payload"].map(lambda p: _stub_features(p, dim)),
                }
            )

    return assets.mapInPandas(featurize, schema=_FEATURE_SCHEMA)


def synth_samples(asset_id: int, n: int) -> list[int]:
    """Deterministic PCM-16 sample stream for asset fixtures:
    ``s[k] = ((asset_id * 31 + k * 7) % 2003) - 1001``. Closed-form, so
    a SQL oracle can recompute every sample without touching bytes —
    the contract that lets the encode→decode round trip be hash-checked
    end to end."""
    return [((asset_id * 31 + k * 7) % 2003) - 1001 for k in range(n)]


def synth_wav_assets(
    df: DataFrame,
    id_col: str,
    n_col: str,
    sample_rate: int = 8000,
) -> DataFrame:
    """Build real WAV payloads for (asset_id, n_samples) rows — the
    Arrow-batched ENCODE half of the audio round trip. Output schema:
    (asset_id, n_samples, payload binary)."""

    schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType(), False),
            T.StructField("n_samples", T.IntegerType(), False),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf[id_col].astype("int64")
            ns = pdf[n_col].astype("int64")
            yield pd.DataFrame(
                {
                    "asset_id": ids,
                    "n_samples": ns.astype("int32"),
                    "payload": [
                        encode_wav_pcm16(synth_samples(int(i), int(n)), sample_rate)
                        for i, n in zip(ids, ns)
                    ],
                }
            )

    return df.select(id_col, n_col).mapInPandas(encode, schema=schema)


def wav_rms_segments(
    assets: DataFrame,
    window: int = 160,
    hop: int = 80,
) -> DataFrame:
    """True RMS energy over overlapping sample windows of DECODED WAV
    payloads — the production voice-activity featurizer shape: one
    Arrow batch in flight per task, the codec call (``decode_wav``) is
    the only Python, and the per-window fan-out happens inside the
    batch (no corpus-scale explode of raw samples through a shuffle).

    Output: (asset_id, n_samples, seg_start, rms) — one row per window
    position ``seg_start in range(0, n_samples, hop)``, RMS over the
    up-to-``window`` samples starting there (last windows truncate).
    """

    schema = T.StructType(
        [
            T.StructField("asset_id", T.LongType(), False),
            T.StructField("n_samples", T.IntegerType(), False),
            T.StructField("seg_start", T.IntegerType(), False),
            T.StructField("rms", T.DoubleType()),
        ]
    )

    def segment(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import math

        for pdf in batches:
            out_id, out_n, out_s, out_r = [], [], [], []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                _, _, samples = decode_wav(bytes(payload))
                n = len(samples)
                for s in range(0, n, hop):
                    win = samples[s : s + window]
                    out_id.append(int(aid))
                    out_n.append(n)
                    out_s.append(s)
                    out_r.append(
                        math.sqrt(sum(float(v) * float(v) for v in win) / len(win))
                    )
            yield pd.DataFrame(
                {
                    "asset_id": pd.Series(out_id, dtype="int64"),
                    "n_samples": pd.Series(out_n, dtype="int32"),
                    "seg_start": pd.Series(out_s, dtype="int32"),
                    "rms": pd.Series(out_r, dtype="float64"),
                }
            )

    return assets.mapInPandas(segment, schema=schema)


def filter_by_metadata(
    assets: DataFrame,
    mime_prefix: str | None = None,
    min_width: int | None = None,
    max_duration_ms: int | None = None,
) -> DataFrame:
    """Metadata-only predicates — plain column filters that push into
    the scan so payload bytes of rejected assets are never read."""
    out = assets
    if mime_prefix is not None:
        out = out.filter(F.col("mime_type").startswith(mime_prefix))
    if min_width is not None:
        out = out.filter(F.col("width") >= min_width)
    if max_duration_ms is not None:
        out = out.filter(F.col("duration_ms") <= max_duration_ms)
    return out


def frame_sample_plan(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: one output row per planned frame
    timestamp (the decode itself is the stubbed step). Demonstrates the
    explode-by-schedule pattern: rows stay small until the (stubbed)
    frame decode, and sampling density is a plan-time knob."""
    return (
        assets.filter(F.col("duration_ms").isNotNull())
        .withColumn(
            "frame_ts_ms",
            F.explode(F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))),
        )
        .select("asset_id", "mime_type", "frame_ts_ms")
    )


_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("mime_type", T.StringType()),
        T.StructField("out_width", T.IntegerType()),
        T.StructField("out_height", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def fit_box_dims(width, height, box: int = 224):
    """Aspect-preserving fit-into-box target dimensions as Column
    expressions — the metadata half of a resize, computable (and
    oracle-checkable) without any codec: the longer side becomes
    ``box``, the shorter side scales by floor(side * box / longer),
    floored at 1. Upscaling is allowed (train-time resize semantics).
    """
    w = F.col(width) if isinstance(width, str) else width
    h = F.col(height) if isinstance(height, str) else height
    longer = F.greatest(w, h)
    ow = F.greatest(F.lit(1), F.floor(w * box / longer)).cast("int")
    oh = F.greatest(F.lit(1), F.floor(h * box / longer)).cast("int")
    return ow, oh


def resize_images(assets: DataFrame, box: int = 224) -> DataFrame:
    """Arrow-batched image resize over binary payloads.

    The decode→resize→re-encode body is the STUBBED step (no codec in
    this container — deterministic byte-slice stands in); everything a
    production resize needs from Spark is real and tested: the
    iterator-of-batches ``mapInPandas`` shape (one Arrow batch in
    flight), the aspect-preserving dimension plan computed JVM-side
    BEFORE Python (so metadata-only consumers never enter the UDF),
    and the typed output schema. Swap ``_stub_resize`` for a
    PIL.Image.resize body to go live.
    """
    ow, oh = fit_box_dims("width", "height", box)
    planned = assets.filter(
        F.col("width").isNotNull() & F.col("height").isNotNull()
    ).withColumns({"out_width": ow, "out_height": oh})

    def _stub_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = (pdf["out_width"] * pdf["out_height"]).clip(lower=1)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "mime_type": pdf["mime_type"],
                    "out_width": pdf["out_width"],
                    "out_height": pdf["out_height"],
                    "payload": [
                        (b"" if p is None else bytes(p))[:k]
                        for p, k in zip(pdf["payload"], n)
                    ],
                }
            )

    return planned.mapInPandas(_stub_resize, schema=_RESIZE_SCHEMA)
