"""Baseline-JPEG (SOF0) codec contract: lossy round trips inside
measured bounds, restart/subsampling invariants, and the
raise-rather-than-mis-decode error paths (same contract as the
PNG/BMP/netpbm codecs)."""

from __future__ import annotations

import numpy as np
import pytest

from covid19_etl_pipeline_spark.operators.jpeg import (
    QTAB_CHROMA,
    QTAB_LUMA,
    UNZIGZAG,
    ZIGZAG,
    decode_jpeg,
    encode_jpeg_baseline,
    quality_scaled_tables,
    sniff_jpeg,
)


def _synth(i: int, h: int, w: int, c: int = 3) -> np.ndarray:
    y, x, ch = np.meshgrid(
        np.arange(h), np.arange(w), np.arange(c), indexing="ij"
    )
    return ((i * 31 + y * 7 + x * 3 + ch * 11) % 256).astype(np.uint8)


def test_zigzag_tables_are_inverse_permutations():
    assert sorted(ZIGZAG) == list(range(64))
    assert (ZIGZAG[UNZIGZAG] == np.arange(64)).all()
    # quality 50 is the identity scale on the Annex K tables
    qy, qc = quality_scaled_tables(50)
    assert (qy == QTAB_LUMA).all() and (qc == QTAB_CHROMA).all()


def test_constant_images_round_trip_nearly_exact():
    """A constant block has only a DC coefficient; quantization error
    is at most half the DC step, so reconstruction is within 1."""
    for shape, val in [((16, 16), 130), ((24, 17, 3), 99), ((8, 8, 3), 0)]:
        px = np.full(shape, val, dtype=np.uint8)
        w, h, back = decode_jpeg(encode_jpeg_baseline(px))
        assert (w, h) == (px.shape[1], px.shape[0])
        px3 = px[:, :, None] if px.ndim == 2 else px
        assert np.abs(back.astype(int) - px3.astype(int)).max() <= 1


def test_sawtooth_round_trip_within_measured_bounds():
    """The fixture pattern is the hard case (255->0 wrap edges ring);
    bounds are ~1.5x the measured deterministic worst case per
    variant — a desynced scan or wrong dequant table measures mae
    40-70 and fails these by an order of magnitude."""
    px = _synth(5, 18, 28)
    _, _, r444 = decode_jpeg(encode_jpeg_baseline(px))
    assert np.abs(r444.astype(int) - px.astype(int)).mean() <= 8.0
    _, _, r420 = decode_jpeg(encode_jpeg_baseline(px, subsample=True))
    assert np.abs(r420.astype(int) - px.astype(int)).mean() <= 18.0
    gray = _synth(9, 12, 40)[:, :, 0]
    _, _, rg = decode_jpeg(encode_jpeg_baseline(gray))
    assert rg.shape == (12, 40, 1)
    assert np.abs(rg[:, :, 0].astype(int) - gray.astype(int)).mean() <= 3.0


def test_restart_markers_do_not_change_decoded_pixels():
    """DRI/RSTn segmentation is pure framing: the decoded image must
    be bit-identical to the unsegmented encode — including at MCU
    boundaries that land exactly on a byte edge, the case that used
    to desync the reader."""
    px = _synth(3, 33, 49)
    base = decode_jpeg(encode_jpeg_baseline(px))[2]
    for ri in (1, 2, 3, 5, 7):
        back = decode_jpeg(
            encode_jpeg_baseline(px, restart_interval=ri)
        )[2]
        assert np.array_equal(back, base), f"restart_interval={ri}"
    sub_base = decode_jpeg(encode_jpeg_baseline(px, subsample=True))[2]
    for ri in (1, 3):
        back = decode_jpeg(
            encode_jpeg_baseline(px, subsample=True, restart_interval=ri)
        )[2]
        assert np.array_equal(back, sub_base), f"420 restart_interval={ri}"


def test_tiny_and_non_multiple_of_8_dims():
    for hw in [(1, 1), (3, 5), (7, 9), (17, 1), (1, 23), (8, 8)]:
        h, w = hw
        px = _synth(11, h, w)
        for sub in (False, True):
            dw, dh, back = decode_jpeg(
                encode_jpeg_baseline(px, subsample=sub)
            )
            assert (dw, dh) == (w, h)
            assert back.shape == (h, w, 3)


def test_higher_quality_is_no_worse():
    px = _synth(7, 24, 32)
    maes = []
    for q in (25, 50, 75, 95):
        back = decode_jpeg(encode_jpeg_baseline(px, quality=q))[2]
        maes.append(np.abs(back.astype(int) - px.astype(int)).mean())
    assert maes == sorted(maes, reverse=True), maes


def test_deterministic_bytes():
    px = _synth(13, 20, 20)
    assert encode_jpeg_baseline(px) == encode_jpeg_baseline(px)


def test_error_paths_raise_value_error():
    with pytest.raises(ValueError):
        decode_jpeg(b"")
    with pytest.raises(ValueError):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xe0" + bytes(20))  # no SOF/SOS
    # progressive (SOF2) is out of scope and must say so
    sof2 = b"\xff\xd8\xff\xc2\x00\x0b\x08\x00\x10\x00\x10\x01\x01\x11\x00"
    with pytest.raises(ValueError, match="SOF2"):
        decode_jpeg(sof2)
    # truncation anywhere: segment table, mid-scan, missing EOI
    blob = encode_jpeg_baseline(_synth(1, 16, 16))
    for cut in (4, 30, len(blob) // 2, len(blob) - 3):
        with pytest.raises(ValueError):
            decode_jpeg(blob[:cut])
    # encoder input contracts
    with pytest.raises(ValueError):
        encode_jpeg_baseline(np.zeros((2, 2, 4), dtype=np.uint8))
    with pytest.raises(ValueError):
        encode_jpeg_baseline(np.zeros((8, 8), dtype=np.uint8), quality=0)


def test_fill_bytes_before_markers_are_tolerated():
    """T.81 B.1.1.2 allows any number of 0xFF fill bytes before a
    marker; some writers pad with them."""
    px = _synth(4, 12, 16)
    blob = encode_jpeg_baseline(px)
    filled = blob[:2] + b"\xff\xff\xff" + blob[2:]
    assert np.array_equal(decode_jpeg(filled)[2], decode_jpeg(blob)[2])


def test_sniff_and_decode_image_dispatch():
    from covid19_etl_pipeline_spark.operators.multimodal import decode_image

    blob = encode_jpeg_baseline(_synth(2, 10, 14))
    assert sniff_jpeg(blob)
    assert not sniff_jpeg(b"\xff\xd8")  # SOI alone is not enough
    assert not sniff_jpeg(None)
    w, h, px = decode_image(blob)
    assert (w, h, px.shape[2]) == (14, 10, 3)
    # RIFF/WEBP container with no VP8L chunk is MALFORMED input to the
    # real WebP path, not an unsupported format: ValueError, per
    # operators/vp8l.py decode_webp
    with pytest.raises(ValueError):
        decode_image(b"RIFF....WEBP")
    # AVIF (ISO-BMFF ftyp box) is the remaining honest stub
    avif = b"\x00\x00\x00\x1cftypavif\x00\x00\x00\x00avifmif1"
    with pytest.raises(NotImplementedError):
        decode_image(avif)
