"""VP8L (lossless WebP) codec — operators/vp8l.py.

Round trips pin the encoder/decoder pair end to end; the decoder-only
features the literal encoder never emits (LZ77 backward references
through the 2D distance map, the color cache, predictor transforms)
are exercised by hand-built bitstreams assembled from the module's own
serialization primitives and by direct inverse-transform references —
so every entropy branch a real-world VP8L file uses has a test that
fails if its decode breaks.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest

from covid19_etl_pipeline_spark.operators import vp8l


def _riff(vp8l_payload: bytes) -> bytes:
    chunk = b"VP8L" + struct.pack("<I", len(vp8l_payload)) + vp8l_payload
    if len(vp8l_payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _header(bw, w, h):
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version


def _rgba(img):
    out = np.asarray(img, dtype=np.uint8)
    if out.shape[-1] == 3:
        out = np.dstack(
            [out, np.full(out.shape[:2], 255, dtype=np.uint8)]
        )
    return out


def test_round_trip_shapes_and_transforms():
    rng = np.random.default_rng(11)
    for shape in [(7, 9, 3), (1, 1, 3), (16, 5, 4), (3, 31, 3)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        for sg in (True, False):
            blob = vp8l.encode_webp_lossless(img, subtract_green=sg)
            w, h, out = vp8l.decode_webp(blob)
            assert (w, h) == (shape[1], shape[0])
            assert np.array_equal(out, _rgba(img))
    # grayscale input broadcasts to RGB + opaque alpha
    g = rng.integers(0, 256, size=(4, 6), dtype=np.uint8)
    _, _, out = vp8l.decode_webp(vp8l.encode_webp_lossless(g))
    assert np.array_equal(out[..., 0], g) and (out[..., 3] == 255).all()
    # deterministic blobs (fingerprint contract, like encode_png)
    img = rng.integers(0, 256, size=(5, 5, 3), dtype=np.uint8)
    assert vp8l.encode_webp_lossless(img) == vp8l.encode_webp_lossless(img)


def test_full_alphabet_uniform_channel_round_trips():
    """A channel using all 256 values equally makes every literal code
    length 8, collapsing the code-length histogram to ONE symbol. The
    decoder reads a single-symbol cl code with 0 bits (spec/libwebp),
    so the writer pads a second unused length-1 symbol to keep both
    sides consuming exactly 1 bit per length — regression for the
    encode-side desync ('VP8L: empty prefix code')."""
    h, w = 16, 32
    cyc = (np.arange(h * w) % 256).astype(np.uint8).reshape(h, w)
    # red channel cycles 0..255 (single-cl-symbol on the 256-alphabet)
    px = np.dstack(
        [cyc, np.full((h, w), 7, np.uint8), np.zeros((h, w), np.uint8)]
    )
    for sg in (True, False):
        _, _, out = vp8l.decode_webp(
            vp8l.encode_webp_lossless(px, subtract_green=sg)
        )
        assert np.array_equal(out, _rgba(px))
    # green channel too — the larger 256+24 length-code alphabet side
    px_g = np.dstack([cyc, cyc, cyc])
    _, _, out = vp8l.decode_webp(vp8l.encode_webp_lossless(px_g))
    assert np.array_equal(out, _rgba(px_g))


def test_unsupported_variants_raise():
    with pytest.raises(ValueError, match="lossy"):
        vp8l.decode_webp(
            b"RIFF\x10\x00\x00\x00WEBPVP8 \x04\x00\x00\x00abcd"
        )
    with pytest.raises(ValueError, match="VP8X"):
        vp8l.decode_webp(
            b"RIFF\x10\x00\x00\x00WEBPVP8X\x04\x00\x00\x00abcd"
        )
    with pytest.raises(ValueError):
        vp8l.decode_webp(b"not a webp")
    # truncated bitstream raises, never mis-decodes
    good = vp8l.encode_webp_lossless(
        np.zeros((4, 4, 3), dtype=np.uint8) + 9
    )
    with pytest.raises(ValueError):
        vp8l.decode_webp(good[:-2] + b"")


def test_distance_map_matches_spec_prefix():
    """The generated 2D proximity map must reproduce the spec's table
    — pinned on the documented leading entries."""
    assert vp8l._DIST_MAP[:12] == [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0),
        (1, 2), (-1, 2), (2, 1), (-2, 1), (2, 2), (-2, 2),
    ]
    assert len(vp8l._DIST_MAP) == 120
    assert len(set(vp8l._DIST_MAP)) == 120


def test_lz77_backward_reference_stream():
    """Hand-built stream: two literals then a length-2 copy through 2D
    distance code (1,0) — exercises the LZ77 branch the literal
    encoder never emits. Expected pixels: [g1, g2, g2, g2]."""
    bw = vp8l.BitWriter()
    _header(bw, 4, 1)
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta prefix
    # green alphabet: literals 5 and 9, plus length symbol 257 (len 2)
    g_codes = vp8l._write_prefix_code(
        bw, {5: 1, 9: 1, 257: 1}, 256 + vp8l.NUM_LENGTH_CODES
    )
    r_codes = vp8l._write_prefix_code(bw, {1: 1}, 256)
    b_codes = vp8l._write_prefix_code(bw, {2: 1}, 256)
    a_codes = vp8l._write_prefix_code(bw, {255: 1}, 256)
    # distance symbol 1 -> prefix value 2 -> map entry (1, 0) -> dist 1
    d_codes = vp8l._write_prefix_code(bw, {1: 1}, vp8l.NUM_DISTANCE_CODES)

    def emit(codes, sym):
        code, ln = codes[sym]
        vp8l._write_code_msb(bw, code, ln)

    for g in (5, 9):  # two literals
        emit(g_codes, g)
        emit(r_codes, 1)
        emit(b_codes, 2)
        emit(a_codes, 255)
    emit(g_codes, 257)  # length code: value 2
    emit(d_codes, 1)  # distance prefix 1 -> dist_code 2 -> (1,0)
    w, h, out = vp8l.decode_webp(_riff(bw.getvalue()))
    assert (w, h) == (4, 1)
    assert list(out[0, :, 1]) == [5, 9, 9, 9]  # greens
    assert list(out[0, :, 0]) == [1, 1, 1, 1]  # reds
    assert (out[..., 3] == 255).all()


def test_color_cache_stream():
    """Hand-built stream: one literal then a color-cache hit of the
    same pixel."""
    cache_bits = 2
    px = (255 << 24) | (7 << 16) | (200 << 8) | 3  # ARGB
    idx = vp8l._cache_index(px, cache_bits)
    cache_sym = 256 + vp8l.NUM_LENGTH_CODES + idx
    bw = vp8l.BitWriter()
    _header(bw, 2, 1)
    bw.write(0, 1)  # no transforms
    bw.write(1, 1)  # color cache present
    bw.write(cache_bits, 4)
    bw.write(0, 1)  # no meta prefix
    g_codes = vp8l._write_prefix_code(
        bw,
        {200: 1, cache_sym: 1, 0: 1},  # dummy 0 keeps the code normal
        256 + vp8l.NUM_LENGTH_CODES + (1 << cache_bits),
    )
    r_codes = vp8l._write_prefix_code(bw, {7: 1}, 256)
    b_codes = vp8l._write_prefix_code(bw, {3: 1}, 256)
    a_codes = vp8l._write_prefix_code(bw, {255: 1}, 256)
    vp8l._write_prefix_code(bw, {}, vp8l.NUM_DISTANCE_CODES)

    def emit(codes, sym):
        code, ln = codes[sym]
        vp8l._write_code_msb(bw, code, ln)

    emit(g_codes, 200)
    emit(r_codes, 7)
    emit(b_codes, 3)
    emit(a_codes, 255)
    emit(g_codes, cache_sym)
    w, h, out = vp8l.decode_webp(_riff(bw.getvalue()))
    assert (w, h) == (2, 1)
    assert np.array_equal(out[0, 0], out[0, 1])
    assert list(out[0, 0]) == [7, 200, 3, 255]


def test_composite_stream_all_features():
    """One hand-built 8x2 stream combining EVERY decoder feature the
    per-feature tests exercise separately: subtract-green transform,
    a 16-slot color cache SHARED across meta prefix groups, a 2-group
    meta entropy image (4-pixel tiles), and LZ77 copies in both
    groups. No reference encoder ships in this container, so the
    fixture is assembled from the module's serialization primitives
    with the expected pixels derived by hand from the spec semantics
    — the composition coverage a single-feature stream can't give."""
    CB = 4  # cache bits

    def argb(a, r, g, b):
        return (a << 24) | (r << 16) | (g << 8) | b

    # stored (entropy-level) pixels; final r/b get +g (subtract green)
    p0, p1, p2 = (255, 10, 20, 30), (255, 40, 50, 60), (255, 5, 6, 7)
    p4, p5, p6 = (255, 1, 2, 3), (255, 70, 80, 90), (255, 9, 8, 7)
    idx = {
        k: vp8l._cache_index(argb(*v), CB)
        for k, v in dict(p0=p0, p1=p1, p2=p2, p4=p4, p5=p5, p6=p6).items()
    }
    # fixture preconditions: the two cache hits must still hold their
    # pixel when consumed (nothing with the same slot inserted since)
    assert idx["p1"] not in (idx["p0"], idx["p2"], idx["p5"], idx["p4"])
    assert idx["p5"] not in (idx["p4"],)
    cs = lambda p: 256 + vp8l.NUM_LENGTH_CODES + idx[p]  # noqa: E731

    bw = vp8l.BitWriter()
    _header(bw, 8, 2)
    bw.write(1, 1)
    bw.write(2, 2)  # subtract-green transform
    bw.write(0, 1)  # no more transforms
    bw.write(1, 1)
    bw.write(CB, 4)  # color cache
    bw.write(1, 1)
    bw.write(0, 3)  # meta prefix, sb=2 -> 2x1 tile grid
    # meta entropy sub-image (2x1): group index in red<<8 | green
    bw.write(0, 1)  # meta image: no cache
    mg = vp8l._write_prefix_code(bw, {0: 1, 1: 1}, 256 + vp8l.NUM_LENGTH_CODES)
    for _ in range(3):
        vp8l._write_prefix_code(bw, {0: 1}, 256)
    vp8l._write_prefix_code(bw, {}, vp8l.NUM_DISTANCE_CODES)
    for tile_group in (0, 1):  # tile x<4 -> group 0, x>=4 -> group 1
        code, ln = mg[tile_group]
        vp8l._write_code_msb(bw, code, ln)
    # two prefix-code groups over green_alpha = 256 + 24 + 16
    galpha = 256 + vp8l.NUM_LENGTH_CODES + (1 << CB)
    g0 = [
        vp8l._write_prefix_code(
            bw, {20: 1, 50: 1, 6: 1, 2: 1, cs("p0"): 1, cs("p1"): 1, 257: 1}, galpha
        ),
        vp8l._write_prefix_code(bw, {10: 1, 40: 1, 5: 1, 1: 1}, 256),
        vp8l._write_prefix_code(bw, {30: 1, 60: 1, 7: 1, 3: 1}, 256),
        vp8l._write_prefix_code(bw, {255: 1}, 256),
        vp8l._write_prefix_code(bw, {1: 1}, vp8l.NUM_DISTANCE_CODES),
    ]
    g1 = [
        vp8l._write_prefix_code(
            bw, {80: 1, 8: 1, cs("p5"): 1, 257: 1, 258: 1}, galpha
        ),
        vp8l._write_prefix_code(bw, {70: 1, 9: 1}, 256),
        vp8l._write_prefix_code(bw, {90: 1, 7: 1}, 256),
        vp8l._write_prefix_code(bw, {255: 1}, 256),
        vp8l._write_prefix_code(bw, {1: 1}, vp8l.NUM_DISTANCE_CODES),
    ]

    def lit(g, p):
        a, r, gg, b = p
        for codes, sym in ((g[0], gg), (g[1], r), (g[2], b), (g[3], a)):
            code, ln = codes[sym]
            vp8l._write_code_msb(bw, code, ln)

    def sym(codes, s):
        code, ln = codes[s]
        vp8l._write_code_msb(bw, code, ln)

    # raster emission; pos 0..15 (y*8 + x); group by x>>2
    lit(g0, p0)  # 0
    lit(g0, p1)  # 1
    sym(g0[0], cs("p0"))  # 2: cache hit -> p0
    lit(g0, p2)  # 3
    lit(g1, p5)  # 4
    sym(g1[0], 258)  # 5-7: length 3 ...
    sym(g1[4], 1)  # ... distance 1 -> p5, p5, p5
    sym(g0[0], cs("p1"))  # 8: cache hit -> p1
    lit(g0, p4)  # 9
    sym(g0[0], 257)  # 10-11: length 2 ...
    sym(g0[4], 1)  # ... distance 1 -> p4, p4
    sym(g1[0], cs("p5"))  # 12: cache hit -> p5
    lit(g1, p6)  # 13
    sym(g1[0], 257)  # 14-15: length 2 ...
    sym(g1[4], 1)  # ... distance 1 -> p6, p6

    w, h, out = vp8l.decode_webp(_riff(bw.getvalue()))
    assert (w, h) == (8, 2)
    stored = [
        p0, p1, p0, p2, p5, p5, p5, p5,
        p1, p4, p4, p4, p5, p6, p6, p6,
    ]
    expect = np.array(
        [
            [(r + g) & 255, g, (b + g) & 255, a]
            for (a, r, g, b) in stored
        ],
        dtype=np.uint8,
    ).reshape(2, 8, 4)
    assert np.array_equal(out, expect)


def _reference_predict(mode, L, T, TL, TR):
    """Straightforward per-spec reference, independent arithmetic."""
    import math  # noqa: F401

    L, T, TL, TR = (x.astype(int) for x in (L, T, TL, TR))
    avg2 = lambda a, b: (a + b) // 2  # noqa: E731
    if mode == 0:
        return np.array([255, 0, 0, 0])
    table = {
        1: L, 2: T, 3: TR, 4: TL,
        5: avg2(avg2(L, TR), T), 6: avg2(L, TL), 7: avg2(L, T),
        8: avg2(TL, T), 9: avg2(T, TR), 10: avg2(avg2(L, TL), avg2(T, TR)),
    }
    if mode in table:
        return table[mode]
    if mode == 11:
        p = L + T - TL
        return L if np.abs(p - L).sum() <= np.abs(p - T).sum() else T
    if mode == 12:
        return np.clip(L + T - TL, 0, 255)
    if mode == 13:
        a = avg2(L, T)
        d = a - TL
        half = np.where(d >= 0, d // 2, -((-d) // 2))
        return np.clip(a + half, 0, 255)
    raise AssertionError(mode)


def test_predictor_modes_match_reference():
    rng = np.random.default_rng(3)
    for _ in range(50):
        L, T, TL, TR = (
            rng.integers(0, 256, size=4).astype(np.uint8) for _ in range(4)
        )
        for mode in range(14):
            got = vp8l._predict(mode, L, T, TL, TR)
            want = _reference_predict(mode, L, T, TL, TR)
            assert np.array_equal(np.asarray(got, dtype=int), want), mode


def test_predictor_transform_stream():
    """Hand-built stream with a predictor transform (mode 2 = Top,
    one tile): residuals + inverse must reconstruct the target."""
    w, h, mode = 3, 3, 2
    target = np.arange(w * h * 4, dtype=np.int64).reshape(h, w, 4) * 17 % 256
    # forward transform: residual = pixel - prediction (per spec rules)
    res = np.zeros_like(target)
    argb = target[..., [3, 0, 1, 2]]  # A,R,G,B channel order
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                pred = np.array([255, 0, 0, 0])
            elif y == 0:
                pred = argb[0, x - 1]
            elif x == 0:
                pred = argb[y - 1, 0]
            else:
                tr = argb[y - 1, x + 1] if x + 1 < w else argb[y, 0]
                pred = np.asarray(
                    vp8l._predict(
                        mode,
                        argb[y, x - 1].astype(np.uint8),
                        argb[y - 1, x].astype(np.uint8),
                        argb[y - 1, x - 1].astype(np.uint8),
                        tr.astype(np.uint8),
                    ),
                    dtype=np.int64,
                )
            res[y, x] = (argb[y, x] - pred) % 256
    bw = vp8l.BitWriter()
    _header(bw, w, h)
    bw.write(1, 1)  # transform present
    bw.write(0, 2)  # predictor
    bw.write(2, 3)  # sb = 4 -> one 16x16 tile covers 3x3
    # tile SUB-IMAGE stream, exactly as _decode_pixels reads a
    # non-level0 image: [cache bit][5 prefix codes][pixels]; all five
    # codes are single-symbol, so the lone tile pixel costs 0 bits
    # (mode rides in the GREEN channel)
    bw.write(0, 1)  # tile: no color cache
    vp8l._write_prefix_code(bw, {mode: 1}, 256 + vp8l.NUM_LENGTH_CODES)
    for counts in ({0: 1}, {0: 1}, {0: 1}):
        vp8l._write_prefix_code(bw, counts, 256)
    vp8l._write_prefix_code(bw, {}, vp8l.NUM_DISTANCE_CODES)
    bw.write(0, 1)  # main image: no more transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta prefix

    def codes_for(channel_vals, alphabet):
        vals, cnts = np.unique(channel_vals, return_counts=True)
        return vp8l._write_prefix_code(
            bw, {int(v): int(c) for v, c in zip(vals, cnts)}, alphabet
        )

    g_codes = codes_for(res[..., 2], 256 + vp8l.NUM_LENGTH_CODES)
    r_codes = codes_for(res[..., 1], 256)
    b_codes = codes_for(res[..., 3], 256)
    a_codes = codes_for(res[..., 0], 256)
    vp8l._write_prefix_code(bw, {}, vp8l.NUM_DISTANCE_CODES)
    for y in range(h):
        for x in range(w):
            for codes, val in (
                (g_codes, res[y, x, 2]),
                (r_codes, res[y, x, 1]),
                (b_codes, res[y, x, 3]),
                (a_codes, res[y, x, 0]),
            ):
                code, ln = codes[int(val)]
                vp8l._write_code_msb(bw, code, ln)
    wv, hv, out = vp8l.decode_webp(_riff(bw.getvalue()))
    assert (wv, hv) == (w, h)
    assert np.array_equal(out, target[..., [0, 1, 2, 3]].astype(np.uint8))
