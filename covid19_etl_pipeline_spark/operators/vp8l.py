"""WebP lossless (VP8L) codec in pure Python + numpy — no external
codec library.

Closes the last NotImplementedError in the multimodal codec slot
(VERDICT r08 ask #8: "a VP8L decoder with the JPEG codec's
round-trip-oracle treatment, or remove the formats from the
documented surface" — implemented). WebP payloads now DECODE for real,
same raise-rather-than-mis-decode contract as the PNG/BMP/netpbm/JPEG
codecs in :mod:`.multimodal` / :mod:`.jpeg`.

Everything here derives from public specifications:

- RFC 9649 (WebP image format): the RIFF container layout and the
  VP8L lossless bitstream — LSB-first bit packing, 14-bit dimensions,
  the four transforms (predictor, color, subtract-green,
  color-indexing with pixel bundling), meta prefix groups, the color
  cache (0x1e35a7bd multiplicative hash), canonical prefix codes with
  the DEFLATE-style code-length code (order
  17,18,0,1,..,15; RLE symbols 16/17/18), the "simple" 1-/2-symbol
  code form, LZ77 backward references with the prefix-coded
  length/distance scheme, and the 120-entry 2D proximity distance
  map.
- the 2D distance map is GENERATED from the spec's proximity
  ordering (codes cover the near window dy 0..7 / dx -7..8 sorted by
  squared distance, then larger dy, then larger dx) rather than
  transcribed, and the generated prefix matches the table in the
  spec.

Decoder scope (documented, enforced): the full VP8L feature set —
all four transforms, meta prefix groups, color cache, LZ77, simple
and normal prefix codes, pixel bundling. Lossy WebP (VP8 chunks) and
extended-container features (VP8X: animation, EXIF, ...) raise
ValueError — never a silent mis-decode.

Encoder scope: spec-compliant LITERAL-coded VP8L (optional
subtract-green transform, one prefix-code group, canonical prefix
codes serialized through the code-length code, simple codes for
degenerate alphabets; no LZ77, no cache — compression is not the
point, valid bitstreams for the round-trip oracle are). Any decoder
consuming the output exercises the same entropy machinery real files
use.

Performance shape: the entropy scan is a per-symbol Python loop
(inherently serial — every prefix code's length depends on the
previous decode), the transform inverses are batched numpy per row or
per image. The codec runs inside the reviewed Arrow ``mapInPandas``
boundary (one asset per row), the same shape as the PNG/JPEG codecs;
at 100 TB parallelism comes from the asset count, not from inside a
payload.
"""

from __future__ import annotations

import heapq
import struct

import numpy as np

#: DEFLATE-style storage order of the code-length code's lengths.
CODE_LENGTH_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

#: green/length/cache, red, blue, alpha, distance alphabet sizes
#: (green gains 24 length codes + the color-cache symbols at runtime)
NUM_LENGTH_CODES = 24
NUM_DISTANCE_CODES = 40


def _distance_map() -> list:
    """The 120 2D proximity offsets for distance codes 1..120,
    generated from the spec's ordering: candidate window dy in 0..7,
    dx in -7..8 (dy == 0 restricted to dx >= 1), the 120 nearest by
    (dx² + dy², then larger dy, then larger dx)."""
    cands = []
    for dy in range(0, 8):
        for dx in range(-7, 9):
            if dy == 0 and dx < 1:
                continue
            cands.append((dx, dy))
    cands.sort(key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], -p[0]))
    return cands[:120]


_DIST_MAP = _distance_map()


class BitReader:
    """LSB-first bit reader over a bytes payload."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            byte = self.pos >> 3
            if byte >= len(self.data):
                raise ValueError("VP8L: bitstream truncated")
            v |= ((self.data[byte] >> (self.pos & 7)) & 1) << i
            self.pos += 1
        return v


class BitWriter:
    """LSB-first bit writer."""

    def __init__(self) -> None:
        self.bytes = bytearray()
        self.bitpos = 0

    def write(self, value: int, n: int) -> None:
        for i in range(n):
            if self.bitpos == 0:
                self.bytes.append(0)
            if (value >> i) & 1:
                self.bytes[-1] |= 1 << self.bitpos
            self.bitpos = (self.bitpos + 1) & 7

    def getvalue(self) -> bytes:
        return bytes(self.bytes)


# ------------------------------------------------------------ prefix codes


class PrefixCode:
    """Decoding table: bit-by-bit canonical walk (codes are at most 15
    bits; fixture images are small, so a dict keyed on (length, code)
    is plenty)."""

    def __init__(self, lengths=None, simple_symbols=None) -> None:
        self.map: dict = {}
        self.single = None
        if simple_symbols is not None:
            if len(simple_symbols) == 1:
                self.single = simple_symbols[0]
            else:
                # simple 2-symbol codes assign 0/1 IN READ ORDER (not
                # canonically sorted by symbol value)
                self.map = {
                    (1, 0): simple_symbols[0],
                    (1, 1): simple_symbols[1],
                }
            return
        used = [(ln, sym) for sym, ln in enumerate(lengths) if ln > 0]
        if not used:
            raise ValueError("VP8L: empty prefix code")
        if len(used) == 1:
            # single-symbol code: read zero bits
            self.single = used[0][1]
            return
        used.sort()
        code = 0
        prev_len = used[0][0]
        kraft = 0
        for ln, sym in used:
            code <<= ln - prev_len
            prev_len = ln
            self.map[(ln, code)] = sym
            kraft += 1 << (15 - ln)
            code += 1
        if kraft != 1 << 15:
            raise ValueError("VP8L: prefix code is not complete")

    def decode(self, br: BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for ln in range(1, 16):
            code = (code << 1) | br.read(1)
            sym = self.map.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("VP8L: invalid prefix code in stream")


def _read_prefix_code(br: BitReader, alphabet_size: int) -> PrefixCode:
    if br.read(1):  # simple code
        num_symbols = br.read(1) + 1
        first_8bit = br.read(1)
        sym0 = br.read(8 if first_8bit else 1)
        syms = [sym0]
        if num_symbols == 2:
            syms.append(br.read(8))
        if any(s >= alphabet_size for s in syms):
            raise ValueError("VP8L: simple-code symbol out of range")
        return PrefixCode(simple_symbols=syms)
    # normal: code lengths coded by the code-length code
    num_cl = br.read(4) + 4
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[CODE_LENGTH_ORDER[i]] = br.read(3)
    cl_code = PrefixCode(lengths=cl_lengths)
    if br.read(1):  # bounded max_symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    sym = 0
    prev_len = 8
    while sym < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        cl = cl_code.decode(br)
        if cl < 16:
            lengths[sym] = cl
            sym += 1
            if cl != 0:
                prev_len = cl
        else:
            if cl == 16:
                repeat, fill = 3 + br.read(2), prev_len
            elif cl == 17:
                repeat, fill = 3 + br.read(3), 0
            else:
                repeat, fill = 11 + br.read(7), 0
            if sym + repeat > alphabet_size:
                raise ValueError("VP8L: code-length repeat overflows alphabet")
            for _ in range(repeat):
                lengths[sym] = fill
                sym += 1
    return PrefixCode(lengths=lengths)


def _prefix_value(br: BitReader, code: int) -> int:
    """LZ77 length / distance prefix-value decoding."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


# ---------------------------------------------------------------- decoding


def _cache_index(argb: int, bits: int) -> int:
    return ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - bits)


def _decode_pixels(br: BitReader, w: int, h: int, level0: bool):
    """The entropy-coded ARGB image: prefix groups + LZ77 + cache.
    Returns (pixels uint32[h*w], transforms list) — transforms only at
    level0, in read order."""
    transforms = []
    xbits = 0  # pixel bundling from a color-indexing transform
    orig_w = w
    if level0:
        seen = set()
        while br.read(1):
            ttype = br.read(2)
            if ttype in seen:
                raise ValueError("VP8L: duplicate transform")
            seen.add(ttype)
            if ttype in (0, 1):  # predictor / color
                sb = br.read(3) + 2
                tw, th = (w + (1 << sb) - 1) >> sb, (h + (1 << sb) - 1) >> sb
                tiles, _ = _decode_pixels(br, tw, th, False)
                transforms.append((ttype, sb, tiles.reshape(th, tw)))
            elif ttype == 2:  # subtract green
                transforms.append((2, None, None))
            else:  # color indexing
                n = br.read(8) + 1
                pal, _ = _decode_pixels(br, n, 1, False)
                # palette entries are per-channel cumulative deltas
                pal = pal.view(np.uint8).reshape(n, 4)
                pal = np.cumsum(pal.astype(np.uint16), axis=0).astype(
                    np.uint8
                )
                if n <= 2:
                    xbits = 3
                elif n <= 4:
                    xbits = 2
                elif n <= 16:
                    xbits = 1
                transforms.append((3, (xbits, orig_w, n), pal))
                if xbits:
                    w = (w + (1 << xbits) - 1) >> xbits
    cache_bits = br.read(4) if br.read(1) else 0
    if cache_bits and not 1 <= cache_bits <= 11:
        raise ValueError("VP8L: invalid color-cache size")
    cache = [0] * (1 << cache_bits) if cache_bits else None
    cache_size = 1 << cache_bits if cache_bits else 0

    meta = None
    meta_sb = 0
    num_groups = 1
    if level0 and br.read(1):
        meta_sb = br.read(3) + 2
        tw = (w + (1 << meta_sb) - 1) >> meta_sb
        th = (h + (1 << meta_sb) - 1) >> meta_sb
        ent, _ = _decode_pixels(br, tw, th, False)
        ent = ent.reshape(th, tw)
        # meta index lives in the red+green channels
        meta = (((ent >> 16) & 0xFF) << 8 | ((ent >> 8) & 0xFF)).astype(
            np.int64
        )
        num_groups = int(meta.max()) + 1

    green_alpha = 256 + NUM_LENGTH_CODES + cache_size
    groups = []
    for _ in range(num_groups):
        groups.append(
            [
                _read_prefix_code(br, green_alpha),
                _read_prefix_code(br, 256),
                _read_prefix_code(br, 256),
                _read_prefix_code(br, 256),
                _read_prefix_code(br, NUM_DISTANCE_CODES),
            ]
        )

    n = w * h
    out = np.zeros(n, dtype=np.uint32)
    pos = 0
    g_code = groups[0]
    while pos < n:
        if meta is not None:
            x, y = pos % w, pos // w
            g_code = groups[int(meta[y >> meta_sb, x >> meta_sb])]
        green = g_code[0].decode(br)
        if green < 256:  # literal
            red = g_code[1].decode(br)
            blue = g_code[2].decode(br)
            alpha = g_code[3].decode(br)
            px = (alpha << 24) | (red << 16) | (green << 8) | blue
            out[pos] = px
            pos += 1
            if cache is not None:
                cache[_cache_index(px, cache_bits)] = px
        elif green < 256 + NUM_LENGTH_CODES:  # LZ77 backward reference
            length = _prefix_value(br, green - 256)
            dist_code = _prefix_value(br, g_code[4].decode(br))
            if dist_code <= 120:
                dx, dy = _DIST_MAP[dist_code - 1]
                dist = dy * w + dx
                if dist < 1:
                    dist = 1
            else:
                dist = dist_code - 120
            if dist > pos or pos + length > n:
                raise ValueError("VP8L: LZ77 reference out of range")
            for _ in range(length):
                px = int(out[pos - dist])
                out[pos] = px
                pos += 1
                if cache is not None:
                    cache[_cache_index(px, cache_bits)] = px
        else:  # color-cache hit
            idx = green - 256 - NUM_LENGTH_CODES
            if cache is None or idx >= cache_size:
                raise ValueError("VP8L: cache symbol without cache")
            out[pos] = cache[idx]
            pos += 1
    return out, transforms


def _avg2(a, b):
    return (a.astype(np.uint16) + b) >> 1


def _predict(mode: int, left, top, topleft, topright):
    """One predictor-mode prediction for a single pixel (4-vectors of
    uint8). Modes per RFC 9649."""
    L, T, TL, TR = left, top, topleft, topright
    if mode == 0:
        return np.array([0xFF, 0, 0, 0], dtype=np.uint8)  # ARGB order
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return _avg2(_avg2(L, TR).astype(np.uint8), T).astype(np.uint8)
    if mode == 6:
        return _avg2(L, TL).astype(np.uint8)
    if mode == 7:
        return _avg2(L, T).astype(np.uint8)
    if mode == 8:
        return _avg2(TL, T).astype(np.uint8)
    if mode == 9:
        return _avg2(T, TR).astype(np.uint8)
    if mode == 10:
        return _avg2(
            _avg2(L, TL).astype(np.uint8), _avg2(T, TR).astype(np.uint8)
        ).astype(np.uint8)
    if mode == 11:  # Select
        p = L.astype(np.int32) + T - TL
        p_l = np.abs(p - L).sum()
        p_t = np.abs(p - T).sum()
        return L if p_l <= p_t else T
    if mode == 12:  # ClampAddSubtractFull
        return np.clip(L.astype(np.int32) + T - TL, 0, 255).astype(np.uint8)
    if mode == 13:  # ClampAddSubtractHalf
        a = _avg2(L, T).astype(np.int32)
        d = a - TL
        # C integer division truncates toward zero
        half = np.where(d >= 0, d // 2, -((-d) // 2))
        return np.clip(a + half, 0, 255).astype(np.uint8)
    raise ValueError(f"VP8L: invalid predictor mode {mode}")


def _apply_inverse_transforms(pixels, w: int, h: int, transforms):
    """Inverse transforms in reverse read order. ``pixels`` is the
    uint32 ARGB array (possibly bundled-width for palettes)."""
    for ttype, arg, data in reversed(transforms):
        if ttype == 3:  # color indexing
            xbits, orig_w, pal_n = arg
            pal = data  # (n, 4) uint8 little-endian uint32 view (BGRA)
            if xbits:
                packed_w = (orig_w + (1 << xbits) - 1) >> xbits
                img = pixels.reshape(h, packed_w)
                bits_per = 8 >> xbits
                idx = np.zeros((h, orig_w), dtype=np.int64)
                greens = (img >> 8) & 0xFF
                for x in range(orig_w):
                    shift = (x & ((1 << xbits) - 1)) * bits_per
                    idx[:, x] = (greens[:, x >> xbits] >> shift) & (
                        (1 << bits_per) - 1
                    )
            else:
                idx = ((pixels >> 8) & 0xFF).reshape(h, w).astype(np.int64)
            if (idx >= pal_n).any():
                raise ValueError("VP8L: palette index out of range")
            out = pal[idx.ravel()]  # (h*w, 4) bytes B,G,R,A
            pixels = out.view(np.uint32).ravel().copy()
            w = arg[1]
        elif ttype == 2:  # add green
            a = (pixels >> 24) & 0xFF
            r = (pixels >> 16) & 0xFF
            g = (pixels >> 8) & 0xFF
            b = pixels & 0xFF
            r = (r + g) & 0xFF
            b = (b + g) & 0xFF
            pixels = (a << 24) | (r << 16) | (g << 8) | b
            pixels = pixels.astype(np.uint32)
        elif ttype == 1:  # color transform
            sb, tiles = arg, data
            img = pixels.reshape(h, w)
            a = ((img >> 24) & 0xFF).astype(np.uint8)
            r = ((img >> 16) & 0xFF).astype(np.int32)
            g = ((img >> 8) & 0xFF).astype(np.int32)
            b = (img & 0xFF).astype(np.int32)
            ty = np.arange(h) >> sb
            tx = np.arange(w) >> sb
            t = tiles[np.ix_(ty, tx)]
            g2r = (t & 0xFF).astype(np.int8).astype(np.int32)
            g2b = ((t >> 8) & 0xFF).astype(np.int8).astype(np.int32)
            r2b = ((t >> 16) & 0xFF).astype(np.int8).astype(np.int32)
            g_s = ((g + 128) % 256) - 128  # green as signed int8
            r = (r + ((g2r * g_s) >> 5)) & 0xFF
            r_s = ((r + 128) % 256) - 128
            b = (b + ((g2b * g_s) >> 5) + ((r2b * r_s) >> 5)) & 0xFF
            pixels = (
                (a.astype(np.uint32) << 24)
                | (r.astype(np.uint32) << 16)
                | (g.astype(np.uint32) << 8)
                | b.astype(np.uint32)
            ).ravel()
        elif ttype == 0:  # predictor
            sb, tiles = arg, data
            img = pixels.reshape(h, w).view()
            ch = np.zeros((h, w, 4), dtype=np.uint8)
            ch[..., 0] = (img >> 24) & 0xFF  # A
            ch[..., 1] = (img >> 16) & 0xFF  # R
            ch[..., 2] = (img >> 8) & 0xFF  # G
            ch[..., 3] = img & 0xFF  # B
            modes = ((tiles >> 8) & 0xFF).astype(np.int64)
            for y in range(h):
                for x in range(w):
                    if x == 0 and y == 0:
                        pred = np.array([0xFF, 0, 0, 0], dtype=np.uint8)
                    elif y == 0:
                        pred = ch[0, x - 1]
                    elif x == 0:
                        pred = ch[y - 1, 0]
                    else:
                        mode = int(modes[y >> sb, x >> sb])
                        # TR of the rightmost column is the pixel at
                        # flat index (y-1)*w + w == (y, 0): the first
                        # pixel of the CURRENT row (already decoded)
                        tr = (
                            ch[y - 1, x + 1] if x + 1 < w else ch[y, 0]
                        )
                        pred = _predict(
                            mode,
                            ch[y, x - 1],
                            ch[y - 1, x],
                            ch[y - 1, x - 1],
                            tr,
                        )
                    ch[y, x] = (ch[y, x].astype(np.uint16) + pred) & 0xFF
            pixels = (
                (ch[..., 0].astype(np.uint32) << 24)
                | (ch[..., 1].astype(np.uint32) << 16)
                | (ch[..., 2].astype(np.uint32) << 8)
                | ch[..., 3].astype(np.uint32)
            ).ravel()
    return pixels, w


def sniff_webp(payload: bytes) -> bool:
    return (
        payload is not None
        and len(payload) >= 12
        and payload[:4] == b"RIFF"
        and payload[8:12] == b"WEBP"
    )


def decode_webp(payload: bytes):
    """Decode a lossless WebP file. Returns (width, height, pixels) —
    pixels uint8 (h, w, 4) RGBA. Lossy VP8 and extended VP8X raise
    ValueError (documented unsupported, never a silent mis-decode)."""
    if not sniff_webp(payload):
        raise ValueError("not a RIFF/WEBP container")
    pos = 12
    vp8l = None
    while pos + 8 <= len(payload):
        tag = payload[pos : pos + 4]
        size = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
        body = payload[pos + 8 : pos + 8 + size]
        if tag == b"VP8L":
            vp8l = body
            break
        if tag == b"VP8 ":
            raise ValueError("lossy WebP (VP8) is not supported")
        if tag == b"VP8X":
            raise ValueError("extended WebP (VP8X) is not supported")
        pos += 8 + size + (size & 1)
    if vp8l is None:
        raise ValueError("no VP8L chunk found")
    br = BitReader(vp8l)
    if br.read(8) != 0x2F:
        raise ValueError("bad VP8L signature byte")
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha hint
    if br.read(3) != 0:
        raise ValueError("unsupported VP8L version")
    pixels, transforms = _decode_pixels(br, w, h, True)
    pixels, w = _apply_inverse_transforms(pixels, w, h, transforms)
    img = pixels.reshape(h, w)
    out = np.zeros((h, w, 4), dtype=np.uint8)
    out[..., 0] = (img >> 16) & 0xFF  # R
    out[..., 1] = (img >> 8) & 0xFF  # G
    out[..., 2] = img & 0xFF  # B
    out[..., 3] = (img >> 24) & 0xFF  # A
    return w, h, out


# ---------------------------------------------------------------- encoding


def _huffman_lengths(counts: dict, limit: int) -> dict:
    """Canonical code lengths from symbol counts, depth-limited by
    count flattening (halve-and-retry — fine at fixture scale)."""
    if len(counts) == 1:
        return {next(iter(counts)): 1}
    work = dict(counts)
    while True:
        # heap entries: (count, tiebreak, tree); tree = symbol | (l, r)
        heap = [(c, s, s) for s, c in sorted(work.items())]
        heapq.heapify(heap)
        tick = max(work) + 1
        while len(heap) > 1:
            c1, _, t1 = heapq.heappop(heap)
            c2, _, t2 = heapq.heappop(heap)
            heapq.heappush(heap, (c1 + c2, tick, (t1, t2)))
            tick += 1
        lengths: dict = {}
        stack = [(heap[0][2], 0)]
        while stack:
            tree, depth = stack.pop()
            if isinstance(tree, tuple):
                stack.append((tree[0], depth + 1))
                stack.append((tree[1], depth + 1))
            else:
                lengths[tree] = max(depth, 1)
        if max(lengths.values()) <= limit:
            return lengths
        work = {s: (c + 1) >> 1 for s, c in work.items()}


def _canonical_codes(lengths: dict) -> dict:
    """{symbol: (code, length)} canonical assignment (sorted by
    (length, symbol), MSB-first codes) — the decoder's mirror."""
    used = sorted((ln, sym) for sym, ln in lengths.items() if ln > 0)
    codes = {}
    code = 0
    prev = used[0][0]
    for ln, sym in used:
        code <<= ln - prev
        prev = ln
        codes[sym] = (code, ln)
        code += 1
    return codes


def _write_code_msb(bw: BitWriter, code: int, length: int) -> None:
    """Prefix codes are written MSB-of-code-first (the decoder reads
    them one bit at a time, high bit first)."""
    for i in range(length - 1, -1, -1):
        bw.write((code >> i) & 1, 1)


def _write_prefix_code(bw: BitWriter, counts: dict, alphabet: int) -> dict:
    """Serialize one prefix code; returns {symbol: (code, len)} for the
    pixel-emission pass."""
    syms = sorted(counts)
    if not syms:
        syms = [0]
        counts = {0: 1}
    if len(syms) <= 2:
        bw.write(1, 1)  # simple
        bw.write(len(syms) - 1, 1)
        if syms[0] > 1:
            bw.write(1, 1)
            bw.write(syms[0], 8)
        else:
            bw.write(0, 1)
            bw.write(syms[0], 1)
        if len(syms) == 2:
            bw.write(syms[1], 8)
            return {syms[0]: (0, 1), syms[1]: (1, 1)}
        return {syms[0]: (0, 0)}
    bw.write(0, 1)  # normal
    lengths = _huffman_lengths(counts, 15)
    all_lengths = [lengths.get(s, 0) for s in range(alphabet)]
    cl_counts: dict = {}
    for ln in all_lengths:
        cl_counts[ln] = cl_counts.get(ln, 0) + 1
    cl_lengths = _huffman_lengths(cl_counts, 7)
    # single-distinct-length case: a lone cl symbol is a 0-bit code on
    # the decode side (spec / libwebp), so the writer must not spend
    # bits on it either — pad with a second, never-emitted symbol at
    # length 1 to make a complete 1-bit code both sides consume
    # identically (1 bit per length, pad symbol's bit pattern unused)
    if len(cl_lengths) == 1:
        only = next(iter(cl_lengths))
        pad = 0 if only != 0 else 1
        cl_lengths = {only: 1, pad: 1}
    cl_codes = _canonical_codes(cl_lengths)
    bw.write(19 - 4, 4)  # num_code_lengths = 19
    for s in CODE_LENGTH_ORDER:
        bw.write(cl_lengths.get(s, 0), 3)
    bw.write(0, 1)  # no max_symbol bound
    for ln in all_lengths:
        code, bits = cl_codes[ln]
        _write_code_msb(bw, code, bits)
    return _canonical_codes(lengths)


def encode_webp_lossless(pixels, subtract_green: bool = True) -> bytes:
    """Encode uint8 pixels — (h, w), (h, w, 1), (h, w, 3) or
    (h, w, 4) — as a spec-compliant literal-coded lossless WebP."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[..., None]
    h, w, c = px.shape
    if c == 1:
        px = np.repeat(px, 3, axis=2)
        c = 3
    if c == 3:
        px = np.dstack([px, np.full((h, w), 255, dtype=np.uint8)])
    if not (1 <= w <= 16384 and 1 <= h <= 16384):
        raise ValueError("VP8L: dimensions out of range")
    r = px[..., 0].astype(np.int32)
    g = px[..., 1].astype(np.int32)
    b = px[..., 2].astype(np.int32)
    a = px[..., 3].astype(np.int32)
    if subtract_green:
        r = (r - g) & 0xFF
        b = (b - g) & 0xFF

    bw = BitWriter()
    bw.write(0x2F, 8)
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(1 if (px[..., 3] != 255).any() else 0, 1)  # alpha hint
    bw.write(0, 3)  # version
    if subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)  # transform type: subtract green
    bw.write(0, 1)  # no more transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta prefix codes

    def hist(arr):
        vals, cnts = np.unique(arr, return_counts=True)
        return {int(v): int(n) for v, n in zip(vals, cnts)}

    g_codes = _write_prefix_code(bw, hist(g), 256 + NUM_LENGTH_CODES)
    r_codes = _write_prefix_code(bw, hist(r), 256)
    b_codes = _write_prefix_code(bw, hist(b), 256)
    a_codes = _write_prefix_code(bw, hist(a), 256)
    _write_prefix_code(bw, {}, NUM_DISTANCE_CODES)  # distances unused

    gf, rf, bf, af = g.ravel(), r.ravel(), b.ravel(), a.ravel()
    for i in range(w * h):
        for val, codes in (
            (int(gf[i]), g_codes),
            (int(rf[i]), r_codes),
            (int(bf[i]), b_codes),
            (int(af[i]), a_codes),
        ):
            code, bits = codes[val]
            _write_code_msb(bw, code, bits)

    payload = bw.getvalue()
    vp8l = payload
    chunks = b"VP8L" + struct.pack("<I", len(vp8l)) + vp8l
    if len(vp8l) & 1:
        chunks += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WEBP" + chunks
