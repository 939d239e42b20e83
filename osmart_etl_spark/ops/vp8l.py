"""Pure-numpy/stdlib lossless-WebP (VP8L) codec.

REAL decoder for the WebP lossless bitstream, written from the public
format specification (RFC 9649, "WebP Image Format", section 3 "WebP
Lossless Bitstream Specification") — no PIL/libwebp, same honesty tier
as ops/jpeg.py (T.81) and the PNG/WAV codecs in ops/multimodal.py.

Decoder surface:

- ``decode_webp(payload)``   — RIFF container walk; ``VP8L`` chunk (bare
  or inside a ``VP8X`` extended file) decodes FOR REAL to an RGBA
  uint8 array.  Lossy ``VP8 `` also decodes FOR REAL since round 7,
  dispatched to ops/vp8.py (RFC 6386 key-frame decoder, bit-exact vs
  the system libwebp), with an extended file's ALPH plane composed
  into the alpha channel.  Corrupt payloads raise ValueError only —
  the mapInPandas decode_status contract.
- ``decode_webp_alpha(payload)`` — the ``ALPH`` chunk of an extended
  WebP: raw (compression 0) or VP8L-coded (compression 1, the headerless
  "implicit dimensions" stream form), plus the three alpha prediction
  filters. This means a lossy+alpha WebP still yields a REAL alpha
  plane even though its RGB needs the VP8 decoder.

Implemented per spec: LSB-first bit reader, simple + normal Huffman
code reading (code-length codes, RLE 16/17/18, trivial 0-bit
single-symbol codes), meta-Huffman entropy images, color cache, LZ77
backward references with the 120-entry 2D distance neighborhood map,
and all four inverse transforms (predictor with its 14 modes,
cross-color, subtract-green, color-indexing incl. sub-byte pixel
packing).

``encode_vp8l``/``encode_webp`` is a minimal deterministic encoder for
fixtures and roundtrip tests: literal-only (no LZ77/cache/transforms)
with near-balanced canonical Huffman codes per channel — enough to
make encode→decode an exact identity on arbitrary uint8 images.

Scale notes: decode runs inside mapInPandas workers (ops/multimodal
``extract_features``) — Arrow-batched, no shuffle; the serial
entropy-decode loop is per-image and bounded by
``arrow.maxRecordsPerBatch`` payload sizing upstream.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# bit I/O (VP8L is LSB-first within bytes)


class BitReader:
    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.nbits = 8 * len(data)

    def read_bits(self, n: int) -> int:
        if self.pos + n > self.nbits:
            raise ValueError("VP8L: bitstream truncated")
        v = 0
        p = self.pos
        d = self.data
        for i in range(n):
            v |= ((d[(p + i) >> 3] >> ((p + i) & 7)) & 1) << i
        self.pos = p + n
        return v

    def read_bit(self) -> int:
        p = self.pos
        if p >= self.nbits:
            raise ValueError("VP8L: bitstream truncated")
        self.pos = p + 1
        return (self.data[p >> 3] >> (p & 7)) & 1


class BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def write_bits(self, n: int, v: int) -> None:
        for i in range(n):  # LSB first
            self.bits.append((v >> i) & 1)

    def write_code(self, length: int, code: int) -> None:
        for i in range(length - 1, -1, -1):  # Huffman codes go MSB first
            self.bits.append((code >> i) & 1)

    def tobytes(self) -> bytes:
        out = bytearray((len(self.bits) + 7) // 8)
        for i, b in enumerate(self.bits):
            if b:
                out[i >> 3] |= 1 << (i & 7)
        return bytes(out)


# ---------------------------------------------------------------------------
# canonical Huffman


class CanonicalCode:
    """Canonical prefix code from code lengths. A code with exactly one
    used symbol is trivial: reads return it consuming ZERO bits (spec:
    'simple code length code' degenerate case, mirrored by libwebp's
    single-entry table)."""

    __slots__ = ("single", "table", "max_len", "codes")

    def __init__(self, code_lengths):
        used = [(l, s) for s, l in enumerate(code_lengths) if l > 0]
        self.codes = {}
        if not used:
            raise ValueError("VP8L: empty Huffman code")
        if len(used) == 1:
            self.single = used[0][1]
            self.table = None
            self.max_len = 0
            self.codes[used[0][1]] = (0, 0)
            return
        self.single = None
        used.sort()
        self.max_len = used[-1][0]
        if self.max_len > 15:
            raise ValueError("VP8L: code length > 15")
        # completeness (Kraft sum must be exactly 1)
        kraft = sum(1 << (self.max_len - l) for l, _ in used)
        if kraft != (1 << self.max_len):
            raise ValueError("VP8L: invalid (incomplete/oversubscribed) code")
        table = {}
        code = 0
        prev_len = used[0][0]
        for l, s in used:
            code <<= l - prev_len
            prev_len = l
            table[(l << 16) | code] = s
            self.codes[s] = (l, code)
            code += 1
        self.table = table

    def read(self, br: BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        length = 0
        table = self.table
        for _ in range(self.max_len):
            code = (code << 1) | br.read_bit()
            length += 1
            s = table.get((length << 16) | code)
            if s is not None:
                return s
        raise ValueError("VP8L: bad Huffman code in stream")


_CODE_LENGTH_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


def _read_huffman_code(br: BitReader, alphabet_size: int) -> CanonicalCode:
    if br.read_bits(1):  # simple code
        num_symbols = br.read_bits(1) + 1
        first_8bit = br.read_bits(1)
        sym0 = br.read_bits(8 if first_8bit else 1)
        lengths = [0] * alphabet_size
        if sym0 >= alphabet_size:
            raise ValueError("VP8L: simple-code symbol out of range")
        lengths[sym0] = 1
        if num_symbols == 2:
            sym1 = br.read_bits(8)
            if sym1 >= alphabet_size:
                raise ValueError("VP8L: simple-code symbol out of range")
            lengths[sym1] = 1
        return CanonicalCode(lengths)
    # normal: code lengths are themselves Huffman-coded
    num_codes = 4 + br.read_bits(4)
    cl_lengths = [0] * 19
    for i in range(num_codes):
        cl_lengths[_CODE_LENGTH_ORDER[i]] = br.read_bits(3)
    cl_code = CanonicalCode(cl_lengths)
    if br.read_bits(1):  # limited number of coded symbols
        length_nbits = 2 + 2 * br.read_bits(3)
        max_symbol = 2 + br.read_bits(length_nbits)
        if max_symbol > alphabet_size:
            raise ValueError("VP8L: max_symbol out of range")
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev_len = 8
    symbol = 0
    while symbol < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        cl = cl_code.read(br)
        if cl < 16:
            lengths[symbol] = cl
            symbol += 1
            if cl != 0:
                prev_len = cl
        else:
            use_prev = cl == 16
            extra_bits = (2, 3, 7)[cl - 16]
            repeat = br.read_bits(extra_bits) + (3, 3, 11)[cl - 16]
            if symbol + repeat > alphabet_size:
                raise ValueError("VP8L: code-length repeat overflow")
            fill = prev_len if use_prev else 0
            for _ in range(repeat):
                lengths[symbol] = fill
                symbol += 1
    return CanonicalCode(lengths)


# ---------------------------------------------------------------------------
# LZ77 helpers

# 120-entry 2D distance neighborhood map (spec: (dx, dy) pairs ordered
# by proximity; dist = dy * xsize + dx, clamped to >= 1)
_DIST_MAP = (
    (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
    (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
    (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
    (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    (1, 5), (-1, 5), (5, 1), (-5, 1), (2, 5), (-2, 5), (5, 2), (-5, 2),
    (4, 4), (-4, 4), (3, 5), (-3, 5), (5, 3), (-5, 3), (0, 6), (6, 0),
    (1, 6), (-1, 6), (6, 1), (-6, 1), (2, 6), (-2, 6), (6, 2), (-6, 2),
    (4, 5), (-4, 5), (5, 4), (-5, 4), (3, 6), (-3, 6), (6, 3), (-6, 3),
    (0, 7), (7, 0), (1, 7), (-1, 7), (5, 5), (-5, 5), (7, 1), (-7, 1),
    (4, 6), (-4, 6), (6, 4), (-6, 4), (2, 7), (-2, 7), (7, 2), (-7, 2),
    (3, 7), (-3, 7), (7, 3), (-7, 3), (5, 6), (-5, 6), (6, 5), (-6, 5),
    (8, 0), (4, 7), (-4, 7), (7, 4), (-7, 4), (8, 1), (8, 2), (6, 6),
    (-6, 6), (8, 3), (5, 7), (-5, 7), (7, 5), (-7, 5), (8, 4), (6, 7),
    (-6, 7), (7, 6), (-7, 6), (8, 5), (7, 7), (-7, 7), (8, 6), (8, 7),
)


def _prefix_value(code: int, br: BitReader) -> int:
    """LZ77 length/distance prefix coding: 4 direct codes then
    (2 + parity) << extra_bits ranges."""
    if code < 4:
        return code + 1
    extra_bits = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra_bits
    return offset + br.read_bits(extra_bits) + 1


def _plane_code_to_distance(code: int, xsize: int) -> int:
    if code > 120:
        return code - 120
    dx, dy = _DIST_MAP[code - 1]
    dist = dy * xsize + dx
    return dist if dist >= 1 else 1


def _sub_size(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


# ---------------------------------------------------------------------------
# image stream decode


def _decode_image_stream(br, xsize, ysize, is_level0):
    """Returns (pixels, transforms, final_xsize): pixels is a flat
    row-major list of ARGB uint32; transforms only at level 0 (applied
    by the caller in reverse read order, per spec)."""
    transforms = []
    seen_types = set()
    if is_level0:
        while br.read_bits(1):
            ttype = br.read_bits(2)
            if ttype in seen_types:
                raise ValueError("VP8L: duplicate transform")
            seen_types.add(ttype)
            xsize, t = _read_transform(br, ttype, xsize, ysize)
            transforms.append(t)
    cache_bits = 0
    if br.read_bits(1):
        cache_bits = br.read_bits(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("VP8L: bad color-cache bits")
    cache_size = (1 << cache_bits) if cache_bits else 0

    meta_idx = None
    hbits = 0
    huff_xsize = 0
    if is_level0 and br.read_bits(1):  # meta-Huffman entropy image
        hbits = br.read_bits(3) + 2
        huff_xsize = _sub_size(xsize, hbits)
        ent, _, _ = _decode_image_stream(
            br, huff_xsize, _sub_size(ysize, hbits), False
        )
        meta_idx = [(p >> 8) & 0xFFFF for p in ent]
        n_groups = max(meta_idx) + 1
    else:
        n_groups = 1
    groups = []
    for _ in range(n_groups):
        groups.append(
            (
                _read_huffman_code(br, 256 + 24 + cache_size),
                _read_huffman_code(br, 256),
                _read_huffman_code(br, 256),
                _read_huffman_code(br, 256),
                _read_huffman_code(br, 40),
            )
        )

    total = xsize * ysize
    pixels = [0] * total
    cache = [0] * cache_size
    cache_shift = 32 - cache_bits if cache_bits else 0
    pos = 0
    x = 0
    y = 0
    g = groups[0]
    while pos < total:
        if meta_idx is not None:
            g = groups[meta_idx[(y >> hbits) * huff_xsize + (x >> hbits)]]
        s = g[0].read(br)
        if s < 256:  # literal: stream order is green, red, blue, alpha
            red = g[1].read(br)
            blue = g[2].read(br)
            alpha = g[3].read(br)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
        elif s < 280:  # LZ77 backward reference
            length = _prefix_value(s - 256, br)
            dist_code = _prefix_value(g[4].read(br), br)
            dist = _plane_code_to_distance(dist_code, xsize)
            if dist > pos or pos + length > total:
                raise ValueError("VP8L: backward reference out of range")
            for _ in range(length):
                px = pixels[pos - dist]
                pixels[pos] = px
                if cache_size:
                    cache[((0x1E35A7BD * px) & 0xFFFFFFFF) >> cache_shift] = px
                pos += 1
                x += 1
                if x == xsize:
                    x = 0
                    y += 1
            continue
        else:  # color-cache reference
            idx = s - 280
            if idx >= cache_size:
                raise ValueError("VP8L: cache index out of range")
            px = cache[idx]
        pixels[pos] = px
        if cache_size:
            cache[((0x1E35A7BD * px) & 0xFFFFFFFF) >> cache_shift] = px
        pos += 1
        x += 1
        if x == xsize:
            x = 0
            y += 1
    return pixels, transforms, xsize


def _read_transform(br, ttype, xsize, ysize):
    """Reads one transform; returns (new_xsize, transform_tuple). Only
    color-indexing with sub-byte packing changes xsize for subsequent
    reads (spec 3.4)."""
    if ttype == 0 or ttype == 1:  # predictor / cross-color
        bits = br.read_bits(3) + 2
        data, _, _ = _decode_image_stream(
            br, _sub_size(xsize, bits), _sub_size(ysize, bits), False
        )
        return xsize, (ttype, bits, data, xsize)
    if ttype == 2:  # subtract-green
        return xsize, (2, None, None, xsize)
    # ttype == 3: color indexing
    n_colors = br.read_bits(8) + 1
    raw, _, _ = _decode_image_stream(br, n_colors, 1, False)
    palette = []
    prev = 0
    for p in raw:  # palette entries are component-wise delta-coded
        q = _add_pixels(p, prev)
        palette.append(q)
        prev = q
    if n_colors <= 2:
        width_bits = 3
    elif n_colors <= 4:
        width_bits = 2
    elif n_colors <= 16:
        width_bits = 1
    else:
        width_bits = 0
    packed_xsize = _sub_size(xsize, width_bits)
    return packed_xsize, (3, width_bits, palette, xsize)


# ---------------------------------------------------------------------------
# inverse transforms (applied in reverse read order)


def _add_pixels(a: int, b: int) -> int:
    """Component-wise (mod 256) ARGB addition."""
    return (
        (((a >> 24) + (b >> 24)) & 0xFF) << 24
        | ((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) & 0xFF) << 16
        | ((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) & 0xFF) << 8
        | (((a & 0xFF) + (b & 0xFF)) & 0xFF)
    )


def _avg2(a: int, b: int) -> int:
    return (
        ((((a >> 24) + (b >> 24)) >> 1) << 24)
        | (((((a >> 16) & 0xFF) + ((b >> 16) & 0xFF)) >> 1) << 16)
        | (((((a >> 8) & 0xFF) + ((b >> 8) & 0xFF)) >> 1) << 8)
        | ((((a & 0xFF) + (b & 0xFF)) >> 1))
    )


def _clamp(v: int) -> int:
    return 0 if v < 0 else (255 if v > 255 else v)


def _select(L: int, T: int, TL: int) -> int:
    pL = 0
    pT = 0
    for sh in (24, 16, 8, 0):
        l = (L >> sh) & 0xFF
        t = (T >> sh) & 0xFF
        tl = (TL >> sh) & 0xFF
        p = l + t - tl
        pL += abs(p - l)
        pT += abs(p - t)
    return L if pL < pT else T


def _clamp_add_subtract_full(L: int, T: int, TL: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        out |= _clamp(((L >> sh) & 0xFF) + ((T >> sh) & 0xFF) - ((TL >> sh) & 0xFF)) << sh
    return out


def _clamp_add_subtract_half(AV: int, TL: int) -> int:
    out = 0
    for sh in (24, 16, 8, 0):
        a = (AV >> sh) & 0xFF
        b = (TL >> sh) & 0xFF
        out |= _clamp(a + int((a - b) / 2)) << sh  # C truncating division
    return out


def _inverse_predictor(pixels, w, h, bits, modes):
    tiles_w = _sub_size(w, bits)
    for y in range(h):
        row = y * w
        for x in range(w):
            i = row + x
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = pixels[i - 1]  # top row: forced L
            elif x == 0:
                pred = pixels[i - w]  # left column: forced T
            else:
                mode = (modes[(y >> bits) * tiles_w + (x >> bits)] >> 8) & 0xFF
                L = pixels[i - 1]
                T = pixels[i - w]
                # flattened layout: for x == w-1 this is the current
                # row's leftmost pixel, exactly as the spec defines TR
                TR = pixels[i - w + 1]
                TL = pixels[i - w - 1]
                if mode == 0:
                    pred = 0xFF000000
                elif mode == 1:
                    pred = L
                elif mode == 2:
                    pred = T
                elif mode == 3:
                    pred = TR
                elif mode == 4:
                    pred = TL
                elif mode == 5:
                    pred = _avg2(_avg2(L, TR), T)
                elif mode == 6:
                    pred = _avg2(L, TL)
                elif mode == 7:
                    pred = _avg2(L, T)
                elif mode == 8:
                    pred = _avg2(TL, T)
                elif mode == 9:
                    pred = _avg2(T, TR)
                elif mode == 10:
                    pred = _avg2(_avg2(L, TL), _avg2(T, TR))
                elif mode == 11:
                    pred = _select(L, T, TL)
                elif mode == 12:
                    pred = _clamp_add_subtract_full(L, T, TL)
                elif mode == 13:
                    pred = _clamp_add_subtract_half(_avg2(L, T), TL)
                else:
                    raise ValueError("VP8L: bad predictor mode")
            pixels[i] = _add_pixels(pixels[i], pred)
    return pixels


def _i8(v: int) -> int:
    return v - 256 if v >= 128 else v


def _color_delta(t: int, c: int) -> int:
    return (_i8(t) * _i8(c)) >> 5  # arithmetic shift, both int8


def _inverse_color_transform(pixels, w, h, bits, data):
    tiles_w = _sub_size(w, bits)
    for y in range(h):
        row = y * w
        for x in range(w):
            i = row + x
            cte = data[(y >> bits) * tiles_w + (x >> bits)]
            g2r = cte & 0xFF  # stored in blue channel
            g2b = (cte >> 8) & 0xFF  # green channel
            r2b = (cte >> 16) & 0xFF  # red channel
            p = pixels[i]
            green = (p >> 8) & 0xFF
            red = ((p >> 16) & 0xFF) + _color_delta(g2r, green)
            blue = (p & 0xFF) + _color_delta(g2b, green)
            blue += _color_delta(r2b, red & 0xFF)
            pixels[i] = (p & 0xFF00FF00) | ((red & 0xFF) << 16) | (blue & 0xFF)
    return pixels


def _inverse_subtract_green(pixels, w, h):
    for i, p in enumerate(pixels):
        g = (p >> 8) & 0xFF
        r = (((p >> 16) & 0xFF) + g) & 0xFF
        b = ((p & 0xFF) + g) & 0xFF
        pixels[i] = (p & 0xFF00FF00) | (r << 16) | b
    return pixels


def _inverse_color_indexing(pixels, packed_w, h, width_bits, palette, orig_w):
    n = len(palette)
    bpp = 8 >> width_bits  # index bits per pixel
    ppp = 1 << width_bits  # pixels per packed pixel
    mask = (1 << bpp) - 1
    out = [0] * (orig_w * h)
    for y in range(h):
        prow = y * packed_w
        orow = y * orig_w
        for x in range(orig_w):
            green = (pixels[prow + (x >> width_bits)] >> 8) & 0xFF
            idx = (green >> ((x & (ppp - 1)) * bpp)) & mask
            out[orow + x] = palette[idx] if idx < n else 0
    return out


def _apply_inverse_transforms(pixels, transforms, xsize, ysize):
    for t in reversed(transforms):
        ttype = t[0]
        if ttype == 0:
            pixels = _inverse_predictor(pixels, xsize, ysize, t[1], t[2])
        elif ttype == 1:
            pixels = _inverse_color_transform(pixels, xsize, ysize, t[1], t[2])
        elif ttype == 2:
            pixels = _inverse_subtract_green(pixels, xsize, ysize)
        else:  # color indexing: expands packed width back to original
            orig_w = t[3]
            pixels = _inverse_color_indexing(pixels, xsize, ysize, t[1], t[2], orig_w)
            xsize = orig_w
    return pixels, xsize


# ---------------------------------------------------------------------------
# public decode API

#: Max accepted pixel count. A tiny crafted header can declare
#: 16384×16384 (268M pixels) and stall a pure-Python mapInPandas worker
#: for hours / exhaust memory from a few bytes of payload — a
#: valid-header slow path the corrupt-payload ValueError contract would
#: otherwise miss (ADVICE r7). 4 MP covers every realistic test/corpus
#: asset for a per-image featurizer; beyond it we fast-fail exactly like
#: the JPEG zero-padding guard (tests/test_multimodal.py).
VP8L_MAX_PIXELS = 4 * 1024 * 1024


def _check_dims(w: int, h: int) -> None:
    if w * h > VP8L_MAX_PIXELS:
        raise ValueError(
            f"VP8L: declared {w}x{h} exceeds the {VP8L_MAX_PIXELS}-pixel "
            "decode cap (header-bomb guard)"
        )


def _argb_to_rgba(pixels, w, h) -> np.ndarray:
    arr = np.asarray(pixels, dtype=np.uint32).reshape(h, w)
    out = np.empty((h, w, 4), dtype=np.uint8)
    out[..., 0] = (arr >> 16) & 0xFF
    out[..., 1] = (arr >> 8) & 0xFF
    out[..., 2] = arr & 0xFF
    out[..., 3] = (arr >> 24) & 0xFF
    return out


def decode_vp8l(data: bytes) -> np.ndarray:
    """Decode a VP8L chunk payload (signature byte + bitstream) to RGBA
    uint8 (h, w, 4)."""
    if len(data) < 5 or data[0] != 0x2F:
        raise ValueError("VP8L: bad signature")
    br = BitReader(data[1:])
    w = br.read_bits(14) + 1
    h = br.read_bits(14) + 1
    br.read_bits(1)  # alpha-used hint
    if br.read_bits(3) != 0:
        raise ValueError("VP8L: unsupported version")
    _check_dims(w, h)
    pixels, transforms, final_w = _decode_image_stream(br, w, h, True)
    pixels, out_w = _apply_inverse_transforms(pixels, transforms, final_w, h)
    if out_w != w:
        raise ValueError("VP8L: transform width mismatch")
    return _argb_to_rgba(pixels, w, h)


def _riff_chunks(payload: bytes):
    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a RIFF/WEBP payload")
    chunks = []
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        chunks.append((cid, payload[pos + 8 : pos + 8 + size]))
        pos += 8 + size + (size & 1)
    return chunks


def decode_webp(payload: bytes) -> np.ndarray:
    """RGBA uint8 (h, w, 4) from a WebP file. Lossless (VP8L) decodes
    for real via this module; lossy (VP8 key frame) decodes for real
    via ops/vp8.py (RFC 6386 — round 7, validated bit-exact against
    the system libwebp); an extended file's ALPH plane composes into
    the alpha channel."""
    chunks = dict(_riff_chunks(payload))
    if b"VP8L" in chunks:
        return decode_vp8l(chunks[b"VP8L"])
    if b"VP8 " in chunks:
        from osmart_etl_spark.ops.vp8 import decode_vp8

        rgb = decode_vp8(chunks[b"VP8 "])
        h, w = rgb.shape[:2]
        if b"ALPH" in chunks and b"VP8X" in chunks:
            alpha = decode_webp_alpha(payload)
            if alpha.shape != (h, w):
                raise ValueError("WebP: ALPH dimensions disagree with VP8 frame")
        else:
            alpha = np.full((h, w), 255, dtype=np.uint8)
        return np.dstack([rgb, alpha])
    raise ValueError("WebP: no VP8L/VP8 image chunk")


def decode_webp_alpha(payload: bytes) -> np.ndarray:
    """REAL alpha plane (h, w) uint8 from an extended WebP's ALPH chunk.
    Compression 0 = raw bytes; compression 1 = the headerless VP8L
    stream form (implicit dimensions, alpha carried in the green
    channel), then one of the three inverse prediction filters."""
    chunks = dict(_riff_chunks(payload))
    if b"VP8X" not in chunks or b"ALPH" not in chunks:
        raise ValueError("WebP: no VP8X+ALPH chunks")
    vp8x = chunks[b"VP8X"]
    if len(vp8x) < 10:
        raise ValueError("WebP: short VP8X chunk")
    w = int.from_bytes(vp8x[4:7], "little") + 1
    h = int.from_bytes(vp8x[7:10], "little") + 1
    _check_dims(w, h)
    alph = chunks[b"ALPH"]
    if not alph:
        raise ValueError("WebP: empty ALPH chunk")
    head = alph[0]
    filt = (head >> 2) & 3
    compression = head & 3
    if compression == 0:
        raw = np.frombuffer(alph[1 : 1 + w * h], dtype=np.uint8)
        if raw.size != w * h:
            raise ValueError("WebP: short raw alpha")
        plane = raw.reshape(h, w).copy()
    elif compression == 1:
        br = BitReader(alph[1:])
        pixels, transforms, final_w = _decode_image_stream(br, w, h, True)
        pixels, out_w = _apply_inverse_transforms(pixels, transforms, final_w, h)
        if out_w != w:
            raise ValueError("VP8L: alpha transform width mismatch")
        arr = np.asarray(pixels, dtype=np.uint32).reshape(h, w)
        plane = ((arr >> 8) & 0xFF).astype(np.uint8)
    else:
        raise ValueError("WebP: bad alpha compression method")
    return _unfilter_alpha(plane, filt)


def _unfilter_alpha(plane: np.ndarray, filt: int) -> np.ndarray:
    """Inverse of the ALPH prediction filters (0 none, 1 horizontal,
    2 vertical, 3 gradient); deltas are mod-256, predictors use the
    spec's edge fallbacks (first row of vertical/gradient falls back to
    horizontal; first pixel predicts from 0)."""
    if filt == 0:
        return plane
    h, w = plane.shape
    out = plane.astype(np.int32)

    def unfilter_row_horizontal(y):
        pred = out[y - 1, 0] if y > 0 else 0
        for x in range(w):
            pred = (out[y, x] + pred) & 0xFF
            out[y, x] = pred

    if filt == 1:
        for y in range(h):
            unfilter_row_horizontal(y)
    elif filt == 2:
        unfilter_row_horizontal(0)
        for y in range(1, h):
            out[y] = (out[y] + out[y - 1]) & 0xFF
    elif filt == 3:
        unfilter_row_horizontal(0)
        for y in range(1, h):
            left = out[y - 1, 0]
            top_left = left
            for x in range(w):
                top = out[y - 1, x]
                grad = min(255, max(0, int(left) + int(top) - int(top_left)))
                left = (out[y, x] + grad) & 0xFF
                out[y, x] = left
                top_left = top
    else:
        raise ValueError("WebP: bad alpha filter")
    return out.astype(np.uint8)


# ---------------------------------------------------------------------------
# minimal encoder (fixtures / roundtrip tests): literal-only stream


def _balanced_lengths(hist: dict[int, int], alphabet_size: int) -> list[int]:
    """Complete canonical code over the used symbols with near-balanced
    lengths: with n used symbols and L = ceil(log2 n), the first
    (2^L - n) symbols get length L-1 and the rest L (Kraft sum exactly
    1). Deliberately suboptimal — this encoder optimizes for testable
    correctness, not ratio."""
    used = sorted(hist)
    n = len(used)
    lengths = [0] * alphabet_size
    if n == 1:
        lengths[used[0]] = 1
        return lengths
    L = (n - 1).bit_length()
    k = (1 << L) - n
    for i, s in enumerate(used):
        lengths[s] = (L - 1) if i < k else L
    return lengths


def _write_code_lengths(bw: BitWriter, lengths: list[int]) -> None:
    """Normal-code header with a FIXED complete code-length code:
    symbols 0..15 all get 4-bit codes (16 x 2^-4 = 1, complete), the
    RLE symbols 16/17/18 are unused — every alphabet length is then
    written as its own plain 4-bit canonical code."""
    bw.write_bits(1, 0)  # not simple
    bw.write_bits(4, 15)  # num_code_lengths = 4 + 15 = 19
    fixed = {s: 4 for s in range(16)}
    fixed[16] = 0
    fixed[17] = 0
    fixed[18] = 0
    for s in _CODE_LENGTH_ORDER:
        bw.write_bits(3, fixed[s])
    bw.write_bits(1, 0)  # no max_symbol shortcut
    for l in lengths:  # canonical 4-bit code for value v is v itself
        bw.write_code(4, l)


def _write_huffman_code(bw: BitWriter, lengths: list[int]) -> CanonicalCode:
    used = [s for s, l in enumerate(lengths) if l > 0]
    if len(used) <= 2 and max(used) <= 255:
        bw.write_bits(1, 1)  # simple
        bw.write_bits(1, len(used) - 1)
        if len(used) == 1 and used[0] <= 1:
            bw.write_bits(1, 0)  # 1-bit symbol
            bw.write_bits(1, used[0])
        else:
            bw.write_bits(1, 1)  # 8-bit symbol(s)
            bw.write_bits(8, used[0])
            if len(used) == 2:
                bw.write_bits(8, used[1])
    else:
        _write_code_lengths(bw, lengths)
    return CanonicalCode(lengths)


def encode_vp8l(img: np.ndarray) -> bytes:
    """Encode (h, w, c) uint8 (c in 1/3/4; 1=grey, 3=RGB, 4=RGBA) as a
    VP8L chunk payload. Literal-only, no transforms — encode→decode is
    exact."""
    img = np.asarray(img)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    if not (1 <= w <= 16384 and 1 <= h <= 16384):
        raise ValueError("VP8L: dimensions out of range")
    if c == 1:
        rgba = np.concatenate([img, img, img, np.full((h, w, 1), 255, np.uint8)], axis=2)
    elif c == 3:
        rgba = np.concatenate([img, np.full((h, w, 1), 255, np.uint8)], axis=2)
    elif c == 4:
        rgba = img
    else:
        raise ValueError("VP8L: unsupported channel count")
    r = rgba[..., 0].ravel()
    g = rgba[..., 1].ravel()
    b = rgba[..., 2].ravel()
    a = rgba[..., 3].ravel()

    bw = BitWriter()
    bw.write_bits(14, w - 1)
    bw.write_bits(14, h - 1)
    bw.write_bits(1, int(bool((a != 255).any())))
    bw.write_bits(3, 0)  # version
    bw.write_bits(1, 0)  # no transforms
    bw.write_bits(1, 0)  # no color cache
    bw.write_bits(1, 0)  # no meta-Huffman

    def hist(v):
        vals, counts = np.unique(v, return_counts=True)
        return {int(s): int(n) for s, n in zip(vals, counts)}

    codes = []
    for channel, size in ((g, 280), (r, 256), (b, 256), (a, 256), (None, 40)):
        hh = {0: 1} if channel is None else hist(channel)  # distance: unused
        codes.append(_write_huffman_code(bw, _balanced_lengths(hh, size)))
    cg, cr, cb, ca, _ = codes
    for i in range(h * w):
        for code, v in ((cg, g[i]), (cr, r[i]), (cb, b[i]), (ca, a[i])):
            l, cd = code.codes[int(v)]
            if l:
                bw.write_code(l, cd)
    return b"\x2f" + bw.tobytes()


def encode_webp(img: np.ndarray) -> bytes:
    """RIFF-wrapped lossless WebP file bytes for (h, w, c) uint8."""
    stream = encode_vp8l(img)
    chunk = b"VP8L" + len(stream).to_bytes(4, "little") + stream
    if len(stream) & 1:
        chunk += b"\x00"
    body = b"WEBP" + chunk
    return b"RIFF" + len(body).to_bytes(4, "little") + body
