"""REAL lossless-WebP (VP8L) codec tests: encode/decode roundtrip, a
genuine third-party-encoded VP8L stream (CPython's python.webp ALPH
chunk, coded with WebP-lossless compression by libwebp), hand-built
streams for LZ77/color-cache, inverse-transform unit vectors, and the
corrupt-payload error contract (ops/vp8l.py)."""

from __future__ import annotations

import base64
import hashlib

import numpy as np
import pytest

# CPython's 16x16 python.webp (Lib/test/imghdrdata / test_email/data,
# PSF-licensed test data): a REAL third-party libwebp-encoded extended
# WebP — lossy VP8 RGB + an ALPH chunk whose compression method is 1,
# i.e. a genuine VP8L lossless image stream (headerless alpha form,
# color-indexing transform + entropy-coded image). Decoding it checks
# our VP8L decoder against an independent encoder.
_REAL_WEBP = base64.b64decode(
    "UklGRqgBAABXRUJQVlA4WAoAAAAQAAAADwAADwAAQUxQSMMAAAABJ6KokSTleucYX+ffKpmI"
    "mP90cY3gJjDi4Yt3MsjBEVyDKzDosHgVjnhRNcEIDAJPkqBqsFUZHNa2bUYvTsZ2PLbtd/uv"
    "Ka4hov9J0f2PkPe6REkkGzolkTTzFG0Ox9PlFiD0CxS+kOGDtxoynjaCfx0pfk52CPuInrOR"
    "75lzRugygtv4zEiy90UwfSD9NheMITJWLaXWayO8XeOlWRXVnIGk2W6WdYoYMQ+KqixQNPow"
    "gt+6a1BSKbUtz+lUFAoBAAAAVlA4IL4AAACQAgCdASoQABAAAwA0JbACdDBPCIUMfAMdCCz9"
    "6AD+/XSg/QKbH4r3Q3ycN/bSDK/T/zVo4u6nvclvG/SqxWOuup+XhN9BojvaW+Tv+MvxvX/h"
    "r/o/5Qns9LtmX/+qKdl/yWznhuasl7nkxvSTI4xf3Y85VSB/lU/8Ofj/b9JrA+ifvIOYZm2x"
    "1RP/dhfmsf5diuSfR7+z+r/+HR3zEo/+XM/B+vkYw73Pzx+ROaAB/ZoBSzEs3rzZe6qsAAAA"
)


def test_vp8l_roundtrip_all_channel_layouts():
    """encode→decode is an exact identity for grey/RGB/RGBA across
    shapes including single-pixel and single-row images."""
    from osmart_etl_spark.ops.vp8l import decode_webp, encode_webp

    rng = np.random.default_rng(7)
    for c in (1, 3, 4):
        for shape in ((5, 7), (16, 16), (11, 3), (1, 1), (1, 40), (40, 1)):
            img = rng.integers(0, 256, size=(*shape, c), dtype=np.uint8)
            dec = decode_webp(encode_webp(img))
            assert dec.shape == (*shape, 4)
            if c == 4:
                assert np.array_equal(dec, img)
            elif c == 3:
                assert np.array_equal(dec[..., :3], img)
                assert (dec[..., 3] == 255).all()
            else:
                for k in range(3):
                    assert np.array_equal(dec[..., k], img[..., 0])
                assert (dec[..., 3] == 255).all()


def test_vp8l_constant_image_zero_bit_codes():
    """A constant-color image exercises the trivial single-symbol
    Huffman codes that consume ZERO bits per pixel (spec degenerate
    simple-code case) — the whole pixel stream costs no entropy bits."""
    from osmart_etl_spark.ops.vp8l import decode_webp, encode_webp

    img = np.full((9, 13, 4), [17, 200, 3, 129], dtype=np.uint8)
    enc = encode_webp(img)
    assert np.array_equal(decode_webp(enc), img)
    assert len(enc) < 120  # header + code tables only, no per-pixel bits


def test_vp8l_decodes_real_third_party_alpha_stream():
    """The CPython python.webp ALPH chunk is a genuine libwebp-encoded
    VP8L lossless stream (compression method 1, color-indexing
    transform). It must decode to the 16x16 Python-logo alpha mask:
    pinned bytes, plus a structural cross-check against the PPM sibling
    of the SAME logo from the JPEG tests (fully transparent exactly
    where the RGB render is black background)."""
    from osmart_etl_spark.ops.vp8l import decode_webp_alpha

    alpha = decode_webp_alpha(_REAL_WEBP)
    assert alpha.shape == (16, 16)
    assert hashlib.md5(alpha.tobytes()).hexdigest() == (
        "fa1667e19ae1b259be670911674006a6"
    )
    # corners of the logo canvas are fully transparent, the snake body
    # fully opaque
    assert alpha[0, 0] == alpha[0, 15] == alpha[15, 0] == alpha[15, 15] == 0
    assert (alpha == 255).sum() > 100
    # independent structural check vs the third-party PPM of the same
    # logo (background renders black where alpha is 0)
    import test_multimodal as tm

    rgb = tm._ppm_pixels()
    background = rgb.sum(axis=2) == 0
    # anti-aliased edges carry partial alpha, so threshold at half
    agreement = (background == (alpha < 128)).mean()
    assert agreement > 0.95, agreement


def test_vp8l_lossy_vp8_raises_not_implemented():
    from osmart_etl_spark.ops.vp8l import decode_webp

    with pytest.raises(NotImplementedError):
        decode_webp(_REAL_WEBP)  # RGB is lossy VP8 — honestly refused


def test_vp8l_lz77_and_color_cache_hand_built_stream():
    """Hand-assembled bitstream exercising the paths the literal-only
    encoder can't: an LZ77 backward reference with a 2D plane-code
    distance, plus a color-cache hit. 4x1 image: literal pixel, backref
    (len 2, dist 1 via plane code 2 -> (1,0)), then a cache reference —
    all four pixels must decode identical."""
    from osmart_etl_spark.ops.vp8l import (
        BitReader,
        BitWriter,
        CanonicalCode,
        _balanced_lengths,
        _write_huffman_code,
        decode_vp8l,
    )

    g0, r0, b0, a0 = 10, 20, 30, 255
    px = (a0 << 24) | (r0 << 16) | (g0 << 8) | b0
    cache_bits = 4
    cache_idx = ((0x1E35A7BD * px) & 0xFFFFFFFF) >> (32 - cache_bits)

    bw = BitWriter()
    bw.write_bits(14, 4 - 1)  # width 4
    bw.write_bits(14, 1 - 1)  # height 1
    bw.write_bits(1, 0)  # alpha hint
    bw.write_bits(3, 0)  # version
    bw.write_bits(1, 0)  # no transforms
    bw.write_bits(1, 1)  # color cache present
    bw.write_bits(4, cache_bits)
    bw.write_bits(1, 0)  # no meta-Huffman
    green_alpha = 256 + 24 + (1 << cache_bits)
    length_sym = 256 + 1  # LZ77 length prefix code 1 -> length 2
    cache_sym = 256 + 24 + cache_idx
    cg = _write_huffman_code(
        bw, _balanced_lengths({g0: 1, length_sym: 1, cache_sym: 1}, green_alpha)
    )
    _write_huffman_code(bw, _balanced_lengths({r0: 1}, 256))
    _write_huffman_code(bw, _balanced_lengths({b0: 1}, 256))
    _write_huffman_code(bw, _balanced_lengths({a0: 1}, 256))
    # distance code: single symbol 1 (0 bits) -> prefix value 2 ->
    # plane code 2 = (dx 1, dy 0) -> distance 1
    _write_huffman_code(bw, _balanced_lengths({1: 1}, 40))
    for sym in (g0, length_sym, cache_sym):
        l, code = cg.codes[sym]
        bw.write_code(l, code)
    data = b"\x2f" + bw.tobytes()

    img = decode_vp8l(data)
    assert img.shape == (1, 4, 4)
    expected = np.array([r0, g0, b0, a0], dtype=np.uint8)
    for x in range(4):
        assert np.array_equal(img[0, x], expected), (x, img[0, x])


def test_vp8l_inverse_transform_unit_vectors():
    """Inverse transforms against hand-computed expectations from the
    spec formulas: subtract-green, cross-color delta, predictor modes
    (incl. Select and ClampAddSubtract), palette sub-byte unpacking."""
    from osmart_etl_spark.ops.vp8l import (
        _color_delta,
        _inverse_color_indexing,
        _inverse_predictor,
        _inverse_subtract_green,
    )

    # subtract-green: r/b shift by g mod 256
    [p] = _inverse_subtract_green([(0xFF << 24) | (10 << 16) | (200 << 8) | 250], 1, 1)
    assert ((p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF) == ((10 + 200) % 256, 200, (250 + 200) % 256)

    # cross-color delta: int8 product with arithmetic >> 5
    assert _color_delta(0x20, 0x10) == (32 * 16) >> 5  # positive
    assert _color_delta(0xE0, 0x10) == (-32 * 16) >> 5  # negative t
    assert _color_delta(0x20, 0xF0) == (32 * -16) >> 5  # negative c

    # predictor: 2x2 image, one tile, mode 7 (Average2(L, T)); residuals
    # picked so predictions are easy to follow. Pixel (0,0) predicts
    # from opaque black 0xFF000000.
    def argb(a, r, g, b):
        return (a << 24) | (r << 16) | (g << 8) | b

    resid = [argb(0, 10, 10, 10), argb(0, 4, 4, 4), argb(0, 6, 6, 6), argb(0, 0, 0, 0)]
    modes = [argb(0, 0, 7, 0)]  # mode in green channel
    out = _inverse_predictor(list(resid), 2, 2, 1, modes)
    assert out[0] == argb(0xFF, 10, 10, 10)  # black + residual
    assert out[1] == argb(0xFF, 14, 14, 14)  # top row: L forced
    assert out[2] == argb(0xFF, 16, 16, 16)  # left col: T forced
    # (1,1): Average2(L=16, T=14) = 15 per channel; alpha avg(255,255)
    assert out[3] == argb(0xFF, 15, 15, 15)

    # palette: 4 colors -> 2 bits/index, 4 indices packed per green byte
    pal = [argb(255, i, 2 * i, 3 * i) for i in (1, 2, 3, 4)]
    packed_green = 0b11100100  # indices 0,1,2,3 from LSB pairs
    packed = [argb(0, 0, packed_green, 0)]
    out = _inverse_color_indexing(packed, 1, 1, 2, pal, 4)
    assert out == pal


def test_vp8l_corrupt_payloads_valueerror_only():
    """Error contract under rot (same as the JPEG codec): every
    truncated or bit-flipped payload either decodes or raises
    ValueError — never Index/Key/Overflow errors that would escape the
    mapInPandas decode_status catch."""
    import random

    from osmart_etl_spark.ops.vp8l import decode_webp, encode_webp

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(8, 8, 4), dtype=np.uint8)
    payload = encode_webp(img)
    for cut in (0, 3, 11, 20, len(payload) // 2, len(payload) - 2):
        try:
            decode_webp(payload[:cut])
        except ValueError:
            pass
    r = random.Random(42)
    for _ in range(200):
        b = bytearray(payload)
        i = r.randrange(20, len(b))  # keep RIFF header + dims intact
        b[i] ^= 1 << r.randrange(8)
        try:
            decode_webp(bytes(b))
        except ValueError:
            pass


def test_vp8l_header_bomb_dimension_cap():
    """A few-byte payload whose valid header declares 16384x16384 must
    fast-fail with ValueError (pixel-count cap) instead of stalling a
    worker for hours in the pure-Python pixel loops (ADVICE r7)."""
    from osmart_etl_spark.ops.vp8l import (
        VP8L_MAX_PIXELS,
        decode_vp8l,
        decode_webp_alpha,
    )

    # VP8L chunk: signature 0x2F then 14-bit (w-1), 14-bit (h-1) LSB-first
    bits = 0
    bits |= (16384 - 1) << 0
    bits |= (16384 - 1) << 14
    # alpha hint (1 bit) + version (3 bits) = 0
    payload = bytes([0x2F]) + bits.to_bytes(4, "little") + b"\x00" * 4
    with pytest.raises(ValueError, match="pixel"):
        decode_vp8l(payload)
    assert 16384 * 16384 > VP8L_MAX_PIXELS

    # same guard on the VP8X/ALPH path (24-bit canvas dims)
    vp8x = bytes(4) + (16383).to_bytes(3, "little") + (16383).to_bytes(3, "little")
    alph = b"\x01" + b"\x00" * 8
    riff = (
        b"RIFF" + (0).to_bytes(4, "little") + b"WEBP"
        + b"VP8X" + len(vp8x).to_bytes(4, "little") + vp8x
        + b"ALPH" + len(alph).to_bytes(4, "little") + alph + b"\x00"
    )
    with pytest.raises(ValueError, match="pixel"):
        decode_webp_alpha(riff)


def test_webp_lossless_payload_end_to_end_spark(spark):
    """A VP8L payload flows through extract_features with
    decode_status 'ok' and the exact feature of the decoded RGBA —
    while a lossy payload in the same batch stays 'fake_decoder'."""
    from osmart_etl_spark.ops.multimodal import (
        MEDIA_SCHEMA,
        _quadrant_feature,
        extract_features,
    )
    from osmart_etl_spark.ops.vp8l import decode_webp, encode_webp

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(12, 10, 3), dtype=np.uint8)
    lossless = encode_webp(img)
    ref = [float(x) for x in _quadrant_feature(decode_webp(lossless))]
    rows = [
        (1, "image", lossless, len(lossless), 10, 12, None),
        (2, "image", _REAL_WEBP, len(_REAL_WEBP), 16, 16, None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in extract_features(media).collect()}
    assert got[1]["decode_status"] == "ok"
    assert got[1]["feature"] == ref
    assert got[2]["decode_status"] == "fake_decoder"
