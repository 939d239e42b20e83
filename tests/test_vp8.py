"""REAL lossy-WebP (VP8 key-frame) decoder tests (ops/vp8.py, RFC
6386): boolean coder roundtrip, a genuine third-party libwebp-encoded
stream (CPython's python.webp) cross-checked against its lossless
python.ppm source sibling, a pinned libwebp-encoded lossy fixture,
corrupt-payload / header-bomb contracts, and — when the system libwebp
is present — bit-exact YUV conformance against libwebp's own decoder
over random images encoded by the real libwebp encoder."""

from __future__ import annotations

import base64
import ctypes
import hashlib
import os
import random
import zlib

import numpy as np
import pytest

from osmart_etl_spark.ops import vp8
from tests.test_vp8l import _REAL_WEBP

_LIBWEBP = "/usr/lib/x86_64-linux-gnu/libwebp.so.7"

# CPython's python.ppm (PSF test data): the LOSSLESS RGB source the
# python.webp fixture was encoded from — ground truth for the decode.
_PPM_Z = base64.b64decode(
    "eNoLMOMyNFMwNOMyMjXlYkACfr0HvNp2eTRvcalb61Cx3KZwnnnGNAbcwKdrz////13r"
    "1ztWrrArWWSVP9sscwoe9Z6t290aNjpVr7IrXWxdMNc8axpW9X79R3y69nu0bnOuXWtb"
    "stAyZ5pZ2gSLnOlAxZjqgyYe8+896N2xG+TsWqCzl9kWL7DMnQlRDFH//1Ho37teP6/a"
    "AdkB/Yd9Ovd4tGyFOBtoPsTZEGSU0A5Sf8/7/y3Hv1fNgGzf7n1gZ2+AOXsOxNmmGZMg"
    "it+cc/1/y+n/NfP/l3WBXK/2ne6Nm5xrVtuXLTXLnCxt6Irs2keHXf/edPx/3QKo+P95"
    "ZaCIW+MmiLPN0icCuZ8e5v19mfX/WeL/x+H/7/v+v+0EVqz3/7zK39PSQAXOtesgzpYx"
    "8v76OP//65z/z+GKnf9ft4Qo/n9G5vNBKaB6h9LFtsWLrArmgPwFUpz0/3HE//t+MMX6"
    "EMVAdGiWEFrYwhW/OG77+qjJ60Nar/cpvt4tAUTHZgthRhzMZJf/163+Xzb4f0EVaCye"
    "9PD3HljxDav/V4CK1YBpCeJHXODjBftfly3/XtIHKT4j8+u45IHpQgyUAQBgJg6s"
)

# A 24x20 lossy WebP encoded TODAY by the system libwebp (q=70) from a
# deterministic source image (regenerated below) — a genuine
# third-party-encoder stream whose bytes are pinned here so the test
# runs without libwebp.
_LOSSY = base64.b64decode(
    "UklGRjYBAABXRUJQVlA4ICoBAACQCACdASoYABQAPp1Em0qlo6IhqAqosBOJbACdMoR5"
    "n5nw5rhvemun2AdpjbMc/R0f/mgbyr/qv9VINz9t+2vBG1ucgmWc94wJdMv9iAD++JMs"
    "pbrSTZUV3GqNsM4azSR9w7AvB8NrXUqIEXPD/K/dbcwlvd6vZLwn69qMbd+VWYhVhdmh"
    "TMbH8M/SYl7h5pNTo1MuW5c0GP5OiQYuX75VjADcxLm/WBbKTnjJtjeGWa5Q/MVfoc2T"
    "M/l+qLMBro6LHC5ZKPVF6TQ0dFwXCCWBR29whcLTQC5zlc5WoIpj68KnnL95tPU+qx+h"
    "yNU4k8cxs8q4S6Uk3cS8+Q8wquEuQHPsnrYjWgrfF7AEHIYqqs0L4dpR8+H05+qJT5dQ"
    "oyIy/tlR+mjgAAAA"
)


def _mkimg(w, h, seed):
    rng = np.random.default_rng(seed)
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    img = np.stack(
        [
            xx * 255 // max(w - 1, 1),
            yy * 255 // max(h - 1, 1),
            ((xx // 4 + yy // 4) % 2) * 180 + 30,
        ],
        axis=-1,
    ).astype(np.uint8)
    return np.clip(
        img.astype(int) + rng.integers(-25, 25, img.shape), 0, 255
    ).astype(np.uint8)


def _vp8_chunk(webp: bytes) -> bytes:
    pos = 12
    while pos + 8 <= len(webp):
        cid = webp[pos : pos + 4]
        sz = int.from_bytes(webp[pos + 4 : pos + 8], "little")
        if cid == b"VP8 ":
            return webp[pos + 8 : pos + 8 + sz]
        pos += 8 + sz + (sz & 1)
    raise AssertionError("no VP8 chunk")


def test_bool_coder_roundtrip_fuzz():
    rng = random.Random(7)
    for _ in range(60):
        seq = [
            (rng.randrange(2), rng.randrange(1, 255))
            for _ in range(rng.randrange(1, 400))
        ]
        e = vp8.BoolEncoder()
        for b, p in seq:
            e.put(b, p)
        d = vp8.BoolDecoder(e.flush())
        assert [d.bool(p) for _, p in seq] == [b for b, _ in seq]


def test_third_party_python_webp_decodes_and_matches_ppm_source():
    """CPython's libwebp-encoded python.webp: our RFC 6386 decode must
    reproduce the pinned YUV planes AND sit within lossy distance of
    the lossless python.ppm source on OPAQUE pixels (the RGB under
    transparent pixels is encoder-arbitrary, so the ALPH plane — which
    our VP8L decoder reads — masks the comparison)."""
    from osmart_etl_spark.ops.vp8l import decode_webp, decode_webp_alpha

    chunk = _vp8_chunk(_REAL_WEBP)
    y, u, v = vp8.decode_vp8_frame(chunk)
    assert y.shape == (16, 16) and u.shape == (8, 8)
    assert (
        hashlib.md5(y.tobytes() + u.tobytes() + v.tobytes()).hexdigest()
        == "68ee0057fffad4c044d4a09e14bf6ff8"
    )
    ppm = zlib.decompress(_PPM_Z)
    parts = ppm.split(b"\n", 3)
    ref = np.frombuffer(parts[3][: 16 * 16 * 3], dtype=np.uint8).reshape(16, 16, 3)
    rgba = decode_webp(_REAL_WEBP)
    assert rgba.shape == (16, 16, 4)
    alpha = decode_webp_alpha(_REAL_WEBP)
    assert np.array_equal(rgba[..., 3], alpha)
    mask = alpha > 200
    assert mask.sum() > 100
    diff = np.abs(rgba[..., :3].astype(int) - ref.astype(int))[mask]
    # q≈75 lossy + chroma upsample: small per-pixel error, tiny mean
    assert diff.mean() < 12.0, diff.mean()
    # the saturated logo colors must survive (catches channel swaps /
    # dead chroma that a mean-only check could miss)
    for ch in range(3):
        assert (
            abs(
                float(rgba[..., ch][mask].mean())
                - float(ref[..., ch][mask].mean())
            )
            < 10.0
        )


def test_pinned_libwebp_lossy_fixture():
    """A second genuine libwebp-encoded stream (24x20, q70, bytes
    pinned above): pinned YUV planes + lossy distance to its
    regenerated source image."""
    from osmart_etl_spark.ops.vp8l import decode_webp

    src = _mkimg(24, 20, 7)
    assert hashlib.md5(src.tobytes()).hexdigest() == "4e7cf1e1e4e8c2b688e2cada3f7efa70"
    chunk = _vp8_chunk(_LOSSY)
    y, u, v = vp8.decode_vp8_frame(chunk)
    assert y.shape == (20, 24)
    assert (
        hashlib.md5(y.tobytes() + u.tobytes() + v.tobytes()).hexdigest()
        == "0092160d4d3effef81a5820eeed04fa8"
    )
    rgba = decode_webp(_LOSSY)
    assert rgba.shape == (20, 24, 4) and (rgba[..., 3] == 255).all()
    diff = np.abs(rgba[..., :3].astype(int) - src.astype(int))
    assert diff.mean() < 16.0, diff.mean()


def test_mode_probe_frames_self_consistent():
    """Our prediction-only encoder roundtrips through our decoder for
    every 4x4 sub-mode and every 16x16/chroma mode. (The same frames
    are decoded bit-identically by the system libwebp in the gated
    conformance test below — that is what pins the SEMANTICS.)"""
    for m in range(10):
        bm = [m] * 16
        chunk = vp8.encode_vp8_modes_frame(
            32, 32, [vp8.B_PRED] * 4, bmodes=[bm, [0] * 16, [0] * 16, bm]
        )
        y, u, v = vp8.decode_vp8_frame(chunk)  # must not raise
        assert y.shape == (32, 32)
    for m in (vp8.DC_PRED, vp8.V_PRED, vp8.H_PRED, vp8.TM_PRED):
        y, _, _ = vp8.decode_vp8_frame(
            vp8.encode_vp8_modes_frame(32, 32, [m] * 4)
        )
        assert y.shape == (32, 32)
    # all-DC single MB is a uniform 128 frame
    y, u, v = vp8.decode_vp8_frame(vp8.encode_vp8_modes_frame(16, 16, [vp8.DC_PRED]))
    assert (y == 128).all() and (u == 128).all() and (v == 128).all()


def test_corrupt_payloads_and_header_bomb():
    chunk = bytearray(_vp8_chunk(_REAL_WEBP))
    # interframe flag
    bad = bytes([chunk[0] | 1]) + bytes(chunk[1:])
    with pytest.raises(ValueError):
        vp8.decode_vp8_frame(bad)
    # bad start code
    bad = bytes(chunk[:3]) + b"\x00\x01\x02" + bytes(chunk[6:])
    with pytest.raises(ValueError):
        vp8.decode_vp8_frame(bad)
    # truncation: first-partition overrun must raise, not hang
    with pytest.raises(ValueError):
        vp8.decode_vp8_frame(bytes(chunk[:12]))
    # header bomb: valid keyframe header declaring 16384x16384
    tag = (20 << 5).to_bytes(3, "little")
    bomb = tag + b"\x9d\x01\x2a" + (16383).to_bytes(2, "little") * 2 + b"\x00" * 24
    with pytest.raises(ValueError, match="pixel"):
        vp8.decode_vp8_frame(bomb)


def test_lossy_webp_extract_features_status_ok(spark):
    """End-to-end through the mapInPandas featurizer: a REAL lossy
    WebP decodes with status 'ok' and the exact quadrant feature of
    the decoded RGBA, while a corrupt VP8 payload in the same batch is
    'decode_error' — fake_decoder no longer applies to webp at all."""
    from osmart_etl_spark.ops.multimodal import (
        MEDIA_SCHEMA,
        _quadrant_feature,
        extract_features,
    )
    from osmart_etl_spark.ops.vp8l import decode_webp

    ref = [float(x) for x in _quadrant_feature(decode_webp(_LOSSY))]
    garbage_body = b"WEBPVP8 " + bytes([24]) + bytes(range(39))
    garbage = b"RIFF" + len(garbage_body).to_bytes(4, "little") + garbage_body
    rows = [
        (1, "image", _LOSSY, len(_LOSSY), 24, 20, None),
        (2, "image", _REAL_WEBP, len(_REAL_WEBP), 16, 16, None),
        (3, "image", garbage, len(garbage), 8, 8, None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in extract_features(media).collect()}
    assert got[1]["decode_status"] == "ok"
    assert got[1]["feature"] == ref
    assert got[2]["decode_status"] == "ok"  # the ALPH+VP8 python logo
    assert got[3]["decode_status"] == "decode_error"
    assert got[3]["feature"] is None


@pytest.mark.skipif(not os.path.exists(_LIBWEBP), reason="system libwebp absent")
def test_conformance_bit_exact_vs_system_libwebp():
    """The acceptance gate for RFC 6386 conformance: images encoded by
    the REAL libwebp encoder at several sizes (incl. non-multiples of
    16) and qualities must decode to BIT-IDENTICAL YUV planes in our
    pure-Python decoder and libwebp's own decoder. Any wrong
    probability-table byte, predictor formula, or loop-filter tap
    fails this immediately."""
    lib = ctypes.CDLL(_LIBWEBP)
    lib.WebPDecodeYUV.restype = ctypes.POINTER(ctypes.c_uint8)
    lib.WebPEncodeRGB.restype = ctypes.c_size_t

    def enc(img, q):
        h, w, _ = img.shape
        out = ctypes.POINTER(ctypes.c_uint8)()
        buf = (ctypes.c_uint8 * img.size).from_buffer_copy(img.tobytes())
        n = lib.WebPEncodeRGB(buf, w, h, w * 3, ctypes.c_float(q), ctypes.byref(out))
        assert n > 0
        return bytes(out[i] for i in range(n))

    def dec(webp):
        w_, h_ = ctypes.c_int(), ctypes.c_int()
        up, vp_ = ctypes.POINTER(ctypes.c_uint8)(), ctypes.POINTER(ctypes.c_uint8)()
        s, us = ctypes.c_int(), ctypes.c_int()
        buf = (ctypes.c_uint8 * len(webp)).from_buffer_copy(webp)
        yp = lib.WebPDecodeYUV(
            buf, len(webp), ctypes.byref(w_), ctypes.byref(h_),
            ctypes.byref(up), ctypes.byref(vp_), ctypes.byref(s), ctypes.byref(us),
        )
        assert yp
        W, H, S, US = w_.value, h_.value, s.value, us.value
        y = np.array([[yp[r * S + c] for c in range(W)] for r in range(H)], np.uint8)
        u = np.array(
            [[up[r * US + c] for c in range((W + 1) // 2)]
             for r in range((H + 1) // 2)], np.uint8)
        v = np.array(
            [[vp_[r * US + c] for c in range((W + 1) // 2)]
             for r in range((H + 1) // 2)], np.uint8)
        return y, u, v

    for i, (w, h) in enumerate([(32, 24), (48, 48), (33, 17)]):
        for q in (25, 80):
            img = _mkimg(w, h, seed=100 + i)
            webp = enc(img, q)
            mine = vp8.decode_vp8_frame(_vp8_chunk(webp))
            theirs = dec(webp)
            for a, b in zip(mine, theirs):
                assert np.array_equal(a, b), (w, h, q)
    # the mode-probe frames, synthesized by OUR encoder, decoded by
    # libwebp — pins prediction semantics incl. all border cases
    for m in range(10):
        bm = [m] * 16
        chunk = vp8.encode_vp8_modes_frame(
            32, 32, [vp8.B_PRED] * 4, bmodes=[bm, [0] * 16, [0] * 16, bm]
        )
        mine = vp8.decode_vp8_frame(chunk)
        theirs = dec(vp8.wrap_webp(chunk))
        for a, b in zip(mine, theirs):
            assert np.array_equal(a, b), f"bmode {m}"
