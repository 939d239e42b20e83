"""GIF decoder tests (ops/gif.py): LZW roundtrips across palette sizes
(incl. the table-full CLEAR-reset path), interlace, animation
composition with transparency and all disposal modes, the error
contract, and a genuine third-party fixture — CPython's PSF-licensed
16x16 python.gif (Lib/test/imghdrdata) cross-checked pixel-by-pixel on
its opaque region against the PPM sibling of the same image (an
independent ground truth: the GIF was palette-quantized from it, so
opaque pixels must agree within quantization error)."""

from __future__ import annotations

import base64
import hashlib

import numpy as np
import pytest

# CPython Lib/test/imghdrdata/python.gif (PSF test data, ImageMagick-
# encoded GIF89a, 64-color GCT, transparency) and its python.ppm
# sibling (raw P6 RGB ground truth).
_GIF = base64.b64decode(
    "R0lGODlhEAAQAPU/AOu7GOu+IfPBGvrHGf3LG//MHOvCKv/PI//PJP/QJf/TLevFNOjHPf/TMP/U"
    "MP3VNvrTOf/XOfnVPv/YOuzORf/aQf/bRP/eS//fTv/iVf/jWP/nYvLhbvXjb/3pav/rbDJghzZm"
    "kDZnkTZpkzdoljdqljlsljpvmzpwnDtwnDxxnj1zoj50oj92pUB4pkJ7qkN8q0N9rUV/r0aAsUeB"
    "skiDtEiFtkqGukyJvEyKvEyKv0+NwVCPw1KRxv///wAAACH/C0ltYWdlTWFnaWNrB2dhbW1hPTAA"
    "IfkEBQAAPwAsAAAAABAAEAAABpvAn/C3u81iLRVpyBTmfLMXC1VqMm1RVqo0sv50thjLFDKVqsze"
    "DleTuVSn0fmXuUh+PB1N9oKP/iA/FxUPXzY0UipnIoEUhAo/hzAuXU0VEQoHP0cuIj8cHhsZGBUT"
    "CggEPzFSPx0fGxoYFhENCAUCQispP6+xpacFBVawGAwLBgEAAF6xsw0Jwl4/shEOCT6p0j8QzwUD"
    "2uBDQQA7"
)
_PPM = base64.b64decode(
    "UDYKMTYgMTYKMjU1CgAAAAAAAAAAAAAAAE6NwEqGukiDtER+rUB4pzxxnjdolgAAAAAAAAAAAAAA"
    "AAAAAAAAAAAAAAAAAAAAAEyKvP///0V/r0F5qD50ojpvmzZplAAAAAAAAAAAAAAAAAAAAAAAAAAA"
    "AAAAAAAAAEmFt0aAsUJ7qj51oztwnTdqljZplAAAAAAAAAAAAAAAAAAAAAAAAE6PxEyKv0iFtkN9"
    "rT10oTlsljZmkDhslzZplDZplAAAAAAAAAAAAAAAAAAAAFKRxk+NwUuIu0iDtER9rUB4pj1zoDlt"
    "mTZplDZplDZplAAAAP/iVf3dSvnVPgAAAFCPw0yJvEiEtUV/r0F5qD10oTpvmzZplDZplDZplDJg"
    "hwAAAP/eS//aQf3VNgAAAE2LvkmFt0aAsEJ7qj51oztwnDdqljZplDVokjJghwAAAOzORf/aQv/W"
    "N//TLQAAAEqHuUeBskN8qz92pTZpkxsxRQAAAAAAAAAAAAAAAOLDRf3ZQf/XOP/TLf/PIwAAAEaB"
    "skR9rUB4pjZnkQAAAPLhbv3pav/mYf/jV//fTf/bQv/XOP/TLv/PJP3LGwAAAEN9rkF5qD10oRwy"
    "S/Xjb//rbP/nYf/jV//fTf/bQ//XOf/TLv/PJP/MHPPBGgAAAEB1oz1zojpwnAAAAP/rbP/nYv/j"
    "WP/fTv/bQ//XOf/TL//PJP/MHP/MHMKaEgAAAAAAAAAAAAAAAAAAAP/nYv/jWP/fTujHPevFNOvC"
    "Kuu+Ieu7GOu7GMabEgAAAAAAAAAAAAAAAAAAAAAAAP/jWP/fTv/bRP/XOv/TMP/QJf/MHAAAAAAA"
    "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAP3eTv/bRP/YOv/UMP/QJv////3LGwAAAAAAAAAAAAAAAAAA"
    "AAAAAAAAAAAAAAAAAPHQP/rTOf3SL//QJv/MHPrHGcCXEgAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA"
    "AAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAAA=="
)


def test_gif_third_party_fixture_vs_ppm_sibling():
    from osmart_etl_spark.ops.gif import decode_gif

    frames = decode_gif(_GIF)
    assert len(frames) == 1
    f = frames[0]
    assert f.shape == (16, 16, 4)
    # pinned pixels: any regression in LZW/palette/transparency flips this
    assert hashlib.md5(f.tobytes()).hexdigest() == "75045430754afb3fbc769aaee46b7faa"
    # independent ground truth: the PPM sibling. Opaque pixels must
    # match within the GIF's 64-color quantization error.
    ref = np.frombuffer(_PPM[_PPM.find(b"255\n") + 4 :], np.uint8).reshape(16, 16, 3)
    opaque = f[..., 3] == 255
    assert 100 < int(opaque.sum()) < 256  # transparency actually present
    diff = np.abs(f[..., :3].astype(int) - ref.astype(int))[opaque]
    assert diff.max() <= 3 and diff.mean() < 1.0


@pytest.mark.parametrize("ncol,shape", [(4, (7, 5)), (16, (16, 16)), (64, (33, 17)), (256, (90, 80))])
def test_gif_roundtrip_palette_sizes(ncol, shape):
    from osmart_etl_spark.ops.gif import decode_gif, encode_gif

    rng = np.random.default_rng(ncol)
    pal = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
    img = rng.integers(0, ncol, shape, dtype=np.uint8)
    frames = decode_gif(encode_gif([img], pal))
    assert len(frames) == 1
    assert np.array_equal(frames[0][..., :3], pal[img])
    assert (frames[0][..., 3] == 255).all()


def test_gif_lzw_table_full_clear_reset():
    """128x128 random 256-color noise forces the LZW table to 4096
    entries and the encoder's CLEAR-reset path; the decoder must track
    both the 12-bit ceiling and the mid-stream reset."""
    from osmart_etl_spark.ops.gif import decode_gif, encode_gif

    rng = np.random.default_rng(99)
    pal = rng.integers(0, 256, (256, 3), dtype=np.uint8)
    img = rng.integers(0, 256, (128, 128), dtype=np.uint8)
    assert np.array_equal(decode_gif(encode_gif([img], pal))[0][..., :3], pal[img])


def test_gif_interlace_roundtrip():
    from osmart_etl_spark.ops.gif import decode_gif, encode_gif

    rng = np.random.default_rng(5)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    img = rng.integers(0, 16, (13, 9), dtype=np.uint8)  # odd dims stress passes
    frames = decode_gif(encode_gif([img], pal, interlace=True))
    assert np.array_equal(frames[0][..., :3], pal[img])


def test_gif_animation_composition_disposal_and_transparency():
    """Frame 2 is a 2x2 sub-rect with a transparent index: composed
    canvas keeps frame-1 pixels under the transparent holes. Disposal 2
    (restore background) then clears the rect for frame 3; disposal 3
    (restore previous) brings back the pre-frame state."""
    from osmart_etl_spark.ops.gif import decode_gif, encode_gif

    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]], dtype=np.uint8)
    base = np.zeros((4, 4), dtype=np.uint8)  # all red
    patch = np.array([[1, 3], [3, 2]], dtype=np.uint8)  # 3 = transparent
    payload = encode_gif(
        [base, patch, patch],
        pal,
        transparent=3,
        disposals=[0, 2, 3],
        offsets=[(0, 0), (1, 1), (1, 1)],
        canvas_wh=(4, 4),
    )
    frames = decode_gif(payload)
    assert len(frames) == 3
    f1, f2, f3 = frames
    assert (f1[..., :3] == pal[0]).all()
    # frame 2: green at (1,1), blue at (2,2); transparent cells keep red
    assert tuple(f2[1, 1, :3]) == (0, 255, 0) and tuple(f2[2, 2, :3]) == (0, 0, 255)
    assert tuple(f2[1, 2, :3]) == (255, 0, 0) and tuple(f2[2, 1, :3]) == (255, 0, 0)
    # frame 2 carried disposal 2 -> before frame 3 the rect is cleared
    # to transparent, so frame 3's transparent holes show alpha=0
    assert f3[1, 2, 3] == 0 and f3[2, 1, 3] == 0
    assert tuple(f3[1, 1, :3]) == (0, 255, 0)


def test_gif_error_contract():
    from osmart_etl_spark.ops.gif import decode_gif, lzw_decode

    with pytest.raises(ValueError):
        decode_gif(b"not a gif at all")
    # header bomb: valid signature, giant declared canvas
    bomb = b"GIF89a" + (30000).to_bytes(2, "little") * 2 + b"\x00\x00\x00\x3b"
    with pytest.raises(ValueError):
        decode_gif(bomb)
    with pytest.raises(ValueError):
        decode_gif(b"GIF89a" + (4).to_bytes(2, "little") * 2 + b"\x00\x00\x00\x3b")
    with pytest.raises(ValueError):
        lzw_decode(b"\x00", 8, 100)  # exhausted stream


def test_extract_features_gif_ok(spark):
    from osmart_etl_spark.ops.gif import encode_gif
    from osmart_etl_spark.ops.multimodal import MEDIA_SCHEMA, extract_features

    rng = np.random.default_rng(11)
    pal = rng.integers(0, 256, (16, 3), dtype=np.uint8)
    payload = encode_gif([rng.integers(0, 16, (16, 16), dtype=np.uint8)], pal)
    df = spark.createDataFrame(
        [(0, "image", payload, len(payload), None, None, None)], MEDIA_SCHEMA
    )
    row = extract_features(df).collect()[0]
    assert row["decode_status"] == "ok"
    assert len(row["feature"]) == 4


def test_gif_bulk_third_party_stdlib_icons():
    """Every GIF shipped with the container's CPython/Tix installs
    (~30 genuine files from different encoders and eras, some
    interlaced, some with local palettes/transparency) must decode
    without error to a plausible RGBA canvas. No pinned pixels — this
    is breadth coverage; the pinned-pixel depth test is above."""
    import glob
    import os

    roots = [
        "/mnt/sandboxing/model_tools_env/v1/python/install/lib/python3.11/idlelib/Icons",
        "/mnt/sandboxing/model_tools_env/v1/python/install/lib/Tix8.4.3/bitmaps",
        "/mnt/sandboxing/model_tools_env/v1/python/install/lib/python3.11/test",
    ]
    paths = sorted(
        p
        for root in roots
        if os.path.isdir(root)
        for p in glob.glob(os.path.join(root, "**", "*.gif"), recursive=True)
        if os.path.getsize(p) < 512 * 1024
    )
    if len(paths) < 5:
        pytest.skip("stdlib GIF corpus not present")
    from osmart_etl_spark.ops.gif import decode_gif

    decoded = 0
    for p in paths:
        with open(p, "rb") as f:
            frames = decode_gif(f.read())
        assert frames and all(
            f.ndim == 3 and f.shape[2] == 4 and f.size > 0 for f in frames
        ), p
        decoded += 1
    assert decoded >= 5
