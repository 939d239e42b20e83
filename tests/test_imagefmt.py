"""Simple image containers (ops/imagefmt.py): PNM, BMP, Sun Raster, TIFF.

The headline evidence is cross-format: CPython's PSF-licensed
python.bmp (32-bit BI_BITFIELDS, V4 header) and python.ras (standard
BGR Sun Raster) must decode PIXEL-EXACTLY equal to python.ppm decoded
independently (and likewise python.tiff) — four genuine third-party
encoders of the same image
agreeing bit-for-bit through three different code paths."""

from __future__ import annotations

import base64

import numpy as np
import pytest

# CPython Lib/test/imghdrdata third-party fixtures (PSF test data).
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

def _read_fixture(name: str) -> bytes | None:
    from tests.imghdr_fixtures import FIXTURES, fixture

    return fixture(name) if name in FIXTURES else None


def test_bmp_and_ras_pixel_exact_vs_ppm_sibling():
    from osmart_etl_spark.ops.imagefmt import decode_bmp, decode_pnm, decode_ras

    ppm = decode_pnm(_PPM)
    assert ppm.shape == (16, 16, 3)
    bmp_bytes = _read_fixture("python.bmp")
    ras_bytes = _read_fixture("python.ras")
    if bmp_bytes is None or ras_bytes is None:
        pytest.skip("CPython imghdrdata fixtures not present")
    bmp = decode_bmp(bmp_bytes)
    assert bmp.shape == (16, 16, 4)  # 32-bit BI_BITFIELDS, V4 header
    assert np.array_equal(bmp[..., :3], ppm)
    ras = decode_ras(ras_bytes)
    assert np.array_equal(ras, ppm)


def test_pgm_pbm_third_party_parse():
    from osmart_etl_spark.ops.imagefmt import decode_pnm

    pgm, pbm = _read_fixture("python.pgm"), _read_fixture("python.pbm")
    if pgm is None or pbm is None:
        pytest.skip("CPython imghdrdata fixtures not present")
    g = decode_pnm(pgm)
    b = decode_pnm(pbm)
    assert g.shape == (16, 16, 1) and b.shape == (16, 16, 1)
    assert set(np.unique(b)) <= {0, 255}  # P4 is 1-bit
    assert len(np.unique(g)) > 2  # P5 is true grayscale


def test_pnm_roundtrip_binary_and_ascii():
    from osmart_etl_spark.ops.imagefmt import decode_pnm, encode_pnm

    rng = np.random.default_rng(2)
    rgb = rng.integers(0, 256, (13, 9, 3), dtype=np.uint8)
    grey = rng.integers(0, 256, (7, 5), dtype=np.uint8)
    assert np.array_equal(decode_pnm(encode_pnm(rgb)), rgb)
    assert np.array_equal(decode_pnm(encode_pnm(rgb, ascii_form=True)), rgb)
    assert np.array_equal(decode_pnm(encode_pnm(grey))[:, :, 0], grey)
    assert np.array_equal(decode_pnm(encode_pnm(grey, ascii_form=True))[:, :, 0], grey)


def test_p1_ascii_pbm_without_separating_whitespace():
    """P1 rasters may pack digits with no whitespace ('0110' = 4 pixels) —
    spec-legal per netpbm; round-8 ADVICE fix."""
    from osmart_etl_spark.ops.imagefmt import decode_pnm

    img = decode_pnm(b"P1\n4 2\n0110\n1001\n")
    assert img.shape == (2, 4, 1)
    # 1 = black (0), 0 = white (255)
    assert [int(x) for x in img[0, :, 0]] == [255, 0, 0, 255]
    assert [int(x) for x in img[1, :, 0]] == [0, 255, 255, 0]
    # mixed: separated and packed forms decode identically
    assert np.array_equal(decode_pnm(b"P1 4 2 0 1 1 0 1 0 0 1"), img)


def test_pnm_comments_and_maxval_rescale():
    from osmart_etl_spark.ops.imagefmt import decode_pnm

    # comments between header tokens; maxval 15 -> exact rescale
    payload = b"P2 # comment\n4 1 # another\n15\n0 5 10 15\n"
    img = decode_pnm(payload)
    # round(v*255/15) computed independently
    assert [int(x) for x in img[0, :, 0]] == [round(v * 255 / 15) for v in (0, 5, 10, 15)]


def test_bmp_roundtrip_and_padding():
    from osmart_etl_spark.ops.imagefmt import decode_bmp, encode_bmp

    rng = np.random.default_rng(3)
    for shape in ((5, 3, 3), (16, 16, 3), (7, 2, 3)):  # widths force row padding
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp(img)), img)


def test_error_contract():
    from osmart_etl_spark.ops.imagefmt import decode_bmp, decode_pnm, decode_ras

    with pytest.raises(ValueError):
        decode_pnm(b"P6\n30000 30000\n255\n")  # header bomb
    with pytest.raises(ValueError):
        decode_pnm(b"P5\n4 4\n255\nxx")  # truncated
    with pytest.raises(ValueError):
        decode_bmp(b"BMxxxx")
    with pytest.raises(ValueError):
        decode_ras(b"\x00" * 40)
    # RLE rejected honestly, not mis-decoded
    rle = b"\x59\xa6\x6a\x95" + (4).to_bytes(4, "big") * 2 + (8).to_bytes(4, "big") \
        + b"\x00" * 4 + (2).to_bytes(4, "big") + b"\x00" * 8
    with pytest.raises(ValueError):
        decode_ras(rle)


@pytest.mark.slow
def test_extract_features_pnm_bmp_ok(spark):
    from osmart_etl_spark.ops.imagefmt import encode_bmp, encode_pnm
    from osmart_etl_spark.ops.multimodal import MEDIA_SCHEMA, extract_features

    rng = np.random.default_rng(4)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    rows = [
        (0, "image", encode_pnm(img), 0, None, None, None),
        (1, "image", encode_bmp(img), 0, None, None, None),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in extract_features(df).collect()}
    assert got[0]["decode_status"] == "ok" and got[1]["decode_status"] == "ok"
    # same pixels through two containers -> identical features
    assert got[0]["feature"] == got[1]["feature"]


def test_tiff_third_party_pixel_exact_vs_ppm():
    from osmart_etl_spark.ops.imagefmt import decode_pnm, decode_tiff

    tif = _read_fixture("python.tiff")
    if tif is None:
        pytest.skip("CPython imghdrdata fixtures not present")
    t = decode_tiff(tif)
    assert t.shape == (16, 16, 4)  # RGBA, uncompressed, little-endian
    assert np.array_equal(t[..., :3], decode_pnm(_PPM))


def test_tiff_packbits_and_byteorder():
    """Hand-built TIFFs: PackBits-compressed grayscale in big-endian
    (MM) form must decode to the same pixels as its raw II twin."""
    import struct

    from osmart_etl_spark.ops.imagefmt import decode_tiff

    rng = np.random.default_rng(8)
    # runs + literals to exercise both PackBits branches
    row = bytes([7] * 10 + list(rng.integers(0, 256, 6))) 
    img = np.frombuffer(row * 4, np.uint8).reshape(4, 16)

    def pb_encode(data: bytes) -> bytes:
        # naive: encode each run >=3 as a run, else literals
        out = bytearray()
        i = 0
        while i < len(data):
            j = i
            while j + 1 < len(data) and data[j + 1] == data[i] and j - i < 127:
                j += 1
            if j - i >= 2:
                out += bytes([257 - (j - i + 1), data[i]])
                i = j + 1
            else:
                k = i
                lit = bytearray()
                while k < len(data) and len(lit) < 128:
                    if k + 2 < len(data) and data[k] == data[k + 1] == data[k + 2]:
                        break
                    lit.append(data[k])
                    k += 1
                out += bytes([len(lit) - 1]) + lit
                i = k
        return bytes(out)

    def build(bo: str, comp: int, pixel_bytes: bytes) -> bytes:
        entries = [
            (256, 3, 1, 16), (257, 3, 1, 4), (258, 3, 1, 8), (259, 3, 1, comp),
            (262, 3, 1, 1), (273, 4, 1, 0), (277, 3, 1, 1), (278, 3, 1, 4),
            (279, 4, 1, len(pixel_bytes)),
        ]
        ifd_off = 8
        data_off = ifd_off + 2 + 12 * len(entries) + 4
        out = bytearray()
        out += (b"II*\x00" if bo == "<" else b"MM\x00*")
        out += struct.pack(bo + "I", ifd_off)
        out += struct.pack(bo + "H", len(entries))
        for tag, typ, cnt, val in entries:
            if tag == 273:
                val = data_off
            out += struct.pack(bo + "HHI", tag, typ, cnt)
            out += struct.pack(bo + "I", val << 16 if (typ == 3 and bo == ">") else val)
        out += struct.pack(bo + "I", 0)  # next IFD
        out += pixel_bytes
        return bytes(out)

    raw = img.tobytes()
    a = decode_tiff(build("<", 1, raw))
    b = decode_tiff(build(">", 32773, pb_encode(raw)))
    assert np.array_equal(a[:, :, 0], img)
    assert np.array_equal(a, b)


def test_tiff_rejects_unsupported():
    from osmart_etl_spark.ops.imagefmt import decode_tiff

    with pytest.raises(ValueError):
        decode_tiff(b"II*\x00" + b"\x00" * 20)
    tif = _read_fixture("python.tiff")
    if tif is not None:
        # flip the compression tag to LZW (5): honest rejection
        mutated = bytearray(tif)
        # compression entry value offset: find tag 259 in IFD
        import struct
        ifd = struct.unpack_from("<I", mutated, 4)[0]
        n = struct.unpack_from("<H", mutated, ifd)[0]
        for i in range(n):
            e = ifd + 2 + 12 * i
            if struct.unpack_from("<H", mutated, e)[0] == 259:
                struct.pack_into("<I", mutated, e + 8, 5)
        with pytest.raises(ValueError):
            decode_tiff(bytes(mutated))


def test_sgi_rle_third_party_pixel_exact_vs_ppm():
    from osmart_etl_spark.ops.imagefmt import decode_pnm, decode_sgi

    sgi = _read_fixture("python.sgi")
    if sgi is None:
        pytest.skip("CPython imghdrdata fixtures not present")
    img = decode_sgi(sgi)
    assert img.shape == (16, 16, 4)  # RLE-stored RGBA
    assert np.array_equal(img[..., :3], decode_pnm(_PPM))


def test_xbm_third_party_bit_exact_vs_pbm():
    from osmart_etl_spark.ops.imagefmt import decode_pnm, decode_xbm

    xbm, pbm = _read_fixture("python.xbm"), _read_fixture("python.pbm")
    if xbm is None or pbm is None:
        pytest.skip("CPython imghdrdata fixtures not present")
    assert np.array_equal(decode_xbm(xbm), decode_pnm(pbm))


def test_jpeg_third_party_fixture_close_to_ppm():
    """The lossy cross-check: CPython's libjpeg-encoded python.jpg must
    decode through the in-tree T.81 codec to within normal quantization
    error of the PPM ground truth (this is a LOSSY format — the bound
    is a sanity band, the bit-exact JPEG evidence lives in
    tests/test_jpeg via pinned fixtures)."""
    from osmart_etl_spark.ops.imagefmt import decode_pnm
    from osmart_etl_spark.ops.jpeg import decode_jpeg

    jpg = _read_fixture("python.jpg")
    raw_jpg = _read_fixture("python-raw.jpg")
    if jpg is None or raw_jpg is None:
        pytest.skip("CPython imghdrdata fixtures not present")
    ppm = decode_pnm(_PPM).astype(int)
    for payload in (jpg, raw_jpg):
        img = decode_jpeg(payload).astype(int)
        assert img.shape == (16, 16, 3)
        assert np.abs(img - ppm).mean() < 12.0


def test_sgi_xbm_error_contract():
    from osmart_etl_spark.ops.imagefmt import decode_sgi, decode_xbm

    with pytest.raises(ValueError):
        decode_sgi(b"\x01\xda" + b"\x00" * 30)  # truncated header
    with pytest.raises(ValueError):
        decode_xbm(b"#define w 4\nnot a bitmap")
    with pytest.raises(ValueError):
        decode_xbm(b"#define x_width 30000\n#define x_height 30000\nstatic char x_bits[] = {0x00};")


def test_exr_third_party_pixel_exact_vs_ppm():
    """CPython's python.exr stores code values as linear half-floats:
    round(255*half) must be PIXEL-EXACT vs the PPM sibling (channels
    are stored alphabetically A,B,G,R)."""
    from osmart_etl_spark.ops.imagefmt import decode_exr, decode_pnm

    exr_bytes = _read_fixture("python.exr")
    if exr_bytes is None:
        pytest.skip("CPython imghdrdata fixtures not present")
    exr = decode_exr(exr_bytes)
    assert exr.shape == (16, 16, 4) and exr.dtype == np.float32
    rgb = np.round(255.0 * np.stack([exr[..., 3], exr[..., 2], exr[..., 1]], axis=-1))
    assert np.array_equal(rgb.astype(np.uint8), decode_pnm(_PPM))


def test_exr_roundtrip_none_and_zips():
    from osmart_etl_spark.ops.imagefmt import decode_exr, encode_exr

    rng = np.random.default_rng(5)
    img = rng.random((9, 7, 3), dtype=np.float32).astype(np.float16).astype(np.float32)
    for zips in (False, True):
        out = decode_exr(encode_exr(img, ["B", "G", "R"], zips=zips))
        assert np.array_equal(out, img)


def test_exr_error_contract():
    from osmart_etl_spark.ops.imagefmt import decode_exr

    with pytest.raises(ValueError):
        decode_exr(b"\x76\x2f\x31\x01" + b"\x00" * 8)  # empty header
    exr_bytes = _read_fixture("python.exr")
    if exr_bytes is not None:
        # flip compression to PIZ (4): honest rejection
        mutated = bytearray(exr_bytes)
        i = mutated.index(b"compression\x00compression\x00")
        mutated[i + len(b"compression\x00compression\x00") + 4] = 4
        with pytest.raises(ValueError):
            decode_exr(bytes(mutated))
