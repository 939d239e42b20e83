"""REAL FLAC decoder tests (ops/flac.py, RFC 9639): own-encoder
roundtrips must be BIT-EXACT (lossless format — any predictor, Rice,
decorrelation or bit-reader defect breaks exactness, not tolerance),
every spec integrity layer must actually fire (CRC-8, CRC-16,
STREAMINFO MD5), corrupt payloads raise ValueError only, and — when
CPython's PSF audio fixtures are present — the third-party
pluck-pcm16.wav samples survive a WAV -> FLAC -> decode trip bit-exactly
vs the independent WAV codec (no libFLAC exists in this container, so
cross-container losslessness is the available third-party ground
truth; the module docstring records this honestly)."""

from __future__ import annotations

import glob
import os

import numpy as np
import pytest

from osmart_etl_spark.ops.flac import (
    _crc8,
    _crc16,
    decode_flac,
    encode_flac,
)


def _fixture_dir():
    for pat in (
        "/root/.pyenv/versions/3.1*/lib/python3.1*/test/audiodata",
        "/usr/lib/python3*/test/audiodata",
    ):
        for h in sorted(glob.glob(pat)):
            if os.path.exists(os.path.join(h, "pluck-pcm16.wav")):
                return h
    return None


_FIXTURES = _fixture_dir()


def _sig(n=4096, stereo=False, seed=7):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / 8000.0
    a = 0.5 * np.sin(2 * np.pi * 440 * t) + 0.05 * rng.standard_normal(n)
    if not stereo:
        return a
    b = 0.5 * np.sin(2 * np.pi * 440 * t) + 0.04 * rng.standard_normal(n)
    return np.stack([a, b], axis=1)


def _ints(samples, bps=16):
    s = samples[:, None] if samples.ndim == 1 else samples
    return np.clip(np.round(s * float(1 << (bps - 1))),
                   -(1 << (bps - 1)), (1 << (bps - 1)) - 1)


def test_crc_tables_known_vectors():
    # CRC-8 poly 0x07 and CRC-16 poly 0x8005 (init 0) spec test vector:
    # "123456789" -> 0xF4 / 0xFEE8 (the classic check values)
    assert _crc8(b"123456789") == 0xF4
    assert _crc16(b"123456789") == 0xFEE8


def test_roundtrip_all_subframe_types_bit_exact():
    sig = _sig()
    ints = _ints(sig)
    for kw in (
        dict(subframe="verbatim"),
        dict(subframe="fixed2"),
        dict(subframe="fixed2", partition_order=3),
        dict(subframe="fixed2", escape=True),
        dict(subframe="fixed2", partition_order=2, escape=True),
        dict(subframe="lpc", lpc=([2 << 9, -(1 << 9)], 9)),
        dict(subframe="lpc", lpc=([1 << 9], 9), partition_order=2),
    ):
        enc = encode_flac(sig, 8000, block_size=1024, **kw)
        dec, rate = decode_flac(enc)
        assert rate == 8000
        assert np.array_equal(np.round(dec * 32768.0), ints), kw


def test_roundtrip_constant_and_multiframe():
    # constant silence compresses to almost nothing and decodes exactly
    const = np.full(3000, 0.25)
    enc = encode_flac(const, 44100, block_size=1024, subframe="constant-or-verbatim")
    assert len(enc) < 200
    dec, rate = decode_flac(enc)
    assert rate == 44100
    assert np.array_equal(np.round(dec * 32768.0), _ints(const))
    # non-multiple-of-block-size tail frame
    sig = _sig(2500)
    dec, _ = decode_flac(encode_flac(sig, 8000, block_size=1024))
    assert np.array_equal(np.round(dec * 32768.0), _ints(sig))


def test_stereo_decorrelation_modes_bit_exact():
    sig2 = _sig(stereo=True)
    ints = _ints(sig2)
    for mode in ("independent", "left-side", "right-side", "mid-side"):
        enc = encode_flac(sig2, 8000, stereo_mode=mode)
        dec, _ = decode_flac(enc)
        assert np.array_equal(np.round(dec * 32768.0), ints), mode


def test_integrity_layers_actually_fire():
    sig = _sig(2048)
    enc = bytearray(encode_flac(sig, 8000, block_size=1024))
    # frame CRC-16: flip a residual bit mid-frame
    bad = bytearray(enc)
    bad[len(bad) // 2] ^= 0x40
    with pytest.raises(ValueError, match="CRC"):
        decode_flac(bytes(bad))
    # header CRC-8: find the second frame sync and corrupt its
    # block-size code nibble (keeps sync intact, breaks the header CRC)
    hdr_off = bytes(enc).find(b"\xFF\xF8", 8 + 4 + 34 + 4)
    bad = bytearray(enc)
    bad[hdr_off + 2] ^= 0x10
    with pytest.raises(ValueError, match="CRC"):
        decode_flac(bytes(bad))
    # STREAMINFO MD5: corrupt the stored digest only — frames all pass
    # CRC, so only the stream-level MD5 check can catch it
    bad = bytearray(enc)
    bad[8 + 4 + 18] ^= 0xFF  # first MD5 byte inside STREAMINFO
    with pytest.raises(ValueError, match="MD5"):
        decode_flac(bytes(bad))
    decode_flac(bytes(bad), verify_md5=False)  # opt-out still decodes


def test_corrupt_payloads_valueerror_only():
    sig = _sig(512)
    enc = encode_flac(sig, 8000)
    for bad in (
        b"",
        b"fLaC",                      # no metadata at all
        b"fLaX" + enc[4:],            # wrong magic
        enc[:30],                     # truncated STREAMINFO
        enc[: len(enc) // 2],         # truncated mid-frame
        enc + b"\x00\x00\x00\x00",    # trailing garbage breaks sync
    ):
        with pytest.raises(ValueError):
            decode_flac(bad)


@pytest.mark.skipif(_FIXTURES is None, reason="CPython audiodata fixtures absent")
def test_third_party_pluck_wav_flac_roundtrip_bit_exact():
    """Lossless cross-container check on third-party samples: the PSF
    pluck recording decoded by the independent WAV codec, encoded to
    FLAC by our encoder and decoded back, must be IDENTICAL float
    samples (both paths divide the same int16 by 32768)."""
    from osmart_etl_spark.ops.multimodal import decode_wav

    wav, rate = decode_wav(open(os.path.join(_FIXTURES, "pluck-pcm16.wav"), "rb").read())
    assert rate == 11025
    enc = encode_flac(wav, rate, subframe="fixed2", block_size=4096)
    dec, drate = decode_flac(enc)
    assert drate == rate
    assert dec.shape == wav.shape
    assert np.array_equal(dec, wav)


@pytest.mark.skipif(_FIXTURES is None, reason="CPython audiodata fixtures absent")
def test_extract_features_real_flac_status_ok(spark):
    """End-to-end mapInPandas: a FLAC payload decodes with status 'ok'
    and EXACTLY the WAV sibling's RMS+ZCR feature (bit-identical PCM
    -> bit-identical feature), while mp3 stays honestly fake."""
    from osmart_etl_spark.ops.multimodal import MEDIA_SCHEMA, extract_features, decode_wav

    wav_bytes = open(os.path.join(_FIXTURES, "pluck-pcm16.wav"), "rb").read()
    wav, rate = decode_wav(wav_bytes)
    flac_bytes = encode_flac(wav, rate, subframe="fixed2", block_size=4096)
    fake_mp3 = b"ID3\x03\x00" + bytes(range(64))
    rows = [
        (1, "audio", wav_bytes, len(wav_bytes), None, None, 1000),
        (2, "audio", flac_bytes, len(flac_bytes), None, None, 1000),
        (3, "audio", fake_mp3, len(fake_mp3), None, None, 1000),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in extract_features(media).collect()}
    assert got[1]["decode_status"] == got[2]["decode_status"] == "ok"
    assert got[1]["feature"] == got[2]["feature"]
    assert got[3]["decode_status"] == "fake_decoder"
    assert len(got[3]["feature"]) == len(got[1]["feature"])
