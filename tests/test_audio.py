"""REAL AIFF/AIFC/AU + G.711 decoder tests (ops/audio.py): bit-exact
G.711 expansion vs the stdlib audioop reference, encoder/decoder
roundtrips, corrupt-payload contract, and — when CPython's PSF audio
test fixtures are present on this box — third-party differential
checks: the SAME pluck recording decoded from .aiff/.au/.aifc must
equal (or u-law/a-law-approximate) the .wav sibling decoded by our
independent WAV codec."""

from __future__ import annotations

import glob
import os

import numpy as np
import pytest

from osmart_etl_spark.ops.audio import (
    alaw_to_linear,
    decode_aiff,
    decode_au,
    encode_aiff,
    encode_au,
    linear_to_ulaw,
    ulaw_to_linear,
)


def _fixture_dir():
    for pat in (
        "/root/.pyenv/versions/3.1*/lib/python3.1*/test/audiodata",
        "/usr/lib/python3*/test/audiodata",
    ):
        hits = sorted(glob.glob(pat))
        for h in hits:
            if os.path.exists(os.path.join(h, "pluck-pcm16.aiff")):
                return h
    return None


_FIXTURES = _fixture_dir()


def test_g711_tables_bit_exact_vs_audioop():
    audioop = pytest.importorskip("audioop")
    all_bytes = np.arange(256, dtype=np.uint8)
    ref_u = np.frombuffer(audioop.ulaw2lin(all_bytes.tobytes(), 2), dtype="<i2")
    ref_a = np.frombuffer(audioop.alaw2lin(all_bytes.tobytes(), 2), dtype="<i2")
    assert np.array_equal(ulaw_to_linear(all_bytes), ref_u)
    assert np.array_equal(alaw_to_linear(all_bytes), ref_a)
    # and the u-law encoder inverts through audioop's decoder
    lin = np.arange(-32768, 32768, 257, dtype=np.int16)
    enc = linear_to_ulaw(lin)
    ref = np.frombuffer(audioop.lin2ulaw(lin.astype("<i2").tobytes(), 2), dtype=np.uint8)
    assert np.array_equal(enc, ref)


def test_au_and_aiff_roundtrip_own_encoders():
    rng = np.random.default_rng(3)
    samples = (rng.random((500, 2)) * 2 - 1) * 0.9
    for enc_payload, dec in (
        (encode_au(samples, 8000, encoding=3), decode_au),
        (encode_aiff(samples, 44100), decode_aiff),
    ):
        got, rate = dec(enc_payload)
        assert got.shape == (500, 2)
        assert np.abs(got - samples).max() < 1.0 / 32000
    # u-law AU roundtrip: G.711 quantization error bound (~1/16 of
    # full scale at the top segment is wrong — the bound is per-segment
    # relative; absolute error < 1024/32768 at max amplitude)
    au = encode_au(samples, 8000, encoding=1)
    got, rate = decode_au(au)
    assert rate == 8000
    assert np.abs(got - samples).max() < 1024 / 32768.0


def test_corrupt_payloads_valueerror_only():
    for bad in (
        b"",
        b".snd" + b"\x00" * 10,  # short header
        b".snd" + bytes(20),  # offset 0 < 24
        b"FORM1234AIFF",  # no chunks
        b"FORMxxxxWAVE",  # wrong form type
        encode_au(np.zeros(4), 8000)[:20],
    ):
        with pytest.raises(ValueError):
            decode_au(bad) if bad[:4] == b".snd" else decode_aiff(bad)
    # unsupported AU encoding
    au = bytearray(encode_au(np.zeros(4), 8000))
    au[15] = 23  # encoding field -> G.721 ADPCM: genuinely compressed, refused
    with pytest.raises(ValueError):
        decode_au(bytes(au))


@pytest.mark.skipif(_FIXTURES is None, reason="CPython audiodata fixtures absent")
def test_third_party_pluck_aiff_au_equal_wav_sibling():
    """PSF test data: pluck-pcm16.{aiff,au,wav} are three container
    encodings of the same recording (independently transcoded — they
    differ by up to ~11 LSB of dither, measured, so sample-for-sample
    equality is not available even between aiff and au). Decoded
    through three INDEPENDENT parsers they must agree to transcoding
    tolerance with ~perfect correlation — a wrong endianness, channel
    interleave, or SSND offset fails this by orders of magnitude."""
    from osmart_etl_spark.ops.multimodal import decode_wav

    wav, wr = decode_wav(open(os.path.join(_FIXTURES, "pluck-pcm16.wav"), "rb").read())
    aiff, ar = decode_aiff(open(os.path.join(_FIXTURES, "pluck-pcm16.aiff"), "rb").read())
    au, ur = decode_au(open(os.path.join(_FIXTURES, "pluck-pcm16.au"), "rb").read())
    assert wr == ar == ur == 11025
    assert wav.shape == aiff.shape == au.shape
    for other in (aiff, au):
        assert np.abs(wav - other).max() <= 16 / 32768.0
        assert np.corrcoef(wav[:, 0], other[:, 0])[0, 1] > 0.9999


@pytest.mark.skipif(_FIXTURES is None, reason="CPython audiodata fixtures absent")
def test_third_party_pluck_g711_variants_approximate_wav():
    """pluck-ulaw.au and pluck-{ulaw,alaw}.aifc are G.711-companded
    versions of the same recording: after expansion they must sit
    within companding error of the PCM wav, and (for u-law) match the
    stdlib audioop expansion bit-exactly."""
    from osmart_etl_spark.ops.multimodal import decode_wav

    wav, _ = decode_wav(open(os.path.join(_FIXTURES, "pluck-pcm16.wav"), "rb").read())
    for name, dec in (
        ("pluck-ulaw.au", decode_au),
        ("pluck-ulaw.aifc", decode_aiff),
        ("pluck-alaw.aifc", decode_aiff),
    ):
        p = os.path.join(_FIXTURES, name)
        if not os.path.exists(p):
            continue
        got, rate = dec(open(p, "rb").read())
        assert rate == 11025
        n = min(len(got), len(wav))
        err = np.abs(got[:n] - wav[:n]).max()
        assert err < 1024 / 32768.0, (name, err)
        # companded audio still correlates ~1 with the source
        c = np.corrcoef(got[:n, 0], wav[:n, 0])[0, 1]
        assert c > 0.999, (name, c)


@pytest.mark.skipif(_FIXTURES is None, reason="CPython audiodata fixtures absent")
def test_extract_features_real_aiff_au_status_ok(spark):
    """End-to-end mapInPandas: third-party AIFF and AU payloads decode
    with status 'ok' and the same RMS+ZCR feature as their WAV sibling
    (identical PCM -> identical feature), while an mp3-ish unknown
    payload stays honestly 'fake_decoder'."""
    from osmart_etl_spark.ops.multimodal import (
        MEDIA_SCHEMA,
        extract_features,
    )

    wav = open(os.path.join(_FIXTURES, "pluck-pcm16.wav"), "rb").read()
    aiff = open(os.path.join(_FIXTURES, "pluck-pcm16.aiff"), "rb").read()
    au = open(os.path.join(_FIXTURES, "pluck-pcm16.au"), "rb").read()
    fake_mp3 = b"ID3\x03\x00" + bytes(range(64))
    rows = [
        (1, "audio", wav, len(wav), None, None, 1000),
        (2, "audio", aiff, len(aiff), None, None, 1000),
        (3, "audio", au, len(au), None, None, 1000),
        (4, "audio", fake_mp3, len(fake_mp3), None, None, 1000),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r["media_id"]: r for r in extract_features(media).collect()}
    assert got[1]["decode_status"] == got[2]["decode_status"] == "ok"
    assert got[3]["decode_status"] == "ok"
    # same recording, independently transcoded containers (see the
    # differential test above): features agree to dither tolerance
    for mid in (2, 3):
        assert np.allclose(got[1]["feature"], got[mid]["feature"], atol=1e-3)
    assert got[4]["decode_status"] == "fake_decoder"
    assert len(got[4]["feature"]) == len(got[1]["feature"])
