"""REAL AIFF / AIFC / AU (Sun audio) decoders + G.711 u-law/a-law —
pure stdlib+numpy, same honesty tier as the WAV codec in
ops/multimodal.py (which this module extends: the reference repo has
no audio at all — extension surface, SURVEY.md §2.9).

Formats, all from public specs:

- AU (.snd): 24+-byte big-endian header (magic, data offset/size,
  encoding, rate, channels); encodings 1 (G.711 u-law), 2/3/4/5
  (8/16/24/32-bit signed PCM BE), 6/7 (float32/64 BE), 27 (G.711
  a-law).
- AIFF / AIFC: IFF container (FORM + COMM + SSND); COMM carries the
  sample rate as an 80-bit IEEE extended float; AIFC adds a
  compression id — supported: NONE (PCM BE), sowt (PCM LE), ulaw/ULAW
  and alaw/ALAW (G.711).
- G.711: closed-form segment expansion, validated bit-exactly against
  the stdlib ``audioop`` reference in tests/test_audio.py.

Third-party ground truth: CPython's test fixtures (pluck-pcm16.{aiff,
au,wav}, pluck-ulaw.au, pluck-{ulaw,alaw}.aifc — PSF test data, same
audio content across containers) — the AIFF/AU decodes must equal the
WAV sibling decoded by our independent WAV codec sample-for-sample.

All decoders return (samples float64 [n_frames, n_channels] in
[-1, 1), sample_rate) — the ops/multimodal.decode_wav contract, so the
RMS+ZCR featurizer applies unchanged and a mixed-format audio corpus
keeps one feature dimensionality. Corrupt payloads raise ValueError
only (the mapInPandas decode_status contract)."""

from __future__ import annotations

import struct

import numpy as np

AU_MAGIC = b".snd"
_PCM_BE = {2: ("i1", 1), 3: (">i2", 2), 4: (None, 3), 5: (">i4", 4)}


def ulaw_to_linear(u: np.ndarray) -> np.ndarray:
    """G.711 u-law byte -> 16-bit linear (bit-exact vs audioop)."""
    u = (~u.astype(np.int64)) & 0xFF
    sign = (u & 0x80) != 0
    exp = (u >> 4) & 7
    mant = u & 0x0F
    x = (((mant << 3) + 0x84) << exp) - 0x84
    return np.where(sign, -x, x).astype(np.int16)


def alaw_to_linear(a: np.ndarray) -> np.ndarray:
    """G.711 a-law byte -> 16-bit linear (bit-exact vs audioop). Note
    the sign convention is opposite to u-law: bit 0x80 SET (after the
    0x55 toggle) means positive."""
    a = a.astype(np.int64) ^ 0x55
    sign = (a & 0x80) != 0
    exp = (a >> 4) & 7
    mant = a & 0x0F
    x = np.where(exp == 0, (mant << 4) + 8, ((mant << 4) + 0x108) << np.maximum(exp - 1, 0))
    return np.where(sign, x, -x).astype(np.int16)


def linear_to_ulaw(x: np.ndarray) -> np.ndarray:
    """16-bit linear -> u-law byte (for roundtrip fixtures)."""
    x = x.astype(np.int64)
    sign = x < 0
    mag = np.minimum(np.abs(x), 32635) + 0x84
    exp = (np.floor(np.log2(mag)) - 7).astype(np.int64)
    mant = (mag >> (exp + 3)) & 0x0F
    u = (np.where(sign, 0x80, 0) | (exp << 4) | mant) & 0xFF
    return ((~u) & 0xFF).astype(np.uint8)


def _read_extended80(b: bytes) -> float:
    """80-bit IEEE extended float (the AIFF sample-rate field)."""
    if len(b) != 10:
        raise ValueError("AIFF: bad extended float")
    sign_exp, hi, lo = struct.unpack(">HLL", b)
    sign = -1.0 if sign_exp & 0x8000 else 1.0
    exp = sign_exp & 0x7FFF
    mant = (hi << 32) | lo
    if exp == 0 and mant == 0:
        return 0.0
    return sign * mant * 2.0 ** (exp - 16383 - 63)


def _write_extended80(v: float) -> bytes:
    if v == 0:
        return b"\x00" * 10
    sign = 0x8000 if v < 0 else 0
    v = abs(v)
    exp = 16383 + 63
    while v < 2.0**63:
        v *= 2.0
        exp -= 1
    while v >= 2.0**64:
        v /= 2.0
        exp += 1
    mant = int(v)
    return struct.pack(">HLL", sign | exp, (mant >> 32) & 0xFFFFFFFF, mant & 0xFFFFFFFF)


def _pcm_to_float(raw: bytes, bits: int, n_ch: int, big_endian: bool) -> np.ndarray:
    nbytes = bits // 8
    n = len(raw) // (nbytes * n_ch) * nbytes * n_ch
    raw = raw[:n]
    if bits == 8:
        x = np.frombuffer(raw, dtype=np.int8).astype(np.float64) / 128.0
    elif bits == 16:
        x = np.frombuffer(raw, dtype=">i2" if big_endian else "<i2").astype(np.float64) / 32768.0
    elif bits == 24:
        b = np.frombuffer(raw, dtype=np.uint8).reshape(-1, 3)
        if big_endian:
            v = (b[:, 0].astype(np.int64) << 16) | (b[:, 1].astype(np.int64) << 8) | b[:, 2]
        else:
            v = (b[:, 2].astype(np.int64) << 16) | (b[:, 1].astype(np.int64) << 8) | b[:, 0]
        v = np.where(v >= 1 << 23, v - (1 << 24), v)
        x = v.astype(np.float64) / float(1 << 23)
    elif bits == 32:
        x = np.frombuffer(raw, dtype=">i4" if big_endian else "<i4").astype(np.float64) / float(1 << 31)
    else:
        raise ValueError(f"unsupported PCM depth {bits}")
    return x.reshape(-1, n_ch)


def decode_au(payload: bytes) -> tuple[np.ndarray, int]:
    """REAL Sun/NeXT audio decode -> (float64 [n, ch] in [-1,1), rate)."""
    if payload[:4] != AU_MAGIC or len(payload) < 24:
        raise ValueError("not an AU payload")
    offset, size, enc, rate, n_ch = struct.unpack(">LLLLL", payload[4:24])
    if offset < 24 or n_ch < 1 or n_ch > 64 or rate < 1:
        raise ValueError("AU: bad header")
    data = payload[offset:]
    if size != 0xFFFFFFFF:
        data = data[:size]
    if enc == 1:
        lin = ulaw_to_linear(np.frombuffer(data, dtype=np.uint8))
        x = lin.astype(np.float64) / 32768.0
    elif enc == 27:
        lin = alaw_to_linear(np.frombuffer(data, dtype=np.uint8))
        x = lin.astype(np.float64) / 32768.0
    elif enc in (2, 3, 4, 5):
        return (
            _pcm_to_float(data, {2: 8, 3: 16, 4: 24, 5: 32}[enc], n_ch, True),
            rate,
        )
    elif enc == 6:
        x = np.frombuffer(data[: len(data) // 4 * 4], dtype=">f4").astype(np.float64)
    elif enc == 7:
        x = np.frombuffer(data[: len(data) // 8 * 8], dtype=">f8").astype(np.float64)
    else:
        raise ValueError(f"AU: unsupported encoding {enc}")
    n = x.size // n_ch * n_ch
    return x[:n].reshape(-1, n_ch), rate


def decode_aiff(payload: bytes) -> tuple[np.ndarray, int]:
    """REAL AIFF / AIFC decode -> (float64 [n, ch] in [-1,1), rate).
    Walks IFF chunks with word alignment; supports PCM (BE, and the
    AIFC 'sowt' LE form) and G.711 ulaw/alaw compression types."""
    if payload[:4] != b"FORM" or payload[8:12] not in (b"AIFF", b"AIFC"):
        raise ValueError("not an AIFF/AIFC payload")
    is_aifc = payload[8:12] == b"AIFC"
    pos, comm, ssnd = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        ln = int.from_bytes(payload[pos + 4 : pos + 8], "big")
        body = payload[pos + 8 : pos + 8 + ln]
        pos += 8 + ln + (ln & 1)
        if cid == b"COMM":
            comm = body
        elif cid == b"SSND":
            ssnd = body
    if comm is None or ssnd is None:
        raise ValueError("AIFF: missing COMM/SSND")
    if len(comm) < 18:
        raise ValueError("AIFF: short COMM")
    n_ch, _n_frames, bits = struct.unpack(">hLh", comm[:8])
    rate = _read_extended80(comm[8:18])
    if n_ch < 1 or n_ch > 64 or not (1 <= rate < 10**7):
        raise ValueError("AIFF: bad COMM")
    comp = b"NONE"
    if is_aifc:
        if len(comm) < 22:
            raise ValueError("AIFC: missing compression type")
        comp = comm[18:22]
    if len(ssnd) < 8:
        raise ValueError("AIFF: short SSND")
    data_off = int.from_bytes(ssnd[:4], "big")
    data = ssnd[8 + data_off :]
    rate = int(round(rate))
    if comp in (b"NONE",):
        return _pcm_to_float(data, bits, n_ch, True), rate
    if comp in (b"sowt",):
        return _pcm_to_float(data, bits, n_ch, False), rate
    if comp.lower() == b"ulaw":
        lin = ulaw_to_linear(np.frombuffer(data, dtype=np.uint8))
    elif comp.lower() == b"alaw":
        lin = alaw_to_linear(np.frombuffer(data, dtype=np.uint8))
    else:
        raise ValueError(f"AIFC: unsupported compression {comp!r}")
    x = lin.astype(np.float64) / 32768.0
    n = x.size // n_ch * n_ch
    return x[:n].reshape(-1, n_ch), rate


def encode_au(samples: np.ndarray, rate: int, encoding: int = 3) -> bytes:
    """Minimal AU encoder (16-bit PCM BE or u-law) for fixtures."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n_ch = samples.shape[1]
    lin = np.clip(np.round(samples * 32768.0), -32768, 32767).astype(np.int16)
    if encoding == 3:
        data = lin.astype(">i2").tobytes()
    elif encoding == 1:
        data = linear_to_ulaw(lin.reshape(-1)).tobytes()
    else:
        raise ValueError("encoder supports encodings 1 and 3")
    return AU_MAGIC + struct.pack(">LLLLL", 24, len(data), encoding, rate, n_ch) + data


def encode_aiff(samples: np.ndarray, rate: int) -> bytes:
    """Minimal AIFF encoder (16-bit PCM BE) for fixtures."""
    if samples.ndim == 1:
        samples = samples[:, None]
    n, n_ch = samples.shape
    data = np.clip(np.round(samples * 32768.0), -32768, 32767).astype(">i2").tobytes()
    comm = struct.pack(">hLh", n_ch, n, 16) + _write_extended80(float(rate))
    ssnd = struct.pack(">LL", 0, 0) + data
    def chunk(cid, body):
        return cid + len(body).to_bytes(4, "big") + body + (b"\x00" if len(body) & 1 else b"")
    inner = b"AIFF" + chunk(b"COMM", comm) + chunk(b"SSND", ssnd)
    return b"FORM" + len(inner).to_bytes(4, "big") + inner
