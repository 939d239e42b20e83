"""ISO BMFF (MP4) parse tier + H.264 Annex-B NAL walker — pure Python,
public specs only (ISO/IEC 14496-12 box structure, ISO/IEC 14496-15
avcC layout, ITU-T H.264 Annex B start codes / NAL header).

This is the PARSE-ONLY tier the multimodal video path was missing
(VERDICT r10 #5): full H.264 sample decode stays an honest stub (it
dwarfs VP8 and the container ships no ffmpeg), but box/NAL structure,
stream metadata, and keyframe offsets parse FOR REAL, so triage and
near-dup scheduling can run on real MP4 containers:

- ``parse_boxes`` / ``probe_mp4``: walk the box tree; per video/audio
  track emit codec fourcc, timescale, duration, width/height, sample
  count, H.264 profile/level (from avcC), sync-sample numbers (stss)
  and their absolute BYTE offsets in the file (stsc/stco/stsz walk) —
  exactly what a frame-sampling near-dup pass needs to fetch keyframes
  without decoding anything.
- ``walk_annexb_nals``: raw H.264 elementary streams (start-code
  delimited): (offset, nal_type) per NAL, IDR positions = keyframes.
- ``encode_mp4``: minimal fixture writer (one video track) so the
  parser is oracle-checked against planted values in tests — the same
  encode-then-decode discipline as ops/video.encode_avi_mjpeg.

Ref parity note: the reference has no media tier at all; this module
belongs to the LLM-data-pipeline extension surface (multimodal
columns), same contract as ops/mp3.probe_mp3 — structural metadata
without sample decode.
"""

from __future__ import annotations

import struct


# ---------------------------------------------------------------------------
# box walking
# ---------------------------------------------------------------------------

_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl", b"edts", b"mvex"}


def parse_boxes(buf: bytes, pos: int = 0, end: int | None = None):
    """Yield (box_type, payload_start, payload_end) for each box in
    ``buf[pos:end]``. size==0 (to end-of-file) and size==1 (64-bit
    largesize) are handled per ISO/IEC 14496-12 §4.2. Malformed sizes
    raise ValueError — callers surface that as probe_status data."""
    if end is None:
        end = len(buf)
    while pos < end:
        if pos + 8 > end:
            raise ValueError("truncated box header")
        size = struct.unpack(">I", buf[pos : pos + 4])[0]
        btype = buf[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                raise ValueError("truncated largesize")
            size = struct.unpack(">Q", buf[pos + 8 : pos + 16])[0]
            hdr = 16
        elif size == 0:
            size = end - pos
        if size < hdr or pos + size > end:
            raise ValueError(f"bad box size {size} for {btype!r} at {pos}")
        yield btype, pos + hdr, pos + size
        pos += size


def _find(buf: bytes, path: list[bytes], pos: int, end: int):
    """All (payload_start, payload_end) spans of boxes matching a
    type path (depth-first through container boxes)."""
    head, rest = path[0], path[1:]
    out = []
    for btype, s, e in parse_boxes(buf, pos, end):
        if btype != head:
            continue
        if not rest:
            out.append((s, e))
        else:
            out.extend(_find(buf, rest, s, e))
    return out


def _fullbox(buf: bytes, s: int) -> tuple[int, int]:
    """(version, payload_start_after_version_flags)."""
    return buf[s], s + 4


# ---------------------------------------------------------------------------
# track tables
# ---------------------------------------------------------------------------


def _parse_mdhd(buf: bytes, s: int) -> tuple[int, int]:
    """(timescale, duration) from mdhd (version 0 or 1)."""
    v, p = _fullbox(buf, s)
    if v == 1:
        timescale = struct.unpack(">I", buf[p + 16 : p + 20])[0]
        duration = struct.unpack(">Q", buf[p + 20 : p + 28])[0]
    else:
        timescale = struct.unpack(">I", buf[p + 8 : p + 12])[0]
        duration = struct.unpack(">I", buf[p + 12 : p + 16])[0]
    return timescale, duration


def _parse_stsd(buf: bytes, s: int, e: int) -> dict:
    """First sample-entry's codec fourcc (+ width/height and avcC
    profile/level for visual entries)."""
    _v, p = _fullbox(buf, s)
    n = struct.unpack(">I", buf[p : p + 4])[0]
    out: dict = {"codec": None, "width": None, "height": None,
                 "profile_idc": None, "level_idc": None}
    if n < 1:
        return out
    entry = p + 4
    esize = struct.unpack(">I", buf[entry : entry + 4])[0]
    fourcc = buf[entry + 4 : entry + 8]
    out["codec"] = fourcc.decode("latin-1")
    if fourcc in (b"avc1", b"avc3", b"hvc1", b"hev1", b"vp09", b"av01", b"mp4v"):
        # VisualSampleEntry: width/height at fixed offsets 32/34 from
        # the entry start (8 hdr + 6 reserved + 2 dri + 16 pre/reserved)
        out["width"] = struct.unpack(">H", buf[entry + 32 : entry + 34])[0]
        out["height"] = struct.unpack(">H", buf[entry + 34 : entry + 36])[0]
        # child boxes after the 86-byte fixed VisualSampleEntry part
        child = entry + 86
        try:
            for btype, cs, ce in parse_boxes(buf, child, entry + esize):
                if btype == b"avcC" and ce - cs >= 4:
                    # ISO/IEC 14496-15: ver, profile, compat, level
                    out["profile_idc"] = buf[cs + 1]
                    out["level_idc"] = buf[cs + 2 + 1]
        except ValueError:
            pass  # no/odd children — metadata stays None
    return out


def _parse_u32_table(buf: bytes, s: int) -> list[int]:
    """FullBox with [count, count × u32] layout (stss, stco)."""
    _v, p = _fullbox(buf, s)
    n = struct.unpack(">I", buf[p : p + 4])[0]
    return list(struct.unpack(f">{n}I", buf[p + 4 : p + 4 + 4 * n]))


def _parse_stsz(buf: bytes, s: int) -> list[int]:
    _v, p = _fullbox(buf, s)
    uniform, count = struct.unpack(">II", buf[p : p + 8])
    if uniform:
        return [uniform] * count
    return list(struct.unpack(f">{count}I", buf[p + 8 : p + 8 + 4 * count]))


def _parse_stsc(buf: bytes, s: int) -> list[tuple[int, int]]:
    """[(first_chunk, samples_per_chunk)] runs (sample-desc idx dropped)."""
    _v, p = _fullbox(buf, s)
    n = struct.unpack(">I", buf[p : p + 4])[0]
    vals = struct.unpack(f">{3 * n}I", buf[p + 4 : p + 4 + 12 * n])
    return [(vals[3 * i], vals[3 * i + 1]) for i in range(n)]


def _sample_offsets(
    stsc: list[tuple[int, int]], stco: list[int], sizes: list[int]
) -> list[int]:
    """Absolute byte offset of every sample: expand the stsc runs over
    the chunk list, then prefix-sum sizes within each chunk."""
    n_chunks = len(stco)
    per_chunk = []
    for i, (first, spc) in enumerate(stsc):
        last = stsc[i + 1][0] - 1 if i + 1 < len(stsc) else n_chunks
        per_chunk.extend([spc] * (last - first + 1))
    offsets, si = [], 0
    for ci, base in enumerate(stco):
        off = base
        for _ in range(per_chunk[ci] if ci < len(per_chunk) else 0):
            if si >= len(sizes):
                break
            offsets.append(off)
            off += sizes[si]
            si += 1
    return offsets


def probe_mp4(payload: bytes) -> dict:
    """Structural probe of an ISO BMFF container. Returns::

        {"brand": str, "tracks": [
            {"handler": "vide"|"soun"|..., "codec": str,
             "timescale": int, "duration_s": float,
             "width": int|None, "height": int|None,
             "profile_idc": int|None, "level_idc": int|None,
             "n_samples": int, "keyframe_samples": [1-based ...],
             "keyframe_offsets": [absolute byte ...]}, ...]}

    No sample data is decoded. Raises ValueError on a non-BMFF or
    structurally broken payload (callers turn that into probe_status)."""
    top = list(parse_boxes(payload))
    types = [t for t, _s, _e in top]
    if b"ftyp" not in types or b"moov" not in types:
        raise ValueError("not an ISO BMFF container (missing ftyp/moov)")
    fs, fe = next((s, e) for t, s, e in top if t == b"ftyp")
    brand = payload[fs : fs + 4].decode("latin-1")
    ms, me = next((s, e) for t, s, e in top if t == b"moov")

    tracks = []
    for ts_, te_ in _find(payload, [b"trak"], ms, me):
        t: dict = {"handler": None}
        for hs, he in _find(payload, [b"mdia", b"hdlr"], ts_, te_):
            t["handler"] = payload[hs + 8 : hs + 12].decode("latin-1")
        for hs, _he in _find(payload, [b"mdia", b"mdhd"], ts_, te_):
            timescale, duration = _parse_mdhd(payload, hs)
            t["timescale"] = timescale
            t["duration_s"] = duration / timescale if timescale else None
        stbl = _find(payload, [b"mdia", b"minf", b"stbl"], ts_, te_)
        if not stbl:
            tracks.append(t)
            continue
        ss, se = stbl[0]
        sizes: list[int] = []
        stsc: list[tuple[int, int]] = []
        stco: list[int] = []
        keyframes: list[int] | None = None
        for btype, bs, be in parse_boxes(payload, ss, se):
            if btype == b"stsd":
                t.update(_parse_stsd(payload, bs, be))
            elif btype == b"stsz":
                sizes = _parse_stsz(payload, bs)
            elif btype == b"stsc":
                stsc = _parse_stsc(payload, bs)
            elif btype == b"stco":
                stco = _parse_u32_table(payload, bs)
            elif btype == b"co64":
                _v, p = _fullbox(payload, bs)
                n = struct.unpack(">I", payload[p : p + 4])[0]
                stco = list(struct.unpack(f">{n}Q", payload[p + 4 : p + 4 + 8 * n]))
            elif btype == b"stss":
                keyframes = _parse_u32_table(payload, bs)
        t["n_samples"] = len(sizes)
        if keyframes is None:
            # no stss box => every sample is a sync sample (§8.6.2)
            keyframes = list(range(1, len(sizes) + 1))
        t["keyframe_samples"] = keyframes
        offsets = _sample_offsets(stsc, stco, sizes) if stsc and stco else []
        t["keyframe_offsets"] = [
            offsets[k - 1] for k in keyframes if k - 1 < len(offsets)
        ]
        tracks.append(t)
    return {"brand": brand, "tracks": tracks}


# ---------------------------------------------------------------------------
# H.264 Annex-B elementary streams
# ---------------------------------------------------------------------------

NAL_IDR = 5
NAL_SPS = 7
NAL_PPS = 8


def walk_annexb_nals(payload: bytes) -> list[tuple[int, int]]:
    """(byte_offset_of_start_code, nal_unit_type) for every NAL in an
    Annex-B stream (00 00 01 / 00 00 00 01 start codes; nal_unit_type =
    low 5 bits of the first NAL byte). Keyframes are the IDR NALs
    (type 5). Raises ValueError when no start code exists at all."""
    out = []
    i, n = 0, len(payload)
    while i + 3 <= n:
        if payload[i : i + 3] == b"\x00\x00\x01":
            start, hdr = i, i + 3
        elif i + 4 <= n and payload[i : i + 4] == b"\x00\x00\x00\x01":
            start, hdr = i, i + 4
        else:
            i += 1
            continue
        if hdr < n:
            out.append((start, payload[hdr] & 0x1F))
        i = hdr + 1
    if not out:
        raise ValueError("no Annex-B start code found")
    return out


def annexb_keyframe_offsets(payload: bytes) -> list[int]:
    """Byte offsets of IDR NALs — the raw-stream analogue of
    ``probe_mp4``'s keyframe_offsets."""
    return [off for off, typ in walk_annexb_nals(payload) if typ == NAL_IDR]


def keyframe_payloads(payload: bytes, max_frames: int | None = None) -> list[bytes]:
    """The parse tier's payoff made executable: slice each keyframe
    SAMPLE's raw bytes out of mdat using only the stsc/stco/stsz walk —
    zero decode, zero copy beyond the slices. This is exactly the I/O
    a frame-sampling near-dup pass issues at 100 TB scale: byte-range
    reads at keyframe offsets instead of full-file decode. (Decoding
    those H.264 samples remains out of scope — the slices feed either
    an external decoder or content-hash dedup of coded frames.)"""
    info = probe_mp4(payload)
    vid = next((t for t in info["tracks"] if t.get("handler") == "vide"), None)
    if vid is None:
        raise ValueError("no video track")
    # re-walk the table to get per-sample sizes aligned with offsets
    out: list[bytes] = []
    sizes_by_sample = _keyframe_sizes(payload, vid)
    for off, size in zip(vid["keyframe_offsets"], sizes_by_sample):
        out.append(payload[off : off + size])
        if max_frames is not None and len(out) >= max_frames:
            break
    return out


def _keyframe_sizes(payload: bytes, vid: dict) -> list[int]:
    """stsz sizes of the track's keyframe samples, in keyframe order."""
    top = list(parse_boxes(payload))
    ms, me = next((s, e) for t, s, e in top if t == b"moov")
    for ts_, te_ in _find(payload, [b"trak"], ms, me):
        hdlrs = _find(payload, [b"mdia", b"hdlr"], ts_, te_)
        if not any(payload[hs + 8 : hs + 12] == b"vide" for hs, _ in hdlrs):
            continue
        for ss, se in _find(payload, [b"mdia", b"minf", b"stbl"], ts_, te_):
            for btype, bs, _be in parse_boxes(payload, ss, se):
                if btype == b"stsz":
                    sizes = _parse_stsz(payload, bs)
                    return [
                        sizes[k - 1]
                        for k in vid["keyframe_samples"]
                        if k - 1 < len(sizes)
                    ]
    return []


class _BitReader:
    """MSB-first bit reader with ue(v)/se(v) Exp-Golomb (H.264 §9.1)."""

    def __init__(self, buf: bytes):
        self.buf, self.pos = buf, 0

    def u(self, n: int) -> int:
        v = 0
        for _ in range(n):
            byte, bit = divmod(self.pos, 8)
            if byte >= len(self.buf):
                raise ValueError("SPS bitstream exhausted")
            v = (v << 1) | ((self.buf[byte] >> (7 - bit)) & 1)
            self.pos += 1
        return v

    def ue(self) -> int:
        zeros = 0
        while self.u(1) == 0:
            zeros += 1
            if zeros > 31:
                raise ValueError("bad Exp-Golomb code")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k % 2 else -(k // 2)


def _strip_emulation(rbsp: bytes) -> bytes:
    """Remove H.264 emulation-prevention bytes (00 00 03 -> 00 00)."""
    out = bytearray()
    zeros = 0
    for b in rbsp:
        if zeros >= 2 and b == 3:
            zeros = 0
            continue
        out.append(b)
        zeros = zeros + 1 if b == 0 else 0
    return bytes(out)


_HIGH_PROFILES = {100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139, 134, 135}


def parse_sps(nal: bytes) -> dict:
    """Decode an H.264 sequence parameter set (ITU-T H.264 §7.3.2.1.1):
    profile/level, chroma format, and the REAL coded width/height
    (macroblock grid minus the frame-cropping rectangle, with the
    chroma-dependent crop units — the part naive parsers get wrong).
    ``nal`` is the NAL unit including its 1-byte header."""
    if (nal[0] & 0x1F) != NAL_SPS:
        raise ValueError("not an SPS NAL")
    r = _BitReader(_strip_emulation(nal[1:]))
    profile_idc = r.u(8)
    r.u(8)  # constraint flags + reserved
    level_idc = r.u(8)
    r.ue()  # seq_parameter_set_id
    chroma_format_idc = 1  # default 4:2:0 for non-high profiles
    separate_colour_plane = 0
    if profile_idc in _HIGH_PROFILES:
        chroma_format_idc = r.ue()
        if chroma_format_idc == 3:
            separate_colour_plane = r.u(1)
        r.ue()  # bit_depth_luma_minus8
        r.ue()  # bit_depth_chroma_minus8
        r.u(1)  # qpprime_y_zero_transform_bypass
        if r.u(1):  # seq_scaling_matrix_present
            for i in range(8 if chroma_format_idc != 3 else 12):
                if r.u(1):  # seq_scaling_list_present[i]
                    size = 16 if i < 6 else 64
                    last, nxt = 8, 8
                    for _ in range(size):
                        if nxt != 0:
                            nxt = (last + r.se() + 256) % 256
                        last = last if nxt == 0 else nxt
    r.ue()  # log2_max_frame_num_minus4
    poc_type = r.ue()
    if poc_type == 0:
        r.ue()
    elif poc_type == 1:
        r.u(1)
        r.se()
        r.se()
        for _ in range(r.ue()):
            r.se()
    r.ue()  # max_num_ref_frames
    r.u(1)  # gaps_in_frame_num_value_allowed
    width_mbs = r.ue() + 1
    height_map_units = r.ue() + 1
    frame_mbs_only = r.u(1)
    if not frame_mbs_only:
        r.u(1)  # mb_adaptive_frame_field
    r.u(1)  # direct_8x8_inference
    crop_l = crop_r = crop_t = crop_b = 0
    if r.u(1):  # frame_cropping_flag
        crop_l, crop_r, crop_t, crop_b = r.ue(), r.ue(), r.ue(), r.ue()
    # §7.4.2.1.1: crop units depend on chroma format and field coding
    if chroma_format_idc == 0 or separate_colour_plane:
        unit_x, unit_y = 1, 2 - frame_mbs_only
    else:
        sub_w = 2 if chroma_format_idc in (1, 2) else 1
        sub_h = 2 if chroma_format_idc == 1 else 1
        unit_x, unit_y = sub_w, sub_h * (2 - frame_mbs_only)
    width = width_mbs * 16 - unit_x * (crop_l + crop_r)
    height = (2 - frame_mbs_only) * height_map_units * 16 - unit_y * (crop_t + crop_b)
    return {
        "profile_idc": profile_idc,
        "level_idc": level_idc,
        "chroma_format_idc": chroma_format_idc,
        "width": width,
        "height": height,
    }


def annexb_sps_info(payload: bytes) -> dict | None:
    """Parse the first SPS of an Annex-B stream; None if absent or
    unparseable (a broken SPS downgrades the metadata, it does not
    invalidate the stream walk itself)."""
    nals = walk_annexb_nals(payload)
    for i, (off, typ) in enumerate(nals):
        if typ != NAL_SPS:
            continue
        hdr = off + (4 if payload[off : off + 4] == b"\x00\x00\x00\x01" else 3)
        end = nals[i + 1][0] if i + 1 < len(nals) else len(payload)
        try:
            return parse_sps(payload[hdr:end])
        except ValueError:
            return None
    return None


class _BitWriter:
    """MSB-first bit writer with ue(v) — fixture SPS construction."""

    def __init__(self):
        self.bits: list[int] = []

    def u(self, n: int, v: int) -> "_BitWriter":
        for i in range(n - 1, -1, -1):
            self.bits.append((v >> i) & 1)
        return self

    def ue(self, v: int) -> "_BitWriter":
        k = v + 1
        n = k.bit_length()
        self.u(n - 1, 0)
        self.u(n, k)
        return self

    def bytes_(self) -> bytes:
        bits = self.bits + [1] + [0] * ((-len(self.bits) - 1) % 8)  # rbsp stop bit
        out = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for bit in bits[i : i + 8]:
                b = (b << 1) | bit
            out.append(b)
        return bytes(out)


def encode_sps(
    width: int, height: int, *, profile_idc: int = 66, level_idc: int = 30,
    crop_right: int = 0, crop_bottom: int = 0,
) -> bytes:
    """Fixture SPS (baseline-profile layout, frame_mbs_only, 4:2:0):
    the NAL bytes ``parse_sps`` must invert. Width/height are the
    DISPLAY size; the macroblock grid rounds up and the remainder goes
    into the cropping rectangle (crop units = 2 for 4:2:0 frames)."""
    width_mbs = (width + 2 * crop_right + 15) // 16
    height_units = (height + 2 * crop_bottom + 15) // 16
    w = _BitWriter()
    w.u(8, profile_idc).u(8, 0).u(8, level_idc)
    w.ue(0)  # sps id
    w.ue(0)  # log2_max_frame_num_minus4
    w.ue(0)  # pic_order_cnt_type -> needs log2_max_pic_order_cnt_lsb
    w.ue(0)
    w.ue(1)  # max_num_ref_frames
    w.u(1, 0)  # gaps_in_frame_num
    w.ue(width_mbs - 1)
    w.ue(height_units - 1)
    w.u(1, 1)  # frame_mbs_only
    w.u(1, 1)  # direct_8x8_inference
    if crop_right or crop_bottom:
        w.u(1, 1)
        w.ue(0).ue(crop_right).ue(0).ue(crop_bottom)
    else:
        w.u(1, 0)
    w.u(1, 0)  # vui_parameters_present
    return bytes([0x67]) + w.bytes_()


# ---------------------------------------------------------------------------
# fixture writer
# ---------------------------------------------------------------------------


def _box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _full(btype: bytes, version: int, payload: bytes) -> bytes:
    return _box(btype, struct.pack(">I", version << 24) + payload)


def encode_mp4(
    sample_sizes: list[int],
    keyframe_samples: list[int],
    *,
    width: int = 64,
    height: int = 48,
    timescale: int = 1000,
    sample_delta: int = 40,
    samples_per_chunk: int = 3,
    profile_idc: int = 66,
    level_idc: int = 30,
) -> bytes:
    """Minimal one-video-track MP4 for parser fixtures: deterministic
    mdat bytes, avc1 sample entry with an avcC carrying the given
    profile/level, real stts/stss/stsz/stsc/stco tables. The layout is
    ftyp + mdat + moov so chunk offsets are computable before moov is
    sized (the standard faststart-less layout)."""
    n = len(sample_sizes)
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomavc1")
    mdat_payload = b"".join(
        bytes(((i * 7 + j) % 256) for j in range(sz))
        for i, sz in enumerate(sample_sizes)
    )
    mdat = _box(b"mdat", mdat_payload)

    # chunking: fixed samples_per_chunk (last chunk takes the remainder)
    chunk_sizes = [
        sample_sizes[i : i + samples_per_chunk]
        for i in range(0, n, samples_per_chunk)
    ]
    data_start = len(ftyp) + 8  # mdat payload begins after its header
    stco_entries, pos = [], data_start
    for cs in chunk_sizes:
        stco_entries.append(pos)
        pos += sum(cs)

    avcc = _box(
        b"avcC",
        bytes([1, profile_idc, 0, level_idc, 0xFF, 0xE0, 0x00, 0x00]),
    )
    visual = (
        b"\x00" * 6
        + struct.pack(">H", 1)  # data_reference_index
        + b"\x00" * 16
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + b"\x00" * 4
        + struct.pack(">H", 1)  # frame_count
        + b"\x00" * 32  # compressorname
        + struct.pack(">Hh", 24, -1)
    )
    avc1 = _box(b"avc1", visual + avcc)
    stsd = _full(b"stsd", 0, struct.pack(">I", 1) + avc1)
    stts = _full(b"stts", 0, struct.pack(">III", 1, n, sample_delta))
    stss = _full(
        b"stss", 0,
        struct.pack(">I", len(keyframe_samples))
        + b"".join(struct.pack(">I", k) for k in keyframe_samples),
    )
    stsz = _full(
        b"stsz", 0,
        struct.pack(">II", 0, n)
        + b"".join(struct.pack(">I", s) for s in sample_sizes),
    )
    stsc = _full(
        b"stsc", 0, struct.pack(">I", 1) + struct.pack(">III", 1, samples_per_chunk, 1)
    )
    stco = _full(
        b"stco", 0,
        struct.pack(">I", len(stco_entries))
        + b"".join(struct.pack(">I", o) for o in stco_entries),
    )
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco + stss)

    duration = n * sample_delta
    mdhd = _full(
        b"mdhd", 0,
        struct.pack(">IIII", 0, 0, timescale, duration) + struct.pack(">HH", 0x55C4, 0),
    )
    hdlr = _full(b"hdlr", 0, struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"\x00")
    vmhd = _full(b"vmhd", 0, struct.pack(">HHHH", 0, 0, 0, 0))
    # minimal url box with the self-contained flag set
    url = struct.pack(">I", 12) + b"url " + struct.pack(">I", 1)
    dref = _full(b"dref", 0, struct.pack(">I", 1) + url)
    dinf = _box(b"dinf", dref)
    minf = _box(b"minf", vmhd + dinf + stbl)
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    tkhd = _full(
        b"tkhd", 0,
        struct.pack(">IIIII", 0, 0, 1, 0, duration)
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),
    )
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _full(
        b"mvhd", 0,
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">I", 0x00010000)
        + struct.pack(">H", 0x0100)
        + b"\x00" * 10
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 2),
    )
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov
