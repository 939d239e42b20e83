"""Matroska/WebM (EBML) PARSE tier — round 12, VERDICT r11 #5.

Same scope discipline as ``ops/mp4.py``: structural metadata from the
container's own tables — DocType, timestamp scale, duration, per-track
codec/dimensions, cluster offsets, per-block keyframe byte offsets —
with NO sample decode (VP9/AV1/H.264 payload decode needs ffmpeg,
absent from this container; the honest ``decode_status`` stub in
ops/multimodal.py stays). Everything here implements PUBLIC specs:

- RFC 8794 (EBML): variable-size integers for element IDs and sizes,
  the master/leaf element tree, unknown-size elements.
- RFC 9559 (Matroska): the element IDs used below (Segment, Info,
  Tracks, TrackEntry, Video, Cluster, SimpleBlock, …) and SimpleBlock's
  layout (track VINT, s16 relative timestamp, flags byte whose MSB is
  the keyframe bit, lacing in bits 0x06).
- IVF (the de-facto public raw-VPx carrier used by libvpx tooling):
  32-byte "DKIF" header + 12-byte per-frame headers.

Reference parity: the osmart-etl reference has NO media path at all —
this tier (like ops/mp4.py) belongs to the 100 TB training-data
extension surface: triage ("which clips are worth a frame fetch, and
where do their keyframes live?") over opaque binary columns without
shipping bytes to a decoder.

Scale shape: pure per-row byte parsing inside ``mapInPandas`` — no
shuffle, no driver round-trip; malformed payloads raise ValueError /
struct.error / IndexError, all absorbed into ``probe_status`` data by
the caller (ops/multimodal._PARSE_ERRORS).
"""

from __future__ import annotations

import struct

# --- Matroska element IDs (RFC 9559), as they appear on the wire -----------
EBML_HEADER = 0x1A45DFA3
DOCTYPE = 0x4282
SEGMENT = 0x18538067
SEGMENT_INFO = 0x1549A966
TIMESTAMP_SCALE = 0x2AD7B1
DURATION = 0x4489
TRACKS = 0x1654AE6B
TRACK_ENTRY = 0xAE
TRACK_NUMBER = 0xD7
TRACK_TYPE = 0x83
CODEC_ID = 0x86
DEFAULT_DURATION = 0x23E383
VIDEO = 0xE0
PIXEL_WIDTH = 0xB0
PIXEL_HEIGHT = 0xBA
AUDIO = 0xE1
SAMPLING_FREQUENCY = 0xB5
CHANNELS = 0x9F
CLUSTER = 0x1F43B675
CLUSTER_TIMESTAMP = 0xE7
SIMPLE_BLOCK = 0xA3
BLOCK_GROUP = 0xA0
BLOCK = 0xA1
# Cues — the seek index (RFC 9559 §5.1.5): CueClusterPosition is the
# SEGMENT POSITION (offset from the Segment data start) of the Cluster
# ELEMENT holding the cued block; CueRelativePosition the offset of the
# (Simple)Block element from that Cluster's data start (0 = first
# possible child position).
CUES = 0x1C53BB6B
CUE_POINT = 0xBB
CUE_TIME = 0xB3
CUE_TRACK_POSITIONS = 0xB7
CUE_TRACK = 0xF7
CUE_CLUSTER_POSITION = 0xF1
CUE_RELATIVE_POSITION = 0xF0

#: Master elements this prober descends into (everything else is a leaf
#: whose payload is data, not child elements).
_MASTERS = {SEGMENT, SEGMENT_INFO, TRACKS, TRACK_ENTRY, VIDEO, AUDIO,
            CLUSTER, BLOCK_GROUP, EBML_HEADER}

_TRACK_TYPE_NAMES = {1: "video", 2: "audio", 17: "subtitle"}


def read_vint(buf: bytes, pos: int, *, keep_marker: bool) -> tuple[int, int]:
    """One EBML variable-size integer at ``pos`` → (value, next_pos).

    RFC 8794 §4: the number of leading zero bits of the FIRST byte gives
    the width; ``keep_marker=True`` returns the raw bytes as an integer
    (how element IDs are written and compared), ``False`` strips the
    marker bit (how sizes and in-block track numbers are read)."""
    first = buf[pos]
    if first == 0:
        raise ValueError(f"invalid EBML vint (leading byte 0) at {pos}")
    width = 1
    mask = 0x80
    while not first & mask:
        width += 1
        mask >>= 1
    if pos + width > len(buf):
        raise ValueError(f"EBML vint truncated at {pos}")
    val = first if keep_marker else first & (mask - 1)
    for i in range(1, width):
        val = (val << 8) | buf[pos + i]
    return val, pos + width


def _vint_unknown(width: int) -> int:
    """The all-ones (unknown size) payload value for a given width."""
    return (1 << (7 * width)) - 1


#: Valid direct children of an unknown-size Cluster (RFC 9559 §9):
#: an unknown-size element ends at the first element that CANNOT be its
#: child — for streamed Matroska that is the next Cluster (or any other
#: Segment-level element like Cues/Tags).
_CLUSTER_CHILDREN = {
    CLUSTER_TIMESTAMP, SIMPLE_BLOCK, BLOCK_GROUP,
    0xA7,    # Position
    0xAB,    # PrevSize
    0x5854,  # SilentTracks
}


def _unknown_cluster_end(buf: bytes, p: int, scope_end: int) -> int:
    """End of an unknown-size Cluster whose children start at ``p``:
    walk sibling headers until one is not a valid Cluster child (RFC
    8794 §6.2 — 'ends at the first element not a descendant'). Children
    of a streamed Cluster always carry sizes (blocks are leaf data), so
    a nested unknown size here is malformed."""
    q = p
    while q < scope_end:
        eid, r = read_vint(buf, q, keep_marker=True)
        if eid not in _CLUSTER_CHILDREN:
            return q
        size, r2 = read_vint(buf, r, keep_marker=False)
        if size == _vint_unknown(r2 - r):
            raise ValueError(f"unknown-size element 0x{eid:X} inside a Cluster at {q}")
        q = r2 + size
    return scope_end


def parse_elements(buf: bytes, start: int, end: int):
    """Yield ``(element_id, data_start, data_end)`` for the sibling
    elements in ``buf[start:end]``.

    Unknown-size elements (RFC 8794 §6.2 — live/streamed Matroska
    writes Segment and Cluster sizes as all-ones): an unknown-size
    SEGMENT extends to its parent scope's end (the file), and an
    unknown-size CLUSTER ends at the first element that is not a valid
    Cluster child — typically the NEXT Cluster, so multi-cluster
    streamed files keep every cluster visible (round-12 review fix:
    the old 'swallow the rest of scope' rule dropped every block after
    the first cluster). Any other unknown-size element is refused
    loudly rather than parsed wrongly."""
    pos = start
    while pos < end:
        eid, p = read_vint(buf, pos, keep_marker=True)
        size, p2 = read_vint(buf, p, keep_marker=False)
        width = p2 - p
        if size == _vint_unknown(width):
            if eid == SEGMENT:
                yield eid, p2, end
                return  # a streamed Segment swallows the rest of the file
            if eid == CLUSTER:
                cend = _unknown_cluster_end(buf, p2, end)
                yield eid, p2, cend
                pos = cend
                continue
            raise ValueError(
                f"unknown-size EBML element 0x{eid:X} at {pos} "
                "(only Segment/Cluster stream unsized)"
            )
        if p2 + size > end:
            raise ValueError(
                f"EBML element 0x{eid:X} at {pos} overruns its scope "
                f"({p2 + size} > {end})"
            )
        yield eid, p2, p2 + size
        pos = p2 + size


def _uint(buf: bytes, s: int, e: int) -> int:
    return int.from_bytes(buf[s:e], "big")


def _float(buf: bytes, s: int, e: int) -> float:
    n = e - s
    if n == 4:
        return struct.unpack(">f", buf[s:e])[0]
    if n == 8:
        return struct.unpack(">d", buf[s:e])[0]
    raise ValueError(f"EBML float of width {n} (must be 4 or 8)")


def _parse_track_entry(buf: bytes, s: int, e: int) -> dict:
    t: dict = {"track_number": None, "track_type": None, "codec_id": None,
               "width": None, "height": None, "default_duration_ns": None,
               "sample_rate": None, "channels": None}
    for eid, ds, de in parse_elements(buf, s, e):
        if eid == TRACK_NUMBER:
            t["track_number"] = _uint(buf, ds, de)
        elif eid == TRACK_TYPE:
            t["track_type"] = _TRACK_TYPE_NAMES.get(
                _uint(buf, ds, de), str(_uint(buf, ds, de))
            )
        elif eid == CODEC_ID:
            t["codec_id"] = buf[ds:de].decode("latin-1")
        elif eid == DEFAULT_DURATION:
            t["default_duration_ns"] = _uint(buf, ds, de)
        elif eid == VIDEO:
            for vid, vs, ve in parse_elements(buf, ds, de):
                if vid == PIXEL_WIDTH:
                    t["width"] = _uint(buf, vs, ve)
                elif vid == PIXEL_HEIGHT:
                    t["height"] = _uint(buf, vs, ve)
        elif eid == AUDIO:
            for aid, as_, ae in parse_elements(buf, ds, de):
                if aid == SAMPLING_FREQUENCY:
                    t["sample_rate"] = _float(buf, as_, ae)
                elif aid == CHANNELS:
                    t["channels"] = _uint(buf, as_, ae)
    return t


def _parse_block_header(buf: bytes, s: int, e: int) -> tuple[int, int, int, int]:
    """(track_number, rel_timestamp, flags, first_frame_start) of a
    (Simple)Block payload at [s, e) — RFC 9559 §10: track vint, s16
    relative timestamp, flags byte, then (when flags bits 0x06 are set)
    the lacing header: a frame-count byte plus a size table whose form
    depends on the lacing type. The returned offset points at the FIRST
    frame's actual bytes — past the lacing table — so 'fetch bytes at
    keyframe offset' consumers get codec data, not lace metadata
    (round-12 review fix)."""
    track, p = read_vint(buf, s, keep_marker=False)
    if p + 3 > e:
        raise ValueError(f"(Simple)Block truncated at {s}")
    rel_ts = struct.unpack(">h", buf[p : p + 2])[0]
    flags = buf[p + 2]
    q = p + 3
    lacing = flags & 0x06
    if lacing:
        if q >= e:
            raise ValueError(f"laced (Simple)Block truncated at {s}")
        n_frames = buf[q] + 1
        q += 1
        if lacing == 0x02:  # Xiph: n-1 sizes as 255-run bytes
            for _ in range(n_frames - 1):
                while True:
                    if q >= e:
                        raise ValueError(f"Xiph lace table truncated at {s}")
                    b = buf[q]
                    q += 1
                    if b != 255:
                        break
        elif lacing == 0x06:  # EBML: first size vint + n-2 delta vints
            _first, q = read_vint(buf, q, keep_marker=False)
            for _ in range(n_frames - 2):
                _delta, q = read_vint(buf, q, keep_marker=False)
        # 0x04 fixed-size lacing: count byte only, no size table
        if q > e:
            raise ValueError(f"lace table overruns (Simple)Block at {s}")
    return track, rel_ts, flags, q


def probe_mkv(buf: bytes) -> dict:
    """Structural probe of a Matroska/WebM payload.

    Returns ``{doctype, timestamp_scale_ns, duration_s, tracks: [...],
    cluster_offsets: [...], n_blocks, keyframe_offsets: [...],
    keyframe_blocks: [...]}`` where keyframe offsets are the byte
    positions of each keyframe's frame DATA inside ``buf`` (for the
    video track: SimpleBlocks with the keyframe flag 0x80, plus
    BlockGroup Blocks with no ReferenceBlock sibling, per RFC 9559) and
    ``keyframe_blocks`` the 1-based block indexes. Laced blocks report
    the first laced frame's offset (lacing type in flags bits 0x06)."""
    if buf[:4] != b"\x1aE\xdf\xa3":
        raise ValueError("not an EBML stream (no 0x1A45DFA3 header)")
    doctype = None
    scale_ns = 1_000_000  # RFC 9559 default TimestampScale
    duration_ticks: float | None = None
    tracks: list[dict] = []
    cluster_offsets: list[int] = []
    n_blocks = 0
    keyframe_offsets: list[int] = []
    keyframe_blocks: list[int] = []
    cue_points: list[dict] = []

    video_tracks: set[int] = set()
    for eid, ds, de in parse_elements(buf, 0, len(buf)):
        if eid == EBML_HEADER:
            for hid, hs, he in parse_elements(buf, ds, de):
                if hid == DOCTYPE:
                    doctype = buf[hs:he].split(b"\x00")[0].decode("latin-1")
        elif eid == SEGMENT:
            # Two passes over the Segment children (ADVICE r12): in
            # streamed Matroska a Cluster may legally PRECEDE the
            # Tracks element, so block accounting must filter against
            # the FINAL video-track set — the old single pass counted
            # every track's blocks for early clusters (fallback) but
            # video-only for later ones, making n_blocks/
            # keyframe_blocks inconsistent. parse_elements is a cheap
            # re-enterable offset walk over the same buffer; pass 1
            # never touches media payloads.
            seg_children = list(parse_elements(buf, ds, de))
            for sid, ss, se in seg_children:
                if sid == SEGMENT_INFO:
                    for iid, is_, ie in parse_elements(buf, ss, se):
                        if iid == TIMESTAMP_SCALE:
                            scale_ns = _uint(buf, is_, ie)
                        elif iid == DURATION:
                            duration_ticks = _float(buf, is_, ie)
                elif sid == TRACKS:
                    for tid, ts, te in parse_elements(buf, ss, se):
                        if tid == TRACK_ENTRY:
                            t = _parse_track_entry(buf, ts, te)
                            tracks.append(t)
                            if t["track_type"] == "video":
                                video_tracks.add(t["track_number"])
                elif sid == CUES:
                    cue_points.extend(_parse_cues(buf, ss, se, ds))
            for sid, ss, se in seg_children:
                if sid == CLUSTER:
                    cluster_offsets.append(ss)
                    for cid, cs, ce in parse_elements(buf, ss, se):
                        if cid == SIMPLE_BLOCK:
                            track, _ts, flags, data = _parse_block_header(
                                buf, cs, ce
                            )
                            if track in video_tracks or not video_tracks:
                                n_blocks += 1
                                if flags & 0x80:
                                    keyframe_offsets.append(data)
                                    keyframe_blocks.append(n_blocks)
                        elif cid == BLOCK_GROUP:
                            block_span = None
                            has_ref = False
                            for gid, gs, ge in parse_elements(buf, cs, ce):
                                if gid == BLOCK:
                                    block_span = (gs, ge)
                                elif gid == 0xFB:  # ReferenceBlock
                                    has_ref = True
                            if block_span is not None:
                                track, _ts, _flags, data = _parse_block_header(
                                    buf, *block_span
                                )
                                if track in video_tracks or not video_tracks:
                                    n_blocks += 1
                                    if not has_ref:  # no reference = keyframe
                                        keyframe_offsets.append(data)
                                        keyframe_blocks.append(n_blocks)
    if doctype is None:
        raise ValueError("EBML stream with no DocType")
    duration_s = (
        duration_ticks * scale_ns / 1e9 if duration_ticks is not None else None
    )
    return {
        "doctype": doctype,
        "timestamp_scale_ns": scale_ns,
        "duration_s": duration_s,
        "tracks": tracks,
        "cluster_offsets": cluster_offsets,
        "n_blocks": n_blocks,
        "keyframe_offsets": keyframe_offsets,
        "keyframe_blocks": keyframe_blocks,
        "cue_points": cue_points,
    }


def _parse_cues(buf: bytes, ss: int, se: int, seg_data_start: int) -> list[dict]:
    """CuePoints in a Cues element → ``[{time_ticks, track,
    cluster_offset, rel_offset}]`` with cluster_offset made ABSOLUTE
    (CueClusterPosition is Segment-data-relative on the wire)."""
    out: list[dict] = []
    for pid, ps, pe in parse_elements(buf, ss, se):
        if pid != CUE_POINT:
            continue
        t = None
        for cid, cs_, ce_ in parse_elements(buf, ps, pe):
            if cid == CUE_TIME:
                t = _uint(buf, cs_, ce_)
            elif cid == CUE_TRACK_POSITIONS:
                tr = cp = rp = None
                for gid, gs, ge in parse_elements(buf, cs_, ce_):
                    if gid == CUE_TRACK:
                        tr = _uint(buf, gs, ge)
                    elif gid == CUE_CLUSTER_POSITION:
                        cp = _uint(buf, gs, ge)
                    elif gid == CUE_RELATIVE_POSITION:
                        rp = _uint(buf, gs, ge)
                if cp is not None:
                    out.append({
                        "time_ticks": t,
                        "track": tr,
                        "cluster_offset": seg_data_start + cp,
                        "rel_offset": rp,
                    })
    return out


def mkv_cue_keyframe_offsets(buf: bytes) -> dict:
    """Read-bounded keyframe index (VERDICT r12 #6): where do the
    keyframes live WITHOUT walking every Cluster's blocks.

    Prefers the container's own seek index — Matroska's Cues element
    (RFC 9559 §5.1.5) — when present: each video-track CuePoint is
    resolved to its keyframe's frame-data byte offset by seeking
    straight to the cued Cluster (CueClusterPosition) and parsing ONLY
    the cued block's few header bytes (CueRelativePosition when given,
    else the cluster's first keyframe block). Work is O(cue points),
    independent of total block count. Without Cues it falls back to the
    exhaustive cluster walk (``probe_mkv``), which remains the source
    of record for ``n_blocks``/``keyframe_blocks`` — Cues are an INDEX
    and are not required to list every keyframe, so the exhaustive
    enumeration in ``probe_mkv`` is deliberately left Cues-free.

    Returns ``{"source": "cues" | "cluster_walk",
    "keyframe_offsets": [...]}``.
    """
    if buf[:4] != b"\x1aE\xdf\xa3":
        raise ValueError("not an EBML stream (no 0x1A45DFA3 header)")
    video_tracks: set[int] = set()
    cue_points: list[dict] = []
    seg_end = None
    for eid, ds, de in parse_elements(buf, 0, len(buf)):
        if eid != SEGMENT:
            continue
        seg_end = de
        for sid, ss, se in parse_elements(buf, ds, de):
            if sid == TRACKS:
                for tid, ts, te in parse_elements(buf, ss, se):
                    if tid == TRACK_ENTRY:
                        t = _parse_track_entry(buf, ts, te)
                        if t["track_type"] == "video":
                            video_tracks.add(t["track_number"])
            elif sid == CUES:
                cue_points.extend(_parse_cues(buf, ss, se, ds))
    wanted = [
        c for c in cue_points
        if not video_tracks or c["track"] is None or c["track"] in video_tracks
    ]
    if not wanted:
        return {
            "source": "cluster_walk",
            "keyframe_offsets": probe_mkv(buf)["keyframe_offsets"],
        }
    offs: list[int] = []
    for c in wanted:
        eid, cs, ce = next(parse_elements(buf, c["cluster_offset"], seg_end))
        if eid != CLUSTER:
            raise ValueError(
                f"CueClusterPosition {c['cluster_offset']} does not point at a "
                f"Cluster (found 0x{eid:X})"
            )
        if c["rel_offset"] is not None:
            bpos = cs + c["rel_offset"]
            beid, r = read_vint(buf, bpos, keep_marker=True)
            bsize, r2 = read_vint(buf, r, keep_marker=False)
            if beid == SIMPLE_BLOCK:
                _t, _ts, _fl, data = _parse_block_header(buf, r2, r2 + bsize)
            elif beid == BLOCK_GROUP:
                data = None
                for gid, gs, ge in parse_elements(buf, r2, r2 + bsize):
                    if gid == BLOCK:
                        _t, _ts, _fl, data = _parse_block_header(buf, gs, ge)
                        break
                if data is None:
                    raise ValueError(f"cued BlockGroup at {bpos} has no Block")
            else:
                raise ValueError(
                    f"CueRelativePosition {c['rel_offset']} does not point at a "
                    f"(Simple)Block (found 0x{beid:X})"
                )
            offs.append(data)
        else:
            # no relative position: the cue promises a keyframe in this
            # cluster — take its first keyframe block (bounded to ONE
            # cluster's headers, still no full-file walk)
            for cid, s2, e2 in parse_elements(buf, cs, ce):
                if cid == SIMPLE_BLOCK:
                    trk, _ts, flags, data = _parse_block_header(buf, s2, e2)
                    if (not video_tracks or trk in video_tracks) and flags & 0x80:
                        offs.append(data)
                        break
                elif cid == BLOCK_GROUP:
                    span, has_ref = None, False
                    for gid, gs, ge in parse_elements(buf, s2, e2):
                        if gid == BLOCK:
                            span = (gs, ge)
                        elif gid == 0xFB:
                            has_ref = True
                    if span is not None and not has_ref:
                        trk, _ts, _fl, data = _parse_block_header(buf, *span)
                        if not video_tracks or trk in video_tracks:
                            offs.append(data)
                            break
    return {"source": "cues", "keyframe_offsets": offs}


# --------------------------------------------------------------------------
# Fixture encoder — planted-value oracles for the prober (the same
# encode-then-decode discipline as ops/mp4.encode_mp4).
# --------------------------------------------------------------------------

def _enc_vint_id(eid: int) -> bytes:
    """Element IDs are stored verbatim (marker included)."""
    n = (eid.bit_length() + 7) // 8
    return eid.to_bytes(n, "big")


def _enc_vint_size(val: int) -> bytes:
    """Size vint: smallest width whose payload holds ``val`` (avoiding
    the all-ones unknown-size pattern)."""
    for width in range(1, 9):
        if val < _vint_unknown(width):
            out = val | (1 << (7 * width))
            return out.to_bytes(width, "big")
    raise ValueError(f"size {val} too large for an EBML vint")


def _el(eid: int, payload: bytes) -> bytes:
    return _enc_vint_id(eid) + _enc_vint_size(len(payload)) + payload


def _el_unsized(eid: int, payload: bytes) -> bytes:
    """Element with the UNKNOWN size marker (width-1 all-ones vint) —
    the live/streamed Matroska shape for Segment and Cluster."""
    return _enc_vint_id(eid) + b"\xff" + payload


def _el_uint(eid: int, val: int) -> bytes:
    n = max(1, (val.bit_length() + 7) // 8)
    return _el(eid, val.to_bytes(n, "big"))


def encode_mkv(
    frame_sizes: list[int],
    keyframes: list[int],
    *,
    width: int = 64,
    height: int = 48,
    codec_id: str = "V_VP9",
    doctype: str = "matroska",
    timestamp_scale_ns: int = 1_000_000,
    duration_ticks: float = 320.0,
    frames_per_cluster: int = 3,
    frame_payloads: list[bytes] | None = None,
    stream_unknown_sizes: bool = False,
    emit_cues: bool = False,
    cue_relative: bool = True,
) -> bytes:
    """Minimal-but-valid Matroska fixture: EBML header, Segment with
    Info/Tracks (one video track), Clusters of SimpleBlocks whose
    keyframe flags are planted by ``keyframes`` (1-based block indexes).
    Sample ``i`` (0-based) is filled with bytes ``(i*7 + j) % 256`` —
    the same deterministic fill as encode_mp4, so offset assertions can
    check actual bytes — unless explicit ``frame_payloads`` are given
    (e.g. real VP9 headers from ops/vp9.encode_vp9_frame_header).

    ``emit_cues`` appends a Cues seek index (after the Clusters, so
    cluster positions are independent of the index's size) with one
    CuePoint per planted keyframe; ``cue_relative=False`` omits
    CueRelativePosition, exercising the reader's first-keyframe-in-
    cued-cluster path."""
    header = _el(
        EBML_HEADER,
        _el(0x4286, b"\x01")            # EBMLVersion
        + _el(0x42F7, b"\x01")          # EBMLReadVersion
        + _el(0x42F2, b"\x04")          # EBMLMaxIDLength
        + _el(0x42F3, b"\x08")          # EBMLMaxSizeLength
        + _el(DOCTYPE, doctype.encode())
        + _el(0x4287, b"\x04")          # DocTypeVersion
        + _el(0x4285, b"\x02"),         # DocTypeReadVersion
    )
    info = _el(
        SEGMENT_INFO,
        _el_uint(TIMESTAMP_SCALE, timestamp_scale_ns)
        + _el(DURATION, struct.pack(">d", duration_ticks)),
    )
    track = _el(
        TRACKS,
        _el(
            TRACK_ENTRY,
            _el_uint(TRACK_NUMBER, 1)
            + _el_uint(TRACK_TYPE, 1)  # video
            + _el(CODEC_ID, codec_id.encode())
            + _el(
                VIDEO,
                _el_uint(PIXEL_WIDTH, width) + _el_uint(PIXEL_HEIGHT, height),
            ),
        ),
    )
    clusters = b""
    pending: list[tuple[bytes, bool, int]] = []  # (block el, is_key, ticks)
    cue_entries: list[tuple[int, int, int]] = []  # (ticks, cluster_off, rel)
    cluster_ts = 0
    for i, size in enumerate(frame_sizes):
        if frame_payloads is not None:
            data = frame_payloads[i]
        else:
            data = bytes((i * 7 + j) % 256 for j in range(size))
        is_key = (i + 1) in keyframes
        flags = 0x80 if is_key else 0x00
        payload = b"\x81" + struct.pack(">h", i * 40) + bytes([flags]) + data
        pending.append((_el(SIMPLE_BLOCK, payload), is_key, i * 40))
        if (i + 1) % frames_per_cluster == 0 or i == len(frame_sizes) - 1:
            cdata = _el_uint(CLUSTER_TIMESTAMP, cluster_ts)
            for bel, key, ticks in pending:
                if key:
                    # rel = block ELEMENT offset from the cluster DATA start
                    cue_entries.append((ticks, len(clusters), len(cdata)))
                cdata += bel
            clusters += (
                _el_unsized(CLUSTER, cdata)
                if stream_unknown_sizes
                else _el(CLUSTER, cdata)
            )
            pending = []
            cluster_ts += frames_per_cluster * 40
    pre = info + track
    cues = b""
    if emit_cues:
        cpay = b""
        for ticks, cluster_off, rel in cue_entries:
            pos = (
                _el_uint(CUE_TRACK, 1)
                + _el_uint(CUE_CLUSTER_POSITION, len(pre) + cluster_off)
            )
            if cue_relative:
                pos += _el_uint(CUE_RELATIVE_POSITION, rel)
            cpay += _el(
                CUE_POINT,
                _el_uint(CUE_TIME, ticks) + _el(CUE_TRACK_POSITIONS, pos),
            )
        cues = _el(CUES, cpay)
    spayload = pre + clusters + cues
    segment = (
        _el_unsized(SEGMENT, spayload)
        if stream_unknown_sizes
        else _el(SEGMENT, spayload)
    )
    return header + segment


# --------------------------------------------------------------------------
# IVF — the public raw-VPx carrier (32-byte "DKIF" header + 12-byte
# frame headers), used by libvpx/libaom tooling for codec streams
# outside a container.
# --------------------------------------------------------------------------

def probe_ivf(buf: bytes) -> dict:
    """{codec, width, height, n_frames, frame_offsets} of an IVF file;
    frame_offsets point at each frame's codec payload (past its 12-byte
    frame header)."""
    if buf[:4] != b"DKIF":
        raise ValueError("not an IVF stream")
    hdr_size = struct.unpack("<H", buf[6:8])[0]
    fourcc = buf[8:12].decode("latin-1")
    width, height = struct.unpack("<HH", buf[12:16])
    tb_den, tb_num = struct.unpack("<II", buf[16:24])  # frames = num/den s
    n_declared = struct.unpack("<I", buf[24:28])[0]
    offsets = []
    pos = hdr_size
    while pos + 12 <= len(buf):
        fsize = struct.unpack("<I", buf[pos : pos + 4])[0]
        if pos + 12 + fsize > len(buf):
            raise ValueError(f"IVF frame at {pos} overruns the buffer")
        offsets.append(pos + 12)
        pos += 12 + fsize
    duration_s = (
        len(offsets) * tb_num / tb_den if tb_den and tb_num else None
    )
    return {
        "codec": fourcc,
        "width": width,
        "height": height,
        "n_frames": len(offsets),
        "n_frames_declared": n_declared,
        "frame_offsets": offsets,
        "duration_s": duration_s,
    }


def encode_ivf(
    frames: list[bytes], *, fourcc: str = "VP90", width: int = 64,
    height: int = 48, rate: int = 30,
) -> bytes:
    out = (
        b"DKIF" + struct.pack("<HH", 0, 32) + fourcc.encode()
        + struct.pack("<HH", width, height)
        + struct.pack("<II", rate, 1)
        + struct.pack("<I", len(frames)) + b"\x00" * 4
    )
    for i, data in enumerate(frames):
        out += struct.pack("<IQ", len(data), i) + data
    return out
