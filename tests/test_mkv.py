"""Matroska/EBML + VP9 parse tier (ops/mkv.py, ops/vp9.py) —
fixture-oracle checks in the ops/mp4.py discipline: every field the
prober reports is asserted against values PLANTED by the fixture
encoder, plus the Spark-side video_stream_info triage and the
decode-honesty stub."""

from __future__ import annotations

import struct

import pytest

from osmart_etl_spark.ops.mkv import (
    encode_ivf,
    encode_mkv,
    probe_ivf,
    probe_mkv,
    read_vint,
)
from osmart_etl_spark.ops.vp9 import (
    encode_vp9_frame_header,
    parse_vp9_frame_header,
)

SIZES = [120, 80, 95, 60, 200, 44, 77, 130]
KEYFRAMES = [1, 5, 8]


def _fixture(**kw) -> bytes:
    return encode_mkv(SIZES, KEYFRAMES, width=64, height=48, **kw)


def test_vint_roundtrip_widths():
    """RFC 8794 vints at 1-4 byte widths, marker kept and stripped."""
    # 1-byte id 0xA3 (SimpleBlock)
    assert read_vint(b"\xa3", 0, keep_marker=True) == (0xA3, 1)
    assert read_vint(b"\xa3", 0, keep_marker=False) == (0x23, 1)
    # 2-byte size: 0x4489 strips to 0x489
    assert read_vint(b"\x44\x89", 0, keep_marker=False) == (0x489, 2)
    # 4-byte id (Segment)
    assert read_vint(b"\x18\x53\x80\x67", 0, keep_marker=True) == (0x18538067, 4)
    with pytest.raises(ValueError):
        read_vint(b"\x00\x01", 0, keep_marker=True)
    with pytest.raises(ValueError):
        read_vint(b"\x40", 0, keep_marker=False)  # truncated 2-byte vint


def test_probe_mkv_reports_planted_metadata():
    info = probe_mkv(_fixture())
    assert info["doctype"] == "matroska"
    assert info["timestamp_scale_ns"] == 1_000_000
    assert info["duration_s"] == pytest.approx(0.32)  # 320 ticks x 1ms
    assert len(info["tracks"]) == 1
    t = info["tracks"][0]
    assert (t["track_number"], t["track_type"]) == (1, "video")
    assert t["codec_id"] == "V_VP9"
    assert (t["width"], t["height"]) == (64, 48)
    assert info["n_blocks"] == len(SIZES)
    assert info["keyframe_blocks"] == KEYFRAMES
    # 8 frames at 3/cluster -> 3 clusters
    assert len(info["cluster_offsets"]) == 3


def test_probe_mkv_keyframe_offsets_point_at_frame_bytes():
    """Keyframe offsets must land on the planted deterministic fill
    ((i*7 + j) % 256 for sample i) — same oracle as the MP4 twin."""
    buf = _fixture()
    info = probe_mkv(buf)
    offs = info["keyframe_offsets"]
    assert len(offs) == len(KEYFRAMES)
    for k, off in zip(KEYFRAMES, offs):
        i = k - 1
        assert buf[off] == (i * 7) % 256
        assert buf[off + 1] == (i * 7 + 1) % 256


def test_probe_mkv_webm_doctype_and_rejects_garbage():
    info = probe_mkv(_fixture(doctype="webm"))
    assert info["doctype"] == "webm"
    with pytest.raises(ValueError):
        probe_mkv(b"\x00" * 64)
    with pytest.raises(ValueError):
        probe_mkv(b"RIFF....AVI ....")


def test_probe_mkv_malformed_tables_raise_parse_errors():
    """Truncations/corruptions must raise within the _PARSE_ERRORS
    family (ValueError/struct.error/IndexError), never hang or return
    garbage silently."""
    buf = _fixture()
    for cut in (buf[:6], buf[:-25], buf[: len(buf) // 2]):
        with pytest.raises((ValueError, struct.error, IndexError)):
            probe_mkv(cut)
    # the first 40 bytes are EXACTLY the EBML header: a degenerate but
    # well-formed stream — it parses with no tracks, and the triage
    # layer rejects it as 'no video track' (probe_error data)
    assert probe_mkv(buf[:40])["tracks"] == []
    from osmart_etl_spark.ops.multimodal import _probe_video_one

    with pytest.raises(ValueError, match="no video track"):
        _probe_video_one(buf[:40])


def test_vp9_header_roundtrip_profiles():
    for profile in (0, 1, 2, 3):
        h = parse_vp9_frame_header(
            encode_vp9_frame_header(640, 360, profile=profile)
        )
        assert h["frame_type"] == "key"
        assert (h["width"], h["height"]) == (640, 360)
        assert h["profile"] == profile
        assert h["bit_depth"] == (8 if profile < 2 else 10)
    inter = parse_vp9_frame_header(encode_vp9_frame_header(0, 0, key=False))
    assert inter["frame_type"] == "inter" and inter["width"] is None
    with pytest.raises(ValueError):
        parse_vp9_frame_header(b"\xff\xff\xff\xff")  # bad frame marker
    with pytest.raises(ValueError):
        parse_vp9_frame_header(encode_vp9_frame_header(64, 48)[:4])  # cut


def test_probe_ivf_planted_and_vp9_keyframe_walk():
    frames = [
        encode_vp9_frame_header(64, 48, key=(i % 3 == 0), pad_to=40 + i)
        for i in range(7)
    ]
    buf = encode_ivf(frames, fourcc="VP90", width=64, height=48, rate=30)
    info = probe_ivf(buf)
    assert info["codec"] == "VP90"
    assert (info["width"], info["height"]) == (64, 48)
    assert info["n_frames"] == 7 and info["n_frames_declared"] == 7
    assert info["duration_s"] == pytest.approx(7 / 30)
    keys = [
        i for i, off in enumerate(info["frame_offsets"])
        if parse_vp9_frame_header(buf[off : off + 16])["frame_type"] == "key"
    ]
    assert keys == [0, 3, 6]
    with pytest.raises(ValueError):
        probe_ivf(b"NOPE" + buf[4:])
    with pytest.raises(ValueError):
        probe_ivf(buf[:-10])  # frame overruns buffer


def test_video_stream_info_mkv_ivf_triage(spark):
    """The Spark triage op classifies MKV/WebM/IVF rows with parse-tier
    metadata while Y4M still decodes for real and garbage stays data."""
    from osmart_etl_spark.ops.multimodal import MEDIA_SCHEMA, video_stream_info

    mkv = _fixture()
    webm = _fixture(doctype="webm", codec_id="V_VP8")
    ivf = encode_ivf(
        [encode_vp9_frame_header(64, 48, key=(i == 0), pad_to=50) for i in range(5)],
        fourcc="VP90", width=64, height=48,
    )
    truncated = mkv[:30]
    rows = [
        (0, "video", mkv, len(mkv), None, None, None),
        (1, "video", webm, len(webm), None, None, None),
        (2, "video", ivf, len(ivf), None, None, None),
        (3, "video", truncated, len(truncated), None, None, None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_id: r for r in video_stream_info(media).collect()}

    r0 = got[0]
    assert (r0.container, r0.codec) == ("mkv", "vp9")
    assert (r0.width, r0.height) == (64, 48)
    assert r0.n_frames == len(SIZES) and r0.n_keyframes == len(KEYFRAMES)
    assert r0.duration_s == pytest.approx(0.32)
    assert r0.first_keyframe_offset == probe_mkv(mkv)["keyframe_offsets"][0]
    assert (got[1].container, got[1].codec) == ("webm", "vp8")
    r2 = got[2]
    assert (r2.container, r2.codec) == ("ivf", "vp9")
    assert r2.n_frames == 5 and r2.n_keyframes == 1
    assert r2.first_keyframe_offset == probe_ivf(ivf)["frame_offsets"][0]
    assert got[3].probe_status == "probe_error"


def test_mkv_frame_decode_stays_honest_stub():
    from osmart_etl_spark.ops.multimodal import decode_video_frames

    with pytest.raises(NotImplementedError, match="parse structurally"):
        decode_video_frames(_fixture())
    with pytest.raises(NotImplementedError, match="parse structurally"):
        decode_video_frames(
            encode_ivf([encode_vp9_frame_header(8, 8)], fourcc="VP90")
        )


def test_probe_mkv_streamed_unknown_sizes_sees_every_cluster():
    """Live/streamed Matroska (RFC 8794 §6.2): Segment AND every
    Cluster carry the unknown-size marker. An unknown-size Cluster must
    end at the NEXT Cluster, not swallow the rest of the Segment —
    every block and keyframe stays visible (round-12 review fix)."""
    streamed = encode_mkv(
        SIZES, KEYFRAMES, width=64, height=48, stream_unknown_sizes=True
    )
    info = probe_mkv(streamed)
    assert len(info["cluster_offsets"]) == 3  # 8 frames, 3 per cluster
    assert info["n_blocks"] == len(SIZES)
    assert info["keyframe_blocks"] == KEYFRAMES
    # keyframe offsets still land on the planted per-sample fill
    for k, off in zip(KEYFRAMES, info["keyframe_offsets"]):
        i = k - 1
        assert streamed[off] == (i * 7) % 256
    # sized and streamed forms agree on everything but byte offsets
    sized = probe_mkv(_fixture())
    assert sized["n_blocks"] == info["n_blocks"]
    assert sized["keyframe_blocks"] == info["keyframe_blocks"]
    # an unknown-size element that is NOT Segment/Cluster is refused
    from osmart_etl_spark.ops.mkv import SEGMENT, SEGMENT_INFO, _el_unsized

    ebml_header = streamed[:40]  # the header is exactly 40 bytes
    bad = ebml_header + _el_unsized(SEGMENT, _el_unsized(SEGMENT_INFO, b""))
    with pytest.raises(ValueError, match="unknown-size"):
        probe_mkv(bad)


def test_block_header_skips_lacing_tables():
    """The first-frame offset of a laced (Simple)Block must point past
    the lacing size table for all three lacing forms (RFC 9559 §10.3):
    Xiph 255-run sizes, EBML vint sizes, fixed-size count byte."""
    from osmart_etl_spark.ops.mkv import _parse_block_header

    head = b"\x81" + struct.pack(">h", 40)  # track 1, rel ts 40

    # no lacing: frame starts right after the flags byte
    blk = head + bytes([0x80]) + b"DATA"
    assert _parse_block_header(blk, 0, len(blk)) == (1, 40, 0x80, 4)

    # Xiph lacing: 3 frames, sizes 300 (255+45) and 10
    blk = head + bytes([0x82, 2, 255, 45, 10]) + b"F1F2F3"
    track, ts, flags, q = _parse_block_header(blk, 0, len(blk))
    assert (track, flags & 0x06) == (1, 0x02)
    assert blk[q:q + 2] == b"F1"

    # EBML lacing: 3 frames, first size vint 0xA0 (32), one delta vint
    blk = head + bytes([0x86, 2, 0xA0, 0xBF]) + b"E1E2E3"
    *_, q = _parse_block_header(blk, 0, len(blk))
    assert blk[q:q + 2] == b"E1"

    # fixed lacing: count byte only
    blk = head + bytes([0x84, 3]) + b"XXYYZZWW"
    *_, q = _parse_block_header(blk, 0, len(blk))
    assert blk[q:q + 2] == b"XX"

    with pytest.raises(ValueError, match="truncated"):
        _parse_block_header(head + bytes([0x82]), 0, 4)


def test_probe_mkv_streamed_cluster_before_tracks():
    """ADVICE r12: in streamed Matroska a Cluster may legally precede
    the Tracks element. Block accounting must use the FINAL video-track
    set — the old single pass counted the audio track's blocks for
    clusters seen before Tracks (empty-set fallback) but video-only
    after, so the same media in the two orderings disagreed."""
    import struct

    from osmart_etl_spark.ops import mkv as M

    def sb(track_vint: bytes, ts: int, flags: int, data: bytes) -> bytes:
        return M._el(
            M.SIMPLE_BLOCK, track_vint + struct.pack(">h", ts) + bytes([flags]) + data
        )

    header = M._el(
        M.EBML_HEADER,
        M._el(0x4286, b"\x01") + M._el(M.DOCTYPE, b"matroska"),
    )
    info = M._el(M.SEGMENT_INFO, M._el_uint(M.TIMESTAMP_SCALE, 1_000_000))
    video_entry = M._el(
        M.TRACK_ENTRY,
        M._el_uint(M.TRACK_NUMBER, 1)
        + M._el_uint(M.TRACK_TYPE, 1)
        + M._el(M.CODEC_ID, b"V_VP9")
        + M._el(M.VIDEO, M._el_uint(M.PIXEL_WIDTH, 64) + M._el_uint(M.PIXEL_HEIGHT, 48)),
    )
    audio_entry = M._el(
        M.TRACK_ENTRY,
        M._el_uint(M.TRACK_NUMBER, 2)
        + M._el_uint(M.TRACK_TYPE, 2)
        + M._el(M.CODEC_ID, b"A_OPUS"),
    )
    tracks = M._el(M.TRACKS, video_entry + audio_entry)
    # two clusters, each with one video keyframe + one audio block
    cl = [
        M._el(
            M.CLUSTER,
            M._el_uint(M.CLUSTER_TIMESTAMP, i * 100)
            + sb(b"\x81", 0, 0x80, b"vid%d" % i)
            + sb(b"\x82", 0, 0x00, b"aud%d" % i),
        )
        for i in range(2)
    ]
    normal = header + M._el(M.SEGMENT, info + tracks + cl[0] + cl[1])
    streamed = header + M._el(M.SEGMENT, info + cl[0] + tracks + cl[1])

    p_normal = M.probe_mkv(normal)
    p_streamed = M.probe_mkv(streamed)
    # video-only accounting, identical regardless of element order
    assert p_normal["n_blocks"] == 2
    assert p_normal["keyframe_blocks"] == [1, 2]
    assert p_streamed["n_blocks"] == p_normal["n_blocks"]
    assert p_streamed["keyframe_blocks"] == p_normal["keyframe_blocks"]
    assert [t["track_type"] for t in p_streamed["tracks"]] == ["video", "audio"]


def test_cues_index_matches_cluster_walk():
    """VERDICT r12 #6: with a Cues seek index present, the read-bounded
    keyframe lookup resolves each CuePoint (cluster position + relative
    block position) to EXACTLY the frame-data offsets the exhaustive
    cluster walk enumerates — for sized and streamed (unknown-size)
    layouts alike."""
    from osmart_etl_spark.ops import mkv as M

    for streamed in (False, True):
        buf = M.encode_mkv(
            [10, 20, 30, 40, 50, 60, 70], [1, 4, 6],
            frames_per_cluster=3, emit_cues=True,
            stream_unknown_sizes=streamed,
        )
        walk = M.probe_mkv(buf)
        assert len(walk["cue_points"]) == 3
        assert all(c["track"] == 1 for c in walk["cue_points"])
        got = M.mkv_cue_keyframe_offsets(buf)
        assert got["source"] == "cues"
        assert got["keyframe_offsets"] == walk["keyframe_offsets"]
        # the cued offsets really are the planted frame bytes
        for blk, off in zip([1, 4, 6], got["keyframe_offsets"]):
            i = blk - 1
            assert buf[off] == (i * 7) % 256


def test_cues_without_relative_position_uses_cued_cluster():
    """A CuePoint without CueRelativePosition (legal — the index may
    carry cluster granularity only) resolves to the cued cluster's
    first keyframe block, still touching only that one cluster."""
    from osmart_etl_spark.ops import mkv as M

    buf = M.encode_mkv(
        [10, 20, 30, 40, 50, 60], [1, 4],
        frames_per_cluster=3, emit_cues=True, cue_relative=False,
    )
    walk = M.probe_mkv(buf)
    assert all(c["rel_offset"] is None for c in walk["cue_points"])
    got = M.mkv_cue_keyframe_offsets(buf)
    assert got["source"] == "cues"
    assert got["keyframe_offsets"] == walk["keyframe_offsets"]


def test_cues_fallback_to_cluster_walk():
    """Without a Cues element the helper falls back to the exhaustive
    walk and says so."""
    from osmart_etl_spark.ops import mkv as M

    buf = M.encode_mkv([10, 20, 30, 40], [1, 3], frames_per_cluster=2)
    assert M.probe_mkv(buf)["cue_points"] == []
    got = M.mkv_cue_keyframe_offsets(buf)
    assert got["source"] == "cluster_walk"
    assert got["keyframe_offsets"] == M.probe_mkv(buf)["keyframe_offsets"]
