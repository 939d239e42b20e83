"""MP4 parse tier (ops/mp4.py) — fixture-oracle checks: every field the
prober reports is asserted against values PLANTED by the fixture writer
(same encode-then-decode discipline as the AVI/Y4M codecs), plus the
Spark-side video_stream_info triage over a mixed container corpus."""

from __future__ import annotations

import struct

import pytest

from osmart_etl_spark.ops.mp4 import (
    annexb_keyframe_offsets,
    encode_mp4,
    parse_boxes,
    probe_mp4,
    walk_annexb_nals,
)

SIZES = [120, 80, 95, 60, 200, 44, 77, 130]
KEYFRAMES = [1, 5, 8]


def _fixture() -> bytes:
    return encode_mp4(
        SIZES, KEYFRAMES, width=64, height=48, timescale=1000,
        sample_delta=40, samples_per_chunk=3, profile_idc=66, level_idc=30,
    )


def test_probe_mp4_reports_planted_metadata():
    info = probe_mp4(_fixture())
    assert info["brand"] == "isom"
    assert len(info["tracks"]) == 1
    t = info["tracks"][0]
    assert t["handler"] == "vide"
    assert t["codec"] == "avc1"
    assert (t["width"], t["height"]) == (64, 48)
    assert t["timescale"] == 1000
    assert t["duration_s"] == pytest.approx(len(SIZES) * 40 / 1000)
    assert (t["profile_idc"], t["level_idc"]) == (66, 30)
    assert t["n_samples"] == len(SIZES)
    assert t["keyframe_samples"] == KEYFRAMES


def test_probe_mp4_keyframe_offsets_point_into_mdat():
    """Keyframe byte offsets from the stsc/stco/stsz walk must equal a
    hand-computed prefix sum AND the bytes there must be the fixture's
    deterministic per-sample payload start."""
    buf = _fixture()
    info = probe_mp4(buf)
    offs = info["tracks"][0]["keyframe_offsets"]
    # hand-computed: mdat payload starts after ftyp (24B) + mdat header
    data_start = 24 + 8
    expect = []
    for k in KEYFRAMES:
        expect.append(data_start + sum(SIZES[: k - 1]))
    assert offs == expect
    # the fixture fills sample i with bytes ((i*7 + j) % 256)
    for k, off in zip(KEYFRAMES, offs):
        i = k - 1
        assert buf[off] == (i * 7) % 256
        assert buf[off + 1] == (i * 7 + 1) % 256


def test_probe_mp4_no_stss_means_all_keyframes():
    """ISO 14496-12 §8.6.2: absent stss ⇒ every sample is sync. Strip
    the stss box by rebuilding the fixture without it."""
    buf = _fixture()
    # surgically remove stss: locate and splice (sizes self-describe)
    idx = buf.find(b"stss") - 4
    size = struct.unpack(">I", buf[idx : idx + 4])[0]
    cut = buf[:idx] + buf[idx + size :]
    # fix ancestor box sizes (moov/trak/mdia/minf/stbl each shrink)
    for anc in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
        a = cut.find(anc) - 4
        old = struct.unpack(">I", cut[a : a + 4])[0]
        cut = cut[:a] + struct.pack(">I", old - size) + cut[a + 4 :]
    t = probe_mp4(cut)["tracks"][0]
    assert t["keyframe_samples"] == list(range(1, len(SIZES) + 1))


def test_probe_mp4_rejects_garbage():
    with pytest.raises(ValueError):
        probe_mp4(b"\x00" * 64)
    with pytest.raises(ValueError):
        probe_mp4(b"RIFF....AVI ....")  # wrong container family


def test_parse_boxes_handles_largesize_and_to_eof():
    inner = struct.pack(">I", 16) + b"free" + b"\x00" * 8
    large = struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", 24) + b"x" * 8
    to_eof = struct.pack(">I", 0) + b"skip" + b"tail-bytes"
    boxes = list(parse_boxes(inner + large + to_eof))
    assert [b[0] for b in boxes] == [b"free", b"mdat", b"skip"]
    # to-EOF box swallows the remainder
    assert boxes[-1][2] == len(inner + large + to_eof)


def test_annexb_nal_walk_and_idr_offsets():
    # SPS(7), PPS(8), IDR(5), non-IDR slice(1), IDR(5)
    stream = (
        b"\x00\x00\x00\x01" + bytes([0x67]) + b"sps"
        + b"\x00\x00\x01" + bytes([0x68]) + b"pps"
        + b"\x00\x00\x01" + bytes([0x65]) + b"idr-frame"
        + b"\x00\x00\x01" + bytes([0x41]) + b"p-frame"
        + b"\x00\x00\x00\x01" + bytes([0x65]) + b"idr2"
    )
    nals = walk_annexb_nals(stream)
    assert [t for _o, t in nals] == [7, 8, 5, 1, 5]
    idr = annexb_keyframe_offsets(stream)
    assert len(idr) == 2
    assert stream[idr[0] + 3] == 0x65  # 3-byte start code
    with pytest.raises(ValueError):
        walk_annexb_nals(b"no start code here")


def test_video_stream_info_mixed_corpus(spark):
    """The Spark triage op over one corpus mixing every container tier:
    real Y4M frames, a real MP4 parse, a raw Annex-B stream, garbage,
    and non-video rows — all statuses and parse fields as data."""
    import numpy as np

    from osmart_etl_spark.ops.multimodal import MEDIA_SCHEMA, video_stream_info
    from osmart_etl_spark.ops.video import encode_y4m

    planes = [
        (
            np.full((8, 8), i * 20, dtype=np.uint8),
            np.full((4, 4), 128, dtype=np.uint8),
            np.full((4, 4), 128, dtype=np.uint8),
        )
        for i in range(4)
    ]
    y4m = encode_y4m(planes, 8, 8)
    mp4 = _fixture()
    annexb = (
        b"\x00\x00\x00\x01" + bytes([0x67]) + b"s"
        + b"\x00\x00\x01" + bytes([0x65]) + b"k"
    )
    rows = [
        (0, "video", y4m, len(y4m), None, None, None),
        (1, "video", mp4, len(mp4), None, None, None),
        (2, "video", annexb, len(annexb), None, None, None),
        (3, "video", b"\xde\xad\xbe\xef" * 8, 32, None, None, None),
        (4, "image", b"\x00" * 16, 16, 4, 4, None),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_id: r for r in video_stream_info(media).collect()}

    assert got[0].container == "y4m" and got[0].n_frames == 4
    assert got[0].n_keyframes == 4 and got[0].probe_status == "ok"
    r1 = got[1]
    assert (r1.container, r1.codec) == ("mp4", "avc1")
    assert (r1.width, r1.height) == (64, 48)
    assert r1.n_frames == len(SIZES) and r1.n_keyframes == len(KEYFRAMES)
    assert r1.duration_s == pytest.approx(0.32)
    assert r1.first_keyframe_offset == 32  # ftyp(24) + mdat header(8)
    assert got[2].container == "h264-annexb" and got[2].n_keyframes == 1
    assert got[3].probe_status == "probe_error"
    assert got[4].probe_status == "not_video"


def test_video_stream_info_truncated_mp4_is_data_not_task_failure(spark):
    """Round-12 (ADVICE medium): payloads that pass the ftyp sniff but
    are truncated/malformed mid-table raise struct.error or IndexError
    out of the box-table parsers — the triage op must absorb ALL of
    those into probe_status='probe_error', never kill the Spark task."""
    from osmart_etl_spark.ops.multimodal import MEDIA_SCHEMA, video_stream_info

    full = _fixture()

    def corrupt_count(buf: bytes, fourcc: bytes, count_off: int) -> bytes:
        """Overwrite a table's entry-count field with a huge value while
        every box size stays self-consistent — the parser then unpacks a
        table far past the buffer end (struct.error), the exact failure
        the outer box-size guard cannot catch."""
        at = buf.find(fourcc) + count_off
        return buf[:at] + struct.pack(">I", 0x0FFFFFFF) + buf[at + 4 :]

    candidates = [
        corrupt_count(full, b"stsz", 12),  # stsz: ver/flags,uniform,COUNT
        corrupt_count(full, b"stss", 8),   # stss: ver/flags,COUNT
        corrupt_count(full, b"stco", 8),   # stco: ver/flags,COUNT
        corrupt_count(full, b"stsc", 8),   # stsc: ver/flags,COUNT
        full[:40],                          # plain truncation (ValueError)
        full[: full.find(b"stco") + 9],     # cut mid-table (ValueError)
    ]
    # prove the corruption exercises the non-ValueError parser paths
    from osmart_etl_spark.ops.multimodal import _probe_video_one

    raised = set()
    for c in candidates:
        try:
            _probe_video_one(c)
        except Exception as exc:  # noqa: BLE001 — classifying, not handling
            raised.add(type(exc).__name__)
    assert "error" in raised  # struct.error reaches the triage loop
    rows = [
        (i, "video", c, len(c), None, None, None)
        for i, c in enumerate(candidates)
    ] + [(99, "video", full, len(full), None, None, None)]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_id: r for r in video_stream_info(media).collect()}
    assert got[99].probe_status == "ok"  # the intact sibling still parses
    for i in range(len(candidates)):
        assert got[i].probe_status == "probe_error", i


def test_mp4_frame_decode_stays_honest_stub():
    """decode_video_frames on MP4 must still raise (no fabricated
    frames) — the parse tier changes triage, not decode honesty."""
    from osmart_etl_spark.ops.multimodal import decode_video_frames

    with pytest.raises(NotImplementedError, match="parses structurally"):
        decode_video_frames(_fixture())


def test_sps_roundtrip_and_cropping():
    """parse_sps must invert encode_sps, including the crop-unit
    arithmetic (4:2:0 frame crop units = 2): 64x48 uncropped, 1920x1080
    via crop_bottom=4 (1088-grid), and an odd crop on both axes."""
    from osmart_etl_spark.ops.mp4 import encode_sps, parse_sps

    s = parse_sps(encode_sps(64, 48))
    assert (s["width"], s["height"]) == (64, 48)
    assert (s["profile_idc"], s["level_idc"]) == (66, 30)
    assert s["chroma_format_idc"] == 1

    s = parse_sps(encode_sps(1920, 1080, crop_bottom=4, level_idc=40))
    assert (s["width"], s["height"]) == (1920, 1080)
    assert s["level_idc"] == 40

    s = parse_sps(encode_sps(1276, 716, crop_right=2, crop_bottom=2))
    assert (s["width"], s["height"]) == (1276, 716)


def test_sps_emulation_prevention_stripped():
    """An SPS whose RBSP contains 00 00 03 emulation bytes must parse
    to the same fields after transport through an Annex-B stream."""
    from osmart_etl_spark.ops.mp4 import _strip_emulation, annexb_sps_info, encode_sps

    assert _strip_emulation(b"\x00\x00\x03\x01") == b"\x00\x00\x01"
    assert _strip_emulation(b"\x00\x00\x03\x03") == b"\x00\x00\x03"
    sps = encode_sps(320, 240)
    stream = b"\x00\x00\x00\x01" + sps + b"\x00\x00\x01" + bytes([0x65]) + b"k"
    info = annexb_sps_info(stream)
    assert (info["width"], info["height"]) == (320, 240)


def test_video_stream_info_annexb_dimensions(spark):
    """The Annex-B triage row must now carry SPS-derived dimensions."""
    from osmart_etl_spark.ops.mp4 import encode_sps
    from osmart_etl_spark.ops.multimodal import MEDIA_SCHEMA, video_stream_info

    stream = (
        b"\x00\x00\x00\x01" + encode_sps(640, 360, crop_bottom=4)
        + b"\x00\x00\x01" + bytes([0x68]) + b"p"
        + b"\x00\x00\x01" + bytes([0x65]) + b"idr"
    )
    media = spark.createDataFrame(
        [(0, "video", stream, len(stream), None, None, None)], MEDIA_SCHEMA
    )
    r = video_stream_info(media).collect()[0]
    assert (r.width, r.height) == (640, 360)
    assert r.codec == "h264" and r.n_keyframes == 1


def test_keyframe_payloads_slice_exact_sample_bytes():
    """keyframe_payloads must return each keyframe sample's EXACT mdat
    bytes (the fixture fills sample i with (i*7+j)%256) — the byte-range
    fetch a frame-sampling pass issues instead of a full decode."""
    from osmart_etl_spark.ops.mp4 import keyframe_payloads

    got = keyframe_payloads(_fixture())
    assert len(got) == len(KEYFRAMES)
    for k, frame in zip(KEYFRAMES, got):
        i = k - 1
        assert len(frame) == SIZES[i]
        assert frame == bytes(((i * 7 + j) % 256) for j in range(SIZES[i]))
    assert len(keyframe_payloads(_fixture(), max_frames=2)) == 2
