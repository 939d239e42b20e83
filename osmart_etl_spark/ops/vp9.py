"""VP9 uncompressed-frame-header PARSE tier — round 12, VERDICT r11 #5.

Implements the UNCOMPRESSED header of the public VP9 Bitstream &
Decoding Process Specification (v0.7, Google/WebM project — the same
document libvpx implements): frame marker, profile bits,
show_existing_frame, frame type, the keyframe sync code 0x498342, the
color config, and the frame size fields. That is precisely the triage
tier: keyframe detection + true coded dimensions from the codec's own
bytes (an MKV header can lie about PixelWidth; the VP9 header cannot).
Sample DECODE (the compressed header's arithmetic-coded contents and
reconstruction) stays the honest NotImplementedError stub in
ops/multimodal.py — that genuinely needs libvpx.

Scope mirrors ops/mp4.parse_sps for H.264 (both carry an encoder for
planted-fixture tests, the encode-then-decode discipline).
"""

from __future__ import annotations

VP9_SYNC_CODE = 0x498342

_CS_RGB = 7


class _BitReader:
    """MSB-first bit reader (the VP9 uncompressed header is plain
    big-endian bits, not the boolean arithmetic coder)."""

    def __init__(self, buf: bytes) -> None:
        self.buf = buf
        self.pos = 0  # bit position

    def f(self, n: int) -> int:
        out = 0
        for _ in range(n):
            byte = self.pos >> 3
            if byte >= len(self.buf):
                raise ValueError("VP9 header truncated")
            bit = (self.buf[byte] >> (7 - (self.pos & 7))) & 1
            out = (out << 1) | bit
            self.pos += 1
        return out


def parse_vp9_frame_header(buf: bytes) -> dict:
    """Parse one VP9 frame's uncompressed header →
    ``{profile, frame_type ('key'|'inter'|'show_existing'), show_frame,
    width, height, bit_depth, subsampling}`` (width/height only on
    keyframes — inter frames derive size from reference frames unless
    they carry their own, which this triage tier does not chase)."""
    r = _BitReader(buf)
    if r.f(2) != 0b10:
        raise ValueError("not a VP9 frame (bad frame_marker)")
    profile = r.f(1) | (r.f(1) << 1)  # low bit then high bit
    if profile == 3 and r.f(1) != 0:
        raise ValueError("VP9 profile-3 reserved bit set")
    if r.f(1):  # show_existing_frame
        return {
            "profile": profile,
            "frame_type": "show_existing",
            "frame_to_show": r.f(3),
            "show_frame": True,
            "width": None,
            "height": None,
            "bit_depth": None,
            "subsampling": None,
        }
    frame_type = r.f(1)  # 0 = KEY_FRAME
    show_frame = bool(r.f(1))
    r.f(1)  # error_resilient_mode
    if frame_type != 0:
        return {
            "profile": profile,
            "frame_type": "inter",
            "show_frame": show_frame,
            "width": None,
            "height": None,
            "bit_depth": None,
            "subsampling": None,
        }
    if r.f(24) != VP9_SYNC_CODE:
        raise ValueError("VP9 keyframe without sync code 0x498342")
    # color_config
    if profile >= 2:
        bit_depth = 12 if r.f(1) else 10
    else:
        bit_depth = 8
    color_space = r.f(3)
    if color_space != _CS_RGB:
        r.f(1)  # color_range
        if profile in (1, 3):
            sub_x, sub_y = r.f(1), r.f(1)
            if r.f(1) != 0:
                raise ValueError("VP9 color-config reserved bit set")
        else:
            sub_x = sub_y = 1
    else:
        if profile in (1, 3):
            if r.f(1) != 0:
                raise ValueError("VP9 RGB reserved bit set")
        sub_x = sub_y = 0
    # frame_size
    width = r.f(16) + 1
    height = r.f(16) + 1
    if r.f(1):  # render_and_frame_size_different
        r.f(16), r.f(16)  # render size — not triage material
    return {
        "profile": profile,
        "frame_type": "key",
        "show_frame": show_frame,
        "width": width,
        "height": height,
        "bit_depth": bit_depth,
        "subsampling": (sub_x, sub_y),
    }


class _BitWriter:
    def __init__(self) -> None:
        self.bits: list[int] = []

    def f(self, val: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((val >> i) & 1)

    def bytes(self) -> bytes:
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            b = 0
            for bit in self.bits[i : i + 8]:
                b = (b << 1) | bit
            b <<= 8 - min(8, len(self.bits) - i)
            out.append(b)
        return bytes(out)


def encode_vp9_frame_header(
    width: int, height: int, *, profile: int = 0, key: bool = True,
    show_frame: bool = True, pad_to: int = 0,
) -> bytes:
    """Planted-fixture encoder for :func:`parse_vp9_frame_header` —
    profile 0/2, keyframe or minimal inter header; ``pad_to`` appends
    zero bytes so fixtures can simulate a frame body after the header."""
    w = _BitWriter()
    w.f(0b10, 2)
    w.f(profile & 1, 1)
    w.f((profile >> 1) & 1, 1)
    if profile == 3:
        w.f(0, 1)
    w.f(0, 1)  # show_existing_frame = 0
    w.f(0 if key else 1, 1)
    w.f(1 if show_frame else 0, 1)
    w.f(0, 1)  # error_resilient_mode
    if key:
        w.f(VP9_SYNC_CODE, 24)
        if profile >= 2:
            w.f(0, 1)  # 10-bit
        w.f(2, 3)  # color_space = BT.709 (any non-RGB value)
        w.f(0, 1)  # color_range
        if profile in (1, 3):
            w.f(1, 1), w.f(1, 1), w.f(0, 1)
        w.f(width - 1, 16)
        w.f(height - 1, 16)
        w.f(0, 1)  # render size same
    out = w.bytes()
    if pad_to > len(out):
        out += b"\x00" * (pad_to - len(out))
    return out
