"""REAL lossy-WebP (VP8 key-frame) decoder — pure numpy/stdlib.

RFC 6386 ("VP8 Data Format and Decoding Guide", public spec) intra
decode path: boolean arithmetic decoder, key-frame header, per-MB
intra prediction modes (16x16 DC/V/H/TM, 4x4 B_PRED with all ten
sub-modes, 8x8 chroma), token-tree residual decode with the default
coefficient probabilities + header updates, dequantization, inverse
WHT/DCT, reconstruction, and the normal in-loop deblocking filter.
Output is YUV 4:2:0 planes plus a BT.601 studio-swing RGB conversion.

Scope: key frames only (the only frame type a WebP still image
contains — interframes require a reference-frame store that a
single-image container never exercises). Non-keyframe payloads raise
ValueError, surfaced by the mapInPandas operators as decode_status.

Like the sibling codecs (ops/jpeg.py T.81, ops/vp8l.py RFC 9649,
PNG/WAV in ops/multimodal.py) this exists because the container has no
image libraries and the reference repo has no multimodal path at all
(extension surface; see SURVEY.md §2.9): the Spark-side plumbing must
be exercised by REAL decodes, not fabricated features.

Probability-table provenance: the constants below are the normative
RFC 6386 tables (sections 11.5, 13.4, 13.5). Because the boolean
arithmetic decoder desyncs on ANY table byte that differs from the
encoder's (the split — and therefore the range bookkeeping — depends
on the exact probability, not just the decoded decision), they were
cross-checked byte-for-byte against the system libwebp's .rodata copy
of the same spec tables (the container ships /usr/lib/x86_64-linux-gnu
/libwebp.so.7; note libwebp stores kf_bmode_prob under its OWN 4x4
mode enum — RD/VR before LD — and the axes were permuted back to the
RFC/libvpx order used here). Conformance is then proven behaviorally
in tests/test_vp8.py: bit-exact YUV equality with libwebp's decoder on
CPython's third-party python.webp fixture and on a corpus of random
images encoded by the real libwebp encoder at multiple sizes and
qualities, plus a cross-check of the fixture against its lossless
python.ppm source sibling.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# Boolean arithmetic decoder (RFC 6386 section 7)


class BoolDecoder:
    __slots__ = ("data", "pos", "value", "range", "bit_count")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 2
        self.value = int.from_bytes(data[:2].ljust(2, b"\0"), "big")
        self.range = 255
        self.bit_count = 0

    def bool(self, prob: int) -> int:
        split = 1 + (((self.range - 1) * prob) >> 8)
        big_split = split << 8
        if self.value >= big_split:
            ret = 1
            self.range -= split
            self.value -= big_split
        else:
            ret = 0
            self.range = split
        while self.range < 128:
            self.value <<= 1
            self.range <<= 1
            self.bit_count += 1
            if self.bit_count == 8:
                self.bit_count = 0
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0
                self.value |= nxt
                self.pos += 1
        return ret

    def literal(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bool(128)
        return v

    def signed_literal(self, n: int) -> int:
        v = self.literal(n)
        return -v if self.bool(128) else v

    def tree(self, tree: tuple, probs) -> int:
        i = 0
        while True:
            i = tree[i + self.bool(probs[i >> 1])]
            if i <= 0:
                return -i

    def tree_from(self, tree: tuple, probs, start: int) -> int:
        i = start
        while True:
            i = tree[i + self.bool(probs[i >> 1])]
            if i <= 0:
                return -i


# ---------------------------------------------------------------------------
# Constant tables (RFC 6386; see module docstring for provenance)

# intra 16x16 modes
DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED = 0, 1, 2, 3, 4
# intra 4x4 sub-modes
(B_DC_PRED, B_TM_PRED, B_VE_PRED, B_HE_PRED, B_LD_PRED,
 B_RD_PRED, B_VR_PRED, B_VL_PRED, B_HD_PRED, B_HU_PRED) = range(10)

KF_YMODE_TREE = (-B_PRED, 2, 4, 6, -DC_PRED, -V_PRED, -H_PRED, -TM_PRED)
KF_YMODE_PROB = (145, 156, 163, 128)

UV_MODE_TREE = (-DC_PRED, 2, -V_PRED, 4, -H_PRED, -TM_PRED)
KF_UV_MODE_PROB = (142, 114, 183)

BMODE_TREE = (
    -B_DC_PRED, 2,
    -B_TM_PRED, 4,
    -B_VE_PRED, 6,
    8, 12,
    -B_HE_PRED, 10,
    -B_RD_PRED, -B_VR_PRED,
    -B_LD_PRED, 14,
    -B_VL_PRED, 16,
    -B_HD_PRED, -B_HU_PRED,
)

MB_SEGMENT_TREE = (2, 4, -0, -1, -2, -3)

# token alphabet
(DCT_0, DCT_1, DCT_2, DCT_3, DCT_4,
 CAT1, CAT2, CAT3, CAT4, CAT5, CAT6, DCT_EOB) = range(12)

COEF_TREE = (
    -DCT_EOB, 2,
    -DCT_0, 4,
    -DCT_1, 6,
    8, 12,
    -DCT_2, 10,
    -DCT_3, -DCT_4,
    14, 16,
    -CAT1, -CAT2,
    18, 20,
    -CAT3, -CAT4,
    -CAT5, -CAT6,
)

# extra-bit probabilities and base values for the big-value categories
CAT_PROBS = {
    CAT1: (159,),
    CAT2: (165, 145),
    CAT3: (173, 148, 140),
    CAT4: (176, 155, 140, 135),
    CAT5: (180, 157, 141, 134, 130),
    CAT6: (254, 254, 243, 230, 196, 177, 153, 140, 133, 130, 129),
}
CAT_BASE = {CAT1: 5, CAT2: 7, CAT3: 11, CAT4: 19, CAT5: 35, CAT6: 67}

COEF_BANDS = (0, 1, 2, 3, 6, 4, 5, 6, 6, 6, 6, 6, 6, 6, 6, 7)

ZIGZAG = (0, 1, 4, 8, 5, 2, 3, 6, 9, 12, 13, 10, 7, 11, 14, 15)

DC_QLOOKUP = (
    4, 5, 6, 7, 8, 9, 10, 10, 11, 12, 13, 14, 15, 16, 17, 17,
    18, 19, 20, 20, 21, 21, 22, 22, 23, 23, 24, 25, 25, 26, 27, 28,
    29, 30, 31, 32, 33, 34, 35, 36, 37, 37, 38, 39, 40, 41, 42, 43,
    44, 45, 46, 46, 47, 48, 49, 50, 51, 52, 53, 54, 55, 56, 57, 58,
    59, 60, 61, 62, 63, 64, 65, 66, 67, 68, 69, 70, 71, 72, 73, 74,
    75, 76, 76, 77, 78, 79, 80, 81, 82, 83, 84, 85, 86, 87, 88, 89,
    91, 93, 95, 96, 98, 100, 101, 102, 104, 106, 108, 110, 112, 114,
    116, 118, 122, 124, 126, 128, 130, 132, 134, 136, 138, 140, 143,
    145, 148, 151, 154, 157,
)
AC_QLOOKUP = (
    4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19,
    20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35,
    36, 37, 38, 39, 40, 41, 42, 43, 44, 45, 46, 47, 48, 49, 50, 51,
    52, 53, 54, 55, 56, 57, 58, 60, 62, 64, 66, 68, 70, 72, 74, 76,
    78, 80, 82, 84, 86, 88, 90, 92, 94, 96, 98, 100, 102, 104, 106,
    108, 110, 112, 114, 116, 119, 122, 125, 128, 131, 134, 137, 140,
    143, 146, 149, 152, 155, 158, 161, 164, 167, 170, 173, 177, 181,
    185, 189, 193, 197, 201, 205, 209, 213, 217, 221, 225, 229, 234,
    239, 245, 249, 254, 259, 264, 269, 274, 279, 284,
)

# default token probabilities [block_type][band][nz_context][node]
# (RFC 6386 section 13.5)
DEFAULT_COEF_PROBS = (
    (  # block type 0
        (
            (128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128),
            (128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128),
            (128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128),
        ),
        (
            (253, 136, 254, 255, 228, 219, 128, 128, 128, 128, 128),
            (189, 129, 242, 255, 227, 213, 255, 219, 128, 128, 128),
            (106, 126, 227, 252, 214, 209, 255, 255, 128, 128, 128),
        ),
        (
            (1, 98, 248, 255, 236, 226, 255, 255, 128, 128, 128),
            (181, 133, 238, 254, 221, 234, 255, 154, 128, 128, 128),
            (78, 134, 202, 247, 198, 180, 255, 219, 128, 128, 128),
        ),
        (
            (1, 185, 249, 255, 243, 255, 128, 128, 128, 128, 128),
            (184, 150, 247, 255, 236, 224, 128, 128, 128, 128, 128),
            (77, 110, 216, 255, 236, 230, 128, 128, 128, 128, 128),
        ),
        (
            (1, 101, 251, 255, 241, 255, 128, 128, 128, 128, 128),
            (170, 139, 241, 252, 236, 209, 255, 255, 128, 128, 128),
            (37, 116, 196, 243, 228, 255, 255, 255, 128, 128, 128),
        ),
        (
            (1, 204, 254, 255, 245, 255, 128, 128, 128, 128, 128),
            (207, 160, 250, 255, 238, 128, 128, 128, 128, 128, 128),
            (102, 103, 231, 255, 211, 171, 128, 128, 128, 128, 128),
        ),
        (
            (1, 152, 252, 255, 240, 255, 128, 128, 128, 128, 128),
            (177, 135, 243, 255, 234, 225, 128, 128, 128, 128, 128),
            (80, 129, 211, 255, 194, 224, 128, 128, 128, 128, 128),
        ),
        (
            (1, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128),
            (246, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128),
            (255, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128),
        ),
    ),
    (  # block type 1
        (
            (198, 35, 237, 223, 193, 187, 162, 160, 145, 155, 62),
            (131, 45, 198, 221, 172, 176, 220, 157, 252, 221, 1),
            (68, 47, 146, 208, 149, 167, 221, 162, 255, 223, 128),
        ),
        (
            (1, 149, 241, 255, 221, 224, 255, 255, 128, 128, 128),
            (184, 141, 234, 253, 222, 220, 255, 199, 128, 128, 128),
            (81, 99, 181, 242, 176, 190, 249, 202, 255, 255, 128),
        ),
        (
            (1, 129, 232, 253, 214, 197, 242, 196, 255, 255, 128),
            (99, 121, 210, 250, 201, 198, 255, 202, 128, 128, 128),
            (23, 91, 163, 242, 170, 187, 247, 210, 255, 255, 128),
        ),
        (
            (1, 200, 246, 255, 234, 255, 128, 128, 128, 128, 128),
            (109, 178, 241, 255, 231, 245, 255, 255, 128, 128, 128),
            (44, 130, 201, 253, 205, 192, 255, 255, 128, 128, 128),
        ),
        (
            (1, 132, 239, 251, 219, 209, 255, 165, 128, 128, 128),
            (94, 136, 225, 251, 218, 190, 255, 255, 128, 128, 128),
            (22, 100, 174, 245, 186, 161, 255, 199, 128, 128, 128),
        ),
        (
            (1, 182, 249, 255, 232, 235, 128, 128, 128, 128, 128),
            (124, 143, 241, 255, 227, 234, 128, 128, 128, 128, 128),
            (35, 77, 181, 251, 193, 211, 255, 205, 128, 128, 128),
        ),
        (
            (1, 157, 247, 255, 236, 231, 255, 255, 128, 128, 128),
            (121, 141, 235, 255, 225, 227, 255, 255, 128, 128, 128),
            (45, 99, 188, 251, 195, 217, 255, 224, 128, 128, 128),
        ),
        (
            (1, 1, 251, 255, 213, 255, 128, 128, 128, 128, 128),
            (203, 1, 248, 255, 255, 128, 128, 128, 128, 128, 128),
            (137, 1, 177, 255, 224, 255, 128, 128, 128, 128, 128),
        ),
    ),
    (  # block type 2
        (
            (253, 9, 248, 251, 207, 208, 255, 192, 128, 128, 128),
            (175, 13, 224, 243, 193, 185, 249, 198, 255, 255, 128),
            (73, 17, 171, 221, 161, 179, 236, 167, 255, 234, 128),
        ),
        (
            (1, 95, 247, 253, 212, 183, 255, 255, 128, 128, 128),
            (239, 90, 244, 250, 211, 209, 255, 255, 128, 128, 128),
            (155, 77, 195, 248, 188, 195, 255, 255, 128, 128, 128),
        ),
        (
            (1, 24, 239, 251, 218, 219, 255, 205, 128, 128, 128),
            (201, 51, 219, 255, 196, 186, 128, 128, 128, 128, 128),
            (69, 46, 190, 239, 201, 218, 255, 228, 128, 128, 128),
        ),
        (
            (1, 191, 251, 255, 255, 128, 128, 128, 128, 128, 128),
            (223, 165, 249, 255, 213, 255, 128, 128, 128, 128, 128),
            (141, 124, 248, 255, 255, 128, 128, 128, 128, 128, 128),
        ),
        (
            (1, 16, 248, 255, 255, 128, 128, 128, 128, 128, 128),
            (190, 36, 230, 255, 236, 255, 128, 128, 128, 128, 128),
            (149, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128),
        ),
        (
            (1, 226, 255, 128, 128, 128, 128, 128, 128, 128, 128),
            (247, 192, 255, 128, 128, 128, 128, 128, 128, 128, 128),
            (240, 128, 255, 128, 128, 128, 128, 128, 128, 128, 128),
        ),
        (
            (1, 134, 252, 255, 255, 128, 128, 128, 128, 128, 128),
            (213, 62, 250, 255, 255, 128, 128, 128, 128, 128, 128),
            (55, 93, 255, 128, 128, 128, 128, 128, 128, 128, 128),
        ),
        (
            (128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128),
            (128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128),
            (128, 128, 128, 128, 128, 128, 128, 128, 128, 128, 128),
        ),
    ),
    (  # block type 3
        (
            (202, 24, 213, 235, 186, 191, 220, 160, 240, 175, 255),
            (126, 38, 182, 232, 169, 184, 228, 174, 255, 187, 128),
            (61, 46, 138, 219, 151, 178, 240, 170, 255, 216, 128),
        ),
        (
            (1, 112, 230, 250, 199, 191, 247, 159, 255, 255, 128),
            (166, 109, 228, 252, 211, 215, 255, 174, 128, 128, 128),
            (39, 77, 162, 232, 172, 180, 245, 178, 255, 255, 128),
        ),
        (
            (1, 52, 220, 246, 198, 199, 249, 220, 255, 255, 128),
            (124, 74, 191, 243, 183, 193, 250, 221, 255, 255, 128),
            (24, 71, 130, 219, 154, 170, 243, 182, 255, 255, 128),
        ),
        (
            (1, 182, 225, 249, 219, 240, 255, 224, 128, 128, 128),
            (149, 150, 226, 252, 216, 205, 255, 171, 128, 128, 128),
            (28, 108, 170, 242, 183, 194, 254, 223, 255, 255, 128),
        ),
        (
            (1, 81, 230, 252, 204, 203, 255, 192, 128, 128, 128),
            (123, 102, 209, 247, 188, 196, 255, 233, 128, 128, 128),
            (20, 95, 153, 243, 164, 173, 255, 203, 128, 128, 128),
        ),
        (
            (1, 222, 248, 255, 216, 213, 128, 128, 128, 128, 128),
            (168, 175, 246, 252, 235, 205, 255, 255, 128, 128, 128),
            (47, 116, 215, 255, 211, 212, 255, 255, 128, 128, 128),
        ),
        (
            (1, 121, 236, 253, 212, 214, 255, 255, 128, 128, 128),
            (141, 84, 213, 252, 201, 202, 255, 219, 128, 128, 128),
            (42, 80, 160, 240, 162, 185, 255, 205, 128, 128, 128),
        ),
        (
            (1, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128),
            (244, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128),
            (238, 1, 255, 128, 128, 128, 128, 128, 128, 128, 128),
        ),
    ),
)

# probabilities that each token probability is UPDATED in the header
# (RFC 6386 section 13.4)
COEF_UPDATE_PROBS = (
    (  # block type 0
        (
            (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
            (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
            (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
        ),
        (
            (176, 246, 255, 255, 255, 255, 255, 255, 255, 255, 255),
            (223, 241, 252, 255, 255, 255, 255, 255, 255, 255, 255),
            (249, 253, 253, 255, 255, 255, 255, 255, 255, 255, 255),
        ),
        (
            (255, 244, 252, 255, 255, 255, 255, 255, 255, 255, 255),
            (234, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255),
            (253, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
        ),
        (
            (255, 246, 254, 255, 255, 255, 255, 255, 255, 255, 255),
            (239, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255),
            (254, 255, 254, 255, 255, 255, 255, 255, 255, 255, 255),
        ),
        (
            (255, 248, 254, 255, 255, 255, 255, 255, 255, 255, 255),
            (251, 255, 254, 255, 255, 255, 255, 255, 255, 255, 255),
            (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
        ),
        (
            (255, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255),
            (251, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255),
            (254, 255, 254, 255, 255, 255, 255, 255, 255, 255, 255),
        ),
        (
            (255, 254, 253, 255, 254, 255, 255, 255, 255, 255, 255),
            (250, 255, 254, 255, 254, 255, 255, 255, 255, 255, 255),
            (254, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
        ),
        (
            (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
            (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
            (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
        ),
    ),
    (  # block type 1
        (
            (217, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
            (225, 252, 241, 253, 255, 255, 254, 255, 255, 255, 255),
            (234, 250, 241, 250, 253, 255, 253, 254, 255, 255, 255),
        ),
        (
            (255, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255),
            (223, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255),
            (238, 253, 254, 254, 255, 255, 255, 255, 255, 255, 255),
        ),
        (
            (255, 248, 254, 255, 255, 255, 255, 255, 255, 255, 255),
            (249, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255),
            (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
        ),
        (
            (255, 253, 255, 255, 255, 255, 255, 255, 255, 255, 255),
            (247, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255),
            (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
        ),
        (
            (255, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255),
            (252, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
            (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
        ),
        (
            (255, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255),
            (253, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
            (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
        ),
        (
            (255, 254, 253, 255, 255, 255, 255, 255, 255, 255, 255),
            (250, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
            (254, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
        ),
        (
            (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
            (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
            (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
        ),
    ),
    (  # block type 2
        (
            (186, 251, 250, 255, 255, 255, 255, 255, 255, 255, 255),
            (234, 251, 244, 254, 255, 255, 255, 255, 255, 255, 255),
            (251, 251, 243, 253, 254, 255, 254, 255, 255, 255, 255),
        ),
        (
            (255, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255),
            (236, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255),
            (251, 253, 253, 254, 254, 255, 255, 255, 255, 255, 255),
        ),
        (
            (255, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255),
            (254, 254, 254, 255, 255, 255, 255, 255, 255, 255, 255),
            (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
        ),
        (
            (255, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255),
            (254, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255),
            (254, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
        ),
        (
            (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
            (254, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
            (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
        ),
        (
            (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
            (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
            (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
        ),
        (
            (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
            (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
            (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
        ),
        (
            (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
            (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
            (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
        ),
    ),
    (  # block type 3
        (
            (248, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
            (250, 254, 252, 254, 255, 255, 255, 255, 255, 255, 255),
            (248, 254, 249, 253, 255, 255, 255, 255, 255, 255, 255),
        ),
        (
            (255, 253, 253, 255, 255, 255, 255, 255, 255, 255, 255),
            (246, 253, 253, 255, 255, 255, 255, 255, 255, 255, 255),
            (252, 254, 251, 254, 254, 255, 255, 255, 255, 255, 255),
        ),
        (
            (255, 254, 252, 255, 255, 255, 255, 255, 255, 255, 255),
            (248, 254, 253, 255, 255, 255, 255, 255, 255, 255, 255),
            (253, 255, 254, 254, 255, 255, 255, 255, 255, 255, 255),
        ),
        (
            (255, 251, 254, 255, 255, 255, 255, 255, 255, 255, 255),
            (245, 251, 254, 255, 255, 255, 255, 255, 255, 255, 255),
            (253, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255),
        ),
        (
            (255, 251, 253, 255, 255, 255, 255, 255, 255, 255, 255),
            (252, 253, 254, 255, 255, 255, 255, 255, 255, 255, 255),
            (255, 254, 255, 255, 255, 255, 255, 255, 255, 255, 255),
        ),
        (
            (255, 252, 255, 255, 255, 255, 255, 255, 255, 255, 255),
            (249, 255, 254, 255, 255, 255, 255, 255, 255, 255, 255),
            (255, 255, 254, 255, 255, 255, 255, 255, 255, 255, 255),
        ),
        (
            (255, 255, 253, 255, 255, 255, 255, 255, 255, 255, 255),
            (250, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
            (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
        ),
        (
            (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
            (254, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
            (255, 255, 255, 255, 255, 255, 255, 255, 255, 255, 255),
        ),
    ),
)


# key-frame 4x4 sub-mode probabilities [above][left][9] (RFC 6386
# section 11.5) — defined at the bottom of this file for readability
KF_BMODE_PROB: tuple = ()  # assigned below


# ---------------------------------------------------------------------------
# Frame header (RFC 6386 sections 9 and 19.2) — key frames only


class _FrameHeader:
    __slots__ = (
        "width", "height", "mb_w", "mb_h",
        "segmentation_enabled", "update_mb_segmentation_map",
        "segment_abs", "segment_quant", "segment_lf", "segment_tree_probs",
        "filter_type", "filter_level", "sharpness",
        "lf_delta_enabled", "ref_lf_deltas", "mode_lf_deltas",
        "n_partitions", "q_index", "q_deltas",
        "coef_probs", "mb_no_skip", "prob_skip_false",
        "mb_ymodes", "mb_bmodes", "mb_uvmodes", "mb_skip", "mb_segment",
    )


def _parse_header_and_modes(bd: BoolDecoder, mb_w: int, mb_h: int) -> _FrameHeader:
    h = _FrameHeader()
    h.mb_w, h.mb_h = mb_w, mb_h
    bd.literal(1)  # color space (must be 0 for this profile; tolerated)
    bd.literal(1)  # clamping type
    h.segmentation_enabled = bd.literal(1)
    h.update_mb_segmentation_map = 0
    h.segment_quant = [0, 0, 0, 0]
    h.segment_lf = [0, 0, 0, 0]
    h.segment_abs = 0
    h.segment_tree_probs = [255, 255, 255]
    if h.segmentation_enabled:
        h.update_mb_segmentation_map = bd.literal(1)
        update_data = bd.literal(1)
        if update_data:
            h.segment_abs = bd.literal(1)
            for i in range(4):
                if bd.literal(1):
                    h.segment_quant[i] = bd.signed_literal(7)
            for i in range(4):
                if bd.literal(1):
                    h.segment_lf[i] = bd.signed_literal(6)
        if h.update_mb_segmentation_map:
            for i in range(3):
                h.segment_tree_probs[i] = bd.literal(8) if bd.literal(1) else 255
    h.filter_type = bd.literal(1)
    h.filter_level = bd.literal(6)
    h.sharpness = bd.literal(3)
    h.lf_delta_enabled = bd.literal(1)
    h.ref_lf_deltas = [0, 0, 0, 0]
    h.mode_lf_deltas = [0, 0, 0, 0]
    if h.lf_delta_enabled:
        if bd.literal(1):  # deltas updated this frame
            for i in range(4):
                if bd.literal(1):
                    h.ref_lf_deltas[i] = bd.signed_literal(6)
            for i in range(4):
                if bd.literal(1):
                    h.mode_lf_deltas[i] = bd.signed_literal(6)
    h.n_partitions = 1 << bd.literal(2)
    h.q_index = bd.literal(7)
    h.q_deltas = [bd.signed_literal(4) if bd.literal(1) else 0 for _ in range(5)]
    bd.literal(1)  # refresh entropy probs (key frame: value irrelevant here)
    # token probability updates
    probs = [
        [[list(ctx) for ctx in band] for band in btype]
        for btype in DEFAULT_COEF_PROBS
    ]
    for i in range(4):
        for j in range(8):
            for k in range(3):
                for l in range(11):
                    if bd.bool(COEF_UPDATE_PROBS[i][j][k][l]):
                        probs[i][j][k][l] = bd.literal(8)
    h.coef_probs = probs
    h.mb_no_skip = bd.literal(1)
    h.prob_skip_false = bd.literal(8) if h.mb_no_skip else 0

    # per-macroblock mode records (still the first partition)
    n = mb_w * mb_h
    h.mb_ymodes = [0] * n
    h.mb_uvmodes = [0] * n
    h.mb_skip = [0] * n
    h.mb_segment = [0] * n
    h.mb_bmodes = [None] * n
    # B_PRED context rows: above[mb_w*4] and per-row left[4]
    above_modes = [B_DC_PRED] * (mb_w * 4)
    for my in range(mb_h):
        left_modes = [B_DC_PRED] * 4
        for mx in range(mb_w):
            idx = my * mb_w + mx
            if h.update_mb_segmentation_map:
                h.mb_segment[idx] = bd.tree(MB_SEGMENT_TREE, h.segment_tree_probs)
            if h.mb_no_skip:
                h.mb_skip[idx] = bd.bool(h.prob_skip_false)
            ymode = bd.tree(KF_YMODE_TREE, KF_YMODE_PROB)
            h.mb_ymodes[idx] = ymode
            if ymode == B_PRED:
                bmodes = [0] * 16
                for sb in range(16):
                    sy, sx = sb >> 2, sb & 3
                    above = above_modes[mx * 4 + sx] if sy == 0 else bmodes[sb - 4]
                    left = left_modes[sy] if sx == 0 else bmodes[sb - 1]
                    bmodes[sb] = bd.tree(BMODE_TREE, KF_BMODE_PROB[above][left])
                h.mb_bmodes[idx] = bmodes
                for sx in range(4):
                    above_modes[mx * 4 + sx] = bmodes[12 + sx]
                for sy in range(4):
                    left_modes[sy] = bmodes[sy * 4 + 3]
            else:
                # implied sub-modes for the B-mode prediction context
                implied = {
                    DC_PRED: B_DC_PRED, V_PRED: B_VE_PRED,
                    H_PRED: B_HE_PRED, TM_PRED: B_TM_PRED,
                }[ymode]
                for sx in range(4):
                    above_modes[mx * 4 + sx] = implied
                for sy in range(4):
                    left_modes[sy] = implied
            h.mb_uvmodes[idx] = bd.tree(UV_MODE_TREE, KF_UV_MODE_PROB)
    return h


# ---------------------------------------------------------------------------
# Residual (token) decode — RFC 6386 section 13


def _decode_block_coeffs(bd, plane_probs, ctx, first, qdc, qac):
    """One 4x4 block's dequantized coefficients in raster order, plus
    the has-nonzero flag that becomes the neighbor context."""
    coeffs = [0] * 16
    i = first
    nonzero = False
    p = plane_probs[COEF_BANDS[i]][ctx]
    skip_eob = False
    while i < 16:
        if skip_eob:
            token = bd.tree_from(COEF_TREE, p, 2)
        else:
            token = bd.tree(COEF_TREE, p)
        if token == DCT_EOB:
            break
        if token == DCT_0:
            skip_eob = True
            i += 1
            if i < 16:
                p = plane_probs[COEF_BANDS[i]][0]
            continue
        skip_eob = False
        if token <= DCT_4:
            v = token  # DCT_1..DCT_4 encode magnitudes 1..4
        else:
            bits = 0
            for prob in CAT_PROBS[token]:
                bits = (bits << 1) | bd.bool(prob)
            v = CAT_BASE[token] + bits
        if bd.bool(128):
            v = -v
        coeffs[ZIGZAG[i]] = v * (qdc if i == 0 else qac)
        nonzero = True
        ctx = 2 if abs(v) > 1 else 1
        i += 1
        if i < 16:
            p = plane_probs[COEF_BANDS[i]][ctx]
    return coeffs, nonzero


# ---------------------------------------------------------------------------
# Inverse transforms — RFC 6386 section 14.3


def _idct4x4(ip):
    op = [0] * 16
    for i in range(4):
        a1 = ip[i] + ip[8 + i]
        b1 = ip[i] - ip[8 + i]
        t1 = (ip[4 + i] * 35468) >> 16
        t2 = ip[12 + i] + ((ip[12 + i] * 20091) >> 16)
        c1 = t1 - t2
        t1 = ip[4 + i] + ((ip[4 + i] * 20091) >> 16)
        t2 = (ip[12 + i] * 35468) >> 16
        d1 = t1 + t2
        op[i] = a1 + d1
        op[12 + i] = a1 - d1
        op[4 + i] = b1 + c1
        op[8 + i] = b1 - c1
    out = [0] * 16
    for i in range(4):
        r = 4 * i
        a1 = op[r] + op[r + 2]
        b1 = op[r] - op[r + 2]
        t1 = (op[r + 1] * 35468) >> 16
        t2 = op[r + 3] + ((op[r + 3] * 20091) >> 16)
        c1 = t1 - t2
        t1 = op[r + 1] + ((op[r + 1] * 20091) >> 16)
        t2 = (op[r + 3] * 35468) >> 16
        d1 = t1 + t2
        out[r] = (a1 + d1 + 4) >> 3
        out[r + 3] = (a1 - d1 + 4) >> 3
        out[r + 1] = (b1 + c1 + 4) >> 3
        out[r + 2] = (b1 - c1 + 4) >> 3
    return out


def _iwht4x4(ip):
    op = [0] * 16
    for i in range(4):
        a1 = ip[i] + ip[12 + i]
        b1 = ip[4 + i] + ip[8 + i]
        c1 = ip[4 + i] - ip[8 + i]
        d1 = ip[i] - ip[12 + i]
        op[i] = a1 + b1
        op[4 + i] = c1 + d1
        op[8 + i] = a1 - b1
        op[12 + i] = d1 - c1
    out = [0] * 16
    for i in range(4):
        r = 4 * i
        a1 = op[r] + op[r + 3]
        b1 = op[r + 1] + op[r + 2]
        c1 = op[r + 1] - op[r + 2]
        d1 = op[r] - op[r + 3]
        out[r] = (a1 + b1 + 3) >> 3
        out[r + 1] = (c1 + d1 + 3) >> 3
        out[r + 2] = (a1 - b1 + 3) >> 3
        out[r + 3] = (d1 - c1 + 3) >> 3
    return out


# ---------------------------------------------------------------------------
# Intra prediction (RFC 6386 section 12). Frame borders follow the
# reference decoder's buffer init: rows above the frame read 127, the
# column left of the frame reads 129, and the above-left corner is 127
# on the top row / 129 further down.


def _edge_above(plane, x0, y0, n):
    if y0 > 0:
        return [int(v) for v in plane[y0 - 1, x0 : x0 + n]]
    return [127] * n


def _edge_left(plane, x0, y0, n):
    if x0 > 0:
        return [int(v) for v in plane[y0 : y0 + n, x0 - 1]]
    return [129] * n


def _edge_corner(plane, x0, y0):
    if y0 == 0:
        return 127
    if x0 == 0:
        return 129
    return int(plane[y0 - 1, x0 - 1])


def _clamp255(a):
    return np.clip(a, 0, 255)


def _predict_square(plane, x0, y0, size, mode):
    """16x16 luma / 8x8 chroma whole-block predictor (DC/V/H/TM)."""
    above = _edge_above(plane, x0, y0, size)
    left = _edge_left(plane, x0, y0, size)
    if mode == V_PRED:
        return np.tile(np.array(above, dtype=np.int32), (size, 1))
    if mode == H_PRED:
        return np.tile(np.array(left, dtype=np.int32).reshape(size, 1), (1, size))
    if mode == TM_PRED:
        p = _edge_corner(plane, x0, y0)
        a = np.array(above, dtype=np.int32)[None, :]
        l = np.array(left, dtype=np.int32)[:, None]
        return _clamp255(l + a - p)
    # DC with the spec's edge fallbacks
    shift = {16: 5, 8: 4}[size]
    if y0 > 0 and x0 > 0:
        dc = (sum(above) + sum(left) + (1 << (shift - 1))) >> shift
    elif y0 > 0:
        dc = (sum(above) + (size >> 1)) >> (shift - 1)
    elif x0 > 0:
        dc = (sum(left) + (size >> 1)) >> (shift - 1)
    else:
        dc = 128
    return np.full((size, size), dc, dtype=np.int32)


def _avg2(a, b):
    return (a + b + 1) >> 1


def _avg3(a, b, c):
    return (a + 2 * b + c + 2) >> 2


def _predict_b(mode, A, AR, L, P):
    """4x4 sub-block predictor; A=above[4], AR=above-right[4],
    L=left[4], P=above-left. Returns a 4x4 int list-of-rows."""
    d = [[0] * 4 for _ in range(4)]
    T = A + AR  # 8 above pixels
    if mode == B_DC_PRED:
        v = (sum(A) + sum(L) + 4) >> 3
        return [[v] * 4 for _ in range(4)]
    if mode == B_TM_PRED:
        return [
            [max(0, min(255, L[r] + A[c] - P)) for c in range(4)] for r in range(4)
        ]
    if mode == B_VE_PRED:
        row = [
            _avg3(P, T[0], T[1]),
            _avg3(T[0], T[1], T[2]),
            _avg3(T[1], T[2], T[3]),
            _avg3(T[2], T[3], T[4]),
        ]
        return [row[:] for _ in range(4)]
    if mode == B_HE_PRED:
        I, J, K, Lp = L
        vals = [_avg3(P, I, J), _avg3(I, J, K), _avg3(J, K, Lp), _avg3(K, Lp, Lp)]
        return [[v] * 4 for v in vals]
    if mode == B_LD_PRED:
        for r in range(4):
            for c in range(4):
                i = r + c
                if i < 6:
                    d[r][c] = _avg3(T[i], T[i + 1], T[i + 2])
                else:
                    d[r][c] = _avg3(T[6], T[7], T[7])
        return d
    I, J, K, Lp = L
    if mode == B_RD_PRED:
        edge = [Lp, K, J, I, P, T[0], T[1], T[2], T[3]]
        for r in range(4):
            for c in range(4):
                i = 4 + c - r
                d[r][c] = _avg3(edge[i - 1], edge[i], edge[i + 1])
        return d
    if mode == B_VR_PRED:
        Aq, B, C, D = A
        d[0][0] = d[2][1] = _avg2(P, Aq)
        d[0][1] = d[2][2] = _avg2(Aq, B)
        d[0][2] = d[2][3] = _avg2(B, C)
        d[0][3] = _avg2(C, D)
        d[3][0] = _avg3(K, J, I)
        d[2][0] = _avg3(J, I, P)
        d[1][0] = d[3][1] = _avg3(I, P, Aq)
        d[1][1] = d[3][2] = _avg3(P, Aq, B)
        d[1][2] = d[3][3] = _avg3(Aq, B, C)
        d[1][3] = _avg3(B, C, D)
        return d
    if mode == B_VL_PRED:
        d[0][0] = _avg2(T[0], T[1])
        d[0][1] = d[2][0] = _avg2(T[1], T[2])
        d[0][2] = d[2][1] = _avg2(T[2], T[3])
        d[0][3] = d[2][2] = _avg2(T[3], T[4])
        d[1][0] = _avg3(T[0], T[1], T[2])
        d[1][1] = d[3][0] = _avg3(T[1], T[2], T[3])
        d[1][2] = d[3][1] = _avg3(T[2], T[3], T[4])
        d[1][3] = d[3][2] = _avg3(T[3], T[4], T[5])
        d[2][3] = _avg3(T[4], T[5], T[6])
        d[3][3] = _avg3(T[5], T[6], T[7])
        return d
    if mode == B_HD_PRED:
        d[0][0] = d[1][2] = _avg2(I, P)
        d[0][1] = d[1][3] = _avg3(I, P, A[0])
        d[0][2] = _avg3(P, A[0], A[1])
        d[0][3] = _avg3(A[0], A[1], A[2])
        d[1][0] = d[2][2] = _avg2(J, I)
        d[1][1] = d[2][3] = _avg3(J, I, P)
        d[2][0] = d[3][2] = _avg2(K, J)
        d[2][1] = d[3][3] = _avg3(K, J, I)
        d[3][0] = _avg2(Lp, K)
        d[3][1] = _avg3(Lp, K, J)
        return d
    if mode == B_HU_PRED:
        d[0][0] = _avg2(I, J)
        d[0][1] = _avg3(I, J, K)
        d[0][2] = d[1][0] = _avg2(J, K)
        d[0][3] = d[1][1] = _avg3(J, K, Lp)
        d[1][2] = d[2][0] = _avg2(K, Lp)
        d[1][3] = d[2][1] = _avg3(K, Lp, Lp)
        d[2][2] = d[2][3] = d[3][0] = d[3][1] = d[3][2] = d[3][3] = Lp
        return d
    raise ValueError(f"VP8: bad sub-block mode {mode}")


# ---------------------------------------------------------------------------
# Frame decode


#: Same header-bomb guard as ops/vp8l.py: a crafted header can declare
#: huge dimensions and stall the pure-Python per-MB loops.
VP8_MAX_PIXELS = 4 * 1024 * 1024


def decode_vp8_frame(data: bytes):
    """Decode a VP8 chunk payload (key frame) to (y, u, v) uint8 numpy
    planes (cropped to the visible size) — RFC 6386 intra path."""
    if len(data) < 10:
        raise ValueError("VP8: truncated frame")
    tag = int.from_bytes(data[0:3], "little")
    if tag & 1:
        raise ValueError("VP8: interframe in a still image container")
    part1_size = tag >> 5
    if data[3:6] != b"\x9d\x01\x2a":
        raise ValueError("VP8: bad keyframe start code")
    w = int.from_bytes(data[6:8], "little") & 0x3FFF
    h = int.from_bytes(data[8:10], "little") & 0x3FFF
    if w == 0 or h == 0:
        raise ValueError("VP8: zero dimension")
    if w * h > VP8_MAX_PIXELS:
        raise ValueError(
            f"VP8: declared {w}x{h} exceeds the {VP8_MAX_PIXELS}-pixel "
            "decode cap (header-bomb guard)"
        )
    mb_w, mb_h = (w + 15) // 16, (h + 15) // 16
    if 10 + part1_size > len(data):
        raise ValueError("VP8: first partition overruns payload")
    bd = BoolDecoder(data[10 : 10 + part1_size])
    hdr = _parse_header_and_modes(bd, mb_w, mb_h)
    if bd.pos > part1_size + 8:
        raise ValueError("VP8: header decode overran the first partition")

    pos = 10 + part1_size
    n_parts = hdr.n_partitions
    sizes = []
    if n_parts > 1:
        for i in range(n_parts - 1):
            sizes.append(int.from_bytes(data[pos + 3 * i : pos + 3 * i + 3], "little"))
        pos += 3 * (n_parts - 1)
    parts = []
    for i in range(n_parts):
        if i < n_parts - 1:
            if pos + sizes[i] > len(data):
                raise ValueError("VP8: token partition overruns payload")
            parts.append(BoolDecoder(data[pos : pos + sizes[i]]))
            pos += sizes[i]
        else:
            parts.append(BoolDecoder(data[pos:]))

    def _clq(x):
        return max(0, min(127, x))

    def _quants(base_q):
        d = hdr.q_deltas  # y1dc, y2dc, y2ac, uvdc, uvac
        y_dc = DC_QLOOKUP[_clq(base_q + d[0])]
        y_ac = AC_QLOOKUP[_clq(base_q)]
        y2_dc = DC_QLOOKUP[_clq(base_q + d[1])] * 2
        y2_ac = max(8, AC_QLOOKUP[_clq(base_q + d[2])] * 155 // 100)
        uv_dc = min(132, DC_QLOOKUP[_clq(base_q + d[3])])
        uv_ac = AC_QLOOKUP[_clq(base_q + d[4])]
        return y_dc, y_ac, y2_dc, y2_ac, uv_dc, uv_ac

    seg_quants = []
    for s in range(4):
        if hdr.segmentation_enabled:
            q = hdr.segment_quant[s] if hdr.segment_abs else hdr.q_index + hdr.segment_quant[s]
        else:
            q = hdr.q_index
        seg_quants.append(_quants(q))

    Y = np.zeros((mb_h * 16, mb_w * 16), dtype=np.int32)
    U = np.zeros((mb_h * 8, mb_w * 8), dtype=np.int32)
    V = np.zeros((mb_h * 8, mb_w * 8), dtype=np.int32)

    # nonzero contexts
    above_y = [0] * (mb_w * 4)
    above_u = [0] * (mb_w * 2)
    above_v = [0] * (mb_w * 2)
    above_y2 = [0] * mb_w
    mb_has_coeffs = [False] * (mb_w * mb_h)

    for mby in range(mb_h):
        left_y = [0] * 4
        left_u = [0] * 2
        left_v = [0] * 2
        left_y2 = 0
        td = parts[mby % n_parts]
        for mbx in range(mb_w):
            idx = mby * mb_w + mbx
            ymode = hdr.mb_ymodes[idx]
            has_y2 = ymode != B_PRED
            y_dc, y_ac, y2_dc, y2_ac, uv_dc, uv_ac = seg_quants[hdr.mb_segment[idx]]
            y_blocks = [[0] * 16 for _ in range(16)]
            u_blocks = [[0] * 16 for _ in range(4)]
            v_blocks = [[0] * 16 for _ in range(4)]
            any_coeff = False
            if hdr.mb_skip[idx]:
                for i in range(4):
                    above_y[mbx * 4 + i] = 0
                    left_y[i] = 0
                for i in range(2):
                    above_u[mbx * 2 + i] = 0
                    left_u[i] = 0
                    above_v[mbx * 2 + i] = 0
                    left_v[i] = 0
                if has_y2:
                    above_y2[mbx] = 0
                    left_y2 = 0
            else:
                if has_y2:
                    ctx = above_y2[mbx] + left_y2
                    c2, nz = _decode_block_coeffs(
                        td, hdr.coef_probs[1], ctx, 0, y2_dc, y2_ac
                    )
                    above_y2[mbx] = left_y2 = 1 if nz else 0
                    dc_vals = _iwht4x4(c2)
                    any_coeff |= nz
                    plane_y, first = 0, 1
                else:
                    dc_vals = None
                    plane_y, first = 3, 0
                for sb in range(16):
                    sy, sx = sb >> 2, sb & 3
                    ctx = above_y[mbx * 4 + sx] + left_y[sy]
                    coeffs, nz = _decode_block_coeffs(
                        td, hdr.coef_probs[plane_y], ctx, first, y_dc, y_ac
                    )
                    above_y[mbx * 4 + sx] = left_y[sy] = 1 if nz else 0
                    if dc_vals is not None:
                        coeffs[0] = dc_vals[sb]
                    y_blocks[sb] = coeffs
                    any_coeff |= nz or (dc_vals is not None and dc_vals[sb] != 0)
                for plane, blocks, above_c, left_c in (
                    (U, u_blocks, above_u, left_u),
                    (V, v_blocks, above_v, left_v),
                ):
                    for sb in range(4):
                        sy, sx = sb >> 1, sb & 1
                        ctx = above_c[mbx * 2 + sx] + left_c[sy]
                        coeffs, nz = _decode_block_coeffs(
                            td, hdr.coef_probs[2], ctx, 0, uv_dc, uv_ac
                        )
                        above_c[mbx * 2 + sx] = left_c[sy] = 1 if nz else 0
                        blocks[sb] = coeffs
                        any_coeff |= nz
            mb_has_coeffs[idx] = any_coeff

            # ---- reconstruction
            x0, y0 = mbx * 16, mby * 16
            if ymode != B_PRED:
                Y[y0 : y0 + 16, x0 : x0 + 16] = _predict_square(Y, x0, y0, 16, ymode)
                if not hdr.mb_skip[idx]:
                    for sb in range(16):
                        sy, sx = sb >> 2, sb & 3
                        res = np.array(
                            _idct4x4(y_blocks[sb]), dtype=np.int32
                        ).reshape(4, 4)
                        yy, xx = y0 + sy * 4, x0 + sx * 4
                        Y[yy : yy + 4, xx : xx + 4] = _clamp255(
                            Y[yy : yy + 4, xx : xx + 4] + res
                        )
            else:
                for sb in range(16):
                    sy, sx = sb >> 2, sb & 3
                    yy, xx = y0 + sy * 4, x0 + sx * 4
                    A = _edge_above(Y, xx, yy, 4)
                    L = _edge_left(Y, xx, yy, 4)
                    P = _edge_corner(Y, xx, yy)
                    # above-right: right-edge sub-blocks always read the
                    # row ABOVE the macroblock; at the frame's right edge
                    # the reference decoder replicates the last above
                    # pixel (127 on the top row).
                    ar_row = y0 - 1 if sx == 3 else yy - 1
                    ar_x = xx + 4
                    W_px = mb_w * 16
                    if ar_row < 0:
                        AR = [127] * 4
                    elif ar_x + 4 <= W_px:
                        AR = [int(v) for v in Y[ar_row, ar_x : ar_x + 4]]
                    else:
                        AR = [int(Y[ar_row, W_px - 1])] * 4
                    pred = np.array(
                        _predict_b(hdr.mb_bmodes[idx][sb], A, AR, L, P),
                        dtype=np.int32,
                    )
                    if not hdr.mb_skip[idx]:
                        res = np.array(
                            _idct4x4(y_blocks[sb]), dtype=np.int32
                        ).reshape(4, 4)
                        pred = pred + res
                    Y[yy : yy + 4, xx : xx + 4] = _clamp255(pred)
            cx0, cy0 = mbx * 8, mby * 8
            uvmode = hdr.mb_uvmodes[idx]
            for plane, blocks in ((U, u_blocks), (V, v_blocks)):
                plane[cy0 : cy0 + 8, cx0 : cx0 + 8] = _predict_square(
                    plane, cx0, cy0, 8, uvmode
                )
                if not hdr.mb_skip[idx]:
                    for sb in range(4):
                        sy, sx = sb >> 1, sb & 1
                        res = np.array(
                            _idct4x4(blocks[sb]), dtype=np.int32
                        ).reshape(4, 4)
                        yy, xx = cy0 + sy * 4, cx0 + sx * 4
                        plane[yy : yy + 4, xx : xx + 4] = _clamp255(
                            plane[yy : yy + 4, xx : xx + 4] + res
                        )

    if hdr.filter_level > 0:
        _loop_filter_frame(Y, U, V, hdr, mb_has_coeffs)

    return (
        Y[:h, :w].astype(np.uint8),
        U[: (h + 1) // 2, : (w + 1) // 2].astype(np.uint8),
        V[: (h + 1) // 2, : (w + 1) // 2].astype(np.uint8),
    )


# ---------------------------------------------------------------------------
# In-loop deblocking (RFC 6386 section 15), vectorized along each edge


def _cs(a):
    return np.clip(a, -128, 127)


def _common_adjust(use_outer, px, x, y):
    """The shared filter core. ``px`` maps names p1,p0,q0,q1 to signed
    int32 arrays (pixel-128); mutates them in place; returns F."""
    p1, p0, q0, q1 = px
    a = _cs(np.where(use_outer, _cs(p1 - q1), 0) + 3 * (q0 - p0))
    F = _cs(a + 4) >> 3
    E = _cs(a + 3) >> 3
    q0 -= np.where(x, F, 0)
    p0 += np.where(x, E, 0)
    return F


def _filter_mask(limit, interior, p3, p2, p1, p0, q0, q1, q2, q3):
    return (
        (np.abs(p0 - q0) * 2 + np.abs(p1 - q1) // 2 <= limit)
        & (np.abs(p3 - p2) <= interior)
        & (np.abs(p2 - p1) <= interior)
        & (np.abs(p1 - p0) <= interior)
        & (np.abs(q1 - q0) <= interior)
        & (np.abs(q2 - q1) <= interior)
        & (np.abs(q3 - q2) <= interior)
    )


def _apply_normal_filter(pix, is_mb_edge, limit, interior, hev_t):
    """pix: int32 array (8, N) of p3..q3 as UNSIGNED values; filters in
    place per the normal loop filter."""
    s = [row - 128 for row in pix]  # signed copies
    p3, p2, p1, p0, q0, q1, q2, q3 = s
    mask = _filter_mask(limit, interior, *s)
    hev = (np.abs(p1 - p0) > hev_t) | (np.abs(q1 - q0) > hev_t)
    if is_mb_edge:
        w = _cs(_cs(p1 - q1) + 3 * (q0 - p0))
        big = mask & ~hev
        a = _cs((27 * w + 63) >> 7)
        q0 -= np.where(big, a, 0)
        p0 += np.where(big, a, 0)
        a = _cs((18 * w + 63) >> 7)
        q1 -= np.where(big, a, 0)
        p1 += np.where(big, a, 0)
        a = _cs((9 * w + 63) >> 7)
        q2 -= np.where(big, a, 0)
        p2 += np.where(big, a, 0)
        _common_adjust(True, (p1, p0, q0, q1), mask & hev, None)
    else:
        F = _common_adjust(hev, (p1, p0, q0, q1), mask, None)
        a = (F + 1) >> 1
        small = mask & ~hev
        q1 -= np.where(small, a, 0)
        p1 += np.where(small, a, 0)
    for i, row in enumerate((p3, p2, p1, p0, q0, q1, q2, q3)):
        pix[i] = np.clip(row + 128, 0, 255)


def _apply_simple_filter(pix, limit):
    s = [row - 128 for row in pix]
    p1, p0, q0, q1 = s[2], s[3], s[4], s[5]
    mask = np.abs(p0 - q0) * 2 + np.abs(p1 - q1) // 2 <= limit
    _common_adjust(True, (p1, p0, q0, q1), mask, None)
    pix[3] = np.clip(p0 + 128, 0, 255)
    pix[4] = np.clip(q0 + 128, 0, 255)


def _filter_v_edge(plane, x, y0, n, is_mb_edge, limit, interior, hev_t, simple):
    pix = [plane[y0 : y0 + n, x + o].astype(np.int32) for o in range(-4, 4)]
    if simple:
        _apply_simple_filter(pix, limit)
    else:
        _apply_normal_filter(pix, is_mb_edge, limit, interior, hev_t)
    for o in range(-4, 4):
        plane[y0 : y0 + n, x + o] = pix[o + 4]


def _filter_h_edge(plane, x0, y, n, is_mb_edge, limit, interior, hev_t, simple):
    pix = [plane[y + o, x0 : x0 + n].astype(np.int32) for o in range(-4, 4)]
    if simple:
        _apply_simple_filter(pix, limit)
    else:
        _apply_normal_filter(pix, is_mb_edge, limit, interior, hev_t)
    for o in range(-4, 4):
        plane[y + o, x0 : x0 + n] = pix[o + 4]


def _loop_filter_frame(Y, U, V, hdr, mb_has_coeffs):
    simple = hdr.filter_type == 1
    for mby in range(hdr.mb_h):
        for mbx in range(hdr.mb_w):
            idx = mby * hdr.mb_w + mbx
            ymode = hdr.mb_ymodes[idx]
            level = hdr.filter_level
            if hdr.segmentation_enabled:
                s = hdr.mb_segment[idx]
                level = (
                    hdr.segment_lf[s]
                    if hdr.segment_abs
                    else level + hdr.segment_lf[s]
                )
            if hdr.lf_delta_enabled:
                level += hdr.ref_lf_deltas[0]  # intra frame
                if ymode == B_PRED:
                    level += hdr.mode_lf_deltas[0]
            level = max(0, min(63, level))
            if level == 0:
                continue
            interior = level
            if hdr.sharpness:
                interior >>= 1 if hdr.sharpness <= 4 else 2
                interior = min(interior, 9 - hdr.sharpness)
            interior = max(interior, 1)
            # key-frame high-edge-variance thresholds (boundary is 15,
            # not 16 — found via the bit-exact libwebp conformance test)
            hev_t = 2 if level >= 40 else (1 if level >= 15 else 0)
            mb_lim = ((level + 2) * 2) + interior
            sub_lim = (level * 2) + interior
            inner = mb_has_coeffs[idx] or ymode == B_PRED
            x0, y0 = mbx * 16, mby * 16
            cx0, cy0 = mbx * 8, mby * 8
            if mbx > 0:
                _filter_v_edge(Y, x0, y0, 16, True, mb_lim, interior, hev_t, simple)
                if not simple:
                    _filter_v_edge(U, cx0, cy0, 8, True, mb_lim, interior, hev_t, False)
                    _filter_v_edge(V, cx0, cy0, 8, True, mb_lim, interior, hev_t, False)
            if inner:
                for sx in (4, 8, 12):
                    _filter_v_edge(
                        Y, x0 + sx, y0, 16, False, sub_lim, interior, hev_t, simple
                    )
                if not simple:
                    _filter_v_edge(
                        U, cx0 + 4, cy0, 8, False, sub_lim, interior, hev_t, False
                    )
                    _filter_v_edge(
                        V, cx0 + 4, cy0, 8, False, sub_lim, interior, hev_t, False
                    )
            if mby > 0:
                _filter_h_edge(Y, x0, y0, 16, True, mb_lim, interior, hev_t, simple)
                if not simple:
                    _filter_h_edge(U, cx0, cy0, 8, True, mb_lim, interior, hev_t, False)
                    _filter_h_edge(V, cx0, cy0, 8, True, mb_lim, interior, hev_t, False)
            if inner:
                for sy in (4, 8, 12):
                    _filter_h_edge(
                        Y, x0, y0 + sy, 16, False, sub_lim, interior, hev_t, simple
                    )
                if not simple:
                    _filter_h_edge(
                        U, cx0, cy0 + 4, 8, False, sub_lim, interior, hev_t, False
                    )
                    _filter_h_edge(
                        V, cx0, cy0 + 4, 8, False, sub_lim, interior, hev_t, False
                    )


# ---------------------------------------------------------------------------
# YUV 4:2:0 -> RGB (BT.601 studio swing, nearest-neighbor chroma
# upsample — the featurizer contract; libwebp's "fancy" bilinear
# upsampler differs by a few code values at chroma edges)


def yuv420_to_rgb(y, u, v):
    h, w = y.shape
    uu = np.repeat(np.repeat(u, 2, axis=0), 2, axis=1)[:h, :w]
    vv = np.repeat(np.repeat(v, 2, axis=0), 2, axis=1)[:h, :w]
    yf = 1.164 * (y.astype(np.float64) - 16.0)
    ud = uu.astype(np.float64) - 128.0
    vd = vv.astype(np.float64) - 128.0
    r = yf + 1.596 * vd
    g = yf - 0.391 * ud - 0.813 * vd
    b = yf + 2.018 * ud
    return np.clip(np.stack([r, g, b], axis=-1) + 0.5, 0, 255).astype(np.uint8)


def decode_vp8(data: bytes) -> np.ndarray:
    """VP8 chunk payload -> RGB uint8 (h, w, 3)."""
    y, u, v = decode_vp8_frame(data)
    return yuv420_to_rgb(y, u, v)


# ---------------------------------------------------------------------------
# Minimal VP8 key-frame ENCODER (fixture generator, RFC 6386 section
# 7.3 boolean encoder). Emits prediction-only frames: every MB is
# skipped (no residual tokens), modes chosen by the caller — enough to
# drive any conforming decoder's intra predictors deterministically,
# which is how tests pin this module's prediction semantics against
# the system libwebp (tests/test_vp8.py).


class BoolEncoder:
    def __init__(self):
        self.bottom = 0  # arbitrary-precision: carries propagate for free
        self.rng = 255
        self.nbits = 0

    def put(self, bit: int, prob: int = 128) -> None:
        split = 1 + (((self.rng - 1) * prob) >> 8)
        if bit:
            self.bottom += split
            self.rng -= split
        else:
            self.rng = split
        while self.rng < 128:
            self.rng <<= 1
            self.bottom <<= 1
            self.nbits += 1

    def put_literal(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.put((value >> i) & 1)

    def put_tree(self, tree: tuple, probs, value: int) -> None:
        # find the path to the leaf by DFS
        path = []

        def walk(i, acc):
            for b in (0, 1):
                t = tree[i + b]
                if t <= 0:
                    if -t == value:
                        path.extend(acc + [(i >> 1, b)])
                        return True
                elif walk(t, acc + [(i >> 1, b)]):
                    return True
            return False

        if not walk(0, []):
            raise ValueError(f"value {value} not in tree")
        for node, bit in path:
            self.put(bit, probs[node])

    def flush(self) -> bytes:
        # the interval base lives in (nbits + 8) bits; pad with 32
        # trailing zero bits so the decoder's 2-byte preload and renorm
        # reads stay in-bounds
        self.bottom <<= 32
        self.nbits += 32
        total = self.nbits + 8
        pad = (8 - total % 8) % 8
        self.bottom <<= pad
        return self.bottom.to_bytes((total + pad) // 8, "big")


def encode_vp8_modes_frame(
    w: int,
    h: int,
    ymodes,
    bmodes=None,
    uvmodes=None,
) -> bytes:
    """A VP8 chunk containing a skip-everything key frame: predictions
    only, loop filter off, quantizer irrelevant. ``ymodes[mb]`` is a
    16x16 mode or B_PRED; ``bmodes[mb]`` the 16 sub-modes where
    B_PRED."""
    mb_w, mb_h = (w + 15) // 16, (h + 15) // 16
    n = mb_w * mb_h
    uvmodes = uvmodes or [DC_PRED] * n
    be = BoolEncoder()
    be.put_literal(0, 1)  # color space
    be.put_literal(0, 1)  # clamping
    be.put_literal(0, 1)  # segmentation off
    be.put_literal(0, 1)  # filter type
    be.put_literal(0, 6)  # filter level 0 -> no loop filter
    be.put_literal(0, 3)  # sharpness
    be.put_literal(0, 1)  # lf deltas off
    be.put_literal(0, 2)  # 1 token partition
    be.put_literal(0, 7)  # q_index 0
    for _ in range(5):
        be.put_literal(0, 1)  # no quantizer deltas
    be.put_literal(0, 1)  # refresh entropy probs
    for i in range(4):
        for j in range(8):
            for k in range(3):
                for l in range(11):
                    be.put(0, COEF_UPDATE_PROBS[i][j][k][l])
    be.put_literal(1, 1)  # mb_no_coeff_skip on
    skip_prob = 200
    be.put_literal(skip_prob, 8)
    above_modes = [B_DC_PRED] * (mb_w * 4)
    for mby in range(mb_h):
        left_modes = [B_DC_PRED] * 4
        for mbx in range(mb_w):
            idx = mby * mb_w + mbx
            be.put(1, skip_prob)  # mb_skip = 1 (no residual)
            ymode = ymodes[idx]
            be.put_tree(KF_YMODE_TREE, KF_YMODE_PROB, ymode)
            if ymode == B_PRED:
                bm = bmodes[idx]
                for sb in range(16):
                    sy, sx = sb >> 2, sb & 3
                    above = above_modes[mbx * 4 + sx] if sy == 0 else bm[sb - 4]
                    left = left_modes[sy] if sx == 0 else bm[sb - 1]
                    be.put_tree(BMODE_TREE, KF_BMODE_PROB[above][left], bm[sb])
                for sx in range(4):
                    above_modes[mbx * 4 + sx] = bm[12 + sx]
                for sy in range(4):
                    left_modes[sy] = bm[sy * 4 + 3]
            else:
                implied = {
                    DC_PRED: B_DC_PRED, V_PRED: B_VE_PRED,
                    H_PRED: B_HE_PRED, TM_PRED: B_TM_PRED,
                }[ymode]
                for sx in range(4):
                    above_modes[mbx * 4 + sx] = implied
                for sy in range(4):
                    left_modes[sy] = implied
            be.put_tree(UV_MODE_TREE, KF_UV_MODE_PROB, uvmodes[idx])
    part1 = be.flush()
    tokens = b"\x00\x00"  # never read (every MB skipped)
    tag = (len(part1) << 5) | (1 << 4) | 0  # keyframe, version 0, shown
    return (
        tag.to_bytes(3, "little")
        + b"\x9d\x01\x2a"
        + (w & 0x3FFF).to_bytes(2, "little")
        + (h & 0x3FFF).to_bytes(2, "little")
        + part1
        + tokens
    )


def wrap_webp(vp8_chunk: bytes) -> bytes:
    """RIFF/WEBP container around a raw VP8 chunk payload."""
    chunk = b"VP8 " + len(vp8_chunk).to_bytes(4, "little") + vp8_chunk
    if len(vp8_chunk) & 1:
        chunk += b"\x00"
    return b"RIFF" + (4 + len(chunk)).to_bytes(4, "little") + b"WEBP" + chunk


# RFC 6386 section 11.5 kf_bmode_prob[above][left][9]
KF_BMODE_PROB = (
    (  # above = mode 0
        (231, 120, 48, 89, 115, 113, 120, 152, 112),
        (152, 179, 64, 126, 170, 118, 46, 70, 95),
        (175, 69, 143, 80, 85, 82, 72, 155, 103),
        (56, 58, 10, 171, 218, 189, 17, 13, 152),
        (144, 71, 10, 38, 171, 213, 144, 34, 26),
        (114, 26, 17, 163, 44, 195, 21, 10, 173),
        (121, 24, 80, 195, 26, 62, 44, 64, 85),
        (170, 46, 55, 19, 136, 160, 33, 206, 71),
        (63, 20, 8, 114, 114, 208, 12, 9, 226),
        (81, 40, 11, 96, 182, 84, 29, 16, 36),
    ),
    (  # above = mode 1
        (134, 183, 89, 137, 98, 101, 106, 165, 148),
        (72, 187, 100, 130, 157, 111, 32, 75, 80),
        (66, 102, 167, 99, 74, 62, 40, 234, 128),
        (41, 53, 9, 178, 241, 141, 26, 8, 107),
        (104, 79, 12, 27, 217, 255, 87, 17, 7),
        (74, 43, 26, 146, 73, 166, 49, 23, 157),
        (65, 38, 105, 160, 51, 52, 31, 115, 128),
        (87, 68, 71, 44, 114, 51, 15, 186, 23),
        (47, 41, 14, 110, 182, 183, 21, 17, 194),
        (66, 45, 25, 102, 197, 189, 23, 18, 22),
    ),
    (  # above = mode 2
        (88, 88, 147, 150, 42, 46, 45, 196, 205),
        (43, 97, 183, 117, 85, 38, 35, 179, 61),
        (39, 53, 200, 87, 26, 21, 43, 232, 171),
        (56, 34, 51, 104, 114, 102, 29, 93, 77),
        (107, 54, 32, 26, 51, 1, 81, 43, 31),
        (39, 28, 85, 171, 58, 165, 90, 98, 64),
        (34, 22, 116, 206, 23, 34, 43, 166, 73),
        (68, 25, 106, 22, 64, 171, 36, 225, 114),
        (34, 19, 21, 102, 132, 188, 16, 76, 124),
        (62, 18, 78, 95, 85, 57, 50, 48, 51),
    ),
    (  # above = mode 3
        (193, 101, 35, 159, 215, 111, 89, 46, 111),
        (60, 148, 31, 172, 219, 228, 21, 18, 111),
        (112, 113, 77, 85, 179, 255, 38, 120, 114),
        (40, 42, 1, 196, 245, 209, 10, 25, 109),
        (100, 80, 8, 43, 154, 1, 51, 26, 71),
        (88, 43, 29, 140, 166, 213, 37, 43, 154),
        (61, 63, 30, 155, 67, 45, 68, 1, 209),
        (142, 78, 78, 16, 255, 128, 34, 197, 171),
        (41, 40, 5, 102, 211, 183, 4, 1, 221),
        (51, 50, 17, 168, 209, 192, 23, 25, 82),
    ),
    (  # above = mode 4
        (125, 98, 42, 88, 104, 85, 117, 175, 82),
        (95, 84, 53, 89, 128, 100, 113, 101, 45),
        (75, 79, 123, 47, 51, 128, 81, 171, 1),
        (57, 17, 5, 71, 102, 57, 53, 41, 49),
        (115, 21, 2, 10, 102, 255, 166, 23, 6),
        (38, 33, 13, 121, 57, 73, 26, 1, 85),
        (41, 10, 67, 138, 77, 110, 90, 47, 114),
        (101, 29, 16, 10, 85, 128, 101, 196, 26),
        (57, 18, 10, 102, 102, 213, 34, 20, 43),
        (117, 20, 15, 36, 163, 128, 68, 1, 26),
    ),
    (  # above = mode 5
        (138, 31, 36, 171, 27, 166, 38, 44, 229),
        (67, 87, 58, 169, 82, 115, 26, 59, 179),
        (63, 59, 90, 180, 59, 166, 93, 73, 154),
        (40, 40, 21, 116, 143, 209, 34, 39, 175),
        (57, 46, 22, 24, 128, 1, 54, 17, 37),
        (47, 15, 16, 183, 34, 223, 49, 45, 183),
        (46, 17, 33, 183, 6, 98, 15, 32, 183),
        (65, 32, 73, 115, 28, 128, 23, 128, 205),
        (40, 3, 9, 115, 51, 192, 18, 6, 223),
        (87, 37, 9, 115, 59, 77, 64, 21, 47),
    ),
    (  # above = mode 6
        (104, 55, 44, 218, 9, 54, 53, 130, 226),
        (64, 90, 70, 205, 40, 41, 23, 26, 57),
        (54, 57, 112, 184, 5, 41, 38, 166, 213),
        (30, 34, 26, 133, 152, 116, 10, 32, 134),
        (75, 32, 12, 51, 192, 255, 160, 43, 51),
        (39, 19, 53, 221, 26, 114, 32, 73, 255),
        (31, 9, 65, 234, 2, 15, 1, 118, 73),
        (88, 31, 35, 67, 102, 85, 55, 186, 85),
        (56, 21, 23, 111, 59, 205, 45, 37, 192),
        (55, 38, 70, 124, 73, 102, 1, 34, 98),
    ),
    (  # above = mode 7
        (102, 61, 71, 37, 34, 53, 31, 243, 192),
        (69, 60, 71, 38, 73, 119, 28, 222, 37),
        (68, 45, 128, 34, 1, 47, 11, 245, 171),
        (62, 17, 19, 70, 146, 85, 55, 62, 70),
        (75, 15, 9, 9, 64, 255, 184, 119, 16),
        (37, 43, 37, 154, 100, 163, 85, 160, 1),
        (63, 9, 92, 136, 28, 64, 32, 201, 85),
        (86, 6, 28, 5, 64, 255, 25, 248, 1),
        (56, 8, 17, 132, 137, 255, 55, 116, 128),
        (58, 15, 20, 82, 135, 57, 26, 121, 40),
    ),
    (  # above = mode 8
        (164, 50, 31, 137, 154, 133, 25, 35, 218),
        (51, 103, 44, 131, 131, 123, 31, 6, 158),
        (86, 40, 64, 135, 148, 224, 45, 183, 128),
        (22, 26, 17, 131, 240, 154, 14, 1, 209),
        (83, 12, 13, 54, 192, 255, 68, 47, 28),
        (45, 16, 21, 91, 64, 222, 7, 1, 197),
        (56, 21, 39, 155, 60, 138, 23, 102, 213),
        (85, 26, 85, 85, 128, 128, 32, 146, 171),
        (18, 11, 7, 63, 144, 171, 4, 4, 246),
        (35, 27, 10, 146, 174, 171, 12, 26, 128),
    ),
    (  # above = mode 9
        (190, 80, 35, 99, 180, 80, 126, 54, 45),
        (85, 126, 47, 87, 176, 51, 41, 20, 32),
        (101, 75, 128, 139, 118, 146, 116, 128, 85),
        (56, 41, 15, 176, 236, 85, 37, 9, 62),
        (146, 36, 19, 30, 171, 255, 97, 27, 20),
        (71, 30, 17, 119, 118, 255, 17, 18, 138),
        (101, 38, 60, 138, 55, 70, 43, 26, 142),
        (138, 45, 61, 62, 219, 1, 81, 188, 64),
        (32, 41, 20, 117, 151, 142, 20, 21, 163),
        (112, 19, 12, 61, 195, 128, 48, 4, 24),
    ),
)
