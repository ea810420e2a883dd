"""CCITT G3/G4 fax decode + progressive JPEG decode.

All fixtures are HAND-ASSEMBLED bitstreams whose expected pixels
follow directly from the ITU T.4/T.6 and T.81 specs — no sibling
encoder exists in the repo, so the decoder cannot co-validate a shared
misunderstanding. The progressive successive-approximation case is
additionally cross-checked against the independently-validated
baseline decoder on identical DCT coefficients.
"""

from __future__ import annotations

import struct

import numpy as np

from unstructured_spark.parsers.ccitt import (
    CcittError,
    decode_g3,
    decode_g4,
    decode_mh,
)
from unstructured_spark.parsers.image_codec import (
    ImageDecodeError,
    decode_image,
    decode_jpeg,
    decode_tiff_pages,
)


def _bits(s: str) -> bytes:
    s = s.replace(" ", "")
    s += "0" * (-len(s) % 8)
    return bytes(int(s[i : i + 8], 2) for i in range(0, len(s), 8))


# row pattern WWBBBWWW as transition tests use throughout (1 = black)
_EXP = np.array([[0, 0, 1, 1, 1, 0, 0, 0]] * 2, dtype=np.uint8)


class TestCcittCore:
    def test_g4_horizontal_then_vertical(self):
        # line1: H(001) w2(0111) b3(10) + V0 tail; line2: V0 V0 V0
        arr = decode_g4(_bits("001 0111 10 1 111"), 8, 2)
        assert (arr == _EXP).all()

    def test_g4_all_white_is_one_v0_per_line(self):
        arr = decode_g4(_bits("1 1 1"), 5, 3)
        assert arr.shape == (3, 5) and (arr == 0).all()

    def test_g4_vr1_shifts_run_right(self):
        arr = decode_g4(_bits("001 0111 10 1  011 011 1"), 8, 2)
        exp = np.array(
            [[0, 0, 1, 1, 1, 0, 0, 0], [0, 0, 0, 1, 1, 1, 0, 0]], np.uint8
        )
        assert (arr == exp).all()

    def test_g4_pass_mode_skips_reference_runs(self):
        # line1 = W2 B2 W1 B2 W1 via two horizontals; line2 all white
        # via two PASS codes over the reference black runs
        arr = decode_g4(_bits("001 0111 11  001 000111 11  1  0001 0001 1"), 8, 2)
        exp = np.array([[0, 0, 1, 1, 0, 1, 1, 0], [0] * 8], np.uint8)
        assert (arr == exp).all()

    def test_g4_eofb_stops_decode(self):
        arr = decode_g4(_bits("001 0111 10 1 111 000000000001 000000000001"), 8, 2)
        assert (arr == _EXP).all()

    def test_mh_rows_are_byte_aligned(self):
        arr = decode_mh(_bits("0111 10 1000 000000  0111 10 1000"), 8, 2)
        assert (arr == _EXP).all()

    def test_makeup_codes_accumulate(self):
        # white 70 = makeup-64 (11011) + term-6 (1110); black 10
        arr = decode_mh(_bits("11011 1110 0000100"), 80, 1)
        assert (arr == np.array([[0] * 70 + [1] * 10], np.uint8)).all()

    def test_g3_1d_eol_delimited(self):
        arr = decode_g3(
            _bits(
                "000000000001 0111 10 1000 000000000001 0111 10 1000 "
                "000000000001 000000000001"
            ),
            8,
            2,
        )
        assert (arr == _EXP).all()

    def test_g3_2d_tag_bits_select_coding(self):
        # EOL+tag1 -> 1-D line; EOL+tag0 -> 2-D line (V0 x3)
        arr = decode_g3(
            _bits("000000000001 1 0111 10 1000 000000000001 0 111"),
            8,
            2,
            two_d=True,
        )
        assert (arr == _EXP).all()

    def test_fill_order_2_reverses_bytes(self):
        fwd = _bits("001 0111 10 1 111")
        rev = bytes(int(f"{b:08b}"[::-1], 2) for b in fwd)
        assert (decode_g4(rev, 8, 2, fill_order=2) == _EXP).all()

    def test_garbage_raises(self):
        import pytest

        with pytest.raises(CcittError):
            decode_g4(b"\xaa\xbb\xcc\xdd", 100, 10)


def _make_tiff(w, h, comp, strip, photo=0, t4opts=None, fill_order=None):
    tags = [
        (256, 3, 1, w), (257, 3, 1, h), (258, 3, 1, 1), (259, 3, 1, comp),
        (262, 3, 1, photo), (277, 3, 1, 1), (278, 3, 1, h),
        (279, 4, 1, len(strip)),
    ]
    if t4opts is not None:
        tags.append((292, 4, 1, t4opts))
    if fill_order is not None:
        tags.append((266, 3, 1, fill_order))
    tags.append((273, 4, 1, 0))
    tags.sort()
    n = len(tags)
    strip_off = 8 + 2 + n * 12 + 4
    out = struct.pack("<2sHI", b"II", 42, 8) + struct.pack("<H", n)
    for tag, typ, cnt, val in tags:
        if tag == 273:
            val = strip_off
        out += struct.pack("<HHI", tag, typ, cnt) + struct.pack("<I", val)
    return out + struct.pack("<I", 0) + strip


class TestCcittTiff:
    def test_g4_tiff_whiteiszero(self):
        tif = _make_tiff(8, 2, 4, _bits("001 0111 10 1 111"))
        w, h, c, px = decode_tiff_pages(tif)[0]
        arr = np.frombuffer(bytes(px), np.uint8).reshape(h, w)
        assert (arr == (1 - _EXP) * 255).all()  # black -> 0

    def test_g3_tiff_routes_through_decode_image(self):
        tif = _make_tiff(
            8, 2, 3,
            _bits("000000000001 0111 10 1000 000000000001 0111 10 1000"),
            t4opts=0,
        )
        w, h, c, px = decode_image(tif)
        arr = np.frombuffer(bytes(px), np.uint8).reshape(h, w)
        assert (arr == (1 - _EXP) * 255).all()

    def test_mh_tiff_fill_order_2(self):
        mh = _bits("0111 10 1000 000000  0111 10 1000")
        rev = bytes(int(f"{b:08b}"[::-1], 2) for b in mh)
        tif = _make_tiff(8, 2, 2, rev, fill_order=2)
        w, h, c, px = decode_tiff_pages(tif)[0]
        arr = np.frombuffer(bytes(px), np.uint8).reshape(h, w)
        assert (arr == (1 - _EXP) * 255).all()

    def test_photometric_1_inverts(self):
        tif = _make_tiff(8, 2, 4, _bits("001 0111 10 1 111"), photo=1)
        w, h, c, px = decode_tiff_pages(tif)[0]
        arr = np.frombuffer(bytes(px), np.uint8).reshape(h, w)
        assert (arr == _EXP * 255).all()

    def test_truncated_fax_strips_raise(self):
        import pytest

        # one strip of 2 rows but the IFD claims h=10: must raise, not
        # return a short buffer claimed as 10 rows
        strip = _bits("001 0111 10 1 111")
        tif = _make_tiff(8, 10, 4, strip)
        # rows_per_strip=h in _make_tiff; rewrite tag 278 to 2 so the
        # single strip legitimately decodes only 2 rows
        tif = tif.replace(
            struct.pack("<HHI", 278, 3, 1) + struct.pack("<I", 10),
            struct.pack("<HHI", 278, 3, 1) + struct.pack("<I", 2),
        )
        with pytest.raises(ImageDecodeError, match="truncated"):
            decode_tiff_pages(tif)

    def test_corrupt_fax_surfaces_image_decode_error(self):
        import pytest

        tif = _make_tiff(100, 10, 4, b"\xaa\xbb\xcc\xdd")
        with pytest.raises(ImageDecodeError):
            decode_image(tif)


def _seg(marker, payload):
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def _dqt_ones():
    return _seg(0xDB, bytes([0x00]) + bytes([1] * 64))


def _sof(marker, w, h):
    return _seg(marker, bytes([8]) + struct.pack(">HH", h, w) + bytes([1, 1, 0x11, 0]))


def _dht(tc_th, counts, symbols):
    c = [0] * 16
    for ln, n in counts.items():
        c[ln - 1] = n
    return _seg(0xC4, bytes([tc_th]) + bytes(c) + bytes(symbols))


def _sos(ss, se, ahal, entropy):
    return _seg(0xDA, bytes([1, 1, 0x00, ss, se, ahal])) + entropy


def _ebits(s: str) -> bytes:
    """Entropy bits -> bytes with 0xFF00 stuffing."""
    s = s.replace(" ", "")
    s += "0" * (-len(s) % 8)
    out = bytearray()
    for i in range(0, len(s), 8):
        b = int(s[i : i + 8], 2)
        out.append(b)
        if b == 0xFF:
            out.append(0x00)
    return bytes(out)


class TestProgressiveJpeg:
    def test_dc_only_successive_approximation(self):
        # c00 = 24 via DC-first(Al=1, diff 12) + DC-refine(bit 0):
        # uniform gray 24/8 + 128 = 131
        jpg = (
            b"\xff\xd8" + _dqt_ones() + _sof(0xC2, 8, 8)
            + _dht(0x00, {1: 1}, [4])
            + _dht(0x10, {1: 1}, [0x00])
            + _sos(0, 0, 0x01, _ebits("0 1100"))
            + _sos(0, 0, 0x10, _ebits("0"))
            + _sos(1, 63, 0x00, _ebits("0"))
            + b"\xff\xd9"
        )
        w, h, c, px = decode_jpeg(jpg)
        arr = np.frombuffer(bytes(px), np.uint8).reshape(h, w)
        assert (w, h, c) == (8, 8, 1)
        assert (arr == 131).all()

    def test_ac_refinement_matches_baseline_decoder(self):
        # same coefficient block (c00=24, zz1=5, zz3=-3) encoded as
        # (a) one baseline scan, (b) DC-first + AC-first(Al=1) +
        # AC-refine(Ah=1, Al=0) — pixels must agree exactly
        base = (
            b"\xff\xd8" + _dqt_ones() + _sof(0xC0, 8, 8)
            + _dht(0x00, {1: 1}, [5])
            + _dht(0x10, {2: 3}, [0x03, 0x12, 0x00])
            + _sos(0, 63, 0x00, _ebits("0 11000 00 101 01 00 10"))
            + b"\xff\xd9"
        )
        prog = (
            b"\xff\xd8" + _dqt_ones() + _sof(0xC2, 8, 8)
            + _dht(0x00, {1: 1}, [5])
            + _dht(0x10, {2: 3}, [0x02, 0x11, 0x00])
            + _sos(0, 0, 0x00, _ebits("0 11000"))
            + _sos(1, 63, 0x01, _ebits("00 10 01 0 10"))
            + _sos(1, 63, 0x10, _ebits("10 1 1"))
            + b"\xff\xd9"
        )
        bw, bh, bc, bpx = decode_jpeg(base)
        pw, ph, pc, ppx = decode_jpeg(prog)
        assert (bw, bh, bc) == (pw, ph, pc)
        assert bytes(bpx) == bytes(ppx)

    def test_lossless_variants_still_raise(self):
        import pytest

        jpg = b"\xff\xd8" + _dqt_ones() + _sof(0xC3, 8, 8) + b"\xff\xd9"
        with pytest.raises(ImageDecodeError, match="not supported"):
            decode_jpeg(jpg)
