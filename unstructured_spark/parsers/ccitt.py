"""CCITT Group 3 / Group 4 fax decompression (ITU-T T.4 / T.6).

Scanned-fax TIFF is the most common real-scan container
(compression 2 = 1-D Modified Huffman, 3 = T.4 G3, 4 = T.6 G4); the
reference gets these free through PIL's libtiff binding (reference
``partition/image.py:17-123``), and this container has no PIL, so the
codes are implemented here from the public ITU tables: run-length
Modified Huffman white/black codes, the shared extended makeup codes,
and the 2-D vertical/pass/horizontal coding modes with a reference
line.

Output is a numpy ``uint8`` matrix with 1 = black, 0 = white — the
canonical fax polarity (TIFF photometric 0, WhiteIsZero); callers
invert for BlackIsZero.

Only decode lives here — test fixtures are hand-assembled bitstreams
whose expected pixels follow directly from the spec, so decoder bugs
can't self-validate through a sibling encoder.
"""

from __future__ import annotations

import numpy as np


class CcittError(ValueError):
    pass


def _make_table(entries: list[tuple[str, int]]) -> dict[tuple[int, int], int]:
    """(bitstring, value) -> {(nbits, code): value} prefix-decode map."""
    return {(len(b), int(b, 2)): v for b, v in entries}


# ITU-T T.4 white run codes: terminating (0-63) + makeup (64-1728)
_WHITE = _make_table(
    [
        ("00110101", 0), ("000111", 1), ("0111", 2), ("1000", 3),
        ("1011", 4), ("1100", 5), ("1110", 6), ("1111", 7),
        ("10011", 8), ("10100", 9), ("00111", 10), ("01000", 11),
        ("001000", 12), ("000011", 13), ("110100", 14), ("110101", 15),
        ("101010", 16), ("101011", 17), ("0100111", 18), ("0001100", 19),
        ("0001000", 20), ("0010111", 21), ("0000011", 22), ("0000100", 23),
        ("0101000", 24), ("0101011", 25), ("0010011", 26), ("0100100", 27),
        ("0011000", 28), ("00000010", 29), ("00000011", 30), ("00011010", 31),
        ("00011011", 32), ("00010010", 33), ("00010011", 34), ("00010100", 35),
        ("00010101", 36), ("00010110", 37), ("00010111", 38), ("00101000", 39),
        ("00101001", 40), ("00101010", 41), ("00101011", 42), ("00101100", 43),
        ("00101101", 44), ("00000100", 45), ("00000101", 46), ("00001010", 47),
        ("00001011", 48), ("01010010", 49), ("01010011", 50), ("01010100", 51),
        ("01010101", 52), ("00100100", 53), ("00100101", 54), ("01011000", 55),
        ("01011001", 56), ("01011010", 57), ("01011011", 58), ("01001010", 59),
        ("01001011", 60), ("00110010", 61), ("00110011", 62), ("00110100", 63),
        ("11011", 64), ("10010", 128), ("010111", 192), ("0110111", 256),
        ("00110110", 320), ("00110111", 384), ("01100100", 448),
        ("01100101", 512), ("01101000", 576), ("01100111", 640),
        ("011001100", 704), ("011001101", 768), ("011010010", 832),
        ("011010011", 896), ("011010100", 960), ("011010101", 1024),
        ("011010110", 1088), ("011010111", 1152), ("011011000", 1216),
        ("011011001", 1280), ("011011010", 1344), ("011011011", 1408),
        ("010011000", 1472), ("010011001", 1536), ("010011010", 1600),
        ("011000", 1664), ("010011011", 1728),
    ]
)

# ITU-T T.4 black run codes: terminating (0-63) + makeup (64-1728)
_BLACK = _make_table(
    [
        ("0000110111", 0), ("010", 1), ("11", 2), ("10", 3),
        ("011", 4), ("0011", 5), ("0010", 6), ("00011", 7),
        ("000101", 8), ("000100", 9), ("0000100", 10), ("0000101", 11),
        ("0000111", 12), ("00000100", 13), ("00000111", 14), ("000011000", 15),
        ("0000010111", 16), ("0000011000", 17), ("0000001000", 18),
        ("00001100111", 19), ("00001101000", 20), ("00001101100", 21),
        ("00000110111", 22), ("00000101000", 23), ("00000010111", 24),
        ("00000011000", 25), ("000011001010", 26), ("000011001011", 27),
        ("000011001100", 28), ("000011001101", 29), ("000001101000", 30),
        ("000001101001", 31), ("000001101010", 32), ("000001101011", 33),
        ("000011010010", 34), ("000011010011", 35), ("000011010100", 36),
        ("000011010101", 37), ("000011010110", 38), ("000011010111", 39),
        ("000001101100", 40), ("000001101101", 41), ("000011011010", 42),
        ("000011011011", 43), ("000001010100", 44), ("000001010101", 45),
        ("000001010110", 46), ("000001010111", 47), ("000001100100", 48),
        ("000001100101", 49), ("000001010010", 50), ("000001010011", 51),
        ("000000100100", 52), ("000000110111", 53), ("000000111000", 54),
        ("000000100111", 55), ("000000101000", 56), ("000001011000", 57),
        ("000001011001", 58), ("000000101011", 59), ("000000101100", 60),
        ("000001011010", 61), ("000001100110", 62), ("000001100111", 63),
        ("0000001111", 64), ("000011001000", 128), ("000011001001", 192),
        ("000001011011", 256), ("000000110011", 320), ("000000110100", 384),
        ("000000110101", 448), ("0000001101100", 512), ("0000001101101", 576),
        ("0000001001010", 640), ("0000001001011", 704), ("0000001001100", 768),
        ("0000001001101", 832), ("0000001110010", 896), ("0000001110011", 960),
        ("0000001110100", 1024), ("0000001110101", 1088),
        ("0000001110110", 1152), ("0000001110111", 1216),
        ("0000001010010", 1280), ("0000001010011", 1344),
        ("0000001010100", 1408), ("0000001010101", 1472),
        ("0000001011010", 1536), ("0000001011011", 1600),
        ("0000001100100", 1664), ("0000001100101", 1728),
    ]
)

# extended makeup codes, shared by both colors (T.4 §2 table 3)
_EXT_MAKEUP = _make_table(
    [
        ("00000001000", 1792), ("00000001100", 1856), ("00000001101", 1920),
        ("000000010010", 1984), ("000000010011", 2048), ("000000010100", 2112),
        ("000000010101", 2176), ("000000010110", 2240), ("000000010111", 2304),
        ("000000011100", 2368), ("000000011101", 2432), ("000000011110", 2496),
        ("000000011111", 2560),
    ]
)

_WHITE_ALL = {**_WHITE, **_EXT_MAKEUP}
_BLACK_ALL = {**_BLACK, **_EXT_MAKEUP}

# 2-D coding modes (T.4 §2.2.4): value = (mode, vertical offset)
_MODES = _make_table(
    [
        ("1", 0),        # V0
        ("011", 1),      # VR1
        ("000011", 2),   # VR2
        ("0000011", 3),  # VR3
        ("010", -1),     # VL1
        ("000010", -2),  # VL2
        ("0000010", -3), # VL3
    ]
)
_EOL_BITS = 12  # 000000000001


class _Bits:
    """MSB-first bit reader over the fax stream; ``fill_order=2``
    (TIFF FillOrder LSB-first) reverses each byte up front.

    ``peek`` reads one 4-byte window per call (codes are <= 14 bits,
    window offset <= 7, so 32 bits always suffice) — a real fax page
    is millions of code reads, so per-bit Python loops are the
    difference between milliseconds and seconds per page."""

    __slots__ = ("data", "bitpos", "nbits")

    # bit-reversal table for FillOrder=2, built once: bytes.translate
    # is C-speed, vs a per-strip Python loop
    _REV = bytes(int(f"{b:08b}"[::-1], 2) for b in range(256))

    def __init__(self, data: bytes, fill_order: int = 1) -> None:
        if fill_order == 2:
            data = data.translate(self._REV)
        self.data = data + b"\x00\x00\x00\x00"  # zero pad past EOF
        self.bitpos = 0
        self.nbits = len(data) * 8

    def eof(self) -> bool:
        return self.bitpos >= self.nbits

    def peek(self, n: int) -> int:
        """Next n bits (n <= 14), zero-padded past EOF."""
        byte = self.bitpos >> 3
        off = self.bitpos & 7
        chunk = int.from_bytes(self.data[byte : byte + 4], "big")
        return (chunk >> (32 - off - n)) & ((1 << n) - 1)

    def skip(self, n: int) -> None:
        self.bitpos += n

    def byte_align(self) -> None:
        self.bitpos = (self.bitpos + 7) & ~7


def _read_run(bits: _Bits, white: bool) -> int:
    """One complete run length: makeup codes accumulate until a
    terminating code (< 64) arrives."""
    table = _WHITE_ALL if white else _BLACK_ALL
    total = 0
    while True:
        for ln in range(2 if not white else 4, 14):
            v = table.get((ln, bits.peek(ln)))
            if v is not None:
                bits.skip(ln)
                total += v
                if v < 64:
                    return total
                break
        else:
            raise CcittError(f"bad {'white' if white else 'black'} run code")


def _decode_1d_line(bits: _Bits, width: int) -> list[int]:
    """One MH-coded line -> changing positions (transitions), starting
    with the white->black transition; always ends with two ``width``
    sentinels."""
    changes: list[int] = []
    pos = 0
    white = True
    while pos < width:
        run = _read_run(bits, white)
        pos += run
        if pos > width:
            raise CcittError("1-D run overflow")
        changes.append(min(pos, width))
        white = not white
    changes.append(width)
    changes.append(width)
    return changes


def _decode_2d_line(bits: _Bits, ref: list[int], width: int) -> list[int]:
    """One 2-D (MR/MMR) coded line against reference-line transitions.

    ``ref`` holds the reference line's changing positions (first entry
    = first white->black transition), ``width``-padded. Returns this
    line's transitions in the same form.
    """
    changes: list[int] = []
    a0 = -1
    white = True
    while a0 < width:
        # b1: first ref transition right of a0 whose color change
        # matches (a transition to the opposite of the current color).
        # Transitions alternate w->b, b->w, ... so parity selects them.
        i = 0
        while i < len(ref) and (ref[i] <= a0 or (i % 2) != (0 if white else 1)):
            i += 1
        b1 = ref[i] if i < len(ref) else width
        b2 = ref[i + 1] if i + 1 < len(ref) else width

        # mode codes are prefix-free: horizontal=001, pass=0001,
        # verticals start 1/01/00001/000001 — test in any fixed order
        if bits.peek(3) == 0b001:  # horizontal
            bits.skip(3)
            start = max(a0, 0)
            r1 = _read_run(bits, white)
            r2 = _read_run(bits, not white)
            a1 = start + r1
            a2 = a1 + r2
            if a2 > width:
                raise CcittError("2-D horizontal run overflow")
            changes.append(min(a1, width))
            changes.append(min(a2, width))
            a0 = a2
            continue
        if bits.peek(4) == 0b0001:  # pass
            bits.skip(4)
            a0 = b2
            continue
        # vertical modes
        for ln in (1, 3, 6, 7):
            v = _MODES.get((ln, bits.peek(ln)))
            if v is not None:
                bits.skip(ln)
                a1 = b1 + v
                if a1 < 0 or a1 > width:
                    raise CcittError("2-D vertical out of range")
                changes.append(a1)
                a0 = a1
                white = not white
                break
        else:
            if bits.peek(_EOL_BITS) == 1:
                raise CcittError("unexpected EOL inside 2-D line")
            raise CcittError("bad 2-D mode code")
    changes.append(width)
    changes.append(width)
    return changes


def _changes_to_row(changes: list[int], width: int) -> np.ndarray:
    row = np.zeros(width, dtype=np.uint8)
    it = iter(changes)
    for start in it:
        end = next(it, width)
        if start >= width:
            break
        row[start:end] = 1
    return row


def _consume_eol(bits: _Bits) -> bool:
    """Consume fill zeros + one EOL; False at EOF, raises if the next
    1-bit arrives before 11 zeros (i.e. this is NOT an EOL position)."""
    zeros = 0
    while not bits.eof() and bits.peek(1) == 0:
        bits.skip(1)
        zeros += 1
    if bits.eof():
        return False
    if zeros < _EOL_BITS - 1:
        raise CcittError("expected EOL")
    bits.skip(1)
    return True


def decode_g4(
    data: bytes, width: int, height: int, fill_order: int = 1
) -> np.ndarray:
    """T.6 (Group 4, MMR): every line 2-D against the previous line;
    imaginary all-white reference above the first. 1 = black."""
    bits = _Bits(data, fill_order)
    ref = [width, width]
    rows = []
    for _ in range(height):
        # EOFB = two EOLs; stop early on it or EOF
        if bits.eof() or bits.peek(_EOL_BITS) == 1:
            break
        ref = _decode_2d_line(bits, ref, width)
        rows.append(_changes_to_row(ref, width))
    if not rows:
        raise CcittError("G4 stream decoded no lines")
    while len(rows) < height:
        rows.append(np.zeros(width, dtype=np.uint8))
    return np.vstack(rows)


def decode_g3(
    data: bytes,
    width: int,
    height: int,
    *,
    two_d: bool = False,
    fill_order: int = 1,
) -> np.ndarray:
    """T.4 (Group 3): EOL-delimited lines; in 2-D mode each EOL carries
    a trailing tag bit (1 = next line 1-D, 0 = 2-D). 1 = black.

    Every line is preceded by an EOL per T.4 (a leading EOL opens the
    page); tolerant of its absence, of fill zeros before EOLs, and of
    a missing RTC trailer.
    """
    bits = _Bits(data, fill_order)
    ref = [width, width]
    rows: list[np.ndarray] = []
    next_1d = True

    def eol_and_tag() -> bool:
        nonlocal next_1d
        if not _consume_eol(bits):
            return False
        if two_d:
            next_1d = bits.peek(1) == 1
            bits.skip(1)
        return True

    # leading EOL (customary): present iff >= 11 zeros precede the
    # first 1-bit — no valid run code carries that many
    save = bits.bitpos
    try:
        if not eol_and_tag():
            raise CcittError("empty G3 stream")
    except CcittError:
        bits.bitpos = save
        next_1d = True
    while len(rows) < height and not bits.eof():
        ref = (
            _decode_1d_line(bits, width)
            if (not two_d or next_1d)
            else _decode_2d_line(bits, ref, width)
        )
        rows.append(_changes_to_row(ref, width))
        if not eol_and_tag():
            break
        # another EOL immediately after = start of RTC -> page over
        if bits.peek(_EOL_BITS) == 1:
            break
    if not rows:
        raise CcittError("G3 stream decoded no lines")
    while len(rows) < height:
        rows.append(np.zeros(width, dtype=np.uint8))
    return np.vstack(rows[:height])


def decode_mh(
    data: bytes, width: int, height: int, fill_order: int = 1
) -> np.ndarray:
    """TIFF compression 2 ("CCITT RLE"): 1-D MH per line, NO EOLs,
    each line starts on a byte boundary. 1 = black."""
    bits = _Bits(data, fill_order)
    rows = []
    for _ in range(height):
        if bits.eof():
            break
        rows.append(_changes_to_row(_decode_1d_line(bits, width), width))
        bits.byte_align()
    if not rows:
        raise CcittError("MH stream decoded no lines")
    while len(rows) < height:
        rows.append(np.zeros(width, dtype=np.uint8))
    return np.vstack(rows)
