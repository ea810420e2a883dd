"""Pure-stdlib+numpy image codec: PNG / BMP / GIF / JPEG (baseline +
progressive) / TIFF (incl. CCITT fax) decode, PNG encode, resize.

The container has no PIL/opencv, but PNG is just zlib (stdlib) plus
per-scanline unfiltering, BMP is raw pixels, GIF is classic LZW, and
JPEG is Huffman + dequant + a numpy IDCT — all implementable with
``zlib`` + ``struct`` + numpy. This makes the engine's image
operators (feature extraction, resize, thumbnailing, partition_image)
REAL pixel pipelines for the dominant formats. Correctness of the
JPEG path is pinned by a cross-format test: the reference ships the
same page as DA-1p.png and DA-1p.jpg, and our two independent decoders
agree to mean-abs-diff 0.04/255 (tests/test_image_codec.py).
Progressive JPEG (SOF2: spectral selection + successive approximation)
decodes through the multi-scan path, validated against hand-assembled
bitstreams AND the baseline decoder on identical coefficients.
Scanned-fax TIFF (CCITT G3/G4, compression 2/3/4) decodes via
parsers/ccitt.py.

Decoded images are ``(width, height, channels, bytearray pixels)`` in
row-major RGB/RGBA/gray order — a plain buffer so numpy can wrap it
zero-copy inside Pandas UDFs.

Reference behavior contract: partition_image routes pixel work to PIL
(reference ``partition/image.py:17-123``, ``utils.py``); this codec
replaces that dependency for PNG/BMP/GIF inputs.
"""

from __future__ import annotations

import struct
import zlib


class ImageDecodeError(ValueError):
    pass


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> tuple[int, int, int, bytearray]:
    """Decode an 8-bit-depth, non-interlaced PNG (color types 0/2/3/4/6)."""
    if data[:8] != _PNG_MAGIC:
        raise ImageDecodeError("not a PNG")
    pos, width = 8, 0
    height = bit_depth = color_type = interlace = 0
    idat = bytearray()
    palette = b""
    trns = b""
    while pos + 8 <= len(data):
        length, ctype = struct.unpack(">I4s", data[pos : pos + 8])
        chunk = data[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", chunk
            )
        elif ctype == b"PLTE":
            palette = chunk
        elif ctype == b"tRNS":
            trns = chunk
        elif ctype == b"IDAT":
            idat += chunk
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if interlace:
        raise ImageDecodeError("Adam7 interlaced PNG not supported")
    if bit_depth != 8:
        raise ImageDecodeError(f"bit depth {bit_depth} not supported (8 only)")
    channels_in = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
    if channels_in is None:
        raise ImageDecodeError(f"color type {color_type}")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels_in
    out = bytearray(height * stride)
    prev = bytearray(stride)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        line = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        bpp = channels_in
        if ftype == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                upleft = prev[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + _paeth(left, prev[i], upleft)) & 0xFF
        elif ftype != 0:
            raise ImageDecodeError(f"PNG filter {ftype}")
        out[y * stride : (y + 1) * stride] = line
        prev = line
    if color_type == 3:  # palette → RGB(A)
        has_alpha = bool(trns)
        chans = 4 if has_alpha else 3
        px = bytearray(width * height * chans)
        for i, idx in enumerate(out):
            base = idx * 3
            px[i * chans : i * chans + 3] = palette[base : base + 3]
            if has_alpha:
                px[i * chans + 3] = trns[idx] if idx < len(trns) else 255
        return width, height, chans, px
    return width, height, channels_in, out


def encode_png(width: int, height: int, channels: int, pixels: bytes | bytearray) -> bytes:
    """Encode raw pixels as PNG (filter 0 scanlines, one IDAT)."""
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}.get(channels)
    if color_type is None:
        raise ImageDecodeError(f"cannot encode {channels}-channel pixels")
    stride = width * channels

    def chunk(ctype: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + ctype
            + payload
            + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
        )

    raw = bytearray()
    for y in range(height):
        raw.append(0)
        raw += pixels[y * stride : (y + 1) * stride]
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# BMP (uncompressed BI_RGB, 24/32-bit)
# ---------------------------------------------------------------------------


def decode_bmp(data: bytes) -> tuple[int, int, int, bytearray]:
    if data[:2] != b"BM":
        raise ImageDecodeError("not a BMP")
    pixel_offset = struct.unpack("<I", data[10:14])[0]
    width, height_raw = struct.unpack("<ii", data[18:26])
    bpp = struct.unpack("<H", data[28:30])[0]
    compression = struct.unpack("<I", data[30:34])[0]
    if compression != 0 or bpp not in (24, 32):
        raise ImageDecodeError(f"BMP bpp={bpp} compression={compression} not supported")
    height = abs(height_raw)
    bottom_up = height_raw > 0
    nch = bpp // 8
    row_size = (width * nch + 3) & ~3  # rows pad to 4 bytes
    import numpy as np

    rows = np.frombuffer(
        data, dtype=np.uint8, count=height * row_size, offset=pixel_offset
    ).reshape(height, row_size)[:, : width * nch].reshape(height, width, nch)
    if bottom_up:
        rows = rows[::-1]
    rgb = rows[:, :, [2, 1, 0]]  # BGR(A) → RGB
    return width, height, 3, bytearray(np.ascontiguousarray(rgb).tobytes())


# ---------------------------------------------------------------------------
# GIF (LZW, first frame)
# ---------------------------------------------------------------------------


def _lzw_decode(min_code_size: int, data: bytes, expected: int) -> bytearray:
    """GIF LZW. The code-size bump counts codes PROCESSED (giflib's
    RunningCode convention), not table entries — the decoder's table
    lags the encoder's by one entry, so an entry-count rule desyncs
    bit widths exactly at each growth boundary."""
    clear, end = 1 << min_code_size, (1 << min_code_size) + 1
    out = bytearray()
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    code_size = min_code_size + 1
    running = end + 1
    buf = bits = 0
    prev: bytes | None = None
    for byte in data:
        buf |= byte << bits
        bits += 8
        while bits >= code_size:
            code = buf & ((1 << code_size) - 1)
            buf >>= code_size
            bits -= code_size
            if code == clear:
                table = [bytes([i]) for i in range(clear)] + [b"", b""]
                code_size = min_code_size + 1
                running = end + 1
                prev = None
                continue
            if code == end:
                return out
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            else:
                entry = prev + prev[:1]
                table.append(entry)
            out += entry
            prev = entry
            running += 1
            if running > (1 << code_size) and code_size < 12:
                code_size += 1
            if len(out) >= expected:
                return out
    return out


def decode_gif(data: bytes) -> tuple[int, int, int, bytearray]:
    """Decode the first frame of a GIF87a/89a (no interlace)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ImageDecodeError("not a GIF")
    flags = data[10]
    gct_size = 2 << (flags & 7) if flags & 0x80 else 0
    pos = 13
    gct = data[pos : pos + gct_size * 3]
    pos += gct_size * 3
    while pos < len(data):
        b0 = data[pos]
        if b0 == 0x21:  # extension: skip sub-blocks
            pos += 2
            while data[pos]:
                pos += 1 + data[pos]
            pos += 1
        elif b0 == 0x2C:  # image descriptor
            _, _, width, height = struct.unpack("<HHHH", data[pos + 1 : pos + 9])
            iflags = data[pos + 9]
            pos += 10
            if iflags & 0x40:
                raise ImageDecodeError("interlaced GIF not supported")
            if iflags & 0x80:
                lct_size = 2 << (iflags & 7)
                ct = data[pos : pos + lct_size * 3]
                pos += lct_size * 3
            else:
                ct = gct
            min_code = data[pos]
            pos += 1
            lzw = bytearray()
            while data[pos]:
                n = data[pos]
                lzw += data[pos + 1 : pos + 1 + n]
                pos += 1 + n
            pos += 1
            idx = _lzw_decode(min_code, bytes(lzw), width * height)
            out = bytearray(width * height * 3)
            for i, ci in enumerate(idx[: width * height]):
                out[i * 3 : i * 3 + 3] = ct[ci * 3 : ci * 3 + 3]
            return width, height, 3, out
        elif b0 == 0x3B:
            break
        else:
            raise ImageDecodeError(f"unexpected GIF block 0x{b0:02x}")
    raise ImageDecodeError("GIF has no image data")


# ---------------------------------------------------------------------------
# TIFF (baseline: uncompressed / LZW / PackBits strips, multi-page)
# ---------------------------------------------------------------------------

_TIFF_TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}


def _tiff_ifds(data: bytes):
    if data[:2] not in (b"II", b"MM"):
        raise ImageDecodeError("not a TIFF")
    bo = "<" if data[:2] == b"II" else ">"
    off = struct.unpack(bo + "I", data[4:8])[0]
    seen = set()
    while off and off not in seen and off + 2 <= len(data):
        seen.add(off)
        n = struct.unpack(bo + "H", data[off : off + 2])[0]
        tags: dict[int, tuple] = {}
        for i in range(n):
            base = off + 2 + i * 12
            t, typ, cnt = struct.unpack(bo + "HHI", data[base : base + 8])
            raw = data[base + 8 : base + 12]
            size = _TIFF_TYPE_SIZE.get(typ, 1) * cnt
            payload = (
                raw[:size]
                if size <= 4
                else data[
                    struct.unpack(bo + "I", raw)[0] : struct.unpack(bo + "I", raw)[0]
                    + size
                ]
            )
            if typ == 3:
                tags[t] = struct.unpack(bo + f"{cnt}H", payload)
            elif typ == 4:
                tags[t] = struct.unpack(bo + f"{cnt}I", payload)
            else:
                tags[t] = (payload,)
        yield tags
        nxt = off + 2 + n * 12
        off = struct.unpack(bo + "I", data[nxt : nxt + 4])[0]


def _tiff_lzw_decode(data: bytes, expected: int) -> bytearray:
    """TIFF-variant LZW: 8-bit alphabet, MSB-first packing, EARLY
    code-size change (grows one code sooner than GIF)."""
    CLEAR, EOI = 256, 257
    table: list[bytes] = [bytes([i]) for i in range(256)] + [b"", b""]
    code_size = 9
    out = bytearray()
    buf = bits = 0
    prev: bytes | None = None
    for byte in data:
        buf = (buf << 8) | byte
        bits += 8
        while bits >= code_size:
            code = (buf >> (bits - code_size)) & ((1 << code_size) - 1)
            bits -= code_size
            if code == CLEAR:
                table = [bytes([i]) for i in range(256)] + [b"", b""]
                code_size = 9
                prev = None
                continue
            if code == EOI:
                return out
            if prev is None:
                entry = table[code]
            elif code < len(table):
                entry = table[code]
                table.append(prev + entry[:1])
            else:
                entry = prev + prev[:1]
                table.append(entry)
            out += entry
            prev = entry
            # early change: bump when the NEXT entry would overflow
            if len(table) + 1 >= (1 << code_size) and code_size < 12:
                code_size += 1
            if len(out) >= expected:
                return out
    return out


def _packbits_decode(data: bytes, expected: int) -> bytearray:
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expected:
        n = data[i]
        i += 1
        if n < 128:
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:
            out += data[i : i + 1] * (257 - n)
            i += 1
    return out


def decode_tiff_pages(data: bytes) -> list[tuple[int, int, int, bytearray]]:
    """Every page of a baseline TIFF (compression none/LZW/PackBits,
    8-bit or 1-bit samples, gray/RGB(A)/palette, predictor 2) or a
    CCITT fax TIFF (compression 2 = 1-D MH, 3 = G3/T.4, 4 = G4/T.6 —
    decoded by parsers/ccitt.py; the reference reads these through
    PIL's libtiff binding, partition/image.py:17-123)."""
    import numpy as np

    pages = []
    for tags in _tiff_ifds(data):
        try:
            w = tags[256][0]
            h = tags[257][0]
            comp = tags.get(259, (1,))[0]
            photo = tags.get(262, (1,))[0]
            spp = tags.get(277, (1,))[0]
            bps_t = tags.get(258, (1,))
            bps = bps_t[0] if isinstance(bps_t[0], int) else 8
            offsets = tags[273]
            counts = tags[279]
            rows_per_strip = tags.get(278, (h,))[0]
        except (KeyError, IndexError):
            continue
        if comp in (2, 3, 4):  # CCITT fax: always 1-bit
            from unstructured_spark.parsers import ccitt

            fill_order = tags.get(266, (1,))[0]
            t4opts = tags.get(292, (0,))[0]
            strips = []
            for si, (soff, scnt) in enumerate(zip(offsets, counts)):
                strip = data[soff : soff + scnt]
                nrows = min(rows_per_strip, h - si * rows_per_strip)
                if comp == 4:
                    bits = ccitt.decode_g4(strip, w, nrows, fill_order=fill_order)
                elif comp == 3:
                    bits = ccitt.decode_g3(
                        strip, w, nrows,
                        two_d=bool(t4opts & 1), fill_order=fill_order,
                    )
                else:
                    bits = ccitt.decode_mh(strip, w, nrows, fill_order=fill_order)
                strips.append(bits)
            bits = np.vstack(strips)[:h]
            if bits.shape[0] < h:
                # same guard as the baseline strip path ("TIFF strip
                # data truncated"): a short buffer claimed as h rows
                # would blow up in consumers' reshape OUTSIDE the
                # ImageDecodeError gate
                raise ImageDecodeError("TIFF fax strip data truncated")
            # decoder polarity: 1 = black. Photometric 0 (WhiteIsZero,
            # the fax norm): black -> 0; photometric 1 inverts.
            px = ((1 - bits) * np.uint8(255)) if photo == 0 else (
                bits * np.uint8(255)
            )
            pages.append(
                (w, h, 1, bytearray(np.ascontiguousarray(px.astype(np.uint8)).tobytes()))
            )
            continue
        if comp not in (1, 5, 32773) or bps not in (1, 8):
            raise ImageDecodeError(
                f"TIFF compression {comp} / {bps}-bit not supported "
                "(none/LZW/PackBits/CCITT-G3/G4, 1- or 8-bit)"
            )
        row_bytes = (w * spp * bps + 7) // 8
        raw = bytearray()
        for si, (soff, scnt) in enumerate(zip(offsets, counts)):
            strip = data[soff : soff + scnt]
            nrows = min(rows_per_strip, h - si * rows_per_strip)
            want = row_bytes * nrows
            if comp == 5:
                strip = _tiff_lzw_decode(strip, want)
            elif comp == 32773:
                strip = _packbits_decode(strip, want)
            raw += strip[:want]
        if len(raw) < row_bytes * h:
            raise ImageDecodeError("TIFF strip data truncated")
        if bps == 1:
            bits = np.unpackbits(
                np.frombuffer(bytes(raw), np.uint8).reshape(h, row_bytes), axis=1
            )[:, :w]
            if photo == 0:  # white-is-zero
                bits ^= 1
            px = (bits * np.uint8(255)).astype(np.uint8)
            pages.append((w, h, 1, bytearray(np.ascontiguousarray(px).tobytes())))
            continue
        arr = np.frombuffer(bytes(raw), np.uint8, count=w * h * spp).reshape(h, w, spp)
        if tags.get(317, (1,))[0] == 2:  # horizontal differencing
            arr = np.cumsum(arr, axis=1, dtype=np.uint8)
        if photo == 3 and 320 in tags:  # palette: 16-bit CMap per channel
            cmap = np.frombuffer(bytes(tags[320][0]), ">u2").reshape(3, -1) >> 8
            idx = arr[:, :, 0]
            rgb = np.stack([cmap[c][idx] for c in range(3)], axis=-1).astype(np.uint8)
            pages.append((w, h, 3, bytearray(np.ascontiguousarray(rgb).tobytes())))
            continue
        if photo == 0 and spp == 1:
            arr = 255 - arr
        nch = min(spp, 4) if spp > 1 else 1
        arr = arr[:, :, :nch]
        pages.append((w, h, nch, bytearray(np.ascontiguousarray(arr).tobytes())))
    if not pages:
        raise ImageDecodeError("TIFF has no decodable pages")
    return pages


def decode_tiff(data: bytes) -> tuple[int, int, int, bytearray]:
    return decode_tiff_pages(data)[0]


# ---------------------------------------------------------------------------
# JPEG (baseline sequential DCT, JFIF; 4:4:4 / 4:2:2 / 4:2:0 / grayscale)
# ---------------------------------------------------------------------------

_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


class _BitReader:
    """Entropy-segment bit reader: 0xFF00 unstuffing, restart-marker
    byte alignment."""

    __slots__ = ("data", "pos", "buf", "nbits")

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.buf = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # restart marker reached mid-read
                raise ImageDecodeError("hit restart marker inside entropy data")
            else:
                # marker (EOI/next segment): pad with zeros per spec
                self.buf = (self.buf << 8) & 0xFFFFFFFFFFFF
                self.nbits += 8
                return
        else:
            self.pos += 1
        self.buf = ((self.buf << 8) | b) & 0xFFFFFFFFFFFF
        self.nbits += 8

    def bits(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        return (self.buf >> self.nbits) & ((1 << n) - 1)

    def restart(self) -> None:
        """Byte-align and consume an RSTn marker."""
        self.buf = 0
        self.nbits = 0
        d = self.data
        while d[self.pos] != 0xFF or not (0xD0 <= d[self.pos + 1] <= 0xD7):
            self.pos += 1
        self.pos += 2


def _build_huffman(bits_counts: list[int], symbols: bytes) -> dict[tuple[int, int], int]:
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits_counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.bits(1)
        v = table.get((length, code))
        if v is not None:
            return v
    raise ImageDecodeError("invalid Huffman code")


def _extend(v: int, size: int) -> int:
    return v - (1 << size) + 1 if v < (1 << (size - 1)) else v


def _next_marker(data: bytes, p: int) -> int:
    """Byte offset of the next real marker (skips fill bytes, stuffed
    0xFF00 and RSTn) at or after ``p``."""
    while p + 1 < len(data):
        if (
            data[p] == 0xFF
            and data[p + 1] not in (0x00, 0xFF)
            and not (0xD0 <= data[p + 1] <= 0xD7)
        ):
            return p
        p += 1
    return len(data)


def _progressive_scan(
    r: "_BitReader",
    scan_comps: list[dict],
    huff_dc: dict[int, dict],
    huff_ac: dict[int, dict],
    ss: int,
    se: int,
    ah: int,
    al: int,
    mcux: int,
    mcuy: int,
    restart_interval: int,
) -> None:
    """One progressive scan into the components' coefficient grids —
    the standard successive-approximation algorithm (spectral-selection
    first scans + refinement scans, EOB-run bookkeeping per ITU T.81
    §G.2; the refinement control flow mirrors the public libjpeg
    decode_mcu_AC_refine semantics)."""
    p1, m1 = 1 << al, -(1 << al)
    state = {"eobrun": 0}

    def dc_first(c: dict, blk) -> None:
        size = _huff_decode(r, huff_dc[c["dc"]])
        diff = _extend(r.bits(size), size) if size else 0
        c["pred"] += diff
        blk[0] = c["pred"] << al

    def dc_refine(blk) -> None:
        if r.bits(1):
            blk[0] = int(blk[0]) | p1

    def ac_first(c: dict, blk) -> None:
        if state["eobrun"] > 0:
            state["eobrun"] -= 1
            return
        act = huff_ac[c["ac"]]
        k = ss
        while k <= se:
            rs = _huff_decode(r, act)
            run, size = rs >> 4, rs & 15
            if size == 0:
                if run == 15:
                    k += 16
                    continue
                state["eobrun"] = (1 << run) - 1
                if run:
                    state["eobrun"] += r.bits(run)
                break
            k += run
            if k > se:
                raise ImageDecodeError("progressive AC run overflow")
            blk[_ZIGZAG[k]] = _extend(r.bits(size), size) << al
            k += 1

    def ac_refine(c: dict, blk) -> None:
        act = huff_ac[c["ac"]]
        k = ss
        if state["eobrun"] == 0:
            while k <= se:
                rs = _huff_decode(r, act)
                run, size = rs >> 4, rs & 15
                sval = 0
                if size == 0:
                    if run < 15:
                        # NOTE: 1<<run here, NOT (1<<run)-1 — the
                        # current block's decrement happens after the
                        # tail-refinement pass below (T.81 §G.2)
                        state["eobrun"] = 1 << run
                        if run:
                            state["eobrun"] += r.bits(run)
                        break
                    # ZRL: run=15 skips 16 zero-history coefficients
                else:
                    if size != 1:
                        raise ImageDecodeError("bad refinement magnitude")
                    sval = p1 if r.bits(1) else m1
                while k <= se:
                    z = _ZIGZAG[k]
                    v = int(blk[z])
                    if v != 0:
                        if r.bits(1) and (v & p1) == 0:
                            blk[z] = v + (p1 if v >= 0 else m1)
                    else:
                        if run == 0:
                            break
                        run -= 1
                    k += 1
                if sval and k <= se:
                    blk[_ZIGZAG[k]] = sval
                k += 1
        if state["eobrun"] > 0:
            while k <= se:
                z = _ZIGZAG[k]
                v = int(blk[z])
                if v != 0:
                    if r.bits(1) and (v & p1) == 0:
                        blk[z] = v + (p1 if v >= 0 else m1)
                k += 1
            state["eobrun"] -= 1

    def do_block(c: dict, idx: int) -> None:
        blk = c["blocks"][idx]
        if ss == 0:
            dc_first(c, blk) if ah == 0 else dc_refine(blk)
        else:
            ac_first(c, blk) if ah == 0 else ac_refine(c, blk)

    for c in scan_comps:
        c["pred"] = 0
    unit = 0
    if len(scan_comps) > 1:  # interleaved (DC scans only per T.81)
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and unit and unit % restart_interval == 0:
                    r.restart()
                    state["eobrun"] = 0
                    for c in scan_comps:
                        c["pred"] = 0
                for c in scan_comps:
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            do_block(
                                c,
                                (my * c["v"] + by) * c["bw"] + (mx * c["h"] + bx),
                            )
                unit += 1
    else:
        # non-interleaved: the MCU is ONE block on the component's
        # TIGHT grid (ceil(comp_size/8)), indexed into padded storage
        c = scan_comps[0]
        bw_t = (c["cw"] + 7) // 8
        bh_t = (c["ch"] + 7) // 8
        for by in range(bh_t):
            for bx in range(bw_t):
                if restart_interval and unit and unit % restart_interval == 0:
                    r.restart()
                    state["eobrun"] = 0
                    c["pred"] = 0
                do_block(c, by * c["bw"] + bx)
                unit += 1


def decode_jpeg(data: bytes) -> tuple[int, int, int, bytearray]:
    """Decode a JFIF image: baseline sequential (SOF0/SOF1) or
    progressive (SOF2, spectral selection + successive approximation).
    Arithmetic-coded and lossless variants raise."""
    import numpy as np

    if data[:3] != b"\xff\xd8\xff":
        raise ImageDecodeError("not a JPEG")
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    width = height = 0
    comps: list[dict] = []
    restart_interval = 0
    pos = 2
    scan_pos = None
    scan_comps: list[dict] = []
    progressive = False
    mcux = mcuy = 0
    hmax = vmax = 1
    saw_scan = False

    def alloc_blocks() -> None:
        for c in comps:
            c["bw"] = mcux * c["h"]
            c["bh"] = mcuy * c["v"]
            c["cw"] = (width * c["h"] + hmax - 1) // hmax
            c["ch"] = (height * c["v"] + vmax - 1) // vmax
            c["blocks"] = np.zeros((c["bh"] * c["bw"], 64), dtype=np.int32)
            c["pred"] = 0

    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        marker = data[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if marker == 0xD9:  # EOI
            break
        seglen = struct.unpack(">H", data[pos + 2 : pos + 4])[0]
        seg = data[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                i += 1
                if pq:
                    vals = np.frombuffer(seg[i : i + 128], dtype=">u2").astype(np.int32)
                    i += 128
                else:
                    vals = np.frombuffer(seg[i : i + 64], dtype=np.uint8).astype(np.int32)
                    i += 64
                tbl = np.zeros(64, dtype=np.int32)
                tbl[_ZIGZAG] = vals
                qt[tq] = tbl.reshape(8, 8)
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            progressive = marker == 0xC2
            height, width = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            mcux = (width + 8 * hmax - 1) // (8 * hmax)
            mcuy = (height + 8 * vmax - 1) // (8 * vmax)
            if progressive:
                alloc_blocks()
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ImageDecodeError(
                f"JPEG SOF{marker - 0xC0} (lossless/arithmetic/hierarchical) "
                "not supported (baseline + progressive only)"
            )
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                counts = list(seg[i + 1 : i + 17])
                n = sum(counts)
                symbols = seg[i + 17 : i + 17 + n]
                (huff_dc if tc == 0 else huff_ac)[th] = _build_huffman(counts, symbols)
                i += 17 + n
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan_comps = []
            for c in range(ns):
                cs, tdta = seg[1 + 2 * c], seg[2 + 2 * c]
                comp = next(x for x in comps if x["id"] == cs)
                comp["dc"], comp["ac"] = tdta >> 4, tdta & 15
                scan_comps.append(comp)
            if not progressive:
                scan_pos = pos + 2 + seglen
                break
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ahal = seg[3 + 2 * ns]
            r = _BitReader(data, pos + 2 + seglen)
            _progressive_scan(
                r, scan_comps, huff_dc, huff_ac,
                ss, se, ahal >> 4, ahal & 15,
                mcux, mcuy, restart_interval,
            )
            saw_scan = True
            pos = _next_marker(data, r.pos)
            continue
        pos += 2 + seglen

    if progressive:
        if not saw_scan:
            raise ImageDecodeError("progressive JPEG with no scans")
        scan_comps = comps
    elif scan_pos is None or not comps:
        raise ImageDecodeError("JPEG missing SOS/SOF")
    else:
        # baseline: single interleaved full-band scan
        r = _BitReader(data, scan_pos)
        for c in scan_comps:
            c["bw"] = mcux * c["h"]
            c["bh"] = mcuy * c["v"]
            c["blocks"] = np.zeros((c["bh"] * c["bw"], 64), dtype=np.int32)
            c["pred"] = 0
        mcu_count = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                    r.restart()
                    for c in scan_comps:
                        c["pred"] = 0
                for c in scan_comps:
                    dct, act = huff_dc[c["dc"]], huff_ac[c["ac"]]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            blk = c["blocks"][
                                (my * c["v"] + by) * c["bw"] + (mx * c["h"] + bx)
                            ]
                            size = _huff_decode(r, dct)
                            diff = _extend(r.bits(size), size) if size else 0
                            c["pred"] += diff
                            blk[0] = c["pred"]
                            k = 1
                            while k < 64:
                                rs = _huff_decode(r, act)
                                run, size = rs >> 4, rs & 15
                                if size == 0:
                                    if run == 15:
                                        k += 16
                                        continue
                                    break  # EOB
                                k += run
                                if k > 63:
                                    raise ImageDecodeError("AC run overflow")
                                blk[_ZIGZAG[k]] = _extend(r.bits(size), size)
                                k += 1
                mcu_count += 1

    # dequantize + IDCT all blocks per component in one einsum
    n = np.arange(8)
    cos = np.cos((2 * n[:, None] + 1) * n[None, :] * np.pi / 16)
    cos[:, 0] *= 1 / np.sqrt(2)
    planes = []
    for c in scan_comps:
        coef = c["blocks"].reshape(-1, 8, 8) * qt[c["tq"]][None, :, :]
        spatial = 0.25 * np.einsum("xu,nuv,yv->nxy", cos, coef.astype(np.float64), cos)
        plane = (
            spatial.reshape(c["bh"], c["bw"], 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(c["bh"] * 8, c["bw"] * 8)
        )
        plane = np.clip(np.round(plane) + 128, 0, 255)
        # upsample to full resolution (pixel replication)
        plane = np.repeat(np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        planes.append(plane[:height, :width])
    if len(planes) == 1:
        return width, height, 1, bytearray(planes[0].astype(np.uint8).tobytes())
    if len(planes) != 3:
        raise ImageDecodeError(
            f"{len(planes)}-component JPEG (CMYK/YCCK) not supported (1 or 3 only)"
        )
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb], axis=-1
    )
    return width, height, 3, bytearray(np.clip(np.round(rgb), 0, 255).astype(np.uint8).tobytes())


# ---------------------------------------------------------------------------
# dispatch + transforms
# ---------------------------------------------------------------------------


def decode_image(data: bytes) -> tuple[int, int, int, bytearray]:
    """Decode PNG/BMP/GIF/baseline-JPEG pixels.

    Every failure — including corrupt streams that make zlib/numpy/
    struct raise internally — surfaces as ImageDecodeError so callers
    have a single gate to catch (per-row isolation in operators, the
    UnsupportedFormatError wrap in partition_image)."""
    if data[:8] == _PNG_MAGIC:
        decoder = decode_png
    elif data[:2] == b"BM":
        decoder = decode_bmp
    elif data[:6] in (b"GIF87a", b"GIF89a"):
        decoder = decode_gif
    elif data[:3] == b"\xff\xd8\xff":
        decoder = decode_jpeg
    elif data[:2] in (b"II", b"MM") and data[2:4] in (b"*\x00", b"\x00*"):
        decoder = decode_tiff
    else:
        raise ImageDecodeError("unrecognized image container")
    try:
        return decoder(data)
    except ImageDecodeError:
        raise
    except Exception as e:
        raise ImageDecodeError(f"corrupt {decoder.__name__[7:]} stream: {e}") from e


def resize_nearest(
    width: int, height: int, channels: int, pixels: bytes | bytearray, new_w: int, new_h: int
) -> bytearray:
    """Nearest-neighbor resize (numpy advanced indexing — vectorized)."""
    import numpy as np

    arr = np.frombuffer(bytes(pixels), dtype=np.uint8).reshape(height, width, channels)
    ys = (np.arange(new_h) * height) // new_h
    xs = (np.arange(new_w) * width) // new_w
    return bytearray(arr[ys][:, xs].tobytes())


def luminance_histogram(
    width: int, height: int, channels: int, pixels: bytes | bytearray, bins: int = 16
) -> list[float]:
    """Normalized luminance histogram — the default image feature."""
    import numpy as np

    arr = np.frombuffer(bytes(pixels), dtype=np.uint8).reshape(-1, channels)
    if channels >= 3:
        lum = (
            0.299 * arr[:, 0] + 0.587 * arr[:, 1] + 0.114 * arr[:, 2]
        ).astype(np.uint8)
    else:
        lum = arr[:, 0]
    hist, _ = np.histogram(lum, bins=bins, range=(0, 256))
    return (hist / max(len(lum), 1)).tolist()
