"""Legacy binary Office formats on top of the stdlib CFB reader:
.xls (BIFF8), .ppt (PowerPoint 97), .doc (Word 97 piece table).

The reference converts these with LibreOffice ``soffice`` and
re-partitions (``partition/doc.py:14``, ``common/common.py:256-331``).
No soffice exists in this container, so these parse the documented
binary layouts directly:

- .xls: BIFF8 record stream in the ``Workbook`` CFB stream — SST
  (0x00FC) shared strings, LABELSST/NUMBER/RK cell records per sheet
  (BOUNDSHEET offsets) → the same cell grid → connected-component
  subtables as the xlsx parser.
- .ppt: PowerPoint Document stream — TextCharsAtom (0x0FA0, UTF-16LE)
  and TextBytesAtom (0x0FA8, Latin-1) records hold all slide text in
  slide order; SlidePersistAtom boundaries give page numbers.
- .doc: Word Document stream — FIB points at the CLX piece table in
  the 0Table/1Table stream; pieces map character ranges to file
  offsets with a compressed (cp1252) / UTF-16LE flag per piece.
"""

from __future__ import annotations

import struct

from unstructured_spark.parsers.msg_parser import CfbFile
from unstructured_spark.parsers.text_parser import text_to_elements
from unstructured_spark.parsers.xlsx_parser import (
    _connected_components,
    _rows_in_box,
    _table_element,
)
from unstructured_spark.parsers import classify


def _stream(cfb: CfbFile, *names: str) -> bytes | None:
    for e in cfb.entries:
        if e["name"] in names and e["type"] == 2:
            return cfb.read_stream_entry(e)
    return None


# ---------------------------------------------------------------------------
# XLS (BIFF8)
# ---------------------------------------------------------------------------


def _biff_records(data: bytes, start: int = 0):
    pos = start
    while pos + 4 <= len(data):
        opcode, length = struct.unpack_from("<HH", data, pos)
        payload = data[pos + 4 : pos + 4 + length]
        yield pos, opcode, payload
        pos += 4 + length
        if opcode == 0x000A:  # EOF record ends a substream
            yield pos, -1, b""


def _parse_sst(payload: bytes, continues: list[bytes]) -> list[str]:
    """SST record (0x00FC): total + unique counts, then XLUnicodeRichExt
    strings, possibly spilling into CONTINUE records."""
    chunks = [payload] + continues
    strings: list[str] = []
    ci = 0
    pos = 8  # skip cstTotal, cstUnique
    (_, unique) = struct.unpack_from("<II", chunks[0], 0)

    def ensure(n: int) -> bool:
        nonlocal ci, pos
        while ci < len(chunks) and pos >= len(chunks[ci]):
            ci += 1
            pos = 0
        return ci < len(chunks) and pos + n <= len(chunks[ci])

    while len(strings) < unique and ci < len(chunks):
        if not ensure(3):
            break
        buf = chunks[ci]
        cch, flags = struct.unpack_from("<HB", buf, pos)
        pos += 3
        rich = flags & 0x08
        ext = flags & 0x04
        wide = flags & 0x01
        crun = 0
        cbext = 0
        if rich:
            if not ensure(2):  # run header may abut a CONTINUE boundary
                break
            buf = chunks[ci]
            (crun,) = struct.unpack_from("<H", buf, pos)
            pos += 2
        if ext:
            if not ensure(4):
                break
            buf = chunks[ci]
            (cbext,) = struct.unpack_from("<I", buf, pos)
            pos += 4
        out = []
        remaining = cch
        while remaining > 0:
            if pos >= len(chunks[ci]):
                ci += 1
                pos = 0
                if ci >= len(chunks):
                    break
                # continuation restates the wide flag
                wide = chunks[ci][0] & 0x01
                pos = 1
            buf = chunks[ci]
            avail = len(buf) - pos
            if wide:
                take = min(remaining, avail // 2)
                out.append(
                    buf[pos : pos + take * 2].decode("utf-16-le", errors="replace")
                )
                pos += take * 2
            else:
                take = min(remaining, avail)
                out.append(buf[pos : pos + take].decode("latin-1"))
                pos += take
            remaining -= take
            if take == 0:
                break
        skip = crun * 4 + cbext
        while skip > 0 and ci < len(chunks):
            avail = len(chunks[ci]) - pos
            adv = min(skip, avail)
            pos += adv
            skip -= adv
            if skip > 0:
                ci += 1
                pos = 0
        strings.append("".join(out))
    return strings


def _rk_value(rk: int) -> float:
    cents = rk & 0x01
    if rk & 0x02:  # signed 30-bit integer
        val = float(struct.unpack("<i", struct.pack("<I", rk))[0] >> 2)
    else:  # high 30 bits of an IEEE double
        val = struct.unpack("<d", b"\x00\x00\x00\x00" + struct.pack("<I", rk & 0xFFFFFFFC))[0]
    return val / 100.0 if cents else val


def _fmt_num(v: float) -> str:
    return str(int(v)) if float(v).is_integer() else str(v)


def xls_to_elements(content: bytes) -> list[dict]:
    cfb = CfbFile(content)
    wb = _stream(cfb, "Workbook", "Book")
    if wb is None:
        raise ValueError("not an XLS: no Workbook stream")

    # global substream: SST + BOUNDSHEETs
    sst: list[str] = []
    sheets: list[tuple[str, int]] = []  # (name, stream offset)
    pending_sst: bytes | None = None
    pending_cont: list[bytes] = []
    for pos, opcode, payload in _biff_records(wb):
        if opcode == -1:
            break
        if opcode == 0x00FC:
            pending_sst = payload
            pending_cont = []
        elif opcode == 0x003C and pending_sst is not None:
            pending_cont.append(payload)
        elif pending_sst is not None and opcode not in (0x00FC, 0x003C):
            sst = _parse_sst(pending_sst, pending_cont)
            pending_sst = None
        if opcode == 0x0085:  # BOUNDSHEET
            (offset,) = struct.unpack_from("<I", payload, 0)
            cch = payload[6]
            wide = payload[7] & 0x01
            if wide:
                name = payload[8 : 8 + cch * 2].decode("utf-16-le", errors="replace")
            else:
                name = payload[8 : 8 + cch].decode("latin-1")
            sheets.append((name, offset))
    if pending_sst is not None:
        sst = _parse_sst(pending_sst, pending_cont)

    out: list[dict] = []
    for page, (sheet_name, offset) in enumerate(sheets, start=1):
        grid: dict[tuple[int, int], str] = {}
        for pos, opcode, payload in _biff_records(wb, offset):
            if opcode == -1:
                break
            if opcode == 0x00FD and len(payload) >= 10:  # LABELSST
                r, c, _xf, isst = struct.unpack_from("<HHHI", payload, 0)
                if isst < len(sst) and sst[isst].strip():
                    grid[(r, c)] = sst[isst]
            elif opcode == 0x0203 and len(payload) >= 14:  # NUMBER
                r, c, _xf = struct.unpack_from("<HHH", payload, 0)
                (v,) = struct.unpack_from("<d", payload, 6)
                grid[(r, c)] = _fmt_num(v)
            elif opcode == 0x027E and len(payload) >= 10:  # RK
                r, c, _xf, rk = struct.unpack_from("<HHHI", payload, 0)
                grid[(r, c)] = _fmt_num(_rk_value(rk))
            elif opcode == 0x00BD:  # MULRK
                r, c0 = struct.unpack_from("<HH", payload, 0)
                n = (len(payload) - 6) // 6
                for k in range(n):
                    _xf, rk = struct.unpack_from("<HI", payload, 4 + k * 6)
                    grid[(r, c0 + k)] = _fmt_num(_rk_value(rk))
            elif opcode == 0x0516 and len(payload) >= 8:  # LABEL (rare)
                r, c, _xf, cch = struct.unpack_from("<HHHH", payload, 0)
                grid[(r, c)] = payload[9 : 9 + cch].decode("latin-1")
        if not grid:
            continue
        common = {"page_name": sheet_name, "page_number": page}
        for box in _connected_components(set(grid)):
            rows = _rows_in_box(grid, box)
            counts = [sum(1 for x in row if x) for row in rows]
            lead = 0
            while lead < len(rows) and counts[lead] == 1:
                lead += 1
            trail = len(rows)
            while trail > lead and counts[trail - 1] == 1:
                trail -= 1

            def single(row):
                cell = next(x for x in row if x)
                etype = classify.element_type_from_text_xlsx(cell)
                if etype == "ListItem" and classify.is_bulleted_text(cell):
                    cell = classify.clean_bullets_text(cell)  # xlsx.py:441-446
                return {
                    "type": etype,
                    "text": cell,
                    **common,
                }

            if lead == len(rows):
                out.extend(single(r_) for r_ in rows)
                continue
            out.extend(single(rows[i]) for i in range(lead))
            core = rows[lead:trail]
            if core:
                el = _table_element(core)
                el.update(common)
                out.append(el)
            out.extend(single(rows[i]) for i in range(trail, len(rows)))
    return out


# ---------------------------------------------------------------------------
# PPT (PowerPoint 97)
# ---------------------------------------------------------------------------


_PPT_MAINMASTER = 0x03F8
_PPT_NOTES = 0x03F0
_PPT_SLIDE = 0x03EE
_PPT_SLIDE_LIST = 0x0FF0  # instance 0 = slides; 1 = masters; 2 = notes
_PPT_SLIDE_PERSIST = 0x03F3
_PPT_TEXT_HEADER = 0x0F9F  # tells the text type of the next text atom
_PPT_TEXT_CHARS = 0x0FA0
_PPT_TEXT_BYTES = 0x0FA8
_PPT_TITLE_TYPES = {0, 6}  # title / center-title


def ppt_to_elements(content: bytes) -> list[dict]:
    cfb = CfbFile(content)
    doc = _stream(cfb, "PowerPoint Document")
    if doc is None:
        raise ValueError("not a PPT: no PowerPoint Document stream")
    out: list[dict] = []
    state = {"page": 0, "text_type": None}

    def emit(text: str) -> None:
        page = max(state["page"], 1)
        is_title = state["text_type"] in _PPT_TITLE_TYPES
        for para in text.replace("\r", "\n").split("\n"):
            para = para.strip().strip("\x00")
            if not para:
                continue
            out.append(
                {
                    "type": "Title" if is_title else classify.element_type_from_text(para),
                    "text": para,
                    "page_number": page,
                }
            )

    # drawing-scheme files store slide text inside Slide containers;
    # outline-scheme files store it in the SlideListWithText — detect
    # which one paginates
    has_slide_containers = False
    pos = 0
    while pos + 8 <= len(doc):
        verinst, rectype, reclen = struct.unpack_from("<HHI", doc, pos)
        if rectype == _PPT_SLIDE and (verinst & 0x0F) == 0x0F:
            has_slide_containers = True
            break
        pos += 8 + reclen

    def walk(start: int, end: int) -> None:
        pos = start
        while pos + 8 <= end:
            verinst, rectype, reclen = struct.unpack_from("<HHI", doc, pos)
            body = pos + 8
            stop = min(body + reclen, end)
            if (verinst & 0x0F) == 0x0F:  # container record
                instance = verinst >> 4
                if rectype in (_PPT_MAINMASTER, _PPT_NOTES):
                    pass  # template/notes text is not slide content
                elif rectype == _PPT_SLIDE_LIST and instance != 0:
                    pass  # master/notes list
                else:
                    if rectype == _PPT_SLIDE:
                        state["page"] += 1
                        state["text_type"] = None
                    walk(body, stop)
            elif rectype == _PPT_SLIDE_PERSIST and not has_slide_containers:
                state["page"] += 1
                state["text_type"] = None
            elif rectype == _PPT_TEXT_HEADER and reclen >= 4:
                (state["text_type"],) = struct.unpack_from("<I", doc, body)
            elif rectype == _PPT_TEXT_CHARS:
                emit(doc[body:stop].decode("utf-16-le", errors="replace"))
                state["text_type"] = None
            elif rectype == _PPT_TEXT_BYTES:
                emit(doc[body:stop].decode("latin-1", errors="replace"))
                state["text_type"] = None
            pos = body + reclen
        return

    walk(0, len(doc))
    return out


# ---------------------------------------------------------------------------
# DOC (Word 97) — piece-table text extraction
# ---------------------------------------------------------------------------


def _doc_text(cfb: CfbFile) -> str:
    word = _stream(cfb, "WordDocument")
    if word is None:
        raise ValueError("not a DOC: no WordDocument stream")
    flags = struct.unpack_from("<H", word, 0x000A)[0]
    which_table = "1Table" if flags & 0x0200 else "0Table"
    table = _stream(cfb, which_table) or _stream(cfb, "0Table", "1Table")
    (fc_clx,) = struct.unpack_from("<I", word, 0x01A2)
    (lcb_clx,) = struct.unpack_from("<I", word, 0x01A6)
    if table is None or lcb_clx == 0:
        # fallback: fcMin..fcMac contiguous text (pre-97 simple layout)
        fc_min, fc_mac = struct.unpack_from("<II", word, 0x0018)
        return word[fc_min:fc_mac].decode("cp1252", errors="replace")
    clx = table[fc_clx : fc_clx + lcb_clx]
    # CLX = (Prc)* Pcdt; Pcdt starts with 0x02 then length then PlcPcd
    pos = 0
    while pos < len(clx) and clx[pos] == 0x01:  # Prc: skip grpprl
        (cb,) = struct.unpack_from("<H", clx, pos + 1)
        pos += 3 + cb
    if pos >= len(clx) or clx[pos] != 0x02:
        fc_min, fc_mac = struct.unpack_from("<II", word, 0x0018)
        return word[fc_min:fc_mac].decode("cp1252", errors="replace")
    (lcb,) = struct.unpack_from("<I", clx, pos + 1)
    plc = clx[pos + 5 : pos + 5 + lcb]
    n = (len(plc) - 4) // 12  # n pieces: (n+1) CPs + n PCDs
    cps = struct.unpack_from(f"<{n + 1}I", plc, 0)
    parts: list[str] = []
    for i in range(n):
        pcd = plc[(n + 1) * 4 + i * 8 : (n + 1) * 4 + (i + 1) * 8]
        (fc_raw,) = struct.unpack_from("<I", pcd, 2)
        compressed = bool(fc_raw & 0x40000000)
        fc = fc_raw & 0x3FFFFFFF
        count = cps[i + 1] - cps[i]
        if compressed:
            parts.append(word[fc // 2 : fc // 2 + count].decode("cp1252", errors="replace"))
        else:
            parts.append(
                word[fc : fc + count * 2].decode("utf-16-le", errors="replace")
            )
    return "".join(parts)


def doc_to_elements(content: bytes) -> list[dict]:
    text = _doc_text(CfbFile(content))
    # Word control chars: \r paragraph, \x07 cell/row, \x0c page
    text = (
        text.replace("\x07", "\n")
        .replace("\x0c", "\n\n")
        .replace("\r", "\n\n")
        .replace("\x0b", "\n")
    )
    import re as _re

    text = _re.sub(r"[\x00-\x08\x0e-\x1f]", "", text)
    return text_to_elements(text)
