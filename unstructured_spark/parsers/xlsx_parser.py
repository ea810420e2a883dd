"""XLSX → elements via stdlib ``zipfile`` + ``ElementTree`` (no
openpyxl/pandas-excel dependency; OOXML is ZIP+XML).

Behavioral contract from the reference ``partition/xlsx.py``:
- one pass per sheet; ``page_name`` = sheet name, ``page_number`` =
  sheet ordinal (xlsx.py:45-135)
- connected components over the non-empty cell grid split a sheet into
  subtables (xlsx.py:273-356; reference uses networkx
  ``grid_2d_graph``, here a plain BFS — same 4-connectivity)
- leading/trailing single-cell rows of each subtable become standalone
  classified elements (Title/Text/...); the core becomes a ``Table``
  with plain-text + HTML renderings (xlsx.py:358-438)
"""

from __future__ import annotations

import io
import re
import zipfile
import xml.etree.ElementTree as ET
from collections import deque
from html import escape

from unstructured_spark.parsers import classify

S = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
R = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
REL = "{http://schemas.openxmlformats.org/package/2006/relationships}"

_CELL_REF_RE = re.compile(r"([A-Z]+)(\d+)")


def _col_index(letters: str) -> int:
    n = 0
    for ch in letters:
        n = n * 26 + (ord(ch) - 64)
    return n - 1


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
    except (KeyError, ET.ParseError):
        return []
    out = []
    for si in root.findall(f"{S}si"):
        # skip phonetic (<rPh>) runs — furigana hints, not cell text
        texts = []
        direct = si.find(f"{S}t")
        if direct is not None:
            texts.append(direct.text or "")
        for r in si.findall(f"{S}r"):
            t = r.find(f"{S}t")
            if t is not None:
                texts.append(t.text or "")
        out.append("".join(texts))
    return out


def _sheets(zf: zipfile.ZipFile) -> list[tuple[str, str]]:
    """(sheet name, part path) in workbook order."""
    try:
        wb = ET.fromstring(zf.read("xl/workbook.xml"))
        rels_root = ET.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    except (KeyError, ET.ParseError):
        return [
            (n.rsplit("/", 1)[-1][:-4], n)
            for n in sorted(zf.namelist())
            if re.match(r"xl/worksheets/sheet\d+\.xml$", n)
        ]
    rels = {
        rel.get("Id", ""): rel.get("Target", "")
        for rel in rels_root.iter(f"{REL}Relationship")
    }
    out = []
    for sh in wb.iter(f"{S}sheet"):
        rid = sh.get(f"{R}id")
        target = rels.get(rid or "", "")
        if target.startswith("/"):
            path = target.lstrip("/")
        else:
            path = f"xl/{target}"
        out.append((sh.get("name", "Sheet"), path))
    return out


def _fmt_number(raw: str) -> str:
    try:
        f = float(raw)
    except ValueError:
        return raw
    if f.is_integer():
        return str(int(f))
    return str(f)


def _sheet_grid(
    zf: zipfile.ZipFile, path: str, shared: list[str]
) -> dict[tuple[int, int], str]:
    """(row, col) → rendered cell text for non-empty cells."""
    try:
        root = ET.fromstring(zf.read(path))
    except (KeyError, ET.ParseError):
        return {}
    grid: dict[tuple[int, int], str] = {}
    for c in root.iter(f"{S}c"):
        ref = c.get("r", "")
        m = _CELL_REF_RE.match(ref)
        if not m:
            continue
        rc = (int(m.group(2)) - 1, _col_index(m.group(1)))
        ctype = c.get("t", "n")
        text: str | None = None
        if ctype == "s":
            v = c.find(f"{S}v")
            if v is not None and (v.text or "").strip().isdigit():
                idx = int(v.text.strip())
                text = shared[idx] if idx < len(shared) else None
        elif ctype == "inlineStr":
            is_el = c.find(f"{S}is")
            if is_el is not None:
                text = "".join(t.text or "" for t in is_el.iter(f"{S}t"))
        elif ctype == "b":
            v = c.find(f"{S}v")
            if v is not None and v.text is not None:
                text = "True" if v.text.strip() == "1" else "False"
        else:  # n, str, e
            v = c.find(f"{S}v")
            if v is not None and v.text is not None:
                text = _fmt_number(v.text) if ctype == "n" else v.text
        if text is not None and str(text).strip():
            grid[rc] = str(text)
    return grid


def _connected_components(
    cells: set[tuple[int, int]],
) -> list[tuple[int, int, int, int]]:
    """Bounding boxes (r0, c0, r1, c1) of 4-connected components, with
    overlapping boxes merged (two visually-distinct tables whose boxes
    intersect are one subtable in the reference too)."""
    seen: set[tuple[int, int]] = set()
    boxes: list[tuple[int, int, int, int]] = []
    for start in cells:
        if start in seen:
            continue
        q = deque([start])
        seen.add(start)
        r0 = r1 = start[0]
        c0 = c1 = start[1]
        while q:
            r, c = q.popleft()
            r0, r1 = min(r0, r), max(r1, r)
            c0, c1 = min(c0, c), max(c1, c)
            for nb in ((r - 1, c), (r + 1, c), (r, c - 1), (r, c + 1)):
                if nb in cells and nb not in seen:
                    seen.add(nb)
                    q.append(nb)
        boxes.append((r0, c0, r1, c1))
    # merge intersecting boxes to a fixpoint
    merged = True
    while merged:
        merged = False
        for i in range(len(boxes)):
            for j in range(i + 1, len(boxes)):
                a, b = boxes[i], boxes[j]
                if a[0] <= b[2] and b[0] <= a[2] and a[1] <= b[3] and b[1] <= a[3]:
                    boxes[i] = (
                        min(a[0], b[0]),
                        min(a[1], b[1]),
                        max(a[2], b[2]),
                        max(a[3], b[3]),
                    )
                    boxes.pop(j)
                    merged = True
                    break
            if merged:
                break
    boxes.sort()
    return boxes


def _rows_in_box(
    grid: dict[tuple[int, int], str], box: tuple[int, int, int, int]
) -> list[list[str | None]]:
    r0, c0, r1, c1 = box
    return [
        [grid.get((r, c)) for c in range(c0, c1 + 1)]
        for r in range(r0, r1 + 1)
    ]


def _table_element(rows: list[list[str | None]]) -> dict:
    # table text is space-joined across cells AND rows: the reference
    # renders the sheet to HTML and takes HtmlTable.text, which is
    # whitespace-normalized itertext (xlsx.py:89-102, html_table.py:141)
    text = " ".join(
        " ".join(c for c in row if c) for row in rows if any(row)
    ).strip()
    html = ["<table>"]
    for i, row in enumerate(rows):
        tag = "th" if i == 0 else "td"
        html.append(
            "<tr>"
            + "".join(f"<{tag}>{escape(c or '')}</{tag}>" for c in row)
            + "</tr>"
        )
    html.append("</table>")
    return {"type": "Table", "text": text, "text_as_html": "".join(html)}


def xlsx_to_elements(content: bytes) -> list[dict]:
    zf = zipfile.ZipFile(io.BytesIO(content))
    shared = _shared_strings(zf)
    out: list[dict] = []
    for page, (sheet_name, path) in enumerate(_sheets(zf), start=1):
        grid = _sheet_grid(zf, path, shared)
        if not grid:
            continue
        for box in _connected_components(set(grid)):
            rows = _rows_in_box(grid, box)
            # leading/trailing rows with exactly one populated cell are
            # standalone elements, not table rows (xlsx.py:358-438)
            counts = [sum(1 for c in row if c) for row in rows]
            lead = 0
            while lead < len(rows) and counts[lead] == 1:
                lead += 1
            trail = len(rows)
            while trail > lead and counts[trail - 1] == 1:
                trail -= 1
            common = {"page_name": sheet_name, "page_number": page}

            def _single(row: list[str | None]) -> dict:
                cell = next(c for c in row if c)
                etype = classify.element_type_from_text_xlsx(cell)
                if etype == "ListItem" and classify.is_bulleted_text(cell):
                    cell = classify.clean_bullets_text(cell)  # xlsx.py:441-446
                return {
                    "type": etype,
                    "text": cell,
                    **common,
                }

            # an all-single-cell component is not a table at all
            if lead == len(rows):
                out.extend(_single(row) for row in rows)
                continue
            out.extend(_single(rows[i]) for i in range(lead))
            core = rows[lead:trail]
            if core:
                el = _table_element(core)
                el.update(common)
                out.append(el)
            out.extend(_single(rows[i]) for i in range(trail, len(rows)))
    return out
