"""DOCX → elements via stdlib ``zipfile`` + ``ElementTree`` (no
python-docx dependency; OOXML is ZIP+XML).

Behavioral contract from the reference ``partition/docx.py``:
- body blocks (paragraphs, tables) emitted in document order
  (docx.py:393-433)
- paragraph classification: explicit style name first
  (STYLE_TO_ELEMENT_MAPPING, docx.py:58-89), then list-format check,
  then text-based classification (docx.py:435-481)
- ``category_depth`` from numbering ilvl, else style-name suffix
  (docx.py:875-938)
- page breaks (``w:br w:type="page"`` / ``w:lastRenderedPageBreak``)
  emit ``PageBreak`` and advance ``page_number``
- tables → one ``Table`` element with plain-text and HTML renderings
  (docx.py:762-798)
- bold/italic runs → ``emphasized_text_contents/tags`` metadata
- section headers/footers → ``Header``/``Footer`` elements
"""

from __future__ import annotations

import io
import re
import zipfile
import xml.etree.ElementTree as ET
from html import escape

from unstructured_spark.parsers import classify

W = "{http://schemas.openxmlformats.org/wordprocessingml/2006/main}"

# style *name* → element type (reference docx.py:58-89). DOCX XML carries
# style *ids*; styles.xml maps id → name.
_STYLE_MAP = {
    "Caption": "Text",
    "Intense Quote": "Text",
    "Macro Text": "Text",
    "No Spacing": "Text",
    "Quote": "Text",
    "Subtitle": "Title",
    "TOCHeading": "Title",
    "Title": "Title",
}
for _i in range(1, 10):
    _STYLE_MAP[f"Heading {_i}"] = "Title"
for _base in ("List", "List Bullet", "List Continue", "List Number"):
    _STYLE_MAP[_base] = "ListItem"
    for _i in (2, 3):
        _STYLE_MAP[f"{_base} {_i}"] = "ListItem"
_STYLE_MAP["List Paragraph"] = "ListItem"

_BULLET_PREFIX_RE = re.compile(r"^[•‣⁃▪●◦∙\-\*]+\s*")


def _style_names(zf: zipfile.ZipFile) -> dict[str, str]:
    """styleId → human style name from word/styles.xml."""
    try:
        root = ET.fromstring(zf.read("word/styles.xml"))
    except (KeyError, ET.ParseError):
        return {}
    out: dict[str, str] = {}
    for st in root.iter(f"{W}style"):
        sid = st.get(f"{W}styleId")
        name_el = st.find(f"{W}name")
        if sid and name_el is not None:
            out[sid] = name_el.get(f"{W}val", sid)
    return out


def _depth_from_style_name(name: str) -> int:
    m = re.search(r"(\d+)\s*$", name)
    n = int(m.group(1)) - 1 if m else 0
    if name.startswith("Heading") or name.startswith("List"):
        return max(n, 0)
    if name == "Subtitle":
        return 1
    return 0


def _para_text(p: ET.Element) -> str:
    parts: list[str] = []
    for node in p.iter():
        if node.tag == f"{W}t":
            parts.append(node.text or "")
        elif node.tag == f"{W}tab":
            parts.append("\t")
    return "".join(parts)


def _para_emphasis(p: ET.Element) -> tuple[list[str], list[str]]:
    contents: list[str] = []
    tags: list[str] = []
    for r in p.iter(f"{W}r"):
        rpr = r.find(f"{W}rPr")
        if rpr is None:
            continue
        text = "".join(t.text or "" for t in r.iter(f"{W}t")).strip()
        if not text:
            continue
        for mark, tag in ((f"{W}b", "b"), (f"{W}i", "i")):
            el = rpr.find(mark)
            if el is not None and el.get(f"{W}val", "true") not in ("0", "false"):
                contents.append(text)
                tags.append(tag)
    return contents, tags


def _has_page_break(p: ET.Element) -> bool:
    for br in p.iter(f"{W}br"):
        if br.get(f"{W}type") == "page":
            return True
    return any(True for _ in p.iter(f"{W}lastRenderedPageBreak"))


def _table_to_element(tbl: ET.Element) -> dict:
    rows: list[list[str]] = []
    for tr in tbl.findall(f"{W}tr"):
        row = []
        for tc in tr.findall(f"{W}tc"):
            cell = " ".join(
                t for t in (_para_text(p).strip() for p in tc.iter(f"{W}p")) if t
            )
            row.append(cell)
        rows.append(row)
    text = "\n".join(" ".join(c for c in row if c) for row in rows).strip()
    html = ["<table>"]
    for i, row in enumerate(rows):
        tag = "th" if i == 0 else "td"
        html.append(
            "<tr>" + "".join(f"<{tag}>{escape(c)}</{tag}>" for c in row) + "</tr>"
        )
    html.append("</table>")
    return {"type": "Table", "text": text, "text_as_html": "".join(html)}


def _classify_paragraph(
    p: ET.Element, styles: dict[str, str]
) -> tuple[str | None, str, int | None]:
    """Return (element type or None-to-skip, cleaned text, category_depth)."""
    text = _para_text(p)
    if not text.strip():
        return None, "", None
    # reference keeps the raw run text verbatim (incl. trailing tabs);
    # only blank paragraphs are dropped (docx.py:442-452)

    ppr = p.find(f"{W}pPr")
    style_name = None
    has_num = False
    depth: int | None = None
    if ppr is not None:
        pstyle = ppr.find(f"{W}pStyle")
        if pstyle is not None:
            sid = pstyle.get(f"{W}val", "")
            style_name = styles.get(sid) or re.sub(
                r"(?<=[a-z])(?=[A-Z0-9])", " ", sid
            )
        numpr = ppr.find(f"{W}numPr")
        if numpr is not None:
            has_num = True
            ilvl = numpr.find(f"{W}ilvl")
            if ilvl is not None and (ilvl.get(f"{W}val") or "").isdigit():
                depth = int(ilvl.get(f"{W}val"))
    if depth is None and style_name:
        depth = _depth_from_style_name(style_name)

    if has_num or (style_name and _STYLE_MAP.get(style_name) == "ListItem"):
        cleaned = _BULLET_PREFIX_RE.sub("", text).strip()
        return ("ListItem", cleaned, depth) if cleaned else (None, "", None)
    if style_name and style_name in _STYLE_MAP:
        return _STYLE_MAP[style_name], text, depth
    return classify.element_type_from_text_docx(text), text, depth


def docx_to_elements(content: bytes) -> list[dict]:
    zf = zipfile.ZipFile(io.BytesIO(content))
    styles = _style_names(zf)
    try:
        doc = ET.fromstring(zf.read("word/document.xml"))
    except KeyError:
        raise ValueError("not a DOCX: missing word/document.xml")
    body = doc.find(f"{W}body")
    if body is None:
        return []

    out: list[dict] = []

    # section headers/footers first (reference emits them per-section with
    # header_footer_type metadata; one section is the overwhelming case)
    for name in sorted(n for n in zf.namelist() if re.match(r"word/header\d*\.xml", n)):
        root = ET.fromstring(zf.read(name))
        text = " ".join(t for t in (_para_text(p).strip() for p in root.iter(f"{W}p")) if t)
        if text:
            out.append({"type": "Header", "text": text, "page_number": 1})

    page = 1
    for block in body:
        if block.tag == f"{W}p":
            if _has_page_break(block):
                out.append({"type": "PageBreak", "text": "", "page_number": page})
                page += 1
            etype, text, depth = _classify_paragraph(block, styles)
            if etype is None:
                continue
            row: dict = {"type": etype, "text": text, "page_number": page}
            if depth is not None:
                row["category_depth"] = depth
            contents, tags = _para_emphasis(block)
            if contents:
                row["emphasized_text_contents"] = contents
                row["emphasized_text_tags"] = tags
            out.append(row)
        elif block.tag == f"{W}tbl":
            el = _table_to_element(block)
            el["page_number"] = page
            out.append(el)

    for name in sorted(n for n in zf.namelist() if re.match(r"word/footer\d*\.xml", n)):
        root = ET.fromstring(zf.read(name))
        text = " ".join(t for t in (_para_text(p).strip() for p in root.iter(f"{W}p")) if t)
        if text:
            out.append({"type": "Footer", "text": text, "page_number": page})

    return out
