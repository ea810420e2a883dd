"""PPTX → elements via stdlib ``zipfile`` + ``ElementTree`` (no
python-pptx dependency; OOXML is ZIP+XML).

Behavioral contract from the reference ``partition/pptx.py``:
- slides in presentation order; ``page_number`` = slide ordinal
  (pptx.py:141-157)
- shapes ordered by (top, left) position (pptx.py:301-320)
- title-placeholder shape → ``Title`` (pptx.py:270-299)
- bulleted paragraphs (``a:buChar``/``a:buAutoNum``) → ``ListItem``
  with ``category_depth`` = indent level (pptx.py:177-231)
- other paragraphs classified from text (narrative/title/text)
- graphic-frame tables → ``Table`` with HTML (pptx.py:~iter_table)
- slide notes → ``NarrativeText`` when ``include_slide_notes``
  (pptx.py:185-208)
"""

from __future__ import annotations

import io
import re
import zipfile
import xml.etree.ElementTree as ET
from html import escape

from unstructured_spark.parsers import classify

A = "{http://schemas.openxmlformats.org/drawingml/2006/main}"
P = "{http://schemas.openxmlformats.org/presentationml/2006/main}"
R = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
REL = "{http://schemas.openxmlformats.org/package/2006/relationships}"


def _rels(zf: zipfile.ZipFile, part: str) -> dict[str, str]:
    """relationship id → target path, resolved relative to `part`'s dir."""
    base = part.rsplit("/", 1)[0] if "/" in part else ""
    rels_path = f"{base}/_rels/{part.rsplit('/', 1)[-1]}.rels"
    try:
        root = ET.fromstring(zf.read(rels_path))
    except (KeyError, ET.ParseError):
        return {}
    out = {}
    for rel in root.iter(f"{REL}Relationship"):
        target = rel.get("Target", "")
        if target.startswith("/"):
            resolved = target.lstrip("/")
        elif target.startswith("../"):
            resolved = f"{base.rsplit('/', 1)[0]}/{target[3:]}" if "/" in base else target[3:]
        else:
            resolved = f"{base}/{target}" if base else target
        out[rel.get("Id", "")] = resolved
    return out


def _slide_paths(zf: zipfile.ZipFile) -> list[str]:
    """Slides in presentation order (sldIdLst r:id → rels target)."""
    try:
        pres = ET.fromstring(zf.read("ppt/presentation.xml"))
    except (KeyError, ET.ParseError):
        return sorted(
            n for n in zf.namelist() if re.match(r"ppt/slides/slide\d+\.xml$", n)
        )
    rels = _rels(zf, "ppt/presentation.xml")
    paths = []
    for sld in pres.iter(f"{P}sldId"):
        rid = sld.get(f"{R}id")
        if rid and rid in rels:
            paths.append(rels[rid])
    return paths


def _shape_pos(sp: ET.Element) -> tuple[int, int]:
    off = sp.find(f".//{A}off")
    if off is None:
        return (0, 0)
    try:
        return (int(off.get("y", 0)), int(off.get("x", 0)))
    except ValueError:
        return (0, 0)


def _is_title_shape(sp: ET.Element) -> bool:
    ph = sp.find(f".//{P}nvSpPr//{P}ph")
    return ph is not None and ph.get("type") in ("title", "ctrTitle")


def _paragraphs(txbody: ET.Element) -> list[tuple[str, bool, int]]:
    """(text, is_bulleted, indent_level) per a:p."""
    out = []
    for p in txbody.findall(f"{A}p"):
        text = "".join(t.text or "" for t in p.iter(f"{A}t")).strip()
        if not text:
            continue
        ppr = p.find(f"{A}pPr")
        lvl = 0
        bullet = False
        if ppr is not None:
            lvl = int(ppr.get("lvl", 0) or 0)
            bullet = (
                ppr.find(f"{A}buChar") is not None
                or ppr.find(f"{A}buAutoNum") is not None
            )
        out.append((text, bullet, lvl))
    return out


def _table_to_element(tbl: ET.Element) -> dict:
    rows: list[list[str]] = []
    for tr in tbl.findall(f"{A}tr"):
        row = []
        for tc in tr.findall(f"{A}tc"):
            row.append(" ".join(t.text or "" for t in tc.iter(f"{A}t")).strip())
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


def pptx_to_elements(content: bytes, include_slide_notes: bool = False) -> list[dict]:
    zf = zipfile.ZipFile(io.BytesIO(content))
    out: list[dict] = []
    for page, slide_path in enumerate(_slide_paths(zf), start=1):
        try:
            slide = ET.fromstring(zf.read(slide_path))
        except (KeyError, ET.ParseError):
            continue

        if include_slide_notes:
            rels = _rels(zf, slide_path)
            for target in rels.values():
                if "notesSlide" in target and target in zf.namelist():
                    notes = ET.fromstring(zf.read(target))
                    text = " ".join(
                        t.text or "" for t in notes.iter(f"{A}t")
                    ).strip()
                    if text:
                        out.append(
                            {"type": "NarrativeText", "text": text, "page_number": page}
                        )

        tree = slide.find(f"{P}cSld/{P}spTree")
        if tree is None:
            continue
        shapes = [
            el for el in tree if el.tag in (f"{P}sp", f"{P}graphicFrame")
        ]
        shapes.sort(key=_shape_pos)
        for sp in shapes:
            if sp.tag == f"{P}graphicFrame":
                tbl = sp.find(f".//{A}tbl")
                if tbl is not None:
                    el = _table_to_element(tbl)
                    el["page_number"] = page
                    out.append(el)
                continue
            txbody = sp.find(f"{P}txBody")
            if txbody is None:
                continue
            is_title = _is_title_shape(sp)
            for text, bullet, lvl in _paragraphs(txbody):
                if is_title:
                    row = {"type": "Title", "text": text, "page_number": page}
                elif bullet:
                    row = {
                        "type": "ListItem",
                        "text": text,
                        "page_number": page,
                        "category_depth": lvl,
                    }
                else:
                    row = {
                        "type": classify.element_type_from_text(text),
                        "text": text,
                        "page_number": page,
                    }
                out.append(row)
    return out
