"""ODT / EPUB / RTF → elements with stdlib only.

The reference shells out to pandoc/soffice for these
(``partition/epub.py:15-60``, ``partition/odt.py:15-125``,
``file_utils/file_conversion.py:60``) and then re-partitions the
converted HTML/DOCX. Here each format is parsed directly:

- ODT: ZIP + ODF ``content.xml`` — headings (``text:h`` with
  ``outline-level``), paragraphs, list items, tables.
- EPUB: ZIP + OPF spine — each spine chapter's XHTML runs through the
  HTML parser; chapter ordinal becomes ``page_number``.
- RTF: control-word stripper state machine → plain text → text
  partitioner.
"""

from __future__ import annotations

import io
import re
import zipfile
import xml.etree.ElementTree as ET
from html import escape

from unstructured_spark.parsers import classify
from unstructured_spark.parsers.html_parser import html_to_elements
from unstructured_spark.parsers.text_parser import text_to_elements

TEXT = "{urn:oasis:names:tc:opendocument:xmlns:text:1.0}"
TABLE = "{urn:oasis:names:tc:opendocument:xmlns:table:1.0}"


# ---------------------------------------------------------------------------
# ODT
# ---------------------------------------------------------------------------


def _odt_text(el: ET.Element) -> str:
    return " ".join("".join(el.itertext()).split())


def odt_to_elements(content: bytes) -> list[dict]:
    zf = zipfile.ZipFile(io.BytesIO(content))
    root = ET.fromstring(zf.read("content.xml"))
    out: list[dict] = []

    def walk(node: ET.Element) -> None:
        for child in node:
            if child.tag == f"{TEXT}h":
                text = _odt_text(child)
                if text:
                    lvl = child.get(f"{TEXT}outline-level", "1")
                    depth = int(lvl) - 1 if lvl.isdigit() else 0
                    out.append(
                        {"type": "Title", "text": text, "category_depth": depth}
                    )
            elif child.tag == f"{TEXT}p":
                text = _odt_text(child)
                if text:
                    out.append(
                        {"type": classify.element_type_from_text(text), "text": text}
                    )
            elif child.tag == f"{TEXT}list":
                for item in child.iter(f"{TEXT}list-item"):
                    text = _odt_text(item)
                    if text:
                        out.append({"type": "ListItem", "text": text})
            elif child.tag == f"{TABLE}table":
                rows = []
                for tr in child.iter(f"{TABLE}table-row"):
                    rows.append(
                        [_odt_text(tc) for tc in tr.findall(f"{TABLE}table-cell")]
                    )
                text = "\n".join(
                    " ".join(c for c in row if c) for row in rows
                ).strip()
                html = ["<table>"]
                for i, row in enumerate(rows):
                    tag = "th" if i == 0 else "td"
                    html.append(
                        "<tr>"
                        + "".join(f"<{tag}>{escape(c)}</{tag}>" for c in row)
                        + "</tr>"
                    )
                html.append("</table>")
                if text:
                    out.append(
                        {"type": "Table", "text": text, "text_as_html": "".join(html)}
                    )
            else:
                walk(child)

    walk(root)
    return out


# ---------------------------------------------------------------------------
# EPUB
# ---------------------------------------------------------------------------

_OPF_NS = "{http://www.idpf.org/2007/opf}"
_CNT_NS = "{urn:oasis:names:tc:opendocument:xmlns:container}"


def epub_to_elements(content: bytes) -> list[dict]:
    zf = zipfile.ZipFile(io.BytesIO(content))
    # locate the OPF package file via META-INF/container.xml
    opf_path = None
    try:
        container = ET.fromstring(zf.read("META-INF/container.xml"))
        rf = container.find(f".//{_CNT_NS}rootfile")
        if rf is not None:
            opf_path = rf.get("full-path")
    except (KeyError, ET.ParseError):
        pass
    chapters: list[str] = []
    if opf_path and opf_path in zf.namelist():
        base = opf_path.rsplit("/", 1)[0] + "/" if "/" in opf_path else ""
        opf = ET.fromstring(zf.read(opf_path))
        items = {
            it.get("id", ""): it.get("href", "")
            for it in opf.iter(f"{_OPF_NS}item")
        }
        for ref in opf.iter(f"{_OPF_NS}itemref"):
            href = items.get(ref.get("idref", ""))
            if href and (base + href) in zf.namelist():
                chapters.append(base + href)
    if not chapters:  # no/broken manifest: fall back to name order
        chapters = sorted(
            n for n in zf.namelist() if n.endswith((".xhtml", ".html", ".htm"))
        )
    out: list[dict] = []
    for page, name in enumerate(chapters, start=1):
        raw = zf.read(name).decode("utf-8", errors="replace")
        for el in html_to_elements(raw):
            el["page_number"] = page
            out.append(el)
    return out


# ---------------------------------------------------------------------------
# RTF
# ---------------------------------------------------------------------------

_RTF_TOKEN_RE = re.compile(
    rb"\\'([0-9a-fA-F]{2})"  # hex escape
    rb"|\\u(-?\d+)\s?"  # unicode escape
    rb"|\\([a-zA-Z]+)(-?\d+)? ?"  # control word
    rb"|\\([^a-zA-Z])"  # control symbol
    rb"|([{}])"  # group delimiters
)

# destination groups whose content is not document text
_RTF_SKIP_DESTS = {
    b"fonttbl", b"colortbl", b"stylesheet", b"info", b"pict",
    b"header", b"footer", b"xmlnstbl", b"themedata", b"generator",
    b"listtable", b"listoverridetable", b"latentstyles", b"rsidtbl",
}


def rtf_to_text(content: bytes) -> str:
    out: list[str] = []
    depth = 0
    skip_until_depth: int | None = None
    i = 0
    while i < len(content):
        m = _RTF_TOKEN_RE.match(content, i)
        if not m:
            ch = content[i : i + 1]
            if skip_until_depth is None and ch not in (b"\r", b"\n"):
                out.append(ch.decode("latin-1"))
            i += 1
            continue
        i = m.end()
        hexesc, uni, word, _param, sym, brace = (
            m.group(1), m.group(2), m.group(3), m.group(4), m.group(5), m.group(6),
        )
        if brace == b"{":
            depth += 1
            # a destination marker is "{\*" or "{\<dest>" right after the brace
            look = content[i : i + 24]
            dm = re.match(rb"\\\*?\\?([a-zA-Z]+)", look)
            if skip_until_depth is None and (
                look.startswith(b"\\*")
                or (dm and dm.group(1) in _RTF_SKIP_DESTS)
            ):
                skip_until_depth = depth
        elif brace == b"}":
            if skip_until_depth is not None and depth == skip_until_depth:
                skip_until_depth = None
            depth -= 1
        elif skip_until_depth is not None:
            continue
        elif hexesc is not None:
            out.append(bytes([int(hexesc, 16)]).decode("latin-1"))
        elif uni is not None:
            code = int(uni)
            out.append(chr(code + 65536 if code < 0 else code))
            # consume the ANSI fallback that follows \uN (either \'xx or
            # one literal character)
            if content[i : i + 2] == b"\\'":
                i += 4
            elif content[i : i + 1] not in (b"\\", b"{", b"}", b""):
                i += 1
        elif word is not None:
            if word in (b"par", b"line", b"sect", b"page"):
                out.append("\n\n" if word in (b"par", b"sect", b"page") else "\n")
            elif word in (b"tab", b"cell"):
                out.append("\t")
            elif word in (b"emdash",):
                out.append("—")
            elif word in (b"endash",):
                out.append("–")
            elif word in (b"lquote", b"rquote"):
                out.append("‘" if word == b"lquote" else "’")
            elif word in (b"ldblquote", b"rdblquote"):
                out.append("“" if word == b"ldblquote" else "”")
        elif sym is not None:
            if sym in (b"\\", b"{", b"}"):
                out.append(sym.decode("latin-1"))
            elif sym == b"~":
                out.append("\xa0")
    return "".join(out)


def rtf_to_elements(content: bytes) -> list[dict]:
    return text_to_elements(rtf_to_text(content))
