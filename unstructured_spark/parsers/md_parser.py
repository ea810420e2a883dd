"""Markdown → elements (reference ``partition/md.py`` routes through an
HTML conversion; this env has no markdown package, so a direct
line-oriented parser produces the same element stream: ATX headings →
Title(depth), fenced code → CodeSnippet, list items → ListItem, tables
→ Table, blank-line paragraphs → classified text)."""

from __future__ import annotations

import re
from html import escape

from unstructured_spark.parsers import classify

_HEADING_RE = re.compile(r"^(#{1,6})\s+(.*?)\s*#*\s*$")
_BULLET_RE = re.compile(r"^\s*[-*+]\s+(.*)$")
_NUMBERED_RE = re.compile(r"^\s*\d{1,3}[.)]\s+(.*)$")
_FENCE_RE = re.compile(r"^\s*(```|~~~)\s*(\w+)?\s*$")
_TABLE_ROW_RE = re.compile(r"^\s*\|.*\|\s*$")
_TABLE_SEP_RE = re.compile(r"^\s*\|?[\s:|-]+\|?\s*$")
_INLINE_MD_RE = re.compile(r"(\*\*|__|\*|_|`)")


def _strip_inline(text: str) -> str:
    return _INLINE_MD_RE.sub("", text).strip()


def _table_cells(line: str) -> list[str]:
    return [c.strip() for c in line.strip().strip("|").split("|")]


def md_to_elements(text: str) -> list[dict]:
    lines = text.split("\n")
    out: list[dict] = []
    i = 0
    para: list[str] = []

    def flush_para():
        nonlocal para
        t = " ".join(s.strip() for s in para).strip()
        para = []
        if t:
            t = _strip_inline(t)
            out.append({"type": classify.element_type_from_text(t), "text": t})

    while i < len(lines):
        line = lines[i]
        fence = _FENCE_RE.match(line)
        if fence:
            flush_para()
            marker = fence.group(1)
            code: list[str] = []
            i += 1
            while i < len(lines) and not lines[i].strip().startswith(marker):
                code.append(lines[i])
                i += 1
            i += 1  # skip closing fence
            if code:
                out.append({"type": "CodeSnippet", "text": "\n".join(code)})
            continue
        h = _HEADING_RE.match(line)
        if h:
            flush_para()
            out.append(
                {
                    "type": "Title",
                    "text": _strip_inline(h.group(2)),
                    "category_depth": len(h.group(1)) - 1,
                }
            )
            i += 1
            continue
        if _TABLE_ROW_RE.match(line):
            flush_para()
            rows = []
            while i < len(lines) and _TABLE_ROW_RE.match(lines[i]):
                if not _TABLE_SEP_RE.match(lines[i]):
                    rows.append(_table_cells(lines[i]))
                i += 1
            if rows:
                html = "<table>" + "".join(
                    "<tr>" + "".join(f"<td>{escape(c)}</td>" for c in r) + "</tr>"
                    for r in rows
                ) + "</table>"
                text_r = "\n".join(" ".join(c for c in r if c) for r in rows)
                out.append({"type": "Table", "text": text_r, "text_as_html": html})
            continue
        b = _BULLET_RE.match(line) or _NUMBERED_RE.match(line)
        if b:
            flush_para()
            out.append({"type": "ListItem", "text": _strip_inline(b.group(1))})
            i += 1
            continue
        if not line.strip():
            flush_para()
            i += 1
            continue
        para.append(line)
        i += 1
    flush_para()
    return out
