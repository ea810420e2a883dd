"""CSV/TSV → a single Table element (reference ``partition/csv.py``:
whole file becomes one Table with an HTML rendering; delimiter sniffed
over ``,;|\\t``).

Note the reference's *document* semantics: a CSV treated as a document
is one Table element. Treating CSV as *data* is `spark.read.csv` —
exposed separately via ``sources``.
"""

from __future__ import annotations

import csv
import io
from html import escape


def sniff_delimiter(sample: str, candidates: str = ",;|\t") -> str:
    try:
        return csv.Sniffer().sniff(sample, delimiters=candidates).delimiter
    except csv.Error:
        return ","


def _to_html(rows: list[list[str]]) -> str:
    parts = ["<table>"]
    for row in rows:
        parts.append("<tr>" + "".join(f"<td>{escape(c)}</td>" for c in row) + "</tr>")
    parts.append("</table>")
    return "".join(parts)


def csv_to_elements(content: str, delimiter: str | None = None) -> list[dict]:
    if not content.strip():
        return []
    delim = delimiter or sniff_delimiter(content[:4096])
    rows = [r for r in csv.reader(io.StringIO(content), delimiter=delim)]
    if not rows:
        return []
    # table text is whitespace-normalized across cells AND rows — the
    # reference takes HtmlTable.text of the rendered sheet
    # (csv.py:23-78, html_table.py:141-146)
    text = " ".join(
        " ".join(" ".join(c.split()) for c in row if c.strip()) for row in rows
    ).strip()
    text = " ".join(text.split())
    return [{"type": "Table", "text": text, "text_as_html": _to_html(rows)}]


def tsv_to_elements(content: str) -> list[dict]:
    return csv_to_elements(content, delimiter="\t")
