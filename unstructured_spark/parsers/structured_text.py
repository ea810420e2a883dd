"""reStructuredText and Org-mode → elements (reference converts both
via pandoc→HTML, ``partition/epub.py:15-60`` pattern /
``file_utils/file_conversion.py:60``; here the lightweight structural
markup is interpreted directly).

- RST: section titles by underline/overline adornment (=-`:'"~^_*+#),
  zero-indexed depth by adornment first-seen order, bullet/enumerated
  lists, ``::`` literal blocks → CodeSnippet, paragraphs classified.
- Org: ``*`` heading stars → depth, ``-``/``+`` lists,
  ``#+BEGIN_SRC..#+END_SRC`` → CodeSnippet, paragraphs classified.
"""

from __future__ import annotations

import re

from unstructured_spark.parsers import classify

_RST_ADORN = set("=-`:'\"~^_*+#")


def rst_to_elements(content: str) -> list[dict]:
    lines = content.splitlines()
    out: list[dict] = []
    adorn_order: list[str] = []
    para: list[str] = []
    in_literal = False
    literal: list[str] = []

    def flush_para() -> None:
        if not para:
            return
        text = " ".join(" ".join(para).split())
        para.clear()
        if not text:
            return
        if re.match(r"^[-*+]\s+", text):
            for item in re.split(r"(?:^|\s)[-*+]\s+", text):
                item = item.strip()
                if item:
                    out.append({"type": "ListItem", "text": item})
        elif re.match(r"^\d+[.)]\s+", text):
            out.append({"type": "ListItem", "text": re.sub(r"^\d+[.)]\s+", "", text)})
        else:
            out.append({"type": classify.element_type_from_text(text), "text": text})

    i = 0
    while i < len(lines):
        line = lines[i]
        stripped = line.strip()
        if in_literal:
            if stripped and not line.startswith((" ", "\t")):
                in_literal = False
                code = "\n".join(literal).rstrip()
                literal.clear()
                if code:
                    out.append({"type": "CodeSnippet", "text": code})
                continue  # reprocess this line as normal text
            literal.append(line)
            i += 1
            continue
        # title: text line + adornment underline at least as long
        if (
            stripped
            and i + 1 < len(lines)
            and lines[i + 1].strip()
            and set(lines[i + 1].strip()) <= _RST_ADORN
            and len(set(lines[i + 1].strip())) == 1
            and len(lines[i + 1].strip()) >= len(stripped)
            and not para
        ):
            ch = lines[i + 1].strip()[0]
            if ch not in adorn_order:
                adorn_order.append(ch)
            out.append(
                {
                    "type": "Title",
                    "text": stripped,
                    "category_depth": adorn_order.index(ch),
                }
            )
            i += 2
            continue
        if stripped.startswith(".. "):
            # directive/comment block: skip it and its indented body
            flush_para()
            i += 1
            while i < len(lines) and (
                not lines[i].strip() or lines[i].startswith((" ", "\t"))
            ):
                i += 1
            continue
        if not stripped:
            flush_para()
        elif stripped.endswith("::"):
            para.append(stripped[:-2].rstrip() or "")
            flush_para()
            in_literal = True
        else:
            para.append(stripped)
        i += 1
    if in_literal and literal:
        code = "\n".join(literal).rstrip()
        if code:
            out.append({"type": "CodeSnippet", "text": code})
    flush_para()
    return out


def org_to_elements(content: str) -> list[dict]:
    lines = content.splitlines()
    out: list[dict] = []
    para: list[str] = []
    in_src = False
    src: list[str] = []

    def flush_para() -> None:
        if not para:
            return
        text = " ".join(" ".join(para).split())
        para.clear()
        if text:
            out.append({"type": classify.element_type_from_text(text), "text": text})

    for line in lines:
        stripped = line.strip()
        if in_src:
            if stripped.upper().startswith("#+END_SRC"):
                in_src = False
                if src:
                    out.append({"type": "CodeSnippet", "text": "\n".join(src).rstrip()})
                src = []
            else:
                src.append(line)
            continue
        m = re.match(r"^(\*+)\s+(.*)$", line)
        if m:
            flush_para()
            out.append(
                {
                    "type": "Title",
                    "text": m.group(2).strip(),
                    "category_depth": len(m.group(1)) - 1,
                }
            )
            continue
        if stripped.upper().startswith("#+BEGIN_SRC"):
            flush_para()
            in_src = True
            continue
        if stripped.startswith("#+"):  # other directives: skip
            continue
        lm = re.match(r"^\s*[-+]\s+(.*)$", line)
        if lm:
            flush_para()
            out.append({"type": "ListItem", "text": lm.group(1).strip()})
            continue
        if not stripped:
            flush_para()
        else:
            para.append(stripped)
    flush_para()
    return out
