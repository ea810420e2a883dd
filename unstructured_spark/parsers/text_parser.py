"""Plain-text → elements (Python mirror of the native partition_text
operator, for use inside the auto-router UDF; reference
``partition/text.py:42-166``)."""

from __future__ import annotations

import re

from unstructured_spark.functions.patterns import _BULLET_CLASS
from unstructured_spark.parsers import classify

PARAGRAPH_RE = re.compile(r"\n\s*\n")
_WS_RE = re.compile(r"\s+")

# newline-ratio dispatch threshold for auto paragraph grouping
# (reference cleaners/core.py:107-265: ratio < 0.1 → blank-line style)
_NEWLINE_RATIO_THRESHOLD = 0.1


# a newline that starts a bulleted/numbered line is a paragraph break
# (reference group_bullet_paragraph, cleaners/core.py:183-211)
_LIST_LINE_RE = re.compile(
    r"\n(?=\s*(?:[" + _BULLET_CLASS + r"]|\d{1,3}[.)])\s)"
)


def group_broken_paragraphs(text: str) -> str:
    sentinel = "\x00PARA\x00"
    t = PARAGRAPH_RE.sub(sentinel, text)
    t = _LIST_LINE_RE.sub(sentinel, t)
    t = re.sub(r"\s*\n\s*", " ", t)
    return t.replace(sentinel, "\n\n")


def auto_paragraph_group(text: str) -> str:
    """Reference auto_paragraph_grouper: if single-newline lines dominate
    (few blank-line breaks), re-join hard-wrapped lines."""
    lines = text.split("\n")
    if not lines:
        return text
    empty = sum(1 for ln in lines if not ln.strip())
    ratio = empty / len(lines)
    if ratio < _NEWLINE_RATIO_THRESHOLD:
        return re.sub(r"\s*\n\s*", " ", text)
    return group_broken_paragraphs(text)


def text_to_elements(
    text: str, paragraph_grouper: str | None = None
) -> list[dict]:
    """Split into paragraphs and classify each (no metadata pass)."""
    if paragraph_grouper == "auto":
        text = auto_paragraph_group(text)
    elif paragraph_grouper == "group_broken":
        text = group_broken_paragraphs(text)
    out: list[dict] = []
    for para in PARAGRAPH_RE.split(text):
        t = _WS_RE.sub(" ", para).strip()
        if not t:
            continue
        etype = classify.element_type_from_text(t)
        if etype == "ListItem" and classify.is_bulleted_text(t):
            # bulleted ListItems lose the bullet char (reference
            # partition/text.py:128-134 → clean_bullets)
            t = classify.clean_bullets_text(t)
        out.append({"type": etype, "text": t})
    return out
