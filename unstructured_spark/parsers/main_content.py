"""Main-content extraction (boilerplate removal) for web pages — the
step every crawl-to-corpus pipeline (CCNet / RefinedWeb / Dolma) runs
between WARC ingest and quality filtering: drop navigation, headers,
footers, sidebars, link farms, cookie banners; keep the article.

jusText-shaped block classifier (Pomikálek 2011), deliberately
integer-pure so the whole decision procedure replays in SQL:

1. Segment the page into BLOCKS at block-level tag boundaries
   (``segment_blocks``), accumulating per block the visible text, its
   normalized character count, the characters contributed inside
   ``<a>`` (link chars), whether any open ancestor carries a
   boilerplate hint (``<nav>``/``<footer>``/… or a class/id like
   ``sidebar``/``comment``/``cookie``), and whether the block is a
   heading.
2. Context-free classification (``classify_blocks``): ancestor hint →
   ``bad``; integer link density ``100*link_chars > 33*chars`` →
   ``bad``; normalized length ≥ ``short_chars`` → ``good``; otherwise
   UNDECIDED.
3. Context smoothing: an undecided heading is ``good`` iff its nearest
   DECIDED following block is good (headline promotion); any other
   undecided block is ``good`` iff its nearest decided neighbors on
   BOTH sides are good (a missing side counts as bad — pages start
   and end in chrome).

All counts use explicit ASCII whitespace normalization
(``[ \\t\\r\\n\\f]+`` → one space, trimmed) so Python, Spark and
DuckDB replays agree byte-for-byte.

Reference analog: partition_html keeps every element
(unstructured/partition/html/*); main-content selection is
beyond-reference surface for the crawl pipeline.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

_WS = re.compile(r"[ \t\r\n\f]+")

#: tags that OPEN a new block (and close the previous one)
BLOCK_TAGS = frozenset(
    "p h1 h2 h3 h4 h5 h6 li dt dd td th blockquote pre div section"
    " article main nav aside footer header figure figcaption table tr"
    " ul ol form fieldset address summary details".split()
)

HEADING_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})

#: elements whose ENTIRE subtree is boilerplate chrome
HINT_TAGS = frozenset({"nav", "aside", "footer", "header"})

#: content that never renders
SKIP_TAGS = frozenset({"script", "style", "template", "noscript", "svg",
                       "head", "iframe", "select", "option", "button"})

#: class/id fragments that mark chrome subtrees (word-ish match: the
#: fragment must not be embedded in a longer alphabetic run, so
#: "sidebar" hits class="left-sidebar" but "ad" does not hit "read")
_HINT_WORDS = (
    "nav|navigation|menu|footer|header|masthead|sidebar|side-bar|"
    "breadcrumb|breadcrumbs|comment|comments|cookie|banner|share|"
    "social|related|widget|promo|advert|advertisement|sponsored|"
    "pagination|pager|skip|toolbar|disclaimer|copyright|subscribe|"
    "newsletter|popup|modal"
)
_HINT_RE = re.compile(r"(?<![a-z])(?:%s)(?![a-z])" % _HINT_WORDS)


def _norm(s: str) -> str:
    return _WS.sub(" ", s).strip()


class _BlockSegmenter(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.blocks: list[dict] = []
        # each stack frame: (tag, hinted, skipped)
        self._stack: list[tuple[str, bool, bool]] = []
        self._hint_depth = 0
        self._skip_depth = 0
        self._link_depth = 0
        self._parts: list[str] = []
        self._link_parts: list[str] = []
        self._tag = "body"

    # -- block lifecycle -------------------------------------------------
    def _flush(self) -> None:
        text = _norm("".join(self._parts))
        self._parts = []
        link_text = _norm("".join(self._link_parts))
        self._link_parts = []
        if not text:
            return
        self.blocks.append({
            "seq": len(self.blocks),
            "tag": self._tag,
            "text": text,
            "chars": len(text),
            "link_chars": min(len(link_text), len(text)),
            "hint": self._hint_depth > 0,
            "heading": self._tag in HEADING_TAGS,
        })

    # -- parser events ---------------------------------------------------
    def handle_starttag(self, tag, attrs):
        if tag in ("br",):
            self._parts.append(" ")
            if self._link_depth:
                self._link_parts.append(" ")
            return
        hinted = tag in HINT_TAGS
        if not hinted:
            for k, v in attrs:
                if k in ("class", "id", "role") and v and _HINT_RE.search(
                    v.lower()
                ):
                    hinted = True
                    break
        skipped = tag in SKIP_TAGS
        if tag in BLOCK_TAGS:
            self._flush()
            self._tag = tag
        self._stack.append((tag, hinted, skipped))
        if hinted:
            self._hint_depth += 1
        if skipped:
            self._skip_depth += 1
        if tag == "a":
            self._link_depth += 1

    def handle_endtag(self, tag):
        # pop to the matching open tag, tolerating unclosed children.
        # FLUSH FIRST: the closing block's hint/link context must still
        # be on the counters when its row is recorded.
        if tag in BLOCK_TAGS and any(t == tag for t, _, _ in self._stack):
            self._flush()
        for i in range(len(self._stack) - 1, -1, -1):
            if self._stack[i][0] == tag:
                for t, hinted, skipped in self._stack[i:]:
                    if hinted:
                        self._hint_depth -= 1
                    if skipped:
                        self._skip_depth -= 1
                    if t == "a":
                        self._link_depth -= 1
                del self._stack[i:]
                break
        else:
            return
        if tag in BLOCK_TAGS:
            # the enclosing block tag (if any) resumes
            self._tag = next(
                (t for t, _, _ in reversed(self._stack) if t in BLOCK_TAGS),
                "body",
            )

    def handle_data(self, data):
        if self._skip_depth:
            return
        self._parts.append(data)
        if self._link_depth:
            self._link_parts.append(data)

    def close(self):
        super().close()
        self._flush()


def segment_blocks(html: str) -> list[dict]:
    """Page → ordered visible-text blocks with integer char counts.
    Zero-char blocks are not emitted."""
    seg = _BlockSegmenter()
    seg.feed(html or "")
    seg.close()
    return seg.blocks


def classify_blocks(
    blocks: list[dict],
    *,
    short_chars: int = 40,
    max_link_pct: int = 33,
) -> list[dict]:
    """Add ``cls`` ('good'/'bad') to each block — context-free pass
    then neighbor smoothing, exactly as the module docstring specifies.
    Pure integer decisions; mutates and returns ``blocks``."""
    n = len(blocks)
    cls: list[str | None] = [None] * n
    for i, b in enumerate(blocks):
        if b["hint"]:
            cls[i] = "bad"
        elif 100 * b["link_chars"] > max_link_pct * b["chars"]:
            cls[i] = "bad"
        elif b["chars"] >= short_chars:
            cls[i] = "good"
    # nearest decided neighbor on each side (missing side = bad)
    prev_dec: list[str] = []
    cur = "bad"
    for i in range(n):
        prev_dec.append(cur)
        if cls[i] is not None:
            cur = cls[i]
    next_dec: list[str] = [None] * n  # type: ignore[list-item]
    cur = "bad"
    for i in range(n - 1, -1, -1):
        next_dec[i] = cur
        if cls[i] is not None:
            cur = cls[i]
    for i, b in enumerate(blocks):
        if cls[i] is None:
            if b["heading"]:
                cls[i] = "good" if next_dec[i] == "good" else "bad"
            else:
                cls[i] = (
                    "good"
                    if prev_dec[i] == "good" and next_dec[i] == "good"
                    else "bad"
                )
        b["cls"] = cls[i]
    return blocks


def main_content(
    html: str, *, short_chars: int = 40, max_link_pct: int = 33
) -> str:
    """The page's main text: good blocks in order, joined by blank
    lines."""
    blocks = classify_blocks(
        segment_blocks(html),
        short_chars=short_chars,
        max_link_pct=max_link_pct,
    )
    return "\n\n".join(b["text"] for b in blocks if b["cls"] == "good")
