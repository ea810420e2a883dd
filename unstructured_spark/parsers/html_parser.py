"""HTML → elements on stdlib ``html.parser`` (no lxml in this env).

Implements the reference's flow/phrasing block model
(``unstructured/partition/html/parser.py:338-1035`` semantics): block
tags open a new element; phrasing tags (b/i/em/strong/a/span/code…)
accumulate into the current block with emphasis/link annotations;
script/style/head are dropped; ``<main>``/``<body>`` is the root when
present; whitespace is normalized per block.

Element typing (reference ``html/parser.py:921-938`` + tag registry):
h1-h6 → Title (category_depth = level-1); li → ListItem; table → Table
(with ``text_as_html``); pre/code → CodeSnippet; header → Header;
footer → Footer; figcaption → FigureCaption; address → Address;
img → Image; other blocks → classified by text
(``derive_element_type_from_text``).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

from unstructured_spark.parsers import classify

BLOCK_TAGS = {
    "p", "div", "section", "article", "aside", "nav", "ul", "ol", "dl",
    "li", "dt", "dd", "h1", "h2", "h3", "h4", "h5", "h6", "table",
    "blockquote", "pre", "figure", "figcaption", "address", "header",
    "footer", "main", "form",
}

HEADING_TAGS = {"h1": 0, "h2": 1, "h3": 2, "h4": 3, "h5": 4, "h6": 5}

EMPHASIS_TAGS = {"b": "b", "strong": "b", "i": "i", "em": "i"}

SKIP_TAGS = {"script", "style", "head", "template", "noscript"}

_WS_RE = re.compile(r"\s+")


def _norm(text: str) -> str:
    return _WS_RE.sub(" ", text).strip()


class _Block:
    __slots__ = ("tag", "depth", "texts", "emphasis", "links", "in_table")

    def __init__(self, tag: str, depth: int | None = None):
        self.tag = tag
        self.depth = depth
        self.texts: list[str] = []
        self.emphasis: list[tuple[str, str]] = []  # (text, 'b'|'i')
        self.links: list[dict] = []  # {text, url, start_index}

    def text(self) -> str:
        return _norm("".join(self.texts))


class _ElementExtractor(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.elements: list[dict] = []
        self.block_stack: list[_Block] = []
        self.skip_depth = 0
        self.table_depth = 0
        self.table_html: list[str] = []
        self.pre_depth = 0
        self.list_depth = 0
        self.emphasis_stack: list[str] = []  # 'b'/'i'
        self.link_stack: list[tuple[str, int, list[str]]] = []  # (href, start, texts)

    # -- emit ---------------------------------------------------------------

    def _emit(self, block: _Block) -> None:
        # pre blocks keep internal whitespace (CodeSnippet), others normalize
        if block.tag == "pre":
            text = "".join(block.texts).strip("\n")
        else:
            text = block.text()
        if not text:
            return
        etype, depth = self._classify(block, text)
        el: dict = {"type": etype, "text": text}
        if depth is not None:
            el["category_depth"] = depth
        if block.emphasis:
            el["emphasized_text_contents"] = [t for t, _ in block.emphasis]
            el["emphasized_text_tags"] = [tag for _, tag in block.emphasis]
        if block.links:
            el["links"] = block.links
        self.elements.append(el)

    def _classify(self, block: _Block, text: str) -> tuple[str, int | None]:
        tag = block.tag
        if tag in HEADING_TAGS:
            return "Title", HEADING_TAGS[tag]
        if tag in ("li", "dt", "dd"):
            return "ListItem", max(0, self.list_depth - 1)
        if tag == "pre":
            return "CodeSnippet", None
        if tag == "figcaption":
            return "FigureCaption", None
        if tag == "address":
            return "Address", None
        if tag == "header":
            return "Header", None
        if tag == "footer":
            return "Footer", None
        # derive from text (reference html/parser.py:921-938)
        if classify.is_bulleted_text(text):
            return "ListItem", None
        if classify.is_us_city_state_zip(text):
            return "Address", None
        if classify.is_email_address(text):
            return "EmailAddress", None
        if classify.is_possible_narrative_text(text):
            return "NarrativeText", None
        # NOTE: no Title fall-through — the reference's HTML text
        # derivation goes straight to Text (html/parser.py:921-938);
        # titles come from heading tags only.
        return "Text", None

    # -- table capture --------------------------------------------------------

    def _table_append(self, s: str) -> None:
        if self.table_depth > 0:
            self.table_html.append(s)

    # -- parser hooks ---------------------------------------------------------

    def handle_starttag(self, tag, attrs):
        if tag in SKIP_TAGS:
            self.skip_depth += 1
            return
        if self.skip_depth:
            return
        if tag == "table":
            self.table_depth += 1
            if self.table_depth == 1:
                self.table_html = []
                self.block_stack.append(_Block("table"))
            self._table_append("<table>")
            return
        if self.table_depth:
            if tag in ("tr", "td", "th", "thead", "tbody", "tfoot", "caption"):
                self._table_append(f"<{tag}>")
            return
        if tag in ("ul", "ol", "dl"):
            self.list_depth += 1
        if tag == "pre":
            self.pre_depth += 1
        if tag in EMPHASIS_TAGS:
            self.emphasis_stack.append(EMPHASIS_TAGS[tag])
            return
        if tag == "a":
            href = dict(attrs).get("href") or ""
            start = len(self.block_stack[-1].text()) if self.block_stack else 0
            self.link_stack.append((href, start, []))
            return
        if tag == "img":
            alt = _norm(dict(attrs).get("alt") or "")
            self.elements.append({"type": "Image", "text": alt})
            return
        # void tags never push (nothing ever pops them): <br> is a line
        # break inside the open block, <hr> a thematic break that closes
        # the open leaf — both keep document order intact
        if tag == "br":
            self.handle_data("\n")
            return
        if tag == "hr":
            if self.block_stack and self.block_stack[-1].tag in (
                "p", "li", "dt", "dd", *HEADING_TAGS, "pre", "figcaption",
                "address",
            ):
                self._emit(self.block_stack.pop())
            return
        if tag in BLOCK_TAGS:
            # flush any open leaf block (overlapping blocks: divs nest)
            if self.block_stack and self.block_stack[-1].tag in (
                "p", "li", "dt", "dd", *HEADING_TAGS, "pre", "figcaption",
                "address",
            ):
                self._emit(self.block_stack.pop())
            depth = HEADING_TAGS.get(tag)
            self.block_stack.append(_Block(tag, depth))

    def handle_endtag(self, tag):
        if tag in SKIP_TAGS:
            self.skip_depth = max(0, self.skip_depth - 1)
            return
        if self.skip_depth:
            return
        if tag == "table":
            self._table_append("</table>")
            self.table_depth -= 1
            if self.table_depth == 0:
                block = self._pop_block("table")
                if block is not None:
                    text = block.text()
                    html = "".join(self.table_html)
                    if text:
                        self.elements.append(
                            {"type": "Table", "text": text, "text_as_html": html}
                        )
            return
        if self.table_depth:
            if tag in ("tr", "td", "th", "thead", "tbody", "tfoot", "caption"):
                self._table_append(f"</{tag}>")
            return
        if tag in ("ul", "ol", "dl"):
            self.list_depth = max(0, self.list_depth - 1)
        if tag == "pre":
            self.pre_depth = max(0, self.pre_depth - 1)
        if tag in EMPHASIS_TAGS:
            if self.emphasis_stack:
                self.emphasis_stack.pop()
            return
        if tag == "a":
            if self.link_stack:
                href, start, texts = self.link_stack.pop()
                link_text = _norm("".join(texts))
                if self.block_stack and link_text:
                    self.block_stack[-1].links.append(
                        {"text": link_text, "url": href, "start_index": start}
                    )
            return
        if tag in BLOCK_TAGS:
            block = self._pop_block(tag)
            if block is not None:
                self._emit(block)

    def _pop_block(self, tag: str) -> _Block | None:
        for i in range(len(self.block_stack) - 1, -1, -1):
            if self.block_stack[i].tag == tag:
                # emit any unclosed inner blocks first (malformed HTML)
                for inner in self.block_stack[i + 1 :]:
                    self._emit(inner)
                block = self.block_stack[i]
                del self.block_stack[i:]
                return block
        return None

    def handle_data(self, data):
        if self.skip_depth:
            return
        if self.table_depth:
            import html as _html

            # convert_charrefs already decoded entities: re-escape so
            # text_as_html stays valid HTML (and markup in cell text
            # cannot be re-introduced)
            self._table_append(_html.escape(data))
            # also accumulate plain text on the table block
            for i in range(len(self.block_stack) - 1, -1, -1):
                if self.block_stack[i].tag == "table":
                    self.block_stack[i].texts.append(" " + data + " ")
                    break
            return
        if not data:
            return
        if self.link_stack:
            self.link_stack[-1][2].append(data)
        if self.block_stack:
            block = self.block_stack[-1]
            block.texts.append(data)
            if self.emphasis_stack and _norm(data):
                block.emphasis.append((_norm(data), self.emphasis_stack[-1]))
        elif _norm(data):
            # bare text outside any block → implicit paragraph
            b = _Block("p")
            b.texts.append(data)
            self._emit(b)


def html_to_elements(html: str) -> list[dict]:
    """Parse an HTML document into ordered element dicts."""
    # narrow to <main> or <body> when present (reference root choice,
    # html/partition.py:28-293)
    for root in ("main", "body"):
        m = re.search(rf"<{root}[^>]*>(.*)</{root}>", html, re.S | re.I)
        if m:
            html = m.group(1)
            break
    parser = _ElementExtractor()
    parser.feed(html)
    parser.close()
    # emit any block left open by malformed input
    for block in parser.block_stack:
        parser._emit(block)
    return parser.elements
