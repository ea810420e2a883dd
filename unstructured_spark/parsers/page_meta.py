"""HTML page metadata extraction — the <head> fields a crawl pipeline
records per page: title, meta description, canonical link, declared
language, and robots meta directives. The canonical URL feeds
URL-keyed dedup (functions/urls.py) so syndicated copies collapse onto
the publisher's key; noindex pages get dropped the way search-engine
and corpus pipelines (C4, RefinedWeb) drop them.

Head-only parse: the parser stops at </head> or the first <body>
content, so cost is bounded by the head regardless of page size. All
fields whitespace-normalized with the same explicit ASCII class as
parsers/main_content.py.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

_WS = re.compile(r"[ \t\r\n\f]+")


def _norm(s: str) -> str:
    return _WS.sub(" ", s).strip()


class _HeadParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.meta: dict[str, str | None] = {
            "title": None,
            "description": None,
            "canonical_url": None,
            "lang": None,
            "robots_meta": None,
        }
        self._in_title = False
        self._title_parts: list[str] = []
        self._done = False

    def handle_starttag(self, tag, attrs):
        if self._done:
            return
        a = {k: (v or "") for k, v in attrs}
        if tag == "html" and a.get("lang"):
            self.meta["lang"] = a["lang"].strip().lower()
        elif tag == "title":
            self._in_title = True
        elif tag == "meta":
            name = a.get("name", "").strip().lower()
            if name == "description" and self.meta["description"] is None:
                self.meta["description"] = _norm(a.get("content", ""))
            elif name == "robots" and self.meta["robots_meta"] is None:
                self.meta["robots_meta"] = _norm(
                    a.get("content", "")
                ).lower()
        elif tag == "link":
            rels = a.get("rel", "").strip().lower().split()
            if "canonical" in rels and self.meta["canonical_url"] is None:
                self.meta["canonical_url"] = a.get("href", "").strip()
        elif tag == "body":
            self._done = True

    def handle_endtag(self, tag):
        if tag == "title":
            if self._in_title and self.meta["title"] is None:
                self.meta["title"] = _norm("".join(self._title_parts))
            self._in_title = False
        elif tag == "head":
            self._done = True

    def handle_data(self, data):
        if self._in_title and not self._done:
            self._title_parts.append(data)


def page_metadata(html: str) -> dict:
    """{'title', 'description', 'canonical_url', 'lang',
    'robots_meta', 'noindex'} for a page; absent fields are None.
    ``noindex`` is the boolean a corpus filter consumes (true iff the
    robots meta lists noindex or none)."""
    p = _HeadParser()
    p.feed(html or "")
    p.close()
    m = dict(p.meta)
    rm = m["robots_meta"] or ""
    directives = {d.strip() for d in rm.split(",")}
    m["noindex"] = "noindex" in directives or "none" in directives
    return m
