"""Elements → standalone HTML document (reference
``partition/html/convert.py`` + ``staging/base.py
create_file_from_elements``).

The reference renders through BeautifulSoup and returns
``soup.prettify()``; this module reproduces that output byte-for-byte
with the stdlib — pinned against every file under the reference's
``expected-structured-output-html`` tree (tests/test_golden_parity.py):

- one-space indent per depth, every tag and text run on its own line,
  text stripped but internal newlines preserved;
- attributes sorted alphabetically, values escaped (& < > ");
- text escaped minimally (& < >);
- void elements self-close (``<br/>``, ``<img .../>``);
- per-type tags: p for prose types, h{depth} for Title, li for list
  items, img/table/a/label/form/input specializations, div otherwise
  (reference TYPE_TO_HTML_MAP, convert.py:178-224);
- an element's ``text_as_html`` (when it parses) becomes the node
  itself, with the Table border styles injected on table/tr/th/td
  (convert.py:104-111);
- elements with a ``parent_id`` nest under their parent in a div
  wrapper, consecutive list items grouped into ``<ol>``
  (convert.py:226-258).
"""

from __future__ import annotations

from html.parser import HTMLParser
from typing import Any, Iterable

_VOID = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "source", "track", "wbr",
}

_TABLE_BORDER = "border: 1px solid black;"
_TABLE_STYLE = "border: 1px solid black; border-collapse: collapse;"

# wire-type → html tag ('h%d' expands with category_depth)
_P = "p"
_TYPE_TAG = {
    "UncategorizedText": _P, "Text": _P, "NarrativeText": _P,
    "Paragraph": _P, "Caption": _P, "FigureCaption": _P,
    "Title": "h%d",
    "Image": "img",
    "Table": "table",
    "Link": "a",
    "List": "ol", "ListItem": "li", "ListItemOther": "li",
    "BulletedText": "li",
    "FieldName": "label", "Form": "form", "Value": "input",
    "CheckBoxChecked": "input", "CheckBoxUnchecked": "input",
    "CheckboxChecked": "input", "CheckboxUnchecked": "input",
    "RadioButtonChecked": "input", "RadioButtonUnchecked": "input",
}
_LIST_TYPES = {"ListItem", "ListItemOther"}


class _Node:
    __slots__ = ("name", "attrs", "children")

    def __init__(self, name: str, attrs: dict[str, str] | None = None):
        self.name = name
        self.attrs: dict[str, str] = attrs or {}
        self.children: list[Any] = []  # _Node | str


class _TreeParser(HTMLParser):
    """text_as_html → _Node tree (html.parser semantics: lowercase
    names, entities decoded)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.roots: list[_Node] = []
        self._stack: list[_Node] = []

    def _add(self, node_or_text) -> None:
        if self._stack:
            self._stack[-1].children.append(node_or_text)
        elif isinstance(node_or_text, _Node):
            self.roots.append(node_or_text)

    def handle_starttag(self, tag, attrs):
        node = _Node(tag, {k: (v if v is not None else "") for k, v in attrs})
        self._add(node)
        if tag not in _VOID:
            self._stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self._add(_Node(tag, {k: (v if v is not None else "") for k, v in attrs}))

    def handle_endtag(self, tag):
        for i in range(len(self._stack) - 1, -1, -1):
            if self._stack[i].name == tag:
                del self._stack[i:]
                return

    def handle_data(self, data):
        if self._stack:
            self._stack[-1].children.append(data)


def _parse_html_fragment(html: str) -> _Node | None:
    p = _TreeParser()
    try:
        p.feed(html)
        p.close()
    except Exception:
        return None
    return p.roots[0] if p.roots else None


def _esc_text(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _fmt_attr(k: str, v: str) -> str:
    """bs4 quoting rule: values containing a double quote render in
    single quotes with the double quote kept raw; only when both quote
    kinds appear does it fall back to escaping with &quot;."""
    e = _esc_text(v)
    if '"' in e and "'" not in e:
        return f" {k}='{e}'"
    return ' {k}="{v}"'.format(k=k, v=e.replace('"', "&quot;"))


def _prettify(node: _Node, level: int, out: list[str]) -> None:
    pad = " " * level
    attrs = "".join(_fmt_attr(k, str(v)) for k, v in sorted(node.attrs.items()))
    if node.name in _VOID:
        out.append(f"{pad}<{node.name}{attrs}/>")
        return
    out.append(f"{pad}<{node.name}{attrs}>")
    for child in node.children:
        if isinstance(child, _Node):
            _prettify(child, level + 1, out)
        else:
            text = child.strip()
            if text:
                out.append(" " * (level + 1) + _esc_text(text))
    out.append(f"{pad}</{node.name}>")


def _inject_table_styles(node: _Node) -> None:
    node.attrs["style"] = _TABLE_STYLE

    def walk(n: _Node) -> None:
        for c in n.children:
            if isinstance(c, _Node):
                if c.name in ("tr", "th", "td"):
                    c.attrs["style"] = _TABLE_BORDER
                walk(c)

    walk(node)


def _element_node(el_dict: dict, exclude_binary_image_data: bool) -> _Node:
    typ = el_dict.get("type") or "UncategorizedText"
    text = el_dict.get("text") or ""
    meta = el_dict.get("metadata") or {}
    tah = meta.get("text_as_html")
    node = _parse_html_fragment(tah) if tah else None
    if node is None:
        tag = _TYPE_TAG.get(typ, "div")
        if tag == "h%d":
            tag = "h%d" % (meta.get("category_depth") or 1)
        node = _Node(tag)
        if tag == "img":
            if meta.get("image_base64") and not exclude_binary_image_data:
                mime = meta.get("image_mime_type") or "image/png"
                node.attrs["src"] = f"data:{mime};base64,{meta['image_base64']}"
            node.attrs["alt"] = text
        elif tag != "input":
            if text:
                node.children.append(text)
    node.attrs["class"] = typ
    if el_dict.get("element_id") is not None:
        node.attrs["id"] = str(el_dict["element_id"])
    if typ == "Table":
        _inject_table_styles(node)
    elif typ == "Link":
        node.attrs["href"] = meta.get("url") or ""
    elif typ in ("CheckBoxChecked", "CheckboxChecked"):
        node.attrs.update(type="checkbox", checked="true")
    elif typ in ("CheckBoxUnchecked", "CheckboxUnchecked"):
        node.attrs["type"] = "checkbox"
    elif typ in ("RadioButtonChecked",):
        node.attrs.update(type="radio", checked="true")
    elif typ in ("RadioButtonUnchecked",):
        node.attrs["type"] = "radio"
    return node


def _nest_by_parent(
    dicts: list[dict], nodes: list[_Node]
) -> list[_Node]:
    """parent_id nesting + consecutive-list grouping (convert.py:226-258):
    children wrap with their parent in a div; runs of list items become
    one <ol>."""
    by_id = {
        d.get("element_id"): i
        for i, d in enumerate(dicts)
        if d.get("element_id") is not None
    }
    children_of: dict[int, list[int]] = {}
    top: list[int] = []
    for i, d in enumerate(dicts):
        pid = (d.get("metadata") or {}).get("parent_id")
        if pid is not None and pid in by_id:
            children_of.setdefault(by_id[pid], []).append(i)
        else:
            top.append(i)

    def group_lists(idxs: list[int]) -> list[_Node]:
        out: list[_Node] = []
        run: list[_Node] = []
        for i in idxs:
            if dicts[i].get("type") in _LIST_TYPES:
                run.append(build(i))
            else:
                if run:
                    ol = _Node("ol")
                    ol.children.extend(run)
                    out.append(ol)
                    run = []
                out.append(build(i))
        if run:
            ol = _Node("ol")
            ol.children.extend(run)
            out.append(ol)
        return out

    def build(i: int) -> _Node:
        node = nodes[i]
        kids = children_of.get(i)
        if not kids:
            return node
        wrapper = _Node("div")
        wrapper.children.append(node)
        wrapper.children.extend(group_lists(kids))
        return wrapper

    return [build(i) for i in top]


def elements_to_html(
    element_dicts: Iterable[dict],
    exclude_binary_image_data: bool = False,
    no_group_by_page: bool = False,
) -> str:
    """Standalone prettified HTML document for a sequence of element
    dicts (wire shape). ``no_group_by_page=False`` wraps each page's
    elements in ``<div data-page_number=N>`` and drops elements with
    no page number (reference convert.py:274-287)."""
    dicts = list(element_dicts)
    nodes = [_element_node(d, exclude_binary_image_data) for d in dicts]
    body_children: list[_Node]
    if no_group_by_page:
        body_children = _nest_by_parent(dicts, nodes)
    else:
        pages: dict[int, tuple[list[dict], list[_Node]]] = {}
        for d, n in zip(dicts, nodes):
            pn = (d.get("metadata") or {}).get("page_number")
            if pn is None:
                continue
            pages.setdefault(int(pn), ([], []))
            pages[int(pn)][0].append(d)
            pages[int(pn)][1].append(n)
        body_children = []
        for page_no, (pd, pn_nodes) in enumerate(pages.values(), start=1):
            div = _Node("div", {"data-page_number": str(page_no)})
            div.children.extend(_nest_by_parent(pd, pn_nodes))
            body_children.append(div)

    out: list[str] = [
        "<!DOCTYPE html>",
        '<html lang="en">',
        " <head>",
        '  <meta charset="utf-8"/>',
        '  <meta content="width=device-width, initial-scale=1.0" name="viewport"/>',
        "  <title>",
        "  </title>",
        " </head>",
        " <body>",
    ]
    for node in body_children:
        _prettify(node, 2, out)
    out.append(" </body>")
    out.append("</html>")
    return "\n".join(out) + "\n"
