"""HTML "v2" ontology partitioning (reference
``unstructured/partition/html/partition.py:280-293`` with
``documents/ontology.py:27-335``, ``documents/mappings.py:55-195``,
``partition/html/transformations.py:24-175,441-563``).

The reference's v2 branch parses HTML into a tree of ~70 Pydantic
ontology classes (Layout/Text/List/Table/Media/... taxonomy), then maps
that tree onto the v1 element contract. Here the taxonomy is a static
data table and the parse is a single stdlib-``html.parser`` pass that
tags every node with its ontology class; flattening to v1 elements
reuses the same class→element mapping the reference publishes.

Classification per node follows the reference's scenario chain
(transformations.py:498-563):

1. (tag, css-class) is a known ontology pair           → that class
2. css-class alone is a known ontology class           → that class
3. ``<input>``: type=checkbox/radio → Checkbox/RadioButton, else
   FormFieldValue
4. tag has a default ontology class                    → that class
5. otherwise                                           → UncategorizedText
6. UncategorizedText wrapping only an <img>            → Image

Spark integration: ``parse_html_v2(html)`` is pure Python over one
document — executors run it per-row inside the same ``mapInPandas``
batches as every other parser (operators/partition_auto.py), so the
cluster parallelizes across documents and no new shuffle is
introduced.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from html.parser import HTMLParser

# ---------------------------------------------------------------------------
# Taxonomy tables (data re-derived from documents/ontology.py:27-335).
# name → (element-type group, allowed html tags)
# ---------------------------------------------------------------------------

ONTOLOGY: dict[str, tuple[str, tuple[str, ...]]] = {
    "Document": ("Layout", ("body",)),
    "Section": ("Layout", ("section",)),
    "Page": ("Layout", ("div",)),
    "Column": ("Layout", ("div",)),
    "Paragraph": ("Text", ("p",)),
    "Header": ("Text", ("header",)),
    "Footer": ("Text", ("footer",)),
    "Sidebar": ("Layout", ("aside",)),
    "PageBreak": ("Layout", ("hr",)),
    "Title": ("Text", ("h1",)),
    "Subtitle": ("Text", ("h2",)),
    "Heading": ("Text", ("h1", "h2", "h3", "h4", "h5", "h6")),
    "NarrativeText": ("Text", ("p",)),
    "Quote": ("Text", ("blockquote",)),
    "Footnote": ("Text", ("div",)),
    "Caption": ("Text", ("figcaption",)),
    "PageNumber": ("Text", ("span",)),
    "UncategorizedText": ("Text", ("span",)),
    "OrderedList": ("List", ("ol",)),
    "UnorderedList": ("List", ("ul",)),
    "DefinitionList": ("List", ("dl",)),
    "ListItem": ("List", ("li",)),
    "Table": ("Table", ("table",)),
    "TableBody": ("Table", ("tbody",)),
    "TableHeader": ("Table", ("thead",)),
    "TableRow": ("Table", ("tr",)),
    "TableCell": ("Table", ("td",)),
    "TableCellHeader": ("Table", ("th",)),
    "Image": ("Media", ("img",)),
    "Figure": ("Media", ("figure",)),
    "Video": ("Media", ("video",)),
    "Audio": ("Media", ("audio",)),
    "Barcode": ("Media", ("img",)),
    "QRCode": ("Media", ("img",)),
    "Logo": ("Media", ("img",)),
    "CodeBlock": ("Code", ("pre", "code")),
    "InlineCode": ("Code", ("code",)),
    "Formula": ("Mathematical", ("math",)),
    "Equation": ("Mathematical", ("math",)),
    "FootnoteReference": ("Reference", ("sub",)),
    "Citation": ("Reference", ("cite",)),
    "Bibliography": ("Reference", ("ul",)),
    "Glossary": ("Reference", ("dl",)),
    "Author": ("Metadata", ("meta",)),
    "MetaDate": ("Metadata", ("meta",)),
    "Keywords": ("Metadata", ("meta",)),
    "Abstract": ("Metadata", ("section",)),
    "Hyperlink": ("Navigation", ("a",)),
    "TableOfContents": ("Table", ("table",)),
    "Index": ("Navigation", ("nav",)),
    "Form": ("Form", ("form",)),
    "FormField": ("Form", ("label",)),
    "FormFieldValue": ("Form", ("input",)),
    "Checkbox": ("Form", ("input",)),
    "RadioButton": ("Form", ("input",)),
    "Button": ("Form", ("button",)),
    "Comment": ("Annotation", ("span",)),
    "Highlight": ("Annotation", ("mark",)),
    "RevisionInsertion": ("Annotation", ("ins",)),
    "RevisionDeletion": ("Annotation", ("del",)),
    "Address": ("Specialized Text", ("address",)),
    "EmailAddress": ("Specialized Text", ("a",)),
    "PhoneNumber": ("Specialized Text", ("span",)),
    "CalendarDate": ("Specialized Text", ("time",)),
    "Time": ("Specialized Text", ("time",)),
    "Currency": ("Specialized Text", ("span",)),
    "Measurement": ("Specialized Text", ("span",)),
    "Letterhead": ("Document-Specific", ("header",)),
    "Signature": ("Document-Specific", ("img", "svg")),
    "Watermark": ("Document-Specific", ("div",)),
    "Stamp": ("Document-Specific", ("img", "svg")),
}

# tag → default ontology class when no css-class matched
# (mappings.py HTML_TAG_TO_DEFAULT_ELEMENT_TYPE_MAP)
TAG_DEFAULTS: dict[str, str] = {
    "a": "Hyperlink", "address": "Address", "aside": "Sidebar",
    "audio": "Audio", "blockquote": "Quote", "body": "Document",
    "button": "Button", "cite": "Citation", "code": "CodeBlock",
    "del": "RevisionDeletion", "div": "UncategorizedText",
    "dl": "DefinitionList", "figcaption": "Caption", "figure": "Figure",
    "footer": "Footer", "form": "Form", "h1": "Title", "h2": "Subtitle",
    "h3": "Heading", "h4": "Heading", "h5": "Heading", "h6": "Heading",
    "header": "Header", "hr": "PageBreak", "img": "Image",
    "input": "Checkbox", "ins": "RevisionInsertion", "label": "FormField",
    "li": "ListItem", "mark": "Highlight", "math": "Equation",
    "meta": "Keywords", "nav": "Index", "ol": "OrderedList",
    "p": "Paragraph", "pre": "CodeBlock", "section": "Section",
    "span": "UncategorizedText", "sub": "FootnoteReference",
    "svg": "Signature", "table": "Table", "tbody": "TableBody",
    "td": "TableCell", "th": "TableCellHeader", "thead": "TableHeader",
    "time": "Time", "tr": "TableRow", "ul": "UnorderedList",
    "video": "Video",
}

# ontology class → v1 element type (mappings.py
# get_ontology_to_unstructured_type_mapping, 55-131)
V1_MAP: dict[str, str] = {
    "Document": "Text", "Section": "Text", "Page": "Text",
    "Column": "Text", "Paragraph": "NarrativeText", "Header": "Header",
    "Footer": "Footer", "Sidebar": "Text", "PageBreak": "PageBreak",
    "Title": "Title", "Subtitle": "Title", "Heading": "Title",
    "NarrativeText": "NarrativeText", "Quote": "NarrativeText",
    "Footnote": "Text", "Caption": "FigureCaption",
    "PageNumber": "PageNumber", "UncategorizedText": "Text",
    "OrderedList": "Text", "UnorderedList": "Text",
    "DefinitionList": "Text", "ListItem": "ListItem", "Table": "Table",
    "TableRow": "Table", "TableCell": "Table", "TableCellHeader": "Table",
    "TableBody": "Table", "TableHeader": "Table", "Image": "Image",
    "Figure": "Image", "Video": "Text", "Audio": "Text",
    "Barcode": "Image", "QRCode": "Image", "Logo": "Image",
    "CodeBlock": "CodeSnippet", "InlineCode": "CodeSnippet",
    "Formula": "Formula", "Equation": "Formula",
    "FootnoteReference": "Text", "Citation": "Text",
    "Bibliography": "Text", "Glossary": "Text", "Author": "Text",
    "MetaDate": "Text", "Keywords": "Text", "Abstract": "NarrativeText",
    "Hyperlink": "Text", "TableOfContents": "Table", "Index": "Text",
    "Form": "Text", "FormField": "Text", "FormFieldValue": "Text",
    "Checkbox": "Text", "RadioButton": "Text", "Button": "Text",
    "Comment": "Text", "Highlight": "Text", "RevisionInsertion": "Text",
    "RevisionDeletion": "Text", "Address": "Address",
    "EmailAddress": "EmailAddress", "PhoneNumber": "Text",
    "CalendarDate": "Text", "Time": "Text", "Currency": "Text",
    "Measurement": "Text", "Letterhead": "Header", "Signature": "Text",
    "Watermark": "Text", "Stamp": "Text",
}

# (tag, css-class) pairs valid per the taxonomy's allowed_tags
TAG_AND_CLASS: dict[tuple[str, str], str] = {
    (tag, name): name
    for name, (_, tags) in ONTOLOGY.items()
    for tag in tags
}

_VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta source track wbr".split()
)

# ontology classes that merge into the enclosing block's text instead of
# producing their own element (transformations.py combine_inline_elements
# + is_inline_element, 175-301)
_INLINE_CLASSES = frozenset(
    {
        "Hyperlink", "InlineCode", "Highlight", "RevisionInsertion",
        "RevisionDeletion", "FootnoteReference", "Citation", "PageNumber",
        "EmailAddress", "PhoneNumber", "CalendarDate", "Time", "Currency",
        "Measurement", "Comment", "UncategorizedText",
    }
)

# groups whose nodes are pure containers: recurse, never emit themselves
_CONTAINER_GROUPS = frozenset({"Layout", "Navigation"})


@dataclass
class _Node:
    tag: str
    onto_class: str
    attrs: dict[str, str]
    # document-ordered mix of text runs (str) and child nodes
    content: list = field(default_factory=list)

    @property
    def children(self) -> list["_Node"]:
        return [c for c in self.content if isinstance(c, _Node)]

    @property
    def text_parts(self) -> list[str]:
        return [c for c in self.content if isinstance(c, str)]

    def text(self) -> str:
        parts = [
            c if isinstance(c, str) else c.text() for c in self.content
        ]
        return " ".join(" ".join(parts).split())


def _classify(tag: str, attrs: dict[str, str]) -> str:
    css = (attrs.get("class") or "").split()
    first = css[0] if css else None
    if first:
        hit = TAG_AND_CLASS.get((tag, first))
        if hit:
            return hit
        if first in ONTOLOGY:
            return first
    if tag == "input":
        itype = (attrs.get("type") or "").lower()
        if itype == "checkbox":
            return "Checkbox"
        if itype == "radio":
            return "RadioButton"
        return "FormFieldValue"
    return TAG_DEFAULTS.get(tag, "UncategorizedText")


class _OntologyParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = _Node("body", "Document", {})
        self.stack = [self.root]
        self._skip_depth = 0

    def handle_starttag(self, tag, attrs):
        if self._skip_depth:
            self._skip_depth += 1
            return
        if tag in ("script", "style", "head"):
            self._skip_depth = 1
            return
        a = {k: (v or "") for k, v in attrs}
        node = _Node(tag, _classify(tag, a), a)
        self.stack[-1].content.append(node)
        if tag not in _VOID_TAGS:
            self.stack.append(node)

    def handle_endtag(self, tag):
        if self._skip_depth:
            self._skip_depth -= 1
            return
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                break

    def handle_data(self, data):
        if self._skip_depth:
            return
        if data.strip():
            self.stack[-1].content.append(data)


def parse_html_to_ontology(html: str) -> _Node:
    """HTML → ontology node tree (reference
    transformations.py:377-403). Scenario-6 fixup (image-only
    uncategorized wrappers become Image) applied post-parse."""
    p = _OntologyParser()
    p.feed(html)
    p.close()

    def fixup(n: _Node) -> None:
        for c in n.children:
            fixup(c)
        if (
            n.onto_class == "UncategorizedText"
            and not n.text()
            and any(c.tag == "img" for c in n.children)
        ):
            n.onto_class = "Image"

    fixup(p.root)
    return p.root


def parse_html_v2(html: str) -> list[dict]:
    """HTML → v1-contract element dicts via the ontology
    (reference ontology_to_unstructured_elements,
    transformations.py:24-175). Containers recurse; inline nodes merge
    into their enclosing block; every emitted element carries its
    ontology class + group as metadata.

    Returns dicts with keys: type, text, ontology_class,
    ontology_group, html_tag, css_class.
    """
    root = parse_html_to_ontology(html)
    out: list[dict] = []

    def emit(n: _Node) -> None:
        text = n.text()
        if not text and n.onto_class not in ("Image", "PageBreak"):
            return
        out.append(
            {
                "type": V1_MAP.get(n.onto_class, "Text"),
                "text": text,
                "ontology_class": n.onto_class,
                "ontology_group": ONTOLOGY.get(n.onto_class, ("Text",))[0],
                "html_tag": n.tag,
                "css_class": (n.attrs.get("class") or "").split()[0]
                if n.attrs.get("class")
                else None,
            }
        )

    def walk(n: _Node) -> None:
        group = ONTOLOGY.get(n.onto_class, ("Text",))[0]
        if n.onto_class in ("Table", "TableOfContents"):
            emit(n)  # tables emit whole, never their cells
            return
        if n.onto_class == "PageBreak":
            emit(n)
            return
        is_container = (
            group in _CONTAINER_GROUPS
            or n.onto_class in (
                "OrderedList", "UnorderedList", "DefinitionList", "Form",
                "Figure", "Bibliography", "Glossary",
            )
            or n.tag in ("html", "main", "article")
        )
        has_block_child = any(
            c.onto_class not in _INLINE_CLASSES for c in n.children
        )
        if is_container or (not n.text_parts and has_block_child):
            for c in n.children:
                walk(c)
            return
        emit(n)

    for c in root.children:
        walk(c)
    return out
