"""HTML v2 ontology partitioner (reference html/partition.py:280-293,
documents/ontology.py, transformations.py:498-563 scenario chain)."""

from __future__ import annotations

from unstructured_spark.parsers.dispatch import partition_bytes
from unstructured_spark.parsers.html_ontology import (
    ONTOLOGY,
    TAG_DEFAULTS,
    V1_MAP,
    parse_html_v2,
)


def _classes(els):
    return [e["ontology_class"] for e in els]


class TestScenarioChain:
    def test_tag_and_css_pair(self):
        els = parse_html_v2('<p class="NarrativeText">Some body text.</p>')
        assert _classes(els) == ["NarrativeText"]
        assert els[0]["type"] == "NarrativeText"

    def test_css_only_overrides_tag(self):
        # Currency normally lives on span; a div carrying the class
        # still classifies as Currency (scenario 2)
        els = parse_html_v2('<div class="Currency">$10</div>')
        assert _classes(els) == ["Currency"]

    def test_input_types(self):
        els = parse_html_v2(
        '<form><input type="checkbox"/><input type="radio"/>'
        "<input/></form>"
        )
        # inputs have no text → only emitted via explicit classes; parse
        # the tree instead of flattening
        from unstructured_spark.parsers.html_ontology import (
            parse_html_to_ontology,
        )

        form = parse_html_to_ontology(
            '<form><input type="checkbox"/><input type="radio"/><input/></form>'
        ).children[0]
        kinds = [c.onto_class for c in form.children]
        assert kinds == ["Checkbox", "RadioButton", "FormFieldValue"]

    def test_tag_default(self):
        els = parse_html_v2("<blockquote>quoted words here</blockquote>")
        assert _classes(els) == ["Quote"]
        assert els[0]["type"] == "NarrativeText"

    def test_unknown_falls_to_uncategorized(self):
        els = parse_html_v2("<custom-tag>odd text</custom-tag>")
        assert _classes(els) == ["UncategorizedText"]
        assert els[0]["type"] == "Text"

    def test_image_only_wrapper_promoted(self):
        els = parse_html_v2('<div><img src="x.png"/></div>')
        assert _classes(els) == ["Image"]


class TestFlattening:
    HTML = (
        "<html><body>"
        "<h1>Report</h1>"
        '<p>Total of <span class="Currency">$5</span> by <time>2024</time>.</p>'
        "<ul><li>alpha</li><li>beta</li></ul>"
        "<table><tr><td>a</td><td>b</td></tr></table>"
        "<hr/>"
        "</body></html>"
    )

    def test_inline_merges_in_document_order(self):
        els = parse_html_v2(self.HTML)
        para = [e for e in els if e["ontology_class"] == "Paragraph"][0]
        assert para["text"] == "Total of $5 by 2024 ."

    def test_tables_emit_whole(self):
        els = parse_html_v2(self.HTML)
        tables = [e for e in els if e["ontology_group"] == "Table"]
        assert len(tables) == 1
        assert tables[0]["text"] == "a b"

    def test_lists_explode_to_items(self):
        els = parse_html_v2(self.HTML)
        items = [e["text"] for e in els if e["ontology_class"] == "ListItem"]
        assert items == ["alpha", "beta"]

    def test_order_and_types(self):
        els = parse_html_v2(self.HTML)
        assert [e["type"] for e in els] == [
            "Title", "NarrativeText", "ListItem", "ListItem", "Table",
            "PageBreak",
        ]

    def test_script_style_head_dropped(self):
        els = parse_html_v2(
            "<head><style>p{}</style><script>x()</script></head>"
            "<body><p>kept text here</p></body>"
        )
        assert len(els) == 1 and els[0]["text"] == "kept text here"


class TestTaxonomyIntegrity:
    def test_every_class_has_v1_mapping(self):
        assert set(ONTOLOGY) == set(V1_MAP)

    def test_tag_defaults_point_at_known_classes(self):
        assert set(TAG_DEFAULTS.values()) <= set(ONTOLOGY)

    def test_default_tag_is_allowed_for_class(self):
        # the reference's own default map carries one exception:
        # div → UncategorizedText (allowed_tags=["span"])
        for tag, cls in TAG_DEFAULTS.items():
            if (tag, cls) == ("div", "UncategorizedText"):
                continue
            assert tag in ONTOLOGY[cls][1], (tag, cls)


class TestDispatchIntegration:
    def test_v2_route(self):
        els = partition_bytes(
            "<h1>T</h1><p>some longer body text</p>",
            filename="a.html",
            html_parser_version="v2",
        )
        assert [e["ontology_class"] for e in els] == ["Title", "Paragraph"]
        assert els[0]["filetype"] == "text/html"

    def test_v1_default_unchanged(self):
        els = partition_bytes("<h1>T</h1><p>x</p>", filename="a.html")
        assert "ontology_class" not in els[0]
