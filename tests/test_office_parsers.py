"""Office/packaged-format parsers (docx/pptx/xlsx/odt/epub/rtf) —
stdlib zip+XML implementations, validated against the reference's
element-stream semantics (SURVEY §2.1 rows for partition_docx/pptx/
xlsx, partition_epub/odt/rtf)."""

from __future__ import annotations

from tests import fixtures as fx
from unstructured_spark.parsers.dispatch import partition_bytes
from unstructured_spark.parsers.docx_parser import docx_to_elements
from unstructured_spark.parsers.misc_formats import (
    epub_to_elements,
    odt_to_elements,
    rtf_to_elements,
    rtf_to_text,
)
from unstructured_spark.parsers.pptx_parser import pptx_to_elements
from unstructured_spark.parsers.xlsx_parser import xlsx_to_elements


class TestDocx:
    def test_element_stream(self):
        els = docx_to_elements(fx.make_docx())
        types = [e["type"] for e in els]
        assert types == [
            "Header", "Title", "NarrativeText", "ListItem", "ListItem",
            "Table", "PageBreak", "NarrativeText", "Footer",
        ]

    def test_heading_style_maps_to_title_with_depth(self):
        els = docx_to_elements(fx.make_docx())
        title = next(e for e in els if e["type"] == "Title")
        assert title["text"] == "Report Title"
        assert title["category_depth"] == 0

    def test_numbering_ilvl_sets_depth(self):
        els = docx_to_elements(fx.make_docx())
        nested = next(e for e in els if e["text"] == "nested item")
        assert nested["type"] == "ListItem"
        assert nested["category_depth"] == 1

    def test_bullet_char_stripped_from_list_item(self):
        els = docx_to_elements(fx.make_docx())
        assert any(e["text"] == "item one" for e in els)

    def test_page_break_advances_page_number(self):
        els = docx_to_elements(fx.make_docx())
        second = next(e for e in els if "Second page" in e["text"])
        assert second["page_number"] == 2

    def test_table_html(self):
        els = docx_to_elements(fx.make_docx())
        table = next(e for e in els if e["type"] == "Table")
        assert "<th>Name</th>" in table["text_as_html"]
        assert "<td>42</td>" in table["text_as_html"]

    def test_emphasis_metadata(self):
        els = docx_to_elements(fx.make_docx())
        para = next(e for e in els if "bold words" in e["text"])
        assert para["emphasized_text_contents"] == ["bold words"]
        assert para["emphasized_text_tags"] == ["b"]


class TestPptx:
    def test_element_stream(self):
        els = pptx_to_elements(fx.make_pptx())
        assert [e["type"] for e in els] == [
            "Title", "ListItem", "ListItem", "Title", "ListItem",
        ]

    def test_slide_ordinal_is_page_number(self):
        els = pptx_to_elements(fx.make_pptx())
        assert [e["page_number"] for e in els] == [1, 1, 1, 2, 2]

    def test_title_placeholder(self):
        els = pptx_to_elements(fx.make_pptx())
        assert els[0]["text"] == "Adding a Bullet Slide"


class TestXlsx:
    def test_subtable_split(self):
        """Disjoint regions: lone title cell + core table (CC split)."""
        els = xlsx_to_elements(fx.make_xlsx())
        assert [e["type"] for e in els] == ["Title", "Table"]
        assert els[0]["text"] == "Stanley Cups"

    def test_sheet_metadata(self):
        els = xlsx_to_elements(fx.make_xlsx())
        assert all(e["page_name"] == "Stanley Cups" for e in els)
        assert all(e["page_number"] == 1 for e in els)

    def test_table_values(self):
        els = xlsx_to_elements(fx.make_xlsx())
        table = next(e for e in els if e["type"] == "Table")
        assert "Blackhawks 6" in table["text"]
        assert "<th>Team</th>" in table["text_as_html"]


class TestOdt:
    def test_element_stream(self):
        els = odt_to_elements(fx.make_odt())
        assert [e["type"] for e in els] == [
            "Title", "NarrativeText", "ListItem", "Table",
        ]

    def test_outline_level_to_depth(self):
        els = odt_to_elements(fx.make_odt())
        assert els[0]["category_depth"] == 0


class TestEpub:
    def test_chapters_in_spine_order_with_pages(self):
        els = epub_to_elements(fx.make_epub())
        assert [e["text"] for e in els if e["type"] == "Title"] == [
            "Chapter One", "Chapter Two",
        ]
        assert [e["page_number"] for e in els] == [1, 1, 2, 2]


class TestRtf:
    def test_control_words_stripped(self):
        text = rtf_to_text(fx.FAKE_RTF)
        assert "fonttbl" not in text and "Helvetica" not in text

    def test_escapes_decoded(self):
        text = rtf_to_text(fx.FAKE_RTF)
        assert "é accents" in text
        assert "—dashes" in text

    def test_elements(self):
        els = rtf_to_elements(fx.FAKE_RTF)
        assert els[0] == {"type": "Title", "text": "My First Heading"}
        assert els[1]["type"] == "NarrativeText"


class TestDispatchRouting:
    """detect_filetype + partition_bytes route zip containers correctly."""

    def test_docx_by_magic(self):
        els = partition_bytes(fx.make_docx(), filename="report.docx")
        assert any(e["type"] == "Title" for e in els)
        mime = "application/vnd.openxmlformats-officedocument.wordprocessingml.document"
        assert all(e["filetype"] == mime for e in els)

    def test_pptx_routed(self):
        els = partition_bytes(fx.make_pptx(), filename="deck.pptx")
        assert els[0]["text"] == "Adding a Bullet Slide"

    def test_xlsx_routed(self):
        els = partition_bytes(fx.make_xlsx(), filename="cups.xlsx")
        assert any(e["type"] == "Table" for e in els)

    def test_zip_disambiguation_without_extension(self):
        # no filename: first zip member name disambiguates the container
        els = partition_bytes(fx.make_pptx())
        assert els and els[0]["text"] == "Adding a Bullet Slide"

    def test_odt_epub_rtf_routed(self):
        assert partition_bytes(fx.make_odt(), filename="f.odt")
        assert partition_bytes(fx.make_epub(), filename="f.epub")
        assert partition_bytes(fx.FAKE_RTF, filename="f.rtf")
