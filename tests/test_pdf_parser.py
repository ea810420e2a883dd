"""PDF fast-strategy parser (stdlib content-stream extraction;
reference ``partition/pdf.py:430-587`` fast path semantics)."""

from __future__ import annotations

import os

import pytest

from tests import fixtures as fx
from unstructured_spark.parsers.dispatch import partition_bytes
from unstructured_spark.parsers.pdf_parser import (
    _Lexer,
    _parse_tounicode,
    pdf_to_elements,
)

REF_PDF_DIR = "/root/reference/example-docs/pdf"


class TestObjectLexer:
    def test_dict_with_refs(self):
        lex = _Lexer(b"<< /Type /Page /Parent 2 0 R /N 3 >>")
        d = lex.parse()
        assert d["/Type"] == "/Page"
        assert d["/Parent"].num == 2
        assert d["/N"] == 3

    def test_nested_arrays_and_strings(self):
        lex = _Lexer(b"[ (lit\\)eral) <48656c6c6f> 1.5 /Name ]")
        arr = lex.parse()
        assert arr[0] == b"lit)eral"
        assert arr[1] == b"Hello"
        assert arr[2] == 1.5
        assert arr[3] == "/Name"

    def test_octal_escapes(self):
        lex = _Lexer(rb"(\101\102\103)")
        assert lex.parse() == b"ABC"


class TestToUnicode:
    def test_bfchar_and_bfrange(self):
        cmap = _parse_tounicode(
            b"beginbfchar <01> <0041> endbfchar "
            b"beginbfrange <10> <12> <0061> endbfrange"
        )
        assert cmap[1] == "A"
        assert cmap[0x10] == "a" and cmap[0x12] == "c"


class TestFixturePdf:
    def test_pages_and_classification(self):
        els = pdf_to_elements(fx.make_pdf())
        assert els[0]["type"] == "Title"
        assert els[0]["text"] == "A Clever Title"
        assert els[0]["page_number"] == 1
        assert els[-1]["page_number"] == 2

    def test_line_grouping_merges_adjacent_lines(self):
        els = pdf_to_elements(fx.make_pdf())
        body = next(e for e in els if "first sentence" in e["text"])
        # the 14pt-gap line joined this block; the 60pt-gap line did not
        assert "keeps going" in body["text"]
        assert "Spaced" not in body["text"]

    def test_tj_kerning_becomes_spaces(self):
        els = pdf_to_elements(fx.make_pdf())
        assert any(e["text"] == "Spaced out words here." for e in els)

    def test_dispatch_routes_pdf_magic(self):
        els = partition_bytes(fx.make_pdf(), filename="doc.pdf")
        assert els[0]["filetype"] == "application/pdf"


@pytest.mark.skipif(not os.path.isdir(REF_PDF_DIR), reason="no reference corpus")
class TestRealPdfs:
    def _read(self, name: str) -> bytes:
        with open(os.path.join(REF_PDF_DIR, name), "rb") as f:
            return f.read()

    def test_flate_multipage_paper(self):
        els = pdf_to_elements(self._read("layout-parser-paper-fast.pdf"))
        text = " ".join(e["text"] for e in els)
        assert "LayoutParser" in text
        assert max(e["page_number"] for e in els) >= 2

    def test_cid_font_via_tounicode(self):
        els = pdf_to_elements(self._read("embedded-cmap-cidfont.pdf"))
        text = " ".join(e["text"] for e in els)
        assert "Heading in Helvetica" in text

    def test_broken_xref_still_parses(self):
        # object-scan approach is robust to invalid xref tables
        els = pdf_to_elements(
            self._read("invalid-pdf-structure-pdfminer-one-page.pdf")
        )
        assert len(els) > 50


class TestStrategyGate:
    def test_auto_picks_fast_for_text_pdf(self):
        from unstructured_spark.parsers.pdf_parser import determine_pdf_strategy

        assert determine_pdf_strategy(fx.make_pdf()) == "fast"

    def test_auto_routes_scanned_to_ocr(self):
        from unstructured_spark.parsers.pdf_parser import determine_pdf_strategy

        # a PDF whose pages have no text operators → not extractable
        scanned = b"%PDF-1.4\n1 0 obj\n<< /Type /Page >>\nendobj\n%%EOF"
        assert determine_pdf_strategy(scanned) == "ocr_only"

    def test_model_strategies_gated(self):
        with pytest.raises(NotImplementedError, match="layout/OCR model"):
            pdf_to_elements(fx.make_pdf(), strategy="hi_res")
