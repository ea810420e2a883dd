"""Legacy binary Office parsers (.xls BIFF8, .ppt PowerPoint-97,
.doc Word-97 piece table) — reference converts via soffice
(partition/doc.py:14, common/common.py:256-331); here parsed directly."""

from __future__ import annotations

import os

import pytest

from unstructured_spark.parsers.dispatch import partition_bytes
from unstructured_spark.parsers.legacy_office import (
    doc_to_elements,
    ppt_to_elements,
    xls_to_elements,
)

REF = "/root/reference/example-docs"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="no reference corpus"
)


def _read(name: str) -> bytes:
    with open(os.path.join(REF, name), "rb") as f:
        return f.read()


class TestXls:
    def test_sheets_and_tables(self):
        els = xls_to_elements(_read("tests-example.xls"))
        assert any(e["type"] == "Table" for e in els)
        # sheet names flow into page_name, ordinal into page_number
        assert els[0]["page_name"] == "Example Test"
        assert max(e["page_number"] for e in els) >= 2

    def test_shared_strings_decoded(self):
        els = xls_to_elements(_read("tests-example.xls"))
        text = " ".join(e["text"] for e in els)
        assert "Multiple Choice" in text

    def test_numbers_rendered(self):
        els = xls_to_elements(_read("tests-example.xls"))
        text = " ".join(e["text"] for e in els)
        assert "2+2" in text and "4" in text


class TestPpt:
    def test_slide_text_without_master_noise(self):
        els = ppt_to_elements(_read("fake-power-point.ppt"))
        texts = [e["text"] for e in els]
        assert "Adding a Bullet Slide" in texts
        # master-template placeholder text must not leak
        assert not any("Click to edit" in t for t in texts)

    def test_title_from_text_header_atom(self):
        els = ppt_to_elements(_read("fake-power-point.ppt"))
        assert els[0]["type"] == "Title"
        assert els[0]["page_number"] == 1


class TestDoc:
    def test_piece_table_text(self):
        els = doc_to_elements(_read("fake.doc"))
        assert any("Lorem ipsum dolor sit amet" in e["text"] for e in els)

    def test_multi_paragraph(self):
        els = doc_to_elements(_read("simple.doc"))
        texts = " ".join(e["text"] for e in els)
        assert "favorite things" in texts
        assert len(els) > 3


class TestDispatchRouting:
    def test_extension_routes_cfb_formats(self):
        assert partition_bytes(_read("fake.doc"), filename="fake.doc")
        assert partition_bytes(_read("tests-example.xls"), filename="t.xls")
        assert partition_bytes(
            _read("fake-power-point.ppt"), filename="p.ppt"
        )
