"""Outlook .msg parsing via the stdlib CFB reader (reference
``partition/msg.py:22-323`` shape: body elements + sender/recipient
metadata + recursively partitioned attachments)."""

from __future__ import annotations

import os

import pytest

from unstructured_spark.parsers.msg_parser import CfbFile, msg_to_elements

REF = "/root/reference/example-docs"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="no reference corpus"
)


def _read(name: str) -> bytes:
    with open(os.path.join(REF, name), "rb") as f:
        return f.read()


class TestCfb:
    def test_directory_enumeration(self):
        cfb = CfbFile(_read("fake-email.msg"))
        names = {e["name"] for e in cfb.entries}
        assert any(n.startswith("__substg1.0_0037") for n in names)  # subject
        assert any(n.startswith("__substg1.0_1000") for n in names)  # body

    def test_rejects_non_cfb(self):
        with pytest.raises(ValueError):
            CfbFile(b"PK\x03\x04not a cfb file" + b"\x00" * 600)


class TestMsg:
    def test_body_and_headers(self):
        els = msg_to_elements(_read("fake-email.msg"))
        assert any("test email to use for unit tests" in e["text"] for e in els)
        assert els[0]["subject"] == "Test Email"
        assert els[0]["sent_from"] == ["mrobinson@unstructured.io"]
        assert els[0]["sent_to"]

    def test_body_classification(self):
        els = msg_to_elements(_read("fake-email.msg"))
        assert any(e["type"] == "ListItem" for e in els)

    def test_attachment_recursion(self):
        els = msg_to_elements(_read("fake-email-attachment.msg"))
        attached = [e for e in els if e.get("attached_to_filename")]
        assert attached, "attachment elements expected"
        assert all(e["filename"] for e in attached)

    def test_cc_metadata(self):
        els = msg_to_elements(_read("fake-email-with-cc-and-bcc.msg"))
        assert els and els[0]["subject"].startswith("Fake email with cc")
