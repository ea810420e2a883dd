"""Encoding detection (parsers/encoding.py) vs the reference's
utf-16/utf-32 example-docs (file_utils/encoding.py behavioral parity)."""

from pathlib import Path

import pytest

from unstructured_spark.parsers.encoding import decode_bytes, detect_encoding

DOCS = Path("/root/reference/example-docs")


def _read(name: str) -> bytes:
    return (DOCS / name).read_bytes()


@pytest.mark.parametrize(
    "name,expected_prefix",
    [
        ("fake-text-utf-16.txt", "This is a test document"),
        ("fake-text-utf-16-le.txt", "This is a test document"),
        ("fake-text-utf-16-be.txt", "This is a test document"),
        ("fake-text-utf-32.txt", "This is a test document"),
    ],
)
def test_utf16_32_fixtures_decode(name, expected_prefix):
    text = decode_bytes(_read(name))
    assert text.startswith(expected_prefix)


def test_bom_utf16_html_fixture():
    text = decode_bytes(_read("example-steelJIS-datasheet-utf-16.html"))
    assert "<head" in text.lower()
    assert "\x00" not in text


def test_bom_utf16_xml_fixture():
    text = decode_bytes(_read("factbook-utf-16.xml"))
    assert text.lstrip("﻿\n").startswith("<?xml")


def test_bom_utf16_csv_fixture():
    text = decode_bytes(_read("stanley-cups-utf-16.csv"))
    assert "Stanley" in text


def test_latin1_not_mistaken_for_utf16():
    # Even-length latin-1 text must NOT decode via the utf-16 path
    # (the pre-fix _decode bug: any even-length non-UTF-8 doc became CJK).
    raw = "## k\xf6nnen w\xe4re sch\xf6n!!".encode("latin-1")
    assert len(raw) % 2 == 0
    # cp1252 ranks before latin-1 and is identical on these bytes
    assert detect_encoding(raw) == "cp1252"
    assert decode_bytes(raw) == "## k\xf6nnen w\xe4re sch\xf6n!!"


def test_latin1_reference_fixture():
    text = decode_bytes(_read("umlauts-non-utf8.md"))
    assert "k\xf6nnen" in text


def test_utf8_fast_path():
    s = "héllo wörld — em-dash"
    assert detect_encoding(s.encode("utf-8")) == "utf-8"
    assert decode_bytes(s.encode("utf-8")) == s


def test_html_meta_charset_sniff():
    body = "<html><head><meta charset=\"windows-1252\"></head><body>caf’</body></html>"
    raw = body.encode("windows-1252")
    assert detect_encoding(raw) == "windows-1252"
    assert "caf’" in decode_bytes(raw)


def test_xml_declared_encoding_sniff():
    body = "<?xml version='1.0' encoding='ISO-8859-2'?><r>ő</r>"
    raw = body.encode("iso-8859-2")
    assert detect_encoding(raw) == "iso-8859-2"
    assert "ő" in decode_bytes(raw)


def test_empty_and_tiny_inputs():
    assert decode_bytes(b"") == ""
    assert decode_bytes(b"a") == "a"
    assert decode_bytes("already str") == "already str"


def test_bomless_utf16le_synthetic():
    raw = "Plain English sentence for the sniffer.".encode("utf-16-le")
    assert detect_encoding(raw) == "utf-16-le"


def test_bomless_utf16be_synthetic():
    raw = "Plain English sentence for the sniffer.".encode("utf-16-be")
    assert detect_encoding(raw) == "utf-16-be"
