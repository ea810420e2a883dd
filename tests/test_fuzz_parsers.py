"""Parser robustness fuzzing: corrupted real documents must never
crash the dispatcher with anything but its declared error types.

At 100 TB a corpus WILL contain truncated uploads, bit-rotted blobs,
and mislabeled files; one unhandled exception in a mapInPandas
partitioner kills the whole task. The contract: ``partition_bytes``
returns a list (possibly with recovered fragments) or raises
``UnsupportedFormatError`` / ``ValueError`` — nothing else.
"""

import random
from pathlib import Path

import pytest

from unstructured_spark.parsers.dispatch import (
    UnsupportedFormatError,
    partition_bytes,
)

DOCS = Path("/root/reference/example-docs")

SOURCES = [
    "fake-text.txt",
    "example-10k-1p.html",
    "fake.docx",
    "science-exploration-1p.pptx",
    "stanley-cups.xlsx",
    "fake-email.eml",
    "fake-email.msg",
    "layout-parser-paper-fast.pdf",
    "README.md",
    "stanley-cups.csv",
    "spring-weather.html.json",
    "fake.odt",
    "fake-doc.rtf",
    "winter-sports.epub",
    "tests-example.xls",
    "fake-power-point.ppt",
    "fake.doc",
]

ALLOWED = (UnsupportedFormatError, ValueError)


def _mutations(raw: bytes, rng: random.Random, n: int):
    """Truncations, bit flips, and byte splices of a real document."""
    for _ in range(n):
        kind = rng.randrange(3)
        if kind == 0 and len(raw) > 2:  # truncate
            yield raw[: rng.randrange(1, len(raw))]
        elif kind == 1 and raw:  # flip bytes
            b = bytearray(raw)
            for _ in range(rng.randrange(1, 9)):
                b[rng.randrange(len(b))] ^= 1 << rng.randrange(8)
            yield bytes(b)
        else:  # splice garbage into the middle
            pos = rng.randrange(len(raw) + 1)
            junk = bytes(rng.randrange(256) for _ in range(rng.randrange(1, 64)))
            yield raw[:pos] + junk + raw[pos:]


@pytest.mark.parametrize("name", SOURCES)
def test_mutated_documents_never_crash(name):
    src = DOCS / name
    if not src.exists():
        pytest.skip(f"{name} not in example-docs")
    raw = src.read_bytes()
    rng = random.Random(f"fuzz:{name}")  # deterministic per format
    for mutated in _mutations(raw, rng, 12):
        try:
            out = partition_bytes(mutated, filename=name)
        except ALLOWED:
            continue
        assert isinstance(out, list)
        for el in out:
            assert isinstance(el, dict) and "type" in el and "text" in el


def test_random_garbage_bytes():
    rng = random.Random("garbage")
    for ext in ("bin", "pdf", "docx", "html", "xlsx", "msg", "wav", "png"):
        for _ in range(4):
            junk = bytes(rng.randrange(256) for _ in range(rng.randrange(0, 4096)))
            try:
                out = partition_bytes(junk, filename=f"f.{ext}")
            except ALLOWED:
                continue
            assert isinstance(out, list)


def test_empty_and_tiny_inputs():
    for payload in (b"", b"\x00", b"a", b"%PDF", b"PK", b"\xd0\xcf\x11\xe0"):
        for name in (None, "x.pdf", "x.docx", "x.txt"):
            try:
                out = partition_bytes(payload, filename=name)
            except ALLOWED:
                continue
            assert isinstance(out, list)


def test_parser_bug_propagates_decode_error_classifies():
    """The malformed-input boundary is a whitelist of decode exception
    types: a buggy parser's TypeError must surface as-is (a bug, not
    malformed input), while zipfile/struct/unicode-style decode errors
    still classify as MalformedDocumentError."""
    import zipfile

    from unstructured_spark.parsers.dispatch import (
        MalformedDocumentError,
        _PARTITIONERS,
        register_partitioner,
    )

    def buggy(content, **kw):
        raise TypeError("'NoneType' object is not subscriptable")

    def truncated(content, **kw):
        raise zipfile.BadZipFile("File is not a zip file")

    orig = _PARTITIONERS["csv"]
    try:
        register_partitioner("csv", buggy)
        with pytest.raises(TypeError):
            partition_bytes(b"a,b\n1,2\n", filename="f.csv")
        register_partitioner("csv", truncated)
        with pytest.raises(MalformedDocumentError, match="BadZipFile"):
            partition_bytes(b"a,b\n1,2\n", filename="f.csv")
    finally:
        _PARTITIONERS["csv"] = orig


def test_plain_oserror_infra_errno_propagates():
    """A PLAIN OSError carrying an infra errno (disk full, fd
    exhaustion) is executor trouble and must propagate — only
    codec-style OSErrors without an infra errno classify as malformed
    input."""
    import errno

    from unstructured_spark.parsers.dispatch import (
        MalformedDocumentError,
        _PARTITIONERS,
        register_partitioner,
    )

    def disk_full(content, **kw):
        raise OSError(errno.ENOSPC, "No space left on device")

    def codec_oserror(content, **kw):
        raise OSError("broken data stream when reading image file")

    orig = _PARTITIONERS["csv"]
    try:
        register_partitioner("csv", disk_full)
        with pytest.raises(OSError, match="No space left"):
            partition_bytes(b"a,b\n1,2\n", filename="f.csv")
        register_partitioner("csv", codec_oserror)
        with pytest.raises(MalformedDocumentError, match="broken data stream"):
            partition_bytes(b"a,b\n1,2\n", filename="f.csv")
    finally:
        _PARTITIONERS["csv"] = orig
