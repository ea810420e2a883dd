"""Per-format dispatch — the Python core of the ``partition()`` auto
router (reference ``partition/auto.py:30-300``), run executor-side
inside the Spark partition UDF.

Formats whose native parsers aren't available in this environment
(pdf/docx/pptx/xlsx/images/audio need pdfminer/python-docx/onnx/...)
raise :class:`UnsupportedFormatError`; the Spark operator surfaces them
per its ``on_error`` policy. The registry is open: ``register_partitioner``
mirrors the reference's extension point (file_utils/model.py:584-591).
"""

from __future__ import annotations

import binascii
import csv as _csv
import errno as _errno
import json
import struct
import xml.etree.ElementTree as _ET
import zipfile
import zlib
from typing import Callable

from unstructured_spark.parsers import filetype as ft_mod
from unstructured_spark.parsers.csv_parser import csv_to_elements, tsv_to_elements
from unstructured_spark.parsers.html_parser import html_to_elements
from unstructured_spark.parsers.md_parser import md_to_elements
from unstructured_spark.parsers.text_parser import text_to_elements


class UnsupportedFormatError(NotImplementedError):
    pass


class MalformedDocumentError(ValueError):
    """A format parser hit bytes it could not make sense of (truncated,
    bit-rotted, or mislabeled input) — the dispatcher's catch-all so
    executor-side partitioning raises one predictable type."""


# decode-exception whitelist for partition_bytes: these reclassify as
# MalformedDocumentError; everything else is a parser BUG and
# propagates (fuzz-grown: csv.Error joined via the mutation suite).
# OSError covers PIL-style codec raises and any native decode layer
# that reports corrupt input as an I/O error (r6 ADVICE: one malformed
# doc must not kill the task under on_error='skip'). Plain
# RuntimeError stays OUT — it would mask real parser bugs; native
# adapters that raise RuntimeError subclasses (pypdfium2's
# PdfiumError) are wrapped at the adapter boundary instead
# (model_adapters.PdfiumRasterizer.__call__).
_DECODE_ERRORS = (
    struct.error,
    zlib.error,
    binascii.Error,
    zipfile.BadZipFile,
    _ET.ParseError,
    _csv.Error,
    UnicodeError,
    KeyError,
    IndexError,
    OverflowError,
    EOFError,
    OSError,
)

# ...but OSError subtypes that signal executor/infrastructure trouble
# (missing model file, unreadable dir, dropped connection) must stay
# FATAL: under on_error='skip' a misconfigured executor would
# otherwise silently skip the whole corpus as "malformed" and report
# success with zero elements.
_INFRA_ERRORS = (
    FileNotFoundError,
    PermissionError,
    IsADirectoryError,
    NotADirectoryError,
    InterruptedError,
    BlockingIOError,
    ConnectionError,
    TimeoutError,
)

# PLAIN OSError carrying an infrastructure errno (disk full, fd
# exhaustion, I/O failure) has no dedicated subclass — without this
# check a full disk would be skipped document-by-document as
# "malformed" under on_error='skip'
_INFRA_ERRNOS = frozenset(
    (_errno.ENOSPC, _errno.EMFILE, _errno.ENFILE, _errno.EIO, _errno.EDQUOT)
)


def _is_infra_oserror(e: BaseException) -> bool:
    return (
        isinstance(e, OSError)
        and not isinstance(e, _INFRA_ERRORS)  # subclasses handled upstream
        and e.errno in _INFRA_ERRNOS
    )


def _decode(content: bytes | str) -> str:
    """BOM/NUL-heuristic/declared-charset decode (parsers/encoding.py);
    replaces the old blind utf-16-before-latin-1 chain that garbled
    even-length latin-1 docs (reference: file_utils/encoding.py)."""
    from unstructured_spark.parsers.encoding import decode_bytes

    return decode_bytes(content)


def _partition_json_elements(content: bytes | str) -> list[dict]:
    """Re-ingest previously serialized elements (reference
    partition/json.py:30-100)."""
    text = _decode(content)
    data = json.loads(text)
    if not isinstance(data, list):
        raise ValueError("element JSON must be an array of element dicts")
    out = []
    for d in data:
        wire_type = d.get("type", "Text")
        el = {
            # wire tag 'UncategorizedText' is the reference's base Text
            # category (TYPE_TO_TEXT_ELEMENT_MAP, elements.py:1051-1090)
            "type": "Text" if wire_type == "UncategorizedText" else wire_type,
            "text": d.get("text", ""),
            "element_id": d.get("element_id"),
        }
        md = d.get("metadata") or {}
        for k in ("page_number", "page_name", "parent_id", "category_depth",
                  "filename", "url", "languages", "text_as_html"):
            if k in md:
                el[k] = md[k]
        out.append(el)
    return out


def _partition_ndjson_elements(content: bytes | str) -> list[dict]:
    text = _decode(content)
    out = []
    for line in text.splitlines():
        line = line.strip()
        if not line:
            continue
        out.extend(_partition_json_elements("[" + line + "]"))
    return out


def _partition_xml(content: bytes | str) -> list[dict]:
    """Leaf-element text extraction (reference partition/xml.py:25-130)
    → classified like plain text."""
    import xml.etree.ElementTree as ET

    text = _decode(content)
    try:
        root = ET.fromstring(text)
    except ET.ParseError:
        return text_to_elements(text)
    leaves: list[str] = []
    for node in root.iter():
        if len(node) == 0 and node.text and node.text.strip():
            leaves.append(node.text.strip())
    return text_to_elements("\n\n".join(leaves))


def _lazy(module: str, fn: str) -> Callable[..., list[dict]]:
    """Import a parser module on first use (executor-side lazy import —
    the reference's partitioner-cache trick, auto.py:354-390)."""
    import importlib

    mod = importlib.import_module(f"unstructured_spark.parsers.{module}")
    return getattr(mod, fn)


def _unsupported(name: str, needs: str) -> Callable[..., list[dict]]:
    def fail(content, **kwargs):
        raise UnsupportedFormatError(
            f"partition_{name} requires {needs}, which is not available in "
            "this environment. The Spark-side plumbing (schema, routing, "
            "ordering) is in place; install the dependency on executors to "
            "enable this format."
        )

    return fail


_PARTITIONERS: dict[str, Callable[..., list[dict]]] = {
    "txt": lambda c, **kw: text_to_elements(_decode(c), paragraph_grouper="auto"),
    "html": lambda c, **kw: (
        _lazy("html_ontology", "parse_html_v2")(_decode(c))
        if kw.get("html_parser_version") == "v2"
        else html_to_elements(_decode(c))
    ),
    "md": lambda c, **kw: md_to_elements(_decode(c)),
    "csv": lambda c, **kw: csv_to_elements(_decode(c)),
    "tsv": lambda c, **kw: tsv_to_elements(_decode(c)),
    "xml": lambda c, **kw: _partition_xml(c),
    "json": lambda c, **kw: _partition_json_elements(c),
    "ndjson": lambda c, **kw: _partition_ndjson_elements(c),
    "rst": lambda c, **kw: _lazy("structured_text", "rst_to_elements")(_decode(c)),
    "org": lambda c, **kw: _lazy("structured_text", "org_to_elements")(_decode(c)),
    # OOXML / ODF / EPUB / RTF parsed directly with stdlib zip+XML
    # (the reference needs python-docx/pptx/openpyxl/pandoc for these)
    "docx": lambda c, **kw: _lazy("docx_parser", "docx_to_elements")(c),
    "pptx": lambda c, **kw: _lazy("pptx_parser", "pptx_to_elements")(c),
    "xlsx": lambda c, **kw: _lazy("xlsx_parser", "xlsx_to_elements")(c),
    "odt": lambda c, **kw: _lazy("misc_formats", "odt_to_elements")(c),
    "epub": lambda c, **kw: _lazy("misc_formats", "epub_to_elements")(c),
    "rtf": lambda c, **kw: _lazy("misc_formats", "rtf_to_elements")(c),
    # PDF fast strategy: stdlib content-stream extraction; hi_res/ocr
    # strategies need layout/OCR models (stubs below route to fast)
    "pdf": lambda c, **kw: _lazy("pdf_parser", "pdf_to_elements")(
        c,
        **{
            k: kw[k]
            for k in (
                "strategy",
                "extract_images",
                "extract_forms",
                "pdf_hi_res_max_pages",
            )
            if kw.get(k) is not None
        },
    ),
    # legacy binary Office via the stdlib CFB reader (the reference
    # shells out to soffice for these)
    "doc": lambda c, **kw: _lazy("legacy_office", "doc_to_elements")(c),
    "ppt": lambda c, **kw: _lazy("legacy_office", "ppt_to_elements")(c),
    "xls": lambda c, **kw: _lazy("legacy_office", "xls_to_elements")(c),
    # model-dependent formats: explicit stubs (SURVEY §2.1 image/audio)
    "msg": lambda c, **kw: _lazy("msg_parser", "msg_to_elements")(c),
    # png/bmp/gif: pixel decode + hi_res merge/supplement/order are real
    # (parsers/image_parser.py over the stdlib codec); the layout/OCR
    # model calls are plug points (set_layout_model / set_ocr_agent)
    # and raise a named gate when unregistered.
    "png": lambda c, **kw: _lazy("image_parser", "image_to_elements")(c),
    "jpg": lambda c, **kw: _lazy("image_parser", "image_to_elements")(c),
    "tiff": lambda c, **kw: _lazy("image_parser", "image_to_elements")(c),
    "bmp": lambda c, **kw: _lazy("image_parser", "image_to_elements")(c),
    "gif": lambda c, **kw: _lazy("image_parser", "image_to_elements")(c),
    # wav: PCM decode + energy-VAD segmentation are real (stdlib wave +
    # numpy); transcription needs a registered speech-to-text agent
    # (audio_parser.set_speech_to_text) and raises a named gate without.
    "wav": lambda c, **kw: _lazy("audio_parser", "audio_to_elements")(c),
    # compressed audio: the reference hands these bytes to Whisper,
    # whose ffmpeg does the decode (reference partition/audio.py:36-43)
    # — here the decode is the set_audio_decoder plug + the same VAD/
    # STT pipeline; both plugs raise named gates when absent
    "mp3": lambda c, **kw: _lazy("audio_parser", "audio_to_elements")(
        c, audio_format="mp3"
    ),
    "mp4": lambda c, **kw: _lazy("audio_parser", "audio_to_elements")(
        c, audio_format="mp4"
    ),
    # detection knows the brand (filetype.py HEIC sniff); decode needs
    # an HEVC codec the stdlib pipeline cannot provide (the reference
    # needs pillow-heif for the same reason)
    "heic": _unsupported("image", "an HEIC/HEVC decoder (pillow-heif)"),
}


def register_partitioner(filetype: str, fn: Callable[..., list[dict]]) -> None:
    """Extension point: plug a parser for a filetype tag (mirrors the
    reference's partitioner registry)."""
    _PARTITIONERS[filetype] = fn


def partition_bytes(
    content: bytes | str,
    *,
    filename: str | None = None,
    content_type: str | None = None,
    html_parser_version: str | None = None,
    **parser_kwargs,
) -> list[dict]:
    """Detect + dispatch one document; returns ordered element dicts.

    ``html_parser_version="v2"`` routes HTML through the ontology
    partitioner (parsers/html_ontology.py; reference
    html/partition.py:280-293) instead of the v1 flow parser.
    Extra ``parser_kwargs`` flow to the format partitioner (every
    registry entry accepts-and-ignores unknown ones), e.g. the PDF
    surface: ``strategy``, ``extract_images``, ``extract_forms``,
    ``pdf_hi_res_max_pages``.
    """
    head = content[:8192] if isinstance(content, bytes) else content[:8192].encode()
    ft = ft_mod.detect_filetype(filename=filename, content_type=content_type, head=head)
    # CFB containers share one magic; the directory stream names tell
    # doc/xls/ppt/msg apart (reference uses libmagic + ext for this)
    if ft in ("doc", "xls", "ppt", "msg") and isinstance(content, bytes):
        try:
            from unstructured_spark.parsers.msg_parser import CfbFile

            names = {e["name"] for e in CfbFile(content).entries}
            if "EncryptedPackage" in names or "EncryptionInfo" in names:
                raise UnsupportedFormatError(
                    "password-protected Office document (CFB EncryptedPackage); "
                    "decryption requires the document password"
                )
            if "WordDocument" in names:
                ft = "doc"
            elif names & {"Workbook", "Book"}:
                ft = "xls"
            elif "PowerPoint Document" in names:
                ft = "ppt"
            elif any(n.startswith("__substg1.0_") for n in names):
                ft = "msg"
        except UnsupportedFormatError:
            raise
        except Exception:
            pass
    # eml detection: RFC-822 headers at start of text files
    if ft == "txt" and isinstance(head, bytes):
        first = head.lstrip()[:200]
        if first.startswith((b"Received:", b"From:", b"Return-Path:", b"MIME-Version:")):
            ft = "eml"
    # robustness boundary: at corpus scale the input WILL contain
    # truncated/bit-rotted/mislabeled blobs, and one stray low-level
    # exception (zipfile.BadZipFile, struct.error, IndexError, ...)
    # inside a mapInPandas partitioner kills the whole task. The
    # documented contract is list-or-ValueError; the KNOWN decode
    # exception types (_DECODE_ERRORS, module scope — this is the
    # per-document hot path) convert to MalformedDocumentError here —
    # anything outside the whitelist (TypeError, AttributeError, ...)
    # is a parser bug, not malformed input, and propagates so
    # on_error='skip' can't silently bury it.
    try:
        if ft == "eml":
            from unstructured_spark.parsers.email_parser import email_to_elements

            els = email_to_elements(
                content if isinstance(content, bytes) else content.encode()
            )
        else:
            fn = _PARTITIONERS.get(ft)
            if fn is None:
                raise UnsupportedFormatError(f"no partitioner registered for {ft!r}")
            els = fn(
                content,
                html_parser_version=html_parser_version,
                **parser_kwargs,
            )
    except (UnsupportedFormatError, ValueError):
        raise
    except (RecursionError, MemoryError):
        # resource exhaustion is an executor problem, not malformed input —
        # reclassifying it would silently drop healthy documents under
        # on_error='skip'.
        raise
    except _INFRA_ERRORS:
        # checked BEFORE the OSError whitelist: infrastructure
        # failures propagate loudly instead of skipping per-document
        raise
    except _DECODE_ERRORS as e:
        if _is_infra_oserror(e):
            # plain OSError with an infra errno (ENOSPC/EMFILE/...):
            # executor trouble, not malformed input
            raise
        raise MalformedDocumentError(
            f"malformed {ft} document: {type(e).__name__}: {e}"
        ) from e
    mime = ft_mod.MIME_FOR.get(ft, "application/octet-stream")
    for el in els:
        el.setdefault("filetype", mime)
        if filename:
            el.setdefault("filename", filename.rsplit("/", 1)[-1])
            if "/" in filename:
                el.setdefault("file_directory", filename.rsplit("/", 1)[0])
    return els
