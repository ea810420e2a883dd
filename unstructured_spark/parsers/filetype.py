"""File-type detection — the 3-strategy chain of the reference
(``file_utils/filetype.py:67-338``): (1) caller-asserted content type,
(2) magic-byte sniff of the head (stdlib replacement for libmagic),
(3) extension map. ZIP and JSON get content disambiguators.
"""

from __future__ import annotations

import json
import re

# canonical filetype tag → (extensions, MIME types)
FILETYPES: dict[str, tuple[tuple[str, ...], tuple[str, ...]]] = {
    "txt": ((".txt", ".text", ".log"), ("text/plain",)),
    "html": ((".html", ".htm"), ("text/html",)),
    "xml": ((".xml",), ("application/xml", "text/xml")),
    "md": ((".md", ".markdown"), ("text/markdown", "text/x-markdown")),
    "rst": ((".rst",), ("text/x-rst",)),
    "org": ((".org",), ("text/org",)),
    "rtf": ((".rtf",), ("application/rtf", "text/rtf")),
    "csv": ((".csv",), ("text/csv",)),
    "tsv": ((".tsv",), ("text/tsv", "text/tab-separated-values")),
    "json": ((".json",), ("application/json",)),
    "ndjson": ((".ndjson", ".jsonl"), ("application/x-ndjson",)),
    "eml": ((".eml", ".p7s"), ("message/rfc822",)),
    "msg": ((".msg",), ("application/vnd.ms-outlook",)),
    "pdf": ((".pdf",), ("application/pdf",)),
    "docx": (
        (".docx",),
        ("application/vnd.openxmlformats-officedocument.wordprocessingml.document",),
    ),
    "doc": ((".doc",), ("application/msword",)),
    "odt": ((".odt",), ("application/vnd.oasis.opendocument.text",)),
    "pptx": (
        (".pptx",),
        ("application/vnd.openxmlformats-officedocument.presentationml.presentation",),
    ),
    "ppt": ((".ppt",), ("application/vnd.ms-powerpoint",)),
    "xlsx": (
        (".xlsx",),
        ("application/vnd.openxmlformats-officedocument.spreadsheetml.sheet",),
    ),
    "xls": ((".xls",), ("application/vnd.ms-excel",)),
    "epub": ((".epub",), ("application/epub", "application/epub+zip")),
    "png": ((".png",), ("image/png",)),
    "jpg": ((".jpg", ".jpeg"), ("image/jpeg",)),
    "tiff": ((".tiff", ".tif"), ("image/tiff",)),
    "bmp": ((".bmp",), ("image/bmp",)),
    "gif": ((".gif",), ("image/gif",)),
    "heic": ((".heic",), ("image/heic",)),
    "wav": ((".wav",), ("audio/wav", "audio/x-wav")),
    "mp3": ((".mp3",), ("audio/mpeg",)),
    "mp4": ((".mp4",), ("video/mp4",)),
    "zip": ((".zip",), ("application/zip",)),
}

_EXT_MAP = {ext: ft for ft, (exts, _) in FILETYPES.items() for ext in exts}
_MIME_MAP = {m: ft for ft, (_, mimes) in FILETYPES.items() for m in mimes}
# Google-Drive native types map to their standard export format
# (reference file_utils/google_filetype.py)
_MIME_MAP.update(
    {
        "application/vnd.google-apps.document": "docx",
        "application/vnd.google-apps.spreadsheet": "xlsx",
        "application/vnd.google-apps.presentation": "pptx",
        "application/vnd.google-apps.photo": "jpg",
    }
)

MIME_FOR: dict[str, str] = {ft: mimes[0] for ft, (_, mimes) in FILETYPES.items()}

_HTML_HINT_RE = re.compile(
    rb"<!doctype html|<html|<head|<body|<div|<p[ >]", re.I
)


def _sniff_magic(head: bytes) -> str | None:
    if head.startswith(b"%PDF"):
        return "pdf"
    if head.startswith(b"\x89PNG"):
        return "png"
    if head.startswith(b"\xff\xd8\xff"):
        return "jpg"
    if head.startswith((b"II*\x00", b"MM\x00*")):
        return "tiff"
    if head.startswith(b"BM"):
        return "bmp"
    if head.startswith((b"GIF87a", b"GIF89a")):
        return "gif"
    if head.startswith(b"RIFF") and head[8:12] == b"WAVE":
        return "wav"
    if head.startswith((b"ID3", b"\xff\xfb", b"\xff\xf3")):
        return "mp3"
    if head[4:8] == b"ftyp":
        # ISO-BMFF brand distinguishes HEIF images from video containers
        brand = head[8:12]
        if brand in (b"heic", b"heix", b"heif", b"mif1", b"msf1", b"avif"):
            return "heic"
        return "mp4"
    if head.startswith(b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1"):
        return "doc"  # CFB container: doc/xls/ppt/msg — ext disambiguates
    if head.startswith(b"{\\rtf"):
        return "rtf"
    if head.startswith(b"PK\x03\x04"):
        return "zip"  # OOXML/epub/odt disambiguated below
    if _HTML_HINT_RE.search(head):
        return "html"
    return None


def _disambiguate_zip(head: bytes, ext_guess: str | None) -> str:
    if ext_guess in ("docx", "pptx", "xlsx", "epub", "odt"):
        return ext_guess
    # OOXML content-type hints live in the zip central directory; with
    # only the head available, look for the first local-file name
    for marker, ft in (
        (b"word/", "docx"),
        (b"ppt/", "pptx"),
        (b"xl/", "xlsx"),
        (b"mimetypeapplication/epub", "epub"),
    ):
        if marker in head[:4096]:
            return ft
    return "zip"


def _looks_like_element_json(head: str) -> bool:
    try:
        data = json.loads(head)
    except json.JSONDecodeError:
        return False
    return (
        isinstance(data, list)
        and bool(data)
        and isinstance(data[0], dict)
        and ("type" in data[0] or "element_id" in data[0])
    )


def detect_filetype(
    filename: str | None = None,
    content_type: str | None = None,
    head: bytes | None = None,
) -> str:
    """Return the canonical filetype tag ('txt', 'html', 'pdf', ...)."""
    ext = None
    if filename and "." in filename:
        ext = "." + filename.rsplit(".", 1)[-1].lower()
    ext_guess = _EXT_MAP.get(ext) if ext else None

    # 1. caller-asserted content type
    if content_type:
        ct = content_type.split(";")[0].strip().lower()
        ft = _MIME_MAP.get(ct)
        if ft:
            return _disambiguate_zip(head or b"", ext_guess) if ft == "zip" else ft

    # 2. magic bytes
    if head:
        sniffed = _sniff_magic(head)
        if sniffed == "zip":
            return _disambiguate_zip(head, ext_guess)
        if sniffed == "doc" and ext_guess in ("doc", "xls", "ppt", "msg"):
            return ext_guess
        if sniffed and not (sniffed == "html" and ext_guess):
            return sniffed

    # 3. extension
    if ext_guess:
        return ext_guess

    # fallback: text-ish content sniff
    if head is not None:
        try:
            text = head.decode("utf-8")
        except UnicodeDecodeError:
            return "bin"
        stripped = text.lstrip()
        if stripped.startswith(("[", "{")) and _looks_like_element_json(
            stripped[:65536]
        ):
            return "json"
        return "txt"
    return "txt"
