"""Stdlib byte→str encoding detection for document parsing.

Mirrors the behavioral contract of the reference's
``file_utils/encoding.py`` (charset_normalizer detect → common-encoding
fallback chain) without the third-party detector:

1. BOM sniff (utf-8-sig / utf-32 before utf-16 — the utf-32-le BOM is a
   prefix-superset of the utf-16-le one).
2. Strict UTF-8 attempt (the overwhelmingly common case; also covers
   pure ASCII).
3. NUL-byte heuristic for BOM-less utf-16/utf-32 (the reference's
   detector recognizes these statistically; the fixtures
   ``fake-text-utf-16-le.txt`` / ``-be.txt`` are BOM-less).
4. Declared-charset sniff for HTML ``<meta charset=…>`` /
   ``<meta http-equiv="Content-Type" content="…charset=…">`` and XML
   ``<?xml … encoding="…"?>`` prologs.
5. latin-1 fallback (total function — every byte string decodes).

The earlier implementation tried utf-16 blindly before latin-1, so any
even-length non-UTF-8 latin-1 document decoded "successfully" as CJK
garbage; step 3's positional-NUL test removes that failure mode.
"""

from __future__ import annotations

import codecs
import re

_HTML_META_RE = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?\s*([A-Za-z0-9._:\-]+)""", re.IGNORECASE
)
_XML_DECL_RE = re.compile(
    rb"""<\?xml[^>]+encoding\s*=\s*["']([A-Za-z0-9._:\-]+)["']""", re.IGNORECASE
)

# (BOM, codec) in match order: longer/ambiguous BOMs first.  The
# BOM-consuming codecs ("utf-16"/"utf-32"/"utf-8-sig") are used so the
# BOM never leaks into the decoded text.
_BOMS: tuple[tuple[bytes, str], ...] = (
    (codecs.BOM_UTF32_LE, "utf-32"),
    (codecs.BOM_UTF32_BE, "utf-32"),
    (codecs.BOM_UTF8, "utf-8-sig"),
    (codecs.BOM_UTF16_LE, "utf-16"),
    (codecs.BOM_UTF16_BE, "utf-16"),
)


def _bom_encoding(head: bytes) -> str | None:
    for bom, enc in _BOMS:
        if head.startswith(bom):
            return enc
    return None


def _nul_pattern_encoding(content: bytes) -> str | None:
    """BOM-less utf-16/utf-32 sniff via positional NUL-byte statistics.

    Text in any mostly-ASCII language encoded as utf-16 puts a NUL in
    every other byte; utf-32 puts three NULs per code unit.  Plain
    single-byte text essentially never contains NULs, so a high NUL
    ratio at fixed stride positions is a decisive signal.
    """
    sample = content[:4096]
    n = len(sample)
    if n < 8:
        return None
    nul_ratio = sample.count(0) / n
    if nul_ratio < 0.25:
        return None
    if nul_ratio >= 0.6 and n >= 16:
        # utf-32: 3-of-4 NULs. LE → bytes 1..3 of each unit are NUL.
        if all(sample[i + 1] == 0 and sample[i + 2] == 0 for i in range(0, n - 4, 4)):
            return "utf-32-le"
        if all(sample[i] == 0 and sample[i + 1] == 0 for i in range(0, n - 4, 4)):
            return "utf-32-be"
    even_nuls = sum(1 for i in range(0, n - 1, 2) if sample[i] == 0)
    odd_nuls = sum(1 for i in range(1, n, 2) if sample[i] == 0)
    pairs = n // 2
    if pairs == 0:
        return None
    if odd_nuls / pairs > 0.5 and even_nuls / pairs < 0.2:
        return "utf-16-le"
    if even_nuls / pairs > 0.5 and odd_nuls / pairs < 0.2:
        return "utf-16-be"
    return None


def _declared_encoding(head: bytes) -> str | None:
    """Charset declared inside the document itself (HTML meta / XML prolog)."""
    m = _XML_DECL_RE.search(head) or _HTML_META_RE.search(head)
    if not m:
        return None
    name = m.group(1).decode("ascii", errors="replace").strip().lower()
    try:
        codecs.lookup(name)
    except LookupError:
        return None
    return name


def detect_encoding(content: bytes) -> str:
    """Best-effort encoding name for ``content`` (never raises)."""
    head = content[:4096]
    enc = _bom_encoding(head)
    if enc:
        return enc
    # NUL heuristic runs BEFORE the utf-8 attempt: NUL bytes are valid
    # UTF-8 code points, so BOM-less utf-16 ASCII text "decodes" as
    # utf-8 into NUL-riddled garbage.
    enc = _nul_pattern_encoding(content)
    if enc:
        return enc
    try:
        content.decode("utf-8")
        return "utf-8"
    except (UnicodeDecodeError, UnicodeError):
        pass
    enc = _declared_encoding(head)
    if enc:
        try:
            content.decode(enc)
            return enc
        except (UnicodeDecodeError, UnicodeError, LookupError):
            pass
    # cp1252 before latin-1: identical on 0xA0-0xFF but maps the
    # 0x80-0x9F block to real characters (€, ™, curly quotes) instead
    # of C1 controls; its 5 undefined bytes fall through to latin-1.
    try:
        content.decode("cp1252")
        return "cp1252"
    except (UnicodeDecodeError, UnicodeError):
        return "latin-1"


def decode_bytes(content: bytes | str) -> str:
    """Decode document bytes to text using :func:`detect_encoding`."""
    if isinstance(content, str):
        return content
    enc = detect_encoding(content)
    try:
        return content.decode(enc)
    except (UnicodeDecodeError, UnicodeError):
        return content.decode("utf-8", errors="replace")
