"""PDF fast-strategy text extraction with stdlib only (zlib for
FlateDecode) — no pdfminer dependency.

Mirrors the reference's ``partition_pdf(strategy="fast")`` behavior
(``partition/pdf.py:430-587``): extract positioned text runs per page,
group runs into lines and lines into blocks by vertical gap, classify
each block, and stamp ``page_number`` + bounding-box coordinates.

Deliberate scope of this fast path (same trade-off the reference makes
before escalating to hi_res): text comes from content-stream show-text
operators (``Tj/TJ/'/"``); fonts are decoded via their ToUnicode CMap
when present, else code-point identity (WinAnsi/Latin-1 superset) —
scanned/image-only PDFs yield no text and should be routed to an OCR
strategy, which needs an OCR model this environment doesn't ship
(``strategies.py:24-109`` fallback chain).

The parser scans for *all* ``N 0 obj`` objects instead of walking the
xref table, and expands object streams (``/Type /ObjStm``), so both
classic and cross-reference-stream PDFs parse.
"""

from __future__ import annotations

import io
import re
import zlib

from unstructured_spark.parsers import classify

# cap on a single decoded PDF stream (matches serde.decode_orig_elements)
_MAX_STREAM_BYTES = 200 * 1024 * 1024

_TOKEN_RE = re.compile(
    rb"<<|>>|\[|\]|/([^\s/<>\[\]()]+)|\((?:)|<([0-9a-fA-F\s]*)>|"
    rb"(-?[\d.]+)|(\w+)"
)
_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b", re.S)
_WS = b"\x00\t\n\x0c\r "


class _Ref:
    __slots__ = ("num",)

    def __init__(self, num: int):
        self.num = num


class _Lexer:
    """Tokenizer for PDF object syntax (dicts, arrays, names, numbers,
    strings, refs)."""

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def _skip_ws(self) -> None:
        d, n = self.data, len(self.data)
        while self.pos < n:
            ch = d[self.pos : self.pos + 1]
            if ch in (b"%",):  # comment to EOL
                eol = d.find(b"\n", self.pos)
                self.pos = eol + 1 if eol >= 0 else n
            elif ch in _WS:
                self.pos += 1
            else:
                return

    def parse(self):
        self._skip_ws()
        d = self.data
        ch = d[self.pos : self.pos + 1]
        if ch == b"<":
            if d[self.pos : self.pos + 2] == b"<<":
                return self._dict()
            return self._hex_string()
        if ch == b"[":
            return self._array()
        if ch == b"(":
            return self._literal_string()
        if ch == b"/":
            return self._name()
        if ch in b"+-.0123456789":
            return self._number_or_ref()
        m = re.match(rb"true|false|null", d[self.pos :])
        if m:
            self.pos += m.end()
            return {b"true": True, b"false": False, b"null": None}[m.group()]
        # unknown token (operator etc.) — consume one char to advance
        self.pos += 1
        return None

    def _name(self) -> str:
        m = re.match(rb"/([^\s/<>\[\]()%]*)", self.data[self.pos :])
        self.pos += m.end()
        raw = m.group(1)
        raw = re.sub(
            rb"#([0-9a-fA-F]{2})", lambda g: bytes([int(g.group(1), 16)]), raw
        )
        return "/" + raw.decode("latin-1")

    def _number_or_ref(self):
        d = self.data
        m = re.match(rb"(\d+)\s+(\d+)\s+R\b", d[self.pos :])
        if m:
            self.pos += m.end()
            return _Ref(int(m.group(1)))
        m = re.match(rb"[+-]?(\d+\.?\d*|\.\d+)", d[self.pos :])
        self.pos += m.end()
        tok = m.group()
        return float(tok) if b"." in tok else int(tok)

    def _array(self) -> list:
        self.pos += 1
        out = []
        while True:
            self._skip_ws()
            if self.data[self.pos : self.pos + 1] in (b"]", b""):
                self.pos += 1
                return out
            out.append(self.parse())

    def _dict(self) -> dict:
        self.pos += 2
        out = {}
        while True:
            self._skip_ws()
            nxt = self.data[self.pos : self.pos + 2]
            if nxt == b">>" or nxt == b"":
                self.pos += 2
                return out
            key = self.parse()
            val = self.parse()
            if isinstance(key, str):
                out[key] = val

    def _hex_string(self) -> bytes:
        end = self.data.find(b">", self.pos)
        hexstr = re.sub(rb"\s", b"", self.data[self.pos + 1 : end])
        self.pos = end + 1
        if len(hexstr) % 2:
            hexstr += b"0"
        return bytes.fromhex(hexstr.decode("ascii"))

    def _literal_string(self) -> bytes:
        d = self.data
        i = self.pos + 1
        depth = 1
        out = bytearray()
        esc = {
            b"n": 10, b"r": 13, b"t": 9, b"b": 8, b"f": 12,
            b"(": 40, b")": 41, b"\\": 92,
        }
        while i < len(d) and depth:
            ch = d[i : i + 1]
            if ch == b"\\":
                nxt = d[i + 1 : i + 2]
                if nxt in esc:
                    out.append(esc[nxt])
                    i += 2
                elif nxt.isdigit():
                    m = re.match(rb"[0-7]{1,3}", d[i + 1 :])
                    if m:
                        out.append(int(m.group(), 8) & 0xFF)
                        i += 1 + m.end()
                    else:  # \8 \9: invalid octal, keep the digit
                        out += nxt
                        i += 2
                elif nxt in (b"\n", b"\r"):
                    i += 2  # line continuation
                else:
                    i += 1
            elif ch == b"(":
                depth += 1
                out += ch
                i += 1
            elif ch == b")":
                depth -= 1
                if depth:
                    out += ch
                i += 1
            else:
                out += ch
                i += 1
        self.pos = i
        return bytes(out)


def _decode_stream(raw: bytes, sdict: dict) -> bytes | None:
    filt = sdict.get("/Filter")
    filters = filt if isinstance(filt, list) else ([filt] if filt else [])
    data = raw
    for f in filters:
        if f == "/FlateDecode":
            # bounded decompress: a crafted deflate bomb must not exhaust
            # executor memory (cap mirrors serde's 200 MB guard)
            try:
                d = zlib.decompressobj()
                data = d.decompress(data, _MAX_STREAM_BYTES)
                if d.unconsumed_tail:
                    return None  # output exceeded the cap — reject
            except zlib.error:
                return None
        elif f in ("/ASCIIHexDecode",):
            h = re.sub(rb"[^0-9a-fA-F]", b"", data.split(b">")[0])
            if len(h) % 2:
                h += b"0"  # odd digit count is legal: trailing 0 implied
            data = bytes.fromhex(h.decode())
        elif f == "/ASCII85Decode":
            import base64

            payload = data.split(b"~>")[0]
            payload = re.sub(rb"\s", b"", payload)
            try:
                data = base64.a85decode(payload, adobe=False)
            except ValueError:
                return None
        else:
            return None  # DCT/JBIG2/... are image codecs — no text here
        # predictors (PNG row filters) apply to xref streams we don't
        # read; content streams practically never use them
    return data


class _PdfDoc:
    def __init__(self, data: bytes):
        self.objects: dict[int, object] = {}
        self.streams: dict[int, bytes] = {}
        self.gens: dict[int, int] = {}
        self._scan(data)
        self._decrypt_if_needed(data)
        self._expand_object_streams()

    def _decrypt_if_needed(self, data: bytes) -> None:
        """Standard-handler decryption for owner-password-only
        ("copy-protected") documents — the reference extracts these
        via pdfminer (test_strategies.py:34-41); a true user password
        raises PdfEncryptedError. Runs BEFORE object-stream expansion
        (ObjStm payloads decrypt as whole streams; the objects inside
        are not separately encrypted)."""
        from unstructured_spark.parsers.pdf_crypto import StandardDecryptor

        m = None
        for m2 in re.finditer(rb"/Encrypt\s+(\d+)\s+(\d+)\s+R", data):
            m = m2  # last trailer wins (incremental updates)
        if m is None:
            return
        enc_num = int(m.group(1))
        enc = self.objects.get(enc_num)
        if not isinstance(enc, dict) or enc.get("/Filter") != "/Standard":
            return
        idm = re.search(rb"/ID\s*\[\s*<([0-9A-Fa-f]+)>", data)
        file_id = bytes.fromhex(idm.group(1).decode()) if idm else b""
        enc_resolved = {k: self.resolve(v) for k, v in enc.items()}
        dec = StandardDecryptor(enc_resolved, file_id)
        for num, raw in list(self.streams.items()):
            obj = self.objects.get(num)
            if isinstance(obj, dict) and obj.get("/Type") == "/XRef":
                continue  # cross-reference streams are never encrypted
            self.streams[num] = dec.decrypt(num, self.gens.get(num, 0), raw)

        def walk(x, num: int, gen: int):
            if isinstance(x, dict):
                return {k: walk(v, num, gen) for k, v in x.items()}
            if isinstance(x, list):
                return [walk(v, num, gen) for v in x]
            if isinstance(x, bytes):
                return dec.decrypt(num, gen, x)
            return x

        for num, obj in list(self.objects.items()):
            if num == enc_num:
                continue  # /O and /U are stored in the clear
            self.objects[num] = walk(obj, num, self.gens.get(num, 0))

    def _scan(self, data: bytes) -> None:
        for m in _OBJ_RE.finditer(data):
            num = int(m.group(1))
            self.gens[num] = int(m.group(2))
            lex = _Lexer(data, m.end())
            try:
                obj = lex.parse()
            except Exception:
                continue
            self.objects[num] = obj
            if isinstance(obj, dict):
                sm = re.match(rb"\s*stream\r?\n", data[lex.pos :])
                if sm:
                    start = lex.pos + sm.end()
                    length = obj.get("/Length")
                    if isinstance(length, _Ref):
                        length = self.objects.get(length.num)
                    if isinstance(length, (int, float)):
                        end = start + int(length)
                    else:
                        end = data.find(b"endstream", start)
                    self.streams[num] = data[start:end]

    def _expand_object_streams(self) -> None:
        for num, obj in list(self.objects.items()):
            if not (isinstance(obj, dict) and obj.get("/Type") == "/ObjStm"):
                continue
            payload = _decode_stream(self.streams.get(num, b""), obj)
            if payload is None:
                continue
            n = int(self.resolve(obj.get("/N", 0)) or 0)
            first = int(self.resolve(obj.get("/First", 0)) or 0)
            header = payload[:first].split()
            for k in range(n):
                try:
                    onum = int(header[2 * k])
                    off = int(header[2 * k + 1])
                except (IndexError, ValueError):
                    break
                lex = _Lexer(payload, first + off)
                try:
                    self.objects.setdefault(onum, lex.parse())
                except Exception:
                    continue

    def resolve(self, obj):
        seen = 0
        while isinstance(obj, _Ref) and seen < 32:
            obj = self.objects.get(obj.num)
            seen += 1
        return obj

    def pages(self) -> list[dict]:
        """Page dicts in page-tree order (fallback: object order)."""
        roots = [
            o for o in self.objects.values()
            if isinstance(o, dict) and o.get("/Type") == "/Pages"
            and "/Parent" not in o
        ]
        ordered: list[dict] = []

        def walk(node: dict, depth: int = 0) -> None:
            if depth > 64:
                return
            for kid in node.get("/Kids", []) or []:
                kid = self.resolve(kid)
                if not isinstance(kid, dict):
                    continue
                if kid.get("/Type") == "/Pages":
                    walk(kid, depth + 1)
                elif kid.get("/Type") == "/Page":
                    ordered.append(kid)

        for root in roots:
            walk(root)
        if not ordered:
            ordered = [
                o for num, o in sorted(self.objects.items())
                if isinstance(o, dict) and o.get("/Type") == "/Page"
            ]
        return ordered

    def _stream_bytes(self, ref) -> bytes | None:
        num = ref.num if isinstance(ref, _Ref) else None
        obj = self.resolve(ref)
        if num is None:
            for onum, o in self.objects.items():
                if o is obj:
                    num = onum
                    break
        if num is None or not isinstance(obj, dict):
            return None
        return _decode_stream(self.streams.get(num, b""), obj)

    def _form_xobject_streams(
        self, resources, depth: int = 0
    ) -> list[bytes]:
        """Decoded content of Form XObjects in a resource dict — text
        drawn via ``/Fx Do`` lives in these, not in /Contents."""
        if depth > 4 or not isinstance(resources, dict):
            return []
        xobjs = self.resolve(resources.get("/XObject"))
        out: list[bytes] = []
        if not isinstance(xobjs, dict):
            return out
        for ref in xobjs.values():
            obj = self.resolve(ref)
            if not (isinstance(obj, dict) and obj.get("/Subtype") == "/Form"):
                continue
            data = self._stream_bytes(ref)
            if data:
                out.append(data)
            out.extend(
                self._form_xobject_streams(
                    self.resolve(obj.get("/Resources")), depth + 1
                )
            )
        return out

    def page_attr(self, page: dict, key: str):
        """Resolve a page attribute with PDF inheritance: /Resources,
        /MediaBox, /Rotate may live on an ancestor /Pages node."""
        node = page
        for _ in range(32):
            if not isinstance(node, dict):
                return None
            v = node.get(key)
            if v is not None:
                return self.resolve(v)
            node = self.resolve(node.get("/Parent"))
        return None

    def page_content(self, page: dict) -> bytes:
        contents = self.resolve(page.get("/Contents"))
        parts: list[bytes] = []
        refs = contents if isinstance(contents, list) else [page.get("/Contents")]
        for ref in refs:
            data = self._stream_bytes(ref)
            if data:
                parts.append(data)
        parts.extend(
            self._form_xobject_streams(self.resolve(page.get("/Resources")))
        )
        return b"\n".join(parts)

    def page_fonts(self, page: dict) -> dict[str, dict[int, str]]:
        """font resource name → code-point → unicode map (ToUnicode),
        including fonts declared by nested Form XObject resources."""
        res = self.page_attr(page, "/Resources") or {}
        fonts: dict = {}

        def gather(resources, depth: int = 0) -> None:
            if depth > 4 or not isinstance(resources, dict):
                return
            fdict = self.resolve(resources.get("/Font"))
            if isinstance(fdict, dict):
                for k, v in fdict.items():
                    fonts.setdefault(k, v)
            xobjs = self.resolve(resources.get("/XObject"))
            if isinstance(xobjs, dict):
                for ref in xobjs.values():
                    obj = self.resolve(ref)
                    if isinstance(obj, dict) and obj.get("/Subtype") == "/Form":
                        gather(self.resolve(obj.get("/Resources")), depth + 1)

        gather(res)
        out: dict[str, dict[int, str]] = {}
        if not isinstance(fonts, dict) or not fonts:
            return out
        for name, ref in fonts.items():
            fdict = self.resolve(ref)
            if not isinstance(fdict, dict):
                continue
            fmap: dict[int, str] = {}
            # base encoding name (the decoder's fallback is latin-1;
            # MacRoman and WinAnsi differ in the upper half — MacRoman
            # 0xDE is 'ﬁ', not 'Þ') and /Differences glyph overrides
            encd = self.resolve(fdict.get("/Encoding"))
            base_name = encd if isinstance(encd, str) else None
            if isinstance(encd, dict):
                base_name = encd.get("/BaseEncoding")
            codec = {
                "/MacRomanEncoding": "mac_roman",
                "/WinAnsiEncoding": "cp1252",
            }.get(base_name or "")
            if codec:
                for c in range(32, 256):
                    try:
                        fmap[c] = bytes([c]).decode(codec)
                    except UnicodeDecodeError:
                        pass
            if isinstance(encd, dict):
                diffs = self.resolve(encd.get("/Differences"))
                if isinstance(diffs, list):
                    code = 0
                    for item in diffs:
                        if isinstance(item, (int, float)):
                            code = int(item)
                        elif isinstance(item, str) and item.startswith("/"):
                            ch = _glyph_to_char(item[1:])
                            if ch:
                                fmap[code] = ch
                            code += 1
            if fmap:
                # a Differences map only overrides specific codes; the
                # rest follow the base (≈ latin-1) encoding — fill the
                # identity so the decoder's complete-coverage check
                # takes the mapped path for mixed strings
                for c in range(32, 256):
                    fmap.setdefault(c, chr(c))
            tu = fdict.get("/ToUnicode")
            if isinstance(tu, _Ref):
                sdict = self.resolve(tu)
                raw = self.streams.get(tu.num)
                if isinstance(sdict, dict) and raw is not None:
                    cmap_data = _decode_stream(raw, sdict)
                    if cmap_data:
                        fmap.update(_parse_tounicode(cmap_data))
            if fmap:
                out[name] = fmap
        return out


# common Adobe-Glyph-List names → characters (the subset simple-font
# /Differences arrays actually use: ligatures, quotes, dashes, symbols,
# accented Latin). Names like uni04AB decode positionally.
_GLYPHS = {
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
    "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
    "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
    "greater": ">", "question": "?", "at": "@", "bracketleft": "[",
    "backslash": "\\", "bracketright": "]", "asciicircum": "^",
    "underscore": "_", "grave": "`", "braceleft": "{", "bar": "|",
    "braceright": "}", "asciitilde": "~",
    "fi": "ﬁ", "fl": "ﬂ", "ff": "ﬀ",
    "ffi": "ﬃ", "ffl": "ﬄ",
    "quoteleft": "‘", "quoteright": "’",
    "quotedblleft": "“", "quotedblright": "”",
    "quotesinglbase": "‚", "quotedblbase": "„",
    "endash": "–", "emdash": "—", "bullet": "•",
    "dagger": "†", "daggerdbl": "‡", "ellipsis": "…",
    "perthousand": "‰", "guilsinglleft": "‹",
    "guilsinglright": "›", "guillemotleft": "«",
    "guillemotright": "»", "trademark": "™",
    "copyright": "©", "registered": "®", "degree": "°",
    "plusminus": "±", "multiply": "×", "divide": "÷",
    "sterling": "£", "yen": "¥", "cent": "¢",
    "Euro": "€", "florin": "ƒ", "section": "§",
    "paragraph": "¶", "periodcentered": "·",
    "dotlessi": "ı", "OE": "Œ", "oe": "œ",
    "AE": "Æ", "ae": "æ", "Oslash": "Ø", "oslash": "ø",
    "germandbls": "ß", "Lslash": "Ł", "lslash": "ł",
    "Scaron": "Š", "scaron": "š", "Zcaron": "Ž",
    "zcaron": "ž", "Ydieresis": "Ÿ",
    "circumflex": "ˆ", "tilde": "˜", "macron": "¯",
    "breve": "˘", "dotaccent": "˙", "ring": "˚",
    "cedilla": "¸", "hungarumlaut": "˝", "ogonek": "˛",
    "caron": "ˇ", "minus": "−", "fraction": "⁄",
    "nbspace": " ", "exclamdown": "¡", "questiondown": "¿",
}
# single letters and digits map to themselves; accented forms like
# 'eacute' decompose as letter + accent name
_ACCENTS = {
    "acute": "́", "grave": "̀", "circumflex": "̂",
    "tilde": "̃", "dieresis": "̈", "ring": "̊",
    "cedilla": "̧", "caron": "̌", "breve": "̆",
    "macron": "̄", "hungarumlaut": "̋", "ogonek": "̨",
    "dotaccent": "̇", "slash": "̷",
}
_DIGIT_NAMES = {
    "zero": "0", "one": "1", "two": "2", "three": "3", "four": "4",
    "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9",
}


def _glyph_to_char(name: str) -> str | None:
    """Resolve a glyph name to text: AGL-common table, letters/digits,
    uniXXXX / uXXXX forms, letter+accent compositions."""
    import unicodedata

    if not name:
        return None
    if name in _GLYPHS:
        return _GLYPHS[name]
    if name in _DIGIT_NAMES:
        return _DIGIT_NAMES[name]
    if len(name) == 1 and name.isalpha():
        return name
    if name.startswith("uni") and len(name) >= 7:
        try:
            return "".join(
                chr(int(name[i : i + 4], 16)) for i in range(3, len(name) - 3, 4)
            )
        except ValueError:
            return None
    if name.startswith("u") and 5 <= len(name) <= 7:
        try:
            return chr(int(name[1:], 16))
        except ValueError:
            return None
    # letter + accent ('eacute', 'Ntilde', 'udieresis')
    for acc, mark in _ACCENTS.items():
        if name.endswith(acc):
            base = name[: -len(acc)]
            if len(base) == 1 and base.isalpha():
                return unicodedata.normalize("NFC", base + mark)
    return None


_BFCHAR_RE = re.compile(rb"beginbfchar(.*?)endbfchar", re.S)
_BFRANGE_RE = re.compile(rb"beginbfrange(.*?)endbfrange", re.S)
_HEXPAIR_RE = re.compile(rb"<([0-9a-fA-F]+)>")


def _parse_tounicode(data: bytes) -> dict[int, str]:
    cmap: dict[int, str] = {}

    def _uni(hexstr: bytes) -> str:
        b = bytes.fromhex(hexstr.decode())
        return b.decode("utf-16-be", errors="replace")

    for m in _BFCHAR_RE.finditer(data):
        pairs = _HEXPAIR_RE.findall(m.group(1))
        for src, dst in zip(pairs[0::2], pairs[1::2]):
            cmap[int(src, 16)] = _uni(dst)
    for m in _BFRANGE_RE.finditer(data):
        # entries: <lo> <hi> <dstBase>  OR  <lo> <hi> [<d1> <d2> ...]
        toks = re.findall(rb"<[0-9a-fA-F]+>|\[|\]", m.group(1))
        i = 0
        while i + 2 < len(toks) or (i + 2 == len(toks) and toks[i + 1] != b"["):
            if toks[i] in (b"[", b"]"):
                i += 1
                continue
            lo, hi = toks[i][1:-1], toks[i + 1][1:-1]
            try:
                start, end = int(lo, 16), int(hi, 16)
            except ValueError:
                i += 1
                continue
            if i + 2 < len(toks) and toks[i + 2] == b"[":
                j = i + 3
                off = 0
                while j < len(toks) and toks[j] != b"]":
                    if start + off <= end:
                        cmap[start + off] = _uni(toks[j][1:-1])
                    off += 1
                    j += 1
                i = j + 1
            else:
                dst = toks[i + 2][1:-1]
                base = int(dst, 16)
                for off in range(min(end - start + 1, 65536)):
                    cmap[start + off] = _uni(
                        format(base + off, "0" + str(len(dst)) + "x").encode()
                    )
                i += 3
    return cmap


# ---------------------------------------------------------------------------
# Content-stream text extraction
# ---------------------------------------------------------------------------

_CS_TOKEN_RE = re.compile(
    rb"\((?:\\.|[^\\()])*\)"  # literal string (no nested parens)
    rb"|<[0-9a-fA-F\s]*>"  # hex string
    rb"|\[|\]"
    rb"|/[^\s/<>\[\]()]+"
    rb"|[+-]?(?:\d+\.?\d*|\.\d+)"
    rb"|[A-Za-z'\"*]+"
)


def _decode_pdf_string(tok: bytes, cmap: dict[int, str] | None) -> str:
    if tok.startswith(b"("):
        lex = _Lexer(tok)
        raw = lex._literal_string()
        if cmap:
            # try 1-byte then 2-byte codes against the cmap
            if all(b in cmap for b in raw[:4]):
                return "".join(cmap.get(b, "") for b in raw)
            pairs = [
                int.from_bytes(raw[i : i + 2], "big")
                for i in range(0, len(raw) - 1, 2)
            ]
            if pairs and all(p in cmap for p in pairs[:2]):
                return "".join(cmap.get(p, "") for p in pairs)
        return raw.decode("latin-1", errors="replace")
    hexstr = re.sub(rb"\s", b"", tok[1:-1])
    if len(hexstr) % 2:
        hexstr += b"0"
    raw = bytes.fromhex(hexstr.decode())
    if cmap:
        codes = (
            [int.from_bytes(raw[i : i + 2], "big") for i in range(0, len(raw) - 1, 2)]
            if len(raw) % 2 == 0 and any(
                int.from_bytes(raw[i : i + 2], "big") in cmap
                for i in range(0, min(len(raw), 8) - 1, 2)
            )
            else list(raw)
        )
        return "".join(cmap.get(c, "") for c in codes)
    return raw.decode("latin-1", errors="replace")


_IDENTITY = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)


def _mat_mul(m1, m2):
    """Concatenate matrices: apply m1, then m2 (PDF row-vector form)."""
    a1, b1, c1, d1, e1, f1 = m1
    a2, b2, c2, d2, e2, f2 = m2
    return (
        a1 * a2 + b1 * c2,
        a1 * b2 + b1 * d2,
        c1 * a2 + d1 * c2,
        c1 * b2 + d1 * d2,
        e1 * a2 + f1 * c2 + e2,
        e1 * b2 + f1 * d2 + f2,
    )


def _extract_runs(
    content: bytes, fonts: dict[str, dict[int, str]]
) -> list[tuple[float, float, float, str]]:
    """(y, x, size, text) runs from one page's content stream, with the
    full CTM (q/Q/cm) and text-matrix (Tm/Td/T*) transform chain — text
    positioned via `cm` translation + scaled Tm (the common
    word-processor export shape) lands at true page coordinates."""
    # inline images (BI ... ID <binary> EI) would tokenize as garbage
    # operators/strings — drop them before scanning
    content = re.sub(rb"\bBI\b.*?\bEI\b", b" ", content, flags=re.S)
    runs: list[tuple[float, float, float, str]] = []
    stack: list[float | bytes | str | None] = []
    ctm = _IDENTITY
    ctm_stack: list[tuple] = []
    tm = tlm = _IDENTITY
    leading = 0.0
    size = 12.0
    cmap: dict[int, str] | None = None
    in_array: list | None = None

    def device_pos() -> tuple[float, float, float]:
        full = _mat_mul(tm, ctm)
        eff = abs(size * full[3]) or size  # d-scale; upright text
        return full[5], full[4], eff  # (y, x, size)

    def emit(tok: bytes) -> None:
        text = _decode_pdf_string(tok, cmap)
        if text:
            y, x, eff = device_pos()
            runs.append((y, x, eff, text))

    def newline() -> None:
        nonlocal tm, tlm
        dy = -(leading if leading else size * 1.2)
        tlm = _mat_mul((1, 0, 0, 1, 0, dy), tlm)
        tm = tlm

    for m in _CS_TOKEN_RE.finditer(content):
        tok = m.group()
        c0 = tok[:1]
        if c0 in b"(<" and tok != b"<":
            if in_array is not None:
                in_array.append(tok)
            else:
                stack.append(tok)
        elif c0 == b"[":
            in_array = []
        elif c0 == b"]":
            stack.append(in_array)
            in_array = None
        elif c0 == b"/":
            stack.append(tok.decode("latin-1"))
        elif c0 in b"+-.0123456789":
            val = float(tok)
            if in_array is not None:
                in_array.append(val)
            else:
                stack.append(val)
        else:
            op = tok
            try:
                # malformed operands (a name or None under a numeric
                # operator) skip the operator, never the document
                if op == b"Tf" and len(stack) >= 2:
                    size = float(stack[-1])
                    fname = stack[-2]
                    cmap = fonts.get(fname) if isinstance(fname, str) else None
                elif op in (b"Td", b"TD") and len(stack) >= 2:
                    tx, ty = float(stack[-2]), float(stack[-1])
                    tlm = _mat_mul((1, 0, 0, 1, tx, ty), tlm)
                    tm = tlm
                    if op == b"TD":
                        leading = -ty
                elif op == b"Tm" and len(stack) >= 6:
                    tm = tlm = tuple(float(v) for v in stack[-6:])
                elif op == b"TL" and stack:
                    leading = float(stack[-1])
                elif op == b"T*":
                    newline()
                elif op == b"Tj" and stack and isinstance(stack[-1], bytes):
                    emit(stack[-1])
                elif op in (b"'", b'"'):
                    newline()
                    if stack and isinstance(stack[-1], bytes):
                        emit(stack[-1])
                elif op == b"TJ" and stack and isinstance(stack[-1], list):
                    parts: list[str] = []
                    for item in stack[-1]:
                        if isinstance(item, bytes):
                            parts.append(_decode_pdf_string(item, cmap))
                        elif isinstance(item, (int, float)) and item < -150:
                            parts.append(" ")  # big negative kern = space
                    text = "".join(parts)
                    if text:
                        y, x, eff = device_pos()
                        runs.append((y, x, eff, text))
                elif op == b"BT":
                    tm = tlm = _IDENTITY
                elif op == b"cm" and len(stack) >= 6:
                    try:
                        mat = tuple(float(v) for v in stack[-6:])
                        ctm = _mat_mul(mat, ctm)
                    except (TypeError, ValueError):
                        pass
                elif op == b"q":
                    ctm_stack.append(ctm)
                elif op == b"Q":
                    if ctm_stack:
                        ctm = ctm_stack.pop()
            except (TypeError, ValueError, IndexError):
                pass
            finally:
                stack.clear()
    return runs


def _page_annotations(doc: "_PdfDoc", page: dict, page_h: float) -> tuple[list[dict], list[dict]]:
    """(link annots, widget annots) with top-down boxes (x0, top, x1, bot).

    Links: /Link annots with a /URI action or a named /Dest — academic
    PDFs use named destinations for internal cite links (reference
    pdfminer_utils.get_uris_from_annots). Widgets: filled AcroForm
    values (/V) that the content-stream pass misses (reference
    pdf.py:563-583)."""
    links: list[dict] = []
    widgets: list[dict] = []
    for ref in doc.resolve(page.get("/Annots")) or []:
        a = doc.resolve(ref)
        if not isinstance(a, dict):
            continue
        rect = doc.resolve(a.get("/Rect"))
        try:
            vals = [float(doc.resolve(v)) for v in rect]
            x0, x1 = sorted((vals[0], vals[2]))
            y0, y1 = sorted((vals[1], vals[3]))
        except (TypeError, ValueError, IndexError):
            continue
        box = (x0, page_h - y1, x1, page_h - y0)
        sub = doc.resolve(a.get("/Subtype"))
        if sub == "/Link":
            uri = None
            act = doc.resolve(a.get("/A"))
            if isinstance(act, dict):
                u = doc.resolve(act.get("/URI"))
                if isinstance(u, bytes):
                    uri = u.decode("latin-1")
                elif isinstance(u, str):
                    uri = u.lstrip("/")
                if uri is None:
                    d_ = doc.resolve(act.get("/D"))
                    if isinstance(d_, bytes):
                        uri = d_.decode("latin-1")
                    elif isinstance(d_, str):
                        uri = d_.lstrip("/")
            if uri is None:
                dest = doc.resolve(a.get("/Dest"))
                if isinstance(dest, bytes):
                    uri = dest.decode("latin-1")
                elif isinstance(dest, str):
                    uri = dest.lstrip("/")
            if uri:
                links.append({"url": uri, "box": box, "words": []})
        elif sub == "/Widget":
            v = doc.resolve(a.get("/V"))
            if isinstance(v, bytes):
                v = v.decode("latin-1", "replace")
            text = (
                v.strip()
                if isinstance(v, str) and v.strip() and not v.startswith("/")
                else ""
            )
            # field name: /T on the widget (merged field) else the
            # parent field node — feeds extract_forms kv pairs
            name = doc.resolve(a.get("/T"))
            if name is None:
                parent = doc.resolve(a.get("/Parent"))
                if isinstance(parent, dict):
                    name = doc.resolve(parent.get("/T"))
            if isinstance(name, bytes):
                name = name.decode("latin-1", "replace")
            if not isinstance(name, str) or not name.strip():
                name = None
            else:
                name = name.strip()
            if text or name:
                widgets.append({"text": text, "box": box, "name": name})
    return links, widgets


def _match_link_words(
    runs: list[tuple[float, float, float, str]],
    links: list[dict],
    page_h: float,
) -> None:
    """Assign the words rendered under each link rect (estimated char
    widths — the same 0.5 em heuristic the block builder uses)."""
    if not links:
        return
    for y, x, size, text in runs:
        td = page_h - y  # baseline, top-down
        cw = 0.5 * size
        for link in links:
            lx0, ltop, lx1, lbot = link["box"]
            if not (ltop - 2.0 <= td <= lbot + 2.0):
                continue
            pos = 0
            for word in text.split():
                start = text.index(word, pos)
                pos = start + len(word)
                wx0 = x + start * cw
                wx1 = x + pos * cw
                center = (wx0 + wx1) / 2
                if lx0 <= center <= lx1:
                    link["words"].append((td, wx0, word))
    for link in links:
        link["words"].sort()
        link["text"] = " ".join(w for _, _, w in link["words"]) or None


def _runs_to_blocks(
    runs: list[tuple[float, float, float, str]], page_height: float
) -> list[dict]:
    """runs → line-boxes → x-overlap-clustered blocks → XY-cut reading
    order. Two-column layouts come out column-by-column instead of
    y-interleaved (reference hi_res uses the same recursive XY-cut,
    utils/xycut.py:17-213).

    Returns block dicts with ``text`` and a top-down bbox
    (x0, top, x1, bot)."""
    from unstructured_spark.parsers.layout import xy_cut_order

    if not runs:
        return []
    # 0. fake-bold dedup: the same text rendered twice at a sub-point
    # offset is a faux-bold effect, not content (reference
    # pdfminer_utils.get_text_with_deduplication,
    # PDF_CHAR_DUPLICATE_THRESHOLD)
    seen: dict[tuple[float, str], list[float]] = {}
    deduped: list[tuple[float, float, float, str]] = []
    for y, x, size, text in runs:
        key = (round(y, 0), text)
        xs = seen.setdefault(key, [])
        if any(abs(x - px) <= max(1.0, 0.15 * size) for px in xs):
            continue
        xs.append(x)
        deduped.append((y, x, size, text))
    runs = deduped
    # 1. group runs into visual lines by baseline y (±2pt)
    by_y: list[tuple[float, list[tuple[float, float, str]]]] = []
    for y, x, size, text in runs:
        for ly, segs in by_y:
            if abs(ly - y) <= 2.0:
                segs.append((x, size, text))
                break
        else:
            by_y.append((y, [(x, size, text)]))
    # 2. split each visual line at large x gaps (separate columns/cells)
    lines: list[list] = []  # [x0, x1, top, bot, size, text]
    for y, segs in by_y:
        segs.sort()
        td = page_height - y  # top-down baseline
        cur: list | None = None
        for x, size, text in segs:
            w = max(len(text), 1) * size * 0.5
            if cur is not None and x - cur[1] <= 2.0 * cur[4]:
                if x - cur[1] > 1.0 and not cur[5].endswith(" ") and not text.startswith(" "):
                    cur[5] += " "
                cur[5] += text
                cur[1] = max(cur[1], x + w)
                cur[4] = max(cur[4], size)
            else:
                if cur is not None:
                    lines.append(cur)
                cur = [x, x + w, td - size, td, size, text]
        if cur is not None:
            lines.append(cur)
    # 3. cluster lines into blocks: vertical adjacency AND x overlap
    blocks: list[dict] = []
    for x0, x1, top, bot, size, text in sorted(
        lines, key=lambda l: (l[2], l[0])
    ):
        text = text.strip()
        if not text:
            continue
        best: tuple[float, dict] | None = None
        for b in blocks:
            vgap = top - b["bot"]
            if -2.0 <= vgap <= 1.2 * max(size, b["size"]):
                ovl = min(x1, b["x1"]) - max(x0, b["x0"])
                if ovl > 0.3 * min(x1 - x0, b["x1"] - b["x0"]):
                    if best is None or vgap < best[0]:
                        best = (vgap, b)
        if best is not None:
            b = best[1]
            b["texts"].append(text)
            b["x0"] = min(b["x0"], x0)
            b["x1"] = max(b["x1"], x1)
            b["bot"] = max(b["bot"], bot)
            b["size"] = max(b["size"], size)
        else:
            blocks.append(
                {"x0": x0, "x1": x1, "top": top, "bot": bot,
                 "size": size, "texts": [text]}
            )
    order = xy_cut_order(
        [(b["x0"], b["top"], b["x1"], b["bot"]) for b in blocks]
    )
    out = []
    for i in order:
        b = blocks[i]
        b["text"] = " ".join(b["texts"])
        out.append(b)
    return out


def pdf_text_extractable(content: bytes, doc: "_PdfDoc | None" = None) -> bool:
    """Cheap probe: do the first few pages' content streams yield text
    runs? (reference extractable_elements, pdf.py:304-337)."""
    try:
        doc = doc or _PdfDoc(content)
        for page in doc.pages()[:3]:  # probe a few pages, not the book
            stream = doc.page_content(page)
            if stream and _extract_runs(stream, {}):
                return True
    except Exception:
        pass
    return False


# PDF operator classes for the complexity gate (PDF 32000-1 operator
# tables; same partition as reference pdf.py:96-106)
_GRAPHICS_OPS_RE = re.compile(
    rb"(?:^|(?<=\s))"
    rb"(?:m|l|c|v|y|h|re|S|s|f|F|f\*|B|B\*|b|b\*|n|W|W\*|cm|q|Q|Do|"
    rb"g|G|rg|RG|k|K|cs|CS|w|J|j|M|d|i|gs)"
    rb"(?=\s|$)",
    re.M,
)
_TEXT_OPS_RE = re.compile(
    rb"(?:^|(?<=\s))(?:Tj|TJ|'|\"|Tf|Td|TD|Tm|T\*|BT|ET)(?=\s|$)", re.M
)


def is_pdf_too_complex(
    content: bytes,
    *,
    max_graphics_ops: int = 10_000,
    min_graphics_to_text_ratio: float = 20.0,
    min_file_size_bytes: int = 1024 * 1024,
    min_raw_stream_bytes: int = 100_000,
    doc: "_PdfDoc | None" = None,
) -> bool:
    """Complexity gate (reference pdf.py:618-756): CAD/engineering-style
    vector pages make text extraction slow and garbage-prone. A page is
    too complex when its decoded content stream carries more than
    ``max_graphics_ops`` graphics operators AND the graphics-to-text
    operator ratio exceeds ``min_graphics_to_text_ratio``. Small files
    and small streams early-exit without counting."""
    if len(content) < min_file_size_bytes:
        return False
    try:
        doc = doc or _PdfDoc(content)
        for page in doc.pages():
            raw = doc.page_content(page)
            if not raw or len(raw) < min_raw_stream_bytes:
                continue
            n_gfx = len(_GRAPHICS_OPS_RE.findall(raw))
            if n_gfx <= max_graphics_ops:
                continue
            n_text = len(_TEXT_OPS_RE.findall(raw))
            if n_gfx / max(n_text, 1) > min_graphics_to_text_ratio:
                return True
    except Exception:
        return False
    return False


def determine_pdf_strategy(
    content: bytes, requested: str = "auto", _doc: "_PdfDoc | None" = None, **kwargs
) -> str:
    """The reference's only cost-based plan decision (strategies.py:24-109,
    pdf.py:300-337): the text-extractability probe feeds the full
    strategy decision table (parsers/strategies.py) — ``auto`` →
    ``fast`` when the content streams yield text; otherwise
    ``ocr_only``/``hi_res`` subject to dependency fallbacks."""
    from unstructured_spark.parsers.strategies import (
        determine_pdf_or_image_strategy,
        validate_strategy,
    )

    validate_strategy(requested)
    # THIS engine's inference/OCR capability is a registered agent hook
    # (parsers/image_parser.py plug points) — a merely-installed
    # onnxruntime/pytesseract package is not wired to anything here, so
    # it must not steer the decision toward a strategy we cannot run
    from unstructured_spark.parsers import image_parser as _ip

    kwargs.setdefault("inference_installed", _ip._LAYOUT_MODEL is not None)
    kwargs.setdefault("ocr_installed", _ip._OCR_AGENT is not None)
    # complexity gate (reference pdf.py:304-310): a CAD-like vector PDF
    # skips text extraction and routes as if no text were extractable
    extractable = not is_pdf_too_complex(content, doc=_doc) and pdf_text_extractable(
        content, doc=_doc
    )
    return determine_pdf_or_image_strategy(
        requested,
        pdf_text_extractable=extractable,
        **kwargs,
    )


class PageCountExceededError(ValueError):
    """Page count above ``pdf_hi_res_max_pages`` (reference
    errors.py:1-11 / pdf.py:604-612) — hi_res inference cost is
    per-page, so oversized docs fail fast instead of monopolizing an
    executor."""

    def __init__(self, document_pages: int, pdf_hi_res_max_pages: int):
        self.document_pages = document_pages
        self.pdf_hi_res_max_pages = pdf_hi_res_max_pages
        super().__init__(
            f"Maximum number of PDF file pages exceeded - "
            f"pages={document_pages}, maximum={pdf_hi_res_max_pages}."
        )


def _hires_born_digital(doc: "_PdfDoc", raw: bytes | None = None) -> list[dict]:
    """hi_res on born-digital pages with a registered layout model:
    per page, rasterize — REAL pixels when a rasterizer plug is
    registered (pdf_raster.set_pdf_rasterizer, e.g. the pypdfium2
    adapter), else the geometry surrogate — run the layout model,
    scale detections back to point space, and merge with the extracted
    text blocks via the reference's 5-rule page merge. Text always
    comes from the content stream; the model contributes region types
    and grouping."""
    from unstructured_spark.parsers import image_parser as _ip
    from unstructured_spark.parsers import pdf_raster
    from unstructured_spark.schema import TYPE_NORMALIZATION

    out: list[dict] = []
    for page_no, page in enumerate(doc.pages(), start=1):
        stream = doc.page_content(page)
        if not stream:
            continue
        runs = _extract_runs(stream, doc.page_fonts(page))
        if not runs:
            continue
        media = doc.page_attr(page, "/MediaBox") or [0, 0, 612, 792]
        try:
            page_w = float(doc.resolve(media[2])) - float(doc.resolve(media[0]))
            page_h = float(doc.resolve(media[3])) - float(doc.resolve(media[1]))
        except (TypeError, ValueError, IndexError):
            page_w, page_h = 612.0, 792.0
        blocks = _runs_to_blocks(runs, page_h)
        rasterizer = pdf_raster.get_pdf_rasterizer()
        if rasterizer is not None and raw is not None:
            # dpi=None honors the DPI configured on the plug itself
            arr, w, h = rasterizer(raw, page_no - 1, None)
            scale = w / page_w
        else:
            arr, w, h, scale = pdf_raster.rasterize_page(runs, page_w, page_h)
        detections = list(_ip._LAYOUT_MODEL(arr, w, h))
        merged = pdf_raster.merge_detections_with_blocks(
            detections, blocks, page_w, page_h, scale
        )
        for m in merged:
            text = " ".join((m.get("text") or "").split())
            kind = m.get("kind") or "Text"
            if not text and kind not in ("Image", "Picture", "Figure", "Table"):
                continue
            if kind == "Text" and text:
                etype = classify.element_type_from_text(text)
            else:
                etype = TYPE_NORMALIZATION.get(kind, kind)
            out.append(
                {
                    "type": etype,
                    "text": text,
                    "page_number": page_no,
                    "coordinates": {
                        "points": [
                            {"x": m["x1"], "y": m["y1"]},
                            {"x": m["x1"], "y": m["y2"]},
                            {"x": m["x2"], "y": m["y2"]},
                            {"x": m["x2"], "y": m["y1"]},
                        ],
                        "system": "PixelSpace",
                        "layout_width": page_w,
                        "layout_height": page_h,
                    },
                }
            )
    return out


def _page_form_elements(
    widgets: list[dict],
    page_w: float,
    page_h: float,
    page_no: int,
    include_kv: bool,
) -> list[dict]:
    """THE AcroForm element constructor — single source for every
    strategy (fast path and the hi_res/scanned/ocr early returns):
    with ``include_kv`` (extract_forms), one FormKeysValues element
    per page with named widgets (reference pdf.py:563-583), then
    unconditionally one text element per filled widget value."""
    import json as _json

    out: list[dict] = []
    named = sorted(
        (w for w in widgets if w["name"]),
        key=lambda w: (w["box"][1], w["box"][0]),
    )
    if include_kv and named:
        pairs = [
            {
                "key_text": w["name"],
                "value_text": w["text"] or None,
                "x1": w["box"][0],
                "y1": w["box"][1],
                "x2": w["box"][2],
                "y2": w["box"][3],
                "confidence": 1.0,  # declared binding, not geometric
            }
            for w in named
        ]
        out.append(
            {
                "type": "FormKeysValues",
                "text": "\n".join(
                    f"{p['key_text']}: {p['value_text'] or ''}" for p in pairs
                ),
                "page_number": page_no,
                "metadata_json": _json.dumps(
                    {
                        "key_value_pairs": pairs,
                        "detection_origin": "acroform",
                    },
                    ensure_ascii=False,
                ),
            }
        )
    for wdg in widgets:
        if not wdg["text"]:
            continue  # unfilled field: no value element
        wx0, wtop, wx1, wbot = wdg["box"]
        out.append(
            {
                "type": classify.element_type_from_text(wdg["text"]),
                "text": wdg["text"],
                "page_number": page_no,
                "coordinates": {
                    "points": [
                        {"x": wx0, "y": wtop},
                        {"x": wx0, "y": wbot},
                        {"x": wx1, "y": wbot},
                        {"x": wx1, "y": wtop},
                    ],
                    "system": "PixelSpace",
                    "layout_width": page_w,
                    "layout_height": page_h,
                },
            }
        )
    return out


def _acroform_elements(doc: "_PdfDoc") -> list[dict]:
    """Filled-AcroForm elements for a parsed doc (per-page
    ``_page_form_elements``), used by the hi_res/scanned/ocr early
    returns so ``extract_forms=True`` is honored on every strategy."""
    out: list[dict] = []
    for page_no, page in enumerate(doc.pages(), start=1):
        media = doc.page_attr(page, "/MediaBox") or [0, 0, 612, 792]
        try:
            page_w = float(doc.resolve(media[2])) - float(doc.resolve(media[0]))
            page_h = float(doc.resolve(media[3])) - float(doc.resolve(media[1]))
        except (TypeError, ValueError, IndexError):
            page_w, page_h = 612.0, 792.0
        _links, widgets = _page_annotations(doc, page, page_h)
        out.extend(_page_form_elements(widgets, page_w, page_h, page_no, True))
    return out


def _ocr_rasterized(content: bytes, doc: "_PdfDoc") -> list[dict]:
    """ocr_only over a registered real rasterizer: render each page to
    glyph pixels, run the full agent pipeline (layout model if present,
    OCR aggregation, table supplement, XY-cut) on them — the
    reference's poppler route (pdf.py:1013-1045) with the rasterizer
    as a plug. Elements keep pixel-space coordinates like the scanned
    route."""
    from unstructured_spark.parsers import image_parser as _ip
    from unstructured_spark.parsers import pdf_raster

    rasterizer = pdf_raster.get_pdf_rasterizer()
    out: list[dict] = []
    for page_no in range(1, len(doc.pages()) + 1):
        try:
            # dpi=None honors the DPI configured on the plug itself
            arr, w, h = rasterizer(content, page_no - 1, None)
        except (ValueError, IndexError, OSError, RuntimeError):
            # one unrenderable page is not fatal; RuntimeError covers
            # pypdfium2's PdfiumError (its subclass) on corrupt pages
            continue
        for el in _ip.elements_from_pixels(arr, w, h):
            el["page_number"] = page_no
            out.append(el)
    return out


def pdf_to_elements(
    content: bytes,
    strategy: str = "auto",
    extract_images: bool = False,
    extract_forms: bool = False,
    pdf_hi_res_max_pages: int | None = None,
) -> list[dict]:
    doc = _PdfDoc(content)  # parsed once; probe + extraction + images share it
    strategy = determine_pdf_strategy(content, strategy, _doc=doc)
    if (
        pdf_hi_res_max_pages
        and strategy in ("hi_res", "ocr_only")
        and len(doc.pages()) > pdf_hi_res_max_pages
    ):
        raise PageCountExceededError(len(doc.pages()), pdf_hi_res_max_pages)
    if strategy in ("hi_res", "ocr_only"):
        from unstructured_spark.parsers import image_parser as _ip

        def _with_forms(els: list[dict]) -> list[dict]:
            if not extract_forms:
                return els
            return sorted(
                els + _acroform_elements(doc),
                key=lambda e: (e.get("page_number") or 0),
            )

        if _ip._LAYOUT_MODEL is not None or _ip._OCR_AGENT is not None:
            from unstructured_spark.parsers.pdf_images import scanned_pdf_to_elements

            els = scanned_pdf_to_elements(content, doc=doc)
            if els:
                return _with_forms(els)
        if strategy == "hi_res" and _ip._LAYOUT_MODEL is not None:
            # born-digital hi_res: real raster when a rasterizer plug
            # is registered, else the geometry surrogate → layout model
            # → 5-rule merge with extracted text blocks (pdf_raster.py)
            els = _hires_born_digital(doc, raw=content)
            if els:
                return _with_forms(els)
        from unstructured_spark.parsers import pdf_raster as _pr

        if _pr.get_pdf_rasterizer() is not None and _ip._OCR_AGENT is not None:
            # born-digital ocr_only (and hi_res without a layout model):
            # real glyph pixels from the registered rasterizer feed the
            # full agent pipeline — the reference's poppler route
            els = _ocr_rasterized(content, doc)
            if els:
                return _with_forms(els)
        raise NotImplementedError(
            f"partition_pdf strategy {strategy!r} needs a layout/OCR model; "
            "register agents via parsers.image_parser.set_layout_model / "
            "set_ocr_agent (scanned pages partition via embedded-image "
            "extraction, born-digital hi_res via the surrogate raster + "
            "merge path in parsers/pdf_raster.py; born-digital ocr_only "
            "needs real glyph pixels — register a rasterizer via "
            "parsers.pdf_raster.set_pdf_rasterizer, e.g. the pypdfium2 "
            "adapter model_adapters.PdfiumRasterizer)."
        )
    out: list[dict] = []
    for page_no, page in enumerate(doc.pages(), start=1):
        stream = doc.page_content(page)
        if not stream:
            continue
        fonts = doc.page_fonts(page)
        runs = _extract_runs(stream, fonts)
        media = doc.page_attr(page, "/MediaBox") or [0, 0, 612, 792]
        try:
            page_w = float(doc.resolve(media[2])) - float(doc.resolve(media[0]))
            page_h = float(doc.resolve(media[3])) - float(doc.resolve(media[1]))
        except (TypeError, ValueError, IndexError):
            page_w, page_h = 612.0, 792.0
        links, widgets = _page_annotations(doc, page, page_h)
        _match_link_words(runs, links, page_h)
        for b in _runs_to_blocks(runs, page_h):
            text = " ".join(b["text"].split())
            if not text:
                continue
            el_links = []
            for link in links:
                lx0, ltop, lx1, lbot = link["box"]
                cx, cy = (lx0 + lx1) / 2, (ltop + lbot) / 2
                if b["x0"] - 2 <= cx <= b["x1"] + 2 and b["top"] - 2 <= cy <= b["bot"] + 2:
                    ltext = link.get("text")
                    el_links.append(
                        {
                            "text": ltext,
                            "url": link["url"],
                            "start_index": text.find(ltext) if ltext else -1,
                        }
                    )
            out.append(
                {
                    "type": classify.element_type_from_text(text),
                    "text": text,
                    "page_number": page_no,
                    "links": el_links or None,
                    "coordinates": {
                        "points": [
                            {"x": b["x0"], "y": b["top"]},
                            {"x": b["x0"], "y": b["bot"]},
                            {"x": b["x1"], "y": b["bot"]},
                            {"x": b["x1"], "y": b["top"]},
                        ],
                        "system": "PixelSpace",
                        "layout_width": page_w,
                        "layout_height": page_h,
                    },
                }
            )
        # filled AcroForm widget values (content stream misses them;
        # reference pdf.py:563-583) — same constructor as the
        # hi_res/scanned early returns
        out.extend(
            _page_form_elements(widgets, page_w, page_h, page_no, extract_forms)
        )
    if extract_images:
        # extract_images_in_pdf parity: Image elements with base64
        # payloads, interleaved in page order after each page's text
        from unstructured_spark.parsers.pdf_images import pdf_images_to_elements

        imgs = pdf_images_to_elements(content, doc=doc)
        if imgs:
            out = sorted(
                out + imgs, key=lambda e: (e.get("page_number") or 0)
            )
    return out
