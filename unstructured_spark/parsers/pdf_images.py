"""PDF embedded-image extraction + the scanned-PDF hi_res/ocr route.

Two reference capabilities become real with the dependency-free image
codec:

- ``extract_images_in_pdf`` (reference pdf.py kwarg; pdf_image/
  pdf_image_utils.py save_elements): embedded image XObjects come out
  as ``Image`` elements carrying ``image_base64``/``image_mime_type``.
- hi_res / ocr_only on scanned PDFs (reference pdf.py:779-1229):
  a scanned page is one full-page image XObject; we extract it, decode
  pixels (baseline JPEG / Flate bitmaps — no rasterizer needed for the
  scanned-page case), and run the injectable layout/OCR agents through
  the same merge/supplement/order machinery as ``partition_image``
  (parsers/image_parser.py). The reference instead rasterizes with
  pdf2image+poppler — for BORN-DIGITAL pages (vector text) that
  rasterize step genuinely needs a PDF renderer and stays gated; for
  scanned input, extraction is lossless and strictly better.

Robustness contract: per-image and per-page isolation. A corrupt or
exotic stream (unsupported filter chain, deflate bomb, progressive
JPEG) yields ``decodable=False`` or a skipped page — never a failed
document. Flate streams are size-capped (the same deflate-bomb guard
as pdf_parser._decode_stream) and /DecodeParms PNG/TIFF predictors are
applied.
"""

from __future__ import annotations

import base64
import re
import zlib

from unstructured_spark.parsers.pdf_parser import _MAX_STREAM_BYTES, _PdfDoc, _Ref


def _as_list(v) -> list:
    if v is None:
        return []
    return v if isinstance(v, list) else [v]


def _bounded_inflate(data: bytes) -> bytes | None:
    try:
        d = zlib.decompressobj()
        out = d.decompress(data, _MAX_STREAM_BYTES)
        if d.unconsumed_tail:
            return None  # exceeded the bomb cap
        return out
    except zlib.error:
        return None


def _apply_predictor(data: bytes, parms: dict | None, doc: _PdfDoc) -> bytes | None:
    """Undo /DecodeParms predictors on a Flate-decoded stream:
    Predictor 2 = TIFF horizontal differencing, >= 10 = PNG row filters
    (each row is 1 tag byte + columns*colors samples)."""
    if not isinstance(parms, dict):
        return data
    pred = int(doc.resolve(parms.get("/Predictor", 1)) or 1)
    if pred <= 1:
        return data
    colors = int(doc.resolve(parms.get("/Colors", 1)) or 1)
    columns = int(doc.resolve(parms.get("/Columns", 1)) or 1)
    bpc = int(doc.resolve(parms.get("/BitsPerComponent", 8)) or 8)
    if bpc != 8:
        return None  # sub-byte predictor rows: not supported
    import numpy as np

    stride = columns * colors
    if pred == 2:  # TIFF horizontal diff
        rows = len(data) // stride
        arr = np.frombuffer(data, np.uint8, count=rows * stride).reshape(
            rows, columns, colors
        )
        return np.cumsum(arr, axis=1, dtype=np.uint8).tobytes()
    # PNG predictors: same unfilter loop as the PNG codec
    row_len = 1 + stride
    rows = len(data) // row_len
    if rows == 0:
        return None
    out = bytearray(rows * stride)
    prev = bytearray(stride)
    bpp = colors
    pos = 0
    for r in range(rows):
        ftype = data[pos]
        line = bytearray(data[pos + 1 : pos + row_len])
        pos += row_len
        if ftype == 1:
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:
            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:
            from unstructured_spark.parsers.image_codec import _paeth

            for i in range(stride):
                left = line[i - bpp] if i >= bpp else 0
                upleft = prev[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + _paeth(left, prev[i], upleft)) & 0xFF
        elif ftype != 0:
            return None
        out[r * stride : (r + 1) * stride] = line
        prev = line
    return bytes(out)


def _decode_pre_filters(
    doc: _PdfDoc, obj: dict, raw: bytes, filters: list, parms_list: list
) -> bytes | None:
    """Apply every filter in the chain (ASCIIHex/ASCII85/Flate with
    predictors). Returns None on any unsupported filter or corrupt
    stream — the caller marks the image undecodable."""
    data = raw
    for f, parms in zip(filters, parms_list):
        if f == "/FlateDecode":
            data = _bounded_inflate(data)
            if data is not None:
                data = _apply_predictor(data, doc.resolve(parms), doc)
        elif f == "/ASCIIHexDecode":
            try:
                data = bytes.fromhex(
                    re.sub(rb"[^0-9a-fA-F]", b"", data.split(b">")[0]).decode()
                )
            except ValueError:
                data = None
        elif f == "/ASCII85Decode":
            payload = re.sub(rb"\s", b"", data.split(b"~>")[0])
            try:
                data = base64.a85decode(payload, adobe=False)
            except ValueError:
                data = None
        else:
            return None
        if data is None:
            return None
    return data


def _jpeg_is_baseline(data: bytes) -> bool:
    """Probe SOF markers: our codec decodes SOF0/SOF1/SOF2 with 1 or
    3 components; lossless/arithmetic variants and CMYK export fine as
    files but are not decodable in-repo."""
    i = 2
    while i + 4 < len(data):
        if data[i] != 0xFF:
            i += 1
            continue
        m = data[i + 1]
        if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
            i += 2
            continue
        if 0xC0 <= m <= 0xCF and m not in (0xC4, 0xC8, 0xCC):
            if i + 9 >= len(data):
                return False  # truncated SOF segment
            return m in (0xC0, 0xC1, 0xC2) and data[i + 9] in (1, 3)
        if m == 0xDA:
            return False
        i += 2 + int.from_bytes(data[i + 2 : i + 4], "big")
    return False


def _collect_image_xobjects(
    doc: _PdfDoc, resources, depth: int = 0, seen: set | None = None
) -> list[tuple[int, dict]]:
    """(object number, image dict) pairs reachable from a resource
    dict, following Form XObjects' own resources (producers commonly
    draw the page image inside a Form)."""
    seen = seen if seen is not None else set()
    out: list[tuple[int, dict]] = []
    res = doc.resolve(resources)
    if not isinstance(res, dict) or depth > 4:
        return out
    xobjs = doc.resolve(res.get("/XObject"))
    if not isinstance(xobjs, dict):
        return out
    for _name, ref in xobjs.items():
        num = ref.num if isinstance(ref, _Ref) else None
        if num is None or num in seen:
            continue
        seen.add(num)
        obj = doc.resolve(ref)
        if not isinstance(obj, dict):
            continue
        sub = doc.resolve(obj.get("/Subtype"))
        if sub == "/Image":
            out.append((num, obj))
        elif sub == "/Form":
            out.extend(
                _collect_image_xobjects(doc, obj.get("/Resources"), depth + 1, seen)
            )
    return out


def extract_pdf_images(content: bytes, doc: _PdfDoc | None = None) -> list[dict]:
    """All image XObjects reachable from page resources (including via
    Form XObjects), in page order:
    ``{page_number, name, width, height, mime, data, decodable,
    pixels}``.

    DCTDecode streams are JPEG files as-is (pre-filters applied).
    8-bit RGB/Gray and 1-bit bitmaps are re-encoded as PNG for a
    portable payload, with the raw plane kept in ``pixels`` as
    ``(channels, bytes)`` so in-process consumers skip the PNG
    round-trip. ``decodable`` means decodable by this repo's codec;
    JPEG variants we can't decode (lossless/arithmetic/CMYK) still
    export with ``mime=image/jpeg``."""
    from unstructured_spark.parsers.image_codec import encode_png

    doc = doc or _PdfDoc(content)
    out: list[dict] = []
    seen_on_page: set[tuple[int, int]] = set()
    for page_no, page in enumerate(doc.pages(), start=1):
        res = doc.page_attr(page, "/Resources") or {}
        for num, obj in _collect_image_xobjects(doc, res):
            if (page_no, num) in seen_on_page:
                continue
            seen_on_page.add((page_no, num))
            raw = doc.streams.get(num, b"")
            w = int(doc.resolve(obj.get("/Width", 0)) or 0)
            h = int(doc.resolve(obj.get("/Height", 0)) or 0)
            bpc = int(doc.resolve(obj.get("/BitsPerComponent", 0)) or 0)
            filters = [doc.resolve(f) for f in _as_list(doc.resolve(obj.get("/Filter")))]
            parms_raw = _as_list(
                doc.resolve(obj.get("/DecodeParms", obj.get("/DP")))
            )
            parms_list = parms_raw + [None] * (len(filters) - len(parms_raw))
            rec = {
                "page_number": page_no,
                "name": f"obj{num}",
                "width": w,
                "height": h,
                "mime": "application/octet-stream",
                "data": raw,
                "decodable": False,
                "pixels": None,
            }
            try:
                rec = _classify_image(doc, obj, raw, filters, parms_list, w, h, bpc, rec)
            except Exception:
                pass  # per-image isolation: surface the raw record
            out.append(rec)
    return out


def _classify_image(doc, obj, raw, filters, parms_list, w, h, bpc, rec) -> dict:
    from unstructured_spark.parsers.image_codec import encode_png

    if filters and filters[-1] == "/DCTDecode":
        payload = _decode_pre_filters(doc, obj, raw, filters[:-1], parms_list[:-1])
        if payload:
            rec.update(
                mime="image/jpeg",
                data=payload,
                decodable=_jpeg_is_baseline(payload),
            )
        return rec
    if (
        all(
            f in ("/FlateDecode", "/ASCIIHexDecode", "/ASCII85Decode")
            for f in filters
        )
        and bpc in (1, 8)
        and w
        and h
    ):
        px = _decode_pre_filters(doc, obj, raw, filters, parms_list)
        nch = None
        if px is not None and bpc == 8:
            nch = _channels_for_colorspace(doc, obj.get("/ColorSpace"))
            if nch in (1, 3) and len(px) >= w * h * nch:
                px = px[: w * h * nch]
            else:
                px = None
        elif px is not None:  # 1-bit gray / image mask
            cs = doc.resolve(obj.get("/ColorSpace"))
            mask = bool(doc.resolve(obj.get("/ImageMask")))
            row_bytes = (w + 7) // 8
            if (cs in (None, "/DeviceGray") or mask) and len(px) >= row_bytes * h:
                import numpy as np

                bits = np.unpackbits(
                    np.frombuffer(px, np.uint8, count=row_bytes * h).reshape(
                        h, row_bytes
                    ),
                    axis=1,
                )[:, :w]
                decode = doc.resolve(obj.get("/Decode"))
                # 0=black 1=white for DeviceGray and for masks
                # (0=paint-with-fill≈black); /Decode [1 0] inverts
                inverted = (
                    isinstance(decode, list)
                    and len(decode) >= 2
                    and float(doc.resolve(decode[0]) or 0) == 1.0
                )
                gray = (bits ^ 1 if inverted else bits) * np.uint8(255)
                px = np.ascontiguousarray(gray).astype("uint8").tobytes()
                nch = 1
            else:
                px = None
        if px is not None and nch in (1, 3):
            rec.update(
                mime="image/png",
                data=encode_png(w, h, nch, px),
                decodable=True,
                pixels=(nch, bytes(px)),
            )
    return rec


def _channels_for_colorspace(doc: _PdfDoc, cs) -> int | None:
    cs = doc.resolve(cs)
    if isinstance(cs, list) and cs:
        head = doc.resolve(cs[0])
        if head == "/ICCBased" and len(cs) > 1:
            icc = doc.resolve(cs[1])
            if isinstance(icc, dict):
                n = doc.resolve(icc.get("/N"))
                return int(n) if isinstance(n, (int, float)) else None
        if head == "/DeviceN" and len(cs) > 1:
            names = doc.resolve(cs[1])
            return len(names) if isinstance(names, list) else None
        cs = head
    if cs == "/DeviceRGB":
        return 3
    if cs in ("/DeviceGray", "/CalGray"):
        return 1
    if cs == "/CalRGB":
        return 3
    if cs == "/DeviceCMYK":
        return 4
    return None  # /Indexed and exotic spaces: not decoded here


def pdf_images_to_elements(content: bytes, doc: _PdfDoc | None = None) -> list[dict]:
    """The ``extract_images_in_pdf`` output shape: one ``Image``
    element per embedded image with base64 payload + mime type
    (reference pdf_image_utils.py save_elements → metadata.image_base64,
    elements.py ElementMetadata.image_base64/image_mime_type).
    Exports every portable payload (JPEG/PNG), including JPEG variants
    this repo's codec can't decode itself."""
    out = []
    for rec in extract_pdf_images(content, doc=doc):
        if rec["mime"] not in ("image/jpeg", "image/png"):
            continue
        out.append(
            {
                "type": "Image",
                "text": "",
                "page_number": rec["page_number"],
                "image_base64": base64.b64encode(rec["data"]).decode("ascii"),
                "image_mime_type": rec["mime"],
            }
        )
    return out


def scanned_pdf_to_elements(content: bytes, doc: _PdfDoc | None = None) -> list[dict]:
    """hi_res/ocr_only for scanned PDFs: per page, take the dominant
    decodable image XObject, decode pixels, and run the registered
    layout/OCR agents through the partition_image pipeline
    (image_parser — merge, supplement, XY-cut). Raw bitmap planes skip
    the PNG round-trip. Per-page isolation: a page whose image fails
    to decode is skipped, the rest of the document still partitions."""
    import numpy as np

    from unstructured_spark.parsers.image_codec import decode_image
    from unstructured_spark.parsers.image_parser import elements_from_pixels

    by_page: dict[int, dict] = {}
    for rec in extract_pdf_images(content, doc=doc):
        if not rec["decodable"]:
            continue
        cur = by_page.get(rec["page_number"])
        if cur is None or rec["width"] * rec["height"] > cur["width"] * cur["height"]:
            by_page[rec["page_number"]] = rec
    out: list[dict] = []
    for page_no in sorted(by_page):
        rec = by_page[page_no]
        try:
            if rec["pixels"] is not None:
                nch, px = rec["pixels"]
                w, h = rec["width"], rec["height"]
            else:
                w, h, nch, px = decode_image(rec["data"])
            arr = np.frombuffer(bytes(px), dtype=np.uint8).reshape(h, w, nch)
            els = elements_from_pixels(arr, w, h)
        except Exception:
            continue  # per-page isolation
        for el in els:
            el["page_number"] = page_no
        out.extend(els)
    return out
