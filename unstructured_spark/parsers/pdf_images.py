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
"""

from __future__ import annotations

import base64
import zlib

from unstructured_spark.parsers.pdf_parser import _PdfDoc, _Ref


def _as_list(v) -> list:
    if v is None:
        return []
    return v if isinstance(v, list) else [v]


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


def extract_pdf_images(content: bytes) -> list[dict]:
    """All image XObjects reachable from page resources, in page order:
    ``{page_number, name, width, height, mime, data, decodable}``.

    DCTDecode streams are JPEG files as-is. Flate/uncompressed 8-bit
    RGB/Gray bitmaps are re-encoded as PNG (portable bytes, decodable
    by the same codec). Anything else (CCITT fax, JPX, 1-bit, Indexed)
    is surfaced undecoded with ``decodable=False`` — per-image
    isolation, never a failed document."""
    from unstructured_spark.parsers.image_codec import encode_png

    doc = _PdfDoc(content)
    out: list[dict] = []
    seen_on_page: set[tuple[int, int]] = set()
    for page_no, page in enumerate(doc.pages(), start=1):
        res = doc.resolve(page.get("/Resources")) or {}
        xobjs = doc.resolve(res.get("/XObject")) or {}
        if not isinstance(xobjs, dict):
            continue
        for name, ref in xobjs.items():
            obj = doc.resolve(ref)
            if not isinstance(obj, dict) or doc.resolve(obj.get("/Subtype")) != "/Image":
                continue
            num = ref.num if isinstance(ref, _Ref) else None
            if num is None or (page_no, num) in seen_on_page:
                continue
            seen_on_page.add((page_no, num))
            raw = doc.streams.get(num, b"")
            w = int(doc.resolve(obj.get("/Width", 0)) or 0)
            h = int(doc.resolve(obj.get("/Height", 0)) or 0)
            bpc = int(doc.resolve(obj.get("/BitsPerComponent", 0)) or 0)
            filters = [doc.resolve(f) for f in _as_list(doc.resolve(obj.get("/Filter")))]
            rec = {
                "page_number": page_no,
                "name": str(name),
                "width": w,
                "height": h,
                "mime": "application/octet-stream",
                "data": raw,
                "decodable": False,
            }
            if filters and filters[-1] == "/DCTDecode":
                payload = raw
                for f in filters[:-1]:
                    if f == "/FlateDecode":
                        try:
                            payload = zlib.decompress(payload)
                        except zlib.error:
                            payload = None
                            break
                if payload:
                    rec.update(mime="image/jpeg", data=payload, decodable=True)
            elif filters in ([], ["/FlateDecode"]) and bpc == 8:
                nch = _channels_for_colorspace(doc, obj.get("/ColorSpace"))
                if nch in (1, 3):
                    try:
                        px = zlib.decompress(raw) if filters else raw
                    except zlib.error:
                        px = None
                    if px is not None and len(px) >= w * h * nch and w and h:
                        rec.update(
                            mime="image/png",
                            data=encode_png(w, h, nch, px[: w * h * nch]),
                            decodable=True,
                        )
            elif filters in ([], ["/FlateDecode"]) and bpc == 1 and w and h:
                # 1-bit gray / image masks (rows byte-aligned); /Decode
                # [1 0] inverts sample meaning
                cs = doc.resolve(obj.get("/ColorSpace"))
                mask = bool(doc.resolve(obj.get("/ImageMask")))
                if cs in (None, "/DeviceGray") or mask:
                    try:
                        px = zlib.decompress(raw) if filters else raw
                    except zlib.error:
                        px = None
                    row_bytes = (w + 7) // 8
                    if px is not None and len(px) >= row_bytes * h:
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
                        rec.update(
                            mime="image/png",
                            data=encode_png(w, h, 1, bytearray(gray.astype("uint8").tobytes())),
                            decodable=True,
                        )
            out.append(rec)
    return out


def pdf_images_to_elements(content: bytes) -> list[dict]:
    """The ``extract_images_in_pdf`` output shape: one ``Image``
    element per embedded image with base64 payload + mime type
    (reference pdf_image_utils.py save_elements → metadata.image_base64,
    elements.py ElementMetadata.image_base64/image_mime_type)."""
    out = []
    for rec in extract_pdf_images(content):
        if not rec["decodable"]:
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


def scanned_pdf_to_elements(content: bytes) -> list[dict]:
    """hi_res/ocr_only for scanned PDFs: per page, take the dominant
    decodable image XObject, decode pixels, and run the registered
    layout/OCR agents through the partition_image pipeline
    (image_parser.image_to_elements — merge, supplement, XY-cut).
    Pages without a decodable image are skipped (a mixed scan keeps
    its scanned pages)."""
    from unstructured_spark.parsers.image_parser import image_to_elements

    by_page: dict[int, dict] = {}
    for rec in extract_pdf_images(content):
        if not rec["decodable"]:
            continue
        cur = by_page.get(rec["page_number"])
        if cur is None or rec["width"] * rec["height"] > cur["width"] * cur["height"]:
            by_page[rec["page_number"]] = rec
    out: list[dict] = []
    for page_no in sorted(by_page):
        els = image_to_elements(by_page[page_no]["data"])
        for el in els:
            el["page_number"] = page_no
        out.extend(els)
    return out
