"""partition_image: the hi_res layout+OCR pipeline with injectable
models.

The reference's ``partition_image`` (partition/image.py:17-123 →
partition_pdf_or_image → _partition_pdf_or_image_local,
pdf.py:779-1106) runs: rasterize → layout-model detections → OCR →
merge OCR text into invalid-text regions → supplement uncovered OCR
regions → typed elements in reading order.

The models themselves (detectron2/yolox ONNX, tesseract) are not in
this container — but everything else is: pixel decode is the
pure-stdlib codec (``image_codec.py``), the merge/supplement math is
the reference's own numpy box logic (``operators/layout_merge.py``
implements the DataFrame form; here the per-page scalar form), and
reading order is XY-cut (``layout.py``). The two model calls are
process-global plug points exactly like the speech-to-text hook:

    set_layout_model(fn)   # fn(rgb_ndarray, w, h) -> [{"type","x1","y1","x2","y2","score"}]
    set_ocr_agent(fn)      # fn(rgb_ndarray, w, h) -> [{"text","x1","y1","x2","y2"}]

With both registered, png/jpeg/bmp/gif documents partition end-to-end
(pixels decoded by the dependency-free codec, baseline JPEG included);
without, the wire raises the same named dependency gate as before.
"""

from __future__ import annotations

import html as _html
from typing import Callable, Iterable

OCR_SUBREGION_THRESHOLD = 0.5  # reference ocr.py OCR_LAYOUT_SUBREGION_THRESHOLD

LayoutModel = Callable[["object", int, int], Iterable[dict]]
OcrAgent = Callable[["object", int, int], Iterable[dict]]
# fn(table_crop_rgb, tokens) -> cell dicts {"row","col","row_span",
# "col_span","text","is_header"} — the TATR-style structure model
# (reference supplement_element_with_table_extraction, ocr.py:292-341)
TableModel = Callable[["object", list], Iterable[dict]]

_LAYOUT_MODEL: LayoutModel | None = None
_OCR_AGENT: OcrAgent | None = None
_TABLE_MODEL: TableModel | None = None

TABLE_CROP_PAD = 12  # reference env_config.TABLE_IMAGE_CROP_PAD


def set_layout_model(fn: LayoutModel | None) -> None:
    global _LAYOUT_MODEL
    _LAYOUT_MODEL = fn


def set_ocr_agent(fn: OcrAgent | None) -> None:
    global _OCR_AGENT
    _OCR_AGENT = fn


def set_table_model(fn: TableModel | None) -> None:
    global _TABLE_MODEL
    _TABLE_MODEL = fn


def cells_to_html(cells: Iterable[dict]) -> str:
    """Assemble structure-model cells into table HTML (reference
    unstructured_inference ``cells_to_html`` contract: row/col spans
    honored, header rows inside ``<thead>``). Deterministic order:
    (row, col). Empty cell list → empty string."""
    cells = sorted(cells, key=lambda c: (int(c["row"]), int(c["col"])))
    if not cells:
        return ""
    rows: dict[int, list[dict]] = {}
    for c in cells:
        rows.setdefault(int(c["row"]), []).append(c)

    def render_row(row_cells: list[dict], tag: str) -> str:
        tds = []
        for c in row_cells:
            attrs = ""
            if int(c.get("row_span", 1)) > 1:
                attrs += f' rowspan="{int(c["row_span"])}"'
            if int(c.get("col_span", 1)) > 1:
                attrs += f' colspan="{int(c["col_span"])}"'
            text = _html.escape((c.get("text") or "").strip())
            tds.append(f"<{tag}{attrs}>{text}</{tag}>")
        return "<tr>" + "".join(tds) + "</tr>"

    header_rows = [
        r for r in sorted(rows) if all(c.get("is_header") for c in rows[r])
    ]
    # header rows must be the leading rows to form a thead
    lead: list[int] = []
    for i, r in enumerate(sorted(rows)):
        if r in header_rows and len(lead) == i:
            lead.append(r)
    parts = ["<table>"]
    if lead:
        parts.append("<thead>")
        for r in lead:
            parts.append(render_row(rows[r], "th"))
        parts.append("</thead>")
    body = [r for r in sorted(rows) if r not in lead]
    if body:
        parts.append("<tbody>")
        for r in body:
            parts.append(render_row(rows[r], "td"))
        parts.append("</tbody>")
    parts.append("</table>")
    return "".join(parts)


def _is_subregion(inner: dict, outer: dict, threshold: float) -> bool:
    """intersection(inner, outer) / area(inner) >= threshold
    (reference pdfminer_processing.py boxes_is_almost_subregion_of)."""
    ix = max(0.0, min(inner["x2"], outer["x2"]) - max(inner["x1"], outer["x1"]))
    iy = max(0.0, min(inner["y2"], outer["y2"]) - max(inner["y1"], outer["y1"]))
    area = max((inner["x2"] - inner["x1"]) * (inner["y2"] - inner["y1"]), 1e-9)
    return (ix * iy) / area >= threshold


def _coords(b: dict, w: int, h: int) -> dict:
    return {
        "points": [
            {"x": b["x1"], "y": b["y1"]},
            {"x": b["x1"], "y": b["y2"]},
            {"x": b["x2"], "y": b["y2"]},
            {"x": b["x2"], "y": b["y1"]},
        ],
        "system": "PixelSpace",
        "layout_width": float(w),
        "layout_height": float(h),
    }


def image_to_elements(content: bytes, **_: object) -> list[dict]:
    """Decode pixels, run the registered layout + OCR agents, merge
    per the reference's hi_res rules, emit elements in XY-cut order."""
    from unstructured_spark.parsers.dispatch import UnsupportedFormatError

    if _LAYOUT_MODEL is None and _OCR_AGENT is None:
        raise UnsupportedFormatError(
            "partition of images requires a layout/OCR model; register agents "
            "with unstructured_spark.parsers.image_parser.set_layout_model / "
            "set_ocr_agent (reference defaults: yolox + tesseract)"
        )
    import numpy as np

    from unstructured_spark.parsers.image_codec import ImageDecodeError, decode_image

    try:
        if content[:2] in (b"II", b"MM") and content[2:4] in (b"*\x00", b"\x00*"):
            # multi-page TIFF: one agent pass per page (reference
            # partition_image iterates PIL frames the same way)
            from unstructured_spark.parsers.image_codec import decode_tiff_pages

            out: list[dict] = []
            for page_no, (w, h, c, px) in enumerate(decode_tiff_pages(content), 1):
                arr = np.frombuffer(bytes(px), dtype=np.uint8).reshape(h, w, c)
                for el in elements_from_pixels(arr, w, h):
                    el["page_number"] = page_no
                    out.append(el)
            return out
        w, h, c, px = decode_image(content)
    except ImageDecodeError as e:
        raise UnsupportedFormatError(str(e)) from e
    arr = np.frombuffer(bytes(px), dtype=np.uint8).reshape(h, w, c)
    return elements_from_pixels(arr, w, h)


def elements_from_pixels(arr, w: int, h: int) -> list[dict]:
    """The agent pipeline over already-decoded pixels (the scanned-PDF
    route lands here directly, skipping a PNG round-trip)."""
    detections = list(_LAYOUT_MODEL(arr, w, h)) if _LAYOUT_MODEL else []
    words = list(_OCR_AGENT(arr, w, h)) if _OCR_AGENT else []

    # aggregate OCR words into each detection box, reading order inside
    # the box by (y, x) (reference ocr.py aggregate_ocr_text_by_block)
    used = [False] * len(words)
    regions: list[dict] = []
    for det in detections:
        contained = []
        for i, word in enumerate(words):
            if _is_subregion(word, det, OCR_SUBREGION_THRESHOLD):
                contained.append(word)
                used[i] = True
        contained.sort(key=lambda s: (s["y1"], s["x1"]))
        text = det.get("text") or " ".join(
            s["text"] for s in contained if (s.get("text") or "").strip()
        )
        # keep the containment set: the table-structure supplement
        # reuses it instead of re-running the O(detections x words) scan
        regions.append({**det, "text": text, "_contained": contained})
    # supplement: uncovered OCR regions appended as UncategorizedText
    # (reference ocr.py:436-491)
    for i, word in enumerate(words):
        if not used[i] and (word.get("text") or "").strip():
            regions.append({**word, "type": "Text"})

    # table-structure supplement: crop each Table detection (+pad), feed
    # the contained OCR tokens in crop-relative coords to the structure
    # model, render cells as text_as_html (reference
    # supplement_element_with_table_extraction, ocr.py:292-341)
    if _TABLE_MODEL is not None:
        for r in regions:
            if (r.get("type") or "") not in ("Table",):
                continue
            x1 = max(int(r["x1"]) - TABLE_CROP_PAD, 0)
            y1 = max(int(r["y1"]) - TABLE_CROP_PAD, 0)
            x2 = min(int(r["x2"]) + TABLE_CROP_PAD, w)
            y2 = min(int(r["y2"]) + TABLE_CROP_PAD, h)
            if x2 <= x1 or y2 <= y1:
                continue
            crop = arr[y1:y2, x1:x2]
            tokens = [
                {
                    "text": s["text"],
                    "x1": s["x1"] - x1,
                    "y1": s["y1"] - y1,
                    "x2": s["x2"] - x1,
                    "y2": s["y2"] - y1,
                }
                for s in r.get("_contained", [])
            ]
            cells = list(_TABLE_MODEL(crop, tokens))
            if cells:
                r["text_as_html"] = cells_to_html(cells)

    regions = [
        r
        for r in regions
        if (r.get("text") or "").strip() or r.get("text_as_html")
    ]
    from unstructured_spark.parsers.layout import xy_cut_order
    from unstructured_spark.schema import TYPE_NORMALIZATION

    order = xy_cut_order([(r["x1"], r["y1"], r["x2"], r["y2"]) for r in regions])
    out = []
    for i in order:
        r = regions[i]
        rtype = r.get("type") or "Text"
        el = {
            "type": TYPE_NORMALIZATION.get(rtype, rtype),
            "text": " ".join(r["text"].split()),
            "page_number": 1,
            "coordinates": _coords(r, w, h),
        }
        if r.get("text_as_html"):
            el["text_as_html"] = r["text_as_html"]
        out.append(el)
    return out
