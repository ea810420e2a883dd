#!/usr/bin/env python
"""Real-weights smoke harness for the model-adapter layer.

The container this repo is developed in has no model runtimes
(onnxruntime / pytesseract / paddleocr / google-cloud-vision /
whisper), so the adapters (``unstructured_spark/parsers/
model_adapters.py``) are contract-tested against fakes. This script
closes the gap for users WITH weights: it registers real adapters,
runs the full hi_res partition pipeline on a document, and diffs the
element JSON against a recorded golden — the reference's
``model_init.py`` validation role, done as an explicit harness.

Usage:

  # run with real weights and record a golden for your environment
  python scripts/smoke_model_adapters.py --file doc.pdf \
      --layout-onnx yolox.onnx --tesseract --record my_golden.json

  # later (CI, upgrades): diff against the recording; exit 1 on drift
  python scripts/smoke_model_adapters.py --file doc.pdf \
      --layout-onnx yolox.onnx --tesseract --diff my_golden.json

  # no weights? prove the harness itself works end-to-end with the
  # deterministic fake agents on a built-in synthetic scanned PDF
  # (the shipped scripts/goldens/smoke_fake_demo.json was recorded
  # this way and is pinned by tests/test_smoke_harness.py):
  python scripts/smoke_model_adapters.py --demo \
      --diff scripts/goldens/smoke_fake_demo.json

Adapter flags (all optional, each import-gated with a named error):
  --layout-onnx PATH   OnnxLayoutModel (YOLOX decode)
  --tatr-onnx PATH     TatrTableModel (DETR table structure)
  --tesseract [LANG]   TesseractOcrAgent
  --paddle [LANG]      PaddleOcrAgent
  --gcv [LANG]         GoogleVisionOcrAgent
  --pdfium [DPI]       PdfiumRasterizer (born-digital ocr_only / hi_res
                       real pixels)
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _stable(els: list[dict]) -> list[dict]:
    """Golden-stable element view: geometry rounded, volatile fields
    (timestamps, ids derived from absolute paths) dropped."""
    out = []
    for e in els:
        row = {
            "type": e.get("type"),
            "text": e.get("text"),
            "page_number": e.get("page_number"),
        }
        coords = e.get("coordinates")
        if coords and coords.get("points"):
            row["bbox"] = [
                round(min(p["x"] for p in coords["points"]), 1),
                round(min(p["y"] for p in coords["points"]), 1),
                round(max(p["x"] for p in coords["points"]), 1),
                round(max(p["y"] for p in coords["points"]), 1),
            ]
        if e.get("text_as_html"):
            row["text_as_html"] = e["text_as_html"]
        out.append(row)
    return out


def _register(args) -> list[str]:
    from unstructured_spark.parsers import model_adapters as ma

    active = []
    if args.layout_onnx:
        ma.OnnxLayoutModel(args.layout_onnx).register()
        active.append(f"OnnxLayoutModel({args.layout_onnx})")
    if args.tatr_onnx:
        ma.TatrTableModel(args.tatr_onnx).register()
        active.append(f"TatrTableModel({args.tatr_onnx})")
    if args.tesseract is not None:
        ma.TesseractOcrAgent(args.tesseract or "eng").register()
        active.append("TesseractOcrAgent")
    if args.paddle is not None:
        ma.PaddleOcrAgent(args.paddle or "en").register()
        active.append("PaddleOcrAgent")
    if args.gcv is not None:
        ma.GoogleVisionOcrAgent(args.gcv or None).register()
        active.append("GoogleVisionOcrAgent")
    if args.pdfium is not None:
        ma.PdfiumRasterizer(int(args.pdfium or 150)).register()
        active.append("PdfiumRasterizer")
    return active


def _register_fakes() -> list[str]:
    """Deterministic pixel-derived fakes (the contract the adapter
    tests pin): layout = title band + body block with the decoded
    image's mean pixel embedded, OCR = a fixed word grid."""
    from unstructured_spark.parsers.image_parser import (
        set_layout_model,
        set_ocr_agent,
    )

    def layout(arr, w, h):
        mean = int(arr.mean())
        return [
            {"type": "Title", "x1": w * 0.1, "y1": h * 0.05,
             "x2": w * 0.9, "y2": h * 0.12, "score": 0.9,
             "text": f"mean={mean}"},
            {"type": "NarrativeText", "x1": w * 0.1, "y1": h * 0.2,
             "x2": w * 0.9, "y2": h * 0.7, "score": 0.8},
        ]

    def ocr(arr, w, h):
        words = []
        for line in range(2):
            for col in range(3):
                words.append({
                    "text": f"w{line}{col}",
                    "x1": w * (0.15 + 0.2 * col),
                    "y1": h * (0.25 + 0.1 * line),
                    "x2": w * (0.15 + 0.2 * col) + w * 0.1,
                    "y2": h * (0.25 + 0.1 * line) + h * 0.03,
                })
        words.append({"text": "footer", "x1": w * 0.4, "y1": h * 0.9,
                      "x2": w * 0.6, "y2": h * 0.93})
        return words

    set_layout_model(layout)
    set_ocr_agent(ocr)
    return ["fake layout model", "fake OCR agent"]


def _demo_pdf() -> bytes:
    """Self-contained synthetic scanned-style PDF: one page whose only
    content is an embedded uncompressed-BMP-shaped image (a gray ramp),
    so the hi_res route exercises XObject extraction + pixel decode."""
    import zlib

    w = h = 64
    # 8-bit gray ramp, FlateDecode DeviceGray image XObject
    pixels = bytes((x * 4) % 256 for _ in range(h) for x in range(w))
    comp = zlib.compress(pixels)
    content = b"q 612 0 0 792 0 0 cm /Im1 Do Q"
    objs = [
        b"<</Type/Catalog/Pages 2 0 R>>",
        b"<</Type/Pages/Kids[3 0 R]/Count 1>>",
        b"<</Type/Page/Parent 2 0 R/MediaBox[0 0 612 792]"
        b"/Resources<</XObject<</Im1 4 0 R>>>>/Contents 5 0 R>>",
        b"<</Type/XObject/Subtype/Image/Width 64/Height 64"
        b"/ColorSpace/DeviceGray/BitsPerComponent 8/Filter/FlateDecode"
        b"/Length %d>>" % len(comp),
        b"<</Length %d>>" % len(content),
    ]
    streams = {4: comp, 5: content}
    offsets = []
    buf = b"%PDF-1.4\n"
    for i, obj in enumerate(objs, start=1):
        offsets.append(len(buf))
        piece = b"%d 0 obj\n%s\n" % (i, obj)
        if i in streams:
            piece += b"stream\n" + streams[i] + b"\nendstream\n"
        piece += b"endobj\n"
        buf += piece
    xref = len(buf)
    buf += b"xref\n0 %d\n0000000000 65535 f \n" % (len(objs) + 1)
    for off in offsets:
        buf += b"%010d 00000 n \n" % off
    buf += (
        b"trailer<</Size %d/Root 1 0 R>>\nstartxref\n%d\n%%%%EOF"
        % (len(objs) + 1, xref)
    )
    return buf


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--file", help="document to partition (pdf/image)")
    p.add_argument("--demo", action="store_true",
                   help="use the built-in synthetic scanned PDF + fake agents")
    p.add_argument("--layout-onnx", metavar="PATH")
    p.add_argument("--tatr-onnx", metavar="PATH")
    p.add_argument("--tesseract", nargs="?", const="eng", metavar="LANG")
    p.add_argument("--paddle", nargs="?", const="en", metavar="LANG")
    p.add_argument("--gcv", nargs="?", const="", metavar="LANG")
    p.add_argument("--pdfium", nargs="?", const="150", metavar="DPI")
    p.add_argument("--record", metavar="GOLDEN.json")
    p.add_argument("--diff", metavar="GOLDEN.json")
    args = p.parse_args(argv)

    if not args.demo and not args.file:
        p.error("--file or --demo required")

    from unstructured_spark.parsers.dispatch import partition_bytes
    from unstructured_spark.parsers.image_parser import (
        set_layout_model,
        set_ocr_agent,
        set_table_model,
    )
    from unstructured_spark.parsers.pdf_raster import set_pdf_rasterizer

    try:
        active = _register_fakes() if args.demo else _register(args)
        if not active:
            p.error("register at least one adapter (or use --demo)")
        print("active adapters:", ", ".join(active), file=sys.stderr)

        if args.demo:
            raw, name = _demo_pdf(), "demo.pdf"
        else:
            raw, name = Path(args.file).read_bytes(), Path(args.file).name
        els = partition_bytes(raw, filename=name, strategy="hi_res")
        stable = _stable(els)
    finally:
        set_layout_model(None)
        set_ocr_agent(None)
        set_table_model(None)
        set_pdf_rasterizer(None)

    if args.record:
        Path(args.record).write_text(json.dumps(stable, indent=1) + "\n")
        print(f"recorded {len(stable)} elements -> {args.record}",
              file=sys.stderr)
        return 0
    if args.diff:
        golden = json.loads(Path(args.diff).read_text())
        if stable == golden:
            print(f"OK: {len(stable)} elements match {args.diff}",
                  file=sys.stderr)
            return 0
        import difflib

        a = json.dumps(golden, indent=1).splitlines()
        b = json.dumps(stable, indent=1).splitlines()
        for line in difflib.unified_diff(a, b, "golden", "current", lineterm=""):
            print(line)
        return 1
    print(json.dumps(stable, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
