"""PDF/image partitioning strategy selection — the reference's only
cost-based plan decision (``partition/strategies.py:8-109``).

Pure functions; executor-dependency availability (layout-inference
model, OCR engine) is injectable so the decision table is fully
testable in this container, and probed from real imports by default.
"""

from __future__ import annotations

AUTO = "auto"
FAST = "fast"
OCR_ONLY = "ocr_only"
HI_RES = "hi_res"
_VALID = (AUTO, FAST, OCR_ONLY, HI_RES)


def _dependency_exists(module: str) -> bool:
    try:
        __import__(module)
        return True
    except ImportError:
        return False


def validate_strategy(strategy: str, is_image: bool = False) -> None:
    """reference strategies.py:8-21."""
    if strategy not in _VALID:
        raise ValueError(f"{strategy} is not a valid strategy.")
    if strategy == FAST and is_image:
        raise ValueError("The fast strategy is not available for image files.")


def determine_pdf_or_image_strategy(
    strategy: str,
    is_image: bool = False,
    pdf_text_extractable: bool = False,
    infer_table_structure: bool = False,
    extract_images_in_pdf: bool = False,
    extract_image_block_types: list[str] | None = None,
    inference_installed: bool | None = None,
    ocr_installed: bool | None = None,
) -> str:
    """Full decision table with dependency fallbacks
    (reference strategies.py:24-86):

    - auto: images → hi_res; PDFs → hi_res when table-structure or
      image extraction was requested, else fast when text is
      extractable, else ocr_only.
    - no inference model + no OCR + no extractable text → error (the
      file cannot be processed at all).
    - hi_res without the inference model falls back to ocr_only (the
      closest strategy) or fast; ocr_only without OCR falls back to
      fast when text is extractable else hi_res.
    """
    if inference_installed is None:
        inference_installed = _dependency_exists("onnxruntime")
    if ocr_installed is None:
        ocr_installed = _dependency_exists("pytesseract")

    if strategy == AUTO:
        extract_element = extract_images_in_pdf or bool(extract_image_block_types)
        if is_image:
            strategy = HI_RES
        elif infer_table_structure or extract_element:
            strategy = HI_RES
        elif pdf_text_extractable:
            strategy = FAST
        else:
            strategy = OCR_ONLY

    if not inference_installed and not ocr_installed and not pdf_text_extractable:
        raise ValueError(
            "no layout-inference model, no OCR engine, and the text of "
            "the PDF is not extractable; install onnxruntime or "
            "pytesseract on executors, or remove copy protection from "
            "the PDF."
        )

    if strategy == HI_RES and not inference_installed:
        return OCR_ONLY if ocr_installed else FAST

    if strategy == OCR_ONLY and not ocr_installed:
        return FAST if pdf_text_extractable else HI_RES

    return strategy
