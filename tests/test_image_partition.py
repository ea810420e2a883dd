"""partition_image end-to-end with injectable layout/OCR agents
(parsers/image_parser.py) and the pluggable translate hook. The model
calls are fakes; the decode, OCR-merge, supplement, and reading-order
stages are the real reference semantics (pdf.py:779-1106,
ocr.py:373-491)."""

import pytest
from pyspark.sql import functions as F

from unstructured_spark.parsers.dispatch import UnsupportedFormatError, partition_bytes
from unstructured_spark.parsers.image_codec import encode_png
from unstructured_spark.parsers.image_parser import set_layout_model, set_ocr_agent


def _png(w=200, h=100) -> bytes:
    return encode_png(w, h, 3, bytearray([200] * (w * h * 3)))


def _fake_layout(arr, w, h):
    assert arr.shape == (h, w, 3)  # agents receive real decoded pixels
    return [
        {"type": "Section-header", "x1": 10, "y1": 5, "x2": 190, "y2": 25, "score": 0.9},
        {"type": "NarrativeText", "x1": 10, "y1": 40, "x2": 190, "y2": 90, "score": 0.8},
    ]


def _fake_ocr(arr, w, h):
    return [
        {"text": "Big", "x1": 12, "y1": 8, "x2": 60, "y2": 22},
        {"text": "Title", "x1": 65, "y1": 8, "x2": 120, "y2": 22},
        {"text": "body", "x1": 12, "y1": 45, "x2": 60, "y2": 60},
        {"text": "words", "x1": 12, "y1": 65, "x2": 60, "y2": 80},
        {"text": "stray", "x1": 150, "y1": 92, "x2": 190, "y2": 99},  # outside boxes
    ]


@pytest.fixture
def agents():
    set_layout_model(_fake_layout)
    set_ocr_agent(_fake_ocr)
    yield
    set_layout_model(None)
    set_ocr_agent(None)


class TestGate:
    def test_without_agents_raises(self):
        set_layout_model(None)
        set_ocr_agent(None)
        with pytest.raises(UnsupportedFormatError, match="layout/OCR"):
            partition_bytes(_png(), filename="x.png")


class TestHiResPipeline:
    def test_end_to_end_png(self, agents):
        els = partition_bytes(_png(), filename="scan.png")
        assert [e["type"] for e in els] == ["Title", "NarrativeText", "Text"]
        assert els[0]["text"] == "Big Title"  # OCR words aggregated into box
        assert els[1]["text"] == "body words"
        assert els[2]["text"] == "stray"  # uncovered OCR region supplemented
        assert els[0]["coordinates"]["system"] == "PixelSpace"
        assert els[0]["coordinates"]["layout_width"] == 200.0
        assert els[0]["filetype"] == "image/png"

    def test_detection_text_wins_over_ocr(self, agents):
        set_layout_model(
            lambda a, w, h: [
                {"type": "Table", "x1": 0, "y1": 0, "x2": 199, "y2": 99, "text": "preset"}
            ]
        )
        els = partition_bytes(_png(), filename="t.png")
        assert els[0]["type"] == "Table"
        assert els[0]["text"] == "preset"

    def test_ocr_only_mode(self):
        set_layout_model(None)
        set_ocr_agent(_fake_ocr)
        try:
            els = partition_bytes(_png(), filename="o.png")
        finally:
            set_ocr_agent(None)
        # no layout boxes: every OCR word becomes a supplemented region
        assert len(els) == 5
        assert {e["type"] for e in els} == {"Text"}

    def test_reading_order_xy_cut(self, agents):
        # two columns: right-top box must come after left column boxes
        set_layout_model(
            lambda a, w, h: [
                {"type": "Text", "x1": 110, "y1": 5, "x2": 190, "y2": 95, "text": "right"},
                {"type": "Text", "x1": 10, "y1": 5, "x2": 90, "y2": 45, "text": "left-top"},
                {"type": "Text", "x1": 10, "y1": 55, "x2": 90, "y2": 95, "text": "left-bottom"},
            ]
        )
        set_ocr_agent(lambda a, w, h: [])
        els = partition_bytes(_png(), filename="cols.png")
        assert [e["text"] for e in els] == ["left-top", "left-bottom", "right"]

    def test_gif_and_bmp_route(self, agents):
        from pathlib import Path

        raw = Path("/root/reference/example-docs/img/bmp_24.bmp").read_bytes()
        els = partition_bytes(raw, filename="img.bmp")
        assert els and els[0]["filetype"] == "image/bmp"


class TestTranslateHook:
    def test_unregistered_raises(self, spark):
        from unstructured_spark.functions import cleaners

        cleaners.set_translator(None)
        with pytest.raises(NotImplementedError, match="set_translator"):
            cleaners.translate_text(F.col("text"))

    def test_registered_runs_as_pandas_udf(self, spark):
        from unstructured_spark.functions import cleaners

        cleaners.set_translator(lambda texts, lang: [f"[{lang}] {t}" for t in texts])
        try:
            df = spark.createDataFrame([("hola",), ("bonjour",)], "text string")
            out = [
                r["t"]
                for r in df.select(
                    cleaners.translate_text(F.col("text"), "en").alias("t")
                ).collect()
            ]
        finally:
            cleaners.set_translator(None)
        assert out == ["[en] hola", "[en] bonjour"]
