"""Contract tests for the import-gated model-runtime adapters (fakes
stand in for pytesseract / onnxruntime, which the container lacks)."""

import math

import numpy as np
import pytest

from unstructured_spark.parsers import model_adapters as ma


class _FakeOutput:
    DICT = "dict"


class _FakePytesseract:
    Output = _FakeOutput

    def __init__(self, data):
        self._data = data
        self.calls = []

    def image_to_data(self, arr, lang, output_type):
        self.calls.append((arr.shape, lang, output_type))
        return self._data


class TestTesseractOcrAgent:
    def test_word_boxes_to_agent_dicts(self):
        fake = _FakePytesseract(
            {
                "text": ["Hello", "  ", "world", ""],
                "left": [10, 0, 60, 0],
                "top": [20, 0, 20, 0],
                "width": [40, 5, 45, 0],
                "height": [12, 5, 12, 0],
                "conf": [96, -1, 90, -1],
            }
        )
        agent = ma.TesseractOcrAgent("deu", pytesseract=fake)
        arr = np.zeros((100, 200, 3), dtype=np.uint8)
        out = agent(arr, 200, 100)
        assert [d["text"] for d in out] == ["Hello", "world"]
        assert out[0] == {"text": "Hello", "x1": 10.0, "y1": 20.0, "x2": 50.0, "y2": 32.0}
        assert fake.calls[0] == ((100, 200, 3), "deu", "dict")

    def test_min_confidence_filter(self):
        fake = _FakePytesseract(
            {
                "text": ["lo", "hi"],
                "left": [0, 0],
                "top": [0, 0],
                "width": [10, 10],
                "height": [10, 10],
                "conf": [30, 95],
            }
        )
        agent = ma.TesseractOcrAgent(pytesseract=fake, min_confidence=50)
        assert [d["text"] for d in agent(np.zeros((8, 8, 3), np.uint8), 8, 8)] == ["hi"]

    def test_gated_without_pytesseract(self):
        import importlib.util

        if importlib.util.find_spec("pytesseract") is not None:
            pytest.skip("pytesseract installed")
        with pytest.raises(ImportError, match="pytesseract"):
            ma.TesseractOcrAgent()

    def test_register(self):
        from unstructured_spark.parsers import image_parser

        fake = _FakePytesseract({"text": [], "left": [], "top": [],
                                 "width": [], "height": [], "conf": []})
        agent = ma.TesseractOcrAgent(pytesseract=fake).register()
        try:
            assert image_parser._OCR_AGENT is agent
        finally:
            image_parser.set_ocr_agent(None)


class TestLetterbox:
    def test_ratio_and_padding(self):
        arr = np.full((50, 100, 3), 200, dtype=np.uint8)
        chw, r = ma.letterbox(arr, (64, 64))
        assert chw.shape == (1, 3, 64, 64)
        assert r == 64 / 100
        # resized content occupies the top rows, gray 114 pad below
        assert chw[0, 0, 0, 0] == 200.0
        assert chw[0, 0, 63, 63] == 114.0


class TestNms:
    def test_overlap_suppressed(self):
        boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], float)
        scores = np.array([0.9, 0.8, 0.7])
        assert ma.nms(boxes, scores, 0.45) == [0, 2]


class _FakeInput:
    name = "images"


class _FakeSession:
    """Raw YOLOX head for input 64x64, strides 8/16/32 → 84 anchors."""

    def __init__(self, raw):
        self._raw = raw
        self.feeds = []

    def get_inputs(self):
        return [_FakeInput()]

    def run(self, _outs, feeds):
        self.feeds.append(feeds)
        return [self._raw]


class TestOnnxLayoutModel:
    def _raw_one_box(self):
        raw = np.zeros((1, 84, 7), dtype=np.float32)
        # anchor 0: stride-8 grid cell (0,0); center=(4+0)*8=(32,16),
        # wh=(e^ln2*8, e^0*8)=(16,8); obj=1; class 0 scores 0.9
        raw[0, 0, :2] = (4.0, 2.0)
        raw[0, 0, 2:4] = (math.log(2.0), 0.0)
        raw[0, 0, 4] = 1.0
        raw[0, 0, 5] = 0.9
        raw[0, 0, 6] = 0.1
        return raw

    def test_decode_threshold_and_mapping(self):
        sess = _FakeSession(self._raw_one_box())
        model = ma.OnnxLayoutModel(session=sess, input_size=(64, 64))
        arr = np.zeros((64, 64, 3), dtype=np.uint8)
        [det] = model(arr, 64, 64)
        assert det["type"] == "Caption"  # DocLayNet label 0
        assert (det["x1"], det["y1"], det["x2"], det["y2"]) == (24.0, 12.0, 40.0, 20.0)
        assert abs(det["score"] - 0.9) < 1e-6
        assert "images" in sess.feeds[0]

    def test_score_threshold_drops_all(self):
        sess = _FakeSession(self._raw_one_box())
        model = ma.OnnxLayoutModel(
            session=sess, input_size=(64, 64), score_threshold=0.95
        )
        assert model(np.zeros((64, 64, 3), np.uint8), 64, 64) == []

    def test_ratio_rescales_to_original_pixels(self):
        sess = _FakeSession(self._raw_one_box())
        model = ma.OnnxLayoutModel(session=sess, input_size=(64, 64))
        # original image 128x128 → ratio 0.5 → boxes double back
        [det] = model(np.zeros((128, 128, 3), np.uint8), 128, 128)
        assert (det["x1"], det["y1"], det["x2"], det["y2"]) == (48.0, 24.0, 80.0, 40.0)

    def test_gated_without_onnxruntime(self):
        import importlib.util

        if importlib.util.find_spec("onnxruntime") is not None:
            pytest.skip("onnxruntime installed")
        with pytest.raises(ImportError, match="onnxruntime"):
            ma.OnnxLayoutModel("model.onnx")

    def test_register_and_pipeline(self):
        from unstructured_spark.parsers import image_parser

        sess = _FakeSession(self._raw_one_box())
        model = ma.OnnxLayoutModel(session=sess, input_size=(64, 64)).register()
        try:
            assert image_parser._LAYOUT_MODEL is model
            els = image_parser.elements_from_pixels(
                np.zeros((64, 64, 3), dtype=np.uint8), 64, 64
            )
            assert isinstance(els, list)
        finally:
            image_parser.set_layout_model(None)


class _FakeWhisperModel:
    def __init__(self):
        self.calls = []

    def transcribe(self, audio, **kw):
        self.calls.append((audio.shape, audio.dtype, kw))
        return {"segments": [
            {"start": 0.0, "end": 1.5, "text": " hello world "},
            {"start": 1.5, "end": 2.0, "text": ""},
        ]}


class TestWhisperSttAgent:
    def test_transcribe_contract(self):
        model = _FakeWhisperModel()
        agent = ma.WhisperSttAgent(model=model)
        pcm = (np.sin(np.linspace(0, 100, 8000)) * 1000).astype(np.int16)
        segs = list(agent(pcm, 8000, "en"))
        assert segs[0] == {"start": 0.0, "end": 1.5, "text": " hello world "}
        shape, dtype, kw = model.calls[0]
        # 8000 samples at 8kHz -> 16000 samples at 16kHz, float32, language passed
        assert shape == (16000,) and dtype == np.float32
        assert kw == {"language": "en"}

    def test_normalization_range(self):
        model = _FakeWhisperModel()
        agent = ma.WhisperSttAgent(model=model)
        pcm = np.full(16000, 16384, dtype=np.int16)
        list(agent(pcm, 16000, None))
        shape, dtype, kw = model.calls[0]
        assert shape == (16000,) and kw == {}

    def test_gated_without_whisper(self):
        import importlib.util

        if importlib.util.find_spec("whisper") is not None:
            pytest.skip("whisper installed")
        with pytest.raises(ImportError, match="whisper"):
            ma.WhisperSttAgent()

    def test_register_feeds_audio_parser(self):
        from unstructured_spark.parsers import audio_parser

        agent = ma.WhisperSttAgent(model=_FakeWhisperModel()).register()
        try:
            assert audio_parser._STT_AGENT is agent
        finally:
            audio_parser.set_speech_to_text(None)


class _FakeMarian:
    """loader() -> (model, tokenizer) fakes speaking the HF API shape."""

    class Tok:
        def __call__(self, texts, **kw):
            return {"inputs": texts}

        def decode(self, ids, **kw):
            return f"<{ids}>"

    class Model:
        def generate(self, inputs):
            return [f"T:{inputs[0]}"]

    def __init__(self):
        self.loaded = []

    def __call__(self, name):
        self.loaded.append(name)
        return (self.Model(), self.Tok())


class TestMarianTranslator:
    def test_translates_and_caches_model_pair(self):
        loader = _FakeMarian()
        tr = ma.MarianTranslator("de", loader=loader)
        out = tr(["hallo", "", "welt"], "en")
        assert out == ["<T:hallo>", "", "<T:welt>"]
        tr(["nochmal"], "en")
        assert loader.loaded == ["Helsinki-NLP/opus-mt-de-en"]  # cached

    def test_same_language_passthrough(self):
        tr = ma.MarianTranslator("en", loader=_FakeMarian())
        assert tr(["hello"], "en") == ["hello"]

    def test_chinese_normalization(self):
        loader = _FakeMarian()
        tr = ma.MarianTranslator("zh-cn", loader=loader)
        tr(["你好"], "en")
        assert loader.loaded == ["Helsinki-NLP/opus-mt-zh-en"]

    def test_register_wires_cleaners_plug(self):
        # executing the pandas UDF would ship this test module's fake
        # in the closure (executors can't import it); the Spark wiring
        # itself is covered by cleaners' own translate tests
        from unstructured_spark.functions import cleaners

        tr = ma.MarianTranslator("de", loader=_FakeMarian()).register()
        try:
            assert cleaners._TRANSLATOR is tr
            assert tr(["hallo"], "en") == ["<T:hallo>"]
        finally:
            cleaners.set_translator(None)


class TestDetrDecode:
    def test_softmax_threshold_and_box_scale(self):
        # 2 queries, 3 classes (last = no object)
        logits = np.zeros((1, 2, 3), dtype=np.float32)
        logits[0, 0] = [5.0, 0.0, 0.0]   # class 0, confident
        logits[0, 1] = [0.0, 0.0, 5.0]   # no object
        boxes = np.zeros((1, 2, 4), dtype=np.float32)
        boxes[0, 0] = [0.5, 0.5, 0.5, 0.25]  # center, half-size box
        dets = ma.detr_decode(logits, boxes, (200, 100))
        assert len(dets) == 1
        d = dets[0]
        assert d["label"] == 0
        assert (d["x1"], d["y1"], d["x2"], d["y2"]) == (50.0, 37.5, 150.0, 62.5)


class TestStructureToCells:
    def _grid(self):
        return [
            {"label": 2, "x1": 0, "y1": 0, "x2": 100, "y2": 20, "score": 1.0},
            {"label": 2, "x1": 0, "y1": 20, "x2": 100, "y2": 40, "score": 1.0},
            {"label": 1, "x1": 0, "y1": 0, "x2": 50, "y2": 40, "score": 1.0},
            {"label": 1, "x1": 50, "y1": 0, "x2": 100, "y2": 40, "score": 1.0},
            {"label": 3, "x1": 0, "y1": 0, "x2": 100, "y2": 20, "score": 1.0},
        ]

    def test_grid_with_header_and_tokens(self):
        tokens = [
            {"text": "A", "x1": 10, "y1": 5, "x2": 20, "y2": 15},
            {"text": "B", "x1": 60, "y1": 5, "x2": 70, "y2": 15},
            {"text": "c1", "x1": 10, "y1": 25, "x2": 20, "y2": 35},
            {"text": "c2a", "x1": 55, "y1": 25, "x2": 65, "y2": 35},
            {"text": "c2b", "x1": 70, "y1": 25, "x2": 80, "y2": 35},
        ]
        cells = ma.structure_to_cells(self._grid(), tokens)
        assert len(cells) == 4
        by_pos = {(c["row"], c["col"]): c for c in cells}
        assert by_pos[(0, 0)]["text"] == "A" and by_pos[(0, 0)]["is_header"]
        assert by_pos[(1, 1)]["text"] == "c2a c2b"
        assert not by_pos[(1, 0)]["is_header"]

    def test_cells_feed_html(self):
        from unstructured_spark.parsers.image_parser import cells_to_html

        cells = ma.structure_to_cells(
            self._grid(),
            [{"text": "A", "x1": 10, "y1": 5, "x2": 20, "y2": 15}],
        )
        html = cells_to_html(cells)
        assert html.startswith("<table><thead><tr><th>A</th>")


class _FakeTatrSession:
    def __init__(self):
        self.feeds = []

    def get_inputs(self):
        return [_FakeInput()]

    def run(self, _outs, feeds):
        self.feeds.append(feeds)
        # one row spanning the crop, one column, one header band
        logits = np.full((1, 3, 8), -10.0, dtype=np.float32)
        logits[0, 0, 2] = 10.0  # row
        logits[0, 1, 1] = 10.0  # column
        logits[0, 2, 3] = 10.0  # column header
        boxes = np.array(
            [[[0.5, 0.5, 1.0, 1.0],
              [0.5, 0.5, 1.0, 1.0],
              [0.5, 0.5, 1.0, 1.0]]],
            dtype=np.float32,
        )
        return [logits, boxes]


class TestTatrTableModel:
    def test_end_to_end_cells(self):
        sess = _FakeTatrSession()
        model = ma.TatrTableModel(session=sess, input_size=(64, 64))
        crop = np.zeros((40, 80, 3), dtype=np.uint8)
        tokens = [{"text": "x", "x1": 10, "y1": 10, "x2": 20, "y2": 20}]
        cells = model(crop, tokens)
        assert cells == [
            {"row": 0, "col": 0, "row_span": 1, "col_span": 1,
             "text": "x", "is_header": True}
        ]
        tensor = sess.feeds[0]["images"]
        assert tensor.shape == (1, 3, 64, 64)

    def test_gated_without_onnxruntime(self):
        import importlib.util

        if importlib.util.find_spec("onnxruntime") is not None:
            pytest.skip("onnxruntime installed")
        with pytest.raises(ImportError, match="onnxruntime"):
            ma.TatrTableModel("tatr.onnx")

    def test_register(self):
        from unstructured_spark.parsers import image_parser

        model = ma.TatrTableModel(session=_FakeTatrSession()).register()
        try:
            assert image_parser._TABLE_MODEL is model
        finally:
            image_parser.set_table_model(None)


class _FakePaddle:
    """Duck-typed PaddleOCR: .ocr(arr, cls=True) -> per-image nested
    line list [[quad, (text, conf)], ...]."""

    def __init__(self, result):
        self._result = result
        self.calls = []

    def ocr(self, arr, cls):
        self.calls.append((np.asarray(arr).shape, cls))
        return self._result


class TestPaddleOcrAgent:
    def test_quads_to_agent_boxes(self):
        # rotated quad -> axis-aligned min/max box; empty text dropped
        fake = _FakePaddle(
            [
                [
                    [
                        [[12.0, 31.0], [98.0, 28.0], [99.0, 52.0], [13.0, 55.0]],
                        ("Invoice", 0.98),
                    ],
                    [
                        [[0, 0], [5, 0], [5, 5], [0, 5]],
                        ("   ", 0.50),
                    ],
                    [
                        [[10, 80], [60, 80], [60, 95], [10, 95]],
                        ("Total", 0.91),
                    ],
                ]
            ]
        )
        agent = ma.PaddleOcrAgent(paddle_ocr=fake)
        out = agent(np.zeros((120, 200, 3), np.uint8), 200, 120)
        assert [d["text"] for d in out] == ["Invoice", "Total"]
        assert out[0] == {
            "text": "Invoice", "x1": 12.0, "y1": 28.0, "x2": 99.0, "y2": 55.0,
        }
        assert fake.calls == [((120, 200, 3), True)]

    def test_empty_page_result(self):
        # paddle returns [None] for a page with no text
        agent = ma.PaddleOcrAgent(paddle_ocr=_FakePaddle([None]))
        assert agent(np.zeros((10, 10, 3), np.uint8), 10, 10) == []

    def test_gated_without_paddle(self):
        import importlib.util

        if importlib.util.find_spec("paddleocr") is not None:
            pytest.skip("paddleocr installed")
        with pytest.raises(ImportError, match="paddleocr"):
            ma.PaddleOcrAgent()

    def test_register(self):
        from unstructured_spark.parsers import image_parser

        agent = ma.PaddleOcrAgent(paddle_ocr=_FakePaddle([])).register()
        try:
            assert image_parser._OCR_AGENT is agent
        finally:
            image_parser.set_ocr_agent(None)


class _Gv:
    """Tiny attribute bag for duck-typed Vision API response objects."""

    def __init__(self, **kw):
        self.__dict__.update(kw)


def _gv_symbol(ch, brk=None):
    return _Gv(text=ch, property=_Gv(detected_break=_Gv(type_=brk)))


def _gv_paragraph(words, box):
    return _Gv(
        words=words,
        bounding_box=_Gv(vertices=[_Gv(x=x, y=y) for x, y in box]),
    )


class _FakeVisionClient:
    def __init__(self, annotation):
        self._annotation = annotation
        self.calls = []

    def document_text_detection(self, **kwargs):
        self.calls.append(kwargs)
        return _Gv(full_text_annotation=self._annotation)


class TestGoogleVisionOcrAgent:
    def _annotation(self):
        para1 = _gv_paragraph(
            [
                _Gv(symbols=[_gv_symbol("H"), _gv_symbol("i", "SPACE")]),
                _Gv(
                    symbols=[
                        _gv_symbol("t"),
                        _gv_symbol("o"),
                        _gv_symbol("o", "LINE_BREAK"),
                    ]
                ),
            ],
            [(10, 20), (110, 20), (110, 44), (10, 44)],
        )
        # EOL_SURE_SPACE: space AND line flush
        para2 = _gv_paragraph(
            [
                _Gv(symbols=[_gv_symbol("a", "EOL_SURE_SPACE")]),
                _Gv(symbols=[_gv_symbol("b", "LINE_BREAK")]),
            ],
            [(10, 60), (50, 60), (50, 80), (10, 80)],
        )
        empty = _gv_paragraph(
            [_Gv(symbols=[_gv_symbol(" ", "LINE_BREAK")])],
            [(0, 0), (1, 0), (1, 1), (0, 1)],
        )
        return _Gv(
            pages=[_Gv(blocks=[_Gv(paragraphs=[para1, para2, empty])])]
        )

    def test_paragraph_regions_and_break_assembly(self):
        client = _FakeVisionClient(self._annotation())
        agent = ma.GoogleVisionOcrAgent(client=client)
        out = agent(np.zeros((100, 120, 3), np.uint8), 120, 100)
        assert [d["text"] for d in out] == ["Hi too", "a b"]
        assert out[0] == {
            "text": "Hi too", "x1": 10.0, "y1": 20.0, "x2": 110.0, "y2": 44.0,
        }
        # request carried a PNG payload, no language hint by default
        [call] = client.calls
        assert call["image"]["content"].startswith(b"\x89PNG")
        assert "image_context" not in call

    def test_language_hint_passed(self):
        client = _FakeVisionClient(_Gv(pages=[]))
        ma.GoogleVisionOcrAgent("de", client=client)(
            np.zeros((4, 4, 3), np.uint8), 4, 4
        )
        assert client.calls[0]["image_context"] == {"language_hints": ["de"]}

    def test_enum_valued_breaks(self):
        # real lib passes enum members; adapter reads .name
        class _Brk:
            def __init__(self, name):
                self.name = name

        para = _gv_paragraph(
            [
                _Gv(
                    symbols=[
                        _gv_symbol("x", _Brk("SPACE")),
                        _gv_symbol("y", _Brk("LINE_BREAK")),
                    ]
                )
            ],
            [(0, 0), (9, 0), (9, 9), (0, 9)],
        )
        client = _FakeVisionClient(
            _Gv(pages=[_Gv(blocks=[_Gv(paragraphs=[para])])])
        )
        out = ma.GoogleVisionOcrAgent(client=client)(
            np.zeros((4, 4, 3), np.uint8), 4, 4
        )
        assert [d["text"] for d in out] == ["x y"]

    def test_gated_without_google_vision(self):
        try:
            import google.cloud.vision  # noqa: F401

            pytest.skip("google-cloud-vision installed")
        except ImportError:
            pass
        with pytest.raises(ImportError, match="google-cloud-vision"):
            ma.GoogleVisionOcrAgent()

    def test_register(self):
        from unstructured_spark.parsers import image_parser

        agent = ma.GoogleVisionOcrAgent(
            client=_FakeVisionClient(_Gv(pages=[]))
        ).register()
        try:
            assert image_parser._OCR_AGENT is agent
        finally:
            image_parser.set_ocr_agent(None)


class _FakeBitmap:
    def __init__(self, arr):
        self._arr = arr

    def to_numpy(self):
        return self._arr


class _FakePdfiumPage:
    def __init__(self, scale_to_arr, rev_byteorder_supported=True):
        self._f = scale_to_arr
        self._rev_ok = rev_byteorder_supported

    def render(self, scale, **kw):
        if kw.get("rev_byteorder") and not self._rev_ok:
            raise TypeError("render() got an unexpected keyword argument")
        return _FakeBitmap(self._f(scale, bool(kw.get("rev_byteorder"))))


class _FakePdfiumDoc:
    closed = False

    def __init__(self, pages):
        self._pages = pages

    def __getitem__(self, i):
        return self._pages[i]

    def close(self):
        _FakePdfiumDoc.closed = True


class _FakePdfium:
    """Duck-typed pypdfium2: PdfDocument(bytes)[i].render(scale)."""

    def __init__(self, n_pages=2, rev_byteorder_supported=True):
        self.n = n_pages
        self.rev_ok = rev_byteorder_supported

    def PdfDocument(self, data):
        def mk(i):
            def arr(scale, rgb):
                w, h = int(612 * scale), int(792 * scale)
                a = np.zeros((h, w, 4), dtype=np.uint8)
                # asymmetric channels expose byte-order bugs:
                # red=10*(i+1), green=0, blue=99, alpha=255
                r, b = 10 * (i + 1), 99
                a[:, :, 0], a[:, :, 2] = (r, b) if rgb else (b, r)
                a[:, :, 3] = 255
                return a

            return _FakePdfiumPage(arr, self.rev_ok)

        return _FakePdfiumDoc([mk(i) for i in range(self.n)])


class TestPdfiumRasterizer:
    def test_render_scale_and_channel_handling(self):
        r = ma.PdfiumRasterizer(dpi=144, pdfium=_FakePdfium())
        arr, w, h = r(b"%PDF", 1)
        assert (w, h) == (1224, 1584)
        assert arr.shape == (1584, 1224, 3)  # alpha dropped
        # RGB contract: red sentinel in channel 0, blue 99 in channel 2
        assert (arr[0, 0, 0], arr[0, 0, 2]) == (20, 99)  # page 2
        assert _FakePdfiumDoc.closed

    def test_bgr_fallback_without_rev_byteorder(self):
        # old pypdfium2: render() lacks rev_byteorder -> adapter must
        # swap BGR back to RGB itself
        r = ma.PdfiumRasterizer(
            dpi=72, pdfium=_FakePdfium(rev_byteorder_supported=False)
        )
        arr, w, h = r(b"%PDF", 0)
        assert (arr[0, 0, 0], arr[0, 0, 2]) == (10, 99)

    def test_dpi_override(self):
        r = ma.PdfiumRasterizer(dpi=144, pdfium=_FakePdfium())
        _, w, h = r(b"%PDF", 0, dpi=72)
        assert (w, h) == (612, 792)

    def test_gated_without_pypdfium2(self):
        import importlib.util

        if importlib.util.find_spec("pypdfium2") is not None:
            pytest.skip("pypdfium2 installed")
        with pytest.raises(ImportError, match="pypdfium2"):
            ma.PdfiumRasterizer()

    def test_register(self):
        from unstructured_spark.parsers import pdf_raster

        r = ma.PdfiumRasterizer(pdfium=_FakePdfium()).register()
        try:
            assert pdf_raster.get_pdf_rasterizer() is r
        finally:
            pdf_raster.set_pdf_rasterizer(None)
