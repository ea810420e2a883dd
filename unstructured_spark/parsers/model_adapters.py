"""Import-gated adapters from real model runtimes to the hi_res plug
points.

The hi_res pipeline (``image_parser.py``, ``pdf_images.py``) consumes
two process-global callables:

    set_layout_model(fn)   # fn(rgb_ndarray, w, h) -> [{"type","x1","y1","x2","y2","score"}]
    set_ocr_agent(fn)      # fn(rgb_ndarray, w, h) -> [{"text","x1","y1","x2","y2"}]

This module supplies the glue a user with real weights/binaries needs
so they never write it themselves (the reference wires the same two
runtimes in ``unstructured_inference/models/yolox`` and
``partition/utils/ocr_models/tesseract_ocr.py``):

- ``TesseractOcrAgent`` — pytesseract ``image_to_data`` word boxes →
  OCR-agent dicts (the reference's parse_data keeps non-empty text and
  converts left/top/width/height to corner coords the same way).
- ``OnnxLayoutModel`` — an onnxruntime detector session with
  YOLOX-style decode (letterbox preprocess, grid/stride decode,
  class-score threshold, NMS) → layout-model dicts. The label map
  defaults to the 11-class DocLayNet set the reference's yolox layout
  model emits.

Neither runtime ships in this container: construction raises a NAMED
import gate (``doctor`` lists both), and every pixel-independent piece
(preprocess, decode, NMS, dict mapping) is covered by fake-backed
contract tests so pointing real weights at it is wiring, not work.
"""

from __future__ import annotations

from typing import Iterable, Mapping, Sequence

import numpy as np

# DocLayNet classes in the order the reference's yolox layout model
# predicts them (public label map).
YOLOX_LABEL_MAP: dict[int, str] = {
    0: "Caption",
    1: "Footnote",
    2: "Formula",
    3: "ListItem",
    4: "PageFooter",
    5: "PageHeader",
    6: "Picture",
    7: "SectionHeader",
    8: "Table",
    9: "Text",
    10: "Title",
}


# ---------------------------------------------------------------------------
# Tesseract OCR agent
# ---------------------------------------------------------------------------


class TesseractOcrAgent:
    """OCR agent backed by pytesseract's word-box TSV.

    ``fn(arr, w, h)`` returns one dict per non-empty word:
    left/top/width/height → (x1, y1, x2, y2), empty/whitespace text
    dropped — the reference's ``OCRAgentTesseract.parse_data`` mask
    (tesseract_ocr.py:198-241).
    """

    def __init__(
        self,
        language: str = "eng",
        *,
        min_confidence: float = 0.0,
        pytesseract=None,
    ):
        if pytesseract is None:
            try:
                import pytesseract  # type: ignore[no-redef]
            except ImportError as e:  # pragma: no cover - not in container
                raise ImportError(
                    "TesseractOcrAgent needs the optional 'pytesseract' package "
                    "(plus a tesseract binary); python -m unstructured_spark.doctor "
                    "lists this gate"
                ) from e
        self._pt = pytesseract
        self.language = language
        self.min_confidence = float(min_confidence)

    def __call__(self, arr, w: int, h: int) -> list[dict]:
        data: Mapping[str, Sequence] = self._pt.image_to_data(
            arr, lang=self.language, output_type=self._pt.Output.DICT
        )
        out: list[dict] = []
        for text, left, top, width, height, conf in zip(
            data["text"], data["left"], data["top"],
            data["width"], data["height"], data["conf"],
        ):
            text = str(text).strip()
            if not text or float(conf) < self.min_confidence:
                continue
            x1, y1 = float(left), float(top)
            out.append(
                {
                    "text": text,
                    "x1": x1,
                    "y1": y1,
                    "x2": x1 + float(width),
                    "y2": y1 + float(height),
                }
            )
        return out

    def register(self) -> "TesseractOcrAgent":
        from unstructured_spark.parsers.image_parser import set_ocr_agent

        set_ocr_agent(self)
        return self


# ---------------------------------------------------------------------------
# PaddleOCR agent
# ---------------------------------------------------------------------------


class PaddleOcrAgent:
    """OCR agent backed by PaddleOCR's line-quad output, completing the
    reference's three-agent OCR registry (tesseract/paddle/google-vision;
    reference ``ocr_models/paddle_ocr.py:19-146``).

    ``fn(arr, w, h)`` runs ``agent.ocr(arr, cls=True)`` and parses the
    nested per-image result — each line is ``[quad_points,
    (text, confidence)]`` — into axis-aligned boxes: x1/y1 = quad min,
    x2/y2 = quad max, empty/whitespace text dropped (the reference's
    ``parse_data`` loop). Line regions arrive unsorted (paddle is not
    reading-ordered); downstream xy-cut ordering handles that, matching
    the reference's ``is_text_sorted() == False`` contract.
    """

    def __init__(self, language: str = "en", *, paddle_ocr=None):
        if paddle_ocr is None:
            try:
                import paddle  # type: ignore
                from paddleocr import PaddleOCR  # type: ignore
            except ImportError as e:  # pragma: no cover - not in container
                raise ImportError(
                    "PaddleOcrAgent needs the optional 'paddleocr' + "
                    "'paddlepaddle' packages (or pass paddle_ocr=); python -m "
                    "unstructured_spark.doctor lists this gate"
                ) from e
            # C++-level signal handlers break executor shutdown
            # (reference paddle_ocr.py:30-34)
            paddle.disable_signal_handler()
            gpu = paddle.device.cuda.device_count() > 0
            try:
                paddle_ocr = PaddleOCR(
                    use_angle_cls=True, use_gpu=gpu, lang=language,
                    enable_mkldnn=True, show_log=False, rec_batch_num=1,
                )
            except AttributeError:  # MKL-DNN unsupported on this OS
                paddle_ocr = PaddleOCR(
                    use_angle_cls=True, use_gpu=gpu, lang=language,
                    enable_mkldnn=False, show_log=False, rec_batch_num=1,
                )
        self._agent = paddle_ocr
        self.language = language

    def __call__(self, arr, w: int, h: int) -> list[dict]:
        ocr_data = self._agent.ocr(np.asarray(arr), cls=True)
        out: list[dict] = []
        for res in ocr_data or []:
            if not res:
                continue
            for line in res:
                quad, payload = line[0], line[1]
                text = str(payload[0] or "").strip()
                if not text:
                    continue
                xs = [p[0] for p in quad]
                ys = [p[1] for p in quad]
                out.append(
                    {
                        "text": text,
                        "x1": float(min(xs)),
                        "y1": float(min(ys)),
                        "x2": float(max(xs)),
                        "y2": float(max(ys)),
                    }
                )
        return out

    def register(self) -> "PaddleOcrAgent":
        from unstructured_spark.parsers.image_parser import set_ocr_agent

        set_ocr_agent(self)
        return self


# ---------------------------------------------------------------------------
# Google Vision OCR agent
# ---------------------------------------------------------------------------


class GoogleVisionOcrAgent:
    """OCR agent backed by the Google Cloud Vision
    ``document_text_detection`` API (reference
    ``ocr_models/google_vision_ocr.py:19-116``).

    ``fn(arr, w, h)`` encodes the pixel array as PNG, calls the API,
    and walks ``full_text_annotation`` pages → blocks → paragraphs:
    one region per paragraph, box from bounding vertices 0 (top-left)
    and 2 (bottom-right), text assembled symbol-by-symbol honoring
    detected breaks (SPACE / EOL_SURE_SPACE append a space,
    EOL_SURE_SPACE / LINE_BREAK end the line) — the reference's
    ``_parse_regions`` + ``_get_text_from_paragraph``, with one
    deliberate difference: a trailing unflushed line is kept rather
    than dropped (real GCV paragraphs always terminate in LINE_BREAK,
    so outputs are identical on real responses; dropping text on
    nonconforming ones would be silent loss).

    ``client`` is injectable for tests and on-prem endpoints; without
    it the real ``ImageAnnotatorClient`` is constructed (optional
    ``api_endpoint`` mirrors GOOGLEVISION_API_ENDPOINT).
    """

    def __init__(
        self,
        language: str | None = None,
        *,
        client=None,
        api_endpoint: str | None = None,
    ):
        if client is None:
            try:
                from google.cloud.vision import ImageAnnotatorClient  # type: ignore
            except ImportError as e:  # pragma: no cover - not in container
                raise ImportError(
                    "GoogleVisionOcrAgent needs the optional "
                    "'google-cloud-vision' package (or pass client=); python "
                    "-m unstructured_spark.doctor lists this gate"
                ) from e
            opts = {"api_endpoint": api_endpoint} if api_endpoint else {}
            client = ImageAnnotatorClient(client_options=opts)
        self._client = client
        self.language = language

    def _annotate(self, arr):
        from unstructured_spark.parsers.image_codec import encode_png

        a = np.asarray(arr, dtype=np.uint8)
        if a.ndim == 2:
            a = a[:, :, None]
        png = encode_png(a.shape[1], a.shape[0], a.shape[2], a.tobytes())
        kwargs = {"image": {"content": png}}
        if self.language:
            kwargs["image_context"] = {"language_hints": [self.language]}
        response = self._client.document_text_detection(**kwargs)
        return response.full_text_annotation

    @staticmethod
    def _paragraph_text(paragraph) -> str:
        para = ""
        line = ""
        for word in paragraph.words:
            for symbol in word.symbols:
                line += symbol.text
                btype = getattr(
                    getattr(
                        getattr(symbol, "property", None),
                        "detected_break",
                        None,
                    ),
                    "type_",
                    None,
                )
                bname = getattr(btype, "name", btype)
                if bname in ("SPACE", "EOL_SURE_SPACE"):
                    line += " "
                if bname in ("EOL_SURE_SPACE", "LINE_BREAK"):
                    para += line
                    line = ""
        return para + line

    def __call__(self, arr, w: int, h: int) -> list[dict]:
        document = self._annotate(arr)
        out: list[dict] = []
        for page in document.pages:
            for block in page.blocks:
                for paragraph in block.paragraphs:
                    v = paragraph.bounding_box.vertices
                    text = self._paragraph_text(paragraph).strip()
                    if not text:
                        continue
                    out.append(
                        {
                            "text": text,
                            "x1": float(v[0].x),
                            "y1": float(v[0].y),
                            "x2": float(v[2].x),
                            "y2": float(v[2].y),
                        }
                    )
        return out

    def register(self) -> "GoogleVisionOcrAgent":
        from unstructured_spark.parsers.image_parser import set_ocr_agent

        set_ocr_agent(self)
        return self


# ---------------------------------------------------------------------------
# pdfium PDF rasterizer
# ---------------------------------------------------------------------------


class PdfiumRasterizer:
    """Real PDF page rasterizer backed by pypdfium2 — the plug that
    replaces the reference's poppler `pdf2image` call
    (reference pdf.py:1013-1045) for born-digital hi_res pixels and
    ocr_only glyphs. Register with
    ``parsers.pdf_raster.set_pdf_rasterizer`` (``.register()``).

    Contract: ``fn(pdf_bytes, page_index, dpi) -> (HxWx3 uint8 array,
    width_px, height_px)``. ``pdfium`` is injectable for tests; the
    real import is gated on the optional 'pypdfium2' package.
    """

    def __init__(self, dpi: int = 150, *, pdfium=None):
        if pdfium is None:
            try:
                import pypdfium2 as pdfium  # type: ignore
            except ImportError as e:  # pragma: no cover - not in container
                raise ImportError(
                    "PdfiumRasterizer needs the optional 'pypdfium2' package "
                    "(or pass pdfium=); python -m unstructured_spark.doctor "
                    "lists this gate"
                ) from e
        self._pdfium = pdfium
        self.dpi = int(dpi)

    def __call__(
        self, pdf_bytes: bytes, page_index: int, dpi: int | None = None
    ):
        from unstructured_spark.parsers.dispatch import MalformedDocumentError

        # pypdfium2 raises PdfiumError (a RuntimeError subclass) on
        # corrupt/undecodable input; surface that as the dispatcher's
        # one malformed-input type so on_error='skip' survives it
        # (r6 ADVICE — RuntimeError itself must NOT be whitelisted
        # globally, so the translation happens at this boundary).
        _pdfium_err = getattr(self._pdfium, "PdfiumError", ())
        try:
            doc = self._pdfium.PdfDocument(pdf_bytes)
        except _pdfium_err as e:
            raise MalformedDocumentError(f"pdfium open failed: {e}") from e
        try:
            page = doc[page_index]
            scale = (dpi or self.dpi) / 72.0
            try:
                # pdfium renders BGR(A) natively; rev_byteorder gives RGB
                bitmap = page.render(scale=scale, rev_byteorder=True)
                swapped = False
            except TypeError:  # older pypdfium2 without the kwarg
                bitmap = page.render(scale=scale)
                swapped = True
            arr = np.asarray(bitmap.to_numpy(), dtype=np.uint8)
        except _pdfium_err as e:
            raise MalformedDocumentError(f"pdfium render failed: {e}") from e
        finally:
            close = getattr(doc, "close", None)
            if close is not None:
                close()
        if arr.ndim == 2:
            arr = np.repeat(arr[:, :, None], 3, axis=2)
            swapped = False
        elif arr.shape[2] == 4:  # drop alpha
            arr = arr[:, :, :3]
        if swapped:
            arr = arr[:, :, ::-1]  # BGR → the contract's RGB
        h, w = arr.shape[:2]
        return np.ascontiguousarray(arr), int(w), int(h)

    def register(self) -> "PdfiumRasterizer":
        from unstructured_spark.parsers.pdf_raster import set_pdf_rasterizer

        set_pdf_rasterizer(self)
        return self


# ---------------------------------------------------------------------------
# ONNX layout model (YOLOX-style decode)
# ---------------------------------------------------------------------------


def letterbox(arr: np.ndarray, input_size: tuple[int, int]) -> tuple[np.ndarray, float]:
    """Resize-with-aspect onto a gray (114) canvas of ``input_size``
    (h, w) using pure-numpy nearest-neighbor; returns (chw float32
    tensor, ratio) — the standard YOLOX preprocess without cv2."""
    ih, iw = input_size
    h, w = arr.shape[:2]
    r = min(ih / h, iw / w)
    nh, nw = int(round(h * r)), int(round(w * r))
    rows = (np.arange(nh) / r).astype(np.int64).clip(0, h - 1)
    cols = (np.arange(nw) / r).astype(np.int64).clip(0, w - 1)
    resized = arr[rows][:, cols]
    canvas = np.full((ih, iw, 3), 114, dtype=np.uint8)
    canvas[:nh, :nw] = resized[..., :3]
    chw = canvas.transpose(2, 0, 1)[None].astype(np.float32)
    return chw, r


def yolox_decode(
    raw: np.ndarray, input_size: tuple[int, int], strides: Sequence[int] = (8, 16, 32)
) -> np.ndarray:
    """Grid/stride decode of raw YOLOX head output (1, N, 5+C):
    xy = (pred_xy + grid) * stride, wh = exp(pred_wh) * stride.
    Returns (N, 5+C) with xywh in input-image pixels."""
    ih, iw = input_size
    grids, expanded = [], []
    for s in strides:
        gy, gx = np.meshgrid(
            np.arange(ih // s), np.arange(iw // s), indexing="ij"
        )
        grid = np.stack((gx, gy), axis=2).reshape(-1, 2)
        grids.append(grid)
        expanded.append(np.full((grid.shape[0], 1), s))
    grid = np.concatenate(grids, axis=0)
    stride = np.concatenate(expanded, axis=0)
    out = raw[0].copy()
    out[:, :2] = (out[:, :2] + grid) * stride
    out[:, 2:4] = np.exp(out[:, 2:4]) * stride
    return out


def nms(boxes: np.ndarray, scores: np.ndarray, iou_threshold: float) -> list[int]:
    """Standard greedy IoU NMS over xyxy boxes; returns kept indices."""
    order = scores.argsort()[::-1]
    keep: list[int] = []
    while order.size:
        i = int(order[0])
        keep.append(i)
        if order.size == 1:
            break
        rest = order[1:]
        xx1 = np.maximum(boxes[i, 0], boxes[rest, 0])
        yy1 = np.maximum(boxes[i, 1], boxes[rest, 1])
        xx2 = np.minimum(boxes[i, 2], boxes[rest, 2])
        yy2 = np.minimum(boxes[i, 3], boxes[rest, 3])
        inter = np.maximum(xx2 - xx1, 0) * np.maximum(yy2 - yy1, 0)
        area_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        area_r = (boxes[rest, 2] - boxes[rest, 0]) * (boxes[rest, 3] - boxes[rest, 1])
        iou = inter / np.maximum(area_i + area_r - inter, 1e-9)
        order = rest[iou <= iou_threshold]
    return keep


class OnnxLayoutModel:
    """Layout detector backed by an onnxruntime session running a
    YOLOX-style model (raw head output, decode+NMS done here).

    ``fn(arr, w, h)`` returns [{"type","x1","y1","x2","y2","score"}]
    in ORIGINAL image pixels (letterbox ratio undone).
    """

    def __init__(
        self,
        model_path: str | None = None,
        *,
        label_map: Mapping[int, str] | None = None,
        input_size: tuple[int, int] = (1024, 768),
        score_threshold: float = 0.25,
        nms_threshold: float = 0.45,
        session=None,
    ):
        if session is None:
            try:
                import onnxruntime
            except ImportError as e:  # pragma: no cover - not in container
                raise ImportError(
                    "OnnxLayoutModel needs the optional 'onnxruntime' package "
                    "and a model file; python -m unstructured_spark.doctor "
                    "lists this gate"
                ) from e
            session = onnxruntime.InferenceSession(model_path)
        self._session = session
        self.label_map = dict(label_map or YOLOX_LABEL_MAP)
        self.input_size = input_size
        self.score_threshold = float(score_threshold)
        self.nms_threshold = float(nms_threshold)

    def __call__(self, arr, w: int, h: int) -> list[dict]:
        tensor, ratio = letterbox(np.asarray(arr), self.input_size)
        input_name = self._session.get_inputs()[0].name
        raw = self._session.run(None, {input_name: tensor})[0]
        pred = yolox_decode(raw, self.input_size)
        boxes_xywh, obj, cls = pred[:, :4], pred[:, 4], pred[:, 5:]
        scores = obj[:, None] * cls
        cls_id = scores.argmax(axis=1)
        score = scores[np.arange(len(cls_id)), cls_id]
        mask = score >= self.score_threshold
        if not mask.any():
            return []
        boxes_xywh, cls_id, score = boxes_xywh[mask], cls_id[mask], score[mask]
        xyxy = np.empty_like(boxes_xywh)
        xyxy[:, 0] = boxes_xywh[:, 0] - boxes_xywh[:, 2] / 2
        xyxy[:, 1] = boxes_xywh[:, 1] - boxes_xywh[:, 3] / 2
        xyxy[:, 2] = boxes_xywh[:, 0] + boxes_xywh[:, 2] / 2
        xyxy[:, 3] = boxes_xywh[:, 1] + boxes_xywh[:, 3] / 2
        xyxy /= ratio
        out: list[dict] = []
        # per-class NMS, deterministic order: score desc then box index
        for c in np.unique(cls_id):
            idx = np.where(cls_id == c)[0]
            for k in nms(xyxy[idx], score[idx], self.nms_threshold):
                i = idx[k]
                out.append(
                    {
                        "type": self.label_map.get(int(c), "UncategorizedText"),
                        "x1": float(np.clip(xyxy[i, 0], 0, w)),
                        "y1": float(np.clip(xyxy[i, 1], 0, h)),
                        "x2": float(np.clip(xyxy[i, 2], 0, w)),
                        "y2": float(np.clip(xyxy[i, 3], 0, h)),
                        "score": float(score[i]),
                    }
                )
        out.sort(key=lambda d: (-d["score"], d["x1"], d["y1"]))
        return out

    def register(self) -> "OnnxLayoutModel":
        from unstructured_spark.parsers.image_parser import set_layout_model

        set_layout_model(self)
        return self


# ---------------------------------------------------------------------------
# Whisper speech-to-text agent
# ---------------------------------------------------------------------------


class FfmpegAudioDecoder:
    """Compressed-audio decoder plug backed by the ffmpeg CLI — the
    same decode layer the reference reaches through Whisper
    (reference partition/audio.py:36-43: "any format that ffmpeg
    supports"). Decodes any container to mono float32 PCM via
    ``ffmpeg -i pipe:0 -f s16le -ac 1 pipe:1``.

    Contract: ``fn(container_bytes, format_hint) -> (rate, float32
    mono samples)``; register with
    ``audio_parser.set_audio_decoder(FfmpegAudioDecoder())``.
    ``runner`` is injectable for tests (called with the argv list and
    the input bytes, returns stdout bytes); the default requires the
    ffmpeg binary on PATH and raises a named gate without it.
    """

    def __init__(self, rate: int = 16000, *, runner=None):
        self.rate = int(rate)
        if runner is None:
            import shutil

            if shutil.which("ffmpeg") is None:
                raise ImportError(
                    "FfmpegAudioDecoder needs the ffmpeg binary on PATH "
                    "(or pass runner=); python -m unstructured_spark.doctor "
                    "lists this gate"
                )
            runner = self._run_ffmpeg
        self._runner = runner

    def _run_ffmpeg(self, argv: list[str], stdin: bytes) -> bytes:
        import subprocess

        proc = subprocess.run(
            argv, input=stdin, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE, check=False,
        )
        if proc.returncode != 0:
            from unstructured_spark.parsers.dispatch import MalformedDocumentError

            raise MalformedDocumentError(
                f"ffmpeg decode failed: {proc.stderr[-300:].decode(errors='replace')}"
            )
        return proc.stdout

    # containers whose demuxer needs seekable input: a non-faststart
    # mp4/mov (moov atom after mdat — the default for many encoders)
    # fails on pipe:0 with "moov atom not found", so these are spooled
    # to a temp file instead of piped
    _SEEKABLE_FORMATS = frozenset({"mp4", "mov", "m4a", "3gp", "3g2"})

    def __call__(self, content: bytes, fmt: str = "mp3"):
        out_args = [
            "-f", "s16le", "-acodec", "pcm_s16le",
            "-ac", "1", "-ar", str(self.rate), "pipe:1",
        ]
        if fmt in self._SEEKABLE_FORMATS:
            import os
            import tempfile

            fd, path = tempfile.mkstemp(suffix=f".{fmt}")
            try:
                with os.fdopen(fd, "wb") as f:
                    f.write(content)
                argv = [
                    "ffmpeg", "-hide_banner", "-loglevel", "error",
                    "-f", fmt, "-i", path, *out_args,
                ]
                raw = self._runner(argv, b"")
            finally:
                os.unlink(path)
        else:
            argv = [
                "ffmpeg", "-hide_banner", "-loglevel", "error",
                "-f", fmt, "-i", "pipe:0", *out_args,
            ]
            raw = self._runner(argv, content)
        samples = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
        return self.rate, samples

    def register(self) -> "FfmpegAudioDecoder":
        from unstructured_spark.parsers.audio_parser import set_audio_decoder

        set_audio_decoder(self)
        return self


class WhisperSttAgent:
    """Speech-to-text agent backed by an openai-whisper-shaped model
    (``model.transcribe(float32_mono_16k, language=..) ->
    {"segments": [{"start","end","text"}, ...]}`` — the public Whisper
    API; the reference's partition_audio wires the same runtime).

    ``fn(samples_int16, rate, language)`` converts PCM to the float32
    mono 16 kHz tensor Whisper expects (linear resample in numpy, no
    ffmpeg) and yields the segment dicts ``audio_parser`` consumes.
    """

    TARGET_RATE = 16_000

    def __init__(self, model_name: str = "base", *, model=None):
        if model is None:
            try:
                import whisper  # type: ignore
            except ImportError as e:  # pragma: no cover - not in container
                raise ImportError(
                    "WhisperSttAgent needs the optional 'openai-whisper' "
                    "package (or pass model=); python -m "
                    "unstructured_spark.doctor lists this gate"
                ) from e
            model = whisper.load_model(model_name)
        self._model = model

    def _prepare(self, samples: np.ndarray, rate: int) -> np.ndarray:
        x = np.asarray(samples, dtype=np.float32)
        if x.ndim > 1:  # downmix channels
            x = x.mean(axis=1)
        x = x / 32768.0
        if rate != self.TARGET_RATE and len(x) > 1:
            n_out = int(round(len(x) * self.TARGET_RATE / rate))
            pos = np.linspace(0.0, len(x) - 1.0, max(n_out, 1))
            lo = np.floor(pos).astype(np.int64)
            hi = np.minimum(lo + 1, len(x) - 1)
            frac = (pos - lo).astype(np.float32)
            x = x[lo] * (1.0 - frac) + x[hi] * frac
        return x

    def __call__(self, samples, rate: int, language=None):
        audio = self._prepare(samples, rate)
        kwargs = {}
        if language:
            kwargs["language"] = language
        result = self._model.transcribe(audio, **kwargs)
        for seg in result.get("segments", []):
            yield {
                "start": float(seg["start"]),
                "end": float(seg["end"]),
                "text": str(seg.get("text", "")),
            }

    def register(self) -> "WhisperSttAgent":
        from unstructured_spark.parsers.audio_parser import set_speech_to_text

        set_speech_to_text(self)
        return self


# ---------------------------------------------------------------------------
# MarianMT (opus-mt) translator
# ---------------------------------------------------------------------------


class MarianTranslator:
    """Batch translator backed by Helsinki-NLP opus-mt MarianMT models
    — the runtime the reference's ``translate_text`` wires
    (``cleaners/translate.py:24-75``: model name
    ``Helsinki-NLP/opus-mt-{src}-{tgt}``, Chinese variants normalized
    to ``zh``).

    Conforms to the ``cleaners.set_translator`` contract
    ``fn(texts, target_lang) -> texts``. Models/tokenizers load lazily
    per (src, tgt) pair and are cached per process; ``source_lang``
    fixes the source (default assumes the reference's auto-detect
    happened upstream — pass the detected code).
    """

    def __init__(self, source_lang: str = "en", *, loader=None):
        if loader is None:
            try:
                from transformers import MarianMTModel, MarianTokenizer
            except ImportError as e:  # pragma: no cover - not in container
                raise ImportError(
                    "MarianTranslator needs the optional 'transformers' "
                    "package (plus opus-mt weights); python -m "
                    "unstructured_spark.doctor lists this gate"
                ) from e

            def loader(model_name):
                return (
                    MarianMTModel.from_pretrained(model_name),
                    MarianTokenizer.from_pretrained(model_name),
                )

        self._loader = loader
        self._cache: dict[str, tuple] = {}
        self.source_lang = self._normalize(source_lang)

    @staticmethod
    def _normalize(lang: str) -> str:
        lang = lang.lower()
        return "zh" if lang.startswith("zh") else lang

    @staticmethod
    def model_name(src: str, tgt: str) -> str:
        return f"Helsinki-NLP/opus-mt-{src}-{tgt}"

    def _pair(self, src: str, tgt: str):
        name = self.model_name(src, tgt)
        if name not in self._cache:
            self._cache[name] = self._loader(name)
        return self._cache[name]

    def __call__(self, texts, target_lang: str):
        tgt = self._normalize(target_lang)
        src = self.source_lang
        if src == tgt:
            return list(texts)
        model, tokenizer = self._pair(src, tgt)
        out = []
        for text in texts:
            if not str(text).strip():
                out.append(text)
                continue
            batch = tokenizer([str(text)], return_tensors="pt", truncation=True)
            ids = model.generate(**batch)
            out.append(
                tokenizer.decode(ids[0], skip_special_tokens=True)
            )
        return out

    def register(self) -> "MarianTranslator":
        from unstructured_spark.functions.cleaners import set_translator

        set_translator(self)
        return self


# ---------------------------------------------------------------------------
# TATR table-structure model (DETR-style decode → cells)
# ---------------------------------------------------------------------------

# Table-transformer structure classes (public TATR label set).
TATR_LABELS = {
    0: "table",
    1: "column",
    2: "row",
    3: "column header",
    4: "projected row header",
    5: "spanning cell",
    6: "no object",
}


def detr_decode(
    logits: np.ndarray, pred_boxes: np.ndarray, size: tuple[int, int],
    threshold: float = 0.5,
) -> list[dict]:
    """DETR head decode: per query, softmax over classes, keep
    non-'no object' detections above threshold; cxcywh (normalized)
    boxes → absolute xyxy. logits (1, Q, C); pred_boxes (1, Q, 4)."""
    w, h = size
    z = logits[0] - logits[0].max(axis=1, keepdims=True)
    e = np.exp(z)
    probs = e / e.sum(axis=1, keepdims=True)
    labels = probs.argmax(axis=1)
    scores = probs[np.arange(len(labels)), labels]
    out = []
    no_obj = logits.shape[2] - 1
    for q in range(len(labels)):
        if labels[q] == no_obj or scores[q] < threshold:
            continue
        cx, cy, bw, bh = pred_boxes[0, q]
        out.append(
            {
                "label": int(labels[q]),
                "score": float(scores[q]),
                "x1": float((cx - bw / 2) * w),
                "y1": float((cy - bh / 2) * h),
                "x2": float((cx + bw / 2) * w),
                "y2": float((cy + bh / 2) * h),
            }
        )
    return out


def structure_to_cells(detections: list[dict], tokens: list[dict]) -> list[dict]:
    """Rows × columns → cell grid; token text assigned by center
    containment; leading rows covered by a 'column header' region are
    header cells. The standard TATR postprocess reduced to its
    deterministic core (no iterative box refinement)."""
    rows = sorted(
        (d for d in detections if TATR_LABELS.get(d["label"]) == "row"),
        key=lambda d: d["y1"],
    )
    cols = sorted(
        (d for d in detections if TATR_LABELS.get(d["label"]) == "column"),
        key=lambda d: d["x1"],
    )
    headers = [
        d for d in detections if TATR_LABELS.get(d["label"]) == "column header"
    ]
    cells = []
    for ri, row in enumerate(rows):
        row_cy = (row["y1"] + row["y2"]) / 2
        is_header = any(hd["y1"] <= row_cy <= hd["y2"] for hd in headers)
        for ci, col in enumerate(cols):
            x1, x2 = col["x1"], col["x2"]
            y1, y2 = row["y1"], row["y2"]
            texts = [
                t["text"]
                for t in tokens
                if x1 <= (t["x1"] + t["x2"]) / 2 <= x2
                and y1 <= (t["y1"] + t["y2"]) / 2 <= y2
            ]
            cells.append(
                {
                    "row": ri,
                    "col": ci,
                    "row_span": 1,
                    "col_span": 1,
                    "text": " ".join(texts),
                    "is_header": is_header,
                }
            )
    return cells


class TatrTableModel:
    """Table-structure model backed by an onnxruntime session running a
    table-transformer (TATR) structure checkpoint: DETR decode →
    row/column grid → cells, conforming to the
    ``image_parser.set_table_model`` contract
    ``fn(crop_rgb, tokens) -> cells``."""

    def __init__(
        self,
        model_path: str | None = None,
        *,
        input_size: tuple[int, int] = (800, 800),
        score_threshold: float = 0.5,
        session=None,
    ):
        if session is None:
            try:
                import onnxruntime
            except ImportError as e:  # pragma: no cover - not in container
                raise ImportError(
                    "TatrTableModel needs the optional 'onnxruntime' package "
                    "and a table-transformer model file; python -m "
                    "unstructured_spark.doctor lists this gate"
                ) from e
            session = onnxruntime.InferenceSession(model_path)
        self._session = session
        self.input_size = input_size
        self.score_threshold = float(score_threshold)

    def __call__(self, crop, tokens: list[dict]) -> list[dict]:
        arr = np.asarray(crop)
        h, w = arr.shape[:2]
        ih, iw = self.input_size
        rows = (np.arange(ih) * h // ih).clip(0, h - 1)
        cols = (np.arange(iw) * w // iw).clip(0, w - 1)
        resized = arr[rows][:, cols][..., :3].astype(np.float32) / 255.0
        # ImageNet normalization (TATR preprocessing)
        mean = np.array([0.485, 0.456, 0.406], dtype=np.float32)
        std = np.array([0.229, 0.224, 0.225], dtype=np.float32)
        tensor = ((resized - mean) / std).transpose(2, 0, 1)[None]
        input_name = self._session.get_inputs()[0].name
        logits, boxes = self._session.run(None, {input_name: tensor})[:2]
        dets = detr_decode(
            logits, boxes, (w, h), threshold=self.score_threshold
        )
        return structure_to_cells(dets, tokens)

    def register(self) -> "TatrTableModel":
        from unstructured_spark.parsers.image_parser import set_table_model

        set_table_model(self)
        return self
