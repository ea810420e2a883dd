"""Audio partitioning: WAV decode + energy-based segmentation, with a
pluggable speech-to-text agent.

The reference's ``partition_audio`` (partition/audio.py:26-112) emits
one NarrativeText per STT segment carrying
``segment_start_seconds``/``segment_end_seconds`` and
``detection_origin="speech_to_text"``, behind a pluggable
``SpeechToTextAgent`` (utils/speech_to_text/*.py, Whisper default).

The model can't ship in this container, but everything around it is
ordinary signal processing: PCM decode (stdlib ``wave``), RMS energy
framing, and silence-based segmentation — the same voice-activity
pre-chunking a batch STT pipeline performs before invoking the model.
So this module implements segmentation for real and keeps only the
transcription callable pluggable (``set_speech_to_text``); without an
agent the wav route raises the same named dependency gate as before.
"""

from __future__ import annotations

import io
import wave
from typing import Callable, Iterable

import numpy as np

# agent contract: (mono_float32_samples, sample_rate, language) -> iterable of
# {"text": str, "start": float, "end": float}
SpeechToText = Callable[[np.ndarray, int, "str | None"], Iterable[dict]]

_STT_AGENT: SpeechToText | None = None


def set_speech_to_text(agent: SpeechToText | None) -> None:
    """Register (or clear) the process-global speech-to-text agent —
    the executor-side analogue of the reference's
    ``SpeechToTextAgent.get_agent`` plug point."""
    global _STT_AGENT
    _STT_AGENT = agent


def get_speech_to_text() -> SpeechToText | None:
    return _STT_AGENT


# decoder contract: (container_bytes, format_hint) -> (rate, mono float32
# samples). The reference never decodes compressed audio itself — Whisper's
# ffmpeg does (reference partition/audio.py:36-43, "any format that ffmpeg
# supports") — so compressed formats here route through a registered
# decoder plug (model_adapters.FfmpegAudioDecoder is the stock one).
AudioDecoder = Callable[[bytes, str], tuple[int, np.ndarray]]

_AUDIO_DECODER: AudioDecoder | None = None


def set_audio_decoder(decoder: AudioDecoder | None) -> None:
    """Register (or clear) the process-global compressed-audio decoder
    used for non-WAV containers (mp3/mp4/...)."""
    global _AUDIO_DECODER
    _AUDIO_DECODER = decoder


def get_audio_decoder() -> AudioDecoder | None:
    return _AUDIO_DECODER


def decode_audio(content: bytes, fmt: str = "wav") -> tuple[int, np.ndarray]:
    """(rate, mono float32 samples) for any supported container: WAV
    decodes in-repo (stdlib ``wave``); compressed formats need the
    registered decoder and raise a named gate without one."""
    if fmt == "wav":
        return parse_wav(content)
    if _AUDIO_DECODER is None:
        from unstructured_spark.parsers.dispatch import UnsupportedFormatError

        raise UnsupportedFormatError(
            f"decoding {fmt} audio requires a registered audio decoder; "
            "register one with unstructured_spark.parsers.audio_parser."
            "set_audio_decoder (stock adapter: "
            "model_adapters.FfmpegAudioDecoder)"
        )
    return _AUDIO_DECODER(content, fmt)


def parse_wav(data: bytes) -> tuple[int, np.ndarray]:
    """PCM WAV → (sample_rate, mono float32 samples in [-1, 1])."""
    with wave.open(io.BytesIO(data), "rb") as w:
        rate = w.getframerate()
        nch = w.getnchannels()
        width = w.getsampwidth()
        frames = w.readframes(w.getnframes())
    if width == 2:
        arr = np.frombuffer(frames, dtype="<i2").astype(np.float32) / 32768.0
    elif width == 1:  # 8-bit WAV is unsigned
        arr = (np.frombuffer(frames, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    elif width == 4:
        arr = np.frombuffer(frames, dtype="<i4").astype(np.float32) / 2147483648.0
    else:
        raise ValueError(f"unsupported WAV sample width {width}")
    if nch > 1:
        arr = arr.reshape(-1, nch).mean(axis=1)
    return rate, arr


def energy_segments(
    samples: np.ndarray,
    rate: int,
    *,
    frame_ms: int = 30,
    threshold_db: float = -35.0,
    min_silence_ms: int = 300,
    min_segment_ms: int = 200,
) -> list[tuple[float, float, float]]:
    """Voice-activity segmentation by RMS energy: frames quieter than
    ``threshold_db`` relative to the clip's peak RMS count as silence;
    runs of silence >= ``min_silence_ms`` split segments; segments
    shorter than ``min_segment_ms`` are dropped.

    Returns (start_seconds, end_seconds, mean_rms_db) per segment.
    """
    if len(samples) == 0:
        return []
    frame = max(int(rate * frame_ms / 1000), 1)
    n_frames = len(samples) // frame
    if n_frames == 0:
        n_frames, frame = 1, len(samples)
    trimmed = samples[: n_frames * frame].reshape(n_frames, frame)
    rms = np.sqrt((trimmed.astype(np.float64) ** 2).mean(axis=1))
    peak = rms.max()
    if peak <= 0:
        return []
    db = 20.0 * np.log10(np.maximum(rms / peak, 1e-10))
    active = db > threshold_db
    min_silence_frames = max(int(min_silence_ms / frame_ms), 1)
    segments: list[tuple[int, int]] = []
    start = None
    silence_run = 0
    for i, a in enumerate(active):
        if a:
            if start is None:
                start = i
            silence_run = 0
        elif start is not None:
            silence_run += 1
            if silence_run >= min_silence_frames:
                segments.append((start, i - silence_run + 1))
                start, silence_run = None, 0
    if start is not None:
        end = n_frames
        while end > start and not active[end - 1]:
            end -= 1
        segments.append((start, end))
    out = []
    sec_per_frame = frame / rate
    min_len = min_segment_ms / 1000.0
    for s, e in segments:
        t0, t1 = s * sec_per_frame, e * sec_per_frame
        if t1 - t0 >= min_len:
            out.append((round(t0, 6), round(t1, 6), round(float(db[s:e].mean()), 3)))
    return out


def audio_to_elements(
    content: bytes,
    *,
    filename: str | None = None,
    language: str | None = None,
    audio_format: str = "wav",
    **_: object,
) -> list[dict]:
    """Audio bytes → NarrativeText elements, one per transcribed
    segment (reference partition/audio.py:96-112 shape: skip empty
    text, segment_start/end_seconds, detection_origin=speech_to_text).

    Requires a registered speech-to-text agent; the segmentation the
    agent receives is real (energy VAD over decoded PCM). WAV decodes
    in-repo; compressed containers (``audio_format='mp3'/'mp4'``)
    route through the :func:`set_audio_decoder` plug."""
    agent = _STT_AGENT
    if agent is None:
        from unstructured_spark.parsers.dispatch import UnsupportedFormatError

        raise UnsupportedFormatError(
            "partition of audio requires a speech-to-text model; register one "
            "with unstructured_spark.parsers.audio_parser.set_speech_to_text "
            "(reference default: Whisper)"
        )
    rate, samples = decode_audio(content, audio_format)
    elements: list[dict] = []
    for seg in agent(samples, rate, language):
        text = (seg.get("text") or "").strip()
        if not text:
            continue
        elements.append(
            {
                "type": "NarrativeText",
                "text": text,
                "segment_start_seconds": float(seg["start"]),
                "segment_end_seconds": float(seg["end"]),
                "metadata_json": '{"detection_origin": "speech_to_text"}',
            }
        )
    return elements


def vad_transcriber(transcribe_window: Callable[[np.ndarray, int], str]) -> SpeechToText:
    """Adapt a plain window-transcription function into a segment agent:
    energy-VAD the clip, call ``transcribe_window`` per segment."""

    def agent(samples: np.ndarray, rate: int, language: str | None = None):
        for t0, t1, _db in energy_segments(samples, rate):
            chunk = samples[int(t0 * rate) : int(t1 * rate)]
            yield {"text": transcribe_window(chunk, rate), "start": t0, "end": t1}

    return agent
