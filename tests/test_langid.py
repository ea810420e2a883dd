"""detect_languages contract (reference partition/common/lang.py:412-513)
plus goldens over the reference's multilingual example docs."""

import os

import pytest

from unstructured_spark.functions.langid import detect_languages

LANG_DOCS = "/root/reference/example-docs/language-docs"


class TestContract:
    def test_english_auto(self):
        assert detect_languages("This is a short sentence.") == ["eng"]

    def test_english_provided(self):
        assert detect_languages("This is another short sentence.", ["en"]) == ["eng"]

    def test_spelled_out_language(self):
        assert detect_languages(
            "Sample text longer than 5 words.", ["Spanish"]
        ) == ["spa"]

    def test_explicit_ignored_when_auto_present(self):
        assert detect_languages(
            "This is another short sentence.", ["en", "auto", "rus"]
        ) == ["eng"]

    def test_non_list_raises(self):
        with pytest.raises(TypeError):
            detect_languages("This is a short sentence.", languages="eng")

    def test_empty_text_returns_none(self):
        assert detect_languages("   ") is None

    def test_empty_first_language_skips(self):
        assert detect_languages("some text here", [""]) is None

    def test_short_fallback_none(self):
        assert detect_languages("Hi there.", language_fallback=lambda t: None) is None

    def test_short_fallback_custom(self):
        assert detect_languages(
            "Hi there.", language_fallback=lambda t: ["fra"]
        ) == ["fra"]

    def test_short_fallback_filters_invalid(self):
        assert detect_languages(
            "Hi there.", language_fallback=lambda t: ["xx_bogus", "fra"]
        ) == ["fra"]

    def test_short_fallback_keeps_codes_outside_profile_set(self):
        # valid ISO 639-3 codes beyond langdetect's 55 profiles pass
        assert detect_languages(
            "Hi there.", language_fallback=lambda t: ["yor"]
        ) == ["yor"]

    def test_short_default_eng(self):
        assert detect_languages("Hi there.") == ["eng"]

    def test_chinese_spelled_out_normalizes_zho(self):
        assert detect_languages("long enough text for explicit", ["Chinese"]) == ["zho"]


class TestScripts:
    def test_korean(self):
        assert detect_languages("안녕하세요 반갑습니다 오늘 날씨가 좋네요") == ["kor"]

    def test_chinese(self):
        assert detect_languages("人人生而自由，在尊严和权利上一律平等。") == ["zho"]

    def test_japanese_kana_beats_kanji(self):
        out = detect_languages("すべての人間は、生まれながらにして自由であり。")
        assert out[0] == "jpn" and "zho" not in out

    def test_russian(self):
        assert detect_languages(
            "Все люди рождаются свободными и равными в своем достоинстве"
        ) == ["rus"]

    def test_arabic(self):
        assert detect_languages("يولد جميع الناس أحرارا متساوين في الكرامة") == ["ara"]


@pytest.mark.skipif(
    not os.path.isdir(LANG_DOCS), reason="reference example-docs absent"
)
class TestExampleDocGoldens:
    """Labels the reference's langdetect run produces on its own
    language fixtures; the fallback detector must agree on these."""

    def _read(self, name):
        with open(os.path.join(LANG_DOCS, name), encoding="utf-8") as f:
            return f.read()

    def test_eng_spa(self):
        assert set(detect_languages(self._read("eng_spa.txt"))) == {"eng", "spa"}

    def test_eng_spa_mult(self):
        assert set(detect_languages(self._read("eng_spa_mult.txt"))) == {"eng", "spa"}

    def test_eng_afr_spa(self):
        got = detect_languages(self._read("eng_afr_spa.txt"))
        assert set(got) == {"eng", "afr", "spa"}

    def test_per_element_labels_match_reference_golden(self):
        # the reference's partition-level golden (test_auto.py:1049,
        # test_docx.py:451): partition eng_spa_mult + per-element
        # detection == [[eng], [spa, eng], [eng], [eng], [spa]] —
        # including langdetect's spa-first order on the mixed element
        from unstructured_spark.parsers.text_parser import text_to_elements

        els = text_to_elements(self._read("eng_spa_mult.txt"))
        langs = [detect_languages(e["text"]) for e in els]
        assert langs == [["eng"], ["spa", "eng"], ["eng"], ["eng"], ["spa"]]
