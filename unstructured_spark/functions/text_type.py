"""Classifier predicates (semantics of reference ``partition/text_type.py``).

Each predicate is a pyspark ``Column`` expression over a text column —
the Spark win over the reference's per-string Python functions is that
``element_from_text`` becomes ONE ``CASE WHEN`` over predicate columns
computed once, entirely inside whole-stage codegen.

Deviation from reference: the JVM-side ``contains_verb`` uses an
English function-word/suffix heuristic instead of a spaCy POS tagger
(model runtimes aren't available inside codegen); the reference treats
the tagger as a fallback signal only (text_type.py:27-88), and the
``sentence_count >= 2`` branch dominates in practice. The Python
mirror (``parsers/classify.py`` — the path the mapInPandas
partitioners actually run) offers reference-exact spaCy
``en_core_web_sm`` Penn tags via explicit registration
(``classify.enable_spacy_pos()`` / ``set_pos_tagger``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from unstructured_spark.functions import patterns

# Small high-frequency English verb/auxiliary set for the narrative
# heuristic (stands in for POS "VB*" tags, reference text_type.py:180-187).
_COMMON_VERBS = (
    "is are was were be been being am has have had do does did will would "
    "can could shall should may might must get got make made take took go "
    "went see saw said say use used need needs provide provides include "
    "includes require requires show shows contain contains"
).split()


def word_count(col: Column) -> Column:
    return F.size(F.split(F.trim(col), "\\s+"))


def sentence_count(col: Column, min_length: int | None = None) -> Column:
    """Count sentence-ish fragments; with ``min_length``, only fragments
    with at least that many words count (reference text_type.py:208-233).
    """
    # ASCII enders need a following space/EOS; CJK/Armenian/Arabic/
    # Devanagari/Ethiopic full stops end sentences with no space
    # (the reference's spaCy sentencizer recognizes these natively)
    parts = F.split(col, "[.!?] |[.!?]$|[。！？։؟۔।።]")
    parts = F.filter(parts, lambda p: F.trim(p) != "")
    if min_length:
        parts = F.filter(
            parts, lambda p: F.size(F.split(F.trim(p), "\\s+")) >= min_length
        )
    return F.size(parts)


def under_non_alpha_ratio(col: Column, threshold: float = 0.5) -> Column:
    """ACCEPT side of the reference's non-alpha gate: True when alpha
    chars / non-space chars >= ``threshold`` (reference
    text_type.py:270-303 returns True when the ratio is UNDER the
    threshold and callers reject on True; this column is the kept
    condition, so the threshold sense matches the reference for every
    value, not just the 0.5 default)."""
    non_space = F.length(F.regexp_replace(col, "\\s", ""))
    alpha = F.length(F.regexp_replace(col, "[^\\p{L}]", ""))
    return F.when(non_space == 0, F.lit(False)).otherwise(
        (alpha / non_space) >= F.lit(threshold)
    )


def exceeds_cap_ratio(col: Column, threshold: float = 0.5) -> Column:
    """True when the ratio of capitalized words exceeds ``threshold``
    (reference text_type.py:236-267, all three special cases): multi-
    sentence text is exempt (titles are single sentences), all-caps
    text always exceeds, and text with no alphabetic tokens exceeds
    (avoids misclassifying symbol runs as narrative). Capitalized =
    istitle-or-isupper over ALPHA-ONLY tokens."""
    multi = sentence_count(col, 3) > 1
    t = F.trim(col)
    all_caps = (t == F.upper(t)) & t.rlike("\\p{Lu}")
    tokens = F.filter(
        F.split(t, "\\s+"), lambda w: w.rlike("^\\p{L}+$")
    )
    caps = F.filter(
        tokens, lambda w: w.rlike("^\\p{Lu}(\\p{Ll}*|\\p{Lu}*)$")
    )
    return (
        F.when(multi, F.lit(False))
        .when(all_caps, F.lit(True))
        .when(F.size(tokens) == 0, F.lit(True))
        .otherwise((F.size(caps) / F.size(tokens)) > F.lit(threshold))
    )


def is_bulleted_text(col: Column) -> Column:
    """Leading unicode bullet (reference text_type.py:165-167)."""
    return col.rlike(patterns.BULLETED_TEXT)


def is_possible_numbered_list(col: Column) -> Column:
    return col.rlike(patterns.NUMBERED_LIST)


def is_email_address(col: Column) -> Column:
    return F.trim(col).rlike(f"^{patterns.EMAIL_ADDRESS}$")


def is_us_city_state_zip(col: Column) -> Column:
    return F.trim(col).rlike(f"^{patterns.US_CITY_STATE_ZIP}$")


def contains_us_phone_number(col: Column) -> Column:
    return col.rlike(patterns.US_PHONE)


def is_numeric(col: Column) -> Column:
    """Text that is entirely numbers/punct/space (reference: titles and
    narrative both reject pure-numeric strings, text_type.py:62,120)."""
    return F.trim(col).rlike("^[0-9.,$%() \\-]+$") & col.rlike("[0-9]")


def contains_verb(col: Column) -> Column:
    lowered = F.concat(F.lit(" "), F.lower(col), F.lit(" "))
    cond = F.lit(False)
    for v in _COMMON_VERBS:
        cond = cond | lowered.contains(f" {v} ")
    # gerund/past-tense suffix heuristic, minus the nominal/adjectival
    # false positives (must stay in lockstep with
    # parsers/classify._VERB_SUFFIX_FALSE_POSITIVES)
    from unstructured_spark.parsers.classify import _VERB_SUFFIX_FALSE_POSITIVES

    fp = "|".join(sorted(_VERB_SUFFIX_FALSE_POSITIVES))
    return cond | col.rlike(
        rf"(?i)\b(?!(?:{fp})\b)\p{{L}}{{3,}}(ing|ed)\b"
    )


def is_possible_narrative_text(
    col: Column,
    cap_threshold: float = 0.5,
    non_alpha_threshold: float = 0.5,
) -> Column:
    """Reference text_type.py:27-88: non-empty, not pure-numeric, cap
    ratio ≤ threshold (unless all-caps), alpha ratio ok, and (has verb or
    ≥2 sentences of ≥3 words).

    The reference's UNSTRUCTURED_NARRATIVE_TEXT_* env overrides
    (text_type.py:70-81) resolve here at expression-BUILD time — the
    Spark analogue of the reference's per-call read (a Column is built
    once on the driver, not per row).
    """
    import os

    cap_threshold = float(
        os.environ.get("UNSTRUCTURED_NARRATIVE_TEXT_CAP_THRESHOLD", cap_threshold)
    )
    non_alpha_threshold = float(
        os.environ.get(
            "UNSTRUCTURED_NARRATIVE_TEXT_NON_ALPHA_THRESHOLD", non_alpha_threshold
        )
    )
    text = F.trim(col)
    return (
        (F.length(text) > 0)
        & ~is_numeric(text)
        # exceeds_cap_ratio itself carries the reference's exemptions
        # (multi-sentence False, all-caps True) — no caller-side
        # all-caps bypass (reference :73-76 simply rejects on exceed)
        & ~exceeds_cap_ratio(text, cap_threshold)
        & under_non_alpha_ratio(text, non_alpha_threshold)
        & (contains_verb(text) | (sentence_count(text, 3) >= 2))
    )


def is_possible_title(
    col: Column,
    sentence_min_length: int = 5,
    title_max_word_length: int = 12,
    non_alpha_threshold: float = 0.5,
) -> Column:
    """Reference text_type.py:91-162: short (≤12 words), ≤1 real
    sentence, not pure numeric, doesn't end with a comma, alpha ratio ok.

    UNSTRUCTURED_TITLE_* env overrides (reference text_type.py:128-139)
    resolve at expression-build time, same convention as
    :func:`is_possible_narrative_text`.
    """
    import os

    title_max_word_length = int(
        os.environ.get("UNSTRUCTURED_TITLE_MAX_WORD_LENGTH", title_max_word_length)
    )
    non_alpha_threshold = float(
        os.environ.get("UNSTRUCTURED_TITLE_NON_ALPHA_THRESHOLD", non_alpha_threshold)
    )
    text = F.trim(col)
    all_caps = (text == F.upper(text)) & text.rlike("\\p{Lu}")
    ends_punct = text.rlike("[^\\w\\s]$")  # ENDS_IN_PUNCT, patterns.py:110
    return (
        (F.length(text) > 0)
        # all-caps ending in punctuation is a sentence shout, not a
        # title (reference text_type.py:125-126)
        & ~(all_caps & ends_punct)
        & (word_count(text) <= title_max_word_length)
        & (sentence_count(text, sentence_min_length) <= 1)
        & ~is_numeric(text)
        & under_non_alpha_ratio(text, non_alpha_threshold)
        & ~text.endswith(",")
    )


def element_type_from_text(col: Column) -> Column:
    """The ``element_from_text`` decision tree (reference
    partition/text.py:111-166) as a single CASE WHEN: bullet → email →
    US address → numbered list → narrative → title → Text. Empty text
    upstream becomes PageBreak/skip per partitioner.
    """
    text = F.trim(col)
    return (
        F.when(is_bulleted_text(text), F.lit("ListItem"))
        .when(is_email_address(text), F.lit("EmailAddress"))
        .when(is_us_city_state_zip(text), F.lit("Address"))
        .when(is_possible_numbered_list(text), F.lit("ListItem"))
        .when(is_possible_narrative_text(text), F.lit("NarrativeText"))
        .when(is_possible_title(text), F.lit("Title"))
        .otherwise(F.lit("Text"))
    )


def contains_english_word(col: Column) -> Column:
    """True when any whitespace token (lowercased, stripped to [a-z],
    len>1) is a common English word — the reference's language sanity
    check (text_type.py:190-207 over its nltk-derived word list; the
    vendored common-word list in functions/english_words.py serves as
    the word set, shared with the Python mirror in parsers/classify).

    Membership compiles to a Catalyst ``InSet`` hash probe (``isin``
    over a >2k literal set crosses the InSet conversion threshold), so
    the per-token cost is O(1) — a literal-array ``array_contains``
    would scan all ~2.4k entries per token."""
    from unstructured_spark.functions.english_words import ENGLISH_WORDS
    from unstructured_spark.operators.text_analysis import STOPWORDS

    words = sorted(ENGLISH_WORDS | set(STOPWORDS) | set(_COMMON_VERBS))
    # same split class as the Python mirror (parsers/classify.py):
    # dots/slashes/dashes separate crammed-together words ("1.A.RISKS",
    # "Big/Brown/Sheep" — reference test_text_type.py:190-215). Java's
    # \s is ASCII-only while Python's (the reference's) is
    # Unicode-aware, so the Unicode whitespace block is spelled out —
    # without it a text whose only English word borders a non-breaking
    # space passes the Python predicate but fails this one.
    toks = F.split(
        F.lower(F.trim(col)),
        "[\\s\\u001c-\\u001f\\u0085\\u00a0\\u1680\\u2000-\\u200a"
        "\\u2028\\u2029\\u202f\\u205f\\u3000\\-,.!?_/]+",
    )
    return F.exists(
        toks,
        lambda t: (F.length(F.regexp_replace(t, "[^a-z]", "")) > 1)
        & F.regexp_replace(t, "[^a-z]", "").isin(words),
    )
