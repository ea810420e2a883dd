"""Gopher/C4 training-data quality filters (operators/quality_filters.py)."""

import pytest
from pyspark.sql import functions as F

from unstructured_spark.operators.quality_filters import (
    c4_clean_lines,
    c4_doc_keep_expr,
    c4_line_keep_expr,
    gopher_keep_expr,
    gopher_quality,
    line_repetition_exprs,
    ngram_repetition,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # d1: every line unique
        ("d1", "alpha beta gamma.\ndelta epsilon zeta.\nnothing repeats here."),
        # d2: one line repeated 3x of 4 lines (12 of 16 words)
        ("d2", "spam spam spam line.\nspam spam spam line.\nspam spam spam line.\nunique tail line here."),
        # d3: paragraph repetition (2 identical paragraphs of 3)
        ("d3", "para one text.\n\npara one text.\n\ndifferent paragraph."),
        # d4: empty-ish
        ("d4", "   "),
    ]
    return spark.createDataFrame(rows, "doc_id string, text string")


class TestLineRepetition:
    def test_dup_line_frac(self, docs):
        out = {
            r["doc_id"]: r
            for r in docs.select(
                "doc_id", *[c.alias(n) for n, c in line_repetition_exprs().items()]
            ).collect()
        }
        assert out["d1"]["dup_line_frac"] == 0.0
        assert out["d2"]["dup_line_frac"] == pytest.approx(0.5)  # 4 lines, 2 distinct
        assert out["d2"]["line_count"] == 4
        assert out["d4"]["line_count"] == 0
        assert out["d4"]["dup_line_frac"] == 0.0

    def test_dup_line_char_frac(self, docs):
        r = (
            docs.filter(F.col("doc_id") == "d2")
            .select(*[c.alias(n) for n, c in line_repetition_exprs().items()])
            .first()
        )
        # 3x "spam spam spam line." (20 ch) + 1x 22 ch: dups = 40 of 82
        assert r["dup_line_char_frac"] == pytest.approx(40 / 82)

    def test_dup_para_frac(self, docs):
        r = (
            docs.filter(F.col("doc_id") == "d3")
            .select(*[c.alias(n) for n, c in line_repetition_exprs().items()])
            .first()
        )
        assert r["dup_para_frac"] == pytest.approx(1 / 3)
        assert r["dup_para_char_frac"] == pytest.approx(14 / 48)


class TestGopherQuality:
    def test_keep_rule_thresholds(self, spark):
        good = "the cat and the dog " * 20  # 100 words, stopwords present
        short = "the cat sat"  # too few words
        symbols = ("the and word " * 20) + "#" * 30  # symbol ratio too high
        df = spark.createDataFrame(
            [("good", good), ("short", short), ("symbols", symbols)],
            "doc_id string, text string",
        )
        out = {r["doc_id"]: r["gopher_keep"] for r in gopher_quality(df).collect()}
        assert out == {"good": True, "short": False, "symbols": False}

    def test_stat_values(self, spark):
        df = spark.createDataFrame(
            [("d", "- bullet one\n- bullet two\nplain line ending...")],
            "doc_id string, text string",
        )
        r = gopher_quality(df).first()
        assert r["bullet_line_frac"] == pytest.approx(2 / 3)
        assert r["ellipsis_line_frac"] == pytest.approx(1 / 3)
        assert r["word_count"] == 9
        assert r["stopword_count"] == 0

    def test_keep_expr_configurable(self, spark):
        df = spark.createDataFrame([("d", "tiny doc that is real text.")], "doc_id string, text string")
        stats = gopher_quality(df).drop("gopher_keep")
        relaxed = stats.withColumn(
            "keep", gopher_keep_expr(min_words=3, min_stopwords=0, min_mean_word_len=2.0)
        ).first()
        assert relaxed["keep"] is True


class TestNgramRepetition:
    def test_repeated_phrase_dominates(self, spark):
        text = "one two three four five " * 10
        df = spark.createDataFrame([("d", text)], "doc_id string, text string")
        r = ngram_repetition(df, ns=(2, 5)).first()
        # every 2-gram occurs >= 9 times in a cyclic repeat
        assert r["dup_2gram_frac"] == 1.0
        assert r["dup_5gram_frac"] == 1.0
        assert r["top_5gram_char_frac"] > 0.15

    def test_unique_text_no_dups(self, spark):
        df = spark.createDataFrame(
            [("d", "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10")], "doc_id string, text string"
        )
        r = ngram_repetition(df, ns=(2, 5)).first()
        assert r["dup_2gram_frac"] == 0.0
        assert r["dup_5gram_frac"] == 0.0

    def test_short_doc_missing_n(self, spark):
        df = spark.createDataFrame([("d", "a b c")], "doc_id string, text string")
        r = ngram_repetition(df, ns=(2, 5)).first()
        assert r["dup_2gram_frac"] == 0.0
        assert r["dup_5gram_frac"] is None  # fewer than 5 words -> no 5-grams


class TestC4:
    def test_line_keep(self, spark):
        lines = [
            ("keeps terminal punctuation.", True),
            ("no terminal punctuation", False),
            ("Short.", False),  # < 3 words
            ('ends with a quote."', True),
        ]
        df = spark.createDataFrame(lines, "line string, expect boolean")
        got = df.select("expect", c4_line_keep_expr(F.col("line")).alias("keep")).collect()
        assert all(r["keep"] == r["expect"] for r in got)

    def test_doc_keep(self, spark):
        docs = [
            ("ok", "One real sentence. Two real sentences. Three. Four. Five here.", True),
            ("lorem", "Lorem ipsum dolor sit amet. More. And. More. Sentences.", False),
            ("code", "if (x) { return. } More. Sentences. Here. Now.", False),
            ("short", "Only one sentence here.", False),
        ]
        df = spark.createDataFrame(docs, "doc_id string, text string, expect boolean")
        got = df.select("expect", c4_doc_keep_expr().alias("keep")).collect()
        assert all(r["keep"] == r["expect"] for r in got)

    def test_clean_lines_rewrites_doc(self, spark):
        df = spark.createDataFrame(
            [("d", "This line stays intact.\nmenu link\nAnother keeper line here.")],
            "doc_id string, text string",
        )
        out = c4_clean_lines(df).first()["text"]
        assert out == "This line stays intact.\nAnother keeper line here."
