"""<head> metadata extraction (parsers/page_meta.py +
operators/main_content.py extract_page_metadata)."""

from __future__ import annotations

from unstructured_spark.parsers.page_meta import page_metadata

PAGE = """<html lang="en-US"><head>
<title>  The   Page
Title </title>
<meta name="description" content="A &amp; B description.">
<meta name="robots" content="NoIndex, nofollow">
<link rel="stylesheet" href="/s.css">
<link rel="canonical" href="https://pub.example.com/article/1">
</head><body><title>Not this one</title></body></html>"""


class TestPageMetadata:
    def test_full_head(self):
        m = page_metadata(PAGE)
        assert m["title"] == "The Page Title"
        assert m["description"] == "A & B description."
        assert m["canonical_url"] == "https://pub.example.com/article/1"
        assert m["lang"] == "en-us"
        assert m["robots_meta"] == "noindex, nofollow"
        assert m["noindex"] is True

    def test_body_title_ignored(self):
        m = page_metadata("<html><body><title>body</title></body></html>")
        assert m["title"] is None

    def test_first_wins(self):
        m = page_metadata(
            '<head><title>one</title><title>two</title>'
            '<meta name="description" content="d1">'
            '<meta name="description" content="d2"></head>'
        )
        assert m["title"] == "one" and m["description"] == "d1"

    def test_missing_fields_none(self):
        m = page_metadata("<head></head><body>x</body>")
        assert m["title"] is None and m["canonical_url"] is None
        assert m["noindex"] is False

    def test_robots_none_directive(self):
        assert page_metadata(
            '<head><meta name="robots" content="none"></head>'
        )["noindex"] is True

    def test_rel_multi_token(self):
        m = page_metadata(
            '<head><link rel="alternate canonical" href="/c"></head>'
        )
        assert m["canonical_url"] == "/c"

    def test_empty_and_none(self):
        assert page_metadata("")["title"] is None
        assert page_metadata(None)["title"] is None


class TestSparkOperator:
    def test_extract(self, spark):
        from unstructured_spark.operators.main_content import (
            extract_page_metadata,
        )

        docs = spark.createDataFrame(
            [(1, PAGE), (2, "<p>no head</p>"), (3, None)],
            "doc_id long, text string",
        )
        rows = {r["doc_id"]: r for r in extract_page_metadata(docs).collect()}
        assert rows[1]["title"] == "The Page Title"
        assert rows[1]["noindex"] is True
        assert rows[2]["title"] is None and rows[2]["noindex"] is False
        assert rows[3]["title"] is None

    def test_map_only(self, spark):
        from unstructured_spark.operators.main_content import (
            extract_page_metadata,
        )

        docs = spark.createDataFrame([(1, "<head></head>")],
                                     "doc_id long, text string")
        plan = (extract_page_metadata(docs)
                ._jdf.queryExecution().executedPlan().toString())
        assert "Exchange" not in plan
