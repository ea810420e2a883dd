"""Main-content extraction (boilerplate removal): block segmentation,
integer classification, neighbor smoothing, and the Spark operator —
including a hand-labeled realistic page golden."""

from __future__ import annotations

from unstructured_spark.parsers.main_content import (
    classify_blocks,
    main_content,
    segment_blocks,
)

LONG = (
    "This paragraph carries enough normalized characters to clear the"
    " short-block threshold on its own merit."
)

# hand-labeled page: expected good blocks marked [KEEP]
PAGE = f"""
<html><head><title>Ignored</title>
<style>p {{ color: red }}</style>
<script>var nav = "fake";</script>
</head><body>
<header><div class="logo">SiteName</div>
  <nav><ul><li><a href="/">Home</a></li><li><a href="/a">About</a></li></ul></nav>
</header>
<div class="breadcrumbs"><a href="/">Home</a> &gt; <a href="/blog">Blog</a> &gt; Post</div>
<main>
  <h1>The Article Headline</h1>                      <!-- [KEEP] short heading, next good -->
  <p>Posted on 2024-01-01</p>                        <!-- short, nearest decided prev = breadcrumbs (bad) -> dropped -->
  <p>{LONG}</p>                                      <!-- [KEEP] long -->
  <p>Short middle note.</p>                          <!-- [KEEP] short, both neighbors good -->
  <p>{LONG} It even runs a little longer again.</p>  <!-- [KEEP] long -->
  <div class="social-share"><a href="#t">Tweet</a> <a href="#f">Share</a></div>
  <p>See <a href="/x">this link</a> and <a href="/y">that other much longer link text</a> here.</p>
                                                     <!-- link density > 33% -> bad -->
</main>
<aside class="sidebar"><h3>Related</h3>
  <ul><li><a href="/p1">Another post</a></li><li><a href="/p2">More reading</a></li></ul>
</aside>
<div class="cookie-banner">We use cookies. <a href="/privacy">Learn more</a></div>
<footer><p>&copy; 2024 SiteName. All rights reserved.</p></footer>
</body></html>
"""


class TestSegmentation:
    def test_skip_tags_invisible(self):
        texts = [b["text"] for b in segment_blocks(PAGE)]
        assert not any("color: red" in t for t in texts)
        assert not any("fake" in t for t in texts)
        assert not any("Ignored" in t for t in texts)

    def test_charref_unescaped(self):
        blocks = segment_blocks("<p>a &amp; b &lt;c&gt;</p>")
        assert blocks[0]["text"] == "a & b <c>"

    def test_whitespace_normalized(self):
        blocks = segment_blocks("<p>  a\n\t b\r\n c  </p>")
        assert blocks[0]["text"] == "a b c"
        assert blocks[0]["chars"] == 5

    def test_link_chars(self):
        blocks = segment_blocks('<p>pre <a href="#">link text</a> post</p>')
        b = blocks[0]
        assert b["text"] == "pre link text post"
        assert b["link_chars"] == len("link text")

    def test_hint_inherits_to_subtree(self):
        blocks = segment_blocks(
            '<nav><div><p>Deep nav text</p></div></nav><p>Body</p>'
        )
        assert [b["hint"] for b in blocks] == [True, False]

    def test_empty_blocks_not_emitted(self):
        assert segment_blocks("<p></p><div>  </div><p>x</p>") == [
            {
                "seq": 0, "tag": "p", "text": "x", "chars": 1,
                "link_chars": 0, "hint": False, "heading": False,
            }
        ]

    def test_unclosed_tags_tolerated(self):
        blocks = segment_blocks("<div><p>one<p>two</div>")
        assert [b["text"] for b in blocks] == ["one", "two"]

    def test_br_is_space(self):
        blocks = segment_blocks("<p>a<br>b</p>")
        assert blocks[0]["text"] == "a b"


class TestClassification:
    def test_link_density_integer_boundary(self):
        # exactly 33%: 100*33 > 33*100 is false -> not bad by density
        b = [{"seq": 0, "tag": "p", "text": "x" * 100, "chars": 100,
              "link_chars": 33, "hint": False, "heading": False}]
        assert classify_blocks(list(b))[0]["cls"] == "good"
        b[0]["link_chars"] = 34
        assert classify_blocks(list(b))[0]["cls"] == "bad"

    def test_heading_promoted_by_next_good(self):
        html = f"<h2>Title</h2><p>{LONG}</p>"
        out = classify_blocks(segment_blocks(html))
        assert [b["cls"] for b in out] == ["good", "good"]

    def test_heading_not_promoted_without_good(self):
        out = classify_blocks(segment_blocks("<h2>Title</h2><p>tiny</p>"))
        assert [b["cls"] for b in out] == ["bad", "bad"]

    def test_short_between_goods_kept(self):
        html = f"<p>{LONG}</p><p>middle</p><p>{LONG}</p>"
        assert [b["cls"] for b in classify_blocks(segment_blocks(html))] == [
            "good", "good", "good"
        ]

    def test_short_at_page_edge_bad(self):
        html = f"<p>lede</p><p>{LONG}</p><p>outro</p>"
        assert [b["cls"] for b in classify_blocks(segment_blocks(html))] == [
            "bad", "good", "bad"
        ]


class TestGoldenPage:
    def test_hand_labeled_page(self):
        got = main_content(PAGE)
        paras = got.split("\n\n")
        assert paras[0] == "The Article Headline"
        assert paras[1] == LONG
        assert paras[2] == "Short middle note."
        assert paras[3] == f"{LONG} It even runs a little longer again."
        assert len(paras) == 4
        # metadata line: nearest decided predecessor is chrome -> dropped
        assert "Posted on" not in got
        # all chrome gone
        for junk in ("Home", "Tweet", "cookies", "Related",
                     "All rights reserved", "this link"):
            assert junk not in got

    def test_block_audit_labels(self):
        out = classify_blocks(segment_blocks(PAGE))
        by_text = {b["text"]: b for b in out}
        assert by_text["SiteName"]["hint"] is True           # header
        assert by_text["We use cookies. Learn more"]["hint"] is True
        link_para = next(t for t in by_text if t.startswith("See "))
        b = by_text[link_para]
        assert not b["hint"] and b["cls"] == "bad"           # density kill


class TestSparkOperator:
    def test_extract_main_content(self, spark):
        from unstructured_spark.operators.main_content import (
            extract_blocks,
            extract_main_content,
        )

        docs = spark.createDataFrame(
            [(1, PAGE), (2, f"<p>{LONG}</p>"), (3, None), (4, "")],
            "doc_id long, text string",
        )
        rows = {r["doc_id"]: r for r in extract_main_content(docs).collect()}
        assert rows[1]["n_good"] == 4
        assert rows[1]["main_text"] == main_content(PAGE)
        assert rows[2]["n_blocks"] == 1 and rows[2]["n_good"] == 1
        assert rows[3]["n_blocks"] == 0 and rows[3]["main_text"] == ""
        assert rows[4]["n_blocks"] == 0
        blocks = extract_blocks(docs).collect()
        assert {b["cls"] for b in blocks} == {"good", "bad"}

    def test_map_only_plan(self, spark):
        from unstructured_spark.operators.main_content import (
            extract_main_content,
        )

        docs = spark.createDataFrame([(1, "<p>x</p>")],
                                     "doc_id long, text string")
        plan = (
            extract_main_content(docs)
            ._jdf.queryExecution().executedPlan().toString()
        )
        assert "Exchange" not in plan
