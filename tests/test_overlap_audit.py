"""Overlap/nesting QA audit (reference utils.py:271-643 semantics)."""

from pyspark.sql import functions as F

from unstructured_spark.operators.overlap_audit import (
    longest_common_token_run,
    overlap_diagnostics,
)

COLS = "doc_id string, page int, ix int, etype string, text string, x1 double, y1 double, x2 double, y2 double"


def _diag(spark, rows):
    return overlap_diagnostics(spark.createDataFrame(rows, COLS)).collect()


class TestCases:
    def test_nested_with_tolerance(self, spark):
        rows = [
            ("d", 1, 0, "Title", "big box", 0.0, 0.0, 100.0, 100.0),
            # sticks out 3px — inside the 5px tolerance
            ("d", 1, 1, "Text", "small", -3.0, 10.0, 50.0, 50.0),
        ]
        [r] = _diag(spark, rows)
        assert r["overlapping_case"] == "nested Text in Title"
        assert r["parent_element"] == "Title(ix=0)"
        assert r["element_a"] == "Title(ix=0)"  # parent listed first
        assert r["overlap_pct"] == 100.0

    def test_nested_second_is_parent(self, spark):
        rows = [
            ("d", 1, 0, "Text", "inner", 10.0, 10.0, 50.0, 50.0),
            ("d", 1, 1, "Table", "outer", 0.0, 0.0, 100.0, 100.0),
        ]
        [r] = _diag(spark, rows)
        assert r["overlapping_case"] == "nested Text in Table"
        assert r["parent_element"] == "Table(ix=1)"
        assert r["element_a"] == "Table(ix=1)"

    def test_small_partial_overlap(self, spark):
        rows = [
            ("d", 1, 0, "Text", "a b", 0.0, 0.0, 100.0, 100.0),
            ("d", 1, 1, "Text", "c d", 95.0, 0.0, 195.0, 100.0),  # 5% of min
        ]
        [r] = _diag(spark, rows)
        assert r["overlapping_case"] == "Small partial overlap"
        assert r["overlap_pct"] == 5.0

    def test_empty_content(self, spark):
        rows = [
            ("d", 1, 0, "Image", "", 0.0, 0.0, 100.0, 100.0),
            ("d", 1, 1, "Text", "words here", 50.0, 0.0, 150.0, 100.0),
        ]
        [r] = _diag(spark, rows)
        assert r["overlapping_case"] == "partial overlap with empty content in Image"

    def test_empty_content_second_swaps_order(self, spark):
        rows = [
            ("d", 1, 0, "Text", "words here", 0.0, 0.0, 100.0, 100.0),
            ("d", 1, 1, "Image", "", 50.0, 0.0, 150.0, 100.0),
        ]
        [r] = _diag(spark, rows)
        assert r["overlapping_case"] == "partial overlap with empty content in Image"
        assert r["element_a"] == "Image(ix=1)"

    def test_duplicate_text(self, spark):
        rows = [
            ("d", 1, 0, "Text", "shared words", 0.0, 0.0, 100.0, 100.0),
            ("d", 1, 1, "Text", "the shared words here", 50.0, 0.0, 150.0, 100.0),
        ]
        [r] = _diag(spark, rows)
        assert r["overlapping_case"] == "partial overlap with duplicate text"

    def test_sharing_ngram_percentage(self, spark):
        # shorter text: 5 words -> n starts at 4; longest shared run is
        # 'b c d' (3) -> n* = 3; shorter has 3 trigram positions, 1 shared
        rows = [
            ("d", 1, 0, "Text", "a b c d e", 0.0, 0.0, 100.0, 100.0),
            ("d", 1, 1, "Text", "x b c d y z", 50.0, 0.0, 150.0, 100.0),
        ]
        [r] = _diag(spark, rows)
        assert r["overlapping_case"] == (
            "partial overlap sharing 33.33% of the text fromText(3-gram)"
        )
        assert r["largest_ngram_pct"] == 33.33

    def test_no_shared_text(self, spark):
        rows = [
            ("d", 1, 0, "Text", "a b c", 0.0, 0.0, 100.0, 100.0),
            ("d", 1, 1, "Text", "x y z", 50.0, 0.0, 150.0, 100.0),
        ]
        [r] = _diag(spark, rows)
        assert r["overlapping_case"] == "partial overlap without sharing text"
        assert r["largest_ngram_pct"] == 0.0

    def test_disjoint_and_touching_not_reported(self, spark):
        rows = [
            ("d", 1, 0, "Text", "a", 0.0, 0.0, 100.0, 100.0),
            ("d", 1, 1, "Text", "b", 100.0, 0.0, 200.0, 100.0),  # touching edge
            ("d", 1, 2, "Text", "c", 300.0, 0.0, 400.0, 100.0),  # disjoint
            ("d", 2, 3, "Text", "d", 0.0, 0.0, 100.0, 100.0),  # other page
        ]
        assert _diag(spark, rows) == []

    def test_total_percentage_is_iou(self, spark):
        rows = [
            ("d", 1, 0, "Text", "", 0.0, 0.0, 100.0, 100.0),
            ("d", 1, 1, "Text", "", 50.0, 0.0, 150.0, 100.0),
        ]
        [r] = _diag(spark, rows)
        # inter 5000, union 15000 -> 33.33; partial 5000/10000 = 50%
        assert r["overlap_pct_total"] == 33.33
        assert r["overlap_pct"] == 50.0
        assert r["max_area"] == 10000.0 and r["total_area"] == 20000.0


class TestLongestRun:
    def _run(self, spark, a, b):
        df = spark.createDataFrame([(a, b)], "a string, b string")
        return df.select(
            longest_common_token_run(F.split("a", " "), F.split("b", " ")).alias("l")
        ).collect()[0]["l"]

    def test_basic(self, spark):
        assert self._run(spark, "a b c d", "x b c y") == 2

    def test_full_match(self, spark):
        assert self._run(spark, "a b c", "a b c") == 3

    def test_no_match(self, spark):
        assert self._run(spark, "a b", "c d") == 0

    def test_repeated_tokens(self, spark):
        assert self._run(spark, "a a a b", "a a b") == 3
