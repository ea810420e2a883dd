"""Evaluation metrics (§2.9), coordinate conversion (§1.3), and
table-chunk reconstruction (§2.4 inverse op)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from unstructured_spark.functions import coordinates as coords
from unstructured_spark.operators import metrics
from unstructured_spark.operators.chunking import (
    chunk_elements,
    reconstruct_table_from_chunks,
)


class TestEditDistance:
    def test_identical_is_one(self, spark):
        df = spark.createDataFrame(
            [("a", "same text", "same text")],
            "doc_id string, output_text string, source_text string",
        )
        row = metrics.score_edit_distance(df).collect()[0]
        assert row["accuracy"] == 1.0

    def test_whitespace_and_quotes_standardized(self, spark):
        df = spark.createDataFrame(
            [("a", "it’s  a   test", "it's a test")],
            "doc_id string, output_text string, source_text string",
        )
        assert metrics.score_edit_distance(df).collect()[0]["accuracy"] == 1.0

    def test_empty_pair_is_one_and_disjoint_is_zero(self, spark):
        df = spark.createDataFrame(
            [("a", "", ""), ("b", "abc", "xyz")],
            "doc_id string, output_text string, source_text string",
        )
        rows = {r["doc_id"]: r["accuracy"] for r in metrics.score_edit_distance(df).collect()}
        assert rows["a"] == 1.0
        assert rows["b"] == 0.0

    def test_aggregate_scores(self, spark):
        df = spark.createDataFrame(
            [("a", 1.0), ("b", 0.5)], "doc_id string, accuracy double"
        )
        row = metrics.aggregate_scores(df).collect()[0]
        assert row["mean"] == 0.75 and row["n"] == 2


class TestPercentMissing:
    def test_bag_semantics(self, spark):
        src = spark.createDataFrame(
            [("d", "a a b c")], "doc_id string, text string"
        )
        out = spark.createDataFrame(
            [("d", "a b")], "doc_id string, text string"
        )
        row = metrics.percent_missing_text(out, src).collect()[0]
        # missing: one 'a' occurrence + 'c' → 2 of 4
        assert row["percent_missing"] == 0.5


class TestElementTypeMatch:
    def test_full_match(self, spark):
        els = spark.createDataFrame(
            [("d", "Title", 0), ("d", "NarrativeText", None)],
            "doc_id string, type string, category_depth int",
        )
        row = metrics.element_type_percent_match(els, els).collect()[0]
        assert row["percent_match"] == 1.0

    def test_partial_match(self, spark):
        src = spark.createDataFrame(
            [("d", "Title", 0), ("d", "Title", 0), ("d", "ListItem", 0)],
            "doc_id string, type string, category_depth int",
        )
        out = spark.createDataFrame(
            [("d", "Title", 0), ("d", "Table", 0)],
            "doc_id string, type string, category_depth int",
        )
        row = metrics.element_type_percent_match(out, src).collect()[0]
        assert abs(row["percent_match"] - 1 / 3) < 1e-9


class TestCoordinates:
    def test_pixel_to_relative(self, spark):
        df = spark.createDataFrame([(100.0, 50.0)], "x double, y double")
        px = coords.PixelSpace(200, 100)
        x, y = coords.convert_point(F.col("x"), F.col("y"), px, coords.RelativeCoordinateSystem)
        row = df.select(x.alias("x"), y.alias("y")).collect()[0]
        assert row["x"] == 0.5
        assert row["y"] == 0.5  # y flipped: 50px from top of 100 = middle

    def test_pixel_roundtrip(self, spark):
        df = spark.createDataFrame([(30.0, 10.0)], "x double, y double")
        px = coords.PixelSpace(200, 100)
        pt = coords.PointSpace(400, 300)
        x1, y1 = coords.convert_point(F.col("x"), F.col("y"), px, pt)
        x2, y2 = coords.convert_point(x1, y1, pt, px)
        row = df.select(x2.alias("x"), y2.alias("y")).collect()[0]
        assert abs(row["x"] - 30.0) < 1e-9 and abs(row["y"] - 10.0) < 1e-9

    def test_struct_column_conversion(self, spark):
        df = spark.createDataFrame(
            [("e1",)], "element_id string"
        ).withColumn(
            "coordinates",
            F.expr(
                "named_struct('points', array(named_struct('x', 10.0d, 'y', 20.0d)),"
                " 'system', 'PixelSpace', 'layout_width', 100.0d, 'layout_height', 100.0d)"
            ),
        )
        out = coords.convert_coordinates_column(
            df, coords.RelativeCoordinateSystem
        ).collect()[0]["coordinates"]
        assert out["system"] == "RelativeCoordinateSystem"
        p = out["points"][0]
        assert abs(p["x"] - 0.1) < 1e-9
        assert abs(p["y"] - 0.8) < 1e-9  # flipped from y-down


class TestReconstructTable:
    def test_roundtrip(self, spark):
        cells = " ".join(f"r{i}c0 r{i}c1" for i in range(60))
        html = (
            "<table>"
            + "".join(f"<tr><td>r{i}c0</td><td>r{i}c1</td></tr>" for i in range(60))
            + "</table>"
        )
        els = spark.createDataFrame(
            [("d", 0, "tbl-1", "Table", cells, html)],
            "doc_id string, element_index long, element_id string, "
            "type string, text string, text_as_html string",
        )
        chunks = chunk_elements(els, max_characters=200)
        chunk_rows = chunks.collect()
        assert all(r["type"] == "TableChunk" for r in chunk_rows)
        assert len(chunk_rows) > 1
        merged = reconstruct_table_from_chunks(chunks).collect()
        assert len(merged) == 1
        row = merged[0]
        assert row["type"] == "Table"
        assert row["element_id"] == "tbl-1"
        # text round-trips modulo the split separators
        assert row["text"].split() == cells.split()
        assert row["text_as_html"].count("<tr>") == 60


class TestOrigElementsCodec:
    def test_roundtrip(self):
        from unstructured_spark.operators.serde import (
            decode_orig_elements,
            encode_orig_elements,
        )

        els = [{"type": "Title", "text": "Hi", "metadata": {"page_number": 1}}]
        assert decode_orig_elements(encode_orig_elements(els)) == els

    def test_bomb_guard(self):
        import base64
        import zlib

        from unstructured_spark.operators.serde import decode_orig_elements

        bomb = base64.b64encode(zlib.compress(b"[" + b"0," * 1000 + b"0]")).decode()
        # small payloads decode fine; the guard only trips past 200 MB
        assert len(decode_orig_elements(bomb)) == 1001

    def test_codec_udfs(self, spark):
        import json

        from unstructured_spark.operators.serde import orig_elements_codec_udfs
        from pyspark.sql import functions as F

        enc, dec = orig_elements_codec_udfs()
        df = spark.createDataFrame(
            [('[{"type": "Text", "text": "x"}]',)], "payload string"
        )
        out = df.select(dec(enc(F.col("payload"))).alias("roundtrip")).collect()[0]
        assert json.loads(out["roundtrip"]) == [{"type": "Text", "text": "x"}]


class TestMeanGrouping:
    def test_group_stats(self, spark):
        from unstructured_spark.operators.metrics import mean_grouping

        rows = [("a", 0.5), ("a", 0.7), ("b", 1.0)]
        df = spark.createDataFrame(rows, "doctype string, accuracy double")
        got = {r["doctype"]: r for r in mean_grouping(df, "doctype", ["accuracy"]).collect()}
        assert got["a"]["accuracy_mean"] == 0.6
        assert got["a"]["accuracy_stdev"] == 0.141  # sample stdev of {.5,.7}
        assert got["a"]["accuracy_pstdev"] == 0.1
        assert got["a"]["accuracy_count"] == 2
        # singleton group: sample stdev undefined -> null (reference
        # _stdev returns None below 2 scores), pstdev 0
        assert got["b"]["accuracy_stdev"] is None
        assert got["b"]["accuracy_pstdev"] == 0.0
        assert got["b"]["accuracy_count"] == 1


class TestFilterMetrics:
    def test_filters_and_validates(self, spark):
        from unstructured_spark.operators.metrics import filter_metrics

        df = spark.createDataFrame(
            [("a.pdf", 0.9), ("b.pdf", 0.5)], "filename string, accuracy double"
        )
        out = filter_metrics(df, ["a.pdf"]).collect()
        assert [r["filename"] for r in out] == ["a.pdf"]
        try:
            filter_metrics(df, ["x"], filter_by="nope")
            raise AssertionError("expected ValueError")
        except ValueError:
            pass
