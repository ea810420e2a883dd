"""Model-free form key/value pairing (hi_res extract_forms geometry)."""

from pyspark.sql import functions as F

from unstructured_spark.operators.form_extraction import (
    form_elements,
    form_kv_from_text,
    form_kv_pairs,
)

COLS = (
    "doc_id string, page_number int, box_id int, kind string, text string,"
    " x1 double, y1 double, x2 double, y2 double"
)


def _det(spark, rows):
    return spark.createDataFrame(rows, COLS)


def _box(doc, box_id, kind, text, x1, y1, x2, y2, page=1):
    return (doc, page, box_id, kind, text, float(x1), float(y1), float(x2), float(y2))


class TestFormKvPairs:
    def test_inline_pair(self, spark):
        det = _det(
            spark,
            [
                _box("d", 1, "FormKey", "Name", 50, 0, 150, 20),
                _box("d", 200, "FormValue", "Jane", 160, 0, 260, 20),
            ],
        )
        [r] = form_kv_pairs(det).collect()
        assert r["value_text"] == "Jane" and r["relation"] == "inline"
        assert r["gap"] == 10.0
        assert abs(r["confidence"] - round(1 / 1.1, 6)) < 1e-9

    def test_below_pair(self, spark):
        det = _det(
            spark,
            [
                _box("d", 1, "FormKey", "Address", 50, 100, 150, 120),
                _box("d", 200, "FormValue", "1 Main St", 50, 130, 150, 150),
            ],
        )
        [r] = form_kv_pairs(det).collect()
        assert r["value_text"] == "1 Main St" and r["relation"] == "below"
        assert r["gap"] == 10.0

    def test_inline_beats_below(self, spark):
        det = _det(
            spark,
            [
                _box("d", 1, "FormKey", "K", 50, 0, 150, 20),
                _box("d", 200, "FormValue", "right", 155, 0, 250, 20),
                _box("d", 201, "FormValue", "under", 50, 22, 150, 42),
            ],
        )
        [r] = form_kv_pairs(det).collect()
        assert r["value_text"] == "right" and r["relation"] == "inline"

    def test_nearest_inline_wins(self, spark):
        det = _det(
            spark,
            [
                _box("d", 1, "FormKey", "K", 50, 0, 150, 20),
                _box("d", 200, "FormValue", "far", 300, 0, 400, 20),
                _box("d", 201, "FormValue", "near", 160, 0, 280, 20),
            ],
        )
        [r] = form_kv_pairs(det).collect()
        assert r["value_text"] == "near"

    def test_orphan_key_null_value(self, spark):
        det = _det(
            spark,
            [
                _box("d", 1, "FormKey", "K", 50, 0, 150, 20),
                # 300px away — beyond max_gap=200
                _box("d", 200, "FormValue", "V", 460, 0, 500, 20),
            ],
        )
        [r] = form_kv_pairs(det).collect()
        assert r["value_text"] is None and r["confidence"] is None

    def test_value_conflict_closer_key_wins(self, spark):
        det = _det(
            spark,
            [
                _box("d", 1, "FormKey", "far_key", 600, 0, 700, 20),
                _box("d", 2, "FormKey", "near_key", 720, 0, 780, 20),
                _box("d", 200, "FormValue", "V", 800, 0, 900, 20),
            ],
        )
        rows = {r["key_text"]: r for r in form_kv_pairs(det).collect()}
        assert rows["near_key"]["value_text"] == "V"
        assert rows["far_key"]["value_text"] is None

    def test_table_regions_skipped(self, spark):
        det = [
            _box("d", 1, "FormKey", "in_table", 60, 300, 160, 320),
            _box("d", 200, "FormValue", "tv", 170, 300, 270, 320),
            _box("d", 900, "Table", None, 40, 290, 400, 400),
            _box("d", 2, "FormKey", "outside", 50, 0, 150, 20),
            _box("d", 201, "FormValue", "ov", 160, 0, 260, 20),
        ]
        out = form_kv_pairs(_det(spark, det)).collect()
        assert [r["key_text"] for r in out] == ["outside"]
        both = form_kv_pairs(_det(spark, det), skip_table_regions=False).collect()
        assert sorted(r["key_text"] for r in both) == ["in_table", "outside"]

    def test_cross_page_never_pairs(self, spark):
        det = _det(
            spark,
            [
                _box("d", 1, "FormKey", "K", 50, 0, 150, 20, page=1),
                _box("d", 200, "FormValue", "V", 160, 0, 260, 20, page=2),
            ],
        )
        [r] = form_kv_pairs(det).collect()
        assert r["value_text"] is None


class TestFormElements:
    def test_fold_and_render(self, spark):
        det = _det(
            spark,
            [
                _box("d", 2, "FormKey", "City", 50, 100, 150, 120),
                _box("d", 201, "FormValue", "Oslo", 160, 100, 260, 120),
                _box("d", 1, "FormKey", "Name", 50, 0, 150, 20),
                _box("d", 200, "FormValue", "Jane", 160, 0, 260, 20),
            ],
        )
        [el] = form_elements(form_kv_pairs(det)).collect()
        assert el["element_type"] == "FormKeysValues"
        assert el["text"] == "Name: Jane\nCity: Oslo"
        kv = el["key_value_pairs"]
        assert [p["key_text"] for p in kv] == ["Name", "City"]
        assert kv[0]["value_element_id"] == 200


class TestFormKvFromText:
    def test_colon_lines(self, spark):
        df = spark.createDataFrame(
            [("a", "Name: Jane\nno colon line\nCity:  Oslo \n: leading")],
            "doc_id string, text string",
        )
        rows = form_kv_from_text(df).orderBy("line_no").collect()
        assert [(r["line_no"], r["key"], r["value"]) for r in rows] == [
            (0, "Name", "Jane"),
            (2, "City", "Oslo"),
        ]

    def test_plan_is_shuffle_free(self, spark):
        df = spark.createDataFrame([("a", "x: y")], "doc_id string, text string")
        plan = (
            form_kv_from_text(df)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan
