"""Table-structure eval + object-detection mAP (SURVEY §2.9 last rows)."""

import pytest

from unstructured_spark.operators.od_map import (
    average_precision,
    match_detections,
    od_map,
)
from unstructured_spark.operators.table_eval import table_eval, table_eval_summary

CELLS = "doc_id string, table_id int, row_index int, col_index int, content string"


def _cells(spark, rows):
    return spark.createDataFrame(rows, CELLS)


GT = [
    ("d1", 0, 0, 0, "name"),
    ("d1", 0, 0, 1, "price"),
    ("d1", 0, 1, 0, "apple"),
    ("d1", 0, 1, 1, "3.50"),
]


class TestTableEval:
    def test_perfect_prediction(self, spark):
        out = table_eval(_cells(spark, GT), _cells(spark, GT)).collect()[0]
        assert out.total_tables == 1 and out.total_predicted_tables == 1
        assert out.table_level_acc == 1.0
        assert out.table_detection_f1 == 1.0
        assert out.element_row_level_index_acc == 1.0
        assert out.element_col_level_index_acc == 1.0
        assert out.element_row_level_content_acc == 1.0
        assert out.element_col_level_content_acc == 1.0
        assert out.composite_structure_acc == 1.0

    def test_row_shift_hits_row_index_only(self, spark):
        shifted = [(d, t, r + 1, c, txt) for d, t, r, c, txt in GT]
        out = table_eval(_cells(spark, shifted), _cells(spark, GT)).collect()[0]
        assert out.element_row_level_index_acc == 0.0
        assert out.element_col_level_index_acc == 1.0
        # content along columns unchanged; row lanes shifted to new keys
        assert out.element_col_level_content_acc == 1.0

    def test_missed_table_recall(self, spark):
        gt2 = GT + [
            ("d1", 1, 0, 0, "zebra stripes"),
            ("d1", 1, 0, 1, "quantum flux"),
        ]
        out = table_eval(_cells(spark, GT), _cells(spark, gt2)).collect()[0]
        assert out.total_tables == 2 and out.total_predicted_tables == 1
        assert out.table_detection_recall == 0.5
        assert out.table_detection_precision == 1.0
        # the missed GT table appends zero scores to the element means
        assert out.element_row_level_index_acc == 0.5

    def test_empty_prediction(self, spark):
        out = table_eval(
            _cells(spark, []), _cells(spark, GT)
        ).collect()[0]
        assert out.total_predicted_tables == 0
        assert out.table_detection_f1 == 0.0

    def test_summary_shape(self, spark):
        per_doc = table_eval(_cells(spark, GT), _cells(spark, GT))
        row = table_eval_summary(per_doc).collect()[0]
        assert row.docs == 1
        assert row.avg_composite_structure_acc == 1.0


PRED_SCHEMA = (
    "doc_id string, page_number int, cls string, score double, "
    "x1 double, y1 double, x2 double, y2 double"
)
GT_SCHEMA = (
    "doc_id string, page_number int, cls string, "
    "x1 double, y1 double, x2 double, y2 double"
)

GT_BOXES = [
    ("d1", 1, "Table", 0.0, 0.0, 10.0, 10.0),
    ("d1", 1, "Title", 20.0, 0.0, 30.0, 5.0),
]


class TestOdMap:
    def test_perfect_detection(self, spark):
        pred = spark.createDataFrame(
            [("d1", 1, "Table", 0.9, 0.0, 0.0, 10.0, 10.0),
             ("d1", 1, "Title", 0.8, 20.0, 0.0, 30.0, 5.0)],
            PRED_SCHEMA,
        )
        gt = spark.createDataFrame(GT_BOXES, GT_SCHEMA)
        assert od_map(pred, gt).collect()[0].m_ap == 1.0

    def test_false_positive_lowers_precision_not_ap_tail(self, spark):
        pred = spark.createDataFrame(
            [("d1", 1, "Table", 0.9, 0.0, 0.0, 10.0, 10.0),
             ("d1", 1, "Table", 0.8, 50.0, 50.0, 60.0, 60.0)],  # FP, lower conf
            PRED_SCHEMA,
        )
        gt = spark.createDataFrame(GT_BOXES[:1], GT_SCHEMA)
        # TP ranked first → AP stays 1.0 (precision at full recall is 1)
        assert od_map(pred, gt).collect()[0].m_ap == 1.0

    def test_fp_ranked_above_tp(self, spark):
        pred = spark.createDataFrame(
            [("d1", 1, "Table", 0.9, 50.0, 50.0, 60.0, 60.0),  # FP, higher conf
             ("d1", 1, "Table", 0.8, 0.0, 0.0, 10.0, 10.0)],
            PRED_SCHEMA,
        )
        gt = spark.createDataFrame(GT_BOXES[:1], GT_SCHEMA)
        # precision at recall 1.0 is 1/2 at every threshold
        assert od_map(pred, gt).collect()[0].m_ap == 0.5

    def test_iou_threshold_gate(self, spark):
        # IoU vs GT = 25/175 ≈ 0.143 → miss at both 0.5 and 0.75
        pred = spark.createDataFrame(
            [("d1", 1, "Table", 0.9, 5.0, 5.0, 15.0, 15.0)], PRED_SCHEMA
        )
        gt = spark.createDataFrame(GT_BOXES[:1], GT_SCHEMA)
        assert od_map(pred, gt).collect()[0].m_ap == 0.0

    def test_half_overlap_splits_thresholds(self, spark):
        # box shifted right by 3 → IoU = 7*10/(200-70) ≈ 0.538:
        # TP at 0.5, FP at 0.75 → mAP = (1.0 + 0.0)/2
        pred = spark.createDataFrame(
            [("d1", 1, "Table", 0.9, 3.0, 0.0, 13.0, 10.0)], PRED_SCHEMA
        )
        gt = spark.createDataFrame(GT_BOXES[:1], GT_SCHEMA)
        assert od_map(pred, gt).collect()[0].m_ap == pytest.approx(0.5)

    def test_one_gt_per_prediction(self, spark):
        # two identical predictions, one GT: second claims nothing
        pred = spark.createDataFrame(
            [("d1", 1, "Table", 0.9, 0.0, 0.0, 10.0, 10.0),
             ("d1", 1, "Table", 0.8, 0.0, 0.0, 10.0, 10.0)],
            PRED_SCHEMA,
        )
        gt = spark.createDataFrame(GT_BOXES[:1], GT_SCHEMA)
        m = match_detections(pred, gt).where("iou_threshold = 0.5").collect()
        assert sorted(r.tp for r in m) == [0, 1]

    def test_class_mismatch_is_fp(self, spark):
        pred = spark.createDataFrame(
            [("d1", 1, "Title", 0.9, 0.0, 0.0, 10.0, 10.0)], PRED_SCHEMA
        )
        gt = spark.createDataFrame(GT_BOXES[:1], GT_SCHEMA)
        assert od_map(pred, gt).collect()[0].m_ap == 0.0

    def test_average_precision_per_class_rows(self, spark):
        pred = spark.createDataFrame(
            [("d1", 1, "Table", 0.9, 0.0, 0.0, 10.0, 10.0)], PRED_SCHEMA
        )
        gt = spark.createDataFrame(GT_BOXES, GT_SCHEMA)
        ap = average_precision(match_detections(pred, gt), gt)
        rows = {(r.cls, r.iou_threshold): r.ap for r in ap.collect()}
        assert rows[("Table", 0.5)] == 1.0
        # Title has GT but no predictions → absent here, zero-filled in od_map
        assert ("Title", 0.5) not in rows


class TestApTies:
    def test_tied_scores_do_not_inflate_ap(self, spark):
        # three same-class predictions, ALL at score 0.9, all TPs, 3
        # positives: AP must be exactly 1.0 — the default RANGE frame
        # counted future tied TPs into cum_tp (precision 3.0 at rank 1)
        from unstructured_spark.operators.od_map import average_precision

        matches = spark.createDataFrame(
            [("c", 0.5, 0.9, 1)] * 3,
            "cls string, iou_threshold double, score double, tp int",
        )
        gt = spark.createDataFrame(
            [("c",)] * 3, "cls string"
        )
        [row] = average_precision(matches, gt).collect()
        assert row["ap"] == 1.0
