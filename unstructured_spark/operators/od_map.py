"""Object-detection mean-average-precision as a Spark job (reference
``unstructured/metrics/object_detection.py`` — torch tensor pipeline,
721 lines; SURVEY §2.9).

Two-stage Spark-first design instead of the reference's in-memory
tensor crunch:

1. **Per-page greedy matching** (`_match_page`) — cogrouped
   ``applyInPandas`` keyed by (doc_id, page_number): predictions sorted
   by confidence claim the highest-IoU unclaimed ground-truth box of the
   same class per IoU threshold (object_detection.py:341-420
   ``_compute_targets``: IoU matrix, class-mismatch zeroing, stable
   descending sort). Emits one (class, score, iou_threshold, tp) row per
   prediction×threshold. Pages are independent → embarrassingly
   parallel; the only shuffle is the cogroup key.

2. **Dataset-level AP natively** (`average_precision`) — the global
   sort-by-confidence + cumulative precision/recall curve is window
   functions, not a collect:

   - rank & cumulative TP over ``Window.partitionBy(class, thr)
     .orderBy(score desc)``
   - precision = cumTP/rank, recall = cumTP/n_positives (n_positives
     from a native groupBy on the ground-truth side, broadcast-joined)
   - interpolated precision = ``max(precision)`` over
     ``rowsBetween(currentRow, unboundedFollowing)`` — the standard
     right-to-left running max of PASCAL/COCO AP
   - AP = Σ (recall − lag(recall)) · interp_precision

   mAP = mean of per-class AP, then mean over thresholds
   (object_detection.py:161-198 averages AP over present classes).

At scale the window partitions by (class, threshold) — bounded
cardinality, each holding the global ranked list for one class. For
billions of boxes per class, pre-aggregate identical scores before the
window; class count (≈10s) keeps partitions wide but singly-keyed, so
this is the one stage that must fit a class's predictions per partition
— acceptable because stage 1 already reduced rows to one per
prediction×threshold.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MATCH_SCHEMA = "cls string, score double, iou_threshold double, tp int"

DEFAULT_IOU_THRESHOLDS = (0.5, 0.75)


def _iou(a, b) -> float:
    ix1, iy1 = max(a[0], b[0]), max(a[1], b[1])
    ix2, iy2 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(0.0, ix2 - ix1) * max(0.0, iy2 - iy1)
    if inter == 0:
        return 0.0
    area_a = (a[2] - a[0]) * (a[3] - a[1])
    area_b = (b[2] - b[0]) * (b[3] - b[1])
    return inter / (area_a + area_b - inter)


def _match_page(pred: pd.DataFrame, gt: pd.DataFrame, thresholds) -> pd.DataFrame:
    rows = []
    gt_boxes = [
        (r.cls, (r.x1, r.y1, r.x2, r.y2)) for r in gt.itertuples()
    ]
    preds = sorted(
        (
            (float(r.score), r.cls, (r.x1, r.y1, r.x2, r.y2))
            for r in pred.itertuples()
        ),
        key=lambda t: -t[0],
    )
    for thr in thresholds:
        claimed: set[int] = set()
        for score, cls, box in preds:
            best_i, best_iou = -1, 0.0
            for i, (gcls, gbox) in enumerate(gt_boxes):
                if gcls != cls or i in claimed:
                    continue
                v = _iou(box, gbox)
                if v > best_iou:
                    best_i, best_iou = i, v
            tp = 1 if best_i >= 0 and best_iou > thr else 0
            if tp:
                claimed.add(best_i)
            rows.append(
                {"cls": cls, "score": score, "iou_threshold": thr, "tp": tp}
            )
    return pd.DataFrame(rows, columns=["cls", "score", "iou_threshold", "tp"])


def match_detections(
    pred: DataFrame,
    gt: DataFrame,
    iou_thresholds=DEFAULT_IOU_THRESHOLDS,
    keys=("doc_id", "page_number"),
) -> DataFrame:
    """Stage 1: per-page TP/FP flags per prediction × IoU threshold.

    pred: (doc_id, page_number, cls, score, x1, y1, x2, y2)
    gt:   (doc_id, page_number, cls, x1, y1, x2, y2)
    """
    thresholds = tuple(float(t) for t in iou_thresholds)
    pcols = [*keys, "cls", "score", "x1", "y1", "x2", "y2"]
    gcols = [*keys, "cls", "x1", "y1", "x2", "y2"]
    return (
        pred.select(pcols)
        .groupBy(*keys)
        .cogroup(gt.select(gcols).groupBy(*keys))
        .applyInPandas(
            lambda p, g: _match_page(p, g, thresholds), schema=MATCH_SCHEMA
        )
    )


def average_precision(matches: DataFrame, gt: DataFrame) -> DataFrame:
    """Stage 2: per (class, IoU-threshold) AP, all window functions."""
    npos = gt.groupBy("cls").agg(F.count("*").alias("npos"))
    w = Window.partitionBy("cls", "iou_threshold").orderBy(
        F.col("score").desc(), F.col("tp").desc()
    )
    curve = (
        matches.join(F.broadcast(npos), "cls", "inner")
        .withColumn("rank", F.row_number().over(w))
        .withColumn("cum_tp", F.sum("tp").over(w))
        .withColumn("precision", F.col("cum_tp") / F.col("rank"))
        .withColumn("recall", F.col("cum_tp") / F.col("npos"))
        .withColumn(
            "p_interp",
            F.max("precision").over(
                w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
            ),
        )
        .withColumn(
            "d_recall", F.col("recall") - F.lag("recall", 1, 0.0).over(w)
        )
    )
    return curve.groupBy("cls", "iou_threshold").agg(
        F.round(F.sum(F.col("d_recall") * F.col("p_interp")), 6).alias("ap")
    )


def od_map(
    pred: DataFrame,
    gt: DataFrame,
    iou_thresholds=DEFAULT_IOU_THRESHOLDS,
    keys=("doc_id", "page_number"),
) -> DataFrame:
    """End-to-end: one row (m_ap, by-threshold mean APs are derivable
    from :func:`average_precision`). Classes with ground truth but no
    predictions contribute AP 0 (reference averages over present
    classes, object_detection.py:190-198)."""
    matches = match_detections(pred, gt, iou_thresholds, keys)
    ap = average_precision(matches, gt)
    thr_df = gt.sparkSession.range(1).select(
        F.explode(
            F.array(*[F.lit(float(t)) for t in iou_thresholds])
        ).alias("iou_threshold")
    )
    all_cls = gt.select("cls").distinct().crossJoin(thr_df)
    full = all_cls.join(ap, ["cls", "iou_threshold"], "left").fillna(
        0.0, subset=["ap"]
    )
    per_class = full.groupBy("cls").agg(F.avg("ap").alias("ap_over_thr"))
    return per_class.agg(F.round(F.avg("ap_over_thr"), 6).alias("m_ap"))
