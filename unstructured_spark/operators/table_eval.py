"""TEDS-like table structure evaluation as a Spark job (reference
``unstructured/metrics/table/table_eval.py:40-131``,
``table_alignment.py:27-180``; SURVEY §2.9).

The reference evaluates one prediction-file/ground-truth-file pair per
process. Here both sides are DataFrames of table *cells*

    (doc_id, table_id, row_index, col_index, content)

and the evaluation is a cogrouped ``applyInPandas`` keyed by ``doc_id``:
each document's (small) cell sets meet on one executor, the alignment
runs in pure Python there, and the cluster fans out across documents —
the unit of parallelism the reference gets from its process pool
(metrics/evaluate.py:65-700), but shuffle-partitioned instead.

Per-doc metrics mirror ``TableEvaluation`` (table_eval.py:40-60):

- table-level alignment: each predicted table matched to the closest
  ground-truth table by concatenated cell text
  (``difflib.get_close_matches`` cutoff 0.1, table_alignment.py:46-49)
- ``table_level_acc``: mean SequenceMatcher ratio of matched contents,
  0 for unmatched predictions (table_eval.py:62-81)
- detection recall/precision/f1 over matched-table counts
  (table_eval.py:98-131)
- element row/col *index* accuracy: cells matched by content (close
  match cutoff 0.8 with duplicate-aware index assignment,
  table_alignment.py:107-156), fraction whose row (col) index agrees
- element row/col *content* accuracy: per-row (per-col) token-sequence
  SequenceMatcher ratio, averaged (the reference's
  ``compare_contents_as_df`` by_row/by_col token ratios,
  table_alignment.py:96-101); unmatched ground-truth tables append 0s
  (table_alignment.py:168-175)
- ``composite_structure_acc``: (col_idx + row_idx + (col_cont +
  row_cont)/2) / 3 (table_eval.py:54-60)

At 100 TB scale nothing here shuffles more than the two cell tables
once, keyed by doc — documents are independent, so AQE handles skew
(one pathological 10⁶-cell doc) by itself.
"""

from __future__ import annotations

import difflib
from typing import Any, Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CELL_COLS = ("table_id", "row_index", "col_index", "content")

EVAL_SCHEMA = (
    "doc_id string, total_tables int, total_predicted_tables int, "
    "table_level_acc double, table_detection_recall double, "
    "table_detection_precision double, table_detection_f1 double, "
    "element_col_level_index_acc double, element_row_level_index_acc double, "
    "element_col_level_content_acc double, element_row_level_content_acc double, "
    "composite_structure_acc double"
)


def _tables(pdf: pd.DataFrame) -> list[list[dict[str, Any]]]:
    """cells → list of tables, each a list of cell dicts in (row, col)
    order (the reference's "deckerd" table_data shape).

    Plain-Python tuple sort + manual grouping: document cell sets are
    small (tens of rows), where pandas ``sort_values``+``groupby``
    costs ~10× the actual work (it dominated the per-doc profile)."""
    out: list[list[dict[str, Any]]] = []
    if pdf.empty:
        return out
    rows = sorted(
        (
            (t, int(r), int(c), "" if txt is None else str(txt))
            for t, r, c, txt in pdf[list(CELL_COLS)].itertuples(
                index=False, name=None
            )
        ),
        key=lambda x: x[:3],  # stable on ties, like sort_values
    )
    cur_tid: Any = object()
    for t, r, c, txt in rows:
        if t != cur_tid:
            out.append([])
            cur_tid = t
        out[-1].append({"row_index": r, "col_index": c, "content": txt})
    return out


def _content(td: list[dict[str, Any]]) -> str:
    return " ".join(d["content"] for d in td)


def _axis_token_ratio(pred: list[dict], gt: list[dict], axis: str) -> float:
    """Mean per-row (or per-col) token-sequence similarity — the
    by_row/by_col token ratio of the reference's compare_contents_as_df."""
    other = "col_index" if axis == "row_index" else "row_index"

    def lanes(td: list[dict]) -> dict[int, list[str]]:
        lane: dict[int, list[str]] = {}
        for d in sorted(td, key=lambda d: (d[axis], d[other])):
            lane.setdefault(d[axis], []).extend(d["content"].lower().split())
        return lane

    p, g = lanes(pred), lanes(gt)
    keys = sorted(set(p) | set(g))
    if not keys:
        return 1.0
    scores = [
        difflib.SequenceMatcher(None, p.get(k, []), g.get(k, [])).ratio()
        for k in keys
    ]
    return sum(scores) / len(scores)


def _index_acc(pred: list[dict], gt: list[dict], cutoff: float) -> tuple[float, float]:
    """(row_index_acc, col_index_acc) via duplicate-aware content
    matching (table_alignment.py:107-156)."""
    gt_contents = [d["content"].lower() for d in gt]
    gt_set = set(gt_contents)
    used: set[int] = set()
    row_ok = col_ok = total = 0
    for cell in pred:
        content = cell["content"].lower()
        # exact-match fast path: ratio 1.0 iff strings are equal, so an
        # exact hit IS get_close_matches' answer — skip the O(|gt|)
        # SequenceMatcher sweep (the common case in real tables)
        if content in gt_set:
            matches = [content]
        else:
            matches = difflib.get_close_matches(
                content, gt_contents, cutoff=cutoff, n=1
            )
        if not matches:
            continue
        cands = [
            i for i, s in enumerate(gt_contents) if s == matches[0] and i not in used
        ]
        if not cands:  # exhausted → reference resets and reuses
            used.clear()
            cands = [i for i, s in enumerate(gt_contents) if s == matches[0]]
        used.add(cands[0])
        g = gt[cands[0]]
        row_ok += cell["row_index"] == g["row_index"]
        col_ok += cell["col_index"] == g["col_index"]
        total += 1
    if total == 0:
        return 0.0, 0.0
    return round(row_ok / total, 2), round(col_ok / total, 2)


def _eval_doc(doc_id, pred_pdf: pd.DataFrame, gt_pdf: pd.DataFrame, cutoff: float):
    pred, gt = _tables(pred_pdf), _tables(gt_pdf)
    gt_texts = [_content(td) for td in gt]
    gt_text_set = set(gt_texts)
    matched = []
    for td in pred:
        text = _content(td)
        # same exact-match fast path as _index_acc
        if text in gt_text_set:
            m = [text]
        else:
            m = difflib.get_close_matches(text, gt_texts, cutoff=0.1, n=1)
        matched.append(gt_texts.index(m[0]) if m else -1)

    scores = [
        0.0
        if m == -1
        else difflib.SequenceMatcher(None, _content(td), gt_texts[m]).ratio()
        for td, m in zip(pred, matched)
    ]
    tp = len(set(matched) - {-1})
    fp = len(matched) - tp
    pos = len(gt)
    recall = tp / pos if pos else 0.0
    precision = tp / (tp + fp) if (tp + fp) else 0.0
    f1 = 2 * precision * recall / (precision + recall) if precision + recall else 0.0

    row_idx_accs, col_idx_accs, row_cont, col_cont = [], [], [], []
    for td, m in zip(pred, matched):
        if m == -1:
            row_idx_accs.append(0.0)
            col_idx_accs.append(0.0)
            row_cont.append(0.0)
            col_cont.append(0.0)
            continue
        r, c = _index_acc(td, gt[m], cutoff)
        row_idx_accs.append(r)
        col_idx_accs.append(c)
        row_cont.append(round(_axis_token_ratio(td, gt[m], "row_index"), 2))
        col_cont.append(round(_axis_token_ratio(td, gt[m], "col_index"), 2))
    for _ in set(range(len(gt))) - set(matched):  # missed ground-truth tables
        row_idx_accs.append(0.0)
        col_idx_accs.append(0.0)
        row_cont.append(0.0)
        col_cont.append(0.0)

    def mean(xs: Iterable[float]) -> float:
        xs = list(xs)
        return round(sum(xs) / len(xs), 2) if xs else 0.0

    ci, ri = mean(col_idx_accs), mean(row_idx_accs)
    cc, rc = mean(col_cont), mean(row_cont)
    return (
            {
                "doc_id": doc_id,
                "total_tables": pos,
                "total_predicted_tables": len(pred),
                "table_level_acc": mean(scores),
                "table_detection_recall": recall,
                "table_detection_precision": precision,
                "table_detection_f1": f1,
                "element_col_level_index_acc": ci,
                "element_row_level_index_acc": ri,
                "element_col_level_content_acc": cc,
                "element_row_level_content_acc": rc,
                "composite_structure_acc": round(
                    (ci + ri + (cc + rc) / 2) / 3, 4
                ),
            }
    )


def _eval_bucket(
    pred: pd.DataFrame, gt: pd.DataFrame, cutoff: float
) -> pd.DataFrame:
    """One UDF call per bucket of documents: pandas-groupby both sides by
    doc_id and evaluate each doc. Amortizes per-group Arrow overhead and
    keeps CPU-bound difflib work fanned out across all cores."""

    def split(df: pd.DataFrame) -> dict:
        return (
            {k: g for k, g in df.groupby("doc_id", sort=False)}
            if len(df)
            else {}
        )

    pred_docs, gt_docs = split(pred), split(gt)
    empty = pred.iloc[0:0]
    out = [
        _eval_doc(doc_id, pred_docs.get(doc_id, empty), gt_docs.get(doc_id, empty), cutoff)
        for doc_id in set(pred_docs) | set(gt_docs)
    ]
    cols = [f.split()[0] for f in EVAL_SCHEMA.split(", ")]
    return pd.DataFrame(out, columns=cols)


def table_eval(
    pred_cells: DataFrame,
    gt_cells: DataFrame,
    cutoff: float = 0.8,
    num_buckets: int | None = None,
) -> DataFrame:
    """Per-document table evaluation; one metrics row per doc_id.

    Both inputs: (doc_id, table_id, row_index, col_index, content).

    Documents are hashed into ``num_buckets`` buckets (default 4×
    cluster parallelism) and the cogroup runs per *bucket*, not per
    doc: one pandas UDF call evaluates thousands of docs, amortizing
    the per-group Arrow round-trip. The explicit ``repartition(nb,
    _b)`` pins the shuffle width so the CPU-heavy difflib stage fans
    out across every core even when the cell bytes are tiny.
    """
    cols = ["doc_id", *CELL_COLS]
    nb = (
        num_buckets
        or pred_cells.sparkSession.sparkContext.defaultParallelism * 4
    )
    bucket = F.pmod(F.xxhash64(F.col("doc_id").cast("string")), F.lit(nb))

    # Fresh aliases per side: when pred and gt derive from the same scan
    # they share expression IDs, and Catalyst's cogroup attribute dedup
    # can mis-prune the shared columns from the right side (same fix as
    # od_map._fresh).
    def prep(df: DataFrame) -> DataFrame:
        return (
            df.select([F.col(c).alias(c) for c in cols])
            .withColumn("_b", bucket)
            .repartition(nb, "_b")
        )

    return (
        prep(pred_cells)
        .groupBy("_b")
        .cogroup(prep(gt_cells).groupBy("_b"))
        .applyInPandas(
            lambda p, g: _eval_bucket(
                p.drop(columns=["_b"]), g.drop(columns=["_b"]), cutoff
            ),
            schema=EVAL_SCHEMA,
        )
    )


def table_eval_summary(per_doc: DataFrame) -> DataFrame:
    """Dataset aggregate: mean/stdev/count per metric (the reference's
    batch aggregation to TSV, metrics/evaluate.py)."""
    metrics = [f.name for f in per_doc.schema.fields if f.name != "doc_id"]
    return per_doc.agg(
        F.count("*").alias("docs"),
        *[F.round(F.avg(m), 4).alias(f"avg_{m}") for m in metrics],
        *[F.round(F.stddev_samp(m), 4).alias(f"std_{m}") for m in metrics],
    )
