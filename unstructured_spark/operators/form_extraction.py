"""Model-free form key/value extraction (hi_res ``extract_forms``).

Reference surface: ``partition_pdf(..., extract_forms=True,
form_extraction_skip_tables=...)`` appends ``FormKeysValues`` elements
whose metadata carries ``key_value_pairs`` —
``FormKeyValuePair{key, value, confidence}`` structs
(reference ``documents/elements.py:138-147``; call site
``partition/pdf.py:1047-1080``). The reference's own
``run_form_extraction`` is ``NotImplementedError``
(``partition/pdf_image/form_extraction.py:8-15``) — a model-bound
stub — so this module supplies the model-FREE geometry the call-site
contract implies, over the same injectable-detections DataFrame
pattern as ``layout_merge``: any upstream key/value detector (a layout
model, an AcroForm widget reader, a rule pass) lands its boxes in a
DataFrame and the pairing itself is native Spark.

Pairing semantics (deterministic, engine-portable, SQL-replayable):

1. optionally drop keys/values that are almost-subregions of a Table
   detection (``form_extraction_skip_tables``);
2. candidate (key, value) pairs on the same page:
   - ``inline``: value starts at/right of the key's right edge, the
     vertical overlap exceeds ``same_line_overlap`` of the shorter
     box, and the horizontal gap is within ``max_gap``;
   - ``below``: value starts at/below the key's bottom edge, the
     horizontal overlap exceeds ``below_overlap`` of the narrower
     box, and the vertical gap is within ``max_gap``;
3. per key keep the best candidate (inline beats below, then smaller
   gap, then smaller value box_id);
4. one value binds at most one key: among per-key winners, each value
   keeps the best key (same ordering, then smaller key box_id); keys
   that lose the conflict emit a NULL value (single-pass resolution —
   a losing key does NOT fall back to its second-best candidate, which
   keeps the whole operator two window functions instead of an
   iterative auction);
5. ``confidence = round(1 / (1 + gap/100), 6)`` — a pure-geometry
   proxy in (0, 1], monotone in proximity.

Scale shape: one equi-join keyed on (doc_id, page_number) — per-page
fan-out is bounded by boxes-per-page, never corpus-sized — then two
window functions partitioned by the same keys. No collects, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from unstructured_spark.operators.layout_merge import (
    _same_page,
    is_almost_subregion_of,
)

TABLE_SUBREGION_THRESHOLD = 0.5


def _drop_in_tables(
    boxes: DataFrame, tables: DataFrame, threshold: float
) -> DataFrame:
    a, b = boxes.alias("a"), tables.alias("b")
    inside = _same_page("a", "b") & is_almost_subregion_of("a", "b", threshold)
    return a.join(b, inside, "left_anti").select(
        [F.col(f"a.{c}") for c in boxes.columns]
    )


def form_kv_pairs(
    detections: DataFrame,
    *,
    key_kind: str = "FormKey",
    value_kind: str = "FormValue",
    table_kind: str = "Table",
    same_line_overlap: float = 0.5,
    below_overlap: float = 0.5,
    max_gap: float = 200.0,
    skip_table_regions: bool = True,
) -> DataFrame:
    """Pair detected form keys with form values by geometry.

    ``detections`` columns: doc_id, page_number, box_id, kind, text,
    x1, y1, x2, y2 (top-left origin, y grows downward).

    Returns one row per surviving key:
    (doc_id, page_number, key_box_id, key_text, value_box_id,
    value_text, relation, gap, confidence) — value columns NULL for
    unpaired keys.
    """
    # TWO page-keyed exchanges for the whole operator (r13 rework; the
    # r7 "one shared doc_id exchange" premise was dead code): under AQE
    # a localCheckpoint's LogicalRDD reports UnknownPartitioning (the
    # adaptive plan's final partitioning isn't known at checkpoint
    # time), so the old repartition-then-checkpoint order silently fed
    # every downstream join/window an unpartitioned scan — the "shared"
    # exchange ran as a wasted full shuffle plus FOUR
    # ENSURE_REQUIREMENTS exchanges (measured in the r13 plan dump).
    # Now only the KEY branch is repartitioned, ABOVE the checkpoint
    # (filters cannot push below it, so the exchange stays put), on
    # (doc_id, page_number) EXACTLY: join co-partitioning requires the
    # full equi-key set by default
    # (spark.sql.requireAllClusterKeysForCoPartition), so (doc, page)
    # is the spine everything rides — the anti joins and the candidate
    # join take it as the left side, while the subset rule lets both
    # windows — (doc,page,key_box) / (doc,page,value_box) — ride the
    # same partitioning with zero further exchanges. The value and
    # table branches are left to ENSURE_REQUIREMENTS: at bench widths
    # they broadcast with no exchange at all; at scale the planner
    # inserts exactly one (doc,page) exchange per branch where a
    # sort-merge join demands it (ReuseExchange shares the table one
    # across both anti joins). page_number is a genuine RDD attribute
    # below the checkpoint, so a constant page column can't
    # constant-fold out of the window specs and defeat the subset
    # match. Skew bound: one partition holds whole pages — boxes per
    # page, never corpus-sized.
    detections = detections.localCheckpoint(eager=False)
    keys = detections.filter(F.col("kind") == key_kind).repartition(
        "doc_id", "page_number"
    )
    vals = detections.filter(F.col("kind") == value_kind)
    if skip_table_regions:
        tables = detections.filter(F.col("kind") == table_kind)
        keys = _drop_in_tables(keys, tables, TABLE_SUBREGION_THRESHOLD)
        vals = _drop_in_tables(vals, tables, TABLE_SUBREGION_THRESHOLD)

    k, v = keys.alias("k"), vals.alias("v")
    overlap_h = (
        F.least(F.col("k.y2"), F.col("v.y2"))
        - F.greatest(F.col("k.y1"), F.col("v.y1"))
    )
    min_height = F.least(
        F.col("k.y2") - F.col("k.y1"), F.col("v.y2") - F.col("v.y1")
    )
    overlap_w = (
        F.least(F.col("k.x2"), F.col("v.x2"))
        - F.greatest(F.col("k.x1"), F.col("v.x1"))
    )
    min_width = F.least(
        F.col("k.x2") - F.col("k.x1"), F.col("v.x2") - F.col("v.x1")
    )
    gap_x = F.col("v.x1") - F.col("k.x2")
    gap_y = F.col("v.y1") - F.col("k.y2")
    inline = (
        (gap_x >= 0)
        & (gap_x <= max_gap)
        & (overlap_h > same_line_overlap * min_height)
    )
    below = (
        (gap_y >= 0)
        & (gap_y <= max_gap)
        & (overlap_w > below_overlap * min_width)
    )
    # LEFT candidate join (r13): orphan keys (no geometric candidate)
    # ride through as one NULL-value row instead of being resurrected
    # by a second corpus-scale (doc,page,box) join at the end — the
    # old `keys LEFT JOIN won` re-shuffled BOTH sides on the full key
    # triple (requireAllClusterKeysForCoPartition). The NULL guards on
    # relation/gap keep orphan rows NULL (an unguarded
    # when(inline).otherwise('below') would label them 'below').
    cand = (
        k.join(v, _same_page("k", "v") & (inline | below), "left")
        .select(
            F.col("k.doc_id").alias("doc_id"),
            F.col("k.page_number").alias("page_number"),
            F.col("k.box_id").alias("key_box_id"),
            F.col("k.text").alias("key_text"),
            F.col("v.box_id").alias("value_box_id"),
            F.col("v.text").alias("value_text"),
            # inline wins over below when a candidate satisfies both
            F.when(F.col("v.box_id").isNull(), F.lit(None).cast("string"))
            .when(inline, F.lit("inline"))
            .otherwise(F.lit("below"))
            .alias("relation"),
            F.when(inline, gap_x).otherwise(gap_y).cast("double").alias("gap"),
        )
    )
    rel_rank = F.when(F.col("relation") == "inline", 0).otherwise(1)
    per_key = Window.partitionBy("doc_id", "page_number", "key_box_id").orderBy(
        rel_rank, F.col("gap").asc(), F.col("value_box_id").asc()
    )
    best = cand.withColumn("_rk", F.row_number().over(per_key)).filter(
        F.col("_rk") == 1
    )
    # value-conflict resolution WITHOUT the old drop-then-rejoin: a
    # per-key winner that loses its value to a closer key keeps its
    # row and NULLs the value columns — bit-identical output to
    # `keys LEFT JOIN won` (the join produced exactly one row per key,
    # NULL-extended for orphans and conflict losers). Orphan rows
    # (value_box_id NULL) share the NULL partition of this window;
    # their rank is irrelevant because their value columns are NULL
    # either way.
    per_value = Window.partitionBy(
        "doc_id", "page_number", "value_box_id"
    ).orderBy(rel_rank, F.col("gap").asc(), F.col("key_box_id").asc())
    wv = F.col("value_box_id").isNotNull() & (
        F.row_number().over(per_value) == 1
    )
    out = best.select(
        "doc_id",
        "page_number",
        "key_box_id",
        "key_text",
        F.when(wv, F.col("value_box_id")).alias("value_box_id"),
        F.when(wv, F.col("value_text")).alias("value_text"),
        F.when(wv, F.col("relation")).alias("relation"),
        F.when(wv, F.col("gap")).alias("gap"),
        F.when(
            wv,
            F.round(
                F.lit(1.0) / (F.lit(1.0) + F.col("gap") / F.lit(100.0)), 6
            ),
        ).alias("confidence"),
    )
    return out


def form_elements(pairs: DataFrame) -> DataFrame:
    """Fold paired kv rows into one ``FormKeysValues`` element per page
    — the reference element shape: ``metadata.key_value_pairs`` is an
    array of {key_text, key_element_id, value_text, value_element_id,
    confidence} structs (``documents/elements.py:138-147``), text is
    the newline-joined "key: value" render. Deterministic order:
    key_box_id ascending (sort_array on a struct keyed by it)."""
    kv = F.struct(
        F.col("key_box_id").cast("long").alias("key_element_id"),
        F.col("key_text").alias("key_text"),
        F.col("value_box_id").cast("long").alias("value_element_id"),
        F.col("value_text").alias("value_text"),
        F.col("confidence").alias("confidence"),
    )
    agg = (
        pairs.groupBy("doc_id", "page_number")
        .agg(F.sort_array(F.collect_list(kv)).alias("key_value_pairs"))
    )
    render = F.array_join(
        F.transform(
            F.col("key_value_pairs"),
            lambda p: F.concat(
                p["key_text"],
                F.lit(": "),
                F.coalesce(p["value_text"], F.lit("")),
            ),
        ),
        "\n",
    )
    return agg.select(
        "doc_id",
        "page_number",
        F.lit("FormKeysValues").alias("element_type"),
        render.alias("text"),
        "key_value_pairs",
    )


def form_kv_from_text(
    df: DataFrame,
    *,
    text: str = "text",
    doc_id: str = "doc_id",
    max_key_chars: int = 80,
) -> DataFrame:
    """Rule-based "Label: value" extraction from plain text lines — the
    model-free fallback that needs no detections at all (useful on
    partition output where forms render as "Name: Jane" lines).
    Returns (doc_id, line_no, key, value); lines without a colon match
    are dropped. Zero shuffle: posexplode + regexp per row."""
    pat = rf"^\s*([^:]{{1,{max_key_chars}}}?)\s*:\s*(.*\S)\s*$"
    lines = df.select(
        F.col(doc_id).alias("doc_id"),
        F.posexplode(F.split(F.col(text), "\n")).alias("line_no", "_line"),
    )
    return (
        lines.select(
            "doc_id",
            F.col("line_no").cast("bigint").alias("line_no"),
            F.regexp_extract(F.col("_line"), pat, 1).alias("key"),
            F.regexp_extract(F.col("_line"), pat, 2).alias("value"),
        )
        .filter(F.col("key") != "")
    )
