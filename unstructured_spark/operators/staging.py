"""Per-sink staging transforms (reference ``staging/*.py``; SURVEY
§2.8 "stage_for_{weaviate, label_studio, prodigy, argilla, datasaur,
baseplate, label_box}" row).

Each reference ``stage_for_X(elements)`` reshapes element dicts into a
sink-specific record form. Here each is a pure ``select`` over the
element table — Catalyst prunes unused columns down to the scan, and
the result feeds the corresponding Spark connector writer
(``df.write.format(...)``) or ``foreachBatch`` HTTP sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stage_for_weaviate(df: DataFrame) -> DataFrame:
    """Weaviate data objects: flat properties + optional vector
    (reference staging/weaviate.py: schema-conformant dicts)."""
    return df.select(
        F.col("element_id").alias("id"),
        F.col("text"),
        F.col("type").alias("category"),
        F.col("filename"),
        F.col("page_number"),
        F.col("url"),
        F.col("embeddings").alias("vector"),
    )


def stage_for_label_studio(df: DataFrame) -> DataFrame:
    """Label Studio import records: {data: {text, ref_id, ...}}
    (reference staging/label_studio.py)."""
    return df.select(
        F.struct(
            F.col("text"),
            F.col("element_id").alias("ref_id"),
            F.col("type"),
            F.col("filename"),
        ).alias("data")
    )


def stage_for_prodigy(df: DataFrame) -> DataFrame:
    """Prodigy JSONL tasks: text + meta{id, ...}
    (reference staging/prodigy.py)."""
    return df.select(
        F.col("text"),
        F.struct(
            F.col("element_id").alias("id"),
            F.col("type"),
            F.col("page_number"),
        ).alias("meta"),
    )


def stage_for_argilla(df: DataFrame) -> DataFrame:
    """Argilla text-classification records (reference
    staging/argilla.py): text + metadata map."""
    return df.select(
        F.col("text"),
        F.create_map(
            F.lit("element_id"), F.col("element_id"),
            F.lit("type"), F.col("type"),
            F.lit("filename"), F.coalesce(F.col("filename"), F.lit("")),
        ).alias("metadata"),
    )


def stage_for_datasaur(df: DataFrame) -> DataFrame:
    """Datasaur rows: text + empty entities list (reference
    staging/datasaur.py)."""
    return df.select(
        F.col("text"),
        F.array().cast("array<struct<id:string,type:string>>").alias("entities"),
    )


def stage_for_baseplate(df: DataFrame) -> DataFrame:
    """Baseplate rows: {data: {text}, metadata: {...}} (reference
    staging/baseplate.py)."""
    return df.select(
        F.struct(F.col("text")).alias("data"),
        F.struct(
            F.col("element_id"),
            F.col("type"),
            F.col("filename"),
            F.col("page_number"),
        ).alias("metadata"),
    )


def stage_for_label_box(df: DataFrame) -> DataFrame:
    """LabelBox data rows: external_id + row text (reference
    staging/label_box.py uploads to cloud storage first; the row shape
    is what we produce)."""
    return df.select(
        F.col("element_id").alias("external_id"),
        F.col("text").alias("row_data"),
    )


def stage_for_transformers(
    df: DataFrame, *, window_chars: int = 2000
) -> DataFrame:
    """Split element text to a model window (reference
    staging/huggingface.py chunk_by_attention_window, char-approximated;
    token-mode splitting lives in the chunker)."""
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.length("text") - 1, F.lit(0)),
        F.lit(window_chars),
    )
    return (
        df.withColumn("_start", F.explode(starts))
        .select(
            "doc_id",
            "element_id",
            F.col("_start").alias("window_start"),
            F.expr(f"substring(text, _start + 1, {window_chars})").alias("text"),
        )
        .filter(F.col("text") != "")
    )


def convert_to_coco(df: DataFrame) -> DataFrame:
    """COCO-style annotation rows from element coordinates (reference
    staging/base.py:734-830): one bbox annotation per element that has
    layout coordinates."""
    c = F.col("coordinates")
    xs = F.transform(c["points"], lambda p: p["x"])
    ys = F.transform(c["points"], lambda p: p["y"])
    x0 = F.array_min(xs)
    y0 = F.array_min(ys)
    w = F.array_max(xs) - x0
    h = F.array_max(ys) - y0
    return df.filter(c.isNotNull()).select(
        F.col("element_id").alias("id"),
        F.col("doc_id").alias("image_id"),
        F.col("type").alias("category_name"),
        F.array(x0, y0, w, h).alias("bbox"),
        (w * h).alias("area"),
        F.round(x0, 2).alias("x"),
        F.round(y0, 2).alias("y"),
    )


def flatten_metadata(df: DataFrame) -> DataFrame:
    """Reference flatten_dict (staging/base.py:551-597): the wide table
    IS the flat form; this selects the reference's flattened column
    order for CSV-style sinks."""
    core = [
        "type", "text", "element_id", "doc_id", "element_index",
        "filename", "file_directory", "filetype", "url", "page_number",
        "page_name", "parent_id", "category_depth", "languages",
        "text_as_html", "last_modified", "is_continuation",
    ]
    return df.select(*[c for c in core if c in df.columns])
