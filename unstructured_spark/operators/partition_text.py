"""partition_text — plain-text partitioner (reference ``partition/text.py``).

Spark-first design: the whole operator is native DataFrame ops —
paragraph split (``split`` on the blank-line regex) → ``posexplode``
(order-preserving) → trim/filter → ONE ``CASE WHEN`` classifier over
predicate columns (SURVEY §2.2: compute predicates once as columns).
No Python runs per row; the plan stays in whole-stage codegen and
scales linearly with input splits.

Reference lifecycle (partition/text.py:42-166): read → optional
paragraph grouping → split on ``\\n\\s*\\n`` → per-paragraph
``element_from_text`` decision tree.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from unstructured_spark.functions import cleaners, text_type
from unstructured_spark.functions.patterns import PARAGRAPH_SPLIT
from unstructured_spark.operators.metadata import (
    finalize_elements,
    widen_to_element_schema,
)


def partition_text(
    df: DataFrame,
    *,
    doc_id: str = "doc_id",
    text: str = "text",
    group_broken_paragraphs: bool = False,
    filename: str | Column | None = None,
    apply_metadata: bool = True,
) -> DataFrame:
    """Partition a DataFrame of text documents into the canonical
    elements schema. ``df`` needs (doc_id, text) columns; provenance
    columns present on ``df`` (filename, url, last_modified) are carried
    through.

    Returns one row per element with ``element_index`` preserving
    document order (posexplode position — never rely on row order).
    """
    text_col = F.col(text)
    if group_broken_paragraphs:
        text_col = cleaners.group_broken_paragraphs(text_col)

    paras = F.split(text_col, PARAGRAPH_SPLIT)
    exploded = df.select(
        F.col(doc_id).cast("string").alias("doc_id"),
        *(c for c in ("filename", "url", "last_modified") if c in df.columns),
        F.posexplode(paras).alias("para_index", "para"),
    ).withColumn("para", F.trim(F.regexp_replace("para", "\\s+", " ")))

    nonempty = exploded.filter(F.col("para") != "")

    classified = nonempty.select(
        "doc_id",
        *(c for c in ("filename", "url", "last_modified") if c in df.columns),
        F.col("para_index"),
        F.col("para").alias("text"),
        text_type.element_type_from_text(F.col("para")).alias("type"),
    )

    # re-densify ordinals after empty-paragraph drop: element_index must
    # be 0..n-1 per doc in document order
    from pyspark.sql.window import Window

    w = Window.partitionBy("doc_id").orderBy("para_index")
    elements = classified.withColumn(
        "element_index", F.row_number().over(w).cast("long") - 1
    ).drop("para_index")

    if filename is not None and "filename" not in df.columns:
        elements = elements.withColumn(
            "filename", filename if isinstance(filename, Column) else F.lit(filename)
        )

    if apply_metadata:
        return finalize_elements(elements)
    return widen_to_element_schema(elements)
