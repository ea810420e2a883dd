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


def chunk_by_attention_window(
    text: str,
    tokenizer,
    buffer: int = 2,
    max_input_size: int | None = None,
    split_function=None,
    chunk_separator: str = " ",
) -> list[str]:
    """Reference-exact replay of ``chunk_by_attention_window``
    (staging/huggingface.py:32-98): greedy word packing where each
    segment's cost is ``len(tokenizer.tokenize(segment))``, window =
    ``max_input_size - buffer`` (default ``tokenizer.model_max_length``),
    separators cost zero tokens, a mid-text flush appends
    ``chunk_separator.strip()`` (empty for the default space), and an
    oversized single segment raises ValueError.

    ``tokenizer`` is any object with ``.tokenize(str) -> list`` (a
    HuggingFace ``PreTrainedTokenizer``, or a duck-typed stand-in —
    ``.model_max_length`` only needed when ``max_input_size`` is None).
    """
    if max_input_size is None:
        max_input_size = tokenizer.model_max_length
    if buffer < 0 or buffer >= max_input_size:
        raise ValueError(
            f"buffer is set to {buffer}. Must be greater than zero and "
            f"smaller than max_input_size, which is {max_input_size}."
        )
    if split_function is None:
        split_function = lambda t: t.split(" ")  # noqa: E731
    max_chunk_size = max_input_size - buffer
    split_text = split_function(text)
    num_splits = len(split_text)

    chunks: list[str] = []
    chunk_text = ""
    chunk_size = 0
    for i, segment in enumerate(split_text):
        num_tokens = len(tokenizer.tokenize(segment))
        if num_tokens > max_chunk_size:
            raise ValueError(
                f"The number of tokens in the segment is {num_tokens}. "
                f"The maximum number of tokens is {max_chunk_size}. "
                "Consider using a different split_function to reduce the "
                "size of the segments under consideration. The text that "
                f"caused the error is: \n\n{segment}"
            )
        if chunk_size + num_tokens > max_chunk_size:
            chunks.append(chunk_text + chunk_separator.strip())
            chunk_text = ""
            chunk_size = 0
        if chunk_size > 0:
            chunk_text += chunk_separator
        chunk_text += segment
        chunk_size += num_tokens
        if i == (num_splits - 1) and len(chunk_text) > 0:
            chunks.append(chunk_text)
    return chunks


def load_hf_tokenizer(model_name: str):
    """Import-gated HuggingFace tokenizer loader for
    ``stage_for_transformers(tokenizer=...)`` (the reference passes a
    ``PreTrainedTokenizer`` in directly; this is the one-liner users
    without the import habit reach for)."""
    try:
        from transformers import AutoTokenizer  # type: ignore
    except ImportError as e:  # pragma: no cover - not in container
        raise ImportError(
            "load_hf_tokenizer needs the optional 'transformers' package; "
            "python -m unstructured_spark.doctor lists this gate"
        ) from e
    return AutoTokenizer.from_pretrained(model_name)


def stage_for_transformers(
    df: DataFrame,
    *,
    window_chars: int = 2000,
    tokenizer=None,
    buffer: int = 2,
    max_input_size: int | None = None,
) -> DataFrame:
    """Split element text to a model attention window (reference
    staging/huggingface.py).

    Two modes:

    - ``tokenizer=None`` (default, dependency-free): char-approximated
      fixed windows of ``window_chars``; output has ``window_start``
      (char offset).
    - ``tokenizer=<HF tokenizer or duck-type>``: reference-exact token
      packing via :func:`chunk_by_attention_window`, run as an
      Arrow-batched pandas UDF (the tokenizer ships to executors via
      pickle — HF fast tokenizers serialize fine); output has
      ``window_index`` (chunk ordinal). Boundaries match the reference
      byte-for-byte for the same tokenizer.
    """
    if tokenizer is not None:
        from pyspark.sql.functions import pandas_udf

        if max_input_size is None:
            # resolve on the driver so executors don't need the attr
            max_input_size = int(tokenizer.model_max_length)

        def _chunk_series(s):
            return s.map(
                lambda t: chunk_by_attention_window(
                    t or "",
                    tokenizer,
                    buffer=buffer,
                    max_input_size=max_input_size,
                )
            )

        _chunks = pandas_udf(_chunk_series, "array<string>")

        return df.select(
            "doc_id",
            "element_id",
            F.posexplode(_chunks(F.col("text"))).alias("window_index", "text"),
        ).filter(F.col("text") != "")
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
