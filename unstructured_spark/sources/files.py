"""File-based document sources → the canonical documents DataFrame
(doc_id, path, content, content_type, size, modified_at).

Batch: ``spark.read.format("binaryFile")`` — distributed scan, one row
per file, predicate pushdown on path/modificationTime/length.
Streaming: ``spark.readStream.format("binaryFile")`` — continuous
ingest of arriving documents (SURVEY §2.10 streaming row).

At 100 TB, prefer ``paths_table`` + executor-side opens over inlined
bytes (binaryFile rows are capped at 2 GB and double-buffer memory);
these helpers keep both shapes behind one schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _normalize(df: DataFrame) -> DataFrame:
    return df.select(
        F.sha2(F.col("path"), 256).substr(1, 32).alias("doc_id"),
        F.col("path"),
        F.col("content"),
        F.lit(None).cast("string").alias("content_type"),
        F.col("length").alias("size"),
        F.col("modificationTime").alias("modified_at"),
    )


def read_documents(
    spark: SparkSession,
    path: str,
    *,
    glob: str | None = None,
    recursive: bool = True,
) -> DataFrame:
    """Batch-read a directory of files as a documents DataFrame."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    return _normalize(reader.load(path))


def stream_documents(
    spark: SparkSession,
    path: str,
    *,
    glob: str | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Structured-Streaming source over arriving files."""
    reader = spark.readStream.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return _normalize(reader.load(path))
