"""Structured-Streaming ingest: continuously partition documents as
they arrive (SURVEY §2.10 "Streaming" row).

The reference has no streaming semantics of its own — its unit of work
(one document → its elements) is stateless, which is exactly what makes
the Spark mapping trivial: ``readStream.format("binaryFile")`` →
the same ``mapInPandas`` parse → ``writeStream``. No watermark is
needed because a document is fully contained in one input row.

Chunking inside a stream: ``groupBy().applyInPandas`` /
``sortWithinPartitions`` are not available on unaggregated streams, but
chunking is per-document and the parse UDF already holds the whole
document — so the streaming pipeline runs the chunk fold *inside the
same pass* (zero extra shuffle, stateless microbatches).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from unstructured_spark.operators.partition_auto import partition_documents
from unstructured_spark.schema import ELEMENT_SCHEMA


def read_document_stream(
    spark: SparkSession,
    input_dir: str,
    *,
    glob: str = "*",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming documents DataFrame from a watched directory
    (binaryFile source; swap for Auto Loader on Databricks-like
    platforms). ``path`` doubles as ``doc_id``."""
    reader = (
        spark.readStream.format("binaryFile")
        .option("pathGlobFilter", glob)
        .schema(
            "path string, modificationTime timestamp, length long, content binary"
        )
    )
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.load(input_dir)
    return stream.select(
        F.col("path").alias("doc_id"),
        "path",
        "content",
        F.col("modificationTime").alias("last_modified"),
    )


def partition_stream(docs: DataFrame) -> DataFrame:
    """Streaming elements DataFrame — the identical parse operator as
    batch (stateless mapInPandas works unchanged in a stream)."""
    return partition_documents(docs)


def partition_and_chunk_stream(
    docs: DataFrame,
    *,
    by_title: bool = True,
    **chunk_kwargs,
) -> DataFrame:
    """Parse AND chunk each arriving document in one UDF pass.

    The chunk fold needs the whole ordered document, which the parse
    UDF already has per input row — fusing them avoids the shuffle that
    batch chunking uses and sidesteps streaming's no-sort rule.
    """
    from unstructured_spark.operators.chunking import (
        ChunkingOptions,
        _make_batched_fold,
    )

    opts = ChunkingOptions(**chunk_kwargs)
    elements = partition_documents(docs)
    # parse output is doc-contiguous and ordered within each partition,
    # which is all the batched fold needs; its carry-buffer handles docs
    # that straddle Arrow batch boundaries between the two UDF nodes
    return elements.mapInPandas(
        _make_batched_fold(opts, by_title), schema=ELEMENT_SCHEMA
    )


def write_elements_stream(
    elements: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    *,
    available_now: bool = False,
    fmt: str = "parquet",
) -> StreamingQuery:
    """Sink the element stream (exactly-once via checkpoint). With
    ``available_now`` the query drains the backlog and stops — the
    batch-refresh pattern; without it the query runs continuously."""
    writer = (
        elements.writeStream.format(fmt)
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
