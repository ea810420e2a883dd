from unstructured_spark.streaming.pipeline import (  # noqa: F401
    partition_and_chunk_stream,
    partition_stream,
    read_document_stream,
    write_elements_stream,
)
