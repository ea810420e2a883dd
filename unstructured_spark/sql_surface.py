"""SQL-facing engine surface: table functions + scalar UDF registry
(SURVEY §4 item 4 — ``PARTITION_DOC(...)`` as a SQL TVF via Python
UDTF; §2.10 "UDF surface" row).

After ``register_sql_surface(spark)``::

    SELECT d.doc_id, p.*
    FROM docs d, LATERAL partition_doc(d.content, d.path) p

    SELECT clean_text(' • spam  ') -- 'spam'
    SELECT detect_filetype_name(NULL, content) FROM raw_files
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf


@udtf(returnType=(
    "element_index int, element_id string, type string, text string, "
    "page_number int, category_depth int, parent_id string, languages array<string>"
))
class PartitionDocUdtf:
    """One document's bytes → ordered element rows (lateral-join shape:
    the SQL analog of the ``partition_documents`` operator)."""

    def eval(self, content, filename=None):  # noqa: D102
        from unstructured_spark.operators.metadata import py_finalize_doc
        from unstructured_spark.parsers.dispatch import partition_bytes

        if content is None:
            return
        raw = bytes(content) if not isinstance(content, (bytes, str)) else content
        try:
            els = partition_bytes(raw, filename=filename)
        except Exception:
            return
        rows = []
        for i, el in enumerate(els):
            rows.append(
                {
                    "element_index": i,
                    "type": el.get("type", "Text"),
                    "text": el.get("text", ""),
                    "page_number": el.get("page_number"),
                    "category_depth": el.get("category_depth"),
                    "parent_id": el.get("parent_id"),
                    "languages": el.get("languages"),
                    "element_id": el.get("element_id"),
                }
            )
        py_finalize_doc(rows, doc_id=filename or "doc", filename=filename)
        for r in rows:
            yield (
                r["element_index"], r["element_id"], r["type"], r["text"],
                r.get("page_number"), r.get("category_depth"),
                r.get("parent_id"), r.get("languages"),
            )


def register_sql_surface(spark: SparkSession) -> None:
    """Install the engine's SQL names into a session."""
    spark.udtf.register("partition_doc", PartitionDocUdtf)

    def _clean_text(s: str | None) -> str | None:
        if s is None:
            return None
        import re

        from unstructured_spark.functions.patterns import _BULLET_CLASS

        s = re.sub(r"^\s*[" + _BULLET_CLASS + r"]\s*", "", s)
        return re.sub(r"\s+", " ", s).strip()

    def _detect(filename: str | None, head) -> str | None:
        from unstructured_spark.parsers.filetype import detect_filetype

        raw = bytes(head) if head is not None else None
        return detect_filetype(filename=filename, head=raw)

    spark.udf.register("clean_text", _clean_text, "string")
    spark.udf.register("detect_filetype_name", _detect, "string")
