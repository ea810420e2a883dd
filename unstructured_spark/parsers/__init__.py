"""Pure-Python per-format element generators.

These run *inside* Spark UDFs (mapInPandas over document rows) — the
executor-side counterpart of the reference's per-format partitioners
(SURVEY §2.1). Each generator takes document content and yields plain
dicts in the canonical element schema; the Spark operator layer
(`operators/partition_auto.py`) handles distribution, ordering, and
metadata finalization.

Everything is stdlib-only (this container has no lxml/bs4/markdown);
the HTML parser implements the reference's flow/phrasing block model on
top of ``html.parser.HTMLParser``.
"""
