"""RST / Org structural parsers and the batched standalone hierarchy
operator."""

from __future__ import annotations

from pyspark.sql import functions as F

from unstructured_spark.parsers.structured_text import (
    org_to_elements,
    rst_to_elements,
)

RST = """Example Docs
============

The sample docs directory contains the following files:

- ``one.html`` first file
- ``two.pdf`` second file

Subsection Here
---------------

Paragraph under the subsection. It spans
two source lines.

Code sample::

    print("hello")
    x = 1

.. include:: should_not_appear
"""

ORG = """* Top Heading
Some paragraph text under the heading. It is narrative.

** Nested Heading
- item one
- item two

#+BEGIN_SRC python
print("hi")
#+END_SRC
"""


class TestRst:
    def test_titles_with_depth(self):
        els = rst_to_elements(RST)
        titles = [
            (e["text"], e.get("category_depth"))
            for e in els
            if e["type"] == "Title"
        ]
        assert ("Example Docs", 0) in titles
        assert ("Subsection Here", 1) in titles

    def test_lists_and_code(self):
        els = rst_to_elements(RST)
        assert any(e["type"] == "ListItem" for e in els)
        code = next(e for e in els if e["type"] == "CodeSnippet")
        assert 'print("hello")' in code["text"]

    def test_directive_skipped(self):
        els = rst_to_elements(RST)
        assert not any("should_not_appear" in e["text"] for e in els)


class TestOrg:
    def test_headings_by_stars(self):
        els = org_to_elements(ORG)
        assert {
            (e["text"], e["category_depth"]) for e in els if e["type"] == "Title"
        } == {("Top Heading", 0), ("Nested Heading", 1)}

    def test_lists_and_src_block(self):
        els = org_to_elements(ORG)
        assert [e["text"] for e in els if e["type"] == "ListItem"] == [
            "item one", "item two",
        ]
        assert any(e["type"] == "CodeSnippet" for e in els)


class TestBatchedHierarchyOperator:
    def test_standalone_dataframe_form(self, spark):
        from unstructured_spark.operators.metadata import set_element_hierarchy

        rows = []
        for d in ("d1", "d2"):
            rows += [
                (d, 0, f"{d}-t", "Title", "Heading", 0),
                (d, 1, f"{d}-n", "NarrativeText", "Body text", None),
                (d, 2, f"{d}-l", "ListItem", "item", 0),
            ]
        df = spark.createDataFrame(
            rows,
            "doc_id string, element_index long, element_id string, "
            "type string, text string, category_depth int",
        )
        out = {
            (r["doc_id"], r["element_id"]): r["parent_id"]
            for r in set_element_hierarchy(df).collect()
        }
        for d in ("d1", "d2"):
            assert out[(d, f"{d}-n")] == f"{d}-t"
            assert out[(d, f"{d}-l")] == f"{d}-t"
            assert out[(d, f"{d}-t")] is None
