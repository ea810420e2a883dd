"""Spark plumbing for HTML main-content extraction (boilerplate
removal) — parsers/main_content.py distributed over a corpus: the
WARC→text step of a crawl pipeline (read_warc emits raw HTML as
``text`` for text/html records; this turns it into article text).

Scale shape: map-only. Each document classifies independently inside
mapInPandas (Arrow batches, bounded flush); no shuffle anywhere —
composes with read_warc / read_warc_paths into a zero-shuffle
crawl-to-corpus ingest. Per-row cost is linear in page size.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame

BLOCK_SCHEMA = (
    "doc_id bigint, seq int, tag string, text string, chars int,"
    " link_chars int, heading boolean, hint boolean, cls string"
)

MAIN_SCHEMA = (
    "doc_id bigint, n_blocks int, n_good int, main_chars bigint,"
    " main_text string"
)


def extract_blocks(
    df: DataFrame,
    *,
    html_col: str = "text",
    doc_id: str = "doc_id",
    short_chars: int = 40,
    max_link_pct: int = 33,
    flush_every: int = 2048,
) -> DataFrame:
    """One row per visible block with its classification — the audit
    view (which blocks died, and why, via chars/link_chars/hint)."""
    import pandas as pd

    from unstructured_spark.parsers.main_content import (
        classify_blocks,
        segment_blocks,
    )

    src = df.select(doc_id, html_col)
    cols = [f.strip().split()[0] for f in BLOCK_SCHEMA.split(",")]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows: list[dict] = []
        for pdf in batches:
            for did, html in zip(pdf[doc_id], pdf[html_col]):
                blocks = classify_blocks(
                    segment_blocks(html if html is not None else ""),
                    short_chars=short_chars,
                    max_link_pct=max_link_pct,
                )
                for b in blocks:
                    rows.append({
                        "doc_id": did,
                        "seq": b["seq"],
                        "tag": b["tag"],
                        "text": b["text"],
                        "chars": b["chars"],
                        "link_chars": b["link_chars"],
                        "heading": b["heading"],
                        "hint": b["hint"],
                        "cls": b["cls"],
                    })
                    if len(rows) >= flush_every:
                        yield pd.DataFrame(rows, columns=cols)
                        rows = []
        yield pd.DataFrame(rows, columns=cols)

    return src.mapInPandas(gen, BLOCK_SCHEMA)


def extract_main_content(
    df: DataFrame,
    *,
    html_col: str = "text",
    doc_id: str = "doc_id",
    short_chars: int = 40,
    max_link_pct: int = 33,
    flush_every: int = 512,
) -> DataFrame:
    """One row per document: good blocks joined by blank lines, plus
    the block counts a filter-attribution audit wants. The per-doc
    rollup happens INSIDE the UDF (block lists are page-bounded), so
    the plan stays exchange-free — no groupBy."""
    import pandas as pd

    from unstructured_spark.parsers.main_content import (
        classify_blocks,
        segment_blocks,
    )

    src = df.select(doc_id, html_col)
    cols = [f.strip().split()[0] for f in MAIN_SCHEMA.split(",")]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # columnar accumulation (r13): one list per output column and
        # one DataFrame per flush — the former per-page dict rows paid
        # a dict build per document plus the slow from-records
        # DataFrame constructor
        out: list[list] = [[] for _ in cols]
        for pdf in batches:
            for did, html in zip(pdf[doc_id], pdf[html_col]):
                blocks = classify_blocks(
                    segment_blocks(html if html is not None else ""),
                    short_chars=short_chars,
                    max_link_pct=max_link_pct,
                )
                good = [b["text"] for b in blocks if b["cls"] == "good"]
                main = "\n\n".join(good)
                out[0].append(did)
                out[1].append(len(blocks))
                out[2].append(len(good))
                out[3].append(len(main))
                out[4].append(main)
                if len(out[0]) >= flush_every:
                    yield pd.DataFrame(dict(zip(cols, out)))
                    out = [[] for _ in cols]
        yield pd.DataFrame(dict(zip(cols, out)), columns=cols)

    return src.mapInPandas(gen, MAIN_SCHEMA)


PAGE_META_SCHEMA = (
    "doc_id bigint, title string, description string,"
    " canonical_url string, lang string, robots_meta string,"
    " noindex boolean"
)


def extract_page_metadata(
    df: DataFrame,
    *,
    html_col: str = "text",
    doc_id: str = "doc_id",
    flush_every: int = 2048,
) -> DataFrame:
    """Per-page <head> metadata (parsers/page_meta.py) distributed:
    title / description / canonical URL / lang / robots directives +
    the noindex drop flag. Map-only; the head-only parse bounds
    per-row cost by head size, not page size. Feed ``canonical_url``
    into functions/urls.py dedup_by_url to collapse syndicated
    copies onto the publisher's key."""
    import pandas as pd

    from unstructured_spark.parsers.page_meta import page_metadata

    src = df.select(doc_id, html_col)
    cols = [f.strip().split()[0] for f in PAGE_META_SCHEMA.split(",")]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # columnar accumulation (r13) — see extract_main_content
        out: list[list] = [[] for _ in cols]
        keys = ("title", "description", "canonical_url", "lang",
                "robots_meta", "noindex")
        for pdf in batches:
            for did, html in zip(pdf[doc_id], pdf[html_col]):
                m = page_metadata(html if html is not None else "")
                out[0].append(did)
                for i, k in enumerate(keys, start=1):
                    out[i].append(m[k])
                if len(out[0]) >= flush_every:
                    yield pd.DataFrame(dict(zip(cols, out)))
                    out = [[] for _ in cols]
        yield pd.DataFrame(dict(zip(cols, out)), columns=cols)

    return src.mapInPandas(gen, PAGE_META_SCHEMA)
