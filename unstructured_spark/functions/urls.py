"""URL canonicalization — the step-zero normalization every web-scale
training pipeline (RefinedWeb, CCNet, Dolma) runs before URL-keyed
dedup: the same page is crawled as ``http://www.Example.com/a/?utm_…``
and ``https://example.com/a`` and must collapse to one key.

Beyond-reference surface, companion to ``sources/warc.py`` (the WARC
ingest emits ``target_uri``; this collapses it to the dedup key).

All pure JVM column expressions (regexp + array ops, no UDF, zero
shuffle) and engine-portable: every step is replayable in ANSI-ish SQL
with the same regexes, which is what makes the ``q_url_dedup`` DuckDB
oracle possible.

Canonical form (deliberately dedup-oriented, not RFC-strict):

1. fragment stripped (``#…`` never reaches the server);
2. scheme lowered; ``https`` folded to ``http`` (they serve the same
   document in any modern crawl). The fold is gated on the scheme
   actually being http/https — ``ftp://example.com/x`` keeps its own
   scheme and must NOT collapse onto the http key (documents served
   over different protocols are different fetches);
3. host lowered; for http/https only, leading ``www.`` and the
   default ports ``:80`` / ``:443`` stripped (other schemes have
   different defaults, so their ports pass through);
4. tracking query params dropped (``utm_*``, ``fbclid``, ``gclid``,
   ``ref``), the survivors sorted by full ``k=v`` text so param order
   never splits a key;
5. trailing slashes stripped from the path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# params that identify a campaign, not a document
TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid|ref)(=.*)?$"


def canonical_url(url: Column | str) -> Column:
    """Collapse a URL column to its canonical dedup key (see module
    docstring for the five steps). NULL input → NULL output; a value
    with no ``scheme://`` prefix passes through steps 1/4/5 only (host
    rules don't apply when there is no authority part)."""
    u = F.col(url) if isinstance(url, str) else url
    u1 = F.regexp_replace(u, "#.*", "")
    scheme = F.lower(F.regexp_extract(u1, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    is_web = scheme.isin("http", "https")
    host = F.lower(F.regexp_extract(u1, r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)", 1))
    # www / default-port folding is an http(s) convention — gated so
    # ftp://example.com/x never collapses onto the http:// dedup key
    host = F.when(
        is_web,
        F.regexp_replace(
            F.regexp_replace(host, r"^www\.", ""), r":(80|443)$", ""
        ),
    ).otherwise(host)
    out_scheme = F.when(is_web, F.lit("http")).otherwise(scheme)
    path = F.regexp_extract(u1, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    path = F.regexp_replace(path, "/+$", "")
    query = F.regexp_extract(u1, r"\?([^#]*)", 1)
    params = F.array_join(
        F.array_sort(
            F.filter(
                F.split(query, "&"),
                lambda p: (p != F.lit(""))
                & ~p.rlike(TRACKING_PARAM_RE),
            )
        ),
        "&",
    )
    tail = F.when(params == "", F.lit("")).otherwise(F.concat(F.lit("?"), params))
    with_authority = F.concat(out_scheme, F.lit("://"), host, path, tail)
    # no authority part: keep the (fragment-stripped) body, normalize
    # query/trailing-slash the same way
    bare = F.concat(
        F.regexp_replace(F.regexp_replace(u1, r"\?[^#]*", ""), "/+$", ""),
        tail,
    )
    return F.when(u.isNull(), F.lit(None).cast("string")).otherwise(
        F.when(scheme == "", bare).otherwise(with_authority)
    )


def dedup_by_url(
    df: DataFrame,
    *,
    url: str = "target_uri",
    doc_id: str = "doc_id",
) -> DataFrame:
    """URL-keyed exact dedup: one row per canonical URL with the kept
    (minimum) doc id and the collapse count — the first dedup pass a
    crawl pipeline runs, BEFORE any content hashing, because it is
    map-only + one uniform-key shuffle and typically removes the bulk
    of recrawl duplicates for free.

    Returns (canonical_url, keep_id, dup_count).

    Scale shape: one projection (the canonicalization is pure string
    expressions inside whole-stage codegen) + one groupBy on the
    canonical key — map-side-combinable, uniform md5-like key spread
    (URL keys are near-unique; the hottest recrawl key is bounded by
    the crawler's per-URL fetch count, not corpus size)."""
    return (
        df.select(
            canonical_url(F.col(url)).alias("canonical_url"),
            F.col(doc_id).alias("_d"),
        )
        .groupBy("canonical_url")
        .agg(
            F.min("_d").alias("keep_id"),
            F.count("*").cast("bigint").alias("dup_count"),
        )
    )
