"""Streaming deduplication over continuously-arriving documents.

Beyond-reference surface (driver brief: dedup as a first-class
pipeline component; the reference has no streaming semantics —
SURVEY §2.10). Two bounded-state forms:

- :func:`dedup_stream` — exact near-real-time dedup:
  normalized-text fingerprint + ``dropDuplicatesWithinWatermark``.
  State is bounded by the watermark horizon (a duplicate arriving
  later than the watermark is emitted again — the right trade for an
  unbounded 100 TB/day feed, where global exact state would grow
  without limit).
- :func:`near_dedup_stream` — near-dup suppression: docs sharing any
  MinHash-LSH band bucket with an earlier-in-horizon doc are dropped.
  Uses the same engine-portable md5 minhash as the batch operator
  (operators/dedup.py), one ``dropDuplicatesWithinWatermark`` per
  band via explode — state per (band, key), again watermark-bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from unstructured_spark.operators.dedup import minhash_signatures  # noqa: F401  (batch twin)
from unstructured_spark.operators.text_analysis import fingerprint


def dedup_stream(
    docs: DataFrame,
    *,
    ts_col: str = "ingest_ts",
    text: str = "text",
    watermark: str = "1 hour",
) -> DataFrame:
    """Exact streaming dedup: first document with a given normalized
    fingerprint inside the watermark horizon survives; later copies
    are dropped. Returns the input columns + ``fingerprint``."""
    return (
        docs.withColumn("fingerprint", fingerprint(F.col(text)))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )


def near_dedup_stream(
    docs: DataFrame,
    *,
    ts_col: str = "ingest_ts",
    text: str = "text",
    doc_id: str = "doc_id",
    watermark: str = "1 hour",
    num_hashes: int = 16,
    bands: int = 8,
    shingle_size: int = 3,
) -> DataFrame:
    """Streaming near-dup suppression: a doc is kept only if NONE of
    its LSH band buckets has been seen within the watermark horizon.

    Implementation: per-row minhash signature (pure column exprs — the
    same staged md5 idiom as the batch operator, no state), explode to
    (band, key) rows, keep the first doc per bucket via
    ``dropDuplicatesWithinWatermark``, then count surviving buckets
    per doc: a near-dup loses every bucket to the earlier doc, a novel
    doc wins all of its own buckets. Docs winning at least one bucket
    are emitted (``bucket_wins`` exposes the margin).

    State: one entry per distinct (band, key) in the horizon — the
    same asymptotics as the batch LSH index, aged by the watermark.
    """
    rows_per_band = num_hashes // bands
    toks = F.filter(
        F.split(F.lower(F.trim(F.regexp_replace(F.col(text), "\\s+", " "))), " "),
        lambda t: t != "",
    )
    n = F.size(toks)
    grams = F.when(
        n >= shingle_size,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.greatest(n - F.lit(shingle_size) + 1, F.lit(1))),
                lambda i: F.concat_ws("_", F.slice(toks, i, shingle_size)),
            )
        ),
    ).otherwise(F.array(F.lit("")))
    staged = docs.select(
        F.col(doc_id).alias("doc_id"), F.col(ts_col), grams.alias("_g")
    )
    hashes = F.transform(
        F.col("_g"),
        lambda g: F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("bigint")
        % F.lit(2147483647),
    )
    staged = staged.select("doc_id", ts_col, hashes.alias("_h"))
    sig = F.array(
        *[
            F.array_min(
                F.transform(
                    F.col("_h"),
                    lambda v: (
                        F.lit(1000003 + 2 * h) * v + F.lit(17 + 31 * h)
                    )
                    % F.lit(2147483647),
                )
            )
            for h in range(num_hashes)
        ]
    )
    staged = staged.select("doc_id", ts_col, sig.alias("sig"))
    band_keys = F.array(
        *[
            F.concat_ws(
                ":",
                F.lit(str(b)),
                *[
                    F.element_at("sig", b * rows_per_band + r + 1).cast("string")
                    for r in range(rows_per_band)
                ],
            )
            for b in range(bands)
        ]
    )
    exploded = staged.select(
        "doc_id", ts_col, F.explode(band_keys).alias("bucket")
    )
    winners = (
        exploded.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["bucket"])
    )
    return winners.groupBy("doc_id").agg(
        F.count("*").alias("bucket_wins")
    )
