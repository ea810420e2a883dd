"""Frequency sketches for corpus-scale token statistics.

At 100 TB an exact (token, count) table is itself a large dataset; a
count-min sketch (Cormode & Muthukrishnan 2005) answers point
frequency queries from a FIXED d×w counter grid that fits in one
broadcast. The reference keeps exact counts (its corpora fit);
``SCALING.md`` documents "swap in a sketch rollup consciously, not
silently" — this module is that swap, with the same determinism bar as
everything else in the repo: the hash family is md5-derived, so Spark
and an external SQL engine build and probe the SAME sketch cell for
cell, and the estimate-vs-exact error audit is oracle-checkable.

Design notes (Spark-first):
- The sketch is built from the ``word_counts`` vocabulary table, not
  the raw token stream: the one corpus-wide shuffle already happened
  there, and exploding d rows per DISTINCT word costs O(d·|vocab|),
  not O(d·corpus tokens). Weights ride along, so the counters are
  identical to streaming every occurrence.
- CMS guarantees est >= exact (counters only ever add); the audit
  reports per-token overcount so a user can size (d, w) against their
  vocabulary's actual skew instead of guessing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["cms_from_counts", "cms_error_audit"]


def _cms_bucket(item: Column, row: int, width: int) -> Column:
    """Deterministic bucket for hash row ``row``: 60-bit md5 prefix of
    the salted item, mod width. DuckDB replays it as
    ``cast(('0x'||substr(md5('cms'||r||':'||token),1,15)) as bigint) % w``."""
    salted = F.concat(F.lit(f"cms{row}:"), item)
    return (
        F.conv(F.substring(F.md5(salted), 1, 15), 16, 10).cast("bigint")
        % int(width)
    )


def cms_from_counts(
    wc: DataFrame,
    *,
    item: str = "word",
    weight: str = "n",
    d: int = 4,
    w: int = 2048,
) -> DataFrame:
    """Build the d×w count-min grid from a pre-aggregated
    ``(item, weight)`` frequency table: every item increments one
    bucket per hash row by its full weight. Returns
    ``(r, b, cnt)`` — at most ``d·w`` rows, broadcastable at any
    corpus size. Incremental-friendly: grids from two corpus slices
    merge by summing matching cells (counters are linear)."""
    buckets = F.array(
        *[_cms_bucket(F.col(item), r, w) for r in range(int(d))]
    )
    return (
        wc.select(
            F.posexplode(buckets).alias("r", "b"),
            F.col(weight).alias("_w"),
        )
        .groupBy("r", "b")
        .agg(F.sum("_w").cast("bigint").alias("cnt"))
    )


def cms_error_audit(
    df: DataFrame,
    *,
    text: str = "text",
    top_k: int = 50,
    d: int = 4,
    w: int = 2048,
    lowercase: bool = True,
) -> DataFrame:
    """Exact-vs-sketch audit over the corpus's top-k tokens: build the
    CMS from the full vocabulary, probe it for the k most frequent
    tokens, and report ``(token, exact_cnt, cms_est, overcount_ppm)``.
    ``cms_est >= exact_cnt`` always (count-min never undercounts);
    ``overcount_ppm = 1e6·(est-exact) div exact`` is the integer-exact
    relative error a user reads to size (d, w) for their corpus's
    skew before swapping the sketch in for exact counts.

    Scale shape: ONE corpus shuffle (the word-count aggregation,
    checkpointed so the sketch build and the top-k both consume the
    REDUCED vocabulary instead of re-aggregating the corpus), then
    everything downstream is vocab- or d·w-bounded; the sketch joins
    broadcast."""
    from unstructured_spark.operators.tokenizer import word_counts

    wc = word_counts(df, text=text, lowercase=lowercase).localCheckpoint(
        eager=False
    )
    sk = cms_from_counts(wc, d=d, w=w)
    top = wc.orderBy(F.desc("n"), F.asc("word")).limit(int(top_k))
    probes = top.select(
        "word",
        "n",
        F.posexplode(
            F.array(*[_cms_bucket(F.col("word"), r, w) for r in range(int(d))])
        ).alias("r", "b"),
    )
    return (
        probes.join(F.broadcast(sk), ["r", "b"])
        .groupBy("word", "n")
        .agg(F.min("cnt").alias("est"))
        .select(
            F.col("word").alias("token"),
            F.col("n").cast("bigint").alias("exact_cnt"),
            F.col("est").cast("bigint").alias("cms_est"),
            F.expr("(est - n) * 1000000 div n").cast("bigint").alias(
                "overcount_ppm"
            ),
        )
    )
