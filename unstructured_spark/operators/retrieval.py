"""Hybrid retrieval: rank fusion across lexical and vector rankings.

The standard RAG-corpus pattern: run BM25 (lexical) and ANN cosine
(semantic) retrieval independently, then merge with reciprocal-rank
fusion (Cormack/Clarke/Buettcher):

    RRF(d) = Σ_r 1 / (k + rank_r(d))        (k = 60 by default)

Each ranking is tiny (top-n per retriever), so fusion is a union +
one aggregate over at most n × #retrievers rows — the expensive work
stays inside the retrievers, which are already scale-shaped (BM25 is
two scans + zero shuffles, ANN is bucketed). Determinism: input ranks
must be computed over rounded scores with id tie-breaks (both
in-repo retrievers do), and 1/(k+rank) sums over exact small
rationals in a fixed per-id order via sort_array, so any engine
reproduces the fused ordering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def rank_by(df: DataFrame, score_col: str, id_col: str, n: int) -> DataFrame:
    """Attach 1-based rank by (score desc, id asc) and keep the top n.
    A single global window over <= corpus rows is intentional ONLY for
    already-reduced score tables (every caller passes a top-n-able
    small frame; never rank a raw corpus this way)."""
    w = Window.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
    return (
        df.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= n)
        .select(id_col, "rank")
    )


def reciprocal_rank_fusion(
    rankings: list[DataFrame],
    *,
    id_col: str = "doc_id",
    k: int = 60,
    top: int = 10,
) -> DataFrame:
    """Fuse (id, rank) frames: RRF score = Σ 1/(k + rank), summed in
    ascending-rank order for bit-stable doubles. Returns the top ``top``
    rows as (id, rrf_score, n_lists, fused_rank)."""
    if not rankings:
        raise ValueError("reciprocal_rank_fusion needs at least one ranking")
    unioned = rankings[0].select(F.col(id_col), "rank")
    for r in rankings[1:]:
        unioned = unioned.unionByName(r.select(F.col(id_col), "rank"))
    fused = unioned.groupBy(id_col).agg(
        F.aggregate(
            F.sort_array(F.collect_list(F.col("rank"))),
            F.lit(0.0),
            lambda acc, r: acc + F.lit(1.0) / (F.lit(float(k)) + r),
        ).alias("_rrf"),
        F.count("*").cast("bigint").alias("n_lists"),
    )
    w = Window.orderBy(F.col("_rrf").desc(), F.col(id_col).asc())
    return (
        fused.withColumn("rrf_score", F.round(F.col("_rrf"), 6))
        .withColumn("fused_rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("fused_rank") <= top)
        .select(id_col, "rrf_score", "n_lists", "fused_rank")
    )
