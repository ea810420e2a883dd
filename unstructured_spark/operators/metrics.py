"""Evaluation metrics as Spark jobs (reference ``unstructured/metrics/``;
SURVEY §2.9).

The reference evaluates output-vs-golden document dirs with a process
pool (metrics/evaluate.py:65-700). Here each metric is a DataFrame
transformation over (output, source) text or element tables, so the
"batch evaluator" is just a groupBy aggregation — Spark parallelism
replaces the pool.

- edit-distance accuracy  → native ``levenshtein`` on standardized text
  (metrics/text_extraction.py:59-224; unweighted variant)
- percent-missing-text    → token explode + left-anti join
  (metrics/text_extraction.py token-bag difference)
- element-type frequency  → ``groupBy(type, category_depth).count``
  + full-outer join percent match (metrics/element_type.py:18-96)
- aggregate summary       → mean/stdev/count over per-doc scores
  (metrics/evaluate.py aggregation to TSV)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# text standardization (reference standardizes whitespace + quotes
# before scoring, text_extraction.py "CCT" prep)
# ---------------------------------------------------------------------------

_QUOTE_SRC = "‘’“”′´`"
_QUOTE_DST = "'''\"\"''"


def standardize_text(col: Column) -> Column:
    """Whitespace-collapse and unicode-quote-normalize before scoring."""
    c = F.translate(col, _QUOTE_SRC, _QUOTE_DST)
    return F.trim(F.regexp_replace(c, r"\s+", " "))


def edit_distance_accuracy(output: Column, source: Column) -> Column:
    """1 − levenshtein/len(longer), on standardized text, floored at 0
    (reference calculate_accuracy, text_extraction.py:59-224)."""
    a = standardize_text(output)
    b = standardize_text(source)
    dist = F.levenshtein(a, b)
    denom = F.greatest(F.length(a), F.length(b))
    return F.when(denom == 0, F.lit(1.0)).otherwise(
        F.greatest(F.lit(0.0), 1.0 - dist.cast("double") / denom)
    )


def score_edit_distance(
    df: DataFrame, output: str = "output_text", source: str = "source_text"
) -> DataFrame:
    return df.withColumn(
        "accuracy", edit_distance_accuracy(F.col(output), F.col(source))
    )


def percent_missing_text(
    output_df: DataFrame,
    source_df: DataFrame,
    *,
    doc_id: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Fraction of source tokens absent from the output, per document
    (bag semantics: each source occurrence needs a matching output
    occurrence). Token-position windows turn the bag-difference into a
    join on (doc, token, occurrence#)."""
    def bag(df: DataFrame) -> DataFrame:
        toks = df.select(
            F.col(doc_id).alias("doc_id"),
            F.explode(
                F.filter(
                    F.split(standardize_text(F.col(text)), " "),
                    lambda t: t != "",
                )
            ).alias("tok"),
        )
        return toks.groupBy("doc_id", "tok").agg(F.count("*").alias("n"))

    src = bag(source_df).withColumnRenamed("n", "n_src")
    out = bag(output_df).withColumnRenamed("n", "n_out")
    joined = src.join(out, ["doc_id", "tok"], "left").withColumn(
        "missing", F.greatest(F.lit(0), F.col("n_src") - F.coalesce("n_out", F.lit(0)))
    )
    return joined.groupBy("doc_id").agg(
        F.round(
            F.sum("missing").cast("double") / F.sum("n_src"), 6
        ).alias("percent_missing")
    )


def element_type_frequency(df: DataFrame) -> DataFrame:
    """(type, category_depth) histogram per document
    (reference get_element_type_frequency)."""
    return df.groupBy(
        "doc_id", "type", F.coalesce("category_depth", F.lit(0)).alias("depth")
    ).agg(F.count("*").alias("n"))


def element_type_percent_match(
    output_elements: DataFrame, source_elements: DataFrame
) -> DataFrame:
    """Histogram-overlap score per doc: Σ min(out, src) / Σ src
    (reference calculate_element_type_percent_match)."""
    out = element_type_frequency(output_elements).withColumnRenamed("n", "n_out")
    src = element_type_frequency(source_elements).withColumnRenamed("n", "n_src")
    joined = src.join(out, ["doc_id", "type", "depth"], "full").fillna(
        {"n_out": 0, "n_src": 0}
    )
    return joined.groupBy("doc_id").agg(
        (
            F.sum(F.least("n_out", "n_src")).cast("double")
            / F.sum("n_src")
        ).alias("percent_match")
    )


def aggregate_scores(df: DataFrame, score: str = "accuracy") -> DataFrame:
    """mean/sample-stdev/count summary row (reference evaluate.py
    aggregation)."""
    return df.agg(
        F.round(F.avg(score), 6).alias("mean"),
        F.round(F.stddev_samp(score), 6).alias("stdev"),
        F.count(score).alias("n"),
    )


def mean_grouping(
    df: DataFrame, group_by: str, fields: list[str]
) -> DataFrame:
    """Grouped metric aggregation (reference evaluate.py:510-597 /
    metrics/utils.py:180-215): per group and metric field — mean,
    sample stdev, population stdev (each rounded to 3, null when
    undefined) and count. The reference loops pandas groupbys per
    field and writes TSVs; here it is one hash aggregate with map-side
    partials, one shuffle keyed by the grouping column."""
    aggs = []
    for f in fields:
        aggs += [
            F.round(F.avg(f), 3).alias(f"{f}_mean"),
            F.round(F.stddev_samp(f), 3).alias(f"{f}_stdev"),
            F.round(F.stddev_pop(f), 3).alias(f"{f}_pstdev"),
            F.count(f).alias(f"{f}_count"),
        ]
    return df.groupBy(group_by).agg(*aggs)


def filter_metrics(
    df: DataFrame, filter_list: list[str], filter_by: str = "filename"
) -> DataFrame:
    """Keep only metric rows whose ``filter_by`` value is in
    ``filter_list`` (reference evaluate.py:599-662 — its pandas isin
    over CSV/TSV inputs; here a native IN filter that pushes to the
    scan). Raises on a missing column like the reference."""
    if filter_by not in df.columns:
        raise ValueError("`filter_by` key does not exists in the data provided.")
    return df.filter(F.col(filter_by).isin([str(x) for x in filter_list]))
