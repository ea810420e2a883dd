"""Pins for the r12 scale-adaptive scan rebalance (optimization round).

Operators that spread a single-split scan before compute-heavy map
stages (dedup.simhash_pairs, dedup.shared_ngram_spans,
classifier._doc_buckets) must:

1. be an IDENTITY — no RoundRobinPartitioning exchange — when the
   input already parallelizes (the 100 TB case), and
2. produce bit-identical results whether the input arrives as one
   split or many (the rebalance must not leak into any result).
"""

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from unstructured_spark.operators import dedup  # noqa: E402
from unstructured_spark.operators.classifier import nb_classify  # noqa: E402


def _docs(spark, n_parts):
    base = spark.range(0, 120).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.lit("alpha beta gamma delta epsilon zeta eta theta"),
            (F.col("id") % 7).cast("string"),
            (F.col("id") % 3).cast("string"),
            F.lit("iota kappa lambda mu nu xi omicron pi rho sigma"),
            (F.col("id") % 11).cast("string"),
        ).alias("text"),
        (F.col("id") % 4).cast("string").alias("source"),
    )
    return base.coalesce(1) if n_parts == 1 else base.repartition(n_parts)


def _rows(df):
    return sorted(tuple(str(x) for x in r) for r in df.collect())


def test_simhash_spread_identity_when_input_parallelizes(spark):
    p = spark.sparkContext.defaultParallelism
    docs = _docs(spark, p)  # already >= defaultParallelism partitions
    plan = dedup.simhash_pairs(docs, bits=48, max_distance=2)._jdf.queryExecution().sparkPlan().toString()
    assert "RoundRobinPartitioning" not in plan


def test_simhash_results_identical_across_input_splits(spark):
    one = dedup.simhash_pairs(_docs(spark, 1), bits=48, max_distance=2)
    many = dedup.simhash_pairs(_docs(spark, 8), bits=48, max_distance=2)
    assert _rows(one) == _rows(many)


def test_shared_ngram_spans_results_identical_across_input_splits(spark):
    one = dedup.shared_ngram_spans(_docs(spark, 1), k=5)
    many = dedup.shared_ngram_spans(_docs(spark, 8), k=5)
    assert _rows(one) == _rows(many)


def test_nb_classify_results_identical_across_input_splits(spark):
    def run(n_parts):
        docs = _docs(spark, n_parts)
        seed = docs.filter(F.col("doc_id") % 10 < 3)
        return nb_classify(
            docs, seed, label="source", buckets=256, max_tokens=32,
            seed_in_corpus=True,
        )
    assert _rows(run(1)) == _rows(run(8))


# --- r13: ngram_jaccard_pairs staged shingle projection -------------------


def test_staged_sigs_equal_minhash_signatures(spark):
    """The staged-shingle signature build (r13: one tokenize pass
    shared by the LSH chain and both Jaccard join sides) must produce
    component-identical signatures to the public minhash_signatures
    operator — the LSH band keys, est_jaccard, and every downstream
    oracle hash depend on it."""
    docs = _docs(spark, 4)
    ref = {
        r["doc_id"]: list(r["sig"])
        for r in dedup.minhash_signatures(docs, num_hashes=16, shingle_size=3).collect()
    }
    sh = docs.select(
        F.col("doc_id").alias("doc"), dedup.shingles(F.col("text"), 3).alias("sh")
    )
    staged = {
        r["doc"]: list(r["sig"])
        for r in dedup._minhash_sigs_from_shingles(sh, 16).collect()
    }
    assert ref == staged


def test_ngram_jaccard_results_identical_across_input_splits(spark):
    one = dedup.ngram_jaccard_pairs(_docs(spark, 1), n=3, threshold=0.1)
    many = dedup.ngram_jaccard_pairs(_docs(spark, 8), n=3, threshold=0.1)
    assert _rows(one) == _rows(many)
