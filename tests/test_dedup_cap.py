"""LSH hot-bucket cap (100 TB guardrail on the quadratic band join)."""

from pyspark.sql import functions as F

from unstructured_spark.operators.dedup import lsh_candidate_pairs


def test_bucket_cap_drops_degenerate_buckets(spark):
    # 6 identical docs share every band bucket (15 pairs); one distinct
    # near-dup pair elsewhere survives the cap
    same = [(str(i), "the quick brown fox jumps over the lazy dog") for i in range(6)]
    other = [
        ("x1", "completely different text about spark adaptive execution"),
        ("x2", "completely different text about spark adaptive execution"),
    ]
    df = spark.createDataFrame(same + other, "doc_id string, text string")
    uncapped = lsh_candidate_pairs(df)
    capped = lsh_candidate_pairs(df, max_bucket_size=3)
    un = {(r["doc_a"], r["doc_b"]) for r in uncapped.collect()}
    cp = {(r["doc_a"], r["doc_b"]) for r in capped.collect()}
    assert ("x1", "x2") in un and ("x1", "x2") in cp
    assert len(un) == 15 + 1
    # the 6-doc clique's buckets all exceed the cap -> its pairs vanish
    assert cp == {("x1", "x2")}
