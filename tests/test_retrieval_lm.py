"""Bigram-LM cross-entropy, token KL drift, and RRF fusion units."""

import math

from pyspark.sql import functions as F

from unstructured_spark.operators.retrieval import (
    rank_by,
    reciprocal_rank_fusion,
)
from unstructured_spark.operators.text_analysis import (
    bigram_cross_entropy,
    token_kl_drift,
)


class TestBigramCrossEntropy:
    def test_hand_computed(self, spark):
        # corpus: "a b a b" + "a b" → bigrams: (a,b)x3, (b,a)x1
        # V=2; C(a)=3, C(b)=1
        # P(b|a) = (3+1)/(3+2) = 0.8 ; P(a|b) = (1+1)/(1+2) = 2/3
        df = spark.createDataFrame(
            [(1, "a b a b"), (2, "a b")], "doc_id long, text string"
        )
        rows = {r["doc_id"]: r for r in bigram_cross_entropy(df).collect()}
        e1 = -(2 * math.log(0.8) + math.log(2 / 3)) / 3
        assert rows[1]["n_bigrams"] == 3
        assert abs(rows[1]["cross_entropy"] - round(e1, 6)) < 2e-6
        assert abs(rows[2]["cross_entropy"] - round(-math.log(0.8), 6)) < 2e-6

    def test_single_token_doc_dropped(self, spark):
        df = spark.createDataFrame(
            [(1, "word"), (2, "two words")], "doc_id long, text string"
        )
        assert [r["doc_id"] for r in bigram_cross_entropy(df).collect()] == [2]


class TestUnigramEntropy:
    def test_hand_computed(self, spark):
        import math as _m

        from unstructured_spark.operators.text_analysis import unigram_entropy

        # "a a b" → n=3, counts {a:2, b:1}
        # H = ln 3 − (2·ln 2 + 1·ln 1)/3
        df = spark.createDataFrame(
            [(1, "a a b"), (2, "x x x x"), (3, "p q r s")],
            "doc_id long, text string",
        )
        rows = {r["doc_id"]: r for r in unigram_entropy(df).collect()}
        h1 = _m.log(3) - (2 * _m.log(2)) / 3
        assert rows[1]["n_tokens"] == 3
        assert abs(rows[1]["entropy"] - round(h1, 6)) < 2e-6
        # degenerate distribution → exactly 0
        assert rows[2]["entropy"] == 0.0
        # uniform all-distinct → ln n
        assert abs(rows[3]["entropy"] - round(_m.log(4), 6)) < 2e-6

    def test_empty_docs_dropped(self, spark):
        from unstructured_spark.operators.text_analysis import unigram_entropy

        df = spark.createDataFrame(
            [(1, "   "), (2, None), (3, "one token each here")],
            "doc_id long, text string",
        )
        assert [r["doc_id"] for r in unigram_entropy(df).collect()] == [3]


class TestTokenKlDrift:
    def test_identical_shards_near_zero(self, spark):
        # identical shard distributions → KL ~ 0 (not exactly 0: the
        # add-one smoothing denominators differ, ns+V vs n+V)
        df = spark.createDataFrame(
            [("s1", "a a b"), ("s2", "a a b")],
            "source string, text string",
        )
        rows = token_kl_drift(df).collect()
        assert all(abs(r["kl_divergence"]) < 0.01 for r in rows)
        assert rows[0]["kl_divergence"] == rows[1]["kl_divergence"]

    def test_drifted_shard_positive(self, spark):
        df = spark.createDataFrame(
            [("s1", "a a a a"), ("s2", "b b b b")],
            "source string, text string",
        )
        rows = {r["source"]: r["kl_divergence"] for r in token_kl_drift(df).collect()}
        assert rows["s1"] > 0 and rows["s2"] > 0

    def test_max_vocab_restricts_grid(self, spark):
        # 'a' dominates the corpus; with max_vocab=1 only 'a' survives
        # the cut, so the rare-token drift disappears and both shards
        # have KL over a single-token distribution (ns+1 vs n+1
        # smoothing difference only — near zero, and equal by symmetry)
        df = spark.createDataFrame(
            [("s1", "a a a x"), ("s2", "a a a y")],
            "source string, text string",
        )
        full = {
            r["source"]: r["kl_divergence"]
            for r in token_kl_drift(df).collect()
        }
        capped = {
            r["source"]: r["kl_divergence"]
            for r in token_kl_drift(df, max_vocab=1).collect()
        }
        assert full["s1"] > capped["s1"]
        assert capped["s1"] == capped["s2"] < 0.01

    def test_max_vocab_tiebreak_deterministic(self, spark):
        # equal corpus counts → token-order tiebreak: 'a' kept, 'b' cut
        df = spark.createDataFrame(
            [("s1", "a b"), ("s2", "a b")],
            "source string, text string",
        )
        r1 = token_kl_drift(df, max_vocab=1).collect()
        r2 = token_kl_drift(df, max_vocab=1).collect()
        assert sorted(map(tuple, r1)) == sorted(map(tuple, r2))


class TestRrf:
    def test_fusion_prefers_doubly_ranked(self, spark):
        a = spark.createDataFrame([(10, 1), (20, 2)], "doc_id long, rank long")
        b = spark.createDataFrame([(20, 1), (30, 2)], "doc_id long, rank long")
        out = {r["doc_id"]: r for r in reciprocal_rank_fusion([a, b]).collect()}
        # 20 appears in both lists → highest fused score
        assert out[20]["fused_rank"] == 1 and out[20]["n_lists"] == 2
        assert abs(out[20]["rrf_score"] - round(1 / 61 + 1 / 62, 6)) < 2e-6
        assert out[10]["n_lists"] == 1

    def test_rank_by_orders_and_truncates(self, spark):
        df = spark.createDataFrame(
            [(1, 0.5), (2, 0.9), (3, 0.9), (4, 0.1)],
            "doc_id long, score double",
        )
        rows = rank_by(df, "score", "doc_id", 3).orderBy("rank").collect()
        # ties break by id asc
        assert [(r["doc_id"], r["rank"]) for r in rows] == [(2, 1), (3, 2), (1, 3)]


class TestWeightedSample:
    def test_bias_toward_heavy_weights(self, spark):
        from unstructured_spark.operators.sampling import weighted_sample

        # 100 light rows (w=1) + 10 heavy rows (w=100): heavy rows must
        # dominate a k=10 sample far beyond their 9% population share
        rows = [(i, 1.0) for i in range(100)] + [
            (100 + i, 100.0) for i in range(10)
        ]
        df = spark.createDataFrame(rows, "doc_id long, wt double")
        got = weighted_sample(df, 10, weight_col="wt").collect()
        assert len(got) == 10
        heavy = sum(1 for r in got if r["doc_id"] >= 100)
        assert heavy >= 6

    def test_deterministic_and_zero_weight_excluded(self, spark):
        from unstructured_spark.operators.sampling import weighted_sample

        df = spark.createDataFrame(
            [(1, 5.0), (2, 0.0), (3, -1.0), (4, 2.0)],
            "doc_id long, wt double",
        )
        a = sorted(r["doc_id"] for r in weighted_sample(df, 2, weight_col="wt").collect())
        b = sorted(r["doc_id"] for r in weighted_sample(df, 2, weight_col="wt").collect())
        assert a == b == [1, 4]  # non-positive weights never win


class TestPerplexityBuckets:
    def test_thirds_and_determinism(self, spark):
        from unstructured_spark.operators.text_analysis import (
            perplexity_buckets,
        )

        # 9 docs with deliberately different repetition levels so the
        # bigram LM spreads cross-entropy
        rows = [
            (i, " ".join(f"w{j % (i + 1)}" for j in range(10)))
            for i in range(9)
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        out = perplexity_buckets(df, buckets=3).collect()
        assert len(out) == 9
        counts = {}
        for r in out:
            counts[r["bucket"]] = counts.get(r["bucket"], 0) + 1
        assert set(counts) == {1, 2, 3}
        # rank-quantile: equal thirds when scores are distinct enough
        assert max(counts.values()) <= 4
        # lower cross-entropy -> lower bucket
        by_bucket = sorted(out, key=lambda r: (r["bucket"], r["cross_entropy"]))
        ces = [r["cross_entropy"] for r in by_bucket]
        assert ces == sorted(ces)

    def test_ties_share_bucket(self, spark):
        from unstructured_spark.operators.text_analysis import (
            perplexity_buckets,
        )

        # identical docs -> identical scores -> one shared bucket
        df = spark.createDataFrame(
            [(i, "a b a b") for i in range(6)], "doc_id long, text string"
        )
        out = perplexity_buckets(df, buckets=3).collect()
        assert len({r["bucket"] for r in out}) == 1

    def test_buckets_validation(self, spark):
        import pytest

        from unstructured_spark.operators.text_analysis import (
            perplexity_buckets,
        )

        df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
        with pytest.raises(ValueError, match="buckets"):
            perplexity_buckets(df, buckets=1)


class TestDsirImportance:
    def test_target_lookalikes_score_higher(self, spark):
        from unstructured_spark.operators.text_analysis import dsir_importance

        # corpus: half "code-like", half "prose-like"; target = prose
        corpus = spark.createDataFrame(
            [(i, "def foo bar baz qux" if i % 2 else "the cat sat on the mat")
             for i in range(20)],
            "doc_id long, text string",
        )
        target = spark.createDataFrame(
            [(100, "the dog sat on the rug"), (101, "the cat ran on the mat")],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in
               dsir_importance(corpus, target, buckets=512).collect()}
        prose = [out[i]["log_weight"] for i in range(0, 20, 2)]
        code = [out[i]["log_weight"] for i in range(1, 20, 2)]
        assert min(prose) > max(code)
        # weight = exp(log_weight), rounded
        import math
        r = out[0]
        assert abs(r["weight"] - round(math.exp(r["log_weight"]), 6)) < 2e-6

    def test_deterministic(self, spark):
        from unstructured_spark.operators.text_analysis import dsir_importance

        corpus = spark.createDataFrame(
            [(i, f"w{i} common text here") for i in range(10)],
            "doc_id long, text string",
        )
        target = corpus.filter(F.col("doc_id") < 3)
        a = sorted(map(tuple, dsir_importance(corpus, target).collect()))
        b = sorted(map(tuple, dsir_importance(corpus, target).collect()))
        assert a == b

    def test_feeds_weighted_sample(self, spark):
        from unstructured_spark.operators.sampling import weighted_sample
        from unstructured_spark.operators.text_analysis import dsir_importance

        corpus = spark.createDataFrame(
            [(i, "alpha beta gamma" if i < 5 else "delta epsilon zeta")
             for i in range(50)],
            "doc_id long, text string",
        )
        target = spark.createDataFrame(
            [(99, "alpha beta gamma")], "doc_id long, text string"
        )
        w = dsir_importance(corpus, target, buckets=256)
        got = weighted_sample(w, 5, weight_col="weight").collect()
        # the 5 target-lookalike docs dominate the resample
        assert sum(1 for r in got if r["doc_id"] < 5) >= 4
