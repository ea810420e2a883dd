"""Deterministic sampling, stratified mixing, sequence packing."""

import pytest
from pyspark.sql import functions as F

from unstructured_spark.operators.sampling import (
    hash_sample,
    hash_uniform,
    pack_sequences,
    stratified_sample,
)

# long-running suite: deselected from the default fast tier (pytest.ini);
# runs in the round-end full pass with -m "slow or not slow"
pytestmark = pytest.mark.slow


class TestHashSample:
    def test_deterministic_and_seed_sensitive(self, spark):
        df = spark.range(2000).withColumnRenamed("id", "doc_id")
        a = {r["doc_id"] for r in hash_sample(df, 0.3, seed="s1").collect()}
        b = {r["doc_id"] for r in hash_sample(df, 0.3, seed="s1").collect()}
        c = {r["doc_id"] for r in hash_sample(df, 0.3, seed="s2").collect()}
        assert a == b
        assert a != c
        assert 0.2 < len(a) / 2000 < 0.4

    def test_nested_fractions(self, spark):
        # the 10% sample is a subset of the 30% sample (same seed):
        # hash_uniform gives one draw per key, thresholds nest
        df = spark.range(2000).withColumnRenamed("id", "doc_id")
        small = {r["doc_id"] for r in hash_sample(df, 0.1).collect()}
        big = {r["doc_id"] for r in hash_sample(df, 0.3).collect()}
        assert small <= big

    def test_uniform_range(self, spark):
        [r] = (
            spark.range(1)
            .select(
                F.min(hash_uniform(F.lit("x"))).alias("v"),
            )
            .collect()
        )
        assert 0.0 <= r["v"] < 1.0


class TestStratifiedSample:
    def test_per_stratum_fractions(self, spark):
        rows = [(i, "keep" if i % 2 == 0 else "drop") for i in range(1000)]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        out = stratified_sample(df, {"keep": 1.0}, default_fraction=0.0)
        got = {r["doc_id"] for r in out.collect()}
        assert got == {i for i in range(1000) if i % 2 == 0}


class TestPackSequences:
    def _docs(self, spark, sizes):
        rows = [(i, " ".join(["w"] * n)) for i, n in enumerate(sizes)]
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_exact_fill_no_split(self, spark):
        out = pack_sequences(self._docs(spark, [4, 4, 4]), 4).collect()
        by_doc = {r["doc_id"]: r for r in out}
        assert len(out) == 3
        assert [by_doc[i]["seq_id"] for i in range(3)] == [0, 1, 2]
        assert all(r["doc_token_start"] == 0 and r["doc_token_end"] == 4 for r in out)

    def test_doc_split_across_boundary(self, spark):
        # doc0 has 3 tokens, doc1 has 4: seq size 4 → doc1 splits 1|3
        rows = sorted(
            map(
                lambda r: (r["doc_id"], r["seq_id"], r["doc_token_start"],
                           r["doc_token_end"], r["seq_token_start"]),
                pack_sequences(self._docs(spark, [3, 4]), 4).collect(),
            )
        )
        assert rows == [
            (0, 0, 0, 3, 0),
            (1, 0, 0, 1, 3),
            (1, 1, 1, 4, 0),
        ]

    def test_long_doc_spans_many_sequences(self, spark):
        rows = pack_sequences(self._docs(spark, [10]), 3).collect()
        assert len(rows) == 4  # 3+3+3+1
        total = sum(r["doc_token_end"] - r["doc_token_start"] for r in rows)
        assert total == 10

    def test_blocked_prefix_sum_matches_naive(self, spark):
        # tiny block size forces multi-block offsets; token positions
        # must still be the single global cumsum
        sizes = [(i * 13) % 7 + 1 for i in range(50)]
        out = pack_sequences(self._docs(spark, sizes), 16, block_size=8)
        starts = {
            r["doc_id"]: r["seq_id"] * 16 + r["seq_token_start"]
            for r in out.collect()
            if r["doc_token_start"] == 0
        }
        import itertools

        expect = dict(zip(range(50), itertools.accumulate([0] + sizes[:-1])))
        assert starts == expect


class TestBm25:
    def test_rare_term_outweighs_common(self, spark):
        from unstructured_spark.operators.text_analysis import bm25_scores

        rows = [
            (0, "rare common common filler filler"),
            (1, "common filler filler filler filler"),
            (2, "common filler filler filler filler"),
            (3, "filler filler filler filler filler"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {r["doc_id"]: r["score"] for r in bm25_scores(df, ["rare", "common"]).collect()}
        assert set(got) == {0, 1, 2}  # doc 3 matches nothing
        assert got[0] > got[1]  # rare-term doc wins
        assert got[1] == got[2]  # identical docs tie exactly

    def test_score_is_deterministic(self, spark):
        from unstructured_spark.operators.text_analysis import bm25_scores

        rows = [(i, " ".join(["w%d" % (j % 11) for j in range(i + 3)])) for i in range(30)]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        a = sorted(map(tuple, bm25_scores(df, ["w1", "w7"]).collect()))
        b = sorted(map(tuple, bm25_scores(df, ["w1", "w7"]).collect()))
        assert a == b and len(a) > 0


class TestTfidfReadability:
    def test_tfidf_ranks_distinctive_terms(self, spark):
        from unstructured_spark.operators.text_analysis import tfidf_top_terms

        rows = [
            (1, "shared shared unique1"),
            (2, "shared shared unique2"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {(r["doc_id"], r["rank"]): r["term"] for r in
               tfidf_top_terms(df, k=2).collect()}
        # the corpus-wide term scores 0 (ln(2/2)); the unique term wins
        assert got[(1, 1)] == "unique1" and got[(2, 1)] == "unique2"

    def test_readability_counts(self, spark):
        from unstructured_spark.operators.text_analysis import readability

        [r] = readability(
            spark.createDataFrame(
                [(1, "The cat sat. The dog ran!")], "doc_id long, text string"
            )
        ).collect()
        assert r["words"] == 6
        assert r["sentences"] == 2
        assert r["syllables"] == 6  # one vowel group per word
        # 206.835 - 1.015*3 - 84.6*1 = 119.19
        assert abs(r["flesch"] - 119.19) < 0.001


class TestTemperatureMix:
    def _docs(self, spark, per_source):
        rows = []
        i = 0
        for s, n in per_source.items():
            for _ in range(n):
                rows.append((i, s))
                i += 1
        return spark.createDataFrame(rows, "doc_id long, source string")

    def test_alpha_one_is_proportional(self, spark):
        from unstructured_spark.operators.sampling import temperature_mix

        docs = self._docs(spark, {"big": 900, "small": 100})
        out = temperature_mix(docs, 500, alpha=1.0, seed="t1")
        by_src = {
            r["source"]: r["n"]
            for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
        }
        # proportional: ~450 big / ~50 small (hash sampling jitter)
        assert 400 <= by_src.get("big", 0) <= 500
        assert 25 <= by_src.get("small", 0) <= 75

    def test_low_alpha_upweights_small_sources(self, spark):
        from unstructured_spark.operators.sampling import temperature_mix

        docs = self._docs(spark, {"big": 900, "small": 100})
        out = temperature_mix(docs, 500, alpha=0.2, seed="t1")
        by_src = {
            r["source"]: r["n"]
            for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
        }
        # alpha=0.2: small's target share jumps from 10% to ~39% of
        # 500 = ~195 > |small|, so the cap keeps ALL 100 small docs;
        # big gets ~305 of its 900 (fraction ~0.34)
        assert by_src.get("small", 0) == 100
        assert 250 <= by_src.get("big", 0) <= 370

    def test_small_source_capped_at_full(self, spark):
        from unstructured_spark.operators.sampling import temperature_mix

        docs = self._docs(spark, {"big": 990, "tiny": 10})
        out = temperature_mix(docs, 900, alpha=0.1, seed="t2")
        tiny = out.filter(F.col("source") == "tiny").count()
        # fraction capped at 1.0: every tiny doc kept, never oversampled
        assert tiny == 10

    def test_deterministic_and_append_stable(self, spark):
        from unstructured_spark.operators.sampling import temperature_mix

        docs = self._docs(spark, {"a": 200, "b": 50})
        ids1 = {r["doc_id"] for r in temperature_mix(docs, 100, seed="s").collect()}
        ids2 = {r["doc_id"] for r in temperature_mix(docs, 100, seed="s").collect()}
        assert ids1 == ids2

    def test_target_validation(self, spark):
        import pytest

        from unstructured_spark.operators.sampling import temperature_mix

        docs = self._docs(spark, {"a": 5})
        with pytest.raises(ValueError, match="target_docs"):
            temperature_mix(docs, 0)

    def test_null_source_rows_excluded_not_crashing(self, spark):
        # a NULL stratum used to reach sorted(fractions.items()) and
        # raise TypeError (str < NoneType); it must instead be excluded
        # from both the normalizer and the output
        from unstructured_spark.operators.sampling import temperature_mix

        docs = spark.createDataFrame(
            [(i, "web") for i in range(100)] + [(100 + i, None) for i in range(50)],
            "doc_id long, source string",
        )
        out = temperature_mix(docs, 100, alpha=1.0, seed="n1")
        rows = out.collect()
        assert all(r["source"] == "web" for r in rows)
        # nulls excluded from z: web is the only source, so f=1.0 keeps
        # every web doc (with nulls inflating z this would be ~2/3)
        assert len(rows) == 100

    def test_all_null_sources_returns_empty(self, spark):
        from unstructured_spark.operators.sampling import temperature_mix

        docs = spark.createDataFrame(
            [(i, None) for i in range(20)], "doc_id long, source string"
        )
        assert temperature_mix(docs, 10, seed="n2").count() == 0


class TestTokenShards:
    def test_assignment_matches_serial_prefix_sum(self, spark):
        from unstructured_spark.operators.sampling import assign_token_shards

        texts = {
            0: "a b c",          # 3 tokens, start 0  -> shard 0
            1: "d e",            # 2 tokens, start 3  -> shard 0
            2: "",               # 0 tokens, start 5  -> shard 1
            3: None,             # 0 tokens, start 5  -> shard 1
            4: "f g h i",        # 4 tokens, start 5  -> shard 1
            5: "j",              # 1 token,  start 9  -> shard 1 (9//5)
            6: "k l",            # 2 tokens, start 10 -> shard 2
        }
        df = spark.createDataFrame(
            list(texts.items()), "doc_id long, text string"
        )
        got = {
            r["doc_id"]: (r["n_tokens"], r["shard_id"])
            for r in assign_token_shards(df, 5).collect()
        }
        assert got == {
            0: (3, 0), 1: (2, 0), 2: (0, 1), 3: (0, 1),
            4: (4, 1), 5: (1, 1), 6: (2, 2),
        }

    def test_blocks_do_not_change_assignment(self, spark):
        from unstructured_spark.operators.sampling import assign_token_shards

        df = spark.createDataFrame(
            [(i, "w " * (i % 7)) for i in range(200)],
            "doc_id long, text string",
        )
        a = sorted(map(tuple, assign_token_shards(df, 50, block_size=8).collect()))
        b = sorted(map(tuple, assign_token_shards(df, 50, block_size=1024).collect()))
        assert a == b

    def test_string_ids_rejected(self, spark):
        from unstructured_spark.operators.sampling import assign_token_shards

        df = spark.createDataFrame([("x", "t")], "doc_id string, text string")
        with pytest.raises(ValueError, match="numeric"):
            assign_token_shards(df, 5)

    def test_writer_round_trips_every_row(self, spark, tmp_path):
        from unstructured_spark.operators.storage import write_token_shards

        df = spark.createDataFrame(
            [(i, "tok " * (1 + i % 5)) for i in range(60)] + [(60, None)],
            "doc_id long, text string",
        )
        dest = str(tmp_path / "shards")
        n = write_token_shards(df, dest, 30)
        back = spark.read.parquet(dest)
        assert back.count() == 61  # nothing dropped, null text included
        assert back.select("shard_id").distinct().count() == n
        # each shard's token mass stays near the budget: every shard
        # except possibly the last holds >= the budget only via its
        # final overshooting doc, i.e. (sum - last_doc) < budget
        import pyspark.sql.functions as SF

        tok = SF.size(
            SF.filter(
                SF.split(SF.trim(SF.coalesce("text", SF.lit(""))), r"\s+"),
                lambda x: x != SF.lit(""),
            )
        )
        per = (
            back.withColumn("_n", tok)
            .groupBy("shard_id")
            .agg(SF.sum("_n").alias("s"), SF.max("_n").alias("m"))
            .collect()
        )
        assert all(r["s"] - r["m"] < 30 for r in per)


class TestPackNullText:
    def test_null_text_does_not_shift_offsets(self, spark):
        # A NULL-text doc in the middle once contributed -1 to its block
        # total (F.size of a null split), shifting every later doc's
        # global offset; it must behave exactly like an empty doc.
        base = [(0, "a b c"), (2, "d e f g")]
        with_null = spark.createDataFrame(
            base + [(1, None)], "doc_id long, text string"
        )
        with_empty = spark.createDataFrame(
            base + [(1, "")], "doc_id long, text string"
        )
        a = sorted(map(tuple, pack_sequences(with_null, 4).collect()))
        b = sorted(map(tuple, pack_sequences(with_empty, 4).collect()))
        assert a == b
        # doc 2 starts at global offset 3 -> sequence 0 gets 1 token,
        # sequence 1 the remaining 3
        rows = {(r["doc_id"], r["seq_id"]): r for r in pack_sequences(with_null, 4).collect()}
        assert rows[(2, 0)]["doc_token_end"] == 1
        assert rows[(2, 1)]["doc_token_start"] == 1


class TestInterleaveByWeight:
    def test_smooth_two_to_one_pattern(self, spark):
        from unstructured_spark.operators.sampling import interleave_by_weight

        rows = [(i, "a") for i in range(6)] + [(10 + i, "b") for i in range(3)]
        df = spark.createDataFrame(rows, "doc_id long, source string")
        out = sorted(
            interleave_by_weight(df, {"a": 2, "b": 1}).collect(),
            key=lambda r: r["emit_order"],
        )
        # virtual times: a at (2k-1)/4, b at (2k-1)/2 -> a b a a b a a b a
        assert [r["source"] for r in out] == [
            "a", "b", "a", "a", "b", "a", "a", "b", "a"
        ]
        # dense 0-based rank, per-source order preserved
        assert [r["emit_order"] for r in out] == list(range(9))
        a_docs = [r["doc_id"] for r in out if r["source"] == "a"]
        assert a_docs == sorted(a_docs)

    def test_unlisted_and_null_sources_excluded(self, spark):
        from unstructured_spark.operators.sampling import interleave_by_weight

        df = spark.createDataFrame(
            [(1, "a"), (2, "zz"), (3, None), (4, "a")],
            "doc_id long, source string",
        )
        out = interleave_by_weight(df, {"a": 1}).collect()
        assert sorted(r["doc_id"] for r in out) == [1, 4]

    def test_rejects_bad_weights(self, spark):
        from unstructured_spark.operators.sampling import interleave_by_weight

        df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
        with pytest.raises(ValueError):
            interleave_by_weight(df, {})
        with pytest.raises(ValueError):
            interleave_by_weight(df, {"a": 0})
        with pytest.raises(ValueError):
            interleave_by_weight(df, {"a": 1.5})


class TestSelectTokenBudget:
    def _base(self, spark):
        # two strata; quality levels with ties to exercise the
        # level-table decomposition and doc_id tie-breaks
        return spark.createDataFrame(
            [
                ("a", 1, 300, 40),
                ("a", 2, 200, 50),
                ("a", 3, 200, 30),   # same level as doc 2, later id
                ("a", 4, 100, 100),
                ("b", 5, 900, 80),
                ("b", 6, 800, 10),
            ],
            "source string, doc_id long, quality_q long, ntok long",
        )

    def test_greedy_fill_semantics(self, spark):
        from unstructured_spark.operators.sampling import select_token_budget

        out = {
            r["doc_id"]: r["cum_tokens"]
            for r in select_token_budget(self._base(spark), 100).collect()
        }
        # stratum a: 40 (doc1), +50 (doc2) = 90, doc3 would hit 120 > 100
        # stratum b: 80 (doc5), doc6 would hit 90 <= 100 -> kept
        assert out == {1: 40, 2: 90, 5: 80, 6: 90}

    def test_matches_single_window_form(self, spark):
        # the two-level decomposition must equal the naive global
        # per-stratum cumsum on a bigger random-ish frame
        import pyspark.sql.functions as SF
        from pyspark.sql.window import Window as W

        from unstructured_spark.operators.sampling import select_token_budget

        df = spark.range(400).select(
            SF.concat(SF.lit("s"), (SF.col("id") % 7).cast("string")).alias(
                "source"
            ),
            SF.col("id").alias("doc_id"),
            ((SF.col("id") * 37) % 11).cast("long").alias("quality_q"),
            ((SF.col("id") * 13) % 29 + 1).cast("long").alias("ntok"),
        )
        w = (
            W.partitionBy("source")
            .orderBy(SF.col("quality_q").desc(), SF.col("doc_id").asc())
            .rowsBetween(W.unboundedPreceding, 0)
        )
        naive = (
            df.withColumn("cum_tokens", SF.sum("ntok").over(w))
            .filter(SF.col("cum_tokens") <= 150)
        )
        got = select_token_budget(df, 150)
        key = lambda d: sorted((r["doc_id"], r["cum_tokens"]) for r in d.collect())  # noqa: E731
        assert key(got) == key(naive)

    def test_zero_token_doc_at_exact_budget_kept(self, spark):
        from unstructured_spark.operators.sampling import select_token_budget

        df = spark.createDataFrame(
            [("a", 1, 5, 100), ("a", 2, 4, 0)],
            "source string, doc_id long, quality_q long, ntok long",
        )
        out = select_token_budget(df, 100)
        assert sorted(r["doc_id"] for r in out.collect()) == [1, 2]


class TestQualityCutoff:
    def test_exact_floor_count_per_stratum(self, spark):
        from unstructured_spark.operators.sampling import quality_cutoff

        df = spark.createDataFrame(
            [("a", i, (i * 7) % 5) for i in range(10)]
            + [("b", 100 + i, i % 3) for i in range(4)],
            "source string, doc_id long, quality_q long",
        )
        out = quality_cutoff(df, 2, 5).collect()
        by = {}
        for r in out:
            by.setdefault(r["source"], []).append(r["q_rank"])
        # floor(10*2/5)=4 from a, floor(4*2/5)=1 from b; ranks 1..k
        assert sorted(by["a"]) == [1, 2, 3, 4]
        assert sorted(by["b"]) == [1]

    def test_tie_break_is_doc_id_asc(self, spark):
        from unstructured_spark.operators.sampling import quality_cutoff

        df = spark.createDataFrame(
            [("a", 3, 9), ("a", 1, 9), ("a", 2, 9), ("a", 4, 1)],
            "source string, doc_id long, quality_q long",
        )
        kept = sorted(
            r["doc_id"] for r in quality_cutoff(df, 2, 4).collect()
        )
        assert kept == [1, 2]  # floor(4*2/4)=2: the two smallest ids at q=9

    def test_bad_fraction_rejected(self, spark):
        import pytest

        from unstructured_spark.operators.sampling import quality_cutoff

        df = spark.createDataFrame([("a", 1, 1)], "source string, doc_id long, quality_q long")
        with pytest.raises(ValueError):
            quality_cutoff(df, 1, 0)


class TestCorpusShuffle:
    def test_rank_is_exact_permutation_of_key_order(self, spark):
        from unstructured_spark.operators.sampling import corpus_shuffle

        df = spark.range(500).withColumnRenamed("id", "doc_id")
        out = corpus_shuffle(df, seed="e1").collect()
        assert sorted(r["shuffle_rank"] for r in out) == list(range(500))
        by_key = [r["shuffle_rank"] for r in sorted(out, key=lambda r: (r["shuffle_key"], r["doc_id"]))]
        assert by_key == list(range(500))

    def test_seed_changes_order_and_is_stable(self, spark):
        from unstructured_spark.operators.sampling import corpus_shuffle

        df = spark.range(200).withColumnRenamed("id", "doc_id")
        a1 = {r["doc_id"]: r["shuffle_rank"] for r in corpus_shuffle(df, seed="e1").collect()}
        a2 = {r["doc_id"]: r["shuffle_rank"] for r in corpus_shuffle(df, seed="e1").collect()}
        b = {r["doc_id"]: r["shuffle_rank"] for r in corpus_shuffle(df, seed="e2").collect()}
        assert a1 == a2
        assert a1 != b

    def test_repartitioning_does_not_change_ranks(self, spark):
        from unstructured_spark.operators.sampling import corpus_shuffle

        df = spark.range(300).withColumnRenamed("id", "doc_id")
        one = {r["doc_id"]: r["shuffle_rank"] for r in corpus_shuffle(df.repartition(1), seed="x").collect()}
        many = {r["doc_id"]: r["shuffle_rank"] for r in corpus_shuffle(df.repartition(17), seed="x").collect()}
        assert one == many


class TestCorpusDatasheet:
    def test_volumes_dups_and_mean_quality(self, spark):
        from unstructured_spark.operators.text_analysis import (
            corpus_datasheet,
        )

        df = spark.createDataFrame(
            [
                ("w", "en", 1, "the cat sat on the mat"),
                ("w", "en", 2, "the cat sat on the mat"),   # exact dup
                ("w", "en", 3, "THE  cat sat on the MAT"),  # normalized dup
                ("w", "en", 4, None),                       # null text
                ("b", "de", 5, "ein ganz anderer text hier"),
            ],
            "source string, lang string, doc_id long, text string",
        )
        out = {
            (r["source"], r["lang"]): r
            for r in corpus_datasheet(df).collect()
        }
        w = out[("w", "en")]
        assert w["docs"] == 4
        assert w["tokens"] == 6 + 6 + 6 + 0
        # 3 texts normalize to one fingerprint + the null-as-empty one
        assert w["uniq_docs"] == 2
        assert w["dup_ppm"] == (1_000_000 * 2) // 4
        b = out[("b", "de")]
        assert b["docs"] == 1 and b["uniq_docs"] == 1 and b["dup_ppm"] == 0

    def test_mean_quality_is_half_up_integer(self, spark):
        from unstructured_spark.operators.text_analysis import (
            corpus_datasheet,
            with_quality_q,
        )

        df = spark.createDataFrame(
            [("s", "en", 1, "alpha beta gamma delta"),
             ("s", "en", 2, "alpha alpha alpha alpha")],
            "source string, lang string, doc_id long, text string",
        )
        qs = [
            r["quality_q"] for r in with_quality_q(df).collect()
        ]
        want = (2 * sum(qs) + len(qs)) // (2 * len(qs))
        got = corpus_datasheet(df).collect()[0]["avg_quality_q"]
        assert got == want


class TestTokenLengthQuantiles:
    def test_discrete_lower_quantile_semantics(self, spark):
        from unstructured_spark.operators.text_analysis import (
            token_length_quantiles,
        )

        # 10 docs with 1..10 tokens: p25 -> rank ceil(2.5)=3 -> 3 tokens,
        # p50 -> rank 5, p75 -> rank ceil(7.5)=8, p95 -> rank ceil(9.5)=10
        rows = [("s", " ".join(["w"] * k)) for k in range(1, 11)]
        df = spark.createDataFrame(rows, "source string, text string")
        r = token_length_quantiles(df).collect()[0]
        assert (r["docs"], r["p25_tokens"], r["p50_tokens"],
                r["p75_tokens"], r["p95_tokens"]) == (10, 3, 5, 8, 10)

    def test_matches_python_reference_on_ties(self, spark):
        import math

        from unstructured_spark.operators.text_analysis import (
            token_length_quantiles,
        )

        lens = [5, 5, 5, 7, 7, 9, 11, 11, 11, 11, 2]
        rows = [("s", " ".join(["t"] * k)) for k in lens]
        df = spark.createDataFrame(rows, "source string, text string")
        r = token_length_quantiles(df).collect()[0]
        srt = sorted(lens)
        for p in (25, 50, 75, 95):
            want = srt[math.ceil(p * len(lens) / 100) - 1]
            assert r[f"p{p}_tokens"] == want, p


class TestQualityQCrossEngine:
    def test_randomized_parity_with_duckdb(self, spark, tmp_path):
        # one batched run over ~300 adversarial texts: the integer
        # quality key must be bit-identical across engines (this is
        # the key selections order by - a single divergence flips a
        # budget/cutoff boundary)
        import random

        import duckdb

        from unstructured_spark.operators.text_analysis import (
            quality_q_sql,
            with_quality_q,
        )

        rng = random.Random(99)
        words = ["the", "and", "alpha", "Beta", "GAMMA", "x", "yz",
                 "supercalifragilistic", "data", "1234", "a,b;c",
                 "café", "über", "not", "but", "it"]
        seps = [" ", "  ", "\t", "\n", " \t "]
        texts = []
        for i in range(300):
            n = rng.randint(0, 40)
            t = "".join(
                rng.choice(words) + rng.choice(seps) for _ in range(n)
            )
            texts.append((i, t if rng.random() > 0.05 else None))
        texts += [(1000, ""), (1001, "   "), (1002, "\t\n"),
                  (1003, "one"), (1004, None)]
        df = spark.createDataFrame(texts, "doc_id long, text string")
        got = {
            r["doc_id"]: r["quality_q"]
            for r in with_quality_q(df).collect()
        }
        pq = str(tmp_path / "texts.parquet")
        df.write.parquet(pq, mode="overwrite")
        con = duckdb.connect()
        want = dict(
            con.sql(
                f"""
                select doc_id, cast({quality_q_sql()} as bigint)
                from (select doc_id,
                             string_split_regex(trim(coalesce(text, '')),
                                                '\\s+') as t
                      from '{pq}/*.parquet')
                """
            ).fetchall()
        )
        assert got == want


class TestInterleaveShuffleSeed:
    def test_schedule_preserved_order_reshuffled(self, spark):
        from unstructured_spark.operators.sampling import interleave_by_weight

        docs = spark.createDataFrame(
            [(i, "a" if i % 2 == 0 else "b") for i in range(40)],
            "doc_id long, source string",
        )
        w = {"a": 3, "b": 1}
        plain = interleave_by_weight(docs, w)
        shuf = interleave_by_weight(docs, w, shuffle_seed="e1")
        # the SCHEDULE (source at each emit position) is identical —
        # only which document of the source fills the slot changes
        sched = lambda d: [  # noqa: E731
            r["source"]
            for r in d.orderBy("emit_order").collect()
        ]
        assert sched(plain) == sched(shuf)
        order = lambda d: [  # noqa: E731
            r["doc_id"] for r in d.orderBy("emit_order").collect()
        ]
        assert order(plain) != order(shuf)
        # deterministic: same seed = same permutation; new seed differs
        assert order(shuf) == order(
            interleave_by_weight(docs, w, shuffle_seed="e1")
        )
        assert order(shuf) != order(
            interleave_by_weight(docs, w, shuffle_seed="e2")
        )
        # still a dense 0-based rank
        assert sorted(r["emit_order"] for r in shuf.collect()) == list(
            range(40)
        )


class TestNgramDiversity:
    def test_template_source_scores_low(self, spark):
        from unstructured_spark.operators.text_analysis import ngram_diversity

        template = [("tpl", "click here to buy now " + str(i % 2))
                    for i in range(20)]
        varied = [("var", f"document {i} talks about topic {i * 7} today")
                  for i in range(20)]
        df = spark.createDataFrame(
            template + varied, "source string, text string"
        )
        out = {r["source"]: r for r in ngram_diversity(df, n=3).collect()}
        # tpl: 20 docs x 4 positions = 80 total; the two variants share
        # their first 3 grams and differ only in (buy, now, i%2) -> 5
        assert out["tpl"]["total_grams"] == 80
        assert out["tpl"]["distinct_grams"] == 5
        assert out["tpl"]["diversity_ppm"] == (1_000_000 * 5) // 80
        assert out["var"]["diversity_ppm"] > out["tpl"]["diversity_ppm"]

    def test_short_and_null_docs_contribute_nothing(self, spark):
        from unstructured_spark.operators.text_analysis import ngram_diversity

        df = spark.createDataFrame(
            [("s", "one two"), ("s", None), ("s", "")],
            "source string, text string",
        )
        [r] = ngram_diversity(df, n=3).collect()
        assert (r["total_grams"], r["distinct_grams"],
                r["diversity_ppm"]) == (0, 0, 0)

    def test_global_budget_without_strata(self, spark):
        import pyspark.sql.functions as SF
        from pyspark.sql.window import Window as W

        from unstructured_spark.operators.sampling import select_token_budget

        df = spark.range(100).select(
            SF.col("id").alias("doc_id"),
            ((SF.col("id") * 31) % 13).cast("long").alias("quality_q"),
            ((SF.col("id") * 7) % 17 + 1).cast("long").alias("ntok"),
        )
        got = select_token_budget(df, 120, strata=None)
        assert set(got.columns) == {"doc_id", "quality_q", "ntok",
                                    "cum_tokens"}
        w = (
            W.orderBy(SF.col("quality_q").desc(), SF.col("doc_id").asc())
            .rowsBetween(W.unboundedPreceding, 0)
        )
        naive = (
            df.withColumn("cum_tokens", SF.sum("ntok").over(w))
            .filter(SF.col("cum_tokens") <= 120)
        )
        key = lambda d: sorted(  # noqa: E731
            (r["doc_id"], r["cum_tokens"]) for r in d.collect()
        )
        assert key(got) == key(naive)

    def test_global_cutoff_without_strata(self, spark):
        from unstructured_spark.operators.sampling import quality_cutoff

        df = spark.createDataFrame(
            [("a", i, (i * 7) % 5) for i in range(10)],
            "source string, doc_id long, quality_q long",
        )
        out = quality_cutoff(df, 3, 10, strata=None)
        assert set(out.columns) == {"source", "doc_id", "quality_q",
                                    "q_rank"}
        assert sorted(r["q_rank"] for r in out.collect()) == [1, 2, 3]


class TestShuffledShards:
    def test_epoch_shuffle_feeds_shard_assignment(self, spark):
        # the composition the loader runs per epoch: shuffle_rank is a
        # dense numeric id, so it drops straight into the shard
        # assigner's prefix sum - shards then follow the epoch order
        from unstructured_spark.operators.sampling import (
            assign_token_shards,
            corpus_shuffle,
        )

        docs = spark.createDataFrame(
            [(i, " ".join(["w"] * 10)) for i in range(40)],
            "doc_id long, text string",
        )
        shuffled = corpus_shuffle(docs, seed="ep3").select(
            F.col("shuffle_rank"), F.col("doc_id").alias("orig_id"), "text"
        )
        assigned = assign_token_shards(
            shuffled, 100, doc_id="shuffle_rank"
        )
        rows = {r["shuffle_rank"]: r["shard_id"] for r in assigned.collect()}
        # 40 docs x 10 tokens / 100 per shard = 4 shards of 10 docs,
        # in SHUFFLE order: ranks 0-9 -> shard 0, ..., 30-39 -> shard 3
        assert len(rows) == 40
        for rank, shard in rows.items():
            assert shard == rank // 10

    def test_null_ids_excluded_explicitly(self, spark):
        from unstructured_spark.operators.sampling import corpus_shuffle

        df = spark.createDataFrame(
            [(1,), (None,), (3,)], "doc_id long"
        )
        out = corpus_shuffle(df, seed="n")
        assert sorted(r["doc_id"] for r in out.collect()) == [1, 3]
        assert sorted(r["shuffle_rank"] for r in out.collect()) == [0, 1]


class TestCurriculumOrder:
    def test_bands_contiguous_and_shuffled_within(self, spark):
        from unstructured_spark.operators.sampling import (
            corpus_shuffle,
            curriculum_order,
        )

        docs = spark.createDataFrame(
            [(i, i % 3) for i in range(90)], "doc_id long, band long"
        )
        out = curriculum_order(docs, "band", seed="s1").collect()
        assert sorted(r["curriculum_rank"] for r in out) == list(range(90))
        # band blocks are contiguous and ascending
        by_rank = sorted(out, key=lambda r: r["curriculum_rank"])
        bands = [r["band"] for r in by_rank]
        assert bands == sorted(bands)
        # within a band the order is the seed permutation, not doc_id
        band0 = [r["doc_id"] for r in by_rank if r["band"] == 0]
        assert band0 != sorted(band0)
        # same seed reproduces; new seed re-permutes within bands only
        again = curriculum_order(docs, "band", seed="s1").collect()
        assert sorted(map(tuple, again)) == sorted(map(tuple, out))
        other = sorted(
            curriculum_order(docs, "band", seed="s2").collect(),
            key=lambda r: r["curriculum_rank"],
        )
        assert [r["band"] for r in other] == bands
        assert [r["doc_id"] for r in other] != [r["doc_id"] for r in by_rank]
        # within-band order IS the epoch-shuffle order for that band
        shuf = {
            r["doc_id"]: r["shuffle_rank"]
            for r in corpus_shuffle(
                docs.filter("band = 0").select("doc_id"), seed="s1"
            ).collect()
        }
        assert band0 == sorted(band0, key=lambda d: shuf[d])

    def test_null_band_and_id_excluded(self, spark):
        from unstructured_spark.operators.sampling import curriculum_order

        docs = spark.createDataFrame(
            [(1, 0), (None, 0), (3, None), (4, 1)],
            "doc_id long, band long",
        )
        out = curriculum_order(docs, "band").collect()
        assert sorted(r["doc_id"] for r in out) == [1, 4]
        assert sorted(r["curriculum_rank"] for r in out) == [0, 1]


class TestMixtureReweight:
    def _frame(self, spark):
        # domain A: low scores (easy), domain B: high scores (hard),
        # equal token mass
        rows = [
            ("A", 100, 10),
            ("A", 120, 10),
            ("B", 300, 10),
            ("B", 280, 10),
        ]
        return spark.createDataFrame(
            rows, "source string, score_q long, ntok long"
        )

    def test_hard_domain_upweighted(self, spark):
        from unstructured_spark.operators.sampling import mixture_reweight

        out = {
            r["source"]: r
            for r in mixture_reweight(
                self._frame(spark),
                score_col="score_q",
                token_col="ntok",
            ).collect()
        }
        assert out["B"]["mean_score_q"] > out["A"]["mean_score_q"]
        assert out["B"]["mult_ppm"] > 1_000_000 > out["A"]["mult_ppm"]
        assert out["B"]["weight_ppm"] > out["A"]["weight_ppm"]
        # equal token mass going in
        assert out["A"]["base_ppm"] == out["B"]["base_ppm"] == 500_000
        # normalized mixture sums to ~1e6 (floor-division slack < |domains|)
        total = sum(r["weight_ppm"] for r in out.values())
        assert 1_000_000 - 2 <= total <= 1_000_000

    def test_step_zero_is_identity(self, spark):
        from unstructured_spark.operators.sampling import mixture_reweight

        out = {
            r["source"]: r
            for r in mixture_reweight(
                self._frame(spark),
                score_col="score_q",
                token_col="ntok",
                step_ppm=0,
            ).collect()
        }
        # no step -> mixture equals the token share
        for r in out.values():
            assert r["mult_ppm"] == 1_000_000
            assert abs(r["weight_ppm"] - r["base_ppm"]) <= 1

    def test_uniform_scores_keep_shares(self, spark):
        from unstructured_spark.operators.sampling import mixture_reweight

        rows = [("A", 200, 30), ("B", 200, 10)]
        df = spark.createDataFrame(
            rows, "source string, score_q long, ntok long"
        )
        out = {
            r["source"]: r
            for r in mixture_reweight(
                df, score_col="score_q", token_col="ntok"
            ).collect()
        }
        assert out["A"]["base_ppm"] == 750_000
        assert out["A"]["mult_ppm"] == out["B"]["mult_ppm"] == 1_000_000
        assert abs(out["A"]["weight_ppm"] - 750_000) <= 1

    def test_all_integer_schema(self, spark):
        from unstructured_spark.operators.sampling import mixture_reweight

        out = mixture_reweight(
            self._frame(spark), score_col="score_q", token_col="ntok"
        )
        for f in out.schema.fields:
            if f.name != "source":
                assert f.dataType.simpleString() == "bigint", f.name
