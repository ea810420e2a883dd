"""BPE tokenizer-training primitives: word counts, pair statistics,
merge learning, encoding, vocabulary coverage."""

import pytest

from unstructured_spark.operators.tokenizer import (
    END_OF_WORD,
    bpe_encode,
    bpe_learn_merges,
    bpe_pair_counts,
    vocab_coverage,
    word_counts,
)


def _corpus(spark, rows):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(rows)], "doc_id long, text string"
    )


class TestWordCounts:
    def test_counts_lowercased_and_blank_filtered(self, spark):
        df = _corpus(spark, ["The cat  the\tCat", "", "   ", None, "dog"])
        got = {r["word"]: r["n"] for r in word_counts(df).collect()}
        assert got == {"the": 2, "cat": 2, "dog": 1}

    def test_case_preserving_mode(self, spark):
        df = _corpus(spark, ["The the"])
        got = {
            r["word"]: r["n"]
            for r in word_counts(df, lowercase=False).collect()
        }
        assert got == {"The": 1, "the": 1}


class TestPairCounts:
    def test_hand_computed_pairs(self, spark):
        # "ab" x3, "b" x1:
        #   ab -> (a,b) 3, (b,</w>) 3 ; b -> (b,</w>) 1
        wc = spark.createDataFrame(
            [("ab", 3), ("b", 1)], "word string, n long"
        )
        got = {
            (r["a"], r["b"]): r["pair_count"]
            for r in bpe_pair_counts(wc).collect()
        }
        assert got == {("a", "b"): 3, ("b", END_OF_WORD): 4}

    def test_single_char_word_pairs_with_marker(self, spark):
        wc = spark.createDataFrame([("x", 5)], "word string, n long")
        got = bpe_pair_counts(wc).collect()
        assert [(r["a"], r["b"], r["pair_count"]) for r in got] == [
            ("x", END_OF_WORD, 5)
        ]


class TestLearnMerges:
    def test_learns_the_frequent_bigram_first(self, spark):
        # "low" x5, "lower" x2, "newest" x6, "widest" x3 -- the classic
        # Sennrich example: (e,s) 9 then (es,t) 9 then (est,</w>) 9 ...
        df = _corpus(
            spark,
            ["low "] * 5 + ["lower "] * 2 + ["newest "] * 6 + ["widest "] * 3,
        )
        merges = bpe_learn_merges(df, num_merges=3)
        assert merges[0] == ("e", "s", 9)
        assert merges[1] == ("es", "t", 9)
        assert merges[2] == ("est", END_OF_WORD, 9)

    def test_tie_breaks_lexicographically(self, spark):
        # "ab" and "cd" both appear twice: (a,b) and (c,d) tie at 2 with
        # (b,</w>) and (d,</w>) -- smallest pair (a,b) must win
        df = _corpus(spark, ["ab cd", "ab cd"])
        merges = bpe_learn_merges(df, num_merges=1)
        assert merges == [("a", "b", 2)]

    def test_deterministic_across_runs(self, spark):
        df = _corpus(spark, ["the cat sat on the mat", "the cat ran"])
        m1 = bpe_learn_merges(df, num_merges=8)
        m2 = bpe_learn_merges(df, num_merges=8)
        assert m1 == m2

    def test_min_frequency_stops_early(self, spark):
        df = _corpus(spark, ["ab ab xy"])
        merges = bpe_learn_merges(df, num_merges=10, min_frequency=2)
        # only pairs with count >= 2 are learnable: a+b, ab+</w>
        assert len(merges) == 2
        assert all(cnt >= 2 for _, _, cnt in merges)

    def test_max_words_caps_the_table(self, spark):
        # with max_words=1 only the most frequent word ("zz" x3) trains
        df = _corpus(spark, ["zz zz zz qq qq"])
        merges = bpe_learn_merges(df, num_merges=4, max_words=1)
        # "qq" never enters the table: no merge may involve 'q'
        assert merges and all(
            "q" not in a and "q" not in b for a, b, _ in merges
        )
        # ties at 3 break lexicographically: '<' < 'z' so (z,</w>) first
        assert merges[0] == ("z", END_OF_WORD, 3)


class TestEncode:
    def test_round_trip_restores_words(self, spark):
        df = _corpus(spark, ["the cat sat", "the mat"])
        merges = bpe_learn_merges(df, num_merges=6)
        out = {
            r["doc_id"]: r["tokens"]
            for r in bpe_encode(df, merges).collect()
        }
        # stripping markers and concatenating restores the word stream
        def restore(toks):
            return "".join(toks).replace(END_OF_WORD, " ").split()

        assert restore(out[0]) == ["the", "cat", "sat"]
        assert restore(out[1]) == ["the", "mat"]

    def test_learned_word_becomes_one_token(self, spark):
        df = _corpus(spark, ["aaa aaa aaa aaa"])
        merges = bpe_learn_merges(df, num_merges=3)
        out = bpe_encode(df, merges).collect()[0]["tokens"]
        assert out == ["aaa" + END_OF_WORD] * 4

    def test_unseen_chars_stay_unmerged(self, spark):
        train = _corpus(spark, ["aa aa"])
        merges = bpe_learn_merges(train, num_merges=2)
        out = bpe_encode(_corpus(spark, ["qq"]), merges).collect()[0][
            "tokens"
        ]
        assert out == ["q", "q", END_OF_WORD]


class TestVocabCoverage:
    def test_exact_integer_curve(self, spark):
        # 10 tokens total: the x4, cat x3, sat x2, mat x1
        df = _corpus(spark, ["the the the the cat cat cat sat sat mat"])
        rows = vocab_coverage(df, top_k=3).collect()
        got = [
            (r["token"], r["cnt"], r["rank"], r["cum_cnt"], r["coverage_ppm"])
            for r in sorted(rows, key=lambda r: r["rank"])
        ]
        assert got == [
            ("the", 4, 1, 4, 400000),
            ("cat", 3, 2, 7, 700000),
            ("sat", 2, 3, 9, 900000),
        ]

    def test_full_vocab_covers_everything(self, spark):
        df = _corpus(spark, ["a b c a"])
        rows = vocab_coverage(df, top_k=10).collect()
        assert max(r["coverage_ppm"] for r in rows) == 1_000_000

    def test_rank_ties_break_on_token(self, spark):
        df = _corpus(spark, ["b a b a"])
        rows = sorted(vocab_coverage(df, top_k=2).collect(), key=lambda r: r["rank"])
        assert [r["token"] for r in rows] == ["a", "b"]


class TestEncodeStreaming:
    def test_bpe_encode_runs_on_a_real_stream(self, spark, tmp_path):
        src = tmp_path / "src"
        src.mkdir()
        batch = spark.createDataFrame(
            [(0, "aa aa bb"), (1, "aa bb bb")], "doc_id long, text string"
        )
        batch.write.parquet(str(src), mode="overwrite")
        merges = bpe_learn_merges(batch, num_merges=4)
        stream = spark.readStream.schema("doc_id long, text string").parquet(
            str(src)
        )
        enc = bpe_encode(stream, merges)
        assert enc.isStreaming
        q = (
            enc.writeStream.format("parquet")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        out = {
            r["doc_id"]: r["tokens"]
            for r in spark.read.parquet(str(tmp_path / "out")).collect()
        }
        want = {
            r["doc_id"]: r["tokens"] for r in bpe_encode(batch, merges).collect()
        }
        assert out == want and len(out) == 2


class TestVocab:
    def test_vocab_layout_alphabet_then_merges(self, spark):
        from unstructured_spark.operators.tokenizer import (
            bpe_vocab,
            corpus_alphabet,
        )

        df = _corpus(spark, ["ab ab b"])
        alpha = corpus_alphabet(df)
        assert alpha == ["a", "b"]
        merges = bpe_learn_merges(df, num_merges=2)
        vocab = bpe_vocab(merges, alpha)
        # sorted base alphabet + marker first ('<' sorts before letters)
        assert vocab[END_OF_WORD] == 0
        assert vocab["a"] == 1 and vocab["b"] == 2
        # then merge outputs in merge order, ids dense
        assert sorted(vocab.values()) == list(range(len(vocab)))
        assert len(vocab) == 3 + len(merges)

    def test_duplicate_merge_output_keeps_first_id(self, spark):
        from unstructured_spark.operators.tokenizer import bpe_vocab

        vocab = bpe_vocab(
            [("a", "b", 5), ("a", "b", 5)], ["a", "b"]
        )
        assert list(vocab) == [END_OF_WORD, "a", "b", "ab"]
