"""Exact substring dedup (shared k-gram spans) + benchmark
decontamination — the passage-level train-data primitives
(Lee et al. 2022; GPT-3 appendix-C 13-gram overlap)."""

from unstructured_spark.operators.dedup import (
    contaminated_docs,
    shared_ngram_spans,
)


def _words(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


class TestSharedNgramSpans:
    def test_single_maximal_span(self, spark):
        shared = _words("s", 8)  # 8 shared tokens
        df = spark.createDataFrame(
            [
                ("a", _words("x", 5) + " " + shared + " " + _words("y", 4)),
                ("b", shared + " " + _words("z", 6)),
            ],
            "doc_id string, text string",
        )
        rows = shared_ngram_spans(df, k=5).collect()
        assert len(rows) == 1
        r = rows[0]
        # maximal run: all 8 shared tokens reported once, not per-window
        assert (r["doc_a"], r["doc_b"]) == ("a", "b")
        assert r["match_tokens"] == 8
        assert r["start_a"] == 5 and r["start_b"] == 0

    def test_below_k_overlap_not_reported(self, spark):
        shared = _words("s", 4)
        df = spark.createDataFrame(
            [
                ("a", shared + " " + _words("x", 6)),
                ("b", shared + " " + _words("z", 6)),
            ],
            "doc_id string, text string",
        )
        assert shared_ngram_spans(df, k=5).count() == 0

    def test_two_separate_spans(self, spark):
        s1, s2 = _words("p", 5), _words("q", 5)
        df = spark.createDataFrame(
            [
                ("a", s1 + " " + _words("x", 3) + " " + s2),
                ("b", s2 + " " + _words("y", 3) + " " + s1),
            ],
            "doc_id string, text string",
        )
        rows = shared_ngram_spans(df, k=5).collect()
        spans = sorted((r["start_a"], r["start_b"], r["match_tokens"]) for r in rows)
        assert spans == [(0, 8, 5), (8, 0, 5)]

    def test_gram_freq_cap_drops_boilerplate(self, spark):
        boiler = _words("b", 6)
        rows = [(str(i), boiler + " " + _words(f"u{i}_", 4)) for i in range(5)]
        df = spark.createDataFrame(rows, "doc_id string, text string")
        assert shared_ngram_spans(df, k=5).count() == 10  # 5-doc clique
        assert shared_ngram_spans(df, k=5, max_gram_freq=3).count() == 0


class TestContaminatedDocs:
    def test_flags_verbatim_benchmark_gram(self, spark):
        bench_text = _words("q", 15)
        bench = spark.createDataFrame([("b1", bench_text)], "doc_id string, text string")
        corpus = spark.createDataFrame(
            [
                # contains benchmark tokens 0..12 verbatim
                ("c1", _words("x", 3) + " " + _words("q", 13)),
                ("c2", _words("z", 20)),
            ],
            "doc_id string, text string",
        )
        out = {r["doc_id"]: r for r in contaminated_docs(corpus, bench, k=13).collect()}
        assert set(out) == {"c1"}
        assert out["c1"]["contaminated_grams"] == 1
        assert out["c1"]["total_grams"] == 16 - 13 + 1
        assert abs(out["c1"]["contamination"] - 1 / 4) < 1e-9

    def test_distinct_grams_counted_once(self, spark):
        g = _words("q", 13)
        bench = spark.createDataFrame([("b1", g)], "doc_id string, text string")
        # the same 13-gram occurs twice in the corpus doc, distinct-ed to 1
        corpus = spark.createDataFrame(
            [("c1", g + " " + g)], "doc_id string, text string"
        )
        [r] = contaminated_docs(corpus, bench, k=13).collect()
        assert r["contaminated_grams"] == 1


class TestRemoveSharedSpans:
    def test_keeps_first_occurrence_cuts_second(self, spark):
        shared = _words("s", 8)
        df = spark.createDataFrame(
            [
                ("a", shared + " " + _words("x", 4)),
                ("b", _words("y", 3) + " " + shared + " " + _words("z", 2)),
            ],
            "doc_id string, text string",
        )
        from unstructured_spark.operators.dedup import remove_shared_spans

        got = {r["doc_id"]: r for r in remove_shared_spans(df, k=5).collect()}
        assert got["a"]["removed_tokens"] == 0
        assert got["a"]["text"] == shared + " " + _words("x", 4)
        assert got["b"]["removed_tokens"] == 8
        assert got["b"]["text"] == _words("y", 3) + " " + _words("z", 2)

    def test_no_spans_no_change(self, spark):
        from unstructured_spark.operators.dedup import remove_shared_spans

        df = spark.createDataFrame(
            [("a", _words("p", 6)), ("b", _words("q", 6))],
            "doc_id string, text string",
        )
        got = {r["doc_id"]: r for r in remove_shared_spans(df, k=5).collect()}
        assert all(r["removed_tokens"] == 0 for r in got.values())

    def test_overlapping_spans_union(self, spark):
        # doc c shares one long run with a and a shifted overlapping run
        # with b; removal is the positional UNION, counted once
        base = _words("s", 12)
        from unstructured_spark.operators.dedup import remove_shared_spans

        df = spark.createDataFrame(
            [
                ("a", base),
                ("b", _words("s", 12)),  # identical -> same spans
                ("c", base + " tail1 tail2"),
            ],
            "doc_id string, text string",
        )
        got = {r["doc_id"]: r for r in remove_shared_spans(df, k=5).collect()}
        assert got["a"]["removed_tokens"] == 0  # first occurrence everywhere
        assert got["b"]["removed_tokens"] == 12
        assert got["c"]["removed_tokens"] == 12
        assert got["c"]["text"] == "tail1 tail2"
