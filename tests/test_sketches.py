"""Count-min sketch invariants: never undercounts, linear merge,
bounded grid, exact when collision-free."""

from __future__ import annotations

from pyspark.sql import functions as F

from unstructured_spark.operators.sketches import (
    cms_error_audit,
    cms_from_counts,
)
from unstructured_spark.operators.tokenizer import word_counts


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


class TestCmsFromCounts:
    def test_grid_bounded_and_mass_preserved_per_row(self, spark):
        wc = word_counts(_docs(spark, ["a b c a", "b b d"]))
        d, w = 4, 16
        sk = cms_from_counts(wc, d=d, w=w).collect()
        assert len(sk) <= d * w
        total = sum(r["n"] for r in wc.collect())
        # each hash row receives every occurrence exactly once
        for r in range(d):
            assert sum(x["cnt"] for x in sk if x["r"] == r) == total

    def test_merge_is_cellwise_sum(self, spark):
        """Counters are linear: sketch(slice1) + sketch(slice2) ==
        sketch(whole corpus), cell for cell — the incremental-build
        contract."""
        t1, t2 = ["a b c a", "e f"], ["b b d", "a e"]
        g = lambda texts: {
            (r["r"], r["b"]): r["cnt"]
            for r in cms_from_counts(
                word_counts(_docs(spark, texts)), d=3, w=8
            ).collect()
        }
        g1, g2, gall = g(t1), g(t2), g(t1 + t2)
        merged = dict(g1)
        for k, v in g2.items():
            merged[k] = merged.get(k, 0) + v
        assert merged == gall


class TestCmsErrorAudit:
    def test_never_undercounts_and_exact_when_wide(self, spark):
        docs = _docs(spark, ["x y z x", "y y w", "x q"])
        out = cms_error_audit(docs, top_k=10, d=4, w=4096).collect()
        exact = {
            r["word"]: r["n"] for r in word_counts(docs).collect()
        }
        assert {r["token"] for r in out} == set(exact)
        for r in out:
            assert r["cms_est"] >= r["exact_cnt"] == exact[r["token"]]
            assert r["overcount_ppm"] >= 0
        # w >> vocab: collisions vanishingly unlikely at 60-bit md5
        assert all(r["cms_est"] == r["exact_cnt"] for r in out)

    def test_narrow_grid_overcounts_but_orders_survive(self, spark):
        # 6 tokens into w=2 buckets forces collisions: estimates
        # inflate, never deflate
        docs = _docs(spark, ["a a a a b b c d e f"])
        out = {
            r["token"]: (r["exact_cnt"], r["cms_est"])
            for r in cms_error_audit(docs, top_k=6, d=2, w=2).collect()
        }
        assert len(out) == 6
        assert all(est >= ex for ex, est in out.values())
        assert any(est > ex for ex, est in out.values())
