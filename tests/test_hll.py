"""Engine-exact HyperLogLog: integer estimator, mergeability, accuracy."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from unstructured_spark.operators.sketches import (
    HLL_P_DEFAULT,
    hll_alpha_q20,
    hll_distinct_audit,
    hll_estimate,
    hll_registers,
)
from unstructured_spark.operators.text_analysis import FXLN_SCALE, fxln_int


def py_hll_estimate(tokens, p=HLL_P_DEFAULT):
    """Driver-side integer twin of hll_registers + hll_estimate —
    bit-for-bit the SQL chain, the same pin discipline as fxln_int."""
    m, w = 1 << p, 60 - p
    alpha_q = hll_alpha_q20(m)
    regs: dict[int, int] = {}
    for t in tokens:
        h = int(hashlib.md5(t.encode()).hexdigest()[:15], 16)
        j, suf = h % m, h // m
        rho = (w + 1 - suf.bit_length()) if suf > 0 else w + 1
        regs[j] = max(regs.get(j, 0), rho)
    s = sum(1 << (w + 1 - M) for M in regs.values())
    s += (m - len(regs)) * (1 << (w + 1))
    raw = ((alpha_q * m * m * (1 << (w + 1))) // s) // (1 << 20)
    v = m - len(regs)
    if v > 0 and raw <= 5 * m // 2:
        return (m * (fxln_int(m) - fxln_int(max(v, 1)))) // FXLN_SCALE
    return raw


def _est(spark, tokens, p=HLL_P_DEFAULT):
    df = spark.createDataFrame([(t,) for t in tokens], "token string")
    regs = hll_registers(df, item="token", p=p)
    [row] = hll_estimate(regs, p=p).collect()
    return row["distinct_est"]


class TestHllExactness:
    def test_spark_matches_python_twin_large(self, spark):
        tokens = [f"tok-{i}" for i in range(20_000)]
        assert _est(spark, tokens) == py_hll_estimate(tokens)

    def test_spark_matches_python_twin_small_range(self, spark):
        # 10 distinct -> linear-counting branch on both sides
        tokens = [f"t{i}" for i in range(10)] * 3
        got = _est(spark, tokens)
        assert got == py_hll_estimate(tokens)
        assert abs(got - 10) <= 1  # linear counting is near-exact here

    def test_duplicates_do_not_change_estimate(self, spark):
        uniq = [f"u{i}" for i in range(5_000)]
        assert _est(spark, uniq) == _est(spark, uniq * 4)


class TestHllAccuracy:
    def test_error_within_4_sigma(self, spark):
        n = 30_000
        est = _est(spark, [f"item/{i}" for i in range(n)])
        m = 1 << HLL_P_DEFAULT
        sigma = 1.04 / (m ** 0.5)  # ~1.6% at p=12
        assert abs(est - n) / n < 4 * sigma


class TestHllMerge:
    def test_register_max_merge_equals_whole(self, spark):
        toks = [f"w{i}" for i in range(8_000)]
        half_a = spark.createDataFrame(
            [(t,) for t in toks[:5_000]], "token string"
        )
        half_b = spark.createDataFrame(
            [(t,) for t in toks[3_000:]], "token string"  # overlapping
        )
        merged = (
            hll_registers(half_a, item="token")
            .unionByName(hll_registers(half_b, item="token"))
            .groupBy("j")
            .agg(F.max("M").alias("M"))
        )
        [row_m] = hll_estimate(merged).collect()
        whole = spark.createDataFrame([(t,) for t in toks], "token string")
        [row_w] = hll_estimate(hll_registers(whole, item="token")).collect()
        assert row_m["distinct_est"] == row_w["distinct_est"]

    def test_unmerged_union_estimates_defensively(self, spark):
        # r11 ADVICE: a caller unioning per-shard register tables
        # WITHOUT the groupBy-max merge (the plausible misuse —
        # hll_partials_stream emits per-window partials) must still get
        # the correct estimate: hll_estimate re-merges internally, so
        # duplicate (group, j) rows can no longer inflate the occupied
        # count or corrupt the harmonic sum.
        toks = [f"w{i}" for i in range(8_000)]
        half_a = spark.createDataFrame(
            [(t,) for t in toks[:5_000]], "token string"
        )
        half_b = spark.createDataFrame(
            [(t,) for t in toks[3_000:]], "token string"
        )
        unmerged = hll_registers(half_a, item="token").unionByName(
            hll_registers(half_b, item="token")
        )
        [row_u] = hll_estimate(unmerged).collect()
        whole = spark.createDataFrame([(t,) for t in toks], "token string")
        [row_w] = hll_estimate(hll_registers(whole, item="token")).collect()
        assert row_u["distinct_est"] == row_w["distinct_est"]


class TestHllAudit:
    def test_audit_shape_and_sign(self, spark):
        rows = [
            (i, " ".join(f"s{i % 2}w{j}" for j in range(40)), f"src{i % 2}")
            for i in range(50)
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string, source string")
        out = {r["source"]: r for r in hll_distinct_audit(df).collect()}
        assert set(out) == {"src0", "src1"}
        for r in out.values():
            assert r["exact_distinct"] == 40
            # 40 distinct -> linear counting, near exact
            assert abs(r["distinct_est"] - 40) <= 2
            expected_ppm = (
                (r["distinct_est"] - 40) * 1_000_000 // 40
                if r["distinct_est"] >= 40
                else -((40 - r["distinct_est"]) * 1_000_000 // 40)
            )
            # integer `div` truncates toward zero
            assert abs(r["err_ppm"] - expected_ppm) <= 25_000


class TestHllStreaming:
    def test_stream_partials_match_batch(self, spark, tmp_path):
        import json

        from unstructured_spark.streaming.pipeline import hll_partials_stream

        rows = [
            {"ingest_ts": "2024-01-01 00:10:00", "source": "a",
             "text": "alpha beta gamma"},
            {"ingest_ts": "2024-01-01 00:20:00", "source": "a",
             "text": "beta delta"},
            {"ingest_ts": "2024-01-01 00:40:00", "source": "b",
             "text": "alpha alpha epsilon"},
        ]
        # second micro-batch far past the watermark horizon so the
        # hour-0 windows FINALIZE (append mode emits nothing otherwise)
        late = [{"ingest_ts": "2024-01-01 06:00:00", "source": "z",
                 "text": "omega"}]
        src = tmp_path / "in"
        src.mkdir()
        for name, batch in (("b1.json", rows), ("b2.json", late)):
            with open(src / name, "w") as f:
                for r in batch:
                    f.write(json.dumps(r) + "\n")
        stream = spark.readStream.schema(
            "ingest_ts timestamp, source string, text string"
        ).option("maxFilesPerTrigger", 1).json(str(src))
        partials = hll_partials_stream(
            stream, window="1 hour", watermark="2 hours"
        )
        q = (
            partials.writeStream.format("memory").queryName("hllp")
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        got = spark.sql(
            "select * from hllp where window_start = '2024-01-01 00:00:00'"
        )
        est = {
            (r["source"]): r["distinct_est"]
            for r in hll_estimate(
                got, group_cols=("window_start", "window_end", "source")
            ).collect()
        }
        # batch twin over the same rows
        batch = spark.createDataFrame(
            [("a", t) for t in "alpha beta gamma beta delta".split()]
            + [("b", t) for t in "alpha alpha epsilon".split()],
            "source string, token string",
        )
        bexp = {
            r["source"]: r["distinct_est"]
            for r in hll_estimate(
                hll_registers(batch, item="token", group_cols=("source",)),
                group_cols=("source",),
            ).collect()
        }
        assert est == bexp
        assert abs(est["a"] - 4) <= 1 and abs(est["b"] - 2) <= 1
