"""As-of and range joins (beyond-reference temporal operators)."""

from __future__ import annotations

import datetime as dt

from unstructured_spark.operators.asof import asof_join, range_join_seconds


def _ts(s: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


class TestAsofJoin:
    def _frames(self, spark):
        left = spark.createDataFrame(
            [("L1", "u1", _ts(100)), ("L2", "u1", _ts(10)), ("L3", "u2", _ts(50))],
            "id string, user_id string, ts timestamp",
        )
        right = spark.createDataFrame(
            [("R1", "u1", _ts(50)), ("R2", "u1", _ts(90)), ("R3", "u1", _ts(150)),
             ("R4", "u3", _ts(1))],
            "rid string, user_id string, ts timestamp",
        )
        return left, right.select("user_id", "ts", "rid")

    def test_backward_latest_at_or_before(self, spark):
        left, right = self._frames(spark)
        out = {
            r["id"]: r["asof_rid"]
            for r in asof_join(left, right, on="user_id", ts="ts").collect()
        }
        assert out["L1"] == "R2"  # 90 is the latest ≤ 100
        assert out["L2"] is None  # nothing at-or-before 10
        assert out["L3"] is None  # no u2 rows on the right

    def test_tie_matches_right(self, spark):
        left = spark.createDataFrame(
            [("L", "u", _ts(50))], "id string, user_id string, ts timestamp"
        )
        right = spark.createDataFrame(
            [("R", "u", _ts(50))], "rid string, user_id string, ts timestamp"
        ).select("user_id", "ts", "rid")
        row = asof_join(left, right, on="user_id", ts="ts").collect()[0]
        assert row["asof_rid"] == "R"

    def test_forward_direction(self, spark):
        left, right = self._frames(spark)
        out = {
            r["id"]: r["asof_rid"]
            for r in asof_join(
                left, right, on="user_id", ts="ts", direction="forward"
            ).collect()
        }
        assert out["L2"] == "R1"  # earliest ≥ 10
        assert out["L1"] == "R3"  # earliest ≥ 100


class TestRangeJoin:
    def test_pairs_within_window(self, spark):
        left = spark.createDataFrame(
            [("L1", "u", _ts(1000))], "id string, user_id string, ts timestamp"
        )
        right = spark.createDataFrame(
            [("R-in", "u", _ts(1200)), ("R-edge", "u", _ts(700)),
             ("R-out", "u", _ts(1400))],
            "rid string, user_id string, ts timestamp",
        ).select("user_id", "ts", "rid")
        rows = range_join_seconds(
            left, right, on="user_id", ts="ts", window_seconds=300
        ).collect()
        assert sorted(r["r_rid"] for r in rows) == ["R-edge", "R-in"]

    def test_no_duplicate_pairs_from_banding(self, spark):
        left = spark.createDataFrame(
            [(f"L{i}", "u", _ts(i * 100)) for i in range(10)],
            "id string, user_id string, ts timestamp",
        )
        right = spark.createDataFrame(
            [(f"R{i}", "u", _ts(i * 100 + 1)) for i in range(10)],
            "rid string, user_id string, ts timestamp",
        ).select("user_id", "ts", "rid")
        rows = range_join_seconds(
            left, right, on="user_id", ts="ts", window_seconds=250
        ).collect()
        pairs = [(r["id"], r["r_rid"]) for r in rows]
        assert len(pairs) == len(set(pairs))


class TestSaltedAggregate:
    def test_matches_direct_groupby(self, spark):
        from unstructured_spark.operators.skew import salted_aggregate
        from pyspark.sql import functions as F

        # one hot key (u0 holds ~90% of rows) + several cold keys
        rows = [("u0", float(i % 7)) for i in range(900)] + [
            (f"u{1 + i % 5}", float(i)) for i in range(100)
        ]
        df = spark.createDataFrame(rows, "user_id string, value double")
        salted = {
            r["user_id"]: (r["n"], r["total"], round(r["mean"], 9))
            for r in salted_aggregate(
                df, ["user_id"],
                {"n": ("*", "count"), "total": ("value", "sum"),
                 "mean": ("value", "avg")},
            ).collect()
        }
        direct = {
            r["user_id"]: (r["n"], r["total"], round(r["mean"], 9))
            for r in df.groupBy("user_id")
            .agg(F.count("*").alias("n"), F.sum("value").alias("total"),
                 F.avg("value").alias("mean"))
            .collect()
        }
        assert salted == direct

    def test_min_max(self, spark):
        from unstructured_spark.operators.skew import salted_aggregate

        df = spark.createDataFrame(
            [("k", float(v)) for v in (5, 1, 9, 3)], "k string, v double"
        )
        row = salted_aggregate(
            df, ["k"], {"lo": ("v", "min"), "hi": ("v", "max")}, salt_buckets=4
        ).collect()[0]
        assert (row["lo"], row["hi"]) == (1.0, 9.0)

    def test_diagnose_skew(self, spark):
        from unstructured_spark.operators.skew import diagnose_skew

        df = spark.createDataFrame(
            [("hot",)] * 80 + [("cold",)] * 20, "k string"
        )
        top = diagnose_skew(df, ["k"]).collect()
        assert top[0]["k"] == "hot"
        assert abs(top[0]["share"] - 0.8) < 1e-6


class TestConnectedComponents:
    def test_chain_and_island(self, spark):
        from unstructured_spark.operators.dedup import connected_components

        # chain a-b-c-d (one cluster) + island x-y
        pairs = spark.createDataFrame(
            [("b", "a"), ("b", "c"), ("c", "d"), ("x", "y")],
            "doc_a string, doc_b string",
        )
        labels = {
            r["doc"]: r["label"]
            for r in connected_components(pairs).collect()
        }
        assert {labels[k] for k in "abcd"} == {"a"}
        assert {labels[k] for k in "xy"} == {"x"}

    def test_long_chain_converges(self, spark):
        from unstructured_spark.operators.dedup import connected_components

        n = 40  # needs several propagation rounds
        pairs = spark.createDataFrame(
            [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(n)],
            "doc_a string, doc_b string",
        )
        labels = {
            r["doc"]: r["label"]
            for r in connected_components(pairs).collect()
        }
        assert set(labels.values()) == {"n00"}
