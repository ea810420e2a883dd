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
