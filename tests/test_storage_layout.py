"""Bucketed/partitioned storage layout (operators/storage.py): the
zero-shuffle co-located join property and partition pruning, pinned by
plan inspection so layout regressions fail here instead of costing a
100 TB shuffle in production."""

import pytest
from pyspark.sql import functions as F

from unstructured_spark.operators.storage import (
    assert_no_shuffle,
    count_exchanges,
    drop_table,
    physical_plan,
    scan_pushdown_info,
    write_bucketed,
    write_partitioned,
)


@pytest.fixture(scope="module")
def bucketed_pair(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("buckets")
    docs = spark.range(0, 1000).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        (F.col("id") % 7).alias("x"),
    )
    sigs = spark.range(0, 1000).select(
        F.concat(F.lit("d"), F.col("id")).alias("doc_id"),
        (F.col("id") % 13).alias("sig"),
    )
    write_bucketed(docs, "t_docs_b", num_buckets=8, path=str(base / "docs"))
    write_bucketed(sigs, "t_sigs_b", num_buckets=8, path=str(base / "sigs"))
    yield "t_docs_b", "t_sigs_b"
    drop_table(spark, "t_docs_b")
    drop_table(spark, "t_sigs_b")


class TestBucketedJoin:
    def test_same_bucketing_joins_without_shuffle(self, spark, bucketed_pair):
        dt, st = bucketed_pair
        joined = spark.table(dt).join(spark.table(st), "doc_id")
        assert joined.count() == 1000
        assert_no_shuffle(joined, context="bucketed doc_id join")

    def test_unbucketed_join_has_shuffles(self, spark, bucketed_pair):
        """Sanity: without the layout the same join shuffles both sides."""
        dt, _ = bucketed_pair
        plain = spark.range(0, 1000).select(
            F.concat(F.lit("d"), F.col("id")).alias("doc_id"), F.lit(1).alias("y")
        )
        # defeat broadcast so the plan shows the real shuffle shape
        joined = spark.table(dt).join(plain.hint("shuffle_hash"), "doc_id")
        assert count_exchanges(joined) >= 1

    def test_bucketed_aggregation_without_shuffle(self, spark, bucketed_pair):
        dt, _ = bucketed_pair
        agg = spark.table(dt).groupBy("doc_id").agg(F.sum("x").alias("sx"))
        assert agg.count() == 1000
        assert_no_shuffle(agg, context="bucketed doc_id aggregation")


class TestPartitionPruning:
    def test_partition_filter_reaches_scan(self, spark, tmp_path):
        df = spark.range(0, 300).select(
            F.col("id"),
            (F.col("id") % 3).cast("string").alias("src"),
        )
        out = str(tmp_path / "parted")
        write_partitioned(df, out, partition_cols=("src",))
        back = spark.read.parquet(out).filter(F.col("src") == "1")
        info = scan_pushdown_info(back)
        assert info["partition_filters"], physical_plan(back)
        assert back.count() == 100

    def test_predicate_pushdown_visible(self, spark, tmp_path):
        out = str(tmp_path / "plain")
        spark.range(0, 100).withColumn("v", F.col("id") * 2).write.parquet(out)
        back = spark.read.parquet(out).filter(F.col("v") > 50)
        assert scan_pushdown_info(back)["pushed_filters"], physical_plan(back)


class TestScalingClaims:
    """CI-pinned proofs of SCALING.md plan claims: the quality gate is
    shuffle-free, parquet scans get pushdown, and the dedup drop is a
    broadcast (not shuffle) anti-join."""

    def test_gopher_quality_is_shuffle_free(self, spark, tmp_path):
        from unstructured_spark.operators.quality_filters import gopher_quality

        p = str(tmp_path / "docs")
        spark.createDataFrame(
            [("d", "some text about the engine and the plan")],
            "doc_id string, text string",
        ).write.parquet(p)
        out = gopher_quality(spark.read.parquet(p))
        assert_no_shuffle(out, context="gopher_quality over parquet scan")

    def test_quality_filter_pushes_column_pruning(self, spark, tmp_path):
        from unstructured_spark.operators.quality_filters import gopher_quality

        p = str(tmp_path / "docs3col")
        spark.createDataFrame(
            [("d", "text body", "unused extra column value")],
            "doc_id string, text string, extra string",
        ).write.parquet(p)
        plan = physical_plan(gopher_quality(spark.read.parquet(p)))
        scan = next(l for l in plan.splitlines() if "ReadSchema" in l)
        assert "extra" not in scan  # only doc_id+text reach the scan

    def test_drop_near_duplicates_uses_broadcast_anti_join(self, spark):
        from unstructured_spark.operators.dedup import drop_near_duplicates

        df = spark.createDataFrame(
            [("a", "alpha beta gamma delta epsilon zeta"),
             ("b", "totally different words entirely here now")],
            "doc_id string, text string",
        )
        plan = physical_plan(drop_near_duplicates(df))
        anti = [l for l in plan.splitlines() if "LeftAnti" in l]
        assert anti and any("Broadcast" in l for l in anti), plan
