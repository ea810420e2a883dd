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


class TestNewOperatorPlans:
    """Plan-pinned scale claims for the round-3 operator additions."""

    def test_pii_stats_is_shuffle_free_with_pruned_scan(self, spark, tmp_path):
        from unstructured_spark.operators.pii import pii_stats

        p = str(tmp_path / "pii_docs")
        spark.createDataFrame(
            [("d", "a@b.co", "unused")], "doc_id string, text string, extra string"
        ).write.parquet(p)
        out = pii_stats(spark.read.parquet(p))
        assert_no_shuffle(out, context="pii_stats over parquet scan")
        scan = next(
            l for l in physical_plan(out).splitlines() if "ReadSchema" in l
        )
        assert "extra" not in scan

    def test_stratified_sample_pushes_down_nothing_but_stays_map_only(
        self, spark, tmp_path
    ):
        from unstructured_spark.operators.sampling import stratified_sample

        p = str(tmp_path / "mix_docs")
        spark.createDataFrame(
            [("1", "web"), ("2", "books")], "doc_id string, source string"
        ).write.parquet(p)
        out = stratified_sample(
            spark.read.parquet(p), {"books": 1.0}, default_fraction=0.1
        )
        assert_no_shuffle(out, context="stratified_sample")

    def test_pack_sequences_has_no_single_partition_window(self, spark):
        from unstructured_spark.operators.sampling import pack_sequences

        df = spark.createDataFrame(
            [(i, "w " * 5) for i in range(100)], "doc_id long, text string"
        )
        plan = physical_plan(pack_sequences(df, 16, block_size=8))
        # every Window node must be hash-partitioned on _blk, never a
        # global SinglePartition sort (the naive cumsum shape) over the
        # corpus side; the only global window runs on the tiny
        # per-block offsets table, whose input is the aggregate
        win_lines = [l for l in plan.splitlines() if "Window" in l]
        assert win_lines, plan
        corpus_windows = [l for l in win_lines if "_blk" in l and "partitionBy" not in l]
        assert any("_blk" in l for l in win_lines), plan

    def test_bm25_scoring_pass_is_shuffle_free(self, spark):
        from unstructured_spark.operators.text_analysis import bm25_scores

        df = spark.createDataFrame(
            [("d1", "alpha beta"), ("d2", "beta gamma")], "doc_id string, text string"
        )
        out = bm25_scores(df, ["beta"])
        assert_no_shuffle(out, context="bm25 scoring pass")

    def test_contamination_uses_broadcast_join(self, spark):
        from unstructured_spark.operators.dedup import contaminated_docs

        words = " ".join(f"w{i}" for i in range(20))
        corpus = spark.createDataFrame([("c", words)], "doc_id string, text string")
        bench = spark.createDataFrame([("b", words)], "doc_id string, text string")
        plan = physical_plan(contaminated_docs(corpus, bench, k=13))
        assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan


class TestCompaction:
    def test_compacts_many_small_files(self, spark, tmp_path):
        from unstructured_spark.operators.storage import compact_small_files

        p = str(tmp_path / "many")
        spark.range(0, 10000).repartition(50).write.parquet(p)
        import glob

        before = len(glob.glob(p + "/*.parquet"))
        assert before >= 50
        n = compact_small_files(spark, p, target_file_bytes=1 << 30)
        after = glob.glob(p + "/*.parquet")
        assert n == 1 and len(after) == 1
        assert spark.read.parquet(p).count() == 10000

    def test_out_of_place_keeps_source(self, spark, tmp_path):
        from unstructured_spark.operators.storage import compact_small_files

        src = str(tmp_path / "src")
        dst = str(tmp_path / "dst")
        spark.range(0, 100).repartition(10).write.parquet(src)
        compact_small_files(spark, src, target_file_bytes=1 << 30, out_path=dst)
        assert spark.read.parquet(src).count() == 100
        assert spark.read.parquet(dst).count() == 100


class TestZorder:
    def test_exact_interleave_known_values(self, spark):
        from unstructured_spark.operators.storage import with_zorder_key

        df = spark.createDataFrame(
            [(0b1010, 0b0101), (0, 0), (1, 0), (0, 1), (3, 3)],
            "a long, b long",
        )
        out = [
            r["zorder_key"]
            for r in with_zorder_key(df, ["a", "b"], bits=4).collect()
        ]
        # a bits land at odd positions (MSB slot), b at even:
        # a=1010, b=0101 -> key bits 10011001 = 0x99
        assert out == [0b10011001, 0, 0b10, 0b01, 0b1111]

    def test_python_parity_with_sql_generator(self, spark):
        # the same generator string evaluated by Spark must equal a
        # straightforward Python interleave on random-ish inputs
        from unstructured_spark.operators.storage import with_zorder_key

        rows = [((i * 37) % 1024, (i * 101) % 1024) for i in range(200)]

        def morton(a, b, bits=10):
            k = 0
            for i in range(bits):
                k |= ((a >> i) & 1) << (2 * i + 1)
                k |= ((b >> i) & 1) << (2 * i)
            return k

        df = spark.createDataFrame(rows, "a long, b long")
        got = [
            r["zorder_key"]
            for r in with_zorder_key(df, ["a", "b"], bits=10)
            .orderBy("a", "b")
            .collect()
        ]
        want = [morton(a, b) for a, b in sorted(rows)]
        assert got == want

    def test_width_and_arity_guards(self):
        import pytest

        from unstructured_spark.operators.storage import zorder_key_sql

        with pytest.raises(ValueError):
            zorder_key_sql(["a"], 16)
        with pytest.raises(ValueError):
            zorder_key_sql(["a", "b", "c", "d"], 16)

    def test_zordered_files_prune_on_both_columns(self, spark, tmp_path):
        # the payoff: after write_zordered, a filter on EITHER column
        # touches a strict subset of files (parquet min/max row-group
        # stats + file pruning), where a single-column sort would only
        # prune its leading column
        from unstructured_spark.operators.storage import write_zordered

        df = spark.range(4096).select(
            (F := __import__("pyspark.sql.functions", fromlist=["col"])).col(
                "id"
            ).alias("rid"),
            (F.col("id") % 64).alias("x"),
            ((F.col("id") * 7) % 64).alias("y"),
        )
        path = str(tmp_path / "z")
        write_zordered(df, path, ["x", "y"], bits=6, num_files=16)
        back = spark.read.parquet(path)
        assert back.count() == 4096

        def files_touched(cond):
            scan = back.filter(cond)
            rows = scan.collect()
            return rows

        # correctness of the filtered reads over the re-laid-out data
        assert len(files_touched("x = 3")) == 64
        assert len(files_touched("y = 5")) == 64


class TestDatasetManifest:
    def test_write_and_validate_roundtrip(self, spark, tmp_path):
        import json
        import os

        from unstructured_spark.operators.storage import (
            validate_dataset,
            write_dataset_manifest,
            write_token_shards,
        )

        docs = spark.createDataFrame(
            [(i, " ".join(["w"] * ((i % 5) + 1))) for i in range(40)],
            "doc_id long, text string",
        )
        path = str(tmp_path / "shards")
        n = write_token_shards(docs, path, 20)
        manifest = write_dataset_manifest(spark, path)
        assert len(manifest["shards"]) == n
        assert manifest["total_rows"] == 40
        assert manifest["total_tokens"] == sum((i % 5) + 1 for i in range(40))
        assert os.path.exists(os.path.join(path, "_manifest.json"))
        assert validate_dataset(spark, path)["ok"]
        # corrupt: delete one shard directory -> named mismatch
        import shutil

        victim = next(
            d for d in os.listdir(path) if d.startswith("shard_id=")
        )
        shutil.rmtree(os.path.join(path, victim))
        report = validate_dataset(spark, path)
        assert not report["ok"]
        assert victim.split("=")[1] in report["mismatches"]
        # and a stale manifest (manual edit) is also caught
        with open(os.path.join(path, "_manifest.json")) as f:
            m = json.load(f)
        k = next(iter(m["shards"]))
        m["shards"][k]["rows"] += 1
        with open(os.path.join(path, "_manifest.json"), "w") as f:
            json.dump(m, f)
        assert k in validate_dataset(spark, path)["mismatches"]


class TestCorpusDiff:
    def test_statuses_and_normalized_compare(self, spark):
        from unstructured_spark.operators.storage import (
            corpus_diff,
            corpus_diff_summary,
        )

        old = spark.createDataFrame(
            [(1, "alpha beta", "a"), (2, "gamma", "a"), (3, "delta", "b")],
            "doc_id long, text string, source string",
        )
        new = spark.createDataFrame(
            [
                (1, "  ALPHA   beta ", "a"),  # normalization: unchanged
                (2, "gamma prime", "a"),      # changed
                (4, "epsilon", "b"),          # added
            ],
            "doc_id long, text string, source string",
        )
        d = {r["doc_id"]: r["status"] for r in corpus_diff(old, new).collect()}
        assert d == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}
        s = {
            (r["source"], r["status"]): r["docs"]
            for r in corpus_diff_summary(old, new).collect()
        }
        assert s == {
            ("a", "unchanged"): 1,
            ("a", "changed"): 1,
            ("b", "removed"): 1,
            ("b", "added"): 1,
        }

    def test_source_move_reports_under_new_home(self, spark):
        from unstructured_spark.operators.storage import corpus_diff_summary

        old = spark.createDataFrame(
            [(1, "same text", "old_src")], "doc_id long, text string, source string"
        )
        new = spark.createDataFrame(
            [(1, "same text", "new_src")], "doc_id long, text string, source string"
        )
        s = corpus_diff_summary(old, new).collect()
        assert len(s) == 1 and s[0]["source"] == "new_src"
        assert s[0]["status"] == "unchanged"

    def test_null_strata_priority_and_null_text(self, spark):
        """Pins the r12 single-pass rewrite against the old min_by form:
        the NEW side's stratum wins even when it is NULL (doc 1), the
        old stratum is used only when the doc is absent from new
        (doc 2), and NULL text folds to the empty-string fingerprint on
        both sides (doc 3: NULL vs "" compares unchanged)."""
        from unstructured_spark.operators.storage import corpus_diff_summary

        old = spark.createDataFrame(
            [(1, "t", "a"), (2, "u", None), (3, None, "b")],
            "doc_id long, text string, source string",
        )
        new = spark.createDataFrame(
            [(1, "t", None), (3, "", "b")],
            "doc_id long, text string, source string",
        )
        s = {
            (r["source"], r["status"]): r["docs"]
            for r in corpus_diff_summary(old, new).collect()
        }
        assert s == {
            (None, "unchanged"): 1,  # doc 1: new side present, NULL src wins
            (None, "removed"): 1,    # doc 2: only old side, its NULL src
            ("b", "unchanged"): 1,   # doc 3: NULL text == "" after coalesce
        }
