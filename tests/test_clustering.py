"""Distributed k-means: separable recovery, determinism, empty-cluster
drop, quantization exactness."""

from pyspark.sql import functions as F

from unstructured_spark.operators.clustering import kmeans_clusters, quantize_vec


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


class TestKmeans:
    def test_recovers_separated_groups(self, spark):
        # two tight blobs far apart; k=2 seeded with one vector of each
        blob_a = [(0, [0.0, 0.1]), (2, [0.1, 0.0]), (4, [0.05, 0.05])]
        blob_b = [(1, [5.0, 5.1]), (3, [5.1, 5.0]), (5, [5.05, 5.05])]
        out = kmeans_clusters(_vecs(spark, blob_a + blob_b), k=2, iterations=2)
        got = {r["vec_id"]: r["cluster_id"] for r in out.collect()}
        assert got[0] == got[2] == got[4]
        assert got[1] == got[3] == got[5]
        assert got[0] != got[1]
        sizes = {r["cluster_id"]: r["cluster_size"] for r in out.collect()}
        assert set(sizes.values()) == {3}

    def test_deterministic_across_runs(self, spark):
        rows = [(i, [float((i * 7) % 5), float((i * 3) % 4)]) for i in range(40)]
        a = sorted(map(tuple, kmeans_clusters(_vecs(spark, rows), k=4).collect()))
        b = sorted(map(tuple, kmeans_clusters(_vecs(spark, rows), k=4).collect()))
        assert a == b

    def test_empty_cluster_drops(self, spark):
        # seeds 0 and 1 are both inside one blob; after one update the
        # far blob captures everything near it — a seed cluster can end
        # empty and must vanish from the output, not crash
        rows = [(0, [0.0, 0.0]), (1, [0.01, 0.0]), (2, [9.0, 9.0]), (3, [9.1, 9.0])]
        out = kmeans_clusters(_vecs(spark, rows), k=2, iterations=2).collect()
        assert len(out) == 4  # every vector assigned

    def test_quantize_exact_halves(self, spark):
        [r] = (
            spark.range(1)
            .select(quantize_vec(F.array(F.lit(0.5e-6), F.lit(-0.5e-6), F.lit(1.0))).alias("q"))
            .collect()
        )
        # floor(x*1e6 + 0.5): 0.5 -> 1, -0.5 -> 0, 1e6 stays
        assert list(r["q"]) == [1, 0, 1000000]


class TestQuantization:
    def test_int8_codes_bounds_and_reconstruction(self, spark):
        from unstructured_spark.operators.similarity import quantize_int8

        df = spark.createDataFrame(
            [(1, [0.5, -1.0, 0.25, 0.0]), (2, [0.0, 0.0, 0.0, 0.0])],
            "vec_id long, embedding array<double>",
        )
        rows = {r["vec_id"]: r for r in quantize_int8(df).collect()}
        codes = list(rows[1]["codes"])
        scale = rows[1]["scale"]
        assert max(abs(c) for c in codes) == 127  # amax maps to ±127
        # reconstruction error bounded by scale/2 per component
        for c, x in zip(codes, [0.5, -1.0, 0.25, 0.0]):
            assert abs(c * scale - x) <= scale / 2 + 1e-12
        assert list(rows[2]["codes"]) == [0, 0, 0, 0] and rows[2]["scale"] == 0.0

    def test_quantized_topk_ranks_like_exact(self, spark):
        from unstructured_spark.operators.similarity import (
            dequantize_cosine_topk,
            quantize_int8,
        )

        vecs = [(i, [float(i == j) + 0.01 * j for j in range(4)]) for i in range(8)]
        df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
        top = dequantize_cosine_topk(quantize_int8(df), [1.0, 0.0, 0.0, 0.0], k=3)
        rows = top.collect()
        assert rows[0]["vec_id"] == 0  # the aligned vector wins
        assert [r["rank"] for r in rows] == [1, 2, 3]

    def test_random_projection_deterministic_and_linear(self, spark):
        from unstructured_spark.operators.similarity import random_projection

        df = spark.createDataFrame(
            [(1, [1.0, 0.0, 0.0]), (2, [2.0, 0.0, 0.0]), (3, [0.0, 0.0, 0.0])],
            "vec_id long, embedding array<double>",
        )
        out = {r["vec_id"]: list(r["reduced"]) for r in
               random_projection(df, 4, in_dim=3).collect()}
        assert len(out[1]) == 4
        # linearity: doubling the input doubles every component
        for a, b in zip(out[1], out[2]):
            assert abs(b - 2 * a) < 1e-6
        assert out[3] == [0.0, 0.0, 0.0, 0.0]
        again = {r["vec_id"]: list(r["reduced"]) for r in
                 random_projection(df, 4, in_dim=3).collect()}
        assert out == again


class TestProductQuantization:
    def _vecs(self, spark, n=40, dim=8):
        rows = [
            (i, [((i * 7 + j * 3) % 11) / 10.0 for j in range(dim)])
            for i in range(n)
        ]
        return spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def test_codes_shape_and_range(self, spark):
        from unstructured_spark.operators.similarity import pq_codes

        df = self._vecs(spark)
        rows = pq_codes(df, m=2, ksub=4).collect()
        assert len(rows) == 40
        for r in rows:
            assert len(r["codes"]) == 2
            assert all(0 <= c < 4 for c in r["codes"])

    def test_seed_vector_codes_itself(self, spark):
        from unstructured_spark.operators.similarity import pq_codes

        # the lowest-id vectors ARE the codebook: each quantizes to its
        # own ordinal (distance 0) in every subspace
        df = self._vecs(spark)
        got = {r["vec_id"]: list(r["codes"]) for r in pq_codes(df, m=2, ksub=4).collect()}
        for vid in range(4):
            # ties can only go to a LOWER ordinal with equal (zero) dist
            assert all(c <= vid for c in got[vid])
            d = dict(self._vecs(spark, n=4).collect())
        assert got[0] == [0, 0]

    def test_adc_topk_finds_query_duplicate(self, spark):
        from unstructured_spark.operators.similarity import pq_topk

        df = self._vecs(spark)
        # vec 17's embedding as the query; its PQ distance to itself is
        # minimal, so with exclude_id it still surfaces near-identical
        # vectors first and ranks are contiguous
        qv = [((17 * 7 + j * 3) % 11) / 10.0 for j in range(8)]
        rows = pq_topk(df, qv, m=2, ksub=4, k=5, exclude_id=17).collect()
        assert [r["rank"] for r in rows] == [1, 2, 3, 4, 5]
        assert all(r["vec_id"] != 17 for r in rows)
        assert rows[0]["pq_dist"] <= rows[-1]["pq_dist"]


class TestIvfPq:
    def test_probed_lists_only_and_ranked(self, spark):
        from unstructured_spark.operators.similarity import ivfpq_topk

        rows = [
            (i, [((i * 7 + j * 3) % 11) / 10.0 for j in range(8)])
            for i in range(60)
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        qv = [((5 * 7 + j * 3) % 11) / 10.0 for j in range(8)]
        out = ivfpq_topk(
            df, qv, nlist=4, nprobe=2, m=2, ksub=4, k=5, exclude_id=5
        ).collect()
        assert len(out) == 5
        assert [r["rank"] for r in out] == [1, 2, 3, 4, 5]
        assert len({r["list_id"] for r in out}) <= 2  # only probed lists
        assert all(r["vec_id"] != 5 for r in out)
        assert out[0]["pq_dist"] <= out[-1]["pq_dist"]

    def test_full_probe_equals_pq(self, spark):
        # probing EVERY list must reproduce plain PQ ADC ranking
        from unstructured_spark.operators.similarity import ivfpq_topk, pq_topk

        rows = [
            (i, [((i * 5 + j * 2) % 9) / 8.0 for j in range(8)])
            for i in range(40)
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        qv = [0.3] * 8
        a = [(r["vec_id"], r["pq_dist"]) for r in
             ivfpq_topk(df, qv, nlist=2, nprobe=2, m=2, ksub=4, k=8).collect()]
        b = [(r["vec_id"], r["pq_dist"]) for r in
             pq_topk(df, qv, m=2, ksub=4, k=8).collect()]
        assert a == b


class TestSemanticDedup:
    def _corpus(self, spark):
        # two tight groups far apart + one singleton: k-means (k=2) puts
        # each group in its own cluster; e=1e-3 jitter keeps cosine
        # within a group ~1.0 and across groups ~0
        import math

        rows = []
        for i in range(3):  # group A along axis 0
            v = [1.0, i * 1e-3, 0.0, 0.0]
            rows.append((i, v))
        for i in range(3, 5):  # group B along axis 2
            v = [0.0, 0.0, 1.0, (i - 3) * 1e-3]
            rows.append((i, v))
        return spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    def test_min_id_kept_within_cluster(self, spark):
        from unstructured_spark.operators.clustering import semantic_dedup

        out = {
            r["vec_id"]: r
            for r in semantic_dedup(
                self._corpus(spark), k=2, iterations=1, threshold=0.99
            ).collect()
        }
        # lowest id of each tight group survives; the rest are dups
        assert out[0]["is_duplicate"] is False
        assert out[1]["is_duplicate"] and out[2]["is_duplicate"]
        assert out[3]["is_duplicate"] is False
        assert out[4]["is_duplicate"] is True
        # near-dups never cross clusters
        assert out[0]["cluster_id"] != out[3]["cluster_id"]

    def test_threshold_gates_flagging(self, spark):
        from unstructured_spark.operators.clustering import semantic_dedup

        # threshold above every intra-cluster cosine -> nothing flagged
        out = semantic_dedup(
            self._corpus(spark), k=2, iterations=1, threshold=1.1
        ).collect()
        assert not any(r["is_duplicate"] for r in out)

    def test_no_crossjoin_in_plan(self, spark):
        from unstructured_spark.operators.clustering import semantic_dedup

        plan = semantic_dedup(
            self._corpus(spark), k=2, iterations=1
        )._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan


class TestAnnRecall:
    def test_counts_hits_and_zero_fills_missing_queries(self, spark):
        from unstructured_spark.operators.similarity import ann_recall

        exact = spark.createDataFrame(
            [(1, 10), (1, 11), (1, 12), (2, 20), (2, 21), (2, 22)],
            "query_id long, neighbor_id long",
        )
        approx = spark.createDataFrame(
            # query 1: 2 of 3 right; query 2: absent from approx output
            [(1, 10), (1, 12), (1, 99)],
            "query_id long, neighbor_id long",
        )
        out = {
            r["query_id"]: (r["hits"], r["recall_ppm"])
            for r in ann_recall(exact, approx, k=3).collect()
        }
        assert out == {1: (2, 666666), 2: (0, 0)}

    def test_perfect_index_scores_one(self, spark):
        from unstructured_spark.operators.similarity import (
            ann_recall,
            cosine_topk,
            ivf_topk,
        )

        emb = spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet"
        ).withColumn(
            "embedding",
            __import__("pyspark.sql.functions", fromlist=["transform"]).transform(
                "embedding", lambda x: x.cast("double")
            ),
        )
        qs = emb.filter("vec_id < 3")
        exact = cosine_topk(emb, qs, k=4)
        self_recall = ann_recall(exact, exact, k=4).collect()
        assert all(r["recall_ppm"] == 1000000 for r in self_recall)


class TestClusterBalancedSample:
    def test_cap_and_rank_match_naive_window(self, spark):
        import pyspark.sql.functions as SF
        from pyspark.sql.window import Window as W

        from unstructured_spark.operators.clustering import (
            cluster_balanced_sample,
        )

        asg = spark.range(300).select(
            SF.col("id").alias("vec_id"),
            (SF.col("id") % 3).cast("bigint").alias("cluster_id"),
        )
        got = cluster_balanced_sample(asg, 7, seed="s")
        rows = got.collect()
        per = {}
        for r in rows:
            per.setdefault(r["cluster_id"], []).append(r["bal_rank"])
        assert all(sorted(v) == list(range(1, 8)) for v in per.values())
        # equals the naive single-window form
        key = SF.md5(SF.concat(SF.col("vec_id").cast("string"), SF.lit(":s")))
        w = W.partitionBy("cluster_id").orderBy(key, "vec_id")
        naive = (
            asg.withColumn("bal_rank", SF.row_number().over(w).cast("bigint"))
            .filter(SF.col("bal_rank") <= 7)
        )
        assert sorted((r["vec_id"], r["bal_rank"]) for r in rows) == sorted(
            (r["vec_id"], r["bal_rank"]) for r in naive.collect()
        )

    def test_small_cluster_kept_whole(self, spark):
        from unstructured_spark.operators.clustering import (
            cluster_balanced_sample,
        )

        asg = spark.createDataFrame(
            [(1, 0), (2, 0), (3, 1)], "vec_id long, cluster_id long"
        )
        out = cluster_balanced_sample(asg, 10).collect()
        assert sorted(r["vec_id"] for r in out) == [1, 2, 3]

    def test_composes_with_kmeans_assignments(self, spark):
        from unstructured_spark.operators.clustering import (
            cluster_balanced_sample,
            kmeans_clusters,
        )

        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        asg = kmeans_clusters(emb, k=4, iterations=1)
        out = cluster_balanced_sample(asg, 5, seed="bal")
        per = {}
        for r in out.collect():
            per.setdefault(r["cluster_id"], 0)
            per[r["cluster_id"]] += 1
        sizes = {
            r["cluster_id"]: r["cluster_size"]
            for r in asg.select("cluster_id", "cluster_size").distinct().collect()
        }
        assert per and all(
            n == min(5, sizes[cid]) for cid, n in per.items()
        )
