"""End-to-end pin for the dataset-release governance chain
(pipelines.release_corpus): attribution → token-budget selection →
curriculum order → token-balanced curriculum-monotone shards →
Z-ordered write → manifest + validation → datasheet (+ diff).

The individual operators each have their own oracle; this test pins
the COMPOSITION — that the artifacts land, the contracts between the
stages hold (budget respected per stratum, shard ids monotone in
curriculum order, manifest matches the written tree), and the release
is reproducible (same inputs → same released id set).
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from unstructured_spark.pipelines import release_corpus

GOPHER = {"min_words": 5, "min_stopwords": 0, "min_mean_word_len": 1.0}
BUDGET = 5_000
PER_SHARD = 1_000


@pytest.fixture(scope="module")
def release(spark, tmp_path_factory):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = str(tmp_path_factory.mktemp("release"))
    summary = release_corpus(
        docs,
        out,
        token_budget=BUDGET,
        tokens_per_shard=PER_SHARD,
        prev=docs,
        gopher_kwargs=GOPHER,
        c4_min_sentences=1,
    )
    return docs, out, summary


def test_artifacts_and_validation(release):
    docs, out, summary = release
    for name in ("_attribution.parquet", "_datasheet.parquet",
                 "_diff.parquet", "shards"):
        assert os.path.exists(os.path.join(out, name)), name
    assert os.path.exists(os.path.join(out, "shards", "_manifest.json"))
    assert summary["validation_ok"] is True
    assert summary["released_docs"] > 0
    assert summary["shards"] > 1


def test_attribution_covers_corpus(release, spark):
    docs, out, summary = release
    attrib = spark.read.parquet(f"{out}/_attribution.parquet")
    assert attrib.count() == docs.count()
    # released rows are exactly a subset of verdict='keep'
    assert summary["verdicts"].get("keep", 0) >= summary["released_docs"]


def test_budget_respected_per_stratum(release, spark):
    docs, out, summary = release
    released = spark.read.parquet(f"{out}/shards")
    over = (
        released.groupBy("source")
        .agg(F.max("cum_tokens").alias("spent"))
        .filter(F.col("spent") > BUDGET)
        .count()
    )
    assert over == 0


def test_shards_monotone_in_curriculum_order(release, spark):
    docs, out, summary = release
    released = spark.read.parquet(f"{out}/shards")
    rows = (
        released.select("curriculum_rank", "shard_id")
        .orderBy("curriculum_rank")
        .collect()
    )
    sids = [r["shard_id"] for r in rows]
    assert sids == sorted(sids), "shard_id must grow with training order"
    # token balance: every shard but possibly the last holds roughly
    # tokens_per_shard (overshoot bounded by one document)
    per = (
        released.groupBy("shard_id")
        .agg(F.sum("ntok").alias("t"))
        .orderBy("shard_id")
        .collect()
    )
    max_doc = released.agg(F.max("ntok")).first()[0]
    for r in per[:-1]:
        assert r["t"] <= PER_SHARD + max_doc


def test_manifest_matches_tree(release, spark):
    docs, out, summary = release
    manifest = json.load(open(f"{out}/shards/_manifest.json"))
    released = spark.read.parquet(f"{out}/shards")
    assert manifest["total_rows"] == released.count()
    assert len(manifest["shards"]) == summary["shards"]


def test_release_is_reproducible(release, spark, tmp_path):
    docs, out, summary = release
    out2 = str(tmp_path / "rel2")
    summary2 = release_corpus(
        docs,
        out2,
        token_budget=BUDGET,
        tokens_per_shard=PER_SHARD,
        gopher_kwargs=GOPHER,
        c4_min_sentences=1,
    )
    a = spark.read.parquet(f"{out}/shards").select(
        "doc_id", "curriculum_rank", "shard_id"
    )
    b = spark.read.parquet(f"{out2}/shards").select(
        "doc_id", "curriculum_rank", "shard_id"
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    assert summary2["released_docs"] == summary["released_docs"]
