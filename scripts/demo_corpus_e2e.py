#!/usr/bin/env python
"""Run the single-job end-to-end pre-training corpus pipeline
(pipelines.pretraining_corpus_e2e) against $SPARK_GRAFT_SF_DIR
(default sf0.1) and print one JSON line with stage counts, total
wall-clock, and the realized exchange/sort counts from the final
physical plan — the numbers SCALING.md records.

    python scripts/demo_corpus_e2e.py
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.appName("corpus-e2e-demo")
        .master(f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from unstructured_spark.pipelines import pretraining_corpus_e2e

    # the corpus tables store text; the pipeline's front door is the
    # binary-document contract (doc_id, content, path) — same rows a
    # 100 TB run would read via binaryFile/paths_table
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(
            F.col("doc_id"),
            F.encode("text", "utf-8").alias("content"),
            F.concat(F.lit("doc_"), F.col("doc_id"), F.lit(".txt")).alias("path"),
        )
    )
    n_docs = docs.count()

    t0 = time.perf_counter()
    packed, splits = pretraining_corpus_e2e(docs)
    n_packed = packed.count()
    wall = time.perf_counter() - t0

    split_counts = {
        r["split"]: r["n"]
        for r in splits.groupBy("split").agg(F.count("*").alias("n")).collect()
    }
    plan = packed._jdf.queryExecution().executedPlan().toString()
    exchanges = len(re.findall(r"\bExchange\b", plan))
    reused = len(re.findall(r"\bReusedExchange\b", plan))
    sorts = len(re.findall(r"\bSort\b", plan))
    print(
        json.dumps(
            {
                "metric": "corpus_e2e_wall_clock",
                "value": round(wall, 2),
                "unit": "sec",
                "sf": sf_dir.rstrip("/").rsplit("sf", 1)[-1],
                "cpus": int(cpus),
                "documents": n_docs,
                "packed_placements": n_packed,
                "splits": split_counts,
                "plan": {
                    "exchanges": exchanges,
                    "reused_exchanges": reused,
                    "sorts": sorts,
                },
            },
            separators=(",", ":"),
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
