#!/usr/bin/env python
"""Benchmark harness: runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}

Protocol mirrors the reference's harness shape (BASELINE.md: warm-up
call, then timed runs): one tiny warm-up query to absorb JVM/codegen
startup, then each query timed end-to-end (plan + execute + collect).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import SparkSession  # noqa: E402

import __spark_entry__ as entry_mod  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    spark = (
        SparkSession.builder.appName("unstructured-spark-bench")
        .master(f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up: JVM, parquet footer reads, codegen paths
    for t in ("lineitem", "documents", "embeddings"):
        entry_mod._t(spark, sf_dir, t).limit(1).collect()
    # process-level JIT warm-up: run three representative query shapes
    # (multi-join agg, window chain, text/array codegen) untimed so the
    # first timed queries don't absorb one-off JIT compilation of the
    # shuffle/join/window machinery. Per-query warm-up below still
    # covers plan-specific codegen + broadcast builds.
    all_q = entry_mod.queries()
    for wname in ("q05_region_revenue", "q_events_moving_avg", "q_gopher_quality"):
        if wname in all_q:
            all_q[wname](spark, sf_dir).count()

    # reference protocol (BASELINE.md): 1 warm-up call, then avg of N
    iters = int(os.environ.get("BENCH_ITERS", "2"))
    timings: dict[str, float] = {}
    total = 0.0
    for name, fn in all_q.items():
        def run() -> int:
            df = fn(spark, sf_dir)
            return df.count() if name not in _COLLECT_FULL else len(df.collect())

        n = run()  # warm-up: codegen compile, broadcast build
        t0 = time.perf_counter()
        for _ in range(iters):
            run()
        dt = (time.perf_counter() - t0) / iters
        timings[name] = round(dt, 3)
        total += dt
        print(f"# {name}: {dt:.3f}s ({n} rows)", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_wall_clock",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "cpus": int(cpus),
            }
        )
    )
    spark.stop()


# queries whose realistic consumption is a full driver-side collect
_COLLECT_FULL = {"q03_shipping_priority", "q_top_customers"}


if __name__ == "__main__":
    main()
