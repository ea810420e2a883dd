#!/usr/bin/env python
"""Per-query job/stage/task census — the r13 measurement for the
"stages, not data, dominate at bench scale" hypothesis (r12 verdict
item 8). For each named registered query: run the noop sink once
(warm), then again with the status tracker sampled before/after, and
report jobs, stages, tasks, and wall seconds. Deep chains whose wall
is explained by stage COUNT (not bytes) are the AQE-cascade targets.

Usage:
    python scripts/stage_census.py q_perplexity_buckets q_nb_confusion
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cpus", default=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ap.add_argument("--repeat", type=int, default=1,
                    help="timed repetitions after the warm-up")
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod

    spark = (
        SparkSession.builder.appName("stage-census")
        .master(f"local[{args.cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    qs = entry_mod.queries()
    rows = []
    for name in args.queries:
        if name not in qs:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        fn = qs[name]
        # warm-up (JIT, file listing, shuffle machinery)
        fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
        jobs0 = set(tracker.getJobIdsForGroup(None) or [])
        # stage ids only via job info; count stages per job below
        sc.setJobDescription(f"census:{name}")
        walls = []
        for _ in range(max(1, args.repeat)):
            t0 = time.monotonic()
            fn(spark, args.sf_dir).write.format("noop").mode("overwrite").save()
            walls.append(time.monotonic() - t0)
        sc.setJobDescription(None)
        jobs1 = set(tracker.getJobIdsForGroup(None) or [])
        new_jobs = sorted(jobs1 - jobs0)
        n_stages = 0
        n_tasks = 0
        for j in new_jobs:
            ji = tracker.getJobInfo(j)
            if ji is None:
                continue
            for st in ji.stageIds:
                si = tracker.getStageInfo(st)
                n_stages += 1
                if si is not None:
                    n_tasks += si.numTasks
        wall = min(walls)
        row = {
            "query": name,
            "wall_s": round(wall, 3),
            "jobs": len(new_jobs) // max(1, args.repeat),
            "stages": n_stages // max(1, args.repeat),
            "tasks": n_tasks // max(1, args.repeat),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
