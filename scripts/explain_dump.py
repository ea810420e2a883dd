#!/usr/bin/env python
"""Dump .explain("formatted") for named registered queries to text
files — the optimization-round evidence trail (plans/rNN/<q>_before.txt
/ _after.txt).

Usage:
    python scripts/explain_dump.py --out plans/r12 --suffix before q_a q_b
    python scripts/explain_dump.py --out plans/r12 --suffix after --all

Plans are data-size-independent; the default sf dir is sf0.001 so
eager-checkpoint queries (kmeans family) materialize trivially.
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="plans/r12")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--all", action="store_true")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    import __spark_entry__ as entry_mod

    spark = (
        SparkSession.builder.appName("explain-dump")
        .master("local[4]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    registry = entry_mod.queries()
    names = list(registry) if args.all else args.queries
    outdir = os.path.join(REPO, args.out)
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        if name not in registry:
            print(f"SKIP unknown query {name}", file=sys.stderr)
            continue
        df = registry[name](spark, args.sf_dir)
        text = df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(outdir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
