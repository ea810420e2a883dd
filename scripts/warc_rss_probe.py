#!/usr/bin/env python
"""Peak-RSS probe for the WARC source's constant-memory claim
(sources/warc.py: resident set = one read chunk + the record being
assembled + one gzip window — never the archive).

Builds a ~1 GiB-scale synthetic shard (records far larger than the
Arrow batch size, sizes varied 256 KiB–2 MiB) in BOTH layouts —
plain and per-record-gzip-member (.warc.gz, the Common Crawl shape) —
with bounded-memory record-at-a-time writes, then parses each in a
FRESH subprocess (ru_maxrss is a process-lifetime high-water mark, so
the build must not share a process with the measurement) two ways:

  stream  iter_warc_records_stream over an open file handle
          (the read_warc_paths / paths-table executor path)
  blob    whole-file read + iter_warc_records
          (the binaryFile path parse_warc uses — expected to hold the
          archive bytes, i.e. RSS ~ archive size)

Writes WARC_RSS_PROBE.json at the repo root:
one entry per (layout, mode) with wall seconds, peak RSS MiB, records
recovered and payload bytes checksummed (correctness guard: both
modes must agree).

Usage: python scripts/warc_rss_probe.py [--gib 1.0]
"""

from __future__ import annotations

import argparse
import gzip
import json
import os
import resource
import subprocess
import sys
import time
import zlib

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WORK = "/tmp/warc_rss_probe"

# varied record payload sizes, repeating pattern (bytes)
SIZES = [256 << 10, 1 << 20, 512 << 10, 2 << 20, 768 << 10]


def build(path: str, total_bytes: int, gz: bool) -> int:
    """Record-at-a-time bounded-memory shard build; returns n_records."""
    n = 0
    written = 0
    with open(path, "wb") as out:
        while written < total_bytes:
            size = SIZES[n % len(SIZES)]
            # compressible but non-trivial payload
            word = f"tok{n % 97} "
            payload = (word * (size // len(word) + 1))[:size].encode()
            head = (
                f"WARC/1.0\r\nWARC-Type: conversion\r\n"
                f"WARC-Target-URI: http://probe/rec/{n}\r\n"
                f"WARC-Date: 2024-01-01T00:00:00Z\r\n"
                f"Content-Type: text/plain\r\n"
                f"Content-Length: {len(payload)}\r\n\r\n"
            ).encode()
            rec = head + payload + b"\r\n\r\n"
            out.write(gzip.compress(rec, 6, mtime=0) if gz else rec)
            written += len(rec)  # count DECOMPRESSED bytes for parity
            n += 1
    return n


def parse_child(path: str, mode: str) -> None:
    """Runs in a fresh subprocess; prints one JSON line."""
    from unstructured_spark.sources.warc import (
        iter_warc_records,
        iter_warc_records_stream,
    )

    t0 = time.perf_counter()
    n = 0
    payload_bytes = 0
    crc = 0
    if mode == "stream":
        with open(path, "rb") as fh:
            for rec in iter_warc_records_stream(fh):
                n += 1
                payload_bytes += len(rec["payload"])
                crc = zlib.crc32(rec["payload"], crc)
    else:
        data = open(path, "rb").read()
        for rec in iter_warc_records(data):
            n += 1
            payload_bytes += len(rec["payload"])
            crc = zlib.crc32(rec["payload"], crc)
    wall = time.perf_counter() - t0
    rss_kib = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    print(json.dumps({
        "mode": mode,
        "records": n,
        "payload_bytes": payload_bytes,
        "payload_crc": crc,
        "wall_sec": round(wall, 2),
        "peak_rss_mib": round(rss_kib / 1024, 1),
    }))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--gib", type=float, default=1.0)
    ap.add_argument("--parse", nargs=2, metavar=("PATH", "MODE"))
    args = ap.parse_args()
    if args.parse:
        parse_child(*args.parse)
        return

    os.makedirs(WORK, exist_ok=True)
    total = int(args.gib * (1 << 30))
    shards = {}
    for layout, gz in (("plain", False), ("gzip", True)):
        ext = ".warc.gz" if gz else ".warc"
        path = os.path.join(WORK, f"shard{ext}")
        t0 = time.perf_counter()
        n = build(path, total, gz)
        shards[layout] = path
        print(f"# built {layout}: {n} records, "
              f"{os.path.getsize(path) >> 20} MiB on disk "
              f"({total >> 20} MiB decompressed), "
              f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)

    results = {}
    for layout, path in shards.items():
        for mode in ("stream", "blob"):
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--parse", path, mode],
                capture_output=True, text=True, check=True,
            )
            rec = json.loads(out.stdout.strip().splitlines()[-1])
            results[f"{layout}_{mode}"] = rec
            print(f"# {layout}/{mode}: rss {rec['peak_rss_mib']} MiB, "
                  f"{rec['wall_sec']}s, {rec['records']} records",
                  file=sys.stderr)
        a, b = results[f"{layout}_stream"], results[f"{layout}_blob"]
        assert (a["records"], a["payload_bytes"], a["payload_crc"]) == (
            b["records"], b["payload_bytes"], b["payload_crc"]
        ), f"stream/blob disagree on {layout}"

    record = {
        "decompressed_bytes": total,
        "sizes_pattern_kib": [s >> 10 for s in SIZES],
        "results": results,
    }
    with open(os.path.join(REPO, "WARC_RSS_PROBE.json"), "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
