"""paths-table + executor-side-open sources (the 100 TB ingest shape):
sources/files.py read_paths/read_documents_paths/paths_table and
sources/warc.py read_warc_paths.

The point of these tests: file bytes must reach the output WITHOUT
riding a DataFrame row (no binaryFile, no 2 GB cap), and the WARC
streaming path must recover the identical records the in-memory
parser does — plain AND per-record-gzip archives.
"""

from __future__ import annotations

import gzip
import os

import pytest

from unstructured_spark.sources.files import (
    open_path,
    paths_table,
    read_documents_paths,
    read_paths,
)
from unstructured_spark.sources.warc import (
    build_warc_bytes,
    iter_warc_records,
    iter_warc_records_stream,
    read_warc_paths,
)


def _conv(uri: str, body: str) -> dict:
    return {
        "warc_type": "conversion",
        "target_uri": uri,
        "payload": body.encode("utf-8"),
    }


RECS = [
    _conv("http://x/1", "alpha beta gamma"),
    _conv("http://x/2", "a body with\r\n\r\nblank lines and unicode é中"),
    _conv("http://x/3", ""),
    _conv("http://x/4", "z" * 70000),  # spans several 64k read chunks
]


@pytest.fixture()
def warc_files(tmp_path):
    """One plain and one per-record-gzip archive on local disk."""
    plain = tmp_path / "shard-0.warc"
    plain.write_bytes(build_warc_bytes(RECS[:2]))
    gz = tmp_path / "shard-1.warc.gz"
    gz.write_bytes(build_warc_bytes(RECS[2:], gzip_per_record=True))
    return [str(plain), str(gz)]


class TestStreamReader:
    def test_stream_matches_blob_plain(self, warc_files):
        blob = open(warc_files[0], "rb").read()
        with open(warc_files[0], "rb") as fh:
            got = list(iter_warc_records_stream(fh, chunk_bytes=64))
        assert got == list(iter_warc_records(blob))

    def test_stream_matches_blob_gzip(self, warc_files):
        blob = open(warc_files[1], "rb").read()
        with open(warc_files[1], "rb") as fh:
            got = list(iter_warc_records_stream(fh, chunk_bytes=64))
        assert got == list(iter_warc_records(blob))
        assert [r["payload"] for r in got] == [r["payload"] for r in RECS[2:]]

    def test_empty_file(self, tmp_path):
        p = tmp_path / "empty.warc"
        p.write_bytes(b"")
        with open(p, "rb") as fh:
            assert list(iter_warc_records_stream(fh)) == []

    def test_whole_stream_gzip_not_per_member(self, tmp_path):
        # a single gzip stream over the whole archive (not Common
        # Crawl's member-per-record layout) must still decode
        p = tmp_path / "whole.warc.gz"
        p.write_bytes(gzip.compress(build_warc_bytes(RECS)))
        with open(p, "rb") as fh:
            got = list(iter_warc_records_stream(fh, chunk_bytes=256))
        assert [r["payload"] for r in got] == [r["payload"] for r in RECS]

    def test_corrupt_length_resync(self, warc_files, tmp_path):
        # an overstated Content-Length must not swallow the following
        # valid records on the streaming path either
        bad = (
            b"WARC/1.0\r\nWARC-Type: conversion\r\n"
            b"WARC-Target-URI: http://bad/\r\n"
            b"Content-Length: 999999999999\r\n\r\nshort\r\n\r\n"
        )
        p = tmp_path / "mixed.warc"
        p.write_bytes(bad + build_warc_bytes(RECS[:2]))
        with open(p, "rb") as fh:
            got = list(
                iter_warc_records_stream(
                    fh, chunk_bytes=64, max_record_bytes=1 << 20
                )
            )
        uris = [r["headers"].get("warc-target-uri") for r in got]
        assert "http://x/1" in uris and "http://x/2" in uris


class TestOpenPath:
    def test_file_uri(self, tmp_path):
        p = tmp_path / "f.bin"
        p.write_bytes(b"abc")
        with open_path("file://" + str(p)) as fh:
            assert fh.read() == b"abc"


class TestReadPaths:
    def test_generic_expand(self, spark, tmp_path):
        for i in range(3):
            (tmp_path / f"f{i}.txt").write_bytes(b"x" * (i + 1))
        paths = spark.createDataFrame(
            [(str(tmp_path / f"f{i}.txt"),) for i in range(3)], "path string"
        )

        def expand(path):
            with open(path, "rb") as fh:
                yield {"path": path, "n": len(fh.read())}

        out = read_paths(paths, expand, "path string, n bigint", tasks=2)
        rows = {os.path.basename(r["path"]): r["n"] for r in out.collect()}
        assert rows == {"f0.txt": 1, "f1.txt": 2, "f2.txt": 3}

    def test_map_only_plan(self, spark, tmp_path):
        paths = spark.createDataFrame([("x",)], "path string")
        out = read_paths(paths, lambda p: iter(()), "path string")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan

    def test_tasks_repartitions(self, spark):
        paths = spark.createDataFrame([(f"p{i}",) for i in range(8)],
                                      "path string").coalesce(1)
        out = read_paths(paths, lambda p: iter(()), "path string", tasks=4)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plan  # the explicit rebalance, by request


class TestReadDocumentsPaths:
    def test_content_and_truncation(self, spark, tmp_path):
        (tmp_path / "a.bin").write_bytes(b"0123456789")
        (tmp_path / "b.bin").write_bytes(b"xy")
        paths = spark.createDataFrame(
            [(str(tmp_path / "a.bin"),), (str(tmp_path / "b.bin"),)],
            "path string",
        )
        out = {
            os.path.basename(r["path"]): r
            for r in read_documents_paths(
                paths, max_bytes=4, chunk_bytes=3
            ).collect()
        }
        assert bytes(out["a.bin"]["content"]) == b"0123"
        assert out["a.bin"]["truncated"] is True
        assert out["a.bin"]["size"] >= 4
        assert bytes(out["b.bin"]["content"]) == b"xy"
        assert out["b.bin"]["truncated"] is False
        assert out["b.bin"]["size"] == 2

    def test_paths_table_listing(self, spark, tmp_path):
        (tmp_path / "a.warc").write_bytes(b"AA")
        (tmp_path / "b.txt").write_bytes(b"B")
        pt = paths_table(spark, str(tmp_path), glob="*.warc")
        rows = pt.collect()
        assert len(rows) == 1
        assert rows[0]["path"].endswith("a.warc")
        assert rows[0]["size"] == 2


class TestReadWarcPaths:
    def test_matches_blob_ingest(self, spark, warc_files):
        paths = spark.createDataFrame([(p,) for p in warc_files],
                                      "path string")
        out = read_warc_paths(paths, tasks=2).collect()
        by_uri = {r["target_uri"]: r for r in out}
        assert set(by_uri) == {r["target_uri"] for r in RECS}
        assert by_uri["http://x/1"]["text"] == "alpha beta gamma"
        assert by_uri["http://x/4"]["n_bytes"] == 70000
        # gzip archive rows carry the gz path
        assert by_uri["http://x/3"]["path"].endswith(".warc.gz")

    def test_record_type_filter(self, spark, tmp_path):
        recs = [
            _conv("http://t/1", "keep"),
            {"warc_type": "request", "target_uri": "http://t/1",
             "payload": b"GET / HTTP/1.1"},
        ]
        p = tmp_path / "s.warc"
        p.write_bytes(build_warc_bytes(recs))
        paths = spark.createDataFrame([(str(p),)], "path string")
        out = read_warc_paths(paths).collect()
        assert [r["warc_type"] for r in out] == ["conversion"]

    def test_custom_opener(self, spark, warc_files):
        # fsspec-style pluggable opener: route through a wrapper that
        # records it was used (via a path rewrite)
        paths = spark.createDataFrame(
            [("rewrite://" + p,) for p in warc_files], "path string"
        )

        def opener(path):
            assert path.startswith("rewrite://")
            return open(path[len("rewrite://"):], "rb")

        out = read_warc_paths(paths, opener=opener).collect()
        assert len(out) == len(RECS)
