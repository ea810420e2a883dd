"""Streaming crawl ingest: manifest-watched WARC shard stream +
main-content extraction twin (streaming/pipeline.py
warc_record_stream / main_content_stream)."""

from __future__ import annotations

from unstructured_spark.sources.warc import build_warc_bytes

LONG = (
    "This article body paragraph is comfortably longer than the forty"
    " character threshold used by the classifier."
)

PAGE = (
    '<html><body><nav><a href="/">Home</a></nav>'
    f"<main><p>{LONG}</p></main>"
    '<footer><p>Copyright</p></footer></body></html>'
)


def _shard(tmp_path, name, recs, gz=False):
    p = tmp_path / name
    p.write_bytes(build_warc_bytes(recs, gzip_per_record=gz))
    return str(p)


class TestWarcRecordStream:
    def test_manifest_drain_and_incremental(self, spark, tmp_path):
        from unstructured_spark.streaming.pipeline import warc_record_stream

        shard1 = _shard(tmp_path, "s1.warc", [
            {"warc_type": "conversion", "target_uri": "http://a/1",
             "payload": b"first shard text"},
        ])
        shard2 = _shard(tmp_path, "s2.warc.gz", [
            {"warc_type": "conversion", "target_uri": "http://a/2",
             "payload": b"gzip shard text"},
            {"warc_type": "request", "target_uri": "http://a/2",
             "payload": b"GET /"},
        ], gz=True)
        man = tmp_path / "manifests"
        man.mkdir()
        (man / "m0.paths").write_text(f"{shard1}\n{shard2}\n")

        out_dir, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
        stream = warc_record_stream(spark, str(man))
        assert stream.isStreaming
        q = (
            stream.writeStream.format("parquet")
            .option("path", out_dir).option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        rows = spark.read.parquet(out_dir).collect()
        # request record filtered by default record_types
        assert {r["target_uri"] for r in rows} == {"http://a/1", "http://a/2"}
        assert all(r["warc_type"] == "conversion" for r in rows)

        # a NEW manifest arrives; checkpoint ingests only its shards
        shard3 = _shard(tmp_path, "s3.warc", [
            {"warc_type": "conversion", "target_uri": "http://a/3",
             "payload": b"late shard"},
        ])
        (man / "m1.paths").write_text(f"{shard3}\n")
        q2 = (
            warc_record_stream(spark, str(man))
            .writeStream.format("parquet")
            .option("path", out_dir).option("checkpointLocation", ckpt)
            .trigger(availableNow=True).start()
        )
        q2.awaitTermination(120)
        rows2 = spark.read.parquet(out_dir).collect()
        assert {r["target_uri"] for r in rows2} == {
            "http://a/1", "http://a/2", "http://a/3"
        }
        # exactly-once at manifest granularity: no duplicates
        assert len(rows2) == 3


class TestMainContentStream:
    def test_crawl_to_corpus(self, spark, tmp_path):
        from unstructured_spark.streaming.pipeline import (
            main_content_stream,
            warc_record_stream,
        )

        shard = _shard(tmp_path, "web.warc", [
            {"warc_type": "conversion", "target_uri": "http://s/html",
             "content_type": "text/html", "payload": PAGE.encode()},
            {"warc_type": "conversion", "target_uri": "http://s/txt",
             "content_type": "text/plain", "payload": b"plain, dropped"},
        ])
        man = tmp_path / "m"
        man.mkdir()
        (man / "a.paths").write_text(shard + "\n")
        out = main_content_stream(warc_record_stream(spark, str(man)))
        assert out.isStreaming
        q = (
            out.writeStream.format("parquet")
            .option("path", str(tmp_path / "corpus"))
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        rows = spark.read.parquet(str(tmp_path / "corpus")).collect()
        assert len(rows) == 1  # only the HTML record
        assert rows[0]["main_text"] == LONG  # chrome stripped
        assert rows[0]["n_good"] == 1
