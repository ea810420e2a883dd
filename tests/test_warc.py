"""WARC/WET source: stdlib framing parser + distributed ingest."""

from __future__ import annotations

import gzip

from unstructured_spark.sources.warc import (
    _split_http,
    build_warc_bytes,
    iter_warc_records,
    parse_warc,
    read_warc,
)


def _conv(uri: str, body: str) -> dict:
    return {
        "warc_type": "conversion",
        "target_uri": uri,
        "payload": body.encode("utf-8"),
    }


class TestFraming:
    def test_round_trip_plain(self):
        recs = [
            _conv("http://a/1", "hello world"),
            _conv("http://a/2", "body with\r\n\r\nblank lines inside"),
            _conv("http://a/3", ""),
        ]
        out = list(iter_warc_records(build_warc_bytes(recs)))
        assert len(out) == 3
        assert [r["headers"]["warc-target-uri"] for r in out] == [
            "http://a/1", "http://a/2", "http://a/3",
        ]
        # length framing survives embedded blank lines
        assert out[1]["payload"] == recs[1]["payload"]
        assert out[2]["payload"] == b""

    def test_round_trip_gzip_members(self):
        recs = [_conv(f"http://g/{i}", f"doc {i} text") for i in range(5)]
        data = build_warc_bytes(recs, gzip_per_record=True)
        # sanity: it really is multi-member gzip, not one stream
        assert data.count(b"\x1f\x8b\x08") >= 5
        out = list(iter_warc_records(data))
        assert [r["payload"].decode() for r in out] == [
            f"doc {i} text" for i in range(5)
        ]

    def test_whole_file_gzip(self):
        recs = [_conv("http://w/1", "single member archive")]
        data = gzip.compress(build_warc_bytes(recs))
        [r] = iter_warc_records(data)
        assert r["payload"] == b"single member archive"

    def test_garbage_between_records_skipped(self):
        recs = [_conv("http://x/1", "first"), _conv("http://x/2", "second")]
        a, b = build_warc_bytes([recs[0]]), build_warc_bytes([recs[1]])
        out = list(iter_warc_records(a + b"JUNKJUNKJUNK" + b))
        assert [r["payload"] for r in out] == [b"first", b"second"]

    def test_unframed_record_resyncs(self):
        bad = b"WARC/1.0\r\nWARC-Type: metadata\r\n\r\n"
        good = build_warc_bytes([_conv("http://y/1", "kept")])
        out = list(iter_warc_records(bad + good))
        assert [r["payload"] for r in out] == [b"kept"]

    def test_overstated_content_length_resyncs(self):
        # r11 ADVICE (medium): a corrupt/overstated Content-Length must
        # neither buffer the rest of the archive waiting for bytes that
        # never come nor swallow the valid records after it — the bad
        # header resyncs like the unframed case and every later record
        # still parses.
        bad = (
            b"WARC/1.0\r\nWARC-Type: conversion\r\n"
            b"WARC-Target-URI: http://bad/1\r\n"
            b"Content-Length: 999999999999\r\n\r\nshort body\r\n\r\n"
        )
        good = build_warc_bytes(
            [_conv("http://z/1", "after one"), _conv("http://z/2", "after two")]
        )
        out = list(iter_warc_records(bad + good))
        assert [r["payload"] for r in out] == [b"after one", b"after two"]
        # negative lengths are equally implausible
        neg = bad.replace(b"999999999999", b"-5")
        out = list(iter_warc_records(neg + good))
        assert [r["payload"] for r in out] == [b"after one", b"after two"]

    def test_content_length_cap_configurable(self):
        # a record over the caller's max_record_bytes is dropped (its
        # body is rescanned for the next magic), smaller ones parse
        big = _conv("http://c/big", "x" * 100)
        small = _conv("http://c/small", "tiny")
        data = build_warc_bytes([big, small])
        out = list(iter_warc_records(data, max_record_bytes=50))
        assert [r["headers"]["warc-target-uri"] for r in out] == [
            "http://c/small"
        ]
        out = list(iter_warc_records(data, max_record_bytes=200))
        assert len(out) == 2

    def test_bounded_buffer_with_bad_length_in_gzip_stream(self):
        # the overstated length arrives mid-stream via per-member gzip:
        # the buffered assembler must resync within the stream, keeping
        # the later members' records
        recs = [_conv(f"http://m/{i}", f"member {i}") for i in range(3)]
        data = bytearray(build_warc_bytes(recs, gzip_per_record=True))
        import gzip as _g
        bad = _g.compress(
            b"WARC/1.0\r\nWARC-Type: conversion\r\n"
            b"WARC-Target-URI: http://m/bad\r\n"
            b"Content-Length: 888888888888\r\n\r\noops\r\n\r\n"
        )
        # splice the bad member between members 0 and 1
        first_end = data.find(b"\x1f\x8b\x08", 1)
        spliced = bytes(data[:first_end]) + bad + bytes(data[first_end:])
        out = list(iter_warc_records(spliced))
        assert [r["payload"].decode() for r in out] == [
            "member 0", "member 1", "member 2"
        ]

    def test_http_response_split(self):
        body = b"<html>hi</html>"
        payload = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n"
            b"Server: x\r\n\r\n" + body
        )
        status, ctype, got = _split_http(payload)
        assert (status, ctype.split(";")[0], got) == (200, "text/html", body)
        # non-HTTP payload passes through untouched
        assert _split_http(b"plain") == (None, None, b"plain")


class TestDistributedIngest:
    def test_parse_warc_in_memory(self, spark):
        recs = [_conv(f"http://m/{i}", f"text {i}") for i in range(4)]
        blob = build_warc_bytes(recs)
        df = spark.createDataFrame(
            [("mem://a", bytearray(blob))], "path string, content binary"
        )
        out = parse_warc(df).collect()
        assert len(out) == 4
        assert sorted(r["text"] for r in out) == [f"text {i}" for i in range(4)]
        assert all(r["warc_type"] == "conversion" for r in out)
        assert all(r["n_bytes"] == len(f"text {i}") for i, r in
                   enumerate(sorted(out, key=lambda r: r["target_uri"])))

    def test_read_warc_directory(self, spark, tmp_path):
        # one .warc.gz with response records, one .wet with conversions
        html = b"<html><body>page one</body></html>"
        resp_payload = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + html
        )
        responses = build_warc_bytes(
            [
                {"warc_type": "response", "target_uri": "http://s/1",
                 "payload": resp_payload,
                 "content_type": "application/http; msgtype=response"},
                {"warc_type": "request", "target_uri": "http://s/1",
                 "payload": b"GET / HTTP/1.1\r\n\r\n",
                 "content_type": "application/http; msgtype=request"},
            ],
            gzip_per_record=True,
        )
        (tmp_path / "crawl-00000.warc.gz").write_bytes(responses)
        wet = build_warc_bytes([_conv("http://s/1", "page one")])
        (tmp_path / "crawl-00000.warc.wet").write_bytes(wet)

        out = read_warc(spark, str(tmp_path)).collect()
        # request records filtered by the default record_types
        assert sorted(r["warc_type"] for r in out) == ["conversion", "response"]
        by_type = {r["warc_type"]: r for r in out}
        assert by_type["response"].http_status == 200
        assert by_type["response"].content_type == "text/html"
        assert by_type["response"].text == html.decode()
        assert by_type["conversion"].text == "page one"
        assert by_type["conversion"].n_bytes == len(b"page one")

    def test_binary_content_has_null_text(self, spark):
        png = {"warc_type": "resource", "target_uri": "http://b/i.png",
               "payload": b"\x89PNG\x00\x01", "content_type": "image/png"}
        df = spark.createDataFrame(
            [("mem://b", bytearray(build_warc_bytes([png])))],
            "path string, content binary",
        )
        [r] = parse_warc(df, record_types=None).collect()
        assert r["text"] is None and r["n_bytes"] == 6

    def test_conversion_text_starting_with_http_not_split(self, spark):
        tricky = "HTTP/1.1 200 OK\r\n\r\nnot an envelope, just text"
        df = spark.createDataFrame(
            [("mem://t", bytearray(build_warc_bytes([_conv("http://t/1", tricky)])))],
            "path string, content binary",
        )
        [r] = parse_warc(df).collect()
        assert r["text"] == tricky and r["http_status"] is None

    def test_corrupt_gzip_tail_keeps_decoded_records(self):
        recs = [_conv(f"http://c/{i}", f"kept {i}") for i in range(3)]
        data = build_warc_bytes(recs, gzip_per_record=True)
        out = list(iter_warc_records(data + b"\x00\x00JUNK"))
        assert [r["payload"].decode() for r in out] == [
            "kept 0", "kept 1", "kept 2",
        ]
        # corrupt member mid-stream: records before it survive
        half = list(iter_warc_records(data[: len(data) // 2]))
        assert all(r["payload"].decode().startswith("kept") for r in half)


class TestCharsetDecode:
    def _row(self, payload: bytes, ctype: str):
        from unstructured_spark.sources.warc import _record_row

        rec = {
            "headers": {
                "warc-type": "response",
                "content-type": ctype,
                "warc-target-uri": "http://c/x",
            },
            "payload": payload,
        }
        return _record_row("p", rec)

    def test_declared_latin1(self):
        row = self._row("café «señor»".encode("latin-1"),
                        "text/html; charset=ISO-8859-1")
        assert row["text"] == "café «señor»"
        assert row["encoding"] == "latin-1"
        assert row["content_type"] == "text/html"  # param stripped

    def test_meta_charset_sniff(self):
        body = ('<html><head><meta charset="windows-1252"></head>'
                '<body>dash – quote “q”</body></html>'
                ).encode("cp1252")
        row = self._row(body, "text/html")
        assert row["encoding"] == "cp1252"
        assert "–" in row["text"] and "“" in row["text"]

    def test_bom_wins_over_wrong_declaration(self):
        body = b"\xef\xbb\xbf" + "résumé".encode("utf-8")
        row = self._row(body, "text/plain; charset=utf-16")
        assert row["text"] == "résumé"
        assert row["encoding"] == "utf-8"

    def test_utf16_le_bom(self):
        body = "﻿hello ünïcode".encode("utf-16-le")
        row = self._row(body, "text/plain")
        assert row["text"] == "hello ünïcode"
        assert row["encoding"] == "utf-16-le"

    def test_lying_charset_falls_through(self):
        # declared utf-8 but bytes are invalid utf-8: strict decode of
        # the declared codec fails -> strict utf-8 fails -> cp1252
        body = b"caf\xe9 and more"
        row = self._row(body, "text/plain; charset=utf-8")
        assert row["text"] == "café and more"
        assert row["encoding"] == "cp1252"

    def test_plain_utf8_default(self):
        row = self._row("日本語テキスト".encode("utf-8"), "text/plain")
        assert row["text"] == "日本語テキスト"
        assert row["encoding"] == "utf-8"

    def test_unknown_codec_name_ignored(self):
        row = self._row(b"plain ascii", "text/plain; charset=x-bogus-enc")
        assert row["text"] == "plain ascii"
        assert row["encoding"] == "utf-8"

    def test_binary_types_not_decoded(self):
        row = self._row(b"\x89PNG...", "image/png")
        assert row["text"] is None and row["encoding"] is None
