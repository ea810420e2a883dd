"""URL canonicalization + URL-keyed dedup."""

from __future__ import annotations

from pyspark.sql import functions as F

from unstructured_spark.functions.urls import canonical_url, dedup_by_url


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "u string")
    return [r["c"] for r in df.select(canonical_url("u").alias("c")).collect()]


class TestCanonicalUrl:
    def test_collapses_crawl_variants(self, spark):
        variants = [
            "http://Example.COM/page/7",
            "http://www.example.com/page/7/",
            "https://example.com:443/page/7",
            "http://example.com:80/page/7#section-2",
            "HTTPS://WWW.EXAMPLE.COM/page/7?utm_source=feed&fbclid=x",
        ]
        out = set(_canon(spark, variants))
        assert out == {"http://example.com/page/7"}

    def test_query_params_sorted_and_tracking_dropped(self, spark):
        [c] = _canon(spark, ["http://a.com/p?b=2&utm_campaign=x&a=1&gclid=g&ref=r"])
        assert c == "http://a.com/p?a=1&b=2"

    def test_distinct_documents_stay_distinct(self, spark):
        out = _canon(spark, [
            "http://a.com/p?id=1",
            "http://a.com/p?id=2",
            "http://a.com/q",
            "http://b.com/p",
        ])
        assert len(set(out)) == 4

    def test_null_and_bare_values(self, spark):
        df = spark.createDataFrame(
            [(None,), ("not a url/",), ("rel/path?utm_source=x&k=v#f",)],
            "u string",
        )
        out = [r["c"] for r in df.select(canonical_url("u").alias("c")).collect()]
        assert out[0] is None
        assert out[1] == "not a url"
        assert out[2] == "rel/path?k=v"

    def test_non_default_port_kept(self, spark):
        [c] = _canon(spark, ["http://a.com:8080/p"])
        assert c == "http://a.com:8080/p"

    def test_non_http_scheme_not_folded(self, spark):
        # ftp:// must NOT collapse onto the http:// dedup key — a
        # document served over a different protocol is a different
        # fetch (r11 ADVICE: the unconditional http:// rebuild merged
        # and could silently drop one of them)
        out = _canon(spark, [
            "ftp://example.com/x",
            "http://example.com/x",
            "FTP://Example.COM/x/",
        ])
        assert out[0] == "ftp://example.com/x"
        assert out[1] == "http://example.com/x"
        assert out[0] != out[1]
        # scheme+host still lower/casefold, path rules still apply
        assert out[2] == "ftp://example.com/x"

    def test_non_http_scheme_keeps_port_and_www(self, spark):
        # :80/:443 and www. are http(s) conventions; other schemes
        # pass their authority through (lowered only)
        out = _canon(spark, [
            "ftp://www.example.com:80/f",
            "gopher://example.com:443/g",
        ])
        assert out == [
            "ftp://www.example.com:80/f",
            "gopher://example.com:443/g",
        ]


class TestDedupByUrl:
    def test_keep_min_and_counts(self, spark):
        rows = [
            (1, "http://www.example.com/x/"),
            (2, "https://example.com/x"),
            (3, "http://example.com/y"),
            (4, "http://EXAMPLE.com:80/x#frag"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, target_uri string")
        out = {r["canonical_url"]: r for r in dedup_by_url(df).collect()}
        assert out["http://example.com/x"]["keep_id"] == 1
        assert out["http://example.com/x"]["dup_count"] == 3
        assert out["http://example.com/y"]["keep_id"] == 3
        assert out["http://example.com/y"]["dup_count"] == 1

    def test_plan_is_one_aggregate(self, spark):
        df = spark.createDataFrame(
            [(1, "http://a.com/p")], "doc_id long, target_uri string"
        )
        plan = (
            dedup_by_url(df)._jdf.queryExecution().executedPlan().toString()
        )
        assert "BatchEvalPython" not in plan and "CartesianProduct" not in plan
