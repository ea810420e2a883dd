"""PII detection/redaction: detector precision, Luhn validation, and
redaction ordering."""

from pyspark.sql import functions as F

from unstructured_spark.operators.pii import (
    luhn_valid,
    pii_stats,
    redact_docs,
    redact_pii,
)


def _one(spark, text):
    return spark.createDataFrame([("d1", text)], "doc_id string, text string")


class TestPiiStats:
    def test_counts_each_kind(self, spark):
        txt = (
            "mail a.b+c@ex-ample.org or root@sub.domain.io, "
            "call (212) 555-0187, box at 192.168.0.254, "
            "ssn 078-05-1120, card 4111 1111 1111 1111"
        )
        [r] = pii_stats(_one(spark, txt)).collect()
        assert r["emails"] == 2
        assert r["phones"] == 1
        assert r["ip_addresses"] == 1
        assert r["ssns"] == 1
        assert r["credit_cards"] == 1
        assert r["pii_total"] == 6

    def test_luhn_rejects_bad_checksum(self, spark):
        [r] = pii_stats(_one(spark, "cards 4111111111111111 4111111111111112")).collect()
        assert r["credit_cards"] == 1

    def test_plain_digit_run_is_not_a_phone(self, spark):
        # permissive US_PHONE would match any 7+ digits; the strict
        # pattern requires separators
        [r] = pii_stats(_one(spark, "invoice 12345678 total 9876543")).collect()
        assert r["phones"] == 0 and r["pii_total"] == 0

    def test_ssn_not_double_counted_as_phone(self, spark):
        [r] = pii_stats(_one(spark, "ssn 078-05-1120 only")).collect()
        assert r["ssns"] == 1 and r["phones"] == 0


class TestLuhn:
    def test_known_vectors(self, spark):
        rows = spark.range(1).select(
            luhn_valid(F.lit("4111-1111-1111-1111")).alias("a"),
            luhn_valid(F.lit("5500 0000 0000 0004")).alias("b"),
            luhn_valid(F.lit("4111111111111112")).alias("c"),
            luhn_valid(F.lit("")).alias("d"),
        ).collect()[0]
        assert rows["a"] is True and rows["b"] is True
        assert rows["c"] is False and rows["d"] is False


class TestRedaction:
    def test_typed_placeholders(self, spark):
        txt = "a@b.co then 4111 1111 1111 1111 then 078-05-1120 then (212) 555-0187 then 10.0.0.1"
        [r] = redact_docs(_one(spark, txt)).collect()
        assert r["text"] == "[EMAIL] then [CARD] then [SSN] then [PHONE] then [IP]"

    def test_card_redacted_before_phone_can_split_it(self, spark):
        [r] = redact_docs(_one(spark, "pay 4111-1111-1111-1111 now")).collect()
        assert r["text"] == "pay [CARD] now"
        assert "[PHONE]" not in r["text"]

    def test_kinds_subset(self, spark):
        col = redact_pii(F.lit("a@b.co and 10.0.0.1"), kinds=("email",))
        [r] = spark.range(1).select(col.alias("t")).collect()
        assert r["t"] == "[EMAIL] and 10.0.0.1"


class TestStreamingCompatibility:
    """PII redaction and hash sampling are pure map-only expressions,
    so they must run unchanged inside Structured Streaming (the
    streaming ingest path applies the same hygiene stages)."""

    def test_redact_and_sample_in_stream(self, spark, tmp_path):
        from unstructured_spark.operators.pii import redact_pii
        from unstructured_spark.operators.sampling import hash_uniform

        import pyspark.sql.functions as F

        src = tmp_path / "in"
        spark.createDataFrame(
            [("a", "mail a@b.co now"), ("b", "no pii here")],
            "doc_id string, text string",
        ).coalesce(1).write.json(str(src))
        stream = spark.readStream.schema("doc_id string, text string").json(str(src))
        out = stream.select(
            "doc_id",
            redact_pii(F.col("text")).alias("text"),
            (hash_uniform(F.col("doc_id")) < 2.0).alias("kept"),  # keep all
        )
        q = (
            out.writeStream.format("memory")
            .queryName("pii_stream")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {r["doc_id"]: r["text"] for r in spark.sql("select * from pii_stream").collect()}
        assert got == {"a": "mail [EMAIL] now", "b": "no pii here"}
