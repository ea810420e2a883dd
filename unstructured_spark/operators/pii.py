"""PII detection and redaction over a text corpus.

Training-data hygiene primitives (beyond-reference surface, same
family as the Gopher/C4 quality filters): per-document PII counts for
audit/filtering, and in-place redaction with typed placeholders.

Everything is native Spark SQL expressions — regexp_extract_all /
regexp_replace / higher-order array functions — so the whole pass is
JVM-side whole-stage codegen with ZERO shuffles: at 100 TB it scales
by scan parallelism alone, and filters/projections still push down to
the parquet scan.

Patterns live in ``functions/patterns.py`` and stay inside the
Java-regex ∩ RE2 common subset so a DuckDB oracle replays the exact
counts (no lookaround, no backreferences).

Payment-card matching is two-phase: a deliberately loose digit-run
regex bounds the candidate set, then a full Luhn checksum — computed
as a higher-order fold over the digit string, identically expressible
in DuckDB list comprehensions — keeps only valid card numbers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from unstructured_spark.functions import patterns

# redaction order matters: emails first (may embed digit runs), then
# cards before phones/SSNs (a card's digit groups must not be half
# eaten by the phone pattern), IPs last
REDACTION_ORDER: tuple[tuple[str, str, str], ...] = (
    ("email", patterns.EMAIL_ADDRESS, "[EMAIL]"),
    ("credit_card", patterns.CREDIT_CARD_CANDIDATE, "[CARD]"),
    ("ssn", patterns.SSN, "[SSN]"),
    ("phone", patterns.US_PHONE_STRICT, "[PHONE]"),
    ("ip_address", patterns.IP_ADDRESS, "[IP]"),
)


def luhn_valid(candidate: Column) -> Column:
    """Luhn checksum over the digits of ``candidate`` (separators
    stripped). From the rightmost digit, every second digit doubles
    (minus 9 when > 9); valid iff the total is ≡ 0 (mod 10).

    Pure expression fold — DuckDB replays it as
    ``list_sum([... for i in range(1, len(d)+1)]) % 10 = 0``."""
    digits = F.regexp_replace(candidate, "[^0-9]", "")
    rev = F.reverse(digits)
    terms = F.transform(
        F.sequence(F.lit(1), F.length(rev)),
        lambda i: F.when(
            i % 2 == 0,
            F.when(
                F.substring(rev, i, 1).cast("int") * 2 > 9,
                F.substring(rev, i, 1).cast("int") * 2 - 9,
            ).otherwise(F.substring(rev, i, 1).cast("int") * 2),
        ).otherwise(F.substring(rev, i, 1).cast("int")),
    )
    total = F.aggregate(terms, F.lit(0), lambda acc, x: acc + x)
    return (F.length(digits) > 0) & (total % 10 == 0)


def credit_card_count(col: Column) -> Column:
    """Count of Luhn-VALID card numbers among the loose digit-run
    candidates."""
    cands = F.regexp_extract_all(col, F.lit(patterns.CREDIT_CARD_CANDIDATE), 0)
    return F.size(F.filter(cands, luhn_valid)).cast("bigint")


def pii_total_expr(col: Column) -> Column:
    """Total PII hits in one text column as a single BIGINT expression
    (emails + strict phones + IPv4 + SSNs + Luhn-valid cards) — the
    column form of :func:`pii_stats`'s ``pii_total``, for composing a
    PII gate into a wider projection without a join."""

    def _n(p: str) -> Column:
        return F.size(F.regexp_extract_all(col, F.lit(p), 0)).cast("bigint")

    return (
        _n(patterns.EMAIL_ADDRESS)
        + _n(patterns.US_PHONE_STRICT)
        + _n(patterns.IP_ADDRESS)
        + _n(patterns.SSN)
        + credit_card_count(col)
    ).cast("bigint")


def pii_stats(
    df: DataFrame, *, text: str = "text", doc_id: str = "doc_id"
) -> DataFrame:
    """Per-document PII counts: emails, strict phones, IPv4 addresses,
    SSNs, Luhn-valid payment cards, and the total. Zero-shuffle."""
    c = F.col(text)

    def _n(p: str) -> Column:
        return F.size(F.regexp_extract_all(c, F.lit(p), 0)).cast("bigint")

    out = df.select(
        F.col(doc_id),
        _n(patterns.EMAIL_ADDRESS).alias("emails"),
        _n(patterns.US_PHONE_STRICT).alias("phones"),
        _n(patterns.IP_ADDRESS).alias("ip_addresses"),
        _n(patterns.SSN).alias("ssns"),
        credit_card_count(c).alias("credit_cards"),
    )
    total = (
        F.col("emails")
        + F.col("phones")
        + F.col("ip_addresses")
        + F.col("ssns")
        + F.col("credit_cards")
    )
    return out.withColumn("pii_total", total.cast("bigint"))


def redact_pii(col: Column, kinds: tuple[str, ...] | None = None) -> Column:
    """Replace each PII match with its typed placeholder, applying
    patterns in ``REDACTION_ORDER`` (card runs are redacted before the
    phone pattern can eat their digit groups). ``kinds`` restricts to a
    subset of {email, credit_card, ssn, phone, ip_address}.

    Note: the card placeholder uses the loose candidate regex — for
    redaction recall beats precision (a false [CARD] is safe; a leaked
    real one is not), the opposite trade from ``pii_stats``.
    """
    out = col
    for kind, pattern, placeholder in REDACTION_ORDER:
        if kinds is not None and kind not in kinds:
            continue
        out = F.regexp_replace(out, pattern, placeholder)
    return out


def redact_docs(
    df: DataFrame, *, text: str = "text", kinds: tuple[str, ...] | None = None
) -> DataFrame:
    """Corpus-wide redaction: same DataFrame with ``text`` replaced by
    its redacted form. Map-only."""
    return df.withColumn(text, redact_pii(F.col(text), kinds))
