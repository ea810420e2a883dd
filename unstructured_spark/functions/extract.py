"""Extraction column functions (semantics of reference ``cleaners/extract.py``).

All built on ``regexp_extract`` / ``regexp_extract_all`` — JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from unstructured_spark.functions import patterns


def extract_email_addresses(col: Column) -> Column:
    """All email addresses in the text (extract.py:61-66)."""
    return F.regexp_extract_all(col, F.lit(f"({patterns.EMAIL_ADDRESS})"), 1)


def extract_ip_addresses(col: Column) -> Column:
    """All IPv4 addresses (extract.py:69-76)."""
    return F.regexp_extract_all(col, F.lit(f"({patterns.IP_ADDRESS})"), 1)


def extract_us_phone_number(col: Column) -> Column:
    """First US phone number, stripped (extract.py:87-94)."""
    return F.trim(F.regexp_extract(col, patterns.US_PHONE, 0))


def extract_image_urls(col: Column) -> Column:
    """All image URLs (extract.py:128-143)."""
    return F.regexp_extract_all(col, F.lit(f"({patterns.IMAGE_URL})"), 1)


def extract_text_before(col: Column, pattern: str) -> Column:
    """Text before the first match of ``pattern`` (extract.py:31-44)."""
    return F.when(
        col.rlike(pattern),
        F.regexp_replace(col, f"(?s)({pattern}).*$", ""),
    )


def extract_text_after(col: Column, pattern: str) -> Column:
    """Text after the first match of ``pattern`` (extract.py:47-58)."""
    return F.when(
        col.rlike(pattern),
        F.regexp_replace(col, f"(?s)^.*?({pattern})", ""),
    )


def extract_datetimetz(col: Column) -> Column:
    """RFC-2822 date from e.g. an email Received header (extract.py:79-84).

    The day-of-week prefix is stripped before parsing: Spark's
    CORRECTED datetime parser forbids 'E' as a PARSING symbol, so a
    'EEE, ...' pattern throws at runtime (the day name is redundant
    with the date anyway)."""
    rfc2822 = r"[A-Za-z]{3},\s\d{1,2}\s[A-Za-z]{3}\s\d{4}\s\d{2}:\d{2}:\d{2}\s[+-]\d{4}"
    raw = F.regexp_extract(col, f"({rfc2822})", 1)
    no_dow = F.regexp_replace(raw, r"^[A-Za-z]{3},\s", "")
    return F.when(
        raw != "", F.to_timestamp(no_dow, "d MMM yyyy HH:mm:ss Z")
    )


def extract_ordered_bullets(col: Column) -> Column:
    """Split a leading ordered bullet like ``1.1.2`` into a struct
    (section, sub_section, sub_sub_section) (reference
    extract.py:104-139 exactly): the FIRST whitespace token must
    contain a '.' (no '..'), its first segment must be <= 2 chars, a
    trailing '.' is dropped; anything else yields all-null (plain
    prose like 'Hello world' is NOT a bullet)."""
    first = F.element_at(F.split(F.trim(col), "\\s+"), 1)
    head = F.regexp_replace(first, r"\.$", "")
    parts = F.split(head, "\\.")
    sec = F.element_at(parts, 1)
    valid = (
        first.contains(".")
        & ~first.contains("..")
        & (F.length(sec) <= 2)
    )
    return F.struct(
        F.when(valid, sec).alias("section"),
        F.when(valid & (F.size(parts) >= 2), F.element_at(parts, 2)).alias(
            "sub_section"
        ),
        F.when(valid & (F.size(parts) >= 3), F.element_at(parts, 3)).alias(
            "sub_sub_section"
        ),
    )


def extract_ip_address_name(col: Column) -> Column:
    """Dotted host names (reference extract.py:69-70)."""
    return F.regexp_extract_all(col, F.lit(f"({patterns.IP_ADDRESS_NAME})"), 1)


def extract_mapi_id(col: Column) -> Column:
    """Outlook MAPI ids with the trailing ';' stripped (reference
    extract.py:73-76)."""
    raw = F.regexp_extract_all(col, F.lit(f"({patterns.MAPI_ID})"), 1)
    return F.transform(raw, lambda m: F.regexp_replace(m, ";", ""))
