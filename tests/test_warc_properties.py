"""Property-based tests (hypothesis) for the WARC framing parser and
the HLL integer estimator — invariants that must hold for ANY input,
not just fixtures.

WARC contract:
- build -> parse is the identity on (type, uri, payload) for ANY
  payload bytes (including bytes containing WARC magic, CRLF blank
  lines, or gzip magic) in both plain and per-record-gzip layouts;
- injecting garbage between records never loses the framed records;
- corrupting the gzip tail never raises — earlier records survive.

HLL contract (pure-Python twin == the SQL chain by test_hll.py):
- estimate depends only on the SET of tokens (duplicate- and
  order-invariant);
- merging register tables by max == sketching the union.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from tests.test_hll import py_hll_estimate
from unstructured_spark.sources.warc import (
    build_warc_bytes,
    iter_warc_records,
)

_PAYLOAD = st.binary(min_size=0, max_size=200)
_TRICKY = st.sampled_from(
    [
        b"",
        b"WARC/1.0\r\n\r\n",
        b"\r\n\r\n\r\n",
        b"\x1f\x8b\x08fake-gzip-magic",
        b"HTTP/1.1 200 OK\r\n\r\nbody",
        b"Content-Length: 99\r\n",
    ]
)
_RECORDS = st.lists(
    st.tuples(st.one_of(_PAYLOAD, _TRICKY), st.sampled_from(
        ["conversion", "response", "metadata"]
    )),
    min_size=0,
    max_size=8,
)


def _build(recs):
    return [
        {"warc_type": t, "target_uri": f"http://p/{i}", "payload": p}
        for i, (p, t) in enumerate(recs)
    ]


@settings(max_examples=200, deadline=None)
@given(_RECORDS, st.booleans())
def test_round_trip_any_payload(recs, gz):
    data = build_warc_bytes(_build(recs), gzip_per_record=gz)
    out = list(iter_warc_records(data))
    assert [
        (r["headers"]["warc-type"], r["headers"]["warc-target-uri"],
         r["payload"])
        for r in out
    ] == [(t, f"http://p/{i}", p) for i, (p, t) in enumerate(recs)]


@settings(max_examples=100, deadline=None)
@given(_RECORDS, st.binary(min_size=1, max_size=30))
def test_garbage_between_plain_records_never_loses_framed(recs, junk):
    # garbage must not contain the record magic itself
    if b"WARC/" in junk:
        return
    blocks = [build_warc_bytes([r]) for r in _build(recs)]
    data = junk.join(blocks) if blocks else junk
    out = list(iter_warc_records(data))
    assert [r["payload"] for r in out] == [p for p, _ in recs]


@settings(max_examples=100, deadline=None)
@given(_RECORDS, st.binary(min_size=0, max_size=20))
def test_gzip_tail_corruption_never_raises(recs, tail):
    data = build_warc_bytes(_build(recs), gzip_per_record=True)
    out = list(iter_warc_records(data + tail))
    # prefix property: whatever decodes is a prefix of the true records
    want = [p for p, _ in recs]
    got = [r["payload"] for r in out]
    assert got == want[: len(got)]


_TOKENS = st.lists(
    st.text(alphabet=st.sampled_from("abcdefgh"), min_size=1, max_size=6),
    min_size=0,
    max_size=300,
)


@settings(max_examples=150, deadline=None)
@given(_TOKENS)
def test_hll_estimate_is_set_invariant(tokens):
    assert py_hll_estimate(tokens) == py_hll_estimate(
        sorted(set(tokens), reverse=True) * 2
    )


@settings(max_examples=100, deadline=None)
@given(_TOKENS, _TOKENS)
def test_hll_union_upper_and_monotone(a, b):
    # sketching a union never estimates below either side's sketch
    # (register max is monotone in the item set)
    ab = py_hll_estimate(a + b)
    assert ab >= max(py_hll_estimate(a), py_hll_estimate(b)) or (
        not a and not b
    )
