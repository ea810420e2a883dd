"""Guard against the round-5..8 chronic-red root cause: a DuckDB oracle
whose OUTPUT schema contains HUGEINT (e.g. an uncast ``sum(bigint)`` or
``least(bigint, hugeint)``). HUGEINT crosses a pandas/arrow fetch wire
as float64/decimal128 — so the external driver hashes ``"15.0"`` /
``Decimal('15')`` against Spark's ``"15"`` and the row goes red, while
a local ``.fetchall()`` comparison (exact Python ints) stays green and
masks it. Exactly two of 110 oracles had such a column, and they were
exactly the two chronically-red queries.

Every integer aggregate in an oracle's final SELECT must be cast to
BIGINT. This test limit-0-executes every oracle and asserts the arrow
schema is free of decimal/hugeint columns, so the class of bug cannot
re-enter the registry. (The round-9 registry carried four live channel
probes to validate the diagnosis through the external driver; the r9
window confirmed it — control and BIGINT-cast rows green, the
deliberate HUGEINT emitter red — so the probes are retired and the
HUGEINT behavior is pinned here, pytest-only.)
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in entry_mod.TABLES:
        con.sql(f"create view {t} as select * from '{SF_DIR}/{t}.parquet'")
    return con


import re

# Arrow types that cross a pandas fetch wire with a stable repr that
# matches Spark's collect() repr for the same logical value. Anything
# outside this set either narrows (decimal128 from HUGEINT, float16),
# reprs differently (float32 '0.1' -> 0.10000000149, list/struct as
# numpy arrays), or is ambiguous across pandas versions (time types).
_WIRE_SAFE = re.compile(
    r"^(bool|u?int(8|16|32|64)|double|string|large_string|utf8"
    r"|date32\[day\]|timestamp\[(us|ns)(, tz=UTC)?\])$"
)


def test_oracle_outputs_wire_safe(duck):
    offenders = []
    for name, sql in entry_mod.oracle_sql().items():
        schema = duck.execute(
            f"select * from ({sql}) limit 0"
        ).fetch_arrow_table().schema
        for field in schema:
            ts = str(field.type)
            if not _WIRE_SAFE.match(ts):
                offenders.append((name, field.name, ts))
    assert not offenders, (
        "oracle output columns that will narrow or re-repr on the "
        "driver's fetch wire (cast to BIGINT/DOUBLE/VARCHAR in the "
        f"SQL): {offenders}"
    )


def test_uncast_sum_is_still_hugeint(duck):
    """The retired r9 channel probe, pinned pytest-only: an uncast
    DuckDB ``sum(bigint)`` must still come back HUGEINT (arrow
    decimal128). If a DuckDB upgrade ever changes that, the wire-safe
    discipline above is re-auditable rather than silently moot."""
    schema = duck.execute(
        "select * from (select sum(r) as s from range(1, 6) t(r)) limit 0"
    ).fetch_arrow_table().schema
    assert "decimal" in str(schema.field("s").type)
