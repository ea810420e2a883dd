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
re-enter the registry. (``probe_hugeint_wire`` is the one deliberate
exception: it exists to validate the diagnosis through the external
channel itself.)
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_DIR

# The one intentional HUGEINT emitter (r9 channel probe).
ALLOWED_HUGEINT = {"probe_hugeint_wire"}


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
        if name in ALLOWED_HUGEINT:
            continue
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


def test_probe_hugeint_is_still_hugeint(duck):
    """The diagnostic probe must keep emitting HUGEINT or it stops
    probing anything."""
    sql = entry_mod.oracle_sql()["probe_hugeint_wire"]
    schema = duck.execute(
        f"select * from ({sql}) limit 0"
    ).fetch_arrow_table().schema
    assert "decimal" in str(schema.field("s").type)
