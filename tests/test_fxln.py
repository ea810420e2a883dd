"""Fixed-point integer logarithm — the cross-engine determinism
primitive behind bigram_cross_entropy / perplexity_buckets.

Three properties, each load-bearing:
1. Spark evaluates fxln_steps to the same bigint as a pure-Python
   integer replay (so the SQL emission is faithful to the spec).
2. DuckDB evaluates the same steps to the same bigint (so the oracle
   replay cannot diverge — this is what kills the r5-r7 driver red).
3. The result is within 1e-7 of libm ln (semantic fidelity: the grid
   value the operator publishes is still "the" cross-entropy).
"""

import math

import duckdb

from unstructured_spark.operators.text_analysis import (
    FXLN_SCALE,
    fxln_select_sql,
    fxln_steps,
    with_fxln,
)


def py_fxln(m: int) -> int:
    """Reference replay of fxln_steps in plain Python ints."""
    S = FXLN_SCALE
    k = m.bit_length() - 1
    x = m << (31 - k) if k <= 31 else m >> (k - 31)
    z = ((x - S) * S) // (x + S)
    z2 = (z * z) // S
    t, total = z, 0
    for d in (3, 5, 7, 9, 11, 13, 15, 17, 19):
        t = (t * z2) // S
        total += t // d
    return k * 1488522236 + 2 * (z + total)


# boundary-heavy sample: powers of two ±1 (normalization edges), small
# counts (the dense region of real count tables), large corpus scales
CASES = sorted(
    {1, 2, 3, 4, 5, 7, 10, 100, 12345, 999983}
    | {2**p + d for p in (20, 31, 32, 40, 62) for d in (-1, 0, 1)}
    | {10**12, 10**12 + 7, 2**62 - 1}
)


def test_python_replay_matches_libm():
    for m in CASES:
        assert abs(py_fxln(m) / FXLN_SCALE - math.log(m)) < 1e-7, m


def test_module_fxln_int_matches_replay():
    # the driver-side literal path (tfidf's ln N) must be THE SAME
    # integer the SQL chain produces
    from unstructured_spark.operators.text_analysis import fxln_int

    assert {m: fxln_int(m) for m in CASES} == {m: py_fxln(m) for m in CASES}


def test_spark_matches_python_replay(spark):
    df = spark.createDataFrame([(m,) for m in CASES], "m bigint")
    out = with_fxln(df, "m", "f_").select("m", "f_ln").collect()
    got = {r["m"]: r["f_ln"] for r in out}
    assert got == {m: py_fxln(m) for m in CASES}


def test_duckdb_matches_python_replay():
    con = duckdb.connect()
    con.sql("create table a as select unnest(?::bigint[]) as m", params=[CASES])
    sql = f"select m, f_ln from (select m, {fxln_select_sql('m', 'f_')} from a)"
    got = dict(con.sql(sql).fetchall())
    assert got == {m: py_fxln(m) for m in CASES}


def test_step_chain_names_are_ordered():
    # with_fxln applies steps in order; every referenced name must be
    # either the input or an earlier step (guards generator refactors)
    steps = fxln_steps("m", "p_", "div")
    seen = {"m"}
    for name, expr in steps:
        for tok in [t for t in ("p_k", "p_x", "p_z", "p_z2") if t in expr]:
            assert tok in seen
        seen.add(name)
    assert steps[-1][0] == "p_ln"


def test_monotone_small_values():
    # fxln must be non-decreasing so -ln P stays >= 0 for c1+V >= c12+1
    vals = [py_fxln(m) for m in range(1, 2000)]
    assert vals == sorted(vals)
