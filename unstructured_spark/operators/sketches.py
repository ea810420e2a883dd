"""Frequency sketches for corpus-scale token statistics.

At 100 TB an exact (token, count) table is itself a large dataset; a
count-min sketch (Cormode & Muthukrishnan 2005) answers point
frequency queries from a FIXED d×w counter grid that fits in one
broadcast. The reference keeps exact counts (its corpora fit);
``SCALING.md`` documents "swap in a sketch rollup consciously, not
silently" — this module is that swap, with the same determinism bar as
everything else in the repo: the hash family is md5-derived, so Spark
and an external SQL engine build and probe the SAME sketch cell for
cell, and the estimate-vs-exact error audit is oracle-checkable.

Design notes (Spark-first):
- The sketch is built from the ``word_counts`` vocabulary table, not
  the raw token stream: the one corpus-wide shuffle already happened
  there, and exploding d rows per DISTINCT word costs O(d·|vocab|),
  not O(d·corpus tokens). Weights ride along, so the counters are
  identical to streaming every occurrence.
- CMS guarantees est >= exact (counters only ever add); the audit
  reports per-token overcount so a user can size (d, w) against their
  vocabulary's actual skew instead of guessing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "cms_from_counts",
    "hll_register_columns",
    "hll_token_array",
    "cms_error_audit",
    "hll_registers",
    "hll_estimate",
    "hll_distinct_audit",
    "hll_alpha_q20",
]


def _cms_bucket(item: Column, row: int, width: int) -> Column:
    """Deterministic bucket for hash row ``row``: 60-bit md5 prefix of
    the salted item, mod width. DuckDB replays it as
    ``cast(('0x'||substr(md5('cms'||r||':'||token),1,15)) as bigint) % w``."""
    salted = F.concat(F.lit(f"cms{row}:"), item)
    return (
        F.conv(F.substring(F.md5(salted), 1, 15), 16, 10).cast("bigint")
        % int(width)
    )


def cms_from_counts(
    wc: DataFrame,
    *,
    item: str = "word",
    weight: str = "n",
    d: int = 4,
    w: int = 2048,
) -> DataFrame:
    """Build the d×w count-min grid from a pre-aggregated
    ``(item, weight)`` frequency table: every item increments one
    bucket per hash row by its full weight. Returns
    ``(r, b, cnt)`` — at most ``d·w`` rows, broadcastable at any
    corpus size. Incremental-friendly: grids from two corpus slices
    merge by summing matching cells (counters are linear)."""
    buckets = F.array(
        *[_cms_bucket(F.col(item), r, w) for r in range(int(d))]
    )
    return (
        wc.select(
            F.posexplode(buckets).alias("r", "b"),
            F.col(weight).alias("_w"),
        )
        .groupBy("r", "b")
        .agg(F.sum("_w").cast("bigint").alias("cnt"))
    )


def cms_error_audit(
    df: DataFrame,
    *,
    text: str = "text",
    top_k: int = 50,
    d: int = 4,
    w: int = 2048,
    lowercase: bool = True,
) -> DataFrame:
    """Exact-vs-sketch audit over the corpus's top-k tokens: build the
    CMS from the full vocabulary, probe it for the k most frequent
    tokens, and report ``(token, exact_cnt, cms_est, overcount_ppm)``.
    ``cms_est >= exact_cnt`` always (count-min never undercounts);
    ``overcount_ppm = 1e6·(est-exact) div exact`` is the integer-exact
    relative error a user reads to size (d, w) for their corpus's
    skew before swapping the sketch in for exact counts.

    Scale shape: ONE corpus shuffle (the word-count aggregation,
    checkpointed so the sketch build and the top-k both consume the
    REDUCED vocabulary instead of re-aggregating the corpus), then
    everything downstream is vocab- or d·w-bounded; the sketch joins
    broadcast."""
    from unstructured_spark.operators.tokenizer import word_counts

    wc = word_counts(df, text=text, lowercase=lowercase).localCheckpoint(
        eager=False
    )
    sk = cms_from_counts(wc, d=d, w=w)
    top = wc.orderBy(F.desc("n"), F.asc("word")).limit(int(top_k))
    probes = top.select(
        "word",
        "n",
        F.posexplode(
            F.array(*[_cms_bucket(F.col("word"), r, w) for r in range(int(d))])
        ).alias("r", "b"),
    )
    return (
        probes.join(F.broadcast(sk), ["r", "b"])
        .groupBy("word", "n")
        .agg(F.min("cnt").alias("est"))
        .select(
            F.col("word").alias("token"),
            F.col("n").cast("bigint").alias("exact_cnt"),
            F.col("est").cast("bigint").alias("cms_est"),
            F.expr("(est - n) * 1000000 div n").cast("bigint").alias(
                "overcount_ppm"
            ),
        )
    )


# ---------------------------------------------------------------------------
# HyperLogLog — engine-exact distinct-count sketch
# ---------------------------------------------------------------------------
#
# Flajolet et al. 2007: hash every item, split the hash into a register
# index (p bits) and a suffix; each register keeps the max "position of
# the first 1-bit" (rho) seen; the harmonic mean of 2^-M_j estimates
# the distinct count from m = 2^p integers, mergeable by register max.
#
# The repo's twist is that the WHOLE estimator is integer arithmetic,
# so Spark and the DuckDB oracle produce the SAME estimate bit for bit:
# - rho from the binary digit count (bin(), the fxln trick) — no
#   floating leading-zero intrinsics;
# - the harmonic sum staged as S = sum(2^(W+1-M_j)) — every term a
#   power of two, summed exactly in BIGINT (<= m * 2^(W+1) = 2^61);
# - alpha_m fixed-point at 2^-20, the division chain in decimal(38,0);
# - the small-range linear-counting branch m*ln(m/V) through fxln
#   (fixed-point integer ln, text_analysis.fxln_steps).

HLL_P_DEFAULT = 12  # m = 4096 registers, ~1.6% standard error


def hll_alpha_q20(m: int) -> int:
    """floor(alpha_m * 2^20) — the fixed-point bias-correction constant
    both engines must share as the same integer literal (m >= 128)."""
    return int(0.7213 / (1.0 + 1.079 / m) * (1 << 20))


def _hll_hash(item: Column) -> Column:
    """60-bit md5 prefix — the same engine-portable hash family as the
    CMS buckets and the minhash signatures."""
    return F.conv(F.substring(F.md5(item), 1, 15), 16, 10).cast("bigint")


def hll_register_columns(p: int) -> "tuple[Column, Column]":
    """(j, rho) expressions over a bound BIGINT hash column named
    ``_h`` — THE single definition of the register split, shared by
    the batch sketch and the streaming partials so the two can never
    desynchronize (the bit-identical-merge guarantee rests on it):
    j = h %% m, rho = (W+1) - bit_length(h div m) via bin(), W = 60-p,
    with rho = W+1 for a zero suffix."""
    m = 1 << int(p)
    w = 60 - int(p)
    suffix = F.expr(f"_h div {m}")
    rho = F.when(
        suffix > 0, F.lit(w) + 1 - F.length(F.bin(suffix))
    ).otherwise(F.lit(w + 1))
    return F.expr(f"_h % {m}"), rho.cast("int")


def hll_token_array(text_col: Column) -> Column:
    """Whitespace tokenization shared by the batch audit and the
    streaming partials (regex \\s+, empty tokens dropped)."""
    return F.filter(
        F.split(F.trim(F.coalesce(text_col, F.lit(""))), "\\s+"),
        lambda x: x != F.lit(""),
    )


def hll_registers(
    df: DataFrame,
    *,
    item: str = "token",
    group_cols: tuple[str, ...] = (),
    p: int = HLL_P_DEFAULT,
) -> DataFrame:
    """Per-group HLL register table: (group..., j, M) with register
    index j = h % m and M = max rho over the group's items. Long form
    (<= m rows per group; absent registers are implicit zeros) — two
    sketches merge by unionByName + groupBy max, so per-shard register
    tables roll up to corpus sketches without touching raw data again.

    Scale shape: ONE shuffle on (group, j) with map-side max partials;
    at any corpus size the reduced table is |groups| * 4096 rows."""
    gcols = list(group_cols)
    j, rho = hll_register_columns(p)
    return (
        df.select(*gcols, _hll_hash(F.col(item)).alias("_h"))
        .select(*gcols, j.alias("j"), rho.alias("_rho"))
        .groupBy(*gcols, "j")
        .agg(F.max("_rho").alias("M"))
    )


def hll_estimate(
    regs: DataFrame,
    *,
    group_cols: tuple[str, ...] = (),
    p: int = HLL_P_DEFAULT,
) -> DataFrame:
    """Collapse a register table to (group..., distinct_est):
    raw = (alpha_q20 * m^2 * 2^(W+1)) div S div 2^20 with
    S = sum(2^(W+1-M_j)) over all m registers (absent = M 0), then the
    small-range linear-counting branch m*(ln m - ln V) div 2^31 when
    V = empty registers > 0 and raw <= 5m/2. All integer; the oracle
    replays every step.

    Input tolerance: ``regs`` may be UN-merged — e.g. a unionByName of
    per-shard register tables or the per-window partials that
    ``hll_partials_stream`` emits — because the estimator re-applies
    the groupBy-max merge defensively before the harmonic sum. Without
    it, duplicate (group, j) rows would inflate the occupied-register
    count and corrupt S silently. Cost: at most m=2^p rows per group
    post-merge, and the merge keys extend the estimate's own grouping,
    so on already-merged input (``hll_registers`` output, which is
    partitioned by these very keys) Spark adds no exchange — just a
    free re-aggregate."""
    from unstructured_spark.operators.text_analysis import (
        FXLN_SCALE,
        fxln_int,
        with_fxln,
    )

    m = 1 << int(p)
    w = 60 - int(p)
    alpha_q = hll_alpha_q20(m)
    gcols = list(group_cols)
    merged = regs.groupBy(*gcols, "j").agg(F.max("M").alias("M"))
    agg = merged.groupBy(*gcols).agg(
        F.count("*").alias("_nregs"),
        F.sum(F.expr(f"cast(1 as bigint) << ({w + 1} - M)"))
        .cast("bigint")
        .alias("_spresent"),
    )
    staged = (
        agg.withColumn(
            "_s",
            F.expr(
                f"_spresent + ({m} - _nregs) * (cast(1 as bigint) << {w + 1})"
            ),
        )
        .withColumn("_v", F.expr(f"{m} - _nregs"))
        .withColumn(
            "_raw",
            F.expr(
                f"cast((cast({alpha_q} as decimal(38,0)) * {m} * {m}"
                f" * (cast(1 as bigint) << {w + 1})) div _s"
                f" div {1 << 20} as bigint)"
            ),
        )
    )
    lnm = fxln_int(m)
    lined = with_fxln(staged, "greatest(_v, 1)", "_lv").withColumn(
        "_lin", F.expr(f"({m} * ({lnm} - _lvln)) div {FXLN_SCALE}")
    )
    return lined.select(
        *gcols,
        F.when(
            (F.col("_v") > 0) & (F.col("_raw") <= F.lit(5 * m // 2)),
            F.col("_lin"),
        )
        .otherwise(F.col("_raw"))
        .cast("bigint")
        .alias("distinct_est"),
    )


def hll_distinct_audit(
    df: DataFrame,
    *,
    text: str = "text",
    strata: str = "source",
    p: int = HLL_P_DEFAULT,
) -> DataFrame:
    """Exact-vs-sketch distinct-token audit per stratum — the
    datasheet's "unique tokens per source" at sketch cost: tokenize
    once (checkpointed), build per-source registers, estimate, join
    the exact distinct count, report signed error ppm.

    Returns (source, distinct_est, exact_distinct, err_ppm)."""
    # No checkpoint, and the estimate/exact join is pinned to
    # sort-merge: each side then runs the corpus tokenize+explode as
    # its own normal stage. A checkpoint of the exploded token stream
    # dominated the audit at the 512x probe (it writes corpus x tokens
    # rows to re-save one scan), and WITHOUT the hint the planner may
    # broadcast the small post-agg estimate side — whose build would
    # execute a corpus pass inside the spark.sql.broadcastTimeout
    # deadline (the kmeans-centroid hazard class, clustering.py). The
    # merge join shuffles |sources| rows per side — nothing.
    base = df.select(
        F.col(strata).alias("source"),
        F.explode(hll_token_array(F.col(text))).alias("token"),
    )
    est = hll_estimate(
        hll_registers(base, item="token", group_cols=("source",), p=p),
        group_cols=("source",),
        p=p,
    )
    exact = base.groupBy("source").agg(
        F.countDistinct("token").cast("bigint").alias("exact_distinct")
    )
    return est.hint("merge").join(exact, "source").select(
        "source",
        "distinct_est",
        "exact_distinct",
        F.expr(
            "(distinct_est - exact_distinct) * 1000000 div exact_distinct"
        )
        .cast("bigint")
        .alias("err_ppm"),
    )
