"""As-of join — for each left row, the latest right row at-or-before
its timestamp per key (beyond-reference operator; the reference has no
temporal joins, SURVEY §2.10 notes only its relational implications).

Scale design: the naive formulation is a range join (left × right
filtered on ``r.ts <= l.ts``) whose output explodes quadratically per
key before aggregation. This implementation is the union-window form:

    union(left tagged 1, right tagged 0)
    → window last(right_payload, ignorenulls) over
      (partition by key order by ts, side rows unbounded preceding)
    → filter side = 1

ONE shuffle on the key, linear output, no explosion — the same plan
shape Flink/Kafka-Streams use for temporal joins. Ties (equal ts)
match the right row (side 0 sorts before side 1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    ts: str = "ts",
    direction: str = "backward",
    right_prefix: str = "asof_",
) -> DataFrame:
    """Left rows enriched with the nearest right row per ``on`` key.

    direction='backward' (default): latest right at-or-before left.ts;
    direction='forward': earliest right at-or-after left.ts.
    Right columns (except the key) come back ``right_prefix``-ed;
    unmatched left rows keep nulls.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")

    r_payload_cols = [c for c in right.columns if c != on]
    l_struct = F.struct(*[F.col(c) for c in left.columns]).alias("_l")
    r_struct = F.struct(*[F.col(c) for c in r_payload_cols]).alias("_r")

    l_tagged = left.select(
        F.col(on).alias("_k"),
        F.col(ts).alias("_ts"),
        F.lit(1).alias("_side"),
        l_struct,
    ).withColumn("_r", F.lit(None).cast(right.select(r_struct).schema["_r"].dataType))
    r_tagged = right.select(
        F.col(on).alias("_k"),
        F.col(ts).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(left.select(l_struct).schema["_l"].dataType).alias("_l"),
        r_struct,
    )
    unioned = l_tagged.unionByName(r_tagged)

    if direction == "backward":
        w = (
            Window.partitionBy("_k")
            .orderBy(F.col("_ts").asc(), F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = F.last("_r", ignorenulls=True).over(w)
    else:
        w = (
            Window.partitionBy("_k")
            .orderBy(F.col("_ts").desc(), F.col("_side").asc())
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        matched = F.last("_r", ignorenulls=True).over(w)

    out = (
        unioned.withColumn("_m", matched)
        .filter(F.col("_side") == 1)
        .select(
            *[F.col("_l")[c].alias(c) for c in left.columns],
            *[
                F.col("_m")[c].alias(f"{right_prefix}{c}")
                for c in r_payload_cols
            ],
        )
    )
    return out


def range_join_seconds(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    ts: str = "ts",
    window_seconds: int,
    right_prefix: str = "r_",
) -> DataFrame:
    """All (left, right) pairs within ``window_seconds`` per key —
    a bounded range join. Spark turns the between-predicate into a
    co-partitioned join on the key; banding by time bucket keeps the
    search bounded when keys are hot."""
    bucket = lambda c: F.floor(F.unix_timestamp(c) / window_seconds)  # noqa: E731
    l = left.withColumn("_b", bucket(F.col(ts)))
    r = right.withColumn(
        "_b0", bucket(F.col(ts))
    ).withColumn("_bs", F.array(F.col("_b0") - 1, F.col("_b0"), F.col("_b0") + 1))
    r = r.select(
        F.col(on), F.explode("_bs").alias("_b"),
        *[F.col(c).alias(f"{right_prefix}{c}") for c in right.columns if c != on],
    )
    # each left row carries one bucket and each right row three, so a
    # qualifying pair joins exactly once — no dedup needed
    joined = l.join(r, [on, "_b"]).filter(
        F.abs(
            F.unix_timestamp(F.col(ts))
            - F.unix_timestamp(F.col(f"{right_prefix}{ts}"))
        )
        <= window_seconds
    )
    return joined.drop("_b")
