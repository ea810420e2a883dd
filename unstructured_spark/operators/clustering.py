"""Distributed k-means clustering over embedding columns.

Beyond-reference surface: corpus organization for training-data
pipelines (topic bucketing, stratified mixing, dedup-within-cluster)
and the centroid source for IVF ANN (`similarity.ivf_topk` accepts any
seed set).

Scale shape (the classic distributed Lloyd layout):

- centroid state is a one-row broadcast DataFrame (k × dim integer
  sums as array<struct<cid, s, n>>, built by collect_list over the
  k-row centroid table) — NEVER collected to the driver, so the whole
  iterative run is one lazy plan with zero driver round-trips until
  the consumer's action (round 10; the r9 form collected per round);
- each iteration is one map-only assignment pass (argmin over k
  centroids inside whole-stage codegen) + one shuffle keyed by
  cluster id whose rows are k × (dim+1) partial sums after map-side
  combine — at 100 TB the shuffle payload is kilobytes;
- the quantized corpus is localCheckpoint-ed once so the iteration
  loop re-reads columnar checkpoint blocks instead of re-running the
  parquet scan + quantize expression tree every round (Spark MLlib
  caches its input for the same reason).

Engine-portable determinism (what makes a DuckDB oracle possible):
floating-point centroid means are order-dependent under distributed
summation, so vectors are quantized to integers (``floor(x·10⁶+0.5)``)
and centroid state is kept as EXACT integer component sums plus a
count — order-independent in any engine. Distances compare
``Σ (q_j·n_c − s_cj)²`` (the squared distance to the mean scaled by
n_c²). The inputs are exact integers but the fold itself runs in
IEEE-double (``(q_j·n − s_j)²`` can exceed 2⁵³ for ~10⁶-scale
quantized components, so the squares/sums are NOT exact); the oracle
replays the identical double arithmetic in the identical fixed index
order, which is what makes argmins and ties match engine-to-engine.
Clusters that lose every member simply disappear (both engines drop
them the same way).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

QUANT_SCALE = 1_000_000


def quantize_vec(vec: Column) -> Column:
    """Integer quantization of an embedding: floor(x·10⁶ + 0.5) per
    component. Exact and identical in Spark and DuckDB (the input
    doubles are identical, floor is IEEE-exact)."""
    return F.transform(
        vec, lambda x: F.floor(x.cast("double") * QUANT_SCALE + F.lit(0.5)).cast("bigint")
    )


def _assign(quant: DataFrame, cent_df: DataFrame) -> DataFrame:
    """Map-only argmin assignment: per vector, the centroid minimizing
    Σ (q_j·n − s_j)² (ties → smaller cid). One broadcast nested-loop
    join against the single-row centroid frame, then array ops."""
    scored = F.transform(
        F.col("_cents"),
        lambda c: F.struct(
            F.aggregate(
                F.zip_with(
                    F.col("q"),
                    c.getField("s"),
                    lambda qj, sj: F.pow(
                        (qj * c.getField("n") - sj).cast("double"), F.lit(2)
                    ),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("dist"),
            c.getField("cid").alias("cid"),
        ),
    )
    return (
        quant.crossJoin(F.broadcast(cent_df))
        .withColumn("_best", F.element_at(F.array_sort(scored), 1))
        .select("vec_id", "q", F.col("_best.cid").alias("cluster_id"))
    )


def kmeans_clusters(
    corpus: DataFrame,
    *,
    k: int = 8,
    iterations: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Lloyd k-means with deterministic init (the k lowest-id vectors)
    and a FIXED iteration count, so the whole run — init, every
    assignment, every centroid update — replays as a static SQL chain.

    Returns (vec_id, cluster_id, cluster_size) for the assignment
    after ``iterations`` update rounds.

    ``id_col`` must be numeric (ids order the deterministic init and
    key every join); string ids — e.g. the 32-hex element_id — would
    silently null out under the long cast, so they fail fast here.
    Map hex ids to ordinals (or ``xxhash64``) before clustering.
    """
    id_type = dict(corpus.dtypes).get(id_col, "")
    if id_type not in ("tinyint", "smallint", "int", "bigint", "long"):
        raise ValueError(
            f"kmeans_clusters needs a numeric id column; {id_col!r} is "
            f"{id_type or 'missing'} — derive an ordinal or hash id first"
        )
    quant = corpus.select(
        F.col(id_col).cast("long").alias("vec_id"),
        quantize_vec(F.col(vec_col)).alias("q"),
    ).localCheckpoint(eager=False)

    # COLLECT-FREE iteration: centroid state lives as a one-row
    # broadcast DataFrame (array<struct<cid, s, n>>) built by
    # collect_list over the k-row centroid table, never on the driver.
    # collect_list order is non-deterministic but irrelevant — the
    # argmin in _assign sorts by (dist, cid), an order-independent
    # reduction — and every sum is an exact integer, so hashes are
    # unchanged (bench: q_kmeans_clusters 2.48 -> ~1.4s same host).
    #
    # Each round's k-row centroid table is materialized with an EAGER
    # localCheckpoint before it feeds the next broadcast build. The
    # r10 fully-lazy form nested every full-corpus Lloyd pass inside a
    # BroadcastExchange build — bounded by spark.sql.broadcastTimeout
    # (300 s default), so at 100M-vector scale one slow pass would
    # abort the job — and re-executed all PRIOR passes recursively
    # (quadratic in `iterations`). With the eager k-row checkpoint,
    # each corpus pass runs exactly once as a normal job (no broadcast
    # deadline), and every broadcast build scans k checkpointed rows.
    def _cent_frame(cent_rows: DataFrame) -> DataFrame:
        return cent_rows.agg(
            F.collect_list(F.struct("cid", "s", "n")).alias("_cents")
        )

    cents = quant.orderBy("vec_id").limit(k).select(
        F.col("vec_id").alias("cid"),
        F.col("q").alias("s"),
        F.lit(1).cast("long").alias("n"),
    ).localCheckpoint(eager=True)
    for _ in range(iterations):
        assigned = _assign(quant, _cent_frame(cents))
        # centroid update as a NARROW (cluster_id, component) aggregate:
        # posexplode + sum shuffles k·dim partial rows after map-side
        # combine (kilobyte payload); the per-cid component array is
        # rebuilt in j order (array_sort over (j, s) structs), and n —
        # identical for every j of a cid — folds via min for
        # determinism. Empty clusters simply emit no row, exactly like
        # the old driver-side rebuild.
        upd = (
            assigned.select("cluster_id", F.posexplode("q").alias("j", "qj"))
            .groupBy("cluster_id", "j")
            .agg(F.sum("qj").alias("s"), F.count("*").alias("n"))
        )
        cents = upd.groupBy("cluster_id").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("j", "s"))),
                lambda x: x["s"],
            ).alias("s"),
            F.min("n").alias("n"),
        ).select(F.col("cluster_id").alias("cid"), "s", "n").localCheckpoint(
            eager=True
        )

    # checkpoint the FINAL assignment EAGERLY: the cluster_size branch
    # below broadcasts an aggregate over it, and with a lazy checkpoint
    # the broadcast build can win the materialization race and execute
    # the whole corpus assignment pass inside the BroadcastExchange's
    # spark.sql.broadcastTimeout deadline (the same hazard as the
    # per-iteration centroid builds above). Eager = one normal job,
    # then both branches read checkpoint blocks (2 longs per vector).
    final = (
        _assign(quant, _cent_frame(cents))
        .select("vec_id", "cluster_id")
        .localCheckpoint(eager=True)
    )
    # cluster_size via a broadcast join of the k-row count aggregate,
    # NOT a window: a window partitioned by cluster_id funnels the
    # whole corpus into k sort tasks (12.5M rows/task at 100M vectors,
    # k=8). The aggregate is map-side partial with k shuffled rows,
    # its broadcast build reads the SAME checkpoint as the main
    # branch, and — unlike the earlier collect-into-literal-map form —
    # it adds no extra driver action: the consumer's single action
    # materializes the checkpoint once and both branches reuse it.
    sizes = final.groupBy("cluster_id").agg(
        F.count("*").cast("bigint").alias("cluster_size")
    )
    return final.join(F.broadcast(sizes), "cluster_id").select(
        "vec_id", "cluster_id", "cluster_size"
    )


def semantic_dedup(
    corpus: DataFrame,
    *,
    k: int = 8,
    iterations: int = 2,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assignments: DataFrame | None = None,
    pair_salt: int = 16,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning
    at web-scale through semantic deduplication"): cluster embeddings
    with k-means, then within each cluster mark as semantic duplicates
    the vectors whose cosine similarity to a LOWER-id cluster member
    reaches ``threshold`` (deterministic min-id keep policy — the
    paper keeps one representative per intra-cluster near-dup group;
    min-id is the engine-portable tiebreak this repo uses everywhere).

    Scale shape: the O(n²) cosine search is BUCKETED BY CLUSTER — the
    pair join keys on cluster_id, so work is Σ|cluster|², never a
    corpus crossjoin, and grows k clusters at a time exactly like the
    paper's pipeline. Row norms are computed once per vector before
    the join; the join stage does only the dot product. Cosine is
    rounded to 6dp before the threshold compare (cross-engine-stable,
    same discipline as cosine_topk).

    ``pair_salt`` flattens per-cluster serialization: with only k
    distinct join keys a dominant cluster's |c|² dot products land on
    ONE task (and AQE, seeing only the tiny map-side bytes — 3 longs +
    one vector per row — coalesces the whole exchange to a single
    partition; the r9 bench measured this as 6.8 s of a 7.9 s query).
    The a-side carries ``a_id % S``; the b-side duplicates each row
    across all S salts; the join keys on (cluster_id, salt), so each
    (a, b) pair still meets exactly once but a cluster's pair space is
    split S ways. Both sides are repartitioned by NUM on the join keys
    — a user-specified exchange AQE will not re-coalesce. The b-side
    row duplication costs S× shuffle volume on vectors; for the
    CPU-bound pair sweep that trade is ~S× wall-clock (measured
    7.9 s → 0.9 s at sf0.1, identical hash).

    Returns (vec_id, cluster_id, cluster_size, is_duplicate).

    ``assignments`` short-circuits the Lloyd run with a precomputed
    clustering — any frame shaped (vec_id, cluster_id, cluster_size),
    e.g. a persisted ``kmeans_clusters`` output shared across several
    dedup sweeps at different thresholds.
    """
    from unstructured_spark.operators.similarity import dot, l2_norm

    # the assignment feeds three plan branches (pair-join a-side,
    # b-side, final output join); a lineage cut keeps the k-means
    # chain from re-executing per branch — the checkpoint is 3 longs
    # per vector, tiny next to the vectors themselves
    assign = (
        assignments.select("vec_id", "cluster_id", "cluster_size")
        if assignments is not None
        else kmeans_clusters(
            corpus, k=k, iterations=iterations, id_col=id_col, vec_col=vec_col
        )
    ).localCheckpoint(eager=False)
    vecs = corpus.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("nrm", l2_norm(F.col("v")))
    av = assign.select("vec_id", "cluster_id").join(vecs, "vec_id")
    nparts = int(
        corpus.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
    )
    salt = max(1, int(pair_salt))
    b = av.select(
        F.col("cluster_id"),
        F.explode(F.sequence(F.lit(0), F.lit(salt - 1))).alias("_salt"),
        F.col("vec_id").alias("b_id"),
        F.col("v").alias("bv"),
        F.col("nrm").alias("bn"),
    ).repartition(nparts, "cluster_id", "_salt")
    # the a-side is the b-side row whose salt equals the vector's own
    # (vec_id % S): a FILTER over the already-exploded, already-
    # shuffled b frame instead of a second repartition of the
    # unexploded vectors — the two join inputs then reference the SAME
    # exchange subtree and ReuseExchange collapses them, so the pair
    # join shuffles the vector payload ONCE (r13; was twice: n rows
    # a-side + n·S rows b-side). Row set identical by construction:
    # each vec_id appears exactly once on the a-side, at its own salt.
    a = b.filter(
        F.col("_salt") == F.pmod(F.col("b_id"), F.lit(salt)).cast("int")
    ).select(
        F.col("cluster_id"),
        F.col("_salt"),
        F.col("b_id").alias("a_id"),
        F.col("bv").alias("av"),
        F.col("bn").alias("an"),
    )
    cos = F.round(dot(F.col("av"), F.col("bv")) / (F.col("an") * F.col("bn")), 6)
    # inner join + distinct, NOT a left-semi carrying the cosine
    # predicate inside the join condition: a non-equi conjunct in the
    # semi form evaluates the full zip_with dot product inside the
    # SMJ's buffered inner loop and drops the pair stream out of
    # whole-stage codegen. The equi-join + post-filter keeps the dot
    # product in a codegen'd Filter over the joined stream; distinct()
    # costs one extra shuffle on a frame already reduced to the (rare)
    # dup ids.
    dups = (
        a.join(b, ["cluster_id", "_salt"])
        .where(F.col("a_id") < F.col("b_id"))
        .where(cos >= F.lit(float(threshold)))
        .select(F.col("b_id").alias("vec_id"))
        .distinct()
        .withColumn("is_duplicate", F.lit(True))
    )
    return (
        assign.join(dups, "vec_id", "left")
        .withColumn("is_duplicate", F.coalesce("is_duplicate", F.lit(False)))
    )


def cluster_balanced_sample(
    assignments: DataFrame,
    cap: int,
    *,
    cluster_col: str = "cluster_id",
    key_col: str = "vec_id",
    seed: str = "balance-v1",
) -> DataFrame:
    """Topic-balanced selection: keep at most ``cap`` rows per cluster,
    chosen by a deterministic md5 draw (so the within-cluster sample is
    uniform, reproducible, and engine-replayable — not head-of-cluster
    biased). The curation step after :func:`kmeans_clusters` /
    SemDeDup: caps over-represented topics instead of sampling the raw
    corpus where one dominant cluster keeps its dominance.

    Scale shape: ranks come from the hash-prefix prefix sum (compare
    ``sampling.corpus_shuffle``) — rows bucket by the draw's first hex
    char (16 sub-buckets per cluster), (cluster, bucket) counts make a
    16k-row offset table (broadcast), row_number finishes within
    (cluster, bucket) — so a dominant cluster is split 16 ways instead
    of landing in one window partition. Emits the kept rows plus
    ``bal_rank`` (1-based within cluster).
    """
    from pyspark.sql.window import Window

    key = F.md5(
        F.concat(F.col(key_col).cast("string"), F.lit(":" + str(seed)))
    )
    # NULL keys would silently vanish at the offset join — exclude
    # them explicitly so the contract is visible (same convention as
    # sampling.corpus_shuffle)
    d = assignments.filter(
        F.col(key_col).isNotNull()
    ).withColumn("_bkey", key).withColumn(
        "_bb", F.conv(F.substring("_bkey", 1, 1), 16, 10).cast("bigint")
    )
    counts = d.groupBy(cluster_col, "_bb").agg(F.count("*").alias("_c"))
    wb = (
        Window.partitionBy(cluster_col)
        .orderBy("_bb")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = counts.select(
        cluster_col,
        "_bb",
        F.coalesce(F.sum("_c").over(wb), F.lit(0).cast("bigint")).alias(
            "_off"
        ),
    )
    wr = Window.partitionBy(cluster_col, "_bb").orderBy("_bkey", key_col)
    return (
        d.join(F.broadcast(offs), [cluster_col, "_bb"])
        .select(
            *assignments.columns,
            (F.col("_off") + F.row_number().over(wr))
            .cast("bigint")
            .alias("bal_rank"),
        )
        .filter(F.col("bal_rank") <= F.lit(int(cap)))
    )
