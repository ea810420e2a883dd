"""Deterministic corpus sampling, stratified mixing, and sequence
packing — the dataset-assembly stage of a training-data pipeline.

Beyond-reference surface. Everything is engine-portable (md5-derived
uniforms, integer token arithmetic) so DuckDB oracles hash-check the
exact row sets, and everything avoids the two classic scale traps:

- sampling/mixing is MAP-ONLY — a per-row hash comparison, no shuffle,
  no count pass, fully push-down-friendly;
- sequence packing needs a global running token count, which the
  naive formulation writes as a single-partition window
  (``Window.orderBy(...)`` with no partition — the canonical Spark
  scale killer). Here it is the textbook distributed prefix sum:
  per-block partial sums (tiny aggregate) → broadcast block offsets →
  within-block cumulative window. Identical result, every stage
  parallel.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# 60-bit hash → uniform in [0, 1). Portable: DuckDB replays as
# cast(('0x' || substr(md5(...), 1, 15)) as bigint) / 2^60.
_HASH_SPACE = float(2**60)


def hash_uniform(key: Column, seed: str = "") -> Column:
    """Deterministic uniform-[0,1) draw from a row key: md5 of
    key||seed, top 60 bits. Same document always draws the same value
    — samples are reproducible, append-stable, and engine-portable."""
    h = F.conv(
        F.substring(F.md5(F.concat(key.cast("string"), F.lit(seed))), 1, 15), 16, 10
    ).cast("bigint")
    return h / F.lit(_HASH_SPACE)


def hash_sample(
    df: DataFrame,
    fraction: float,
    *,
    key_col: str = "doc_id",
    seed: str = "",
) -> DataFrame:
    """Keep each row iff its hash-uniform draw < ``fraction``.
    Map-only; unlike ``DataFrame.sample`` the result is a pure
    function of (key, seed) — stable across runs, partitionings, and
    engines."""
    return df.filter(hash_uniform(F.col(key_col), seed) < F.lit(fraction))


def stratified_sample(
    df: DataFrame,
    fractions: dict[str, float],
    *,
    strata_col: str = "source",
    key_col: str = "doc_id",
    default_fraction: float = 0.0,
    seed: str = "",
) -> DataFrame:
    """Per-stratum hash sampling — the source-mixing primitive (e.g.
    keep 100% of books, 10% of web). ``fractions`` maps stratum value →
    keep fraction; unlisted strata get ``default_fraction``. Map-only:
    the per-stratum threshold is a CASE expression, not a join."""
    thresh = F.lit(float(default_fraction))
    for value, frac in sorted(fractions.items()):
        thresh = F.when(
            F.col(strata_col) == value, F.lit(float(frac))
        ).otherwise(thresh)
    return df.filter(hash_uniform(F.col(key_col), seed) < thresh)


def temperature_mix(
    df: DataFrame,
    target_docs: int,
    *,
    alpha: float = 0.7,
    strata_col: str = "source",
    key_col: str = "doc_id",
    seed: str = "",
) -> DataFrame:
    """Temperature-scaled source mixing (the T5 / XLM-R / Pile
    convention): source i with n_i docs gets sampling weight
    q_i ∝ n_i^alpha, and the batch draws ``target_docs`` docs in those
    proportions — ``alpha=1`` is proportional sampling, ``alpha→0``
    equal share per source (upweights low-resource sources). Keep
    fractions f_i = min(1, target·q_i/n_i) are quantized to a 1e-6
    grid — coarse enough that a 1-ulp cross-engine libm difference in
    ``n**alpha`` can't flip the floor (the same discipline that fixed
    the perplexity-bucket driver red; 1e-9 puts grid points ~1000×
    closer to the pow/div roundoff) — and applied as the deterministic
    per-stratum hash filter of :func:`stratified_sample` —
    reproducible and append-stable.

    Rows with a NULL ``strata_col`` are unlabeled: they are excluded
    from the weight computation and from the output (a NULL stratum
    can never equi-match a CASE arm, and letting it inflate the
    normalizer would skew every real source's share).

    Scale shape: ONE tiny groupBy(source) count (rows = number of
    sources, tens), fractions computed driver-side from it, then the
    map-only stratified filter. The ``collect`` is bounded by the
    source count, same pattern as the k-means centroid fetch.
    """
    import math

    if target_docs <= 0:
        raise ValueError(f"target_docs must be positive, got {target_docs}")
    counts = {
        r[0]: r[1]
        for r in df.groupBy(strata_col).agg(F.count("*").alias("n")).collect()
        if r[0] is not None
    }
    if not counts:
        return stratified_sample(
            df, {}, strata_col=strata_col, key_col=key_col,
            default_fraction=0.0, seed=seed,
        )
    z = sum(n ** alpha for n in counts.values())
    fractions = {}
    for s, n in counts.items():
        f = min(1.0, target_docs * ((n ** alpha) / z) / n)
        fractions[s] = math.floor(f * 1e6 + 0.5) / 1e6
    return stratified_sample(
        df, fractions, strata_col=strata_col, key_col=key_col,
        default_fraction=0.0, seed=seed,
    )


def _global_token_offsets(
    df: DataFrame,
    *,
    text: str,
    doc_id: str,
    block_size: int,
    op_name: str,
) -> DataFrame:
    """Shared distributed prefix sum for token-stream operators
    (packing, shard assignment): per-block totals (block = doc_id div
    ``block_size``; ONE small aggregate), exclusive block offsets via a
    window over the tiny per-block table, broadcast-joined back and
    added to the within-block cumulative window. No stage sees a
    single-partition global window. Returns (doc, _blk, _n, _boff,
    _gstart).

    NULL text coalesces to '' BEFORE the split: split of NULL would
    make F.size return -1, and a -1 in a block total silently shifts
    every later document's global offset. split('') yields [''], so
    empties are filtered: a whitespace-only document contributes 0
    tokens, not a phantom 1.
    """
    id_type = dict(df.dtypes).get(doc_id, "")
    if id_type not in ("tinyint", "smallint", "int", "bigint", "long"):
        # block = doc_id div block_size needs numeric ids; a string id
        # would null the division and the block join would silently
        # return an EMPTY result
        raise ValueError(
            f"{op_name} needs a numeric, densely-ordered id column; "
            f"{doc_id!r} is {id_type or 'missing'} — derive an ordinal first"
        )
    ntok = F.size(
        F.filter(
            F.split(F.trim(F.coalesce(F.col(text), F.lit(""))), "\\s+"),
            lambda x: x != F.lit(""),
        )
    )
    base = df.select(
        F.col(doc_id).alias("doc"),
        (F.col(doc_id) / block_size).cast("bigint").alias("_blk"),
        ntok.cast("bigint").alias("_n"),
    )
    blocks = base.groupBy("_blk").agg(F.sum("_n").alias("_bn"))
    wb = Window.orderBy("_blk").rowsBetween(Window.unboundedPreceding, -1)
    offsets = blocks.withColumn(
        "_boff", F.coalesce(F.sum("_bn").over(wb), F.lit(0))
    )
    wd = (
        Window.partitionBy("_blk")
        .orderBy("doc")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return base.join(
        F.broadcast(offsets.select("_blk", "_boff")), "_blk"
    ).withColumn(
        "_gstart", F.col("_boff") + F.coalesce(F.sum("_n").over(wd), F.lit(0))
    )


def pack_sequences(
    df: DataFrame,
    max_tokens: int,
    *,
    text: str = "text",
    doc_id: str = "doc_id",
    block_size: int = 1024,
) -> DataFrame:
    """GPT-style sequence packing: concatenate all documents in
    ``doc_id`` order into one token stream and cut it every
    ``max_tokens`` tokens, splitting documents across sequence
    boundaries. Returns one row per (document × overlapping sequence):

        (doc_id, seq_id, doc_token_start, doc_token_end, seq_token_start)

    where the document contributes tokens [doc_token_start,
    doc_token_end) (0-based within the document) starting at offset
    ``seq_token_start`` inside sequence ``seq_id``.

    The global running token offset is computed as a distributed
    prefix sum: (1) per-block token totals (block = doc_id div
    ``block_size``; ONE small aggregate), (2) exclusive block offsets
    via a window over the tiny per-block table, (3) broadcast-joined
    back and added to the within-block cumulative window. No stage
    sees a single-partition global window.
    """
    placed = _global_token_offsets(
        df, text=text, doc_id=doc_id, block_size=block_size,
        op_name="pack_sequences",
    ).withColumn("_gend", F.col("_gstart") + F.col("_n")).filter(
        F.col("_n") > 0
    )
    first_seq = F.floor(F.col("_gstart") / max_tokens)
    last_seq = F.floor((F.col("_gend") - 1) / max_tokens)
    out = placed.select(
        "doc",
        "_gstart",
        "_gend",
        F.explode(F.sequence(first_seq, last_seq)).alias("seq_id"),
    )
    seq_lo = F.col("seq_id") * max_tokens
    seq_hi = seq_lo + max_tokens
    return out.select(
        F.col("doc").alias(doc_id),
        "seq_id",
        (F.greatest(seq_lo, F.col("_gstart")) - F.col("_gstart")).alias(
            "doc_token_start"
        ),
        (F.least(seq_hi, F.col("_gend")) - F.col("_gstart")).alias("doc_token_end"),
        (F.greatest(seq_lo, F.col("_gstart")) - seq_lo).alias("seq_token_start"),
    )


def assign_token_shards(
    df: DataFrame,
    tokens_per_shard: int,
    *,
    text: str = "text",
    doc_id: str = "doc_id",
    block_size: int = 1024,
    start_offset: int = 0,
) -> DataFrame:
    """Token-balanced shard assignment (the webdataset/output-file
    shape): concatenate all documents in ``doc_id`` order and start a
    new shard every ``tokens_per_shard`` tokens. Returns (doc_id,
    n_tokens, shard_id); a document belongs to the shard its global
    token offset STARTS in, so documents are never split and each
    shard holds ~tokens_per_shard tokens (overshooting by at most one
    document).

    Same distributed prefix sum as :func:`pack_sequences` (per-block
    totals → tiny block-offset window → broadcast join back): no
    single-partition global window ever sees the corpus. Zero-token
    and NULL-text documents keep their assignment (a shard writer must
    not silently drop rows); they simply add no tokens.

    ``start_offset`` shifts the global token counter — the incremental
    / streaming continuation hook: a micro-batch writer passes the
    token total already written so shard boundaries continue across
    batches as if the stream were one corpus
    (streaming.pipeline.stream_to_token_shards).
    """
    return _global_token_offsets(
        df, text=text, doc_id=doc_id, block_size=block_size,
        op_name="assign_token_shards",
    ).select(
        F.col("doc").alias(doc_id),
        F.col("_n").alias("n_tokens"),
        F.floor(
            (F.col("_gstart") + F.lit(int(start_offset)))
            / int(tokens_per_shard)
        )
        .cast("bigint")
        .alias("shard_id"),
    )


def interleave_by_weight(
    df: DataFrame,
    weights: dict,
    *,
    strata_col: str = "source",
    key_col: str = "doc_id",
    shuffle_seed: str | None = None,
) -> DataFrame:
    """Deterministic weighted source interleave — the data-loader EMIT
    ORDER for a mixture schedule: source s with integer weight w_s
    appears w_s times per Σw window of the global order, spread evenly
    (the smooth round-robin a training run wants so no source arrives
    in bursts). Returns the input keys plus ``emit_order`` (a dense
    0-based BIGINT rank).

    Classic low-discrepancy interleave: the k-th document of source s
    (1-based, in ``key_col`` order) gets virtual time
    (2k − 1) / (2·w_s); the global order sorts by virtual time. All
    integer in-engine: the time is quantized to ``(2k − 1)·2^20 div
    w_s`` (ties broken by source, then key), so Spark and a SQL replay
    produce the identical permutation — no float comparison anywhere.

    Sources absent from ``weights`` (and NULL strata) are EXCLUDED —
    the schedule is exactly the caller's mixture. Weights must be
    positive integers (ratios like 3:1 — scale rationals up).

    ``shuffle_seed`` (optional) reshuffles WITHIN each source by a
    deterministic md5 draw while keeping the weighted schedule: the
    per-source rank k orders by md5(key||':'||seed) instead of key —
    the per-epoch "shuffle within source, preserve the mixture" a
    training loader wants. Same seed = same permutation.

    Scale shape: one rank window per source partition (the per-source
    rank), then the dense global rank via the block-prefix-sum idiom
    shared with ``pack_sequences``/``assign_token_shards`` — per-block
    counts (block = virtual time div 2^30, ~1024·Σw rows per block), a
    tiny cumulative window over the block table, broadcast back, and a
    per-BLOCK row_number. No single-partition window ever sees the
    corpus.
    """
    if not weights:
        raise ValueError("interleave_by_weight needs a non-empty weights dict")
    for s, w in weights.items():
        if int(w) != w or int(w) <= 0:
            raise ValueError(
                f"weights must be positive integers, got {w!r} for {s!r}"
            )
    wmap = F.create_map(
        *[F.lit(x) for kv in weights.items() for x in (kv[0], int(kv[1]))]
    )
    ranked = (
        df.filter(F.col(strata_col).isin(*[str(s) for s in weights]))
        .withColumn(
            "_ko",
            F.md5(
                F.concat(
                    F.col(key_col).cast("string"),
                    F.lit(":" + str(shuffle_seed)),
                )
            )
            if shuffle_seed is not None
            else F.col(key_col),
        )
        .withColumn(
            "_k",
            F.row_number().over(
                Window.partitionBy(strata_col).orderBy("_ko", key_col)
            ).cast("bigint"),
        )
        .withColumn("_w", wmap[F.col(strata_col)].cast("bigint"))
        .withColumn("_vt", F.expr("((2 * _k - 1) * 1048576) div _w"))
        .withColumn("_blk", F.expr("_vt div 1073741824"))
    )
    bcounts = ranked.groupBy("_blk").agg(F.count("*").alias("_bn"))
    wb = Window.orderBy("_blk").rowsBetween(Window.unboundedPreceding, -1)
    offsets = bcounts.withColumn(
        "_boff", F.coalesce(F.sum("_bn").over(wb), F.lit(0))
    )
    wd = (
        Window.partitionBy("_blk")
        .orderBy(F.col("_vt"), F.col(strata_col), F.col("_k"))
    )
    return (
        ranked.join(F.broadcast(offsets.select("_blk", "_boff")), "_blk")
        .withColumn(
            "emit_order",
            (F.col("_boff") + F.row_number().over(wd) - 1).cast("bigint"),
        )
        .drop("_k", "_ko", "_w", "_vt", "_blk", "_boff")
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    *,
    weight_col: str,
    key_col: str = "doc_id",
    seed: str = "ws-v1",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis-Spirakis 2006):
    each row draws key = u^(1/w) from its deterministic md5-uniform u
    and the k largest keys win — inclusion probability proportional to
    weight, no sequential pass, no rejection loop. The standard
    quality-weighted corpus-mixing primitive (weight = quality score,
    token count, source priority...).

    Scale shape: map-only key computation, then ONE top-k (the same
    rank-truncation any engine runs as a partial top-k per partition +
    merge). Deterministic: u is md5(key||seed), ln on identical doubles
    in both engines, ties broken by id.

    Rows with weight <= 0 never win (key -infinity semantics via
    filter), and a u == 0 draw (p = 2^-60 per row) is filtered too:
    Spark's ln(0) is NULL (sorts first asc) while SQL engines give
    -inf (sorts last desc) — dropping the row keeps the replay
    bit-identical in both engines.
    """
    u = hash_uniform(F.col(key_col), seed)
    # exponential-race form: E = -ln(u)/w ~ Exp(weight); the k SMALLEST
    # E win — the monotone transform of 'k largest u^(1/w)' that avoids
    # pow()'s cross-engine corner cases
    key = -F.log(u) / F.col(weight_col).cast("double")
    # orderBy().limit() plans as TakeOrderedAndProject — per-partition
    # partial top-k merged on the driver — where a global row_number
    # window would drag the whole corpus into ONE partition
    return (
        df.filter((F.col(weight_col) > 0) & (u > F.lit(0.0)))
        .withColumn("_wsk", key)
        .orderBy(F.col("_wsk").asc(), F.col(key_col).asc())
        .limit(k)
        .withColumn("_ws_key", F.round(F.col("_wsk"), 9))
        .drop("_wsk")
    )


def select_token_budget(
    df: DataFrame,
    budget: int,
    *,
    strata: str = "source",
    order_col: str = "quality_q",
    token_col: str = "ntok",
    doc_id: str = "doc_id",
) -> DataFrame:
    """Greedy token-budget data selection: within each stratum, rank
    documents best-first (``order_col`` DESC, ``doc_id`` ASC tie-break)
    and keep a document iff the inclusive running token total through
    it is <= ``budget`` — "spend at most N tokens per source, on the
    best documents". The data-mixture primitive behind budgeted corpus
    assembly (cf. survey-of-data-selection practice: quality-ranked
    greedy fill).

    Scale shape: the naive form is one window per stratum — a single
    partition per source, the canonical skew trap when one source is
    half the corpus. Here the running total is decomposed on the
    (strata, order) LEVEL table: per-level token sums (small aggregate),
    exclusive level offsets via a window over that tiny table, then a
    within-level cumulative window partitioned by (strata, order) —
    the same key the level join uses, so the two stages share one
    partitioning and no stage sees a whole stratum in one task.

    ``order_col`` and ``token_col`` must be integers (see
    ``text_analysis.with_quality_q``) — selection boundaries stay
    bit-exact cross-engine. Emits the kept rows plus ``cum_tokens``.
    ``strata=None`` spends ONE global budget over the whole corpus
    (the level decomposition then carries the entire scale burden —
    exactly why the naive global window was never an option).
    """
    d = df
    if strata is None:
        strata = "_one"
        d = d.withColumn("_one", F.lit(1))
        df_cols = df.columns
    else:
        df_cols = df.columns
    # d feeds TWO plan branches (the level aggregate and the join probe
    # side); without a lineage cut each branch re-executes the caller's
    # upstream — for the registered budget queries that is the
    # regex-heavy quality scan over the whole corpus, twice (r13 plan
    # dump: two parquet scans). The checkpoint is the narrow selection
    # base (id, stratum, order, tokens), tiny next to the corpus.
    d = d.localCheckpoint(eager=False)
    lv = d.groupBy(strata, order_col).agg(
        F.sum(F.col(token_col).cast("bigint")).alias("_lvl")
    )
    wlv = (
        Window.partitionBy(strata)
        .orderBy(F.col(order_col).desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = lv.select(
        strata,
        order_col,
        F.coalesce(F.sum("_lvl").over(wlv), F.lit(0).cast("bigint")).alias(
            "_prior"
        ),
    )
    wd = (
        Window.partitionBy(strata, order_col)
        .orderBy(doc_id)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    # plain equi-join, NOT a forced broadcast: with a fine-grained
    # order key the level table is #distinct(strata, order) rows —
    # small for bucketed keys (planner broadcasts it on its own) but
    # potentially huge for quality_q's 1e-6 granularity at corpus
    # scale. The join key equals the window's partitioning key, so the
    # shuffle path shares ONE exchange with the cumsum below.
    j = d.join(off, [strata, order_col])
    cum = (
        F.col("_prior") + F.sum(F.col(token_col).cast("bigint")).over(wd)
    ).alias("cum_tokens")
    return (
        j.select(*df_cols, cum, F.col("_prior"))
        .filter(F.col("cum_tokens") <= F.lit(int(budget)))
        .drop("_prior")
    )


def quality_cutoff(
    df: DataFrame,
    keep_num: int,
    keep_den: int,
    *,
    strata: str = "source",
    order_col: str = "quality_q",
    doc_id: str = "doc_id",
) -> DataFrame:
    """Adaptive per-stratum quality gate: keep the top
    ``keep_num/keep_den`` fraction of each stratum's documents by
    ``order_col`` (DESC, ``doc_id`` ASC tie-break) — thresholds adapt
    to each source's own quality distribution instead of one global
    constant. The kept count is the exact integer floor
    ``(n * keep_num) div keep_den``; with an integer ``order_col``
    the boundary can't flip cross-engine.

    Same two-level decomposition as :func:`select_token_budget`
    (level counts + within-level row_number), sharing the
    (strata, order) partitioning. Emits kept rows plus ``q_rank``
    (1-based, best first). ``strata=None`` keeps the top fraction of
    the WHOLE corpus.
    """
    if keep_den <= 0 or keep_num < 0:
        raise ValueError("keep_num/keep_den must be a nonneg fraction")
    d = df
    df_cols = df.columns
    if strata is None:
        strata = "_one"
        d = d.withColumn("_one", F.lit(1))
    # same two-consumer lineage cut as select_token_budget: the level
    # aggregate and the join probe otherwise each re-run the caller's
    # upstream (the quality scan) over the whole corpus
    d = d.localCheckpoint(eager=False)
    lv = d.groupBy(strata, order_col).agg(F.count("*").alias("_lc"))
    wlv = (
        Window.partitionBy(strata)
        .orderBy(F.col(order_col).desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wall = Window.partitionBy(strata)
    off = lv.select(
        strata,
        order_col,
        F.coalesce(F.sum("_lc").over(wlv), F.lit(0).cast("bigint")).alias(
            "_pc"
        ),
        F.sum("_lc").over(wall).cast("bigint").alias("_nc"),
    )
    wd = Window.partitionBy(strata, order_col).orderBy(doc_id)
    # plain equi-join (see select_token_budget): level-table size
    # scales with key granularity; the join key = window partitioning
    # key, so the non-broadcast path shares one exchange
    j = d.join(off, [strata, order_col])
    rank = (F.col("_pc") + F.row_number().over(wd)).alias("q_rank")
    keep_k = F.expr(f"(_nc * {int(keep_num)}L) div {int(keep_den)}L")
    return (
        j.select(*df_cols, rank, keep_k.alias("_kk"))
        .filter(F.col("q_rank") <= F.col("_kk"))
        .drop("_kk")
    )


def corpus_shuffle(
    df: DataFrame,
    *,
    seed: str = "shuffle-v1",
    doc_id: str = "doc_id",
) -> DataFrame:
    """Deterministic global training-order shuffle with an EXACT rank:
    every document gets ``shuffle_rank`` = its position in the corpus
    ordered by md5(doc_id||':'||seed) — reproducible across runs,
    engines, and partitionings (unlike ``df.orderBy(rand())``), so a
    training job can resume mid-epoch and a re-run reads the same
    order. Different seed per epoch = a fresh permutation.

    Rows with a NULL ``doc_id`` are excluded up front (a NULL id has
    no identity to permute; silently NULLed hash keys would otherwise
    drop them at the bucket join, which LOOKS the same but hides the
    data problem — the explicit filter makes the contract visible).

    The rank is global, but no global window runs: documents bucket by
    the key's first hex byte (256 buckets, uniform by construction),
    bucket counts make a 256-row offset table (broadcast), and
    row_number within each bucket finishes the rank — the distributed
    prefix sum again, keyed on the hash prefix. Ordering by (bucket,
    key) equals ordering by key because the bucket IS the key's prefix.
    """
    key = F.md5(
        F.concat(F.col(doc_id).cast("string"), F.lit(":" + str(seed)))
    )
    d = df.filter(F.col(doc_id).isNotNull()).withColumn("_skey", key).withColumn(
        "_sb", F.conv(F.substring("_skey", 1, 2), 16, 10).cast("bigint")
    )
    counts = d.groupBy("_sb").agg(F.count("*").alias("_c"))
    wb = Window.orderBy("_sb").rowsBetween(Window.unboundedPreceding, -1)
    offs = counts.select(
        "_sb",
        F.coalesce(F.sum("_c").over(wb), F.lit(0).cast("bigint")).alias(
            "_off"
        ),
    )
    wr = Window.partitionBy("_sb").orderBy("_skey", doc_id)
    return (
        d.join(F.broadcast(offs), "_sb")
        .select(
            *df.columns,
            F.col("_skey").alias("shuffle_key"),
            (F.col("_off") + F.row_number().over(wr) - 1)
            .cast("bigint")
            .alias("shuffle_rank"),
        )
    )


def curriculum_order(
    df: DataFrame,
    band: str = "band",
    *,
    seed: str = "curriculum-v1",
    doc_id: str = "doc_id",
) -> DataFrame:
    """Deterministic curriculum training order: the exact global rank
    ordered by ``(band ASC, md5 shuffle key)`` — every band's
    documents appear as one contiguous, internally-shuffled block, so
    an annealing schedule (general data first, highest-quality band
    last) or an easy→hard curriculum is just ``ORDER BY
    curriculum_rank`` on the loader side, resumable mid-epoch and
    reproducible across runs/engines/partitionings. The caller
    supplies the INTEGER ``band`` column (e.g. a quality-key bucket
    or a difficulty score); a fresh ``seed`` per epoch re-shuffles
    within bands without moving the band boundaries.

    Rows with a NULL ``doc_id`` or NULL ``band`` are excluded up
    front (no identity to permute / no position in the schedule —
    same visible-contract choice as :func:`corpus_shuffle`).

    Scale shape: :func:`corpus_shuffle`'s distributed prefix sum with
    the band prepended to the bucket key — documents bucket by
    ``(band, first hash byte)``, the |bands|·256-row offset table
    broadcasts, and a within-bucket row_number finishes the rank. No
    global window ever touches the corpus; ordering by (band, bucket,
    key) equals ordering by (band, key) because the bucket IS the
    key's prefix.
    """
    key = F.md5(
        F.concat(F.col(doc_id).cast("string"), F.lit(":" + str(seed)))
    )
    d = (
        df.filter(F.col(doc_id).isNotNull() & F.col(band).isNotNull())
        .withColumn("_ckey", key)
        .withColumn(
            "_cb", F.conv(F.substring("_ckey", 1, 2), 16, 10).cast("bigint")
        )
    )
    counts = d.groupBy(band, "_cb").agg(F.count("*").alias("_c"))
    wb = Window.orderBy(band, "_cb").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = counts.select(
        band,
        "_cb",
        F.coalesce(F.sum("_c").over(wb), F.lit(0).cast("bigint")).alias(
            "_off"
        ),
    )
    wr = Window.partitionBy(band, "_cb").orderBy("_ckey", doc_id)
    return d.join(F.broadcast(offs), [band, "_cb"]).select(
        *df.columns,
        (F.col("_off") + F.row_number().over(wr) - 1)
        .cast("bigint")
        .alias("curriculum_rank"),
    )


def mixture_reweight(
    df: DataFrame,
    *,
    score_col: str,
    token_col: str,
    strata_col: str = "source",
    step_ppm: int = 1_000_000,
) -> DataFrame:
    """Domain mixture reweighting, the (linearized) DoReMi move (Xie et
    al. 2023, "DoReMi: Optimizing Data Mixtures Speeds Up Language Model
    Pretraining"): domains whose documents score WORSE than the corpus
    average under a reference model's loss get UPWEIGHTED relative to
    their token share — one exponentiated-gradient ascent step on the
    domain weights, linearized so the whole update is exact integer
    arithmetic (repo-wide cross-engine determinism discipline; the
    exact-exp variant would need a libm call per domain).

    Input: one row per document with an INTEGER ``score_col`` (higher =
    harder/lossier; e.g. ``round(cross_entropy * 1e6)`` — the 1e-6 grid
    :func:`~unstructured_spark.operators.text_analysis.bigram_cross_entropy`
    already quantizes to), an integer ``token_col``, and the domain
    column. Output: one row per domain —

        (strata, docs, tokens, mean_score_q, base_ppm, mult_ppm,
         weight_ppm)

    where ``base_ppm`` is the domain's token share, ``mult_ppm`` is
    ``1e6 · (1 + step · (mean_d − mean_corpus)/mean_corpus)`` clamped
    at 0, and ``weight_ppm`` is the renormalized product — the new
    sampling mixture. Every division has a NON-NEGATIVE numerator, so
    Spark's truncating ``div`` and DuckDB's flooring ``//`` agree.

    Scale shape: ONE groupBy(strata) over the corpus (map-side
    partials); every subsequent step is a window/select over the
    |domains|-row table. Corpus-level means come from the domain
    partials (exact integer sums) — the corpus is read once.
    """
    d = df.groupBy(F.col(strata_col).alias("strata")).agg(
        F.count("*").cast("bigint").alias("docs"),
        F.sum(F.col(token_col).cast("bigint")).cast("bigint").alias("tokens"),
        F.sum(F.col(score_col).cast("bigint")).cast("bigint").alias("_ssum"),
    )
    return mixture_from_partials(
        d, strata_col=strata_col, step_ppm=step_ppm
    )


def mixture_from_partials(
    partials: DataFrame,
    *,
    strata_col: str = "source",
    step_ppm: int = 1_000_000,
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """The :func:`mixture_reweight` ppm weight chain over a
    pre-aggregated domain-partials frame shaped ``(strata, docs,
    tokens, _ssum)`` [+ ``group_cols``] — the shared finalizer for the
    batch operator and the streaming monitor: a watermarked windowed
    aggregation emits exactly these partials per event-time window
    (:func:`~unstructured_spark.streaming.pipeline.mixture_partials_stream`),
    and finalizing a window through THIS function yields bit-identical
    weights to running the batch operator on the same rows — exact
    integer sums compose across micro-batches.

    ``group_cols`` scopes the chain (corpus means, shares, the
    renormalization) to each group — e.g. one mixture per event-time
    window. Empty = one global mixture.
    """
    step = int(step_ppm)
    gcols = list(group_cols)
    wall = Window.partitionBy(*gcols).orderBy("strata").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    enriched = (
        partials.withColumn("_gdocs", F.sum("docs").over(wall))
        .withColumn("_gsum", F.sum("_ssum").over(wall))
        .withColumn("_gtok", F.sum("tokens").over(wall))
        # HALF_UP integer means on the score grid
        .withColumn(
            "mean_score_q", F.expr("(2 * _ssum + docs) div (2 * docs)")
        )
        .withColumn(
            "_gmean", F.expr("(2 * _gsum + _gdocs) div (2 * _gdocs)")
        )
        # decimal(38,0) widening: tokens*1e6 overflows BIGINT once a
        # domain holds >~9.2e12 tokens (a realistic 100 TB corpus), and
        # ANSI mode would hard-error there. The oracle side computes in
        # DuckDB HUGEINT natively; decimal div yields the identical
        # integral quotient.
        .withColumn(
            "base_ppm",
            F.expr(
                "cast((cast(tokens as decimal(38,0)) * 1000000)"
                " div _gtok as bigint)"
            ),
        )
        # m = 1e6 * mean_d / mean_corpus (non-negative), then
        # mult = max(0, 1e6 - step + step*m/1e6) — algebraically
        # 1e6 + step*(m - 1e6)/1e6 without a negative numerator
        .withColumn(
            "_m", F.expr("(mean_score_q * 1000000) div greatest(_gmean, 1)")
        )
        # _m * step is staged through decimal(38,0) like base_ppm/_raw:
        # _m is a ratio on the ppm grid (up to ~2^61 for an extreme
        # mean_d/gmean), so the BIGINT product with step could cross
        # 2^63 and silently wrap under non-ANSI Spark while the DuckDB
        # oracle computes in HUGEINT. The decimal div yields the same
        # integral quotient, and the quotient is back in ppm range.
        .withColumn(
            "mult_ppm",
            F.expr(
                f"greatest(0, 1000000 - {step} + cast("
                f"(cast(_m as decimal(38,0)) * {step}) div 1000000"
                " as bigint))"
            ).cast("bigint"),
        )
        # _raw fits bigint for any bounded mult, but _raw*1e6 in the
        # final normalization can cross 2^63 when one domain's mean is
        # far above the corpus mean — stage both as decimal(38,0)
        .withColumn(
            "_raw",
            F.expr("cast(base_ppm as decimal(38,0)) * mult_ppm"),
        )
        .withColumn("_rawsum", F.sum("_raw").over(wall))
    )
    return enriched.select(
        *gcols,
        F.col("strata").alias(strata_col),
        "docs",
        "tokens",
        "mean_score_q",
        "base_ppm",
        "mult_ppm",
        F.expr(
            "cast((_raw * 1000000) div greatest(_rawsum, 1) as bigint)"
        ).alias("weight_ppm"),
    )
