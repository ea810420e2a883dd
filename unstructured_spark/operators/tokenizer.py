"""Distributed tokenizer-training primitives: word frequencies, BPE
merge learning (Sennrich et al. 2016, "Neural Machine Translation of
Rare Words with Subword Units"), BPE encoding, and vocabulary-coverage
curves.

These are beyond-reference training-data-pipeline operators (the
reference engine tokenizes for chunking but never TRAINS a tokenizer);
at pre-training scale the expensive step is the corpus -> word-frequency
shrink, and everything downstream is vocabulary-local.

Scale shape
-----------
- ``word_counts``: ONE shuffle (hash partial aggregation with map-side
  combine on the word). The output is vocabulary-sized - Zipf's law
  means even a 100 TB corpus lands in the 10^7-10^8 distinct-word range,
  orders of magnitude below the corpus.
- ``bpe_pair_counts``: explodes character positions of the VOCABULARY
  table, never the corpus; one further shuffle on the (a, b) pair key.
- ``bpe_learn_merges``: collects only the top ``max_words`` rows via
  TakeOrderedAndProject (no global sort) - the same driver-bounded
  pattern as k-means centroids. Merge iterations then run driver-side
  over the weighted word list; the corpus is never touched again. This
  mirrors how SentencePiece/HF-tokenizers train: frequency table first,
  merges on the table. Capping at ``max_words`` is standard (Zipf top-1M
  words carry ~99.9% of token mass) and makes driver memory O(max_words).
- ``bpe_encode``: map-only; the learned merge ranks are broadcast and
  applied per Arrow batch - composes with Structured Streaming.
- ``vocab_coverage``: one count shuffle, a scalar total via a broadcast
  one-row join, and a single-partition window over only the top-k rows
  (k-bounded by construction).

Determinism: counts are exact BIGINTs; every ordering ties back to
(count desc, token asc); coverage is integer parts-per-million
(truncating division) - no floats anywhere, so DuckDB oracles replay
bit-identically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "word_counts",
    "bpe_pair_counts",
    "bpe_learn_merges",
    "bpe_vocab",
    "corpus_alphabet",
    "bpe_encode",
    "encode_word",
    "fertility_by_stratum",
    "vocab_coverage",
]

END_OF_WORD = "</w>"


def _words(col: Column, lowercase: bool) -> Column:
    base = F.lower(col) if lowercase else col
    return F.filter(F.split(F.trim(base), "\\s+"), lambda w: w != "")


def word_counts(
    df: DataFrame, *, text: str = "text", lowercase: bool = True
) -> DataFrame:
    """Corpus -> (word, n) frequency table. The one corpus-wide shuffle
    in tokenizer training; everything after runs on this table."""
    return (
        df.select(F.explode(_words(F.col(text), lowercase)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def bpe_pair_counts(
    wc: DataFrame, *, marker: str = END_OF_WORD
) -> DataFrame:
    """Weighted adjacent-symbol-pair counts over a (word, n) frequency
    table - the first BPE iteration's statistics. Characters are the
    initial symbols; each word contributes its final character paired
    with the end-of-word ``marker`` (so merges can learn suffixes),
    weighted by the word's corpus frequency.

    Runs on the vocabulary table (already corpus-shrunk), so the
    position explode is cheap: sum(len(word)) rows, one pair shuffle.
    """
    return (
        wc.select(
            "word",
            "n",
            F.explode(F.sequence(F.lit(1), F.length("word"))).alias("i"),
        )
        .select(
            F.expr("substring(word, i, 1)").alias("a"),
            F.when(
                F.col("i") < F.length("word"),
                F.expr("substring(word, i + 1, 1)"),
            )
            .otherwise(F.lit(marker))
            .alias("b"),
            "n",
        )
        .groupBy("a", "b")
        .agg(F.sum("n").cast("bigint").alias("pair_count"))
    )


def _merge_step(words: dict, a: str, b: str) -> dict:
    ab = a + b
    out: dict = {}
    for syms, n in words.items():
        i, buf, last = 0, [], len(syms) - 1
        while i < len(syms):
            if i < last and syms[i] == a and syms[i + 1] == b:
                buf.append(ab)
                i += 2
            else:
                buf.append(syms[i])
                i += 1
        out[tuple(buf)] = out.get(tuple(buf), 0) + n
    return out


def _learn_merges_local(
    words: dict, num_merges: int, min_frequency: int
) -> tuple[list[tuple[str, str, int]], dict]:
    """The driver-side greedy loop on a {symbol-tuple: count} table.
    Returns (merges, final word table) — the final table is what the
    property tests replay encode_word against."""
    merges: list[tuple[str, str, int]] = []
    for _ in range(int(num_merges)):
        counts: dict = {}
        for syms, n in words.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                counts[p] = counts.get(p, 0) + n
        if not counts:
            break
        (a, b), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < int(min_frequency):
            break
        merges.append((a, b, cnt))
        words = _merge_step(words, a, b)
    return merges, words


def encode_word(
    word: str, ranks: dict, marker: str = END_OF_WORD
) -> list[str]:
    """Greedy lowest-rank-first BPE inference for one word — equivalent
    to replaying the merges in learned order, so a training word always
    reproduces the learner's final segmentation of it."""
    syms = list(word) + [marker]
    while len(syms) > 1:
        best_i, best_r = -1, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_r is None or r < best_r):
                best_i, best_r = i, r
        if best_r is None:
            break
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]
    return syms


def bpe_learn_merges(
    df: DataFrame,
    *,
    text: str = "text",
    num_merges: int = 100,
    max_words: int = 1_000_000,
    min_frequency: int = 1,
    lowercase: bool = True,
    marker: str = END_OF_WORD,
) -> list[tuple[str, str, int]]:
    """Learn BPE merges from a corpus: distributed word-frequency
    aggregation, then exact greedy merges driver-side over the top
    ``max_words`` (count desc, word asc) weighted words.

    Returns ``[(left, right, pair_count), ...]`` in merge order. Ties on
    pair_count break to the lexicographically smallest (left, right) -
    fully deterministic, so two runs (or two clusters) learn the same
    tokenizer. Stops early when the best pair's count falls below
    ``min_frequency`` or no pairs remain.
    """
    top = (
        word_counts(df, text=text, lowercase=lowercase)
        .orderBy(F.desc("n"), F.asc("word"))
        .limit(int(max_words))
        .collect()
    )
    words: dict = {}
    for r in top:
        syms = tuple(r["word"]) + (marker,)
        words[syms] = words.get(syms, 0) + int(r["n"])
    merges, _ = _learn_merges_local(words, num_merges, min_frequency)
    return merges


def bpe_vocab(
    merges: list[tuple[str, str, int]],
    alphabet: list[str] | set[str],
    *,
    marker: str = END_OF_WORD,
) -> dict[str, int]:
    """Dense token→id table from a learned merge list: the sorted base
    alphabet (plus the end-of-word marker) first, then each merge's
    output symbol in merge order — the standard BPE vocab layout, so
    ids are stable across runs (the learner is deterministic).
    Duplicate merge outputs (possible when a later merge re-derives an
    alphabet string) keep their first id."""
    vocab: dict[str, int] = {}
    for s in sorted(set(alphabet) | {marker}):
        vocab.setdefault(s, len(vocab))
    for a, b, _ in merges:
        vocab.setdefault(a + b, len(vocab))
    return vocab


def corpus_alphabet(
    df: DataFrame, *, text: str = "text", lowercase: bool = True
) -> list[str]:
    """Distinct characters of the corpus's words — the BPE base
    alphabet. One explode over the (already corpus-shrunk) vocabulary
    table; the result is character-set sized."""
    wc = word_counts(df, text=text, lowercase=lowercase)
    rows = (
        wc.select(F.explode(F.split("word", "")).alias("c"))
        .filter(F.col("c") != "")
        .distinct()
        .collect()
    )
    return sorted(r["c"] for r in rows)


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str, int]],
    *,
    text: str = "text",
    doc_id: str = "doc_id",
    lowercase: bool = True,
    marker: str = END_OF_WORD,
) -> DataFrame:
    """Apply learned merges to a corpus: (doc_id, tokens array). Map-only
    - the merge-rank table is broadcast once and each word is encoded by
    repeatedly applying the lowest-rank applicable merge (the standard
    BPE inference order). Works unchanged on streaming DataFrames."""
    import pandas as pd

    ranks = {(a, b): i for i, (a, b, _) in enumerate(merges)}
    bc = df.sparkSession.sparkContext.broadcast(ranks)
    lc = bool(lowercase)
    mk = marker

    def run(batches):
        import re
        from functools import lru_cache

        from unstructured_spark.operators.tokenizer import encode_word

        ascii_ws = re.compile(r"[ \t\n\x0b\f\r]+")
        rk = bc.value

        # Zipf: most words repeat constantly — memoize per worker
        # (bounded, so a 100 TB shard's long-tail vocab can't grow it)
        @lru_cache(maxsize=65536)
        def enc_word(w: str) -> tuple:
            return tuple(encode_word(w, rk, mk))

        for pdf in batches:
            toks = []
            for txt in pdf[text]:
                s = "" if txt is None else str(txt)
                if lc:
                    s = s.lower()
                ws = [w for w in ascii_ws.split(s.strip(" ")) if w != ""]
                toks.append([t for w in ws for t in enc_word(w)])
            yield pd.DataFrame(
                {"doc_id": pdf[doc_id], "tokens": toks}
            )

    out_schema = (
        df.select(F.col(doc_id).alias("doc_id")).schema[0].dataType.simpleString()
    )
    return df.select(
        F.col(doc_id).alias(doc_id), F.col(text).alias(text)
    ).mapInPandas(run, f"doc_id {out_schema}, tokens array<string>")


def fertility_by_stratum(
    df: DataFrame,
    merges: list[tuple[str, str, int]],
    *,
    strata: str = "source",
    text: str = "text",
    lowercase: bool = True,
    marker: str = END_OF_WORD,
) -> DataFrame:
    """Tokenizer fertility per stratum: how many subword tokens the
    (frozen) BPE tokenizer spends per whitespace word, the standard
    tokenizer-evaluation statistic for comparing how well one vocab
    serves different languages/sources (high fertility = the stratum
    pays more sequence length for the same text). Returns one row per
    stratum: ``(strata, words, bpe_tokens, fertility_ppm)`` with
    ``fertility_ppm = 1e6 * bpe_tokens div words`` — exact integers,
    no float ratio to diverge across engines.

    Scale shape: ONE corpus-wide shuffle (the (stratum, word) count —
    map-side combine on the exploded stream), then the Python encoder
    runs over the VOCABULARY (Zipf-bounded, lru-memoized per worker),
    never the corpus: cost O(|vocab| · |word|), not O(corpus tokens).
    The final per-stratum rollup shuffles rows bounded by
    |strata| × |vocab|.

    Cross-engine determinism: greedy lowest-rank-first inference
    (``encode_word``) equals exhaustive merge application in learned
    order — a merge can only create pairs containing its OWN new
    symbol, and merge ``i`` references only symbols built by merges
    ``< i``, so no lower-rank pair ever (re)appears after its pass;
    and since a merged symbol never equals either operand, one
    left-to-right ``replace`` pass per merge is exhaustive. That lets
    a SQL oracle replay the encoder exactly as |merges| chained
    ``replace`` calls over delimiter-wrapped symbol strings
    (``tests/test_tokenizer_properties.py`` pins the equivalence).
    """
    import pandas as pd

    ranks = {(a, b): i for i, (a, b, _) in enumerate(merges)}
    bc = df.sparkSession.sparkContext.broadcast(ranks)
    mk = marker
    wc = (
        df.select(
            F.col(strata).alias("stratum"),
            F.explode(_words(F.col(text), lowercase)).alias("word"),
        )
        .groupBy("stratum", "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )

    def run(batches):
        from functools import lru_cache

        rk = bc.value

        @lru_cache(maxsize=65536)
        def ntok(w: str) -> int:
            return len(encode_word(w, rk, mk))

        for pdf in batches:
            yield pd.DataFrame(
                {
                    "stratum": pdf["stratum"],
                    "cnt": pdf["cnt"],
                    "ntok": [ntok(w) for w in pdf["word"]],
                }
            )

    stype = (
        df.select(F.col(strata).alias("stratum")).schema[0].dataType.simpleString()
    )
    return (
        wc.mapInPandas(run, f"stratum {stype}, cnt bigint, ntok bigint")
        .groupBy("stratum")
        .agg(
            F.sum("cnt").cast("bigint").alias("words"),
            F.sum(F.col("cnt") * F.col("ntok")).cast("bigint").alias("bpe_tokens"),
        )
        .select(
            F.col("stratum").alias(strata),
            "words",
            "bpe_tokens",
            F.expr("bpe_tokens * 1000000 div words").cast("bigint").alias(
                "fertility_ppm"
            ),
        )
    )


def vocab_coverage(
    df: DataFrame,
    *,
    text: str = "text",
    top_k: int = 200,
    lowercase: bool = True,
) -> DataFrame:
    """Cumulative token-mass coverage of the top-k vocabulary: (token,
    cnt, rank, cum_cnt, coverage_ppm). The Zipf curve that sizes a
    vocabulary before training a tokenizer - coverage_ppm is the exact
    integer parts-per-million of corpus tokens covered by ranks 1..r.

    The global total rides in as a broadcast one-row join; the ranking
    window runs over only the top-k survivors of a TakeOrdered, so the
    single-partition exchange is k-bounded.
    """
    from pyspark.sql import Window

    wc = word_counts(df, text=text, lowercase=lowercase)
    total = wc.agg(F.sum("n").cast("bigint").alias("_total"))
    top = wc.orderBy(F.desc("n"), F.asc("word")).limit(int(top_k))
    w = Window.orderBy(F.desc("n"), F.asc("word"))
    return (
        top.join(F.broadcast(total))
        .select(
            F.col("word").alias("token"),
            F.col("n").cast("bigint").alias("cnt"),
            F.row_number().over(w).alias("rank"),
            F.sum("n")
            .over(w.rowsBetween(Window.unboundedPreceding, 0))
            .cast("bigint")
            .alias("cum_cnt"),
            "_total",
        )
        .withColumn(
            "coverage_ppm",
            F.expr("cum_cnt * 1000000 div _total").cast("bigint"),
        )
        .drop("_total")
    )
