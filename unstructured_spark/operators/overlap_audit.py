"""Bounding-box overlap/nesting QA audit over partitioned elements.

Distributed re-expression of the reference's document-QA helper
``catch_overlapping_and_nested_bboxes`` (reference
``unstructured/utils.py:271-643``): for every pair of elements on the
same page whose boxes intersect, classify the overlap —

- ``nested {child} in {parent}``         (±tolerance containment)
- ``Small partial overlap``              (partial IoMin < threshold)
- ``partial overlap with empty content in {type}``
- ``partial overlap with duplicate text`` (one text contains the other)
- ``partial overlap without sharing text``
- ``partial overlap sharing X% of the text from{type}({n}-gram)``

with the reference's percentages: ``overlap_pct`` is
intersection/min-area ×100 (forced to 100 for nested),
``overlap_pct_total`` is intersection/union ×100, and
``largest_ngram_pct`` is the share of common n-grams at the LARGEST n
any n-gram is shared, relative to the shorter text (reference
``calculate_largest_ngram_percentage``, utils.py:240-268 — its
count-down loop is equivalent to n* = min(longest common token run,
shorter_word_count − 1), computed here as a dynamic-programming fold
over the token arrays instead of a loop).

Scale shape: ONE self-join per (doc, page) — the same bucketed pattern
as ``layout_merge.remove_duplicate_boxes`` — then every classification
is native whole-stage-codegen expressions; the O(|a|·|b|) token-run
fold runs only on pairs that reach the text-sharing branch. No UDFs,
no driver loops; a DuckDB oracle replays the full decision tree.

Box convention follows the reference: (x1, y1) bottom-left, (x2, y2)
top-right.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _toks(c: Column) -> Column:
    return F.split(F.trim(c), "\\s+")


def longest_common_token_run(a: Column, b: Column) -> Column:
    """Length of the longest run of consecutive tokens shared between
    two token arrays — a classic LCS-of-runs DP expressed as a fold:
    state = (best, runs[j]) where runs[j] is the match-run length
    ending at b[j] for the current a-prefix."""
    init = F.struct(
        F.lit(0).alias("best"),
        F.transform(b, lambda _: F.lit(0)).alias("runs"),
    )

    def step(st: Column, tok: Column) -> Column:
        shifted = F.concat(F.array(F.lit(0)), F.slice(st["runs"], 1, F.greatest(F.size(st["runs"]) - 1, F.lit(0))))
        runs = F.zip_with(
            b, shifted, lambda bj, prev: F.when(bj == tok, prev + 1).otherwise(F.lit(0))
        )
        return F.struct(
            F.greatest(st["best"], F.array_max(F.concat(runs, F.array(F.lit(0))))).alias("best"),
            runs.alias("runs"),
        )

    return F.aggregate(a, init, step)["best"]


def _grams(toks: Column, n: Column) -> Column:
    """Distinct n-grams (space-joined) for a COLUMN-valued n."""
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        )
    )


def overlap_diagnostics(
    boxes: DataFrame,
    *,
    nested_tolerance: float = 5.0,
    sm_overlap_threshold: float = 10.0,
) -> DataFrame:
    """Classify every intersecting same-page element pair.

    Input columns: doc_id, page, ix (element ordinal), etype, text,
    x1, y1, x2, y2. Output one row per intersecting pair (ix_a < ix_b)
    with element_a/element_b ("Type(ix=N)", reference ordering quirks
    preserved), parent_element, overlapping_case, overlap_pct,
    overlap_pct_total, largest_ngram_pct, max_area, min_area,
    total_area (areas rounded to 2, percentages reference-rounded).
    """
    cols = ["doc_id", "page", "ix", "etype", "text", "x1", "y1", "x2", "y2"]
    # both self-join sides re-execute the caller's upstream (for the
    # registered audit query: tokenize + slice synthesis over the
    # corpus, twice — r13 plan dump shows two scan+generate subtrees);
    # the lineage cut bounds that at one pass of page-bounded rows
    boxes = boxes.select(*cols).localCheckpoint(eager=False)
    a = boxes.alias("a")
    b = boxes.alias("b")
    j = a.join(
        b,
        (F.col("a.doc_id") == F.col("b.doc_id"))
        & (F.col("a.page") == F.col("b.page"))
        & (F.col("a.ix") < F.col("b.ix"))
        # strict open-interval intersection (reference horizontal/vertical_overlap)
        & (F.col("a.x1") < F.col("b.x2"))
        & (F.col("a.x2") > F.col("b.x1"))
        & (F.col("a.y1") < F.col("b.y2"))
        & (F.col("a.y2") > F.col("b.y1")),
    )

    ax1, ay1, ax2, ay2 = (F.col(f"a.{c}").cast("double") for c in ("x1", "y1", "x2", "y2"))
    bx1, by1, bx2, by2 = (F.col(f"b.{c}").cast("double") for c in ("x1", "y1", "x2", "y2"))
    tol = F.lit(float(nested_tolerance))

    # Staged projections, NOT one fused select: Catalyst does no
    # common-subexpression elimination across lambda levels, and the
    # DP fold / gram intersection below feed many output expressions —
    # fused, each reference re-evaluates the whole subtree per row
    # (measured 21s at sf0.1 vs ~2s staged; same pathology and fix as
    # text_analysis.winnow_fingerprints).
    s1 = j.select(
        F.col("a.doc_id").alias("doc_id"),
        F.col("a.page").alias("page"),
        F.col("a.ix").alias("ixa"),
        F.col("b.ix").alias("ixb"),
        F.col("a.etype").alias("ta"),
        F.col("b.etype").alias("tb"),
        F.col("a.text").alias("xa"),
        F.col("b.text").alias("xb"),
        ((ax2 - ax1) * (ay2 - ay1)).alias("area_a"),
        ((bx2 - bx1) * (by2 - by1)).alias("area_b"),
        (
            F.greatest(F.least(ax2, bx2) - F.greatest(ax1, bx1), F.lit(0.0))
            * F.greatest(F.least(ay2, by2) - F.greatest(ay1, by1), F.lit(0.0))
        ).alias("inter"),
        (
            (bx1 >= ax1 - tol) & (by1 >= ay1 - tol) & (bx2 <= ax2 + tol) & (by2 <= ay2 + tol)
        ).alias("a_parent"),
        (
            (ax1 >= bx1 - tol) & (ay1 >= by1 - tol) & (ax2 <= bx2 + tol) & (ay2 <= by2 + tol)
        ).alias("b_parent"),
    )

    def pct(num: Column, den: Column) -> Column:
        return F.when(den == 0, F.lit(0.0)).otherwise(F.round(num / den * 100, 2))

    s2 = s1.select(
        "*",
        pct(F.col("inter"), F.least("area_a", "area_b")).alias("pct_partial"),
        pct(F.col("inter"), F.col("area_a") + F.col("area_b") - F.col("inter")).alias(
            "pct_total"
        ),
        _toks(F.col("xa")).alias("toks_a"),
        _toks(F.col("xb")).alias("toks_b"),
    )
    partial = (~F.col("a_parent")) & (~F.col("b_parent"))
    small = partial & (F.col("pct_partial") < sm_overlap_threshold)
    s3 = s2.select(
        "*",
        F.col("a_parent").alias("nested_a"),
        ((~F.col("a_parent")) & F.col("b_parent")).alias("nested_b"),
        small.alias("small"),
        (partial & ~small & (F.col("xa") == "")).alias("empty_a"),
        (partial & ~small & (F.col("xa") != "") & (F.col("xb") == "")).alias("empty_b"),
        (
            partial
            & ~small
            & (F.col("xa") != "")
            & (F.col("xb") != "")
            & (F.contains(F.col("xb"), F.col("xa")) | F.contains(F.col("xa"), F.col("xb")))
        ).alias("dup"),
        F.size("toks_a").alias("wa"),
        F.size("toks_b").alias("wb"),
    )
    sharing = (
        partial
        & ~F.col("small")
        & (F.col("xa") != "")
        & (F.col("xb") != "")
        & ~F.col("dup")
    )
    # DP fold only on rows that reach the text-sharing branch
    s4 = s3.select(
        "*",
        sharing.alias("sharing"),
        F.when(
            sharing, longest_common_token_run(F.col("toks_a"), F.col("toks_b"))
        ).otherwise(F.lit(0)).alias("run"),
    )
    s5 = s4.select(
        "*",
        F.least(F.col("run"), F.least("wa", "wb") - 1).alias("n_star"),
    )
    s6 = s5.select(
        "*",
        F.when(
            F.col("sharing") & (F.col("n_star") >= 1),
            F.size(
                F.array_intersect(
                    _grams(F.col("toks_a"), F.col("n_star")),
                    _grams(F.col("toks_b"), F.col("n_star")),
                )
            ),
        ).otherwise(F.lit(0)).alias("common_at_n"),
    )
    s7 = s6.select(
        "*",
        F.round(
            F.col("common_at_n").cast("double")
            / (F.least("wa", "wb") - F.col("n_star") + 1).cast("double")
            * 100,
            2,
        ).alias("ngram_pct"),
        ((F.col("n_star") >= 1) & (F.col("common_at_n") > 0)).alias("has_shared"),
    )

    ta, tb = F.col("ta"), F.col("tb")
    ea = F.concat(ta, F.lit("(ix="), F.col("ixa").cast("string"), F.lit(")"))
    eb = F.concat(tb, F.lit("(ix="), F.col("ixb").cast("string"), F.lit(")"))
    short_type = F.when(F.col("wa") < F.col("wb"), ta).otherwise(tb)  # ref swaps on tie
    nested_a, nested_b = F.col("nested_a"), F.col("nested_b")
    case = (
        F.when(nested_a, F.concat(F.lit("nested "), tb, F.lit(" in "), ta))
        .when(nested_b, F.concat(F.lit("nested "), ta, F.lit(" in "), tb))
        .when(F.col("small"), F.lit("Small partial overlap"))
        .when(F.col("empty_a"), F.concat(F.lit("partial overlap with empty content in "), ta))
        .when(F.col("empty_b"), F.concat(F.lit("partial overlap with empty content in "), tb))
        .when(F.col("dup"), F.lit("partial overlap with duplicate text"))
        .when(
            F.col("sharing") & F.col("has_shared"),
            F.concat(
                F.lit("partial overlap sharing "),
                F.col("ngram_pct").cast("string"),
                F.lit("% of the text from"),  # reference concatenation, utils.py:434-436
                short_type,
                F.lit("("),
                F.col("n_star").cast("string"),
                F.lit("-gram)"),
            ),
        )
        .otherwise(F.lit("partial overlap without sharing text"))
    )

    return s7.select(
        "doc_id",
        "page",
        # element order: reference puts the parent first for nested and
        # swaps for the empty-text_b branch (utils.py:403-409,523-538)
        F.when(nested_b | F.col("empty_b"), eb).otherwise(ea).alias("element_a"),
        F.when(nested_b | F.col("empty_b"), ea).otherwise(eb).alias("element_b"),
        F.when(nested_a, ea).when(nested_b, eb).alias("parent_element"),
        case.alias("overlapping_case"),
        F.when(nested_a | nested_b, F.lit(100.0)).otherwise(F.col("pct_partial")).alias(
            "overlap_pct"
        ),
        F.col("pct_total").alias("overlap_pct_total"),
        F.when(F.col("sharing") & F.col("has_shared"), F.col("ngram_pct"))
        .otherwise(F.lit(0.0))
        .alias("largest_ngram_pct"),
        F.round(F.greatest("area_a", "area_b"), 2).alias("max_area"),
        F.round(F.least("area_a", "area_b"), 2).alias("min_area"),
        F.round(F.col("area_a") + F.col("area_b"), 2).alias("total_area"),
    )
