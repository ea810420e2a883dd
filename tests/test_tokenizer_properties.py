"""Property-based tests (hypothesis) for the pure-Python BPE core —
invariants that must hold for ANY corpus, not just fixtures.

BPE contract:
- merging never changes what the symbols spell: concatenating a word's
  symbols always restores word + marker, after ANY number of merges
- greedy lowest-rank-first inference (encode_word) reproduces the
  learner's final segmentation of every training word exactly — the
  standard replay-in-learned-order equivalence
- the learner is deterministic, and merge counts never increase
  (each merge consumes its pair occurrences; later bests can't beat
  an earlier round's max)
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from unstructured_spark.operators.tokenizer import (
    END_OF_WORD,
    _learn_merges_local,
    _merge_step,
    encode_word,
)

_WORD = st.text(
    alphabet=st.sampled_from("abcdef"), min_size=1, max_size=10
)
_CORPUS = st.dictionaries(
    _WORD, st.integers(min_value=1, max_value=50), min_size=1, max_size=25
)


def _table(corpus: dict) -> dict:
    return {tuple(w) + (END_OF_WORD,): n for w, n in corpus.items()}


@settings(max_examples=150, deadline=None)
@given(_CORPUS, st.integers(min_value=0, max_value=30))
def test_merges_preserve_spelling(corpus, num_merges):
    words = _table(corpus)
    _, final = _learn_merges_local(words, num_merges, 1)
    spelled = sorted(("".join(s), n) for s, n in final.items())
    expected = sorted((w + END_OF_WORD, n) for w, n in corpus.items())
    assert spelled == expected


@settings(max_examples=150, deadline=None)
@given(_CORPUS, st.integers(min_value=0, max_value=30))
def test_inference_matches_training_segmentation(corpus, num_merges):
    words = _table(corpus)
    merges, final = _learn_merges_local(words, num_merges, 1)
    ranks = {(a, b): i for i, (a, b, _) in enumerate(merges)}
    got = {w: tuple(encode_word(w, ranks)) for w in corpus}
    want = {"".join(s)[: -len(END_OF_WORD)]: s for s in final}
    assert got == want


@settings(max_examples=100, deadline=None)
@given(_CORPUS)
def test_learner_deterministic_and_counts_nonincreasing(corpus):
    words = _table(corpus)
    m1, _ = _learn_merges_local(dict(words), 20, 1)
    m2, _ = _learn_merges_local(dict(words), 20, 1)
    assert m1 == m2
    counts = [c for _, _, c in m1]
    assert counts == sorted(counts, reverse=True)


@settings(max_examples=100, deadline=None)
@given(_CORPUS, st.sampled_from("abcdef"), st.sampled_from("abcdef"))
def test_merge_step_preserves_total_weight(corpus, a, b):
    words = _table(corpus)
    merged = _merge_step(words, a, b)
    assert sum(words.values()) == sum(merged.values())
    # distinct training words spell distinct strings, and a merge never
    # changes spelling — so the spelled-string weight map is invariant
    assert {"".join(s): n for s, n in merged.items()} == {
        "".join(s): n for s, n in words.items()
    }


def _encode_by_sequential_replace(word, merges, marker=END_OF_WORD):
    """The q_bpe_fertility ORACLE's algorithm, in Python: wrap every
    symbol as \\x01sym\\x01 and apply one non-overlapping left-to-right
    replace per merge, in learned order."""
    d = "\x01"
    s = "".join(f"{d}{c}{d}" for c in list(word) + [marker])
    for a, b, _ in merges:
        s = s.replace(f"{d}{a}{d}{d}{b}{d}", f"{d}{a}{b}{d}")
    return tuple(tok[1:-1] for tok in _split_wrapped(s, d))


def _split_wrapped(s, d):
    out, i = [], 0
    while i < len(s):
        j = s.index(d, i + 1)
        out.append(s[i : j + 1])
        i = j + 1
    return out


@settings(max_examples=200, deadline=None)
@given(_CORPUS, _WORD)
def test_sequential_replace_equals_greedy_encode(corpus, probe):
    """Pins the cross-engine determinism claim behind q_bpe_fertility:
    chained replace() in learned order (what the DuckDB oracle runs)
    equals greedy lowest-rank-first inference (what bpe_encode runs) —
    for every learned merge table and for words NEVER seen in
    training (the probe), not just training words."""
    words = _table(corpus)
    merges, _ = _learn_merges_local(dict(words), 20, 1)
    ranks = {(a, b): i for i, (a, b, _) in enumerate(merges)}
    for w in list(corpus) + [probe]:
        assert _encode_by_sequential_replace(w, merges) == tuple(
            encode_word(w, ranks)
        ), (w, merges)
