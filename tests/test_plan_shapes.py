"""Registry-wide plan-shape guard: the scale contract, pinned.

Every registered query must plan WITHOUT a CartesianProduct, and
BroadcastNestedLoopJoin may appear only where a deliberately tiny
(single-row / scalar / seed-table) build side makes it free at any
scale. A regression that turns a keyed join into an all-pairs plan
fails here before it ever reaches a cluster.
"""

import importlib.util
import os
import sys

import pytest

# long-running suite: deselected from the default fast tier (pytest.ini);
# runs in the round-end full pass with -m "slow or not slow"
pytestmark = pytest.mark.slow

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

# queries whose plan intentionally carries a BroadcastNestedLoopJoin:
# the build side is one row (query vector, centroid frame, corpus
# scalar) or a seed table of <= nlist rows — free at any corpus size
BNLJ_ALLOWED = {
    "q_embed_topk",       # broadcast query vectors (<=10 rows)
    "q_token_kl_drift",   # broadcast corpus vocabulary counts
    "q_hybrid_rrf",       # broadcast single query vector
    "q_ivf_ann_topk",     # broadcast seed-centroid frame (nlist rows)
    "q22_idle_customers", # broadcast scalar avg-acctbal threshold
    "q11_important_stock",# broadcast scalar value threshold
    "q_kmeans_clusters",  # broadcast 1-row centroid frame per round
    "q_semantic_dedup",   # same kmeans centroid frame (k rows); the
                          # pairwise sweep itself is an equi-join on
                          # cluster_id, never a crossjoin
    "q_nb_classify",      # ONE broadcast `buckets`-row dense-grid
                          # range crossed with the |classes|-row
                          # doc-count frame (r9: nd/n_c ride windows,
                          # so the former 1-row BNLJ is gone) —
                          # bounded by construction; corpus scoring is
                          # an equi-join on the bucket key
    "q_nb_confusion",     # inherits q_nb_classify's bounded dense-grid
                          # BNLJ (buckets x |classes|); the confusion
                          # rollup itself is an equi-join on doc_id
    "q_vocab_coverage",   # broadcast 1-row total-token-count aggregate
                          # joined onto the k-bounded top-k table
    "q_bigram_cross_entropy",  # broadcast 1-row vocabulary-size (V)
                          # aggregate crossed onto the type table —
                          # r13: the window-based c1 removed the
                          # uni_counts checkpoint the crossJoin used
                          # to hide below, so the (bounded-by-
                          # construction) 1-row BNLJ is now visible
    "q_mixture_reweight", # inherits q_bigram_cross_entropy's 1-row
                          # V-aggregate BNLJ; the reweight chain's own
                          # joins are equi-joins on doc_id/source
    "q_ann_recall",       # inherits the two searches it grades:
                          # q_embed_topk's broadcast query vectors
                          # (<=10 rows) and q_ivf_ann_topk's broadcast
                          # seed-centroid frame (nlist rows) — the
                          # recall join itself is an equi-join on
                          # (query, neighbor)
}


def _entry():
    spec = importlib.util.spec_from_file_location(
        "spark_entry_planshapes",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     "__spark_entry__.py"),
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


@pytest.fixture(scope="module")
def plans(spark):
    m = _entry()
    out = {}
    for name, q in m.queries().items():
        df = q(spark, SF_DIR)
        out[name] = df._jdf.queryExecution().sparkPlan().toString()
    return out


def test_no_cartesian_products_anywhere(plans):
    offenders = [n for n, p in plans.items() if "CartesianProduct" in p]
    assert offenders == [], f"all-pairs plans crept in: {offenders}"


def test_bnlj_only_where_build_side_is_tiny(plans):
    offenders = [
        n
        for n, p in plans.items()
        if "BroadcastNestedLoopJoin" in p and n not in BNLJ_ALLOWED
    ]
    assert offenders == [], (
        f"unexpected BroadcastNestedLoopJoin in {offenders}; if the build "
        "side is genuinely tiny, add the query to BNLJ_ALLOWED with a reason"
    )
