"""Property-based test: the exact-duplicate collapse in
near_dup_clusters is invariant to corpus composition — random corpora
mixing exact copies, shared-vocabulary near-dups, short (<shingle)
docs, and empties must cluster identically to the uncollapsed
pair-join-over-all-docs composition."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from elective_waiting_times_pipeline_spark.operators.cluster import (
    assign_clusters,
    near_dup_clusters,
)
from elective_waiting_times_pipeline_spark.operators.dedup import ngram_jaccard_pairs

# A handful of base "documents" over a small shared vocabulary, so
# random corpora naturally produce near-dup pairs across groups.
_WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]

base_doc = st.lists(st.sampled_from(_WORDS), min_size=0, max_size=8).map(" ".join)

corpus = st.lists(
    st.tuples(base_doc, st.integers(min_value=1, max_value=3)),  # (text, n_copies)
    min_size=1,
    max_size=6,
)


@settings(max_examples=10, deadline=None)
@given(corpus=corpus)
def test_collapse_invariant_under_random_corpora(spark, corpus):
    rows = []
    i = 0
    for text, n_copies in corpus:
        for _ in range(n_copies):
            rows.append((i, text))
            i += 1
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    got = {
        r.doc_id: r.cluster_id
        for r in near_dup_clusters(docs, shingle_n=2, min_jaccard=0.3).collect()
    }
    pairs = ngram_jaccard_pairs(docs, shingle_n=2, min_jaccard=0.3)
    want = {
        r.doc_id: r.cluster_id
        for r in assign_clusters(docs.select("doc_id"), pairs).collect()
    }
    assert got == want


# --------------------------------------------------------------------------
# Adaptive CC strategy: the small-graph driver union-find must label
# identically to the distributed Hash-Min fixpoint on random graphs
# (including multi-hop chains, where min-reachable != min-neighbor).
# --------------------------------------------------------------------------
edge_list = st.lists(
    st.tuples(st.integers(min_value=0, max_value=30), st.integers(min_value=0, max_value=30)),
    min_size=1,
    max_size=40,
)


@settings(max_examples=10, deadline=None)
@given(edge_list)
def test_union_find_fast_path_equals_distributed(spark, edges):
    from elective_waiting_times_pipeline_spark.operators.cluster import connected_components

    df = spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "id_a long, id_b long"
    )
    fast = connected_components(df)  # default threshold -> union-find
    slow = connected_components(df, small_graph_edges=0)  # forced distributed
    as_map = lambda d: {r.v: r.label for r in d.collect()}  # noqa: E731
    assert as_map(fast) == as_map(slow)
