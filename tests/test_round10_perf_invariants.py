"""Round-10 optimization invariants: the plan-shape guarantees the
perf rewrites rely on, plus value-parity between rewritten operators
and their previous semantics.

These pin the OPTIMIZATION CONTRACTS, not timings:
- bind_once really is a single-evaluation barrier (the bound
  expression appears exactly once in the optimized plan even with a
  downstream filter, which plain projection binding does not survive);
- token_profile's row-local and explode branches are value-identical,
  including NULL/empty/whitespace-only text;
- the attribute-binding rewrites of the gram builders changed no
  values (shingles_from_tokens == word_shingles on text, hash fold ==
  shingle_hashes).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elective_waiting_times_pipeline_spark.functions.barrier import bind_once
from elective_waiting_times_pipeline_spark.operators import dedup as D
from elective_waiting_times_pipeline_spark.operators import text as X


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, None),
            (2, ""),
            (3, "   "),
            (4, "the quick brown fox jumps over the lazy dog"),
            (5, "a.b,c! d e f g h i j"),
            (6, "uno due tre uno due tre uno due tre"),
        ],
        "doc_id long, text string",
    )


def test_bind_once_single_evaluation(spark, docs):
    """The tokenize chain appears exactly once in the optimized plan
    even when a filter consumes the bound column — the contract the
    curate() rewrite relies on. A plain select-binding is pushed
    through and re-evaluated (asserted too, as the motivating foil)."""
    b = bind_once(docs, _nt=F.size(X.tokens("text")))
    out = b.filter(F.col("_nt") >= 2).select("doc_id", F.col("_nt").alias("n"))
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("split(") == 1, plan

    naive = docs.select(
        "doc_id", F.size(X.tokens("text")).alias("_nt")
    ).filter(F.col("_nt") >= 2).select("doc_id", F.col("_nt").alias("n"))
    naive_plan = naive._jdf.queryExecution().optimizedPlan().toString()
    assert naive_plan.count("split(") >= 2, naive_plan


def test_bind_once_values_and_row_preservation(spark, docs):
    b = bind_once(docs, _nt=F.size(X.tokens("text")), _len=F.length("text"))
    rows = {r.doc_id: (r._nt, r._len) for r in b.collect()}
    # one output row per input row, NULL text included
    assert set(rows) == {1, 2, 3, 4, 5, 6}
    assert rows[1] == (0, None) or rows[1][1] is None
    assert rows[4][0] == 9


def test_token_profile_branches_value_identical(spark, docs):
    """rowlocal (<=2 langs) vs explode (>2 langs) branch parity on the
    shared columns, including the NULL/empty-text edge rows."""
    a = (
        X.token_profile(docs, langs=("en",))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = (
        X.token_profile(docs, langs=("en", "de", "fr"))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert b[a.columns].equals(a)


def test_shingles_from_tokens_matches_word_shingles(spark, docs):
    bound = docs.select(
        "doc_id",
        X.word_shingles("text", 3).alias("a"),
        X.shingles_from_tokens(X.tokens("text"), 3).alias("b"),
    )
    for r in bound.collect():
        assert r.a == r.b, r


def test_hash_fold_matches_shingle_hashes(spark, docs):
    bound = docs.select(
        "doc_id",
        D.shingle_hashes("text", 3).alias("a"),
        D.hash_shingles_from_token_hashes(
            F.transform(X.tokens("text"), lambda t: F.xxhash64(t)), 3
        ).alias("b"),
    )
    for r in bound.collect():
        assert r.a == r.b, r
