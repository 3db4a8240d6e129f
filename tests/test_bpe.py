"""BPE merge learning: golden sequence on the classic corpus, greedy
leftmost application semantics, invariants, and the encode side."""

from __future__ import annotations

from pyspark.sql import functions as F

from elective_waiting_times_pipeline_spark.operators.bpe import (
    EOW,
    apply_bpe,
    learn_bpe_merges,
    words_to_symbols,
)


def _classic(spark):
    # Sennrich et al.'s worked example: low×5, lower×2, newest×6, widest×3
    rows = [("low " * 5,), ("lower " * 2,), ("newest " * 6,), ("widest " * 3,)]
    return spark.createDataFrame(rows, "text string")


def test_learn_matches_classic_sequence(spark):
    got = [
        (r.left, r.right, r.pair_count)
        for r in learn_bpe_merges(_classic(spark), n_merges=5).collect()
    ]
    # (e,s)=9 from newest+widest; (es,t)=9; (est,</w>)=9; (l,o)=7 from
    # low+lower; (lo,w)=7 — the published sequence, ties broken (n DESC,
    # left, right)
    assert got == [
        ("e", "s", 9),
        ("es", "t", 9),
        ("est", EOW, 9),
        ("l", "o", 7),
        ("lo", "w", 7),
    ]


def test_apply_encodes_unseen_word_with_learned_merges(spark):
    # 6 merges adds (e,w) — "newest"'s prefix — on top of the classic 5
    merges = [
        (r.left, r.right)
        for r in learn_bpe_merges(_classic(spark), n_merges=6).collect()
    ]
    enc = apply_bpe(spark.createDataFrame([("lowest newest",)], "text string"), merges)
    assert enc.select("bpe_tokens").first()[0] == ["low", "est</w>", "n", "ew", "est</w>"]


def test_merge_is_leftmost_greedy(spark):
    """'a a a a' with merge (a,a) must become (aa)(aa), never a(aa)a —
    the classic greedy scan order."""
    df = spark.createDataFrame([("aaaa",)], "text string")
    enc = apply_bpe(df, [("a", "a")])
    assert enc.select("bpe_tokens").first()[0] == ["aa", "aa", EOW]


def test_each_round_shrinks_symbol_mass_by_pair_count(spark):
    """Invariant: applying a merge removes shrink <= pair_count
    symbols, with EQUALITY on a run-free corpus (pair counting is
    positional/overlapping like the classic get_stats, while the
    greedy application merges leftmost-first — see the module note)."""
    df = _classic(spark)
    vocab = words_to_symbols(df)
    mass = lambda v: v.select(  # noqa: E731
        F.sum(F.size("syms") * F.col("weight")).alias("m")
    ).first()[0]
    merges = learn_bpe_merges(df, n_merges=4).collect()
    from elective_waiting_times_pipeline_spark.operators.bpe import _apply_merge

    cur = vocab
    for m in merges:
        before = mass(cur)
        cur = cur.withColumn("syms", _apply_merge(F.col("syms"), m.left, m.right))
        assert before - mass(cur) == m.pair_count  # classic corpus is run-free


def test_run_pair_counts_overlap_but_application_is_greedy(spark):
    """'aaa aaa' counts (a,a) positionally (2 per word -> 4) but the
    leftmost-first application merges once per word (shrink 2) — the
    documented shrink <= pair_count case."""
    from elective_waiting_times_pipeline_spark.operators.bpe import _apply_merge

    df = spark.createDataFrame([("aaa aaa",)], "text string")
    m = learn_bpe_merges(df, n_merges=1).collect()[0]
    assert (m.left, m.right, m.pair_count) == ("a", "a", 4)
    vocab = words_to_symbols(df)
    mass = lambda v: v.select(  # noqa: E731
        F.sum(F.size("syms") * F.col("weight")).alias("m")
    ).first()[0]
    before = mass(vocab)
    after = mass(vocab.withColumn("syms", _apply_merge(F.col("syms"), m.left, m.right)))
    assert before - after == 2  # one merge per 'aaa', not two


def test_empty_and_exhausted_corpora(spark):
    empty = spark.createDataFrame([("",)], "text string")
    assert learn_bpe_merges(empty, n_merges=3).count() == 0
    # single-char words exhaust after merging with the EOW marker
    tiny = spark.createDataFrame([("a b",)], "text string")
    got = learn_bpe_merges(tiny, n_merges=10)
    assert got.count() <= 2  # (a,</w>) and (b,</w>) — then nothing left
