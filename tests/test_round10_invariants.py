"""Round-10 invariants: the three round-9 ADVICE findings.

1. dedup_exact / leakage_safe_split must not silently drop NULL-text
   rows through the fingerprint equi-join (the agg+rejoin rewrite's
   NULL-key hole) — NULL-text docs form ONE dedup group with
   min-id-wins, the semantics the former window form had.
2. keep_canonical_from_store must elect a NEW canonical when the
   stored one is absent from the input (stale store), instead of
   emitting zero representatives for the cluster.
3. simhash_overcap_buckets requires an explicit max_bucket_size (the
   report is only meaningful for the cap the generator ran with).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elective_waiting_times_pipeline_spark.operators import cluster as C
from elective_waiting_times_pipeline_spark.operators import dedup as D


def test_dedup_exact_keeps_one_null_text_row(spark):
    df = spark.createDataFrame(
        [(1, "alpha"), (2, None), (3, "alpha"), (4, None), (5, None), (6, "beta")],
        "doc_id long, text string",
    )
    kept = sorted(r.doc_id for r in D.dedup_exact(df).collect())
    # NULL-text rows are one group → min id 2 survives; alpha → 1; beta → 6
    assert kept == [1, 2, 6]


def test_dedup_exact_null_group_distinct_from_empty_text(spark):
    # "" fingerprints to md5("") — a real hex digest — and must NOT
    # merge with the NULL sentinel group.
    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, ""), (4, None)], "doc_id long, text string"
    )
    kept = sorted(r.doc_id for r in D.dedup_exact(df).collect())
    assert kept == [1, 2]


def test_leakage_safe_split_assigns_null_text_docs(spark, sf_dir):
    from elective_waiting_times_pipeline_spark.plans.catalog_text import leakage_safe_split

    base = leakage_safe_split(spark, sf_dir)
    n_docs = base.count()
    # splice two NULL-text docs into the corpus via a temp view swap
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    extra = spark.createDataFrame(
        [(10_000_001,), (10_000_002,)], "doc_id long"
    ).select(
        "doc_id", *[F.lit(None).cast(docs.schema[c].dataType).alias(c)
                    for c in docs.columns if c != "doc_id"]
    )
    import tempfile

    with tempfile.TemporaryDirectory() as tmp:
        docs.unionByName(extra).write.mode("overwrite").parquet(f"{tmp}/documents.parquet")
        out = leakage_safe_split(spark, tmp)
        rows = {r.doc_id: r for r in out.collect()}
        # every doc, including the NULL-text pair, receives a split
        assert len(rows) == n_docs + 2
        a, b = rows[10_000_001], rows[10_000_002]
        # the two NULL-text docs are ONE group: shared canonical = min id
        assert a.canonical_id == b.canonical_id == 10_000_001
        assert a.split == b.split
        assert a.split in ("train", "val", "test")


def test_keep_canonical_from_store_stale_store_elects_new_min(spark):
    # store built over {1,2,3} as one cluster (canonical 1) + singleton 10;
    # doc 1 has since been filtered out of the input.
    store = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 1), (10, 10)], "doc_id long, cluster_id long"
    )
    docs = spark.createDataFrame([(2,), (3,), (10,), (42,)], "doc_id long")
    kept = sorted(
        r.doc_id for r in C.keep_canonical_from_store(docs, store).collect()
    )
    # cluster 1's surviving members {2,3} elect 2; 10 stays; 42 unseen → kept
    assert kept == [2, 10, 42]


def test_md5_bucket_hash_preserves_candidate_set(spark, sf_dir):
    """bucket_hash='md5' only swaps the bucket KEY function; bucket
    membership — and therefore the candidate pair set — must be
    identical to the xxhash64 production path on the same signatures."""
    from elective_waiting_times_pipeline_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    sigs = D.minhash_signatures_replayable(docs, num_hashes=16, shingle_n=2)
    a = set(map(tuple, D.minhash_lsh_candidates(sigs, bands=4, rows_per_band=4).collect()))
    b = set(
        map(
            tuple,
            D.minhash_lsh_candidates(
                sigs, bands=4, rows_per_band=4, bucket_hash="md5"
            ).collect(),
        )
    )
    assert a == b and len(a) > 0


def test_replayable_signatures_are_60bit_nonnegative(spark, sf_dir):
    from elective_waiting_times_pipeline_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").limit(50)
    rows = D.minhash_signatures_replayable(docs, num_hashes=4, shingle_n=2).collect()
    assert rows
    for r in rows:
        assert len(r.signature) == 4
        assert all(0 <= h < (1 << 60) for h in r.signature)


def test_verify_candidate_pairs_equals_restricted_full_run(spark, sf_dir):
    """verify_candidate_pairs(pairs, docs) must equal the full
    ngram_jaccard_pairs output inner-joined to the candidate list —
    same scores, no phantom pairs — while touching only endpoint
    docs."""
    from elective_waiting_times_pipeline_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    full = D.ngram_jaccard_pairs(docs, shingle_n=3)
    # candidate list: every 3rd co-shingled pair plus one no-overlap pair
    cand = full.filter((F.col("id_a") + F.col("id_b")) % 3 == 0).select(
        "id_a", "id_b"
    )
    expect = {
        (r.id_a, r.id_b): r.jaccard for r in full.join(cand, ["id_a", "id_b"]).collect()
    }
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in D.verify_candidate_pairs(cand, docs, shingle_n=3).collect()
    }
    assert got == expect and len(got) > 0
    # a candidate pair with zero shingle overlap scores 0 under
    # min_jaccard=0 semantics: it simply doesn't appear (no shingle
    # join rows), and with min_jaccard>0 it must not appear either
    fake = spark.createDataFrame([(0, 1)], "id_a long, id_b long")
    thr = D.verify_candidate_pairs(fake, docs, shingle_n=3, min_jaccard=0.5)
    assert all(r.jaccard >= 0.5 for r in thr.collect())


def test_simhash_overcap_requires_explicit_cap(spark):
    sims = spark.createDataFrame([(1, 0), (2, 0)], "doc_id long, simhash long")
    with pytest.raises(TypeError):
        D.simhash_overcap_buckets(sims)  # no cap → must not default
