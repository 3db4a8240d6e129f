"""End-to-end training-data user story over the sf0.001 corpus:

  quality filter -> PII redact -> exact dedup -> near-dup keep-canonical
  -> temperature mixture -> deterministic split -> epoch order
  -> contiguous training shards

Every stage is the library operator a pipeline author would call; the
assertions pin the invariants that matter downstream (no duplicate
fingerprints, no surviving PII, reproducible output, shard files that
tile the global order contiguously)."""

from __future__ import annotations

import glob
import re

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from elective_waiting_times_pipeline_spark.operators import dedup as D
from elective_waiting_times_pipeline_spark.operators import sampling as SMP
from elective_waiting_times_pipeline_spark.operators import text as X
from elective_waiting_times_pipeline_spark.operators.cluster import near_dup_clusters
from elective_waiting_times_pipeline_spark.sources.readers import (
    load_table,
    write_training_shards,
)

SF = "/root/testdata/sf0.001"


def _pipeline(spark):
    docs = load_table(spark, SF, "documents")
    survivors = X.quality_filter(docs).select("doc_id")
    passed = docs.join(survivors, "doc_id", "left_semi").select(
        "doc_id", "text", "lang", "source"
    )
    redacted = passed.withColumn("text", X.redact_pii("text"))
    exact = D.dedup_exact(redacted)
    clusters = near_dup_clusters(exact)
    canonical = (
        exact.join(clusters, "doc_id")
        .filter(F.col("cluster_id") == F.col("doc_id"))
        .drop("cluster_id")
    )
    mixed = SMP.temperature_mixture(
        canonical, F.col("doc_id").cast("string"), "source", alpha=0.5, target_rows=200
    )
    split = SMP.hash_split(
        mixed, F.col("doc_id").cast("string"), {"train": 0.8, "val": 0.1, "test": 0.1}
    )
    train = split.filter(F.col("split") == "train")
    return SMP.hash_order_position(train, F.col("doc_id").cast("string"))


def test_pipeline_invariants_and_shard_layout(spark, tmp_path):
    ordered = _pipeline(spark)
    rows = ordered.collect()
    assert len(rows) > 20  # the story survives the whole funnel

    # 1. exact dedup held: one row per normalized fingerprint
    fp = ordered.select(X.fingerprint_md5("text").alias("f"))
    assert fp.count() == fp.distinct().count()

    # 2. PII never survives redaction
    pat = re.compile(r"[\w.]+@[\w.]+|\b\d{1,3}(\.\d{1,3}){3}\b")
    assert not any(pat.search(r.text) for r in rows)

    # 3. positions are a contiguous 1..N permutation (loader contract)
    positions = sorted(r.position for r in rows)
    assert positions == list(range(1, len(rows) + 1))

    # 4. shards tile the order contiguously
    out = str(tmp_path / "shards")
    write_training_shards(ordered, out, n_shards=4)
    files = sorted(glob.glob(out + "/part-*.parquet"))
    assert len(files) == 4
    spans = []
    for f in files:
        pos = pq.read_table(f, columns=["position"]).column("position").to_pylist()
        if pos:
            assert pos == sorted(pos)  # locally sorted
            spans.append((pos[0], pos[-1]))
    spans.sort()
    flat = [p for lo, hi in spans for p in (lo, hi)]
    assert flat == sorted(flat)  # shard ranges don't interleave
    covered = sum(hi - lo + 1 for lo, hi in spans)
    assert covered == len(rows)  # no gaps between shards


def test_pipeline_is_reproducible(spark):
    a = sorted((r.doc_id, r.position) for r in _pipeline(spark).collect())
    b = sorted((r.doc_id, r.position) for r in _pipeline(spark).collect())
    assert a == b
