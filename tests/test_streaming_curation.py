"""Streaming ingest-time curation == the batch curation surface.

Two equivalences:
1. the streaming availableNow run emits exactly the same curated rows
   as `curate` on a batch read of the same parquet;
2. the per-row expression features inside `curate` keep the same
   survivor set as the aggregate-shaped batch operator
   `operators/text.py::quality_filter` (the documented algebraic
   identity between the two feature forms).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from elective_waiting_times_pipeline_spark.operators.text import quality_filter
from elective_waiting_times_pipeline_spark.sources.readers import load_table
from elective_waiting_times_pipeline_spark.streaming.curation import (
    curate,
    run_curation_available_now,
)

SF = "/root/testdata/sf0.001"


def test_streaming_curation_equals_batch(spark):
    batch = curate(load_table(spark, SF, "documents")).collect()
    streamed = run_curation_available_now(spark, f"{SF}/documents.parquet").collect()
    key = lambda r: r["doc_id"]  # noqa: E731
    assert sorted(map(tuple, streamed), key=lambda t: t[0]) == sorted(
        map(tuple, batch), key=lambda t: t[0]
    )
    assert len(batch) > 0


def test_curation_survivors_match_quality_filter(spark):
    docs = load_table(spark, SF, "documents")
    expr_form = {
        (r["doc_id"], r["n_tokens"]) for r in curate(docs).collect()
    }
    agg_form = {
        (r["doc_id"], r["n_tokens"]) for r in quality_filter(docs).collect()
    }
    assert expr_form == agg_form


def test_curation_output_contract(spark):
    out = curate(load_table(spark, SF, "documents"))
    assert set(out.columns) == {"doc_id", "n_tokens", "text", "fingerprint", "split"}
    rows = out.limit(50).collect()
    assert all(r["split"] in {"train", "val", "test"} for r in rows)
    assert all(len(r["fingerprint"]) == 32 for r in rows)


def test_curate_emitted_columns_describe_redacted_text(spark):
    """n_tokens and fingerprint must agree with the EMITTED (redacted)
    text: a phone number collapses to one [PHONE] token, and two docs
    identical after redaction share a fingerprint."""
    base = "the quick brown fox jumps over the lazy dog and then sits down"
    rows = [
        (1, base + " call +1 (555) 123-4567 now"),
        (2, base + " call +1 (555) 999-0000 now"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in curate(docs).collect()}
    assert len(out) == 2
    for r in out.values():
        assert "[PHONE]" in r.text
        assert r.n_tokens == len(r.text.split())  # count matches emitted text
    # identical after redaction -> same dedup key
    assert out[1].fingerprint == out[2].fingerprint
