"""Multimodal binary-column plumbing + external-enrichment UDF tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elective_waiting_times_pipeline_spark.operators import multimodal as MM
from elective_waiting_times_pipeline_spark.operators.enrichment import geocode_providers
from elective_waiting_times_pipeline_spark.sources.readers import load_table


@pytest.fixture(scope="module")
def binary_df(spark, sf_dir):
    # Opaque binary payloads fabricated from document text (the
    # container has no image fixtures; plumbing is payload-agnostic).
    docs = load_table(spark, sf_dir, "documents").limit(50)
    return docs.select(F.col("doc_id").alias("id"), F.encode("text", "utf-8").alias("payload"))


def test_decode_image_metadata_schema_and_determinism(spark, binary_df):
    out = MM.decode_image_metadata(binary_df)
    assert [f.name for f in out.schema.fields] == ["id", "byte_len", "format", "width", "height", "sha1"]
    rows1 = {r.id: (r.format, r.width, r.height, r.sha1) for r in out.collect()}
    rows2 = {r.id: (r.format, r.width, r.height, r.sha1) for r in MM.decode_image_metadata(binary_df).collect()}
    assert rows1 == rows2 and len(rows1) == 50
    assert all(v[1] >= 64 and v[2] >= 64 for v in rows1.values())


def test_feature_extraction_normalized(spark, binary_df):
    out = MM.extract_image_features(binary_df, dim=8).collect()
    assert len(out) == 50
    for r in out:
        assert len(r.feat) == 8
        assert abs(sum(r.feat) - 1.0) < 1e-3


def test_frame_sampling_one_to_many(spark, binary_df):
    frames = MM.sample_frames(binary_df, every_n_bytes=64, max_frames=3)
    pdf = frames.toPandas()
    assert set(pdf.columns) == {"id", "frame_idx", "frame_sha1"}
    per_doc = pdf.groupby("id").size()
    assert per_doc.max() <= 3 and per_doc.min() >= 1


def test_resize_without_codec_is_marked_stub(spark, binary_df):
    with pytest.raises(NotImplementedError):
        MM.resize_images(binary_df)


def test_resize_with_injected_codec_round_trips(spark, binary_df):
    # Fake codec: truncate/pad the payload to `target` bytes — enough to
    # prove the (id, payload) -> (id, payload) Arrow round trip and that
    # the codec's target parameter is threaded through.
    def fake_codec(payload: bytes, target: int) -> bytes:
        return payload[:target].ljust(target, b"\0")

    out = MM.resize_images(binary_df, target=32, codec=fake_codec)
    assert [f.name for f in out.schema.fields] == ["id", "payload"]
    rows = out.collect()
    assert len(rows) == 50
    orig = {r.id: bytes(r.payload) for r in binary_df.collect()}
    for r in rows:
        assert len(bytes(r.payload)) == 32
        assert bytes(r.payload) == orig[r.id][:32].ljust(32, b"\0")


def test_metadata_filter_prunes_before_decode(spark, binary_df):
    # The production pattern: filter on typed metadata THEN decode.
    meta = MM.decode_image_metadata(binary_df)
    wide = meta.filter(F.col("width") > 300)
    assert 0 <= wide.count() < 50


def test_geocode_status_branches(spark):
    df = spark.createDataFrame(
        [("P1", "AB1 2CD"), ("P2", "ZZ9 9ZZ"), ("P3", ""), ("P4", None)],
        "provider_code string, postcode string",
    )
    out = {r.provider_code: r for r in geocode_providers(df).collect()}
    assert out["P1"].status == "OK" and out["P1"].lat is not None
    assert out["P2"].status == "ZERO_RESULTS" and out["P2"].number_results == 0
    assert out["P3"].status == "fail" and out["P3"].lat is None
    assert out["P4"].status == "fail"
    # deterministic client → stable coordinates
    again = {r.provider_code: r for r in geocode_providers(df).collect()}
    assert again["P1"].lat == out["P1"].lat


def test_decode_audio_metadata_deterministic(spark):
    from elective_waiting_times_pipeline_spark.operators.multimodal import decode_audio_metadata

    df = spark.createDataFrame(
        [(1, bytearray(b"audio-payload-a")), (2, bytearray(b"audio-payload-b"))],
        "id long, payload binary",
    )
    out = {r.id: r for r in decode_audio_metadata(df).collect()}
    assert set(out) == {1, 2}
    for r in out.values():
        assert r.codec in ("pcm_s16le", "flac", "opus")
        assert r.sample_rate in (16000, 24000, 44100)
        assert abs(r.duration_s - r.n_samples / r.sample_rate) < 1e-12
    again = {r.id: r for r in decode_audio_metadata(df).collect()}
    assert {i: tuple(r) for i, r in out.items()} == {i: tuple(r) for i, r in again.items()}


def test_average_hash_and_image_near_dup_pairs(spark):
    from elective_waiting_times_pipeline_spark.operators.multimodal import (
        average_hash_images,
        image_near_dup_pairs,
    )

    base = bytes(range(64))
    tweaked = bytearray(base)
    tweaked[5] ^= 0xFF  # flip one tile far from the mean -> few bits differ
    rows = [
        (1, base),
        (2, bytes(base)),          # exact copy -> hamming 0
        (3, bytes(tweaked)),       # near-dup -> small hamming
        (4, bytes([7] * 64)),      # constant image -> all-zero hash
    ]
    df = spark.createDataFrame(rows, "id long, payload binary")
    hashes = {r.id: r.ahash for r in average_hash_images(df).collect()}
    assert hashes[1] == hashes[2]
    assert hashes[4] == 0  # nothing above the mean of a constant image
    assert hashes[1] != hashes[3]

    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in image_near_dup_pairs(df, max_hamming=8).collect()
    }
    assert pairs[(1, 2)] == 0
    assert (1, 3) in pairs and 0 < pairs[(1, 3)] <= 8
    assert all(4 not in p for p in pairs)


def test_null_payloads_skipped_not_crashed(spark):
    from elective_waiting_times_pipeline_spark.operators import multimodal as M

    df = spark.createDataFrame(
        [(1, bytearray(b"abc")), (2, None)], "id long, payload binary"
    )
    meta = M.decode_image_metadata(df).collect()
    assert [r.id for r in meta] == [1]  # null payload emits nothing
    feats = M.extract_image_features(df).collect()
    assert [r.id for r in feats] == [1]
