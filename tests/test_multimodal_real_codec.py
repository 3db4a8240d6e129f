"""Real-codec integration for the multimodal plumbing: where PIL is
installed, drive `resize_images` end-to-end on an actual PNG through
the injected-codec contract, and run `extract_image_features` /
`sample_frames` over the same real payloads. Skips cleanly in
environments without PIL (this container ships no image libraries —
the mapInPandas plumbing itself is covered by
tests/test_multimodal_enrichment.py with deterministic fakes).
"""

from __future__ import annotations

import io

import pytest

PIL = pytest.importorskip("PIL.Image", reason="PIL not installed; codec path untestable here")

from elective_waiting_times_pipeline_spark.operators import multimodal as M


def _png_bytes(w: int, h: int, color) -> bytes:
    img = PIL.new("RGB", (w, h), color)
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


def _pil_resize_codec(payload: bytes, target: int) -> bytes:
    # The production codec shape documented in resize_images' contract:
    # decode → resize so the LONG edge is `target` → re-encode PNG.
    img = PIL.open(io.BytesIO(payload))
    scale = target / max(img.size)
    img = img.resize((max(1, round(img.width * scale)), max(1, round(img.height * scale))))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return buf.getvalue()


def test_resize_images_real_png_roundtrip(spark):
    rows = [
        (1, _png_bytes(640, 480, (200, 30, 30))),
        (2, _png_bytes(64, 64, (10, 180, 60))),
        (3, None),  # null payload must be dropped, not crash the codec
    ]
    df = spark.createDataFrame(rows, "id long, payload binary")
    out = {r.id: bytes(r.payload) for r in M.resize_images(df, target=224, codec=_pil_resize_codec).collect()}
    assert set(out) == {1, 2}
    for i, payload in out.items():
        img = PIL.open(io.BytesIO(payload))
        assert max(img.size) == 224, (i, img.size)
        # aspect ratio preserved within rounding
        assert min(img.size) >= 1


def test_feature_and_frame_plumbing_on_real_payloads(spark):
    rows = [(1, _png_bytes(32, 32, (1, 2, 3))), (2, _png_bytes(16, 16, (250, 250, 250)))]
    df = spark.createDataFrame(rows, "id long, payload binary")

    feats = {r.id: list(r.feat) for r in M.extract_image_features(df, dim=8).collect()}
    assert set(feats) == {1, 2}
    for v in feats.values():
        assert len(v) == 8 and abs(sum(v) - 1.0) < 1e-5

    frames = M.sample_frames(df, every_n_bytes=64, max_frames=3).collect()
    assert {r.id for r in frames} == {1, 2}
    assert all(0 <= r.frame_idx < 3 for r in frames)
