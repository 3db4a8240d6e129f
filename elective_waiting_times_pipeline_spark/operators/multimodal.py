"""Multimodal-column operators: image/audio/video payloads as opaque
BINARY columns with typed metadata, processed in Arrow batches via
mapInPandas.

The Spark-side plumbing here is real and tested — schemas, batch
iteration, partition-preserving map-side execution; only the actual
codec work is stubbed (this container ships no image/audio libraries).
Each stub is deterministic so tests can pin outputs; swap `_decode_*`
for PIL/ffmpeg calls in a real deployment without touching the plan
shape.

Scale design: decode/feature-extract are mapInPandas (no shuffle; a
100 TB binary column streams through executors batch-by-batch), and
metadata-only transforms (filtering by width, bucketing by duration)
happen BEFORE decode on the typed metadata columns, so the binary
bytes of filtered-out rows are never materialized (Parquet column
pruning + predicate pushdown on the metadata).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

IMAGE_META_SCHEMA = (
    "id long, byte_len int, format string, width int, height int, sha1 string"
)
IMAGE_FEATURE_SCHEMA = "id long, feat array<float>"
FRAME_SAMPLE_SCHEMA = "id long, frame_idx int, frame_sha1 string"


def _decode_image_stub(payload: bytes) -> tuple[str, int, int]:
    """Deterministic fake decode: derives (format, width, height) from
    the payload hash. REPLACE with a real decoder (PIL.Image.open) in
    production — the surrounding batch plumbing is unchanged."""
    h = hashlib.sha1(payload).digest()
    fmt = ["jpeg", "png", "webp"][h[0] % 3]
    width = 64 + h[1] * 4
    height = 64 + h[2] * 4
    return fmt, width, height



def _non_null(df: DataFrame, id_col: str, bin_col: str) -> DataFrame:
    """NULL payloads (failed fetches, outer-join gaps) are SKIPPED, not
    crashed on: bytes(None) would kill the whole task for one bad row.
    Emitting nothing for a null payload is the decode contract every
    operator here shares; callers needing the gap list anti-join the
    output back against the input ids."""
    return df.select(id_col, bin_col).filter(F.col(bin_col).isNotNull())


def decode_image_metadata(df: DataFrame, id_col: str = "id", bin_col: str = "payload") -> DataFrame:
    """BINARY column → typed metadata row per image (mapInPandas,
    Arrow-batched; one pass, no shuffle)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[bin_col]
            meta = [_decode_image_stub(bytes(p)) for p in payloads]
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "byte_len": payloads.map(len).astype("int32"),
                    "format": [m[0] for m in meta],
                    "width": np.array([m[1] for m in meta], dtype="int32"),
                    "height": np.array([m[2] for m in meta], dtype="int32"),
                    "sha1": [hashlib.sha1(bytes(p)).hexdigest() for p in payloads],
                }
            )

    return _non_null(df, id_col, bin_col).mapInPandas(batches, IMAGE_META_SCHEMA)


def extract_image_features(
    df: DataFrame, id_col: str = "id", bin_col: str = "payload", dim: int = 8
) -> DataFrame:
    """BINARY → fixed-dim float feature vector (stub: normalized byte
    histogram folded to `dim`). Real version: a vision model over the
    decoded pixels — identical mapInPandas shape, bigger batches."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for p in pdf[bin_col]:
                arr = np.frombuffer(bytes(p), dtype=np.uint8)
                if len(arr) == 0:
                    feats.append(np.zeros(dim, dtype="float32"))
                    continue
                hist = np.bincount(arr % dim, minlength=dim).astype("float64")
                feats.append((hist / hist.sum()).astype("float32"))
            yield pd.DataFrame({"id": pdf[id_col].astype("int64"), "feat": feats})

    return _non_null(df, id_col, bin_col).mapInPandas(batches, IMAGE_FEATURE_SCHEMA)


RESIZED_IMAGE_SCHEMA = "id long, payload binary"

Codec = "Callable[[bytes, int], bytes]"  # (payload, target_px) -> resized payload


def resize_images(
    df: DataFrame,
    id_col: str = "id",
    bin_col: str = "payload",
    target: int = 224,
    codec=None,
) -> DataFrame:
    """Resize the binary image column through an injected codec callable
    `(payload: bytes, target: int) -> bytes` — the same injected-client
    pattern as `enrichment.geocode_providers` (tests inject a fake;
    production injects e.g. ``lambda b, t: pil_resize(b, t)``). The
    Spark plumbing — mapInPandas over (id, payload) Arrow batches,
    1→1, no shuffle — is real and tested; only the pixel work is
    delegated. Raises if no codec is supplied (PIL/libvips are absent
    in this container, so there is no meaningful default)."""
    if codec is None:
        raise NotImplementedError(
            "image resize requires a codec callable (e.g. PIL/libvips wrapper) "
            "— none is available by default in this environment; pass "
            "codec=(payload, target_px) -> bytes. Plumbing contract: mapInPandas "
            f"over ({id_col} long, {bin_col} binary) -> {RESIZED_IMAGE_SCHEMA}"
        )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "payload": [codec(bytes(p), target) for p in pdf[bin_col]],
                }
            )

    return _non_null(df, id_col, bin_col).mapInPandas(batches, RESIZED_IMAGE_SCHEMA)


def sample_frames(
    df: DataFrame,
    id_col: str = "id",
    bin_col: str = "payload",
    every_n_bytes: int = 4096,
    max_frames: int = 4,
) -> DataFrame:
    """Video frame-sampling stub: emits ≤ max_frames (id, frame_idx,
    frame_sha1) rows per payload — a 1→N mapInPandas (the real version
    seeks keyframes with ffmpeg; same output shape)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, hashes = [], [], []
            for i, p in zip(pdf[id_col], pdf[bin_col]):
                b = bytes(p)
                n = min(max_frames, max(1, len(b) // every_n_bytes))
                for k in range(n):
                    chunk = b[k * every_n_bytes : (k + 1) * every_n_bytes]
                    ids.append(int(i))
                    idxs.append(k)
                    hashes.append(hashlib.sha1(chunk).hexdigest())
            yield pd.DataFrame({"id": pd.array(ids, dtype="int64"), "frame_idx": pd.array(idxs, dtype="int32"), "frame_sha1": hashes})

    return _non_null(df, id_col, bin_col).mapInPandas(batches, FRAME_SAMPLE_SCHEMA)


AUDIO_META_SCHEMA = (
    "id long, byte_len int, codec string, sample_rate int, n_samples long, duration_s double"
)


def _decode_audio_stub(payload: bytes) -> tuple[str, int, int]:
    """Deterministic fake decode: (codec, sample_rate, n_samples) from
    the payload hash. REPLACE with a real decoder (soundfile/ffmpeg) in
    production — batch plumbing is unchanged."""
    h = hashlib.sha1(payload).digest()
    codec = ["pcm_s16le", "flac", "opus"][h[3] % 3]
    sample_rate = [16000, 24000, 44100][h[4] % 3]
    n_samples = sample_rate * (1 + h[5] % 30)  # 1-30 s of audio
    return codec, sample_rate, n_samples


def decode_audio_metadata(df: DataFrame, id_col: str = "id", bin_col: str = "payload") -> DataFrame:
    """BINARY column → typed audio metadata (mapInPandas, Arrow-batched,
    one pass no shuffle) — same edge pattern as decode_image_metadata;
    duration is derived, ready for length-bucketed batching."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[bin_col]
            meta = [_decode_audio_stub(bytes(p)) for p in payloads]
            sr = np.array([m[1] for m in meta], dtype="int32")
            ns = np.array([m[2] for m in meta], dtype="int64")
            yield pd.DataFrame(
                {
                    "id": pdf[id_col].astype("int64"),
                    "byte_len": payloads.map(len).astype("int32"),
                    "codec": [m[0] for m in meta],
                    "sample_rate": sr,
                    "n_samples": ns,
                    "duration_s": ns / sr,
                }
            )

    return _non_null(df, id_col, bin_col).mapInPandas(batches, AUDIO_META_SCHEMA)


AHASH_SCHEMA = "id long, ahash long"


def _grayscale_stub(payload: bytes) -> np.ndarray:
    """Deterministic fake grayscale decode: the payload bytes tiled
    into an 8x8 grid. REPLACE with a real decode+resize (PIL
    ``Image.open(...).convert('L').resize((8, 8))``) in production —
    hashing and pairing below are unchanged."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    if len(arr) == 0:
        arr = np.zeros(1, dtype=np.uint8)
    return np.resize(arr, (8, 8))


def average_hash_images(
    df: DataFrame, id_col: str = "id", bin_col: str = "payload", decoder=None
) -> DataFrame:
    """Perceptual average-hash (aHash) per image: grayscale 8x8, bit i
    set iff pixel i is above the image mean — a 64-bit signature where
    visually-near images differ in few bits. `decoder` maps bytes to a
    2D grayscale array (defaults to the deterministic stub; inject a
    real PIL/libvips decode in production). mapInPandas, no shuffle;
    the downstream pairing reuses the SimHash pigeonhole banding."""
    dec = decoder or _grayscale_stub

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            hashes = []
            for p in pdf[bin_col]:
                grid = np.asarray(dec(bytes(p)), dtype="float64")
                bits = (grid.flatten() > grid.mean()).astype(np.uint64)
                h = 0
                for i, b in enumerate(bits[:64]):
                    h |= int(b) << i
                if h >= 1 << 63:  # store as signed 64-bit (Spark LONG)
                    h -= 1 << 64
                hashes.append(h)
            yield pd.DataFrame({"id": pdf[id_col].astype("int64"), "ahash": hashes})

    return _non_null(df, id_col, bin_col).mapInPandas(batches, AHASH_SCHEMA)


def image_near_dup_pairs(
    df: DataFrame,
    id_col: str = "id",
    bin_col: str = "payload",
    max_hamming: int = 8,
    decoder=None,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Image near-duplicate pairs: aHash signatures fed through the
    SimHash chunk-banding join (operators/dedup.py — complete recall
    for Hamming <= max_hamming by pigeonhole, one shuffle, no
    all-pairs). The 100 TB image-dedup path: binary payloads stream
    through the hasher once; only 64-bit signatures shuffle."""
    from elective_waiting_times_pipeline_spark.operators.dedup import simhash_near_dup_pairs

    sims = average_hash_images(df, id_col=id_col, bin_col=bin_col, decoder=decoder)
    return simhash_near_dup_pairs(
        sims,
        id_col="id",
        sim_col="ahash",
        max_hamming=max_hamming,
        max_bucket_size=max_bucket_size,
    )
