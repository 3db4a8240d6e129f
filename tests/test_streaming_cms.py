"""Streaming count-min maintenance (streaming/sinks.py): the summed
store equals the one-shot batch sketch, and replays never
double-count cells."""

from __future__ import annotations

from pyspark.sql import functions as F

from elective_waiting_times_pipeline_spark.operators.sketches import count_min_cells
from elective_waiting_times_pipeline_spark.streaming.sinks import (
    read_count_min,
    stream_maintain_count_min,
)

_D, _W = 4, 64


def _land_source(spark, tmp_path):
    src = str(tmp_path / "keys")
    rows = [(f"key{k % 17}",) for k in range(300)]
    df = spark.createDataFrame(rows, "key string")
    # several files -> several micro-batches under maxFilesPerTrigger
    df.repartition(3).write.parquet(src)
    return src, df


def _run(spark, src, store, ckpt):
    stream = (
        spark.readStream.schema("key string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_maintain_count_min(
        stream, store, ckpt, key_col="key", d=_D, w=_W, query_name=f"cms_{ckpt[-3:]}"
    )
    q.awaitTermination()


def test_streamed_store_equals_batch_sketch(spark, tmp_path):
    src, df = _land_source(spark, tmp_path)
    store = str(tmp_path / "store")
    _run(spark, src, store, str(tmp_path / "ck1"))
    merged = sorted(
        tuple(r) for r in read_count_min(spark, store).collect()
    )
    batch = sorted(
        tuple(r) for r in count_min_cells(df, "key", d=_D, w=_W).collect()
    )
    assert merged == batch
    # more than one micro-batch actually landed
    n_batches = spark.read.parquet(store).select("batch").distinct().count()
    assert n_batches >= 2


def test_replay_does_not_double_count(spark, tmp_path):
    src, df = _land_source(spark, tmp_path)
    store = str(tmp_path / "store")
    _run(spark, src, store, str(tmp_path / "ck1"))
    first = sorted(tuple(r) for r in read_count_min(spark, store).collect())
    # full redelivery from a fresh checkpoint: batch ids repeat, each
    # rewrites its own leaf -> the merged sketch is unchanged
    _run(spark, src, store, str(tmp_path / "ck2"))
    second = sorted(tuple(r) for r in read_count_min(spark, store).collect())
    assert second == first


def test_compaction_preserves_the_sketch(spark, tmp_path):
    from elective_waiting_times_pipeline_spark.streaming.sinks import compact_count_min

    src, df = _land_source(spark, tmp_path)
    store = str(tmp_path / "store")
    _run(spark, src, store, str(tmp_path / "ck1"))
    before = sorted(tuple(r) for r in read_count_min(spark, store).collect())
    compact_count_min(spark, store)
    after = sorted(tuple(r) for r in read_count_min(spark, store).collect())
    assert after == before
    leaves = spark.read.parquet(store).select("batch").distinct().collect()
    assert [r.batch for r in leaves] == [-1]
