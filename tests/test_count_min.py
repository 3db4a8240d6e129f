"""Count-min sketch (operators/sketches.py): over-count guarantee,
mergeability, bounded cell grid, and the exact-verify heavy-hitter
composition."""

from __future__ import annotations

from pyspark.sql import functions as F

from elective_waiting_times_pipeline_spark.operators.sketches import (
    cms_estimate,
    count_min_cells,
)

_D, _W = 4, 64


def _items(spark):
    # zipf-ish: key k appears 200//(k+1) times -> collisions certain at w=64
    rows = [(f"key{k}",) for k in range(120) for _ in range(200 // (k + 1))]
    return spark.createDataFrame(rows, "key string")


def test_estimate_never_undercounts_and_grid_bounded(spark):
    items = _items(spark)
    cells = count_min_cells(items, "key", d=_D, w=_W)
    assert cells.count() <= _D * _W
    true = items.groupBy("key").agg(F.count(F.lit(1)).alias("n"))
    est = cms_estimate(true, cells, "key", d=_D, w=_W)
    bad = est.filter(F.col("cms_est") < F.col("n")).count()
    assert bad == 0
    # top key is unique enough that min-of-4 should be exact or near
    top = est.filter(F.col("key") == "key0").collect()[0]
    assert top.cms_est >= 200


def test_sketches_merge_by_cell_sum(spark):
    items = _items(spark)
    a, b = items.randomSplit([0.5, 0.5], seed=7)
    merged = (
        count_min_cells(a, "key", d=_D, w=_W)
        .unionByName(count_min_cells(b, "key", d=_D, w=_W))
        .groupBy("row", "col")
        .agg(F.sum("cnt").alias("cnt"))
    )
    full = count_min_cells(items, "key", d=_D, w=_W)
    diff = (
        merged.join(full, ["row", "col"], "full_outer")
        .filter(
            F.coalesce(merged["cnt"], F.lit(0)) != F.coalesce(full["cnt"], F.lit(0))
        )
        .count()
    )
    assert diff == 0


def test_weighted_cells_equal_unweighted_over_expanded_multiset(spark):
    # the pre-aggregated (key, n) build must produce the IDENTICAL
    # cell grid the per-occurrence build does — cells are plain sums
    items = _items(spark)
    pre = items.groupBy("key").agg(F.count(F.lit(1)).alias("n"))
    weighted = count_min_cells(pre, "key", d=_D, w=_W, weight_col="n")
    full = count_min_cells(items, "key", d=_D, w=_W)
    diff = (
        weighted.join(full, ["row", "col"], "full_outer")
        .filter(
            F.coalesce(weighted["cnt"], F.lit(0)) != F.coalesce(full["cnt"], F.lit(0))
        )
        .count()
    )
    assert diff == 0
    assert [f.dataType.typeName() for f in weighted.schema.fields] == [
        f.dataType.typeName() for f in full.schema.fields
    ]


def test_heavy_hitter_composition_is_exact(spark):
    items = _items(spark)
    cells = count_min_cells(items, "key", d=_D, w=_W)
    true = items.groupBy("key").agg(F.count(F.lit(1)).alias("n"))
    est = cms_estimate(items, cells, "key", d=_D, w=_W)
    # threshold 50: candidates from the sketch, verified exactly
    got = (
        est.filter(F.col("cms_est") >= 50)
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 50)
    )
    want = true.filter(F.col("n") >= 50)
    assert sorted((r.key, r.n) for r in got.collect()) == sorted(
        (r.key, r.n) for r in want.collect()
    )
