"""Tests for ingest (M2), lookups (M3), reporting (M4), geo, streaming."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from elective_waiting_times_pipeline_spark.operators.geo import spatial_join
from elective_waiting_times_pipeline_spark.plans import ingest, lookups, reporting
from elective_waiting_times_pipeline_spark.streaming.windows import run_available_now


# --- ingest -----------------------------------------------------------------

def test_flag_is_provider_per_month(spark):
    fact = spark.createDataFrame(
        [("Apr20", "P1"), ("Apr20", "P2"), ("May20", "P1")],
        "monthyr string, `Provider.Org.Code` string",
    )
    members = spark.createDataFrame(
        [("Apr20", "P1", "X", "Y56"), ("Apr20", "P1", "X", "Y56")],  # dup row
        "monthyr string, codes string, names string, region string",
    )
    out = {
        (r["monthyr"], r["Provider.Org.Code"]): r["IS_provider"]
        for r in ingest.flag_is_provider(fact, members).collect()
    }
    # membership is per-month: P1 is IS in Apr only (1b.R:380)
    assert out == {("Apr20", "P1"): 1, ("Apr20", "P2"): 0, ("May20", "P1"): 0}


def test_append_months_union_fill(spark):
    a = spark.createDataFrame([(1, 2)], "k int, g1 int")
    b = spark.createDataFrame([(3, 4)], "k int, g2 int")
    out = ingest.append_months([a, b]).toPandas().sort_values("k").reset_index(drop=True)
    assert list(out.columns) == ["k", "g1", "g2"]
    assert pd.isna(out.loc[1, "g1"]) and pd.isna(out.loc[0, "g2"])


def test_build_fact_lake_partitioned(spark, tmp_path):
    a = spark.createDataFrame([("Apr20", "P1", 5)], "monthyr string, `Provider.Org.Code` string, Total int")
    b = spark.createDataFrame([("May20", "P1", 7)], "monthyr string, `Provider.Org.Code` string, Total int")
    members = spark.createDataFrame([("Apr20", "P1", "n", "r")], "monthyr string, codes string, names string, region string")
    out = str(tmp_path / "lake")
    ingest.build_fact_lake([a, b], members, out)
    lake = spark.read.parquet(out)
    assert sorted(r.monthyr for r in lake.select("monthyr").collect()) == ["Apr20", "May20"]
    # partition pruning: reading one month touches one partition dir
    one = lake.filter(F.col("monthyr") == "Apr20")
    assert one.count() == 1 and one.collect()[0].IS_provider == 1


def test_month_grid(spark):
    g = ingest.month_grid(spark, "2020-04-01", "2020-06-01").collect()
    assert [r.monthyr for r in g] == ["Apr20", "May20", "Jun20"]


def test_validate_no_nulls_raises(spark):
    df = spark.createDataFrame([(1, None)], "a int, b string")
    ingest.validate_no_nulls(df, ["a"])
    with pytest.raises(ValueError):
        ingest.validate_no_nulls(df, ["b"])


# --- lookups ----------------------------------------------------------------

def test_weighted_imd_and_deciles(spark):
    lsoa_ccg = spark.createDataFrame(
        [("L1", "2021", "C1"), ("L2", "2021", "C1"), ("L3", "2021", "C2"), ("L4", "2021", "C3")],
        "lsoa string, ccg_year string, ccg string",
    )
    imd = spark.createDataFrame(
        [("L1", 10.0), ("L2", 30.0), ("L3", 50.0), ("L4", None)],
        "lsoa string, imd_score double",
    )
    pop = spark.createDataFrame(
        [("L1", 100), ("L2", 300), ("L3", 50), ("L4", 10)], "lsoa string, pop long"
    )
    w = lookups.weighted_imd_by_ccg(lsoa_ccg, imd, pop)
    got = {r.ccg: r.weighted_imd_score for r in w.collect()}
    assert got["C1"] == pytest.approx((10 * 100 + 30 * 300) / 400)
    assert got["C2"] == 50.0
    assert got["C3"] is None  # NA propagation (R weighted.mean default)

    deciled = lookups.imd_deciles(w.filter(F.col("weighted_imd_score").isNotNull()))
    rows = {r.ccg: r for r in deciled.collect()}
    # highest score (C2) → ntile last → inverted decile smallest
    assert rows["C2"].imd_decile < rows["C1"].imd_decile


def test_stack_org_files_first_wins(spark):
    f1 = spark.createDataFrame([("P1", "NAME A", "PC1")], "V1 string, V2 string, V10 string")
    f2 = spark.createDataFrame([("P1", "NAME B", "PC2"), ("P2", "NAME C", "PC3")], "V1 string, V2 string, V10 string")
    out = {r.provider_code: r.postcode for r in lookups.stack_org_files({"etrust": f1, "ephp": f2}).collect()}
    assert out == {"P1": "PC1", "P2": "PC3"}  # first file wins for P1


def test_stack_org_files_multisplit_scan_keeps_file_order(spark, tmp_path):
    """A CSV big enough to scan as multiple splits must still dedup to
    the file's FIRST row per code (1c.R !duplicated keeps file order) —
    r1 used monotonically_increasing_id, silently nondeterministic the
    moment a file splits."""
    lines = []
    # P0 appears first with postcode WIN, then 400 filler rows, then P0
    # again near the end of the file with postcode LOSE.
    lines.append("P0,First Org," + ",".join([""] * 7) + ",WIN")
    for i in range(400):
        lines.append(f"F{i:03d},Filler Organisation Number {i}," + ",".join([""] * 7) + f",ZZ{i:03d}")
    lines.append("P0,Dup Org," + ",".join([""] * 7) + ",LOSE")
    path = tmp_path / "etrust.csv"
    path.write_text("\n".join(lines) + "\n")

    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", "2048")
    try:
        schema = ", ".join(f"V{i} string" for i in range(1, 11))
        df = spark.read.csv(str(path), schema=schema)
        assert df.rdd.getNumPartitions() > 1, "test needs a multi-split scan"
        out = {r.provider_code: r.postcode for r in lookups.stack_org_files({"etrust": df}).collect()}
        assert out["P0"] == "WIN"
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_best_geocode_keeps_ties(spark):
    g = spark.createDataFrame(
        [("P1", 3, "a"), ("P1", -3, "b"), ("P1", 1, "c"), ("P2", 0, "d")],
        "provider_code string, number_results int, id string",
    )
    out = lookups.best_geocode_per_provider(g).collect()
    p1 = sorted(r.id for r in out if r.provider_code == "P1")
    assert p1 == ["a", "b"]  # |3| ties kept (R top_n semantics)


def test_unpivot_vintages(spark):
    wide = spark.createDataFrame([("L1", "C18", None)], "LSOA11CD string, CCG18CDH string, CCG21CDH string")
    out = lookups.unpivot_vintages(wide, "LSOA11CD", ["CCG18CDH", "CCG21CDH"]).collect()
    assert len(out) == 1 and out[0].ccg_year == "CCG18CDH" and out[0].ccg == "C18"


# --- reporting ---------------------------------------------------------------

def _stats_df(spark):
    rows = [
        ("Feb20", "IS", "r1", 10),
        ("Feb20", "Non-IS", "r1", 90),
        ("Jun20", "IS", "r1", 30),
        ("Jun20", "Non-IS", "r1", 70),
        ("Jun22", "IS", "r1", 50),
        ("Jun22", "Non-IS", "r1", 50),
    ]
    return spark.createDataFrame(rows, "monthyear string, independent string, region string, `total.patients` int")


def test_covid_period_summary_and_double_pivot(spark):
    stats = _stats_df(spark)
    summ = reporting.period_summary(stats, ["region", "independent"])
    got = {(r.independent, r.covid_period): r.total for r in summ.collect()}
    assert got[("IS", "pre")] == 10 and got[("IS", "during")] == 30 and got[("IS", "post")] == 50

    piv = reporting.double_pivot(summ, ["region"])
    row = piv.collect()[0]
    assert row["total.IS.pre"] == 10
    assert row["total.Non-IS.post"] == 50
    delta = reporting.delta_pre_post(piv, "total.IS.pre", "total.IS.post").collect()[0]
    assert delta.delta == 40


def test_covid_period_boundaries(spark):
    # Reference 3b.R:84-87 / 3c.R:54-56: 'during' runs [2020-03-01, 2021-06-01).
    months = spark.createDataFrame(
        [("Feb20",), ("Mar20",), ("Apr21",), ("May21",), ("Jun21",)],
        "monthyear string",
    )
    got = {r.monthyear: r.covid_period for r in reporting.with_period(months).collect()}
    assert got == {
        "Feb20": "pre",
        "Mar20": "during",
        "Apr21": "during",
        "May21": "during",
        "Jun21": "post",
    }


def test_share_and_per_capita(spark):
    df = spark.createDataFrame(
        [("London", "IS", 25), ("London", "Non-IS", 75)], "region string, independent string, total int"
    )
    shared = reporting.add_share_within(df, ["region"])
    got = {r.independent: r.share_pct for r in shared.collect()}
    assert got == {"IS": 25.0, "Non-IS": 75.0}
    pc = reporting.per_capita(df, spark).collect()
    assert all(r.total_per_100000 is not None for r in pc)


# --- geo ----------------------------------------------------------------------

def test_spatial_join_triangle_and_rect(spark):
    pts = spark.createDataFrame(
        [(0.5, 0.25, "in_tri"), (2.5, 2.5, "in_rect"), (9.0, 9.0, "outside")],
        "x double, y double, tag string",
    )
    polys = [
        ("tri", [(0.0, 0.0), (1.0, 0.0), (0.5, 1.0)]),
        ("rect", [(2.0, 2.0), (3.0, 2.0), (3.0, 3.0), (2.0, 3.0)]),
    ]
    got = {r.tag: r.polygon for r in spatial_join(pts, polys, "x", "y").collect()}
    assert got == {"in_tri": "tri", "in_rect": "rect", "outside": None}


# --- streaming -----------------------------------------------------------------

def test_streaming_matches_batch(spark, sf_dir):
    from elective_waiting_times_pipeline_spark.plans import catalog

    stream_out = run_available_now(spark, f"{sf_dir}/events.parquet").toPandas()
    batch_out = catalog.SPARK_QUERIES["events_tumbling_window"](spark, sf_dir).toPandas()
    s = stream_out.sort_values(["window_start", "event_type"]).reset_index(drop=True)
    b = batch_out.sort_values(["window_start", "event_type"]).reset_index(drop=True)
    assert len(s) == len(b)
    assert (s["n_events"].values == b["n_events"].values).all()
    assert (abs(s["total_value"].values - b["total_value"].values) < 1e-9).all()


def test_streaming_ohlc_matches_batch(spark, sf_dir):
    """The streaming OHLC (min_by/max_by partial state across
    micro-batches) must agree exactly with the batch tumbling_ohlc —
    open/close are order-pinned, so equality is exact, not tolerant."""
    from elective_waiting_times_pipeline_spark.plans import catalog
    from elective_waiting_times_pipeline_spark.streaming.windows import (
        run_ohlc_available_now,
    )

    stream_out = run_ohlc_available_now(spark, f"{sf_dir}/events.parquet").toPandas()
    batch_out = catalog.SPARK_QUERIES["tumbling_ohlc"](spark, sf_dir).toPandas()
    s = stream_out.sort_values(["window_start", "event_type"]).reset_index(drop=True)
    b = batch_out.sort_values(["window_start", "event_type"]).reset_index(drop=True)
    assert len(s) == len(b) > 0
    for c in ("n_events", "open", "high", "low", "close"):
        assert (s[c].values == b[c].values).all(), c


def test_overwrite_partitions_replaces_only_touched_month(spark, tmp_path):
    """Dynamic partition overwrite: restating one month must not touch
    the others (idempotent monthly recompute)."""
    from pyspark.sql import functions as F

    from elective_waiting_times_pipeline_spark.sources.readers import (
        overwrite_partitions,
        write_partitioned,
    )

    path = str(tmp_path / "lake")
    base = spark.createDataFrame(
        [("Apr20", 1, 10.0), ("Apr20", 2, 20.0), ("May20", 3, 30.0)],
        "monthyr string, k int, v double",
    )
    write_partitioned(base, path)
    # restate May20 with corrected values; Apr20 must survive untouched
    fix = spark.createDataFrame([("May20", 3, 99.0), ("May20", 4, 44.0)], base.schema)
    overwrite_partitions(fix, path)
    out = {(r.monthyr, r.k): r.v for r in spark.read.parquet(path).collect()}
    assert out == {("Apr20", 1): 10.0, ("Apr20", 2): 20.0, ("May20", 3): 99.0, ("May20", 4): 44.0}
    # re-running the same restatement is a no-op
    overwrite_partitions(fix, path)
    out2 = {(r.monthyr, r.k): r.v for r in spark.read.parquet(path).collect()}
    assert out2 == out


def test_validate_unique_key_and_rowcount(spark):
    import pytest as _pytest

    from elective_waiting_times_pipeline_spark.plans.ingest import (
        validate_rowcount_equals,
        validate_unique_key,
    )

    clean = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    validate_unique_key(clean, ["k"])  # passes
    validate_rowcount_equals(clean, clean.select("k"))  # same count
    duped = clean.union(spark.createDataFrame([(1, "c")], "k int, v string"))
    with _pytest.raises(ValueError, match="duplicate keys"):
        validate_unique_key(duped, ["k"])
    with _pytest.raises(ValueError, match="row-count mismatch"):
        validate_rowcount_equals(clean, duped)


def test_compact_partitions_merges_files_and_preserves_rows(spark, tmp_path):
    from pyspark.sql import functions as F

    from elective_waiting_times_pipeline_spark.sources.readers import (
        compact_partitions,
        write_partitioned,
    )

    lake = str(tmp_path / "lake")
    df = spark.range(0, 300).select(
        F.col("id"),
        F.concat(F.lit("m"), (F.col("id") % 3).cast("string")).alias("monthyr"),
    )
    # fragment each partition into many files (simulated micro-batches)
    df.repartition(10).write.partitionBy("monthyr").parquet(lake)
    before = spark.read.parquet(lake)
    n_files_before = before.filter("monthyr = 'm1'").select(
        F.input_file_name()
    ).distinct().count()
    assert n_files_before > 1
    rows_before = sorted(r.id for r in before.collect())

    compact_partitions(spark, lake, ["m1"], target_files=1)

    after = spark.read.parquet(lake)
    assert sorted(r.id for r in after.collect()) == rows_before
    n_files_after = after.filter("monthyr = 'm1'").select(
        F.input_file_name()
    ).distinct().count()
    assert n_files_after == 1
    # untouched partition keeps its fragmented layout
    assert after.filter("monthyr = 'm0'").select(
        F.input_file_name()
    ).distinct().count() > 1
