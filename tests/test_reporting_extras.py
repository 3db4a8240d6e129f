"""Ratio analysis (3d) and Strategy-Unit re-bucketing (Charts.R)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from elective_waiting_times_pipeline_spark.plans import reporting, rtt
from tests.rtt_fixture import make_fixture, oracle_stats


def test_ratio_started_vs_completed(spark):
    pdf = make_fixture()
    fact = spark.createDataFrame(pdf)
    rows, long = rtt.prepare_fact(fact)
    stats = rtt.dashboard_stats(rows, long, geo_col="ccg")
    ratios = reporting.ratio_started_vs_completed(stats)
    got = {
        (r.monthyear, r.ccg, r.specialty, r.independent): r
        for r in ratios.collect()
    }
    # Verify one cell against the pure-Python oracle
    key = ("Apr20", "ENGLAND", "Total", "All")
    w_new = oracle_stats(pdf, "Apr20", "ENGLAND", "Total", "newRTT", "All")
    w_adm = oracle_stats(pdf, "Apr20", "ENGLAND", "Total", "completeadmitted", "All")
    w_non = oracle_stats(pdf, "Apr20", "ENGLAND", "Total", "completenonadmitted", "All")
    r = got[key]
    assert r.started == w_new["total.patients"]
    assert r.completed == w_adm["total.patients"] + w_non["total.patients"]
    assert r.prop_all == pytest.approx(w_new["total.patients"] / (w_adm["total.patients"] + w_non["total.patients"]))
    assert r.prop_adm == pytest.approx(w_new["total.patients"] / w_adm["total.patients"])
    assert r.Provider == "Total"
    assert got[("Apr20", "ENGLAND", "Total", "Non-IS")].Provider == "NHS"


def test_rebucket_day_waits(spark):
    rows = []
    for b, p in [("0-50", 0.1), ("50-100", 0.2), ("100-150", 0.3), ("350-400", 0.4)]:
        rows.append(("2022", b, "Inpatient admissions", "NHS", 100, p))
        rows.append(("2022", b, "Inpatient admissions", "Independent Sector", 50, p / 2))
    df = spark.createDataFrame(rows, "year string, var_1 string, name string, sector string, value long, prop double")
    out = reporting.rebucket_day_waits(df)
    got = {r.time_bucket: r for r in out.collect()}
    assert got["Under 3m"]["prop.NHS"] == pytest.approx(0.3)
    assert got["Over 3m"]["prop.NHS"] == pytest.approx(0.7)
    assert got["Under 3m"]["prop.Independent Sector"] == pytest.approx(0.15)
    # year-horizon ladder (Charts.R time_year)
    yr = {r.time_bucket: r for r in reporting.rebucket_day_waits(df, horizon="year").collect()}
    assert yr["Under a year"]["prop.NHS"] == pytest.approx(0.6)
    assert yr["Over a year"]["prop.NHS"] == pytest.approx(0.4)


def test_percentile_approx_within_rank_error(spark, sf_dir):
    """percentile_approx(accuracy=1000) must land within 1/1000 rank
    error of the exact percentile — checked by rank, not value."""
    from elective_waiting_times_pipeline_spark.plans import catalog

    approx = {
        r.o_orderpriority: r.median_price_approx
        for r in catalog.SPARK_QUERIES["percentile_approx_sketch"](spark, sf_dir).collect()
    }
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    for prio, est in approx.items():
        vals = sorted(
            r.o_totalprice for r in orders.filter(orders.o_orderpriority == prio).collect()
        )
        import bisect

        rank = bisect.bisect_left(vals, est) / len(vals)
        assert abs(rank - 0.5) <= 0.01 + 1.0 / 1000, (prio, rank)


# --- custom categorical ordering (3c.R:628-642) -------------------------------

def test_category_rank_listed_unlisted_null(spark):
    from elective_waiting_times_pipeline_spark.functions.ordering import (
        REGION_ORDER,
        with_category_order,
    )

    df = spark.createDataFrame(
        [("London",), ("England",), ("Narnia",), (None,), ("North East",)],
        "region string",
    )
    got = {r.region: r.region_rank for r in with_category_order(df, "region", REGION_ORDER).collect()}
    assert got["England"] == 1
    assert got["North East"] == 2
    assert got["London"] == 8
    assert got["Narnia"] == len(REGION_ORDER) + 1  # unlisted after listed
    assert got[None] == len(REGION_ORDER) + 2  # NULL last


def test_casemix_presentation_order(spark):
    from elective_waiting_times_pipeline_spark.plans import reporting

    rows = [
        # (region, Pathway, Specialty, avg_IS)
        ("London", "Admitted", "Urology", 5.0),
        ("London", "Admitted", "Total", 2.0),       # pinned to top via 1000
        ("England", "Admitted", "Ophthalmology", 9.0),
        ("North East", "Admitted", "Urology", 7.0),
        ("England", "Non-admitted", "Urology", 1.0),
    ]
    df = spark.createDataFrame(rows, "region string, Pathway string, Specialty string, avg_IS double")
    out = [(r.region, r.Pathway, r.Specialty) for r in reporting.casemix_presentation(df).collect()]
    assert out == [
        ("England", "Admitted", "Ophthalmology"),
        ("North East", "Admitted", "Urology"),
        ("London", "Admitted", "Total"),
        ("London", "Admitted", "Urology"),
        ("England", "Non-admitted", "Urology"),
    ]
    # avg_IS column untouched (sort used a scratch column)
    cols = reporting.casemix_presentation(df).columns
    assert cols == ["region", "Pathway", "Specialty", "avg_IS"]
