"""RTT kernel edge cases beyond the random-fixture sweep."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from elective_waiting_times_pipeline_spark.plans import rtt
from tests.rtt_fixture import ALL_GT_COLS, gt_col


def _mini_fact(spark, rows):
    base = {
        "Period": "RTT-Apr20",
        "monthyr": "Apr20",
        "Provider.Org.Code": "P1",
        "Provider.Org.Name": "P1 TRUST",
        "Commissioner.Org.Code": "C1",
        "Commissioner.Org.Name": "C1 NAME",
        "RTT.Part.Description": "Completed Pathways For Admitted Patients",
        "Treatment.Function.Name": "Total",
        **{c: None for c in ALL_GT_COLS},
        "Patients.with.unknown.clock.start.date": None,
        "Total": 0,
        "Total.All": 0,
        "IS_provider": 0,
    }
    return spark.createDataFrame(pd.DataFrame([{**base, **r} for r in rows]))


def _stats(spark, fact, key):
    rows, long = rtt.prepare_fact(fact)
    out = rtt.dashboard_stats(rows, long, geo_col="ccg").toPandas()
    sel = out[
        (out.monthyear == key[0]) & (out.ccg == key[1]) & (out.specialty == key[2])
        & (out.type == key[3]) & (out.independent == key[4])
    ]
    assert len(sel) == 1, f"expected 1 row for {key}, got {len(sel)}"
    return sel.iloc[0]


def test_unknown_start_only_group(spark):
    """All bands NULL but 30 unknown-clock-start patients: complete
    totals include them (2.R:199-204), stats suppressed (nonmiss=0)."""
    fact = _mini_fact(spark, [{"Patients.with.unknown.clock.start.date": 30, "Total.All": 30}])
    r = _stats(spark, fact, ("Apr20", "C1", "Total", "completeadmitted", "All"))
    assert r["total.patients"] == 30
    assert pd.isna(r["weeks.50"]) and pd.isna(r["rate.18wks.or.less"])


def test_newrtt_uses_total_all_and_suppresses(spark):
    fact = _mini_fact(
        spark,
        [{"RTT.Part.Description": "New RTT Periods - All Patients", gt_col(1): 500, "Total.All": 123}],
    )
    r = _stats(spark, fact, ("Apr20", "C1", "Total", "newRTT", "All"))
    # newRTT: total = Total.All regardless of band columns; never stats
    assert r["total.patients"] == 123
    assert pd.isna(r["weeks.50"])


def test_incomplete_total_excludes_unknown(spark):
    fact = _mini_fact(
        spark,
        [
            {
                "RTT.Part.Description": "Incomplete Pathways",
                gt_col(1): 25,
                "Patients.with.unknown.clock.start.date": 99,
                "Total.All": 124,
            }
        ],
    )
    r = _stats(spark, fact, ("Apr20", "C1", "Total", "incomplete", "All"))
    assert r["total.patients"] == 25  # unknown-start not counted (2.R:212-218)
    assert r["weeks.50"] == 0  # all 25 in band 1 → median crosses at band 1


def test_all_waits_beyond_18_weeks_zero_not_null(spark):
    fact = _mini_fact(spark, [{"RTT.Part.Description": "Incomplete Pathways", gt_col(40): 50}])
    r = _stats(spark, fact, ("Apr20", "C1", "Total", "incomplete", "All"))
    assert r["number.18.or.less"] == 0 and r["rate.18wks.or.less"] == 0.0
    assert r["number.52.or.more"] == 0
    assert r["weeks.50"] == 39


def test_provider_stats_exact_is_flag(spark):
    fact = _mini_fact(
        spark,
        [
            {"RTT.Part.Description": "Incomplete Pathways", gt_col(1): 30, "IS_provider": 1},
            {
                "Provider.Org.Code": "P2",
                "Provider.Org.Name": "P2 TRUST",
                "RTT.Part.Description": "Incomplete Pathways",
                gt_col(2): 40,
            },
        ],
    )
    rows, long = rtt.prepare_fact(fact)
    out = rtt.provider_stats_exact(rows, long).toPandas()
    by_prov = {r["provider"]: r for _, r in out[out.type == "incomplete"].iterrows()}
    assert by_prov["P1 TRUST"]["IS"] == "1"
    assert by_prov["P2 TRUST"]["IS"] == "0"
    assert by_prov["ENGLAND"]["IS"] == "0"  # 2.R:183-185
    assert by_prov["ENGLAND"]["total.patients"] == 70
