"""The full user story in one test: monthly frames → partitioned lake
→ dashboard statistics → reporting ratios → golden CSV — the complete
reference workflow (1b → 2 → 3d → fwrite) through the engine's real
surfaces, checked against the pure-Python R-kernel replica."""

from __future__ import annotations

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F

from elective_waiting_times_pipeline_spark.plans import ingest, reporting, rtt
from elective_waiting_times_pipeline_spark.sources.edges import write_csv
from tests.rtt_fixture import make_fixture, oracle_stats


def test_full_pipeline_lake_to_golden_csv(spark, tmp_path):
    pdf = make_fixture()
    monthly = [
        spark.createDataFrame(pdf[pdf.monthyr == m].drop(columns=["IS_provider"]))
        for m in ("Apr20", "May20")
    ]
    members = spark.createDataFrame(
        [("Apr20", "P04", "n", "r"), ("May20", "P04", "n", "r"), ("May20", "P05", "n", "r")],
        "monthyr string, codes string, names string, region string",
    )
    lake = str(tmp_path / "lake")
    ingest.build_fact_lake(monthly, members, lake)

    fact = spark.read.parquet(lake)
    rows, long = rtt.prepare_fact(fact)
    stats = rtt.dashboard_stats(rows, long, geo_col="ccg")

    out_dir = str(tmp_path / "summary_csv")
    write_csv(stats, out_dir, single_file=True)
    files = [f for f in os.listdir(out_dir) if f.endswith(".csv")]
    assert len(files) == 1
    golden = pd.read_csv(os.path.join(out_dir, files[0]))
    assert set(golden.columns) >= {
        "monthyear", "ccg", "specialty", "type", "independent",
        "total.patients", "number.18.or.less", "rate.18wks.or.less",
        "number.52.or.more", "rate.52wks.or.more", "weeks.50", "weeks.92", "weeks.95",
    }

    # spot-check a cell of the CSV against the R-kernel replica
    want = oracle_stats(pdf, "May20", "ENGLAND", "Total", "incomplete", "All")
    row = golden[
        (golden.monthyear == "May20") & (golden.ccg == "ENGLAND")
        & (golden.specialty == "Total") & (golden.type == "incomplete")
        & (golden.independent == "All")
    ].iloc[0]
    assert int(row["total.patients"]) == want["total.patients"]
    assert int(row["weeks.50"]) == want["weeks.50"]
    assert float(row["rate.52wks.or.more"]) == want["rate.52wks.or.more"]

    # ratios flow from the same stats (3d)
    ratios = reporting.ratio_started_vs_completed(stats)
    assert ratios.filter(F.col("prop_all").isNotNull()).count() > 0


def test_apply_patches_overrides_only_matched(spark):
    df = spark.createDataFrame(
        [("P1", "WRONG", 5), ("P2", "London", 7)], "code string, region string, v int"
    )
    patches = spark.createDataFrame([("P1", "Midlands")], "code string, region string")
    out = {r.code: (r.region, r.v) for r in reporting.apply_patches(df, patches, ["code"], ["region"]).collect()}
    assert out == {"P1": ("Midlands", 5), "P2": ("London", 7)}
