"""Wide↔array band adapters and the idempotent landing-zone fetch."""

from __future__ import annotations

import os
import zipfile

from elective_waiting_times_pipeline_spark.operators.histogram import (
    band_array_to_wide,
    wide_to_band_array,
)
from elective_waiting_times_pipeline_spark.plans.ingest import download_if_missing


def test_wide_array_roundtrip(spark):
    df = spark.createDataFrame(
        [("a", 1, None, 3)],
        "k string, `Gt.00.To.01.Weeks.SUM.1` long, `Gt.01.To.02.Weeks.SUM.1` long, `Gt.02.To.03.Weeks.SUM.1` long",
    )
    gt = [c for c in df.columns if c.startswith("Gt")]
    arr = wide_to_band_array(df, gt)
    row = arr.select("wait_band_counts").collect()[0][0]
    assert row == [1, None, 3]  # NULL cells preserved (band drift recoverable)
    back = band_array_to_wide(arr.select("k", "wait_band_counts"), n_bands=3)
    r = back.collect()[0]
    assert r["Gt.00.To.01.Weeks.SUM.1"] == 1
    assert r["Gt.01.To.02.Weeks.SUM.1"] is None
    assert r["Gt.02.To.03.Weeks.SUM.1"] == 3


def test_download_if_missing_idempotent_and_unzip(tmp_path):
    src = tmp_path / "src.zip"
    with zipfile.ZipFile(src, "w") as z:
        z.writestr("inner.csv", "a,b\n1,2\n")
    url = f"file://{src}"
    dest = str(tmp_path / "landing")
    p1 = download_if_missing(url, dest, unzip=True)
    assert os.path.exists(os.path.join(dest, "inner.csv"))
    mtime = os.path.getmtime(p1)
    p2 = download_if_missing(url, dest, unzip=True)  # skip re-download
    assert p2 == p1 and os.path.getmtime(p2) == mtime
