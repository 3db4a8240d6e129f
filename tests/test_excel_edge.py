"""Excel ingest edge: exercised via a monkeypatched pandas reader (the
container ships no openpyxl; the Spark-side path is what we own)."""

from __future__ import annotations

import pandas as pd
import pytest

from elective_waiting_times_pipeline_spark.sources import edges


def test_read_excel_table_spark_side(spark, monkeypatch):
    fake = pd.DataFrame({"codes": ["P1", "P2"], "names": ["A", None], "skip_me": [1, 2]})
    monkeypatch.setattr(pd, "read_excel", lambda *a, **k: fake)
    df = edges.read_excel_table(spark, "ignored.xlsx", sheet_name="IS", skiprows=13, columns=["codes", "names"])
    rows = {r.codes: r.names for r in df.collect()}
    assert rows == {"P1": "A", "P2": None}  # NaN → NULL


def test_read_excel_missing_dep_message(spark, monkeypatch):
    def boom(*a, **k):
        raise ImportError("openpyxl not found")

    monkeypatch.setattr(pd, "read_excel", boom)
    with pytest.raises(ImportError, match="openpyxl"):
        edges.read_excel_table(spark, "x.xlsx")


def test_read_excel_sheets_stacks_with_drift(spark, monkeypatch):
    """Two sheets with drifting columns stack union-by-name with NULL
    fill (the reference's 5-sheet rbind.fill loop, 1b.R:242-270)."""
    sheets = {
        "Admitted": pd.DataFrame({"code": ["P1"], "gt_01": [10.0]}),
        "Incomplete": pd.DataFrame({"code": ["P2"], "gt_02": [7.0]}),
    }
    monkeypatch.setattr(pd, "read_excel", lambda path, sheet_name=0, skiprows=0: sheets[sheet_name])
    df = edges.read_excel_sheets(spark, "ignored.xlsx", sheets=["Admitted", "Incomplete"], skiprows=13)
    got = {(r.sheet, r.code): (r.gt_01, r.gt_02) for r in df.collect()}
    assert got == {
        ("Admitted", "P1"): (10.0, None),
        ("Incomplete", "P2"): (None, 7.0),
    }
