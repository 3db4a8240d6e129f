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
