"""External correctness anchor: the reference repo commits its real
long-format extracts (`Strategy Unit Update/Data/*.csv`) and
`Charts.R:39-102` consumes them. These tests push two of those REAL
files through the engine's own reader (`read_csv_checked`) and the
`is_share_chart` pivot/share plan, and compare value-for-value against
an independent engine (DuckDB) running the equivalent SQL on the same
files — plus literal spot values read off the raw CSV. Unlike the
synthetic RTT fixtures, a pass here is anchored to data the reference
actually shipped."""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from elective_waiting_times_pipeline_spark.plans.reporting import is_share_chart
from elective_waiting_times_pipeline_spark.sources.readers import read_csv_checked
from tests.oracle import _normalize

REF_DATA = "/root/reference/Strategy Unit Update/Data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DATA),
    reason="reference repo with committed extracts not mounted",
)
# the two extracts Charts.R reads for chart2 (Charts.R:39, Charts.R:69)
EXTRACTS = [
    f"{REF_DATA}/1-3-2 National trends in independent sector trends in provision of elective care.csv",
    f"{REF_DATA}/1-3-1 National trends in independent sector trends in provision of elective care.csv",
]

SCHEMA = T.StructType(
    [
        T.StructField("", T.IntegerType()),  # R row-index column, select(-1)
        T.StructField("der_activity_month", T.DateType()),
        T.StructField("type", T.StringType()),
        T.StructField("speciality", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)

_DUCK_CHART = """
WITH raw AS (
  SELECT der_activity_month, type, speciality, name, CAST(value AS DOUBLE) AS value
  FROM read_csv(?, header=true)
), wide AS (
  SELECT speciality, der_activity_month,
         MAX(CASE WHEN type = 'Independent Sector' THEN value END) AS ind,
         MAX(CASE WHEN type = 'NHS' THEN value END) AS nhs
  FROM raw WHERE name = 'Inpatient admissions'
  GROUP BY 1, 2
)
SELECT speciality, der_activity_month, 'Number of treatments' AS "Grid",
       CAST(NULL AS DOUBLE) AS "Independent sector share of total treatments (%)",
       ind AS "Independent Sector", nhs AS "NHS"
FROM wide
UNION ALL
SELECT speciality, der_activity_month,
       'Independent sector share of total treatments (%)' AS "Grid",
       ind / (ind + nhs) * 100,
       CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
FROM wide
"""


@pytest.fixture(scope="module")
def chart2(spark):
    parts = [
        is_share_chart(read_csv_checked(spark, p, schema=SCHEMA).drop("X"))
        for p in EXTRACTS
    ]
    return parts[0].unionByName(parts[1])


def test_chart2_matches_independent_engine(chart2):
    con = duckdb.connect()
    want_parts = [con.execute(_DUCK_CHART, [p]).fetchdf() for p in EXTRACTS]
    import pandas as pd

    want = pd.concat(want_parts, ignore_index=True)
    got = chart2.toPandas()
    for frame in (want, got):  # Spark DateType arrives as object; unify
        frame["der_activity_month"] = pd.to_datetime(frame["der_activity_month"])
    want, got = _normalize(want), _normalize(got)
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    for c in got.columns:
        g, w = got[c], want[c]
        if g.dtype.kind == "f":
            import numpy as np

            assert np.allclose(g.fillna(-1), w.fillna(-1), rtol=0, atol=1e-9), c
        else:
            assert g.equals(w), c


def test_chart2_spot_values_from_raw_csv(chart2):
    # literal first rows of the committed 1-3-2 extract:
    #   2018-02-01 Ophthalmology Inpatient admissions — IS 8789, NHS 44900
    rows = chart2.filter(
        (F.col("speciality") == "Ophthalmology")
        & (F.col("der_activity_month") == F.lit("2018-02-01").cast("date"))
    ).collect()
    counts = [r for r in rows if r["Grid"] == "Number of treatments"]
    shares = [r for r in rows if r["Grid"] != "Number of treatments"]
    # ophthalmic data lives only in the 1-3-2 extract (1-3-1 is
    # orthopaedic): exactly one count row and one share row
    assert len(counts) == 1 and len(shares) == 1
    assert counts[0]["Independent Sector"] == 8789.0 and counts[0]["NHS"] == 44900.0
    want_share = 8789.0 / (8789.0 + 44900.0) * 100
    assert abs(shares[0]["Independent sector share of total treatments (%)"] - want_share) < 1e-9


def test_chart2_shape_and_grid_balance(chart2):
    # every (speciality, month, extract) contributes exactly one count
    # row and one share row; counts NULL on the share grid and vice versa
    agg = chart2.groupBy("Grid").agg(
        F.count(F.lit(1)).alias("n"),
        F.count("Independent Sector").alias("n_is"),
        F.count("Independent sector share of total treatments (%)").alias("n_share"),
    ).collect()
    by_grid = {r["Grid"]: r for r in agg}
    n_counts = by_grid["Number of treatments"]
    n_shares = by_grid["Independent sector share of total treatments (%)"]
    assert n_counts["n"] == n_shares["n"] > 0
    assert n_counts["n_share"] == 0 and n_shares["n_is"] == 0
    assert n_counts["n_is"] == n_counts["n"]


# ---------------------------------------------------------------------------
# chart3_heat (Charts.R:135-181): the regional heatmap table over the
# two committed SUB-national extracts — a different real consumer
# shape than chart2 (month "MMM yy" labels, two-file stack, and the
# fct_relevel region ordering derived from mean ophthalmology share
# since 2022).
# ---------------------------------------------------------------------------
SUB_EXTRACTS = [
    f"{REF_DATA}/1-1-1 Sub-national ophthalmic trends in independent sector provision of elective care.csv",
    f"{REF_DATA}/1-1-1 Sub-national orthopaedic trends in independent sector provision of elective care.csv",
]

SUB_SCHEMA = T.StructType(
    [
        T.StructField("", T.IntegerType()),
        T.StructField("der_activity_month", T.DateType()),
        T.StructField("var_1", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("prop", T.DoubleType()),
        T.StructField("sector", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)

_DUCK_HEAT = """
WITH raw AS (
  SELECT der_activity_month, var_1 AS region, prop
  FROM read_csv(?, header=true)
  WHERE sector = 'Independent Sector' AND name = 'Inpatient admissions'
)
SELECT der_activity_month, region, ? AS specialty, prop,
       strftime(der_activity_month, '%b %y') AS monthyear
FROM raw
"""


@pytest.fixture(scope="module")
def chart3(spark):
    from elective_waiting_times_pipeline_spark.plans.reporting import heatmap_chart

    eye = read_csv_checked(spark, SUB_EXTRACTS[0], schema=SUB_SCHEMA).drop("X")
    ortho = read_csv_checked(spark, SUB_EXTRACTS[1], schema=SUB_SCHEMA).drop("X")
    return heatmap_chart(eye, ortho)


def test_chart3_heat_matches_independent_engine(chart3):
    con = duckdb.connect()
    import pandas as pd

    want = pd.concat(
        [
            con.execute(_DUCK_HEAT, [SUB_EXTRACTS[0], "Ophthalmology"]).fetchdf(),
            con.execute(_DUCK_HEAT, [SUB_EXTRACTS[1], "Orthopaedic"]).fetchdf(),
        ],
        ignore_index=True,
    )
    got = chart3.drop("region_rank").toPandas()
    for frame in (want, got):
        frame["der_activity_month"] = pd.to_datetime(frame["der_activity_month"])
    want, got = _normalize(want), _normalize(got)
    assert list(got.columns) == list(want.columns)
    assert got.shape == want.shape and got.shape[0] > 0
    for c in got.columns:
        g, w = got[c], want[c]
        if g.dtype.kind == "f":
            import numpy as np

            assert np.allclose(g, w, rtol=0, atol=1e-9), c
        else:
            assert g.equals(w), c


def test_chart3_region_rank_matches_reference_ordering(chart3):
    # replicate Charts.R:169-176 order_regions in DuckDB (ppm-snapped
    # mean, the engine's tie-proof form) and compare; regions absent
    # from the ordering slice follow alphabetically (fct_relevel keeps
    # unmatched levels)
    con = duckdb.connect()
    want_order = [
        r[0]
        for r in con.execute(
            """
            SELECT var_1 FROM read_csv(?, header=true)
            WHERE sector = 'Independent Sector' AND name = 'Inpatient admissions'
              AND der_activity_month >= DATE '2022-01-01'
            GROUP BY var_1
            ORDER BY CAST(floor(AVG(prop) * 1000000 + 0.5) AS BIGINT) DESC, var_1
            """,
            [SUB_EXTRACTS[0]],
        ).fetchall()
    ]
    got = (
        chart3.select("region", "region_rank")
        .distinct()
        .orderBy("region_rank")
        .collect()
    )
    unmatched = sorted({r.region for r in got} - set(want_order))
    assert [r.region for r in got] == want_order + unmatched
    assert [r.region_rank for r in got] == list(range(1, len(got) + 1))


def test_chart3_monthyear_label_spot_value(chart3):
    # first committed row: 2018-02-01 East of England -> "Feb 18"
    row = chart3.filter(
        (F.col("der_activity_month") == F.lit("2018-02-01").cast("date"))
        & (F.col("region") == "East of England")
        & (F.col("specialty") == "Ophthalmology")
    ).collect()
    assert len(row) == 1
    assert row[0].monthyear == "Feb 18"
    assert abs(row[0].prop - 10.5207600281492) < 1e-9


# ---------------------------------------------------------------------------
# Chart 4 (Charts.R:212-251): deprivation-quintile proportion table —
# filter to Independent Sector inpatient admissions, pivot the IMD
# quintile wide with prop values, stack ophthalmology over
# orthopaedics. A fourth REAL committed extract pair through the
# engine's reader + pivot plan, checked against DuckDB on the same
# files and a literal spot value off the raw CSV.
# ---------------------------------------------------------------------------
DEPRIV_EXTRACTS = [
    (f"{REF_DATA}/4-2-3 National trends in independent sector trends in provision of elective care.csv",
     "Ophthalmology"),
    (f"{REF_DATA}/4-1-3 National trends in independent sector trends in provision of elective care.csv",
     "Orthopaedics"),
]

DEPRIV_SCHEMA = T.StructType(
    [
        T.StructField("", T.IntegerType()),
        T.StructField("der_activity_month", T.DateType()),
        T.StructField("var_1", T.IntegerType()),
        T.StructField("name", T.StringType()),
        T.StructField("prop", T.DoubleType()),
        T.StructField("sector", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)

_DUCK_CHART4 = """
WITH raw AS (
  SELECT der_activity_month, CAST(var_1 AS INT) AS q,
         name, CAST(prop AS DOUBLE) AS prop, sector
  FROM read_csv(?, header=true)
)
SELECT ? AS specialty, der_activity_month,
       MAX(CASE WHEN q = 1 THEN prop END) AS "1 (most deprived)",
       MAX(CASE WHEN q = 2 THEN prop END) AS "2",
       MAX(CASE WHEN q = 3 THEN prop END) AS "3",
       MAX(CASE WHEN q = 4 THEN prop END) AS "4",
       MAX(CASE WHEN q = 5 THEN prop END) AS "5 (least deprived)"
FROM raw
WHERE sector = 'Independent Sector' AND name = 'Inpatient admissions'
GROUP BY 1, 2
"""


@pytest.fixture(scope="module")
def chart4(spark):
    from elective_waiting_times_pipeline_spark.plans.reporting import (
        deprivation_quintile_chart,
    )

    parts = [
        deprivation_quintile_chart(
            read_csv_checked(spark, path, schema=DEPRIV_SCHEMA).drop("X"), spec
        )
        for path, spec in DEPRIV_EXTRACTS
    ]
    return parts[0].unionByName(parts[1])


def test_chart4_matches_independent_engine(chart4):
    import numpy as np
    import pandas as pd

    con = duckdb.connect()
    want = pd.concat(
        [con.execute(_DUCK_CHART4, [path, spec]).fetchdf() for path, spec in DEPRIV_EXTRACTS],
        ignore_index=True,
    )
    got = chart4.toPandas()
    for frame in (want, got):  # Spark DateType arrives as object; unify
        frame["der_activity_month"] = pd.to_datetime(frame["der_activity_month"])
    want, got = _normalize(want), _normalize(got)
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want) > 0
    for c in got.columns:
        g, w = got[c], want[c]
        if g.dtype.kind == "f":
            # fillna sentinel BEFORE the compare: NULL-vs-value must
            # fail, not vanish into NaN arithmetic
            assert np.allclose(g.fillna(-1), w.fillna(-1), rtol=0, atol=1e-12), c
        else:
            assert g.equals(w), c


def test_chart4_spot_value_from_raw_csv(chart4):
    """Literal anchor: the committed 4-2-3 file's first data row is
    2018-02-01, quintile 1, Inpatient admissions, prop
    15.8467168123602 — that exact double must surface in the
    ophthalmology row for that month."""
    row = chart4.filter(
        (F.col("specialty") == "Ophthalmology")
        & (F.col("der_activity_month") == F.lit("2018-02-01").cast("date"))
    ).collect()
    assert len(row) == 1
    assert abs(row[0]["1 (most deprived)"] - 15.8467168123602) < 1e-12


def test_chart4_grid_shape(chart4):
    rows = chart4.collect()
    assert {r.specialty for r in rows} == {"Ophthalmology", "Orthopaedics"}
    assert set(chart4.columns) == {
        "specialty", "der_activity_month",
        "1 (most deprived)", "2", "3", "4", "5 (least deprived)",
    }
    # row count per specialty must equal the RAW extract's distinct
    # filtered months (pivot collapsing or over-filtering would shrink
    # it; a broken filter would inflate it)
    con = duckdb.connect()
    by_spec = {r.specialty: 0 for r in rows}
    for r in rows:
        by_spec[r.specialty] += 1
    for path, spec in DEPRIV_EXTRACTS:
        want_months = con.execute(
            """
            SELECT COUNT(DISTINCT der_activity_month)
            FROM read_csv(?, header=true)
            WHERE sector = 'Independent Sector' AND name = 'Inpatient admissions'
            """,
            [path],
        ).fetchone()[0]
        assert by_spec[spec] == want_months > 0


# ---------------------------------------------------------------------------
# Chart 5 (Charts.R:257-291): ethnicity proportion table — the chart4
# pivot with a DATA-DRIVEN category set (the pivot discovers its
# columns). Fifth committed-extract anchor.
# ---------------------------------------------------------------------------
ETHNICITY_EXTRACTS = [
    (f"{REF_DATA}/4-2-2 National trends in independent sector trends in provision of elective care.csv",
     "Ophthalmology"),
    (f"{REF_DATA}/4-1-2 National trends in independent sector trends in provision of elective care.csv",
     "Orthopaedic"),
]

_ETH_COLS = [
    "Asian or Asian British", "Black or Black British", "Mixed",
    "Other Ethnic Groups", "White",
]

_DUCK_CHART5 = """
WITH raw AS (
  SELECT der_activity_month, var_1, name, CAST(prop AS DOUBLE) AS prop, sector
  FROM read_csv(?, header=true)
)
SELECT ? AS specialty, der_activity_month,
       MAX(CASE WHEN var_1 = 'Asian or Asian British' THEN prop END) AS "Asian or Asian British",
       MAX(CASE WHEN var_1 = 'Black or Black British' THEN prop END) AS "Black or Black British",
       MAX(CASE WHEN var_1 = 'Mixed' THEN prop END) AS "Mixed",
       MAX(CASE WHEN var_1 = 'Other Ethnic Groups' THEN prop END) AS "Other Ethnic Groups",
       MAX(CASE WHEN var_1 = 'White' THEN prop END) AS "White"
FROM raw
WHERE sector = 'Independent Sector' AND name = 'Inpatient admissions'
GROUP BY 1, 2
"""

ETH_SCHEMA = T.StructType(
    [
        T.StructField("", T.IntegerType()),
        T.StructField("der_activity_month", T.DateType()),
        T.StructField("var_1", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("prop", T.DoubleType()),
        T.StructField("sector", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


@pytest.fixture(scope="module")
def chart5(spark):
    from elective_waiting_times_pipeline_spark.plans.reporting import category_share_chart

    parts = [
        category_share_chart(
            read_csv_checked(spark, path, schema=ETH_SCHEMA).drop("X"), spec
        )
        for path, spec in ETHNICITY_EXTRACTS
    ]
    return parts[0].unionByName(parts[1])


def test_chart5_dynamic_pivot_discovers_categories(chart5):
    assert set(chart5.columns) == {"specialty", "der_activity_month", *_ETH_COLS}


def test_chart5_matches_independent_engine(chart5):
    import numpy as np
    import pandas as pd

    con = duckdb.connect()
    want = pd.concat(
        [con.execute(_DUCK_CHART5, [path, spec]).fetchdf() for path, spec in ETHNICITY_EXTRACTS],
        ignore_index=True,
    )
    got = chart5.toPandas()
    for frame in (want, got):
        frame["der_activity_month"] = pd.to_datetime(frame["der_activity_month"])
    want, got = _normalize(want), _normalize(got)
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want) > 0
    for c in got.columns:
        g, w = got[c], want[c]
        if g.dtype.kind == "f":
            assert np.allclose(g.fillna(-1), w.fillna(-1), rtol=0, atol=1e-12), c
        else:
            assert g.equals(w), c


def test_chart5_spot_value_from_raw_csv(chart5):
    """The committed 4-2-2 file's first data row: 2018-02-01, Asian or
    Asian British, prop 7.76053215077605 — but that row is NHS sector;
    the IS row for the same month must match the raw CSV's IS value."""
    con = duckdb.connect()
    want = con.execute(
        """
        SELECT CAST(prop AS DOUBLE) FROM read_csv(?, header=true)
        WHERE sector = 'Independent Sector' AND name = 'Inpatient admissions'
          AND var_1 = 'Asian or Asian British'
          AND der_activity_month = DATE '2018-02-01'
        """,
        [ETHNICITY_EXTRACTS[0][0]],
    ).fetchone()[0]
    row = chart5.filter(
        (F.col("specialty") == "Ophthalmology")
        & (F.col("der_activity_month") == F.lit("2018-02-01").cast("date"))
    ).collect()
    assert len(row) == 1
    assert abs(row[0]["Asian or Asian British"] - want) < 1e-12


# ---------------------------------------------------------------------------
# Charts 6/7 (Charts.R:296-357): procedure-level two-panel grids —
# the chart2 stack keyed by procedure with an %in% procedure filter,
# over the committed procedure-grain extracts. Sixth/seventh real
# consumers; the two-panel builder is now shared (_two_panel_grid).
# ---------------------------------------------------------------------------
PROC_EXTRACTS = [
    (f"{REF_DATA}/3-2-1-1 National trends in independent sector trends in provision of elective care.csv",
     "Ophthalmology", ["Cataract", "Vitreous Retinal"]),
    (f"{REF_DATA}/3-1-1-1 National trends in independent sector trends in provision of elective care.csv",
     "Orthopaedic", ["Hip", "Knee", "Hand"]),
]

PROC_SCHEMA = T.StructType(
    [
        T.StructField("", T.IntegerType()),
        T.StructField("der_activity_month", T.DateType()),
        T.StructField("type", T.StringType()),
        T.StructField("speciality", T.StringType()),
        T.StructField("procedure_desc_short", T.StringType()),
        T.StructField("n_spells_IP", T.DoubleType()),
        T.StructField("n_spells_OP", T.DoubleType()),
        T.StructField("all_activity", T.DoubleType()),
    ]
)

_DUCK_CHART67 = """
WITH wide AS (
  SELECT procedure_desc_short, der_activity_month,
         MAX(CASE WHEN type = 'Independent Sector' THEN CAST(n_spells_IP AS DOUBLE) END) AS ind,
         MAX(CASE WHEN type = 'NHS' THEN CAST(n_spells_IP AS DOUBLE) END) AS nhs
  FROM read_csv(?, header=true)
  WHERE speciality = ? AND list_contains(?, procedure_desc_short)
  GROUP BY 1, 2
)
SELECT procedure_desc_short, der_activity_month, 'Number of treatments' AS "Grid",
       CAST(NULL AS DOUBLE) AS "Independent sector share of total treatments (%)",
       ind AS "Independent Sector", nhs AS "NHS"
FROM wide
UNION ALL
SELECT procedure_desc_short, der_activity_month,
       'Independent sector share of total treatments (%)',
       ind / (ind + nhs) * 100, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
FROM wide
"""


@pytest.fixture(scope="module")
def chart67(spark):
    from elective_waiting_times_pipeline_spark.plans.reporting import procedure_share_chart

    parts = [
        procedure_share_chart(
            read_csv_checked(spark, path, schema=PROC_SCHEMA).drop("X"), spec, procs
        )
        for path, spec, procs in PROC_EXTRACTS
    ]
    return parts[0].unionByName(parts[1])


def test_chart67_matches_independent_engine(chart67):
    import numpy as np
    import pandas as pd

    con = duckdb.connect()
    want = pd.concat(
        [
            con.execute(_DUCK_CHART67, [path, spec, procs]).fetchdf()
            for path, spec, procs in PROC_EXTRACTS
        ],
        ignore_index=True,
    )
    got = chart67.toPandas()
    for frame in (want, got):
        frame["der_activity_month"] = pd.to_datetime(frame["der_activity_month"])
    want, got = _normalize(want), _normalize(got)
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want) > 0
    for c in got.columns:
        g, w = got[c], want[c]
        if g.dtype.kind == "f":
            assert np.allclose(g.fillna(-1), w.fillna(-1), rtol=0, atol=1e-9), c
        else:
            assert g.equals(w), c


def test_chart67_spot_value_from_raw_csv(chart67):
    """Committed 3-2-1-1 first rows: 2018-02-01 Cataract — IS 7153
    inpatient spells; the NHS row follows in the raw file."""
    rows = chart67.filter(
        (F.col("procedure_desc_short") == "Cataract")
        & (F.col("der_activity_month") == F.lit("2018-02-01").cast("date"))
        & (F.col("Grid") == "Number of treatments")
    ).collect()
    assert len(rows) == 1
    assert rows[0]["Independent Sector"] == 7153.0


def test_chart67_procedures_filtered(chart67):
    got = {r.procedure_desc_short for r in chart67.select("procedure_desc_short").distinct().collect()}
    assert got == {"Cataract", "Vitreous Retinal", "Hip", "Knee", "Hand"}


# ---------------------------------------------------------------------------
# Chart 8 dynamic (Charts.R:405-447): waiting-band → under-3-months
# rollup share per sector/year. The under-3m bucket sums exactly TWO
# band proportions (one addition — bit-identical on both engines), so
# the comparison needs no tolerance loosening. Seventh real consumer.
# ---------------------------------------------------------------------------
BAND_EXTRACTS = [
    (f"{REF_DATA}/5-2 National trends in independent sector trends in provision of elective care.csv",
     "Ophthalmology"),
    (f"{REF_DATA}/5-1 National trends in independent sector trends in provision of elective care.csv",
     "Orthopaedic"),
]

BAND_SCHEMA = T.StructType(
    [
        T.StructField("", T.IntegerType()),
        T.StructField("year", T.IntegerType()),
        T.StructField("var_1", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("sector", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("prop", T.DoubleType()),
    ]
)

_DUCK_CHART8 = """
SELECT CAST(year AS INT) AS year, ? AS specialty, 'Under 3m' AS time_3m,
       SUM(CASE WHEN sector = 'Independent Sector' THEN CAST(prop AS DOUBLE) END)
         AS "Independent Sector",
       SUM(CASE WHEN sector = 'NHS' THEN CAST(prop AS DOUBLE) END) AS "NHS"
FROM read_csv(?, header=true)
WHERE name = 'Inpatient admissions' AND var_1 IN ('0-50', '50-100')
GROUP BY 1
"""


@pytest.fixture(scope="module")
def chart8(spark):
    from elective_waiting_times_pipeline_spark.plans.reporting import waitband_3m_chart

    parts = [
        waitband_3m_chart(read_csv_checked(spark, path, schema=BAND_SCHEMA).drop("X"), spec)
        for path, spec in BAND_EXTRACTS
    ]
    return parts[0].unionByName(parts[1])


def test_chart8_matches_independent_engine(chart8):
    import numpy as np
    import pandas as pd

    con = duckdb.connect()
    want = pd.concat(
        [con.execute(_DUCK_CHART8, [spec, path]).fetchdf() for path, spec in BAND_EXTRACTS],
        ignore_index=True,
    )
    got = chart8.toPandas()
    want, got = _normalize(want), _normalize(got)
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want) > 0
    for c in got.columns:
        g, w = got[c], want[c]
        if g.dtype.kind == "f":
            assert np.allclose(g.fillna(-1), w.fillna(-1), rtol=0, atol=1e-12), c
        else:
            assert (g == w).all(), c


def test_chart8_spot_value_from_raw_csv(chart8):
    """Committed 5-2 rows for 2018: IS 0-50 = 41.107755085712 plus the
    raw 50-100 IS prop must equal the under-3m share."""
    con = duckdb.connect()
    want = con.execute(
        """
        SELECT SUM(CAST(prop AS DOUBLE)) FROM read_csv(?, header=true)
        WHERE name = 'Inpatient admissions' AND sector = 'Independent Sector'
          AND CAST(year AS INT) = 2018 AND var_1 IN ('0-50', '50-100')
        """,
        [BAND_EXTRACTS[0][0]],
    ).fetchone()[0]
    row = chart8.filter(
        (F.col("specialty") == "Ophthalmology") & (F.col("year") == 2018)
    ).collect()
    assert len(row) == 1
    assert abs(row[0]["Independent Sector"] - want) < 1e-12
    assert row[0]["Independent Sector"] > 41.1  # includes the literal 0-50 band
