"""Gap-fill (LOCF) and rolling z-score anomaly detection on synthetic
series with known gaps and a known spike — the sf tables are dense
enough that the interesting branches (gap rows, anomaly flags, cold
start) need constructed input."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from elective_waiting_times_pipeline_spark.operators import timeseries as TS

T0 = dt.datetime(2024, 1, 1, 0, 30)


def _events(spark, rows):
    return spark.createDataFrame(
        [(i, t, 1, g, v, "{}") for i, (g, t, v) in enumerate(rows)],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )


def test_gapfill_locf_fills_missing_hours(spark):
    # hours 0, 1, 4 observed -> hours 2 and 3 are gaps carrying hour 1's value
    rows = [
        ("a", T0, 10.0),
        ("a", T0 + dt.timedelta(hours=1), 20.0),
        ("a", T0 + dt.timedelta(hours=1, minutes=10), 30.0),
        ("a", T0 + dt.timedelta(hours=4), 40.0),
    ]
    out = TS.gapfill_locf(_events(spark, rows)).orderBy("bucket").collect()
    assert [r.bucket.hour for r in out] == [0, 1, 2, 3, 4]
    assert [r.is_gap for r in out] == [False, False, True, True, False]
    assert [r.n_events for r in out] == [1, 2, 0, 0, 1]
    assert [r.avg_value for r in out] == [10.0, 25.0, None, None, 40.0]
    assert [r.filled_value for r in out] == [10.0, 25.0, 25.0, 25.0, 40.0]


def test_gapfill_groups_fill_independently(spark):
    rows = [
        ("a", T0, 1.0),
        ("a", T0 + dt.timedelta(hours=2), 2.0),
        ("b", T0 + dt.timedelta(hours=5), 5.0),
    ]
    out = TS.gapfill_locf(_events(spark, rows))
    a = out.filter(F.col("event_type") == "a").orderBy("bucket").collect()
    b = out.filter(F.col("event_type") == "b").collect()
    assert [r.filled_value for r in a] == [1.0, 1.0, 2.0]  # gap at hour 1 carries hour 0
    assert len(b) == 1 and b[0].filled_value == 5.0  # b's grid starts at its own min


def test_rolling_zscore_flags_spike_and_cold_start(spark):
    # 12 calm hours (values 10 +/- 0.5 alternating) then a spike at hour 12.
    rows = []
    for h in range(12):
        rows.append(("a", T0 + dt.timedelta(hours=h), 10.0 + (0.5 if h % 2 else -0.5)))
    rows.append(("a", T0 + dt.timedelta(hours=12), 100.0))
    out = (
        TS.rolling_zscore(_events(spark, rows), lookback=24, min_buckets=8, threshold=3.0)
        .orderBy("bucket")
        .collect()
    )
    # first 8 buckets: fewer than min_buckets trailing observations -> NULL z
    assert all(r.z_score is None and r.is_anomaly is False for r in out[:8])
    # calm buckets after warmup: |z| small
    assert all(abs(r.z_score) < 3 and not r.is_anomaly for r in out[8:12])
    spike = out[12]
    assert spike.bucket_avg == 100.0 and spike.z_score > 3 and spike.is_anomaly


def test_rolling_zscore_constant_series_never_flags(spark):
    rows = [("a", T0 + dt.timedelta(hours=h), 7.0) for h in range(20)]
    out = TS.rolling_zscore(_events(spark, rows)).collect()
    # zero trailing variance -> NULL z, never an anomaly
    assert all(r.z_score is None and r.is_anomaly is False for r in out)


def test_dyadic_ewma_halving_decay(spark):
    # constant 10.0 for 5 hours, one 20.0 spike, then 10.0 again:
    # the spike's excess halves with each following observation.
    rows = [("a", T0 + dt.timedelta(hours=h), 10.0) for h in range(5)]
    rows.append(("a", T0 + dt.timedelta(hours=5), 20.0))
    rows += [("a", T0 + dt.timedelta(hours=5 + 1 + h), 10.0) for h in range(3)]
    out = TS.dyadic_ewma(_events(spark, rows)).orderBy("bucket").collect()
    assert out[0].ewma == 10.0  # single observation = itself
    # weights 2^i / (2^L - 1): newest dominates, spike pulls up then halves away
    spike, after1, after2 = out[5].ewma, out[6].ewma, out[7].ewma
    assert 14.9 < spike < 15.2  # ~ (10*31 + 20*32)/63
    excess1, excess2 = after1 - 10.0, after2 - 10.0
    assert 0 < excess2 < excess1 < spike - 10.0
    assert abs(excess1 / excess2 - 2.0) < 0.1  # halves per observation


# ---------------------------------------------------------------------------
# Property: gapfill against an independent pandas reference on random
# sparse series — grid density, gap flags, LOCF carry, group isolation.
# ---------------------------------------------------------------------------
from hypothesis import given, settings, strategies as st  # noqa: E402

series_strategy = st.lists(
    st.tuples(
        st.sampled_from(["a", "b"]),
        st.integers(min_value=0, max_value=40),  # hour offset
        st.floats(min_value=-50, max_value=50, allow_nan=False, width=16),
    ),
    min_size=1,
    max_size=25,
)


@settings(max_examples=10, deadline=None)
@given(obs=series_strategy)
def test_gapfill_matches_pandas_reference(spark, obs):
    rows = [(g, T0 + dt.timedelta(hours=h), float(v)) for g, h, v in obs]
    out = TS.gapfill_locf(_events(spark, rows)).collect()

    # reference: per group, dense hour range with LOCF over rounded means
    import collections

    by_group = collections.defaultdict(lambda: collections.defaultdict(list))
    for g, h, v in obs:
        # replicate the engine's scaled-long mean exactly
        by_group[g][h].append(int(__import__("math").floor(float(v) * 100 + 0.5)))
    expect = {}
    for g, hours in by_group.items():
        lo, hi = min(hours), max(hours)
        carry = None
        for h in range(lo, hi + 1):
            if h in hours:
                vals = hours[h]
                avg = round(sum(vals) / 100.0 / len(vals), 6)
                carry = avg
                expect[(g, h)] = (len(vals), avg, carry, False)
            else:
                expect[(g, h)] = (0, None, carry, True)

    got = {
        (r.event_type, r.bucket.hour + 24 * (r.bucket.day - T0.day)): (
            r.n_events,
            r.avg_value,
            r.filled_value,
            r.is_gap,
        )
        for r in out
    }
    assert set(got) == set(expect)
    for k in expect:
        ge, we = got[k], expect[k]
        assert ge[0] == we[0] and ge[3] == we[3], (k, ge, we)
        for gv, wv in ((ge[1], we[1]), (ge[2], we[2])):
            if wv is None:
                assert gv is None, (k, ge, we)
            else:
                assert abs(gv - wv) < 1e-9, (k, ge, we)


def test_gapfill_interpolation_straight_line(spark):
    # observed 10.0 at hour 0 and 40.0 at hour 3: gaps at 1, 2 get 20, 30
    rows = [("a", T0, 10.0), ("a", T0 + dt.timedelta(hours=3), 40.0)]
    out = TS.gapfill_interpolate(_events(spark, rows)).orderBy("bucket").collect()
    assert [r.filled_value for r in out] == [10.0, 20.0, 30.0, 40.0]
    assert [r.is_gap for r in out] == [False, True, True, False]


def test_daily_autocorrelation_respects_calendar_gaps(spark, tmp_path):
    # A day with ZERO events must enter the series as x=0 so lag-k
    # pairs days k CALENDAR days apart — not k observed rows apart.
    import os
    import shutil

    from pyspark.sql import functions as F

    from elective_waiting_times_pipeline_spark.plans import catalog
    from tests.oracle import assert_matches_oracle

    src = "/root/testdata/sf0.001"
    sf = str(tmp_path / "sf_gap")
    (tmp_path / "sf_gap").mkdir()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "documents", "embeddings"):
        if os.path.isdir(f"{src}/{t}.parquet"):
            shutil.copytree(f"{src}/{t}.parquet", f"{sf}/{t}.parquet")
        else:
            shutil.copy(f"{src}/{t}.parquet", f"{sf}/{t}.parquet")
    # events: 10 days, day 5 missing entirely, varying daily counts
    rows = []
    eid = 0
    for d in [1, 2, 3, 4, 6, 7, 8, 9, 10, 11]:
        for i in range(d):  # count varies by day
            rows.append((eid, f"2024-03-{d:02d} 12:{i:02d}:00"))
            eid += 1
    spark.createDataFrame(rows, "event_id long, ts_s string").select(
        "event_id",
        F.col("ts_s").cast("timestamp").alias("ts"),
        F.lit(1).alias("user_id"),
        F.lit("click").alias("event_type"),
        F.lit(1.0).alias("value"),
        F.lit(None).cast("string").alias("props"),
    ).coalesce(1).write.parquet(f"{sf}/events_staging")
    # flat file like the lake layout (duckdb reads '<name>.parquet' directly)
    part = next(p for p in os.listdir(f"{sf}/events_staging") if p.endswith(".parquet"))
    shutil.move(f"{sf}/events_staging/{part}", f"{sf}/events.parquet")
    df = catalog.SPARK_QUERIES["daily_autocorrelation"](spark, sf)
    assert_matches_oracle(df, catalog.ORACLE_SQL["daily_autocorrelation"], sf)
    # the dense grid spans 11 calendar days -> overlap at lag 1 is 10,
    # which only holds if the missing day was filled with x=0
    daily_n = df.count()
    assert daily_n == 7  # 7 lag rows out
