"""Property-based tests for the histogram-quantile kernel (SURVEY §5:
quantile monotonic in q; rates bounded and consistent; suppression
threshold exact at 20)."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import Row

from elective_waiting_times_pipeline_spark.operators.histogram import histogram_stats

hist_strategy = st.dictionaries(
    keys=st.integers(min_value=1, max_value=60),
    values=st.integers(min_value=0, max_value=50),
    min_size=1,
    max_size=12,
)


def _run(spark, counts):
    rows = [Row(grp="g", band=b, cnt=c) for b, c in counts.items()]
    df = spark.createDataFrame(rows)
    out = histogram_stats(
        df, ["grp"], quantiles=(0.25, 0.5, 0.75, 0.95), le_thresholds=(18,), ge_thresholds=(52,)
    ).collect()
    return out[0]


@settings(max_examples=12, deadline=None)
@given(counts=hist_strategy)
def test_quantiles_monotonic_and_rates_consistent(spark, counts):
    r = _run(spark, counts)
    total = sum(counts.values())
    assert r.total_patients == total
    if total >= 20:
        qs = [r["weeks_25"], r["weeks_50"], r["weeks_75"], r["weeks_95"]]
        assert all(q is not None for q in qs)
        assert qs == sorted(qs), f"quantiles not monotonic: {qs}"
        # quantile bounds: within [min band - 1, max band - 1]
        bands = [b for b, c in counts.items() if c > 0] or list(counts)
        assert min(bands) - 1 <= qs[0] and qs[-1] <= max(bands) - 1
        # threshold consistency
        n_le = sum(c for b, c in counts.items() if b <= 18)
        n_ge = total - sum(c for b, c in counts.items() if b <= 52)
        assert r.number_18_or_less == n_le
        assert r.number_52_or_more == n_ge
        assert 0 <= r.rate_18wks_or_less <= 100
        assert 0 <= r.rate_52wks_or_more <= 100
    else:
        assert r["weeks_50"] is None and r.rate_18wks_or_less is None
