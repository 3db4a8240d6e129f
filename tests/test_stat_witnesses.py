"""Third-engine witnesses for the formula-heavy statistics queries.

Engine parity (Spark == DuckDB) cannot catch a formula error BOTH
sides encode — the round-6 bot_regularity cv inequality was exactly
that class. Each test here recomputes a statistic from the TEXTBOOK
formula in plain python/numpy over a constructed dataset and checks
the catalog query against it (tolerances only absorb the documented
display rounding / micro-snapping)."""

from __future__ import annotations

import datetime as dt
import math
import statistics

_EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)


def _write_events(spark, path, rows):
    spark.createDataFrame(rows, _EVENTS_SCHEMA).repartition(3).write.parquet(
        f"{path}/events.parquet"
    )


def test_welch_t_matches_textbook(spark, tmp_path):
    from elective_waiting_times_pipeline_spark.plans.catalog_relational import (
        ab_test_welch,
    )

    a = [10.25, 11.50, 9.75, 12.00, 10.00, 13.25, 8.50]
    b = [14.00, 15.25, 13.75, 16.50, 12.25]
    t0 = dt.datetime(2024, 1, 5)
    rows = [(i, t0, 1, "click", v, "{}") for i, v in enumerate(a)] + [
        (100 + i, t0, 2, "purchase", v, "{}") for i, v in enumerate(b)
    ]
    _write_events(spark, str(tmp_path), rows)
    r = ab_test_welch(spark, str(tmp_path)).collect()[0]
    ma, mb = statistics.mean(a), statistics.mean(b)
    va, vb = statistics.variance(a), statistics.variance(b)
    na, nb = len(a), len(b)
    t = (ma - mb) / math.sqrt(va / na + vb / nb)
    df = (va / na + vb / nb) ** 2 / (
        (va / na) ** 2 / (na - 1) + (vb / nb) ** 2 / (nb - 1)
    )
    assert (r.na, r.nb) == (na, nb)
    assert abs(r.mean_a - ma) < 1e-6 and abs(r.mean_b - mb) < 1e-6
    assert abs(r.t_stat - t) < 1e-5
    assert abs(r.welch_df - df) < 2e-4


def test_theil_sen_matches_textbook(spark, tmp_path):
    from elective_waiting_times_pipeline_spark.plans.catalog_events import (
        theil_sen_trend,
    )

    daily = [5.00, 7.00, 6.50, 9.00, 8.25, 12.00]  # dollars per day
    rows = [
        (i, dt.datetime(2024, 1, 1) + dt.timedelta(days=i, hours=3), 1, "click", v, "{}")
        for i, v in enumerate(daily)
    ]
    _write_events(spark, str(tmp_path), rows)
    r = theil_sen_trend(spark, str(tmp_path)).collect()
    assert len(r) == 1
    slopes = [
        (daily[j] - daily[i]) / (j - i)
        for i in range(len(daily))
        for j in range(i + 1, len(daily))
    ]
    assert r[0].n_pairs == len(slopes)
    assert abs(r[0].sen_slope - statistics.median(slopes)) < 1e-6


def test_cusum_changepoint_matches_textbook(spark, tmp_path):
    from elective_waiting_times_pipeline_spark.plans.catalog_events import (
        cusum_changepoint,
    )

    # level shift after day 3: the cumulative deviation from the grand
    # mean must peak exactly at the last pre-shift day
    daily = [10.0, 11.0, 10.5, 10.2, 20.0, 21.0, 20.5, 19.8]
    rows = [
        (i, dt.datetime(2024, 2, 1) + dt.timedelta(days=i, hours=1), 1, "view", v, "{}")
        for i, v in enumerate(daily)
    ]
    _write_events(spark, str(tmp_path), rows)
    r = cusum_changepoint(spark, str(tmp_path)).collect()
    assert len(r) == 1
    mean = statistics.mean(daily)
    cus, best_k, best_abs, best_val = 0.0, None, -1.0, None
    for k, v in enumerate(daily):
        cus += v - mean
        if abs(cus) > best_abs + 1e-12:
            best_k, best_abs, best_val = k, abs(cus), cus
    assert r[0].n_days == len(daily)
    assert r[0].cp_day == dt.datetime(2024, 2, 1) + dt.timedelta(days=best_k)
    assert abs(r[0].cusum_peak - best_val) < 1e-6


def test_psi_drift_matches_textbook(spark, tmp_path):
    from elective_waiting_times_pipeline_spark.plans.catalog_events import psi_drift

    ref_vals = [10.0, 12.0, 30.0, 31.0, 55.0, 56.0, 10.5, 11.0]   # before Jan 16
    cur_vals = [30.0, 31.5, 55.0, 57.0, 80.0, 81.0, 82.0, 30.5]   # after (shifted up)
    t_ref, t_cur = dt.datetime(2024, 1, 5), dt.datetime(2024, 1, 20)
    rows = [(i, t_ref, 1, "view", v, "{}") for i, v in enumerate(ref_vals)] + [
        (100 + i, t_cur, 1, "view", v, "{}") for i, v in enumerate(cur_vals)
    ]
    _write_events(spark, str(tmp_path), rows)
    r = psi_drift(spark, str(tmp_path)).collect()[0]
    buckets: dict[int, list[int]] = {}
    for v in ref_vals:
        b = math.floor(v * 100 + 0.5) // 2500
        buckets.setdefault(b, [0, 0])[0] += 1
    for v in cur_vals:
        b = math.floor(v * 100 + 0.5) // 2500
        buckets.setdefault(b, [0, 0])[1] += 1
    nref = {b: c[0] + 1 for b, c in buckets.items()}   # Laplace +1
    ncur = {b: c[1] + 1 for b, c in buckets.items()}
    tr, tc = sum(nref.values()), sum(ncur.values())
    psi = sum(
        (ncur[b] / tc - nref[b] / tr) * math.log((ncur[b] / tc) / (nref[b] / tr))
        for b in buckets
    )
    assert r.n_buckets == len(buckets)
    assert abs(r.psi - psi) < 1e-4


def test_benford_profile_matches_textbook(spark, tmp_path):
    from elective_waiting_times_pipeline_spark.plans.catalog_relational import (
        _BENFORD_PPM,
        benford_first_digit,
    )

    # the embedded expectations must BE Benford's law, not near it
    for d in range(1, 10):
        assert _BENFORD_PPM[d] == math.floor(1e6 * math.log10(1 + 1 / d) + 0.5)

    vals = [123.45, 19.99, 234.00, 345.10, 3.33, 111.11, 9.87, 88.80]
    spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "o_custkey long, o_totalprice double"
    ).write.parquet(f"{tmp_path}/orders.parquet")
    got = {
        r.digit: (r.n_orders, r.observed_ppm, r.expected_ppm, r.deviation_ppm)
        for r in benford_first_digit(spark, str(tmp_path)).collect()
    }
    counts: dict[int, int] = {}
    for v in vals:
        counts[int(str(math.floor(v * 100 + 0.5))[0])] = (
            counts.get(int(str(math.floor(v * 100 + 0.5))[0]), 0) + 1
        )
    n = len(vals)
    for d, c in counts.items():
        obs = math.floor(1e6 * c / n + 0.5)
        exp = math.floor(1e6 * math.log10(1 + 1 / d) + 0.5)
        assert got[d] == (c, obs, exp, obs - exp)
    assert set(got) == set(counts)


def test_target_encoding_matches_textbook(spark, tmp_path):
    from elective_waiting_times_pipeline_spark.plans.catalog_relational import (
        target_encode_smoothed,
    )

    segs = {"AUTO": [100.0, 200.0, 150.0], "HOME": [50.0]}
    cust, orders, cid = [], [], 0
    for s, vals in segs.items():
        for v in vals:
            cust.append((cid, s))
            orders.append((cid, v))
            cid += 1
    spark.createDataFrame(cust, "c_custkey long, c_mktsegment string").write.parquet(
        f"{tmp_path}/customer.parquet"
    )
    spark.createDataFrame(orders, "o_custkey long, o_totalprice double").write.parquet(
        f"{tmp_path}/orders.parquet"
    )
    got = {r.segment: (r.n, r.target_enc) for r in target_encode_smoothed(spark, str(tmp_path)).collect()}
    flat = [v for vals in segs.values() for v in vals]
    prior = sum(flat) / len(flat)
    for s, vals in segs.items():
        want = (sum(vals) + 20 * prior) / (len(vals) + 20)
        assert got[s][0] == len(vals)
        assert abs(got[s][1] - want) < 1e-6


def test_chi_square_matches_textbook(spark, tmp_path):
    from elective_waiting_times_pipeline_spark.plans.catalog_text import (
        chi_square_independence,
    )

    # lang x source contingency: en/src0 30, en/src1 10, de/src0 5, de/src1 25
    cells = {("en", "src0"): 30, ("en", "src1"): 10, ("de", "src0"): 5, ("de", "src1"): 25}
    rows, did = [], 0
    for (lang, src), c in cells.items():
        for _ in range(c):
            rows.append((did, "x", lang, src, 1))
            did += 1
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{tmp_path}/documents.parquet")
    r = chi_square_independence(spark, str(tmp_path)).collect()[0]
    n = sum(cells.values())
    rn = {"en": 40, "de": 30}
    cn = {"src0": 35, "src1": 35}
    chi = sum(
        (o - rn[l] * cn[s] / n) ** 2 / (rn[l] * cn[s] / n)
        for (l, s), o in cells.items()
    )
    assert r.n_cells == 4
    assert abs(r.chi_square - chi) < 1e-3


def test_ks_two_sample_matches_textbook(spark, tmp_path):
    from elective_waiting_times_pipeline_spark.plans.catalog_text import ks_test_sources

    a = [10, 12, 12, 15, 18, 20]       # src0 n_chars
    b = [14, 15, 19, 22, 25, 25, 30]   # src1
    rows = [(i, "t", "en", "src0", v) for i, v in enumerate(a)] + [
        (100 + i, "t", "en", "src1", v) for i, v in enumerate(b)
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{tmp_path}/documents.parquet")
    r = ks_test_sources(spark, str(tmp_path)).collect()[0]
    vs = sorted(set(a) | set(b))
    best_d, best_v = -1.0, None
    for v in vs:
        d = abs(
            sum(1 for x in a if x <= v) / len(a)
            - sum(1 for x in b if x <= v) / len(b)
        )
        if d > best_d + 1e-12:
            best_d, best_v = d, v
    assert (r.n_a, r.n_b) == (len(a), len(b))
    assert r.ks_at == best_v
    assert abs(r.ks_stat - best_d) < 1e-6


def test_readability_matches_textbook(spark, tmp_path):
    import re

    from elective_waiting_times_pipeline_spark.plans.catalog_text import (
        readability_score,
    )

    texts = [
        "The cat sat on the mat. It was happy!",
        "Complicated administrative considerations notwithstanding, proceedings continued unabated.",
        "no marks here at all",
    ]
    rows = [(i, t, "en", "s0", len(t)) for i, t in enumerate(texts)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{tmp_path}/documents.parquet")
    r = readability_score(spark, str(tmp_path)).collect()[0]
    w = sum(len(t.split()) for t in texts)
    s = sum(max(len(re.findall(r"[.!?]+", t)), 1) for t in texts)
    y = sum(len(re.findall(r"[aeiou]+", t.lower())) for t in texts)
    want = 206.835 - 1.015 * (w / s) - 84.6 * (y / w)
    assert (r.n_docs, r.n_words) == (len(texts), w)
    assert abs(r.flesch_proxy - want) < 1e-6
