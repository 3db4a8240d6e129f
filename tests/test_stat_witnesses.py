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


def test_mann_kendall_matches_textbook(spark, tmp_path):
    from elective_waiting_times_pipeline_spark.plans.catalog_events import (
        trend_mann_kendall,
    )

    daily = [10.0, 12.0, 11.0, 15.0, 14.0, 18.0]  # distinct (no tie term)
    rows = [
        (i, dt.datetime(2024, 1, 1) + dt.timedelta(days=i, hours=2), 1, "view", v, "{}")
        for i, v in enumerate(daily)
    ]
    _write_events(spark, str(tmp_path), rows)
    r = trend_mann_kendall(spark, str(tmp_path)).collect()
    assert len(r) == 1
    s = sum(
        (1 if daily[j] > daily[i] else -1 if daily[j] < daily[i] else 0)
        for i in range(len(daily))
        for j in range(i + 1, len(daily))
    )
    n = len(daily)
    z = (s - (1 if s > 0 else -1 if s < 0 else 0)) / math.sqrt(
        n * (n - 1) * (2 * n + 5) / 18
    )
    assert (r[0].mk_s, r[0].n_days) == (s, n)
    assert abs(r[0].mk_z - z) < 1e-6


def test_geometric_mean_matches_textbook(spark, tmp_path):
    from elective_waiting_times_pipeline_spark.plans.catalog_relational import (
        geometric_mean,
    )

    groups = {"1-URGENT": [100.0, 400.0, 900.0], "2-HIGH": [50.0, 200.0]}
    rows = [(p, v) for p, vals in groups.items() for v in vals]
    spark.createDataFrame(
        rows, "o_orderpriority string, o_totalprice double"
    ).write.parquet(f"{tmp_path}/orders.parquet")
    got = {r.o_orderpriority: (r.n, r.geo_mean) for r in geometric_mean(spark, str(tmp_path)).collect()}
    for p, vals in groups.items():
        want = math.exp(sum(math.log(v) for v in vals) / len(vals))
        assert got[p][0] == len(vals)
        assert abs(got[p][1] - want) < want * 2e-6 + 2e-4


def test_gini_matches_mean_absolute_difference_form(spark, tmp_path):
    """The query uses the rank form G = 2*sum(i*x_(i))/(n*sum x) -
    (n+1)/n; the witness computes the DIFFERENT algebraic form
    G = sum_ij |x_i - x_j| / (2 n^2 mean) — they must agree."""
    from elective_waiting_times_pipeline_spark.plans.catalog_text import source_gini

    xs = [100, 250, 250, 900, 1500, 40]
    rows = [(i, "t", "en", "s0", x) for i, x in enumerate(xs)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{tmp_path}/documents.parquet")
    r = source_gini(spark, str(tmp_path)).collect()[0]
    n, mean = len(xs), statistics.mean(xs)
    mad = sum(abs(a - b) for a in xs for b in xs) / (2 * n * n * mean)
    assert r.n_docs == n
    assert abs(r.gini - mad) < 1e-6


def test_lexical_diversity_matches_textbook(spark, tmp_path):
    from elective_waiting_times_pipeline_spark.plans.catalog_text import (
        lexical_diversity,
    )

    texts = ["a b b c", "c d d d", "e"]
    rows = [(i, t, "en", "s0", len(t)) for i, t in enumerate(texts)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{tmp_path}/documents.parquet")
    r = lexical_diversity(spark, str(tmp_path)).collect()[0]
    toks = [w for t in texts for w in t.split()]
    counts: dict[str, int] = {}
    for w in toks:
        counts[w] = counts.get(w, 0) + 1
    hapax = sum(1 for c in counts.values() if c == 1)
    assert (r.vocab, r.n_tokens) == (len(counts), len(toks))
    assert abs(r.hapax_ratio - hapax / len(counts)) < 1e-6
    assert abs(r.type_token_ratio - len(counts) / len(toks)) < 1e-6


def test_char_entropy_matches_shannon_definition(spark, tmp_path):
    """Query computes H = ln L - (sum k ln k)/L; witness computes the
    definitional H = -sum p ln p — algebraically equal, numerically
    independent."""
    from elective_waiting_times_pipeline_spark.plans.catalog_text import char_entropy

    texts = ["aabb", "abcabcabc", "zzzzz"]
    rows = [(i, t, "en", "s0", len(t)) for i, t in enumerate(texts)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{tmp_path}/documents.parquet")
    got = {r.doc_id: (r.n_chars, r.char_entropy) for r in char_entropy(spark, str(tmp_path)).collect()}
    for i, t in enumerate(texts):
        counts: dict[str, int] = {}
        for ch in t:
            counts[ch] = counts.get(ch, 0) + 1
        L = len(t)
        h = -sum((k / L) * math.log(k / L) for k in counts.values())
        assert got[i][0] == L
        assert abs(got[i][1] - h) < 1e-4


def test_mutual_information_matches_textbook(spark, tmp_path):
    from elective_waiting_times_pipeline_spark.plans.catalog_text import (
        mutual_information,
    )

    cells = {("en", "src0"): 30, ("en", "src1"): 10, ("de", "src0"): 5, ("de", "src1"): 25}
    rows, did = [], 0
    for (lang, src), c in cells.items():
        for _ in range(c):
            rows.append((did, "x", lang, src, 1))
            did += 1
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{tmp_path}/documents.parquet")
    r = mutual_information(spark, str(tmp_path)).collect()[0]
    n = sum(cells.values())
    ni = {"en": 40, "de": 30}
    nj = {"src0": 35, "src1": 35}
    mi = sum(
        (c / n) * math.log((c * n) / (ni[l] * nj[s])) for (l, s), c in cells.items()
    )
    assert (r.n_docs, r.n_cells) == (n, 4)
    assert abs(r.mi_nats - mi) < 1e-4


def test_source_divergence_matches_smoothed_kl(spark, tmp_path):
    from elective_waiting_times_pipeline_spark.plans.catalog_text import (
        source_divergence,
    )

    texts = {"s0": ["a a b c", "a b"], "s1": ["c c d", "d d d c"]}
    rows, did = [], 0
    for src, ts in texts.items():
        for t in ts:
            rows.append((did, t, "en", src, len(t)))
            did += 1
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{tmp_path}/documents.parquet")
    got = {r.source: (r.n_tokens, r.kl_divergence) for r in source_divergence(spark, str(tmp_path)).collect()}
    per_src: dict[str, dict[str, int]] = {}
    corpus: dict[str, int] = {}
    for src, ts in texts.items():
        d = per_src.setdefault(src, {})
        for t in ts:
            for w in t.split():
                d[w] = d.get(w, 0) + 1
                corpus[w] = corpus.get(w, 0) + 1
    V = len(corpus)
    N = sum(corpus.values())
    for src, d in per_src.items():
        n_s = sum(d.values())
        kl = sum(
            ((d.get(t, 0) + 0.5) / (n_s + 0.5 * V))
            * math.log(
                ((d.get(t, 0) + 0.5) / (n_s + 0.5 * V))
                / ((corpus[t] + 0.5) / (N + 0.5 * V))
            )
            for t in corpus
        )
        assert got[src][0] == n_s
        assert abs(got[src][1] - kl) < 1e-4


def test_supplier_hhi_matches_share_squares(spark, tmp_path):
    from elective_waiting_times_pipeline_spark.plans.catalog_tpch import supplier_hhi

    li = [
        (1, 7, 100.0, 0.10), (1, 7, 50.0, 0.00), (1, 8, 300.0, 0.05),
        (2, 9, 40.0, 0.00),
    ]
    spark.createDataFrame(
        li, "l_partkey long, l_suppkey long, l_extendedprice double, l_discount double"
    ).write.parquet(f"{tmp_path}/lineitem.parquet")
    spark.createDataFrame(
        [(1, "BRASS"), (2, "STEEL")], "p_partkey long, p_type string"
    ).write.parquet(f"{tmp_path}/part.parquet")
    got = {r.p_type: (r.n_suppliers, r.hhi) for r in supplier_hhi(spark, str(tmp_path)).collect()}
    rev: dict[tuple, int] = {}
    types = {1: "BRASS", 2: "STEEL"}
    for pk, sk, price, disc in li:
        r_ = round(price * 100) * (100 - round(disc * 100))
        rev[(types[pk], sk)] = rev.get((types[pk], sk), 0) + r_
    for t in set(types.values()):
        revs = [v for (tt, _), v in rev.items() if tt == t]
        tot = sum(revs)
        hhi = sum((v / tot) ** 2 for v in revs)
        assert got[t][0] == len(revs)
        assert abs(got[t][1] - hhi) < 1e-6


def test_anova_matches_decomposition_from_raw_values(spark, tmp_path):
    """Query computes eta^2/F from moment sums; witness decomposes
    SSB/SSW directly from the raw per-group values."""
    from elective_waiting_times_pipeline_spark.plans.catalog_tpch import (
        price_anova_brand,
    )

    groups = {"Brand#1": [10.0, 12.0, 11.5, 14.0], "Brand#2": [20.0, 22.5, 19.0]}
    li, part, pk = [], [], 0
    for b, vals in groups.items():
        for v in vals:
            part.append((pk, b))
            li.append((pk, v))
            pk += 1
    spark.createDataFrame(li, "l_partkey long, l_extendedprice double").write.parquet(
        f"{tmp_path}/lineitem.parquet"
    )
    spark.createDataFrame(part, "p_partkey long, p_brand string").write.parquet(
        f"{tmp_path}/part.parquet"
    )
    r = price_anova_brand(spark, str(tmp_path)).collect()[0]
    allv = [v for vals in groups.values() for v in vals]
    gm = statistics.mean(allv)
    ssb = sum(len(v) * (statistics.mean(v) - gm) ** 2 for v in groups.values())
    ssw = sum(sum((x - statistics.mean(v)) ** 2 for x in v) for v in groups.values())
    k, nn = len(groups), len(allv)
    assert (r.n_groups, r.n_rows) == (k, nn)
    assert abs(r.eta_sq - ssb / (ssb + ssw)) < 1e-6
    assert abs(r.f_stat - (ssb / (k - 1)) / (ssw / (nn - k))) < 1e-5


def test_corr_stats_matches_numpy(spark, tmp_path):
    import numpy as np

    from elective_waiting_times_pipeline_spark.plans.catalog_relational import (
        corr_stats,
    )

    q = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0]
    p = [10.0, 22.0, 28.0, 44.0, 49.0, 66.0]
    d = [0.00, 0.05, 0.10, 0.02, 0.07, 0.04]
    spark.createDataFrame(
        [("A", q[i], p[i], d[i]) for i in range(len(q))],
        "l_returnflag string, l_quantity double, l_extendedprice double, l_discount double",
    ).write.parquet(f"{tmp_path}/lineitem.parquet")
    r = corr_stats(spark, str(tmp_path)).collect()[0]
    want_corr = float(np.corrcoef(q, p)[0, 1])
    want_sd = float(np.std(d, ddof=1))
    assert abs(r.qty_price_corr - want_corr) < 1e-6
    assert abs(r.disc_stddev - want_sd) < 1e-6


def test_linear_fit_matches_numpy_lstsq(spark, tmp_path):
    import numpy as np

    from elective_waiting_times_pipeline_spark.plans.catalog_relational import (
        linear_fit,
    )

    q = [1.0, 2.0, 3.0, 4.0, 5.0]
    p = [12.0, 19.5, 31.0, 38.5, 52.0]
    spark.createDataFrame(
        [("R", q[i], p[i]) for i in range(len(q))],
        "l_returnflag string, l_quantity double, l_extendedprice double",
    ).write.parquet(f"{tmp_path}/lineitem.parquet")
    r = linear_fit(spark, str(tmp_path)).collect()[0]
    slope, intercept = np.polyfit(q, p, 1)
    assert r.n == len(q)
    assert abs(r.slope - slope) < 1e-4
    assert abs(r.intercept - intercept) < 1e-4


def test_ols_trend_matches_numpy(spark, tmp_path):
    import numpy as np

    from elective_waiting_times_pipeline_spark.plans.catalog_events import (
        ols_trend_by_type,
    )

    daily = [100.0, 104.0, 103.0, 109.0, 115.0, 113.0, 120.0]
    rows = [
        (i, dt.datetime(2024, 1, 1) + dt.timedelta(days=i, hours=4), 1, "view", v, "{}")
        for i, v in enumerate(daily)
    ]
    _write_events(spark, str(tmp_path), rows)
    r = ols_trend_by_type(spark, str(tmp_path)).collect()[0]
    x = np.arange(len(daily), dtype=float)
    y = np.array(daily)
    slope, intercept = np.polyfit(x, y, 1)
    r2 = float(np.corrcoef(x, y)[0, 1]) ** 2
    assert r.n == len(daily)
    assert abs(r.slope_per_day - slope) < 1e-5
    assert abs(r.intercept - intercept) < 1e-4
    assert abs(r.r2 - r2) < 1e-5


def test_zipf_slope_recovers_power_law(spark, tmp_path):
    import numpy as np

    from elective_waiting_times_pipeline_spark.plans.catalog_text import zipf_fit

    # exact frequency table: cnt_r = round(1000 / r) for ranks 1..8
    counts = [round(1000 / r) for r in range(1, 9)]
    text = " ".join(f"w{r}" for r, c in enumerate(counts, 1) for _ in range(c))
    spark.createDataFrame(
        [(0, text, "en", "s0", len(text))],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{tmp_path}/documents.parquet")
    r = zipf_fit(spark, str(tmp_path)).collect()[0]
    lx = np.log(np.arange(1, 9, dtype=float))
    ly = np.log(np.array(counts, dtype=float))
    slope = np.polyfit(lx, ly, 1)[0]
    assert r.n_terms == 8
    assert abs(r.zipf_slope - slope) < 5e-3  # 1e-3 log snap on both axes


def test_interarrival_percentiles_match_numpy(spark, tmp_path):
    import numpy as np

    from elective_waiting_times_pipeline_spark.plans.catalog_events import (
        interarrival_stats,
    )

    offsets = [0, 10, 25, 26, 60, 61, 100, 400, 1000]  # seconds, one user
    rows = [
        (i, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s), 1, "click", 1.0, "{}")
        for i, s in enumerate(offsets)
    ]
    _write_events(spark, str(tmp_path), rows)
    r = interarrival_stats(spark, str(tmp_path)).collect()[0]
    gaps = np.diff(offsets).astype(float)
    assert r.n_gaps == len(gaps)
    assert abs(r.p50_gap_s - np.percentile(gaps, 50)) < 1e-4
    assert abs(r.p90_gap_s - np.percentile(gaps, 90)) < 1e-4
    assert abs(r.p99_gap_s - np.percentile(gaps, 99)) < 1e-4


def test_retention_curve_matches_hand_count(spark, tmp_path):
    from elective_waiting_times_pipeline_spark.plans.catalog_events import (
        retention_curve,
    )

    d0 = dt.datetime(2024, 1, 1, 9)
    rows = [
        # cohort day 0: users 1,2,3; day 1: users 1,2 return; day 3: user 1
        (1, d0, 1, "view", 1.0, "{}"),
        (2, d0, 2, "view", 1.0, "{}"),
        (3, d0, 3, "view", 1.0, "{}"),
        (4, d0 + dt.timedelta(days=1), 1, "click", 1.0, "{}"),
        (5, d0 + dt.timedelta(days=1, hours=2), 2, "click", 1.0, "{}"),
        (6, d0 + dt.timedelta(days=3), 1, "purchase", 1.0, "{}"),
    ]
    _write_events(spark, str(tmp_path), rows)
    got = {
        (r.cohort_day, r.day_offset): (r.n_users, r.retention_rate)
        for r in retention_curve(spark, str(tmp_path)).collect()
    }
    day = dt.datetime(2024, 1, 1)
    assert got[(day, 0)] == (3, 1.0)
    assert got[(day, 1)] == (2, round(2 / 3, 6))
    assert got[(day, 3)] == (1, round(1 / 3, 6))
    assert set(got) == {(day, 0), (day, 1), (day, 3)}


def test_bootstrap_ci_matches_python_replication(spark, tmp_path):
    """Replays the deterministic Poisson-bootstrap exactly in python
    (same md5 grid, same thresholds) AND validates the embedded
    threshold hex literals against the Poisson(1) CDF."""
    import hashlib

    import numpy as np

    from elective_waiting_times_pipeline_spark.plans.catalog_relational import (
        _POIS_HEX,
        bootstrap_mean_ci,
    )

    cdf, term = 0.0, math.exp(-1)
    for k in range(7):
        cdf += term
        assert _POIS_HEX[k] == format(math.ceil(cdf * 65536), "04x")
        term /= k + 1

    vals = [10.0, 12.5, 9.0, 20.0, 15.5, 11.0, 30.0, 8.25, 14.0, 22.0]
    spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "o_orderkey long, o_totalprice double"
    ).write.parquet(f"{tmp_path}/orders.parquet")
    r = bootstrap_mean_ci(spark, str(tmp_path)).collect()[0]
    means = []
    for rep in range(1, 65):
        sw, swv = 0, 0
        for i, v in enumerate(vals):
            u = hashlib.md5(f"{i}#{rep}".encode()).hexdigest()[:4]
            w = next((k for k, h in enumerate(_POIS_HEX) if u < h), 7)
            sw += w
            swv += w * math.floor(v * 100 + 0.5)
        if sw > 0:
            means.append(swv / sw / 100)
    assert r.n_replicas == len(means)
    assert abs(r.ci_lo - np.percentile(means, 2.5)) < 1e-4
    assert abs(r.ci_mid - np.percentile(means, 50)) < 1e-4
    assert abs(r.ci_hi - np.percentile(means, 97.5)) < 1e-4


def test_rolling_zscore_flags_constructed_spike(spark, tmp_path):
    """30 hourly buckets of value 10.00 then one 50.00 spike: the
    spike's z against the trailing-24 window must match the hand
    formula and flag, and no steady bucket may flag."""
    from elective_waiting_times_pipeline_spark.plans.catalog_events import (
        events_anomaly_zscore,
    )

    base = dt.datetime(2024, 1, 1)
    hourly = [10.0] * 30 + [50.0]
    rows = [
        (i, base + dt.timedelta(hours=i, minutes=5), 1, "view", v, "{}")
        for i, v in enumerate(hourly)
    ]
    _write_events(spark, str(tmp_path), rows)
    got = {r.bucket: r for r in events_anomaly_zscore(spark, str(tmp_path)).collect()}
    spike = got[base + dt.timedelta(hours=30)]
    # trailing 24 windows are all au=1000 cents → variance 0 → z NULL
    # by the var>0 guard… so construct the expectation from the spec:
    assert spike.z_score is None or abs(spike.z_score) > 3
    # add jitter series for a real z: rerun with alternating values
    import shutil

    shutil.rmtree(f"{tmp_path}/events.parquet")
    hourly = [10.0, 12.0] * 15 + [50.0]
    rows = [
        (i, base + dt.timedelta(hours=i, minutes=5), 1, "view", v, "{}")
        for i, v in enumerate(hourly)
    ]
    _write_events(spark, str(tmp_path), rows)
    got = {r.bucket: r for r in events_anomaly_zscore(spark, str(tmp_path)).collect()}
    aus = [math.floor(v * 100 + 0.5) for v in hourly]
    win = aus[30 - 24 : 30]
    m = sum(win) / len(win)
    var = sum(a * a for a in win) / len(win) - m * m
    z = (aus[30] - m) / math.sqrt(var)
    spike = got[base + dt.timedelta(hours=30)]
    assert abs(spike.z_score - z) < 1e-4
    assert spike.is_anomaly == (abs(z) > 3)
    steady = got[base + dt.timedelta(hours=29)]
    assert not steady.is_anomaly


def test_daily_autocorrelation_matches_textbook_acf(spark, tmp_path):
    import numpy as np

    from elective_waiting_times_pipeline_spark.plans.catalog_events import (
        daily_autocorrelation,
    )

    counts = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8]  # events per day, dense
    rows, eid = [], 0
    for d, c in enumerate(counts):
        for j in range(c):
            rows.append(
                (eid, dt.datetime(2024, 1, 1) + dt.timedelta(days=d, minutes=j), 1, "view", 1.0, "{}")
            )
            eid += 1
    _write_events(spark, str(tmp_path), rows)
    got = {r.lag: r.acf for r in daily_autocorrelation(spark, str(tmp_path)).collect()}
    x = np.array(counts, dtype=float)
    m = x.mean()
    den = ((x - m) ** 2).sum()
    for k in range(1, 8):
        want = (((x[k:] - m) * (x[:-k] - m)).sum()) / den
        assert abs(got[k] - want) < 1e-6, k


def test_stl_decomposition_recovers_additive_structure(spark, tmp_path):
    """y(t) = 100 + 2t + dow_effect: the 7-day MA must reproduce the
    linear trend exactly (a full week of effects sums to zero-mean),
    the seasonal must recover each dow effect minus the effect mean,
    and the remainder must vanish."""
    from elective_waiting_times_pipeline_spark.plans.catalog_events import (
        stl_decompose_daily,
    )

    effects = [4.0, -3.0, 1.0, 0.0, -2.0, 6.0, -6.0]  # per dow, mean 0
    n_days = 21
    rows = []
    for t in range(n_days):
        y = 100.0 + 2.0 * t + effects[t % 7]
        rows.append((t, dt.datetime(2024, 1, 1, 8) + dt.timedelta(days=t), 1, "view", y, "{}"))
    _write_events(spark, str(tmp_path), rows)
    out = {r.day: r for r in stl_decompose_daily(spark, str(tmp_path)).collect()}
    # full centered windows exist for t = 3 .. n-4
    assert len(out) == n_days - 6
    for t in range(3, n_days - 3):
        r = out[dt.datetime(2024, 1, 1) + dt.timedelta(days=t)]
        assert abs(r.revenue - (100.0 + 2.0 * t + effects[t % 7])) < 1e-9
        assert abs(r.trend - (100.0 + 2.0 * t)) < 1e-4          # MA kills the season
        assert abs(r.seasonal - effects[t % 7]) < 1e-4          # effect mean is 0
        assert abs(r.remainder) < 1e-4


def test_time_weighted_avg_matches_locf_integral(spark, tmp_path):
    """Witness computes the LOCF integral directly: sum(v_i * dt_i) /
    total observed time over the irregular series."""
    from elective_waiting_times_pipeline_spark.plans.catalog_events import (
        time_weighted_avg,
    )

    obs = [(0, 10.0), (30, 20.0), (90, 5.0), (100, 40.0)]  # (sec, value)
    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(seconds=s), 7, "reading", v, "{}")
        for i, (s, v) in enumerate(obs)
    ]
    _write_events(spark, str(tmp_path), rows)
    r = time_weighted_avg(spark, str(tmp_path)).collect()[0]
    num = sum(v * (obs[i + 1][0] - s) for i, (s, v) in enumerate(obs[:-1]))
    den = obs[-1][0] - obs[0][0]
    assert r.user_id == 7 and r.observed_s == den
    assert abs(r.twa - num / den) < 1e-6


def test_peak_concurrency_matches_brute_force_overlap(spark, tmp_path):
    """Witness counts concurrency by brute force: sessions are
    [first_event, last_event + 30 min) per user; peak = max over all
    session-start instants of how many sessions contain it."""
    from elective_waiting_times_pipeline_spark.plans.catalog_events import (
        peak_concurrency,
    )

    base = dt.datetime(2024, 1, 1, 12)
    # users with overlapping single-event sessions (each spans 30 min)
    starts_min = {1: [0], 2: [10], 3: [20], 4: [25], 5: [70], 6: [75]}
    rows, eid = [], 0
    for uid, ss in starts_min.items():
        for s in ss:
            rows.append((eid, base + dt.timedelta(minutes=s), uid, "view", 1.0, "{}"))
            eid += 1
    _write_events(spark, str(tmp_path), rows)
    got = {r.event_type: r.peak_concurrent for r in peak_concurrency(spark, str(tmp_path)).collect()}
    sessions = [
        (base + dt.timedelta(minutes=s), base + dt.timedelta(minutes=s + 30))
        for ss in starts_min.values()
        for s in ss
    ]
    peak = max(
        sum(1 for (a, b) in sessions if a <= t < b) for (t, _) in sessions
    )
    assert got == {"view": peak}
    assert peak == 4  # sessions at 0,10,20,25 all alive at minute 25
