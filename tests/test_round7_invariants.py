"""Round-7 invariant pins.

Boundary tests that distinguish the CORRECT bot-regularity inequality
    cv < 0.1  ⇔  100·n·(n·Σg² − (Σg)²) < (Σg)²·(n−1)
from the round-6 bug that dropped a factor n when clearing denominators
(which implemented cv < √n/10 instead).  Each case sits just above or
just below cv = 0.1 at two different n, so the threshold itself — not
merely the extremes — is pinned.
"""
import datetime as dt


def _events(spark, rows):
    """rows: (event_id, ts_seconds_offset, user_id, value)"""
    base = dt.datetime(2024, 1, 1)
    return spark.createDataFrame(
        [
            (eid, base + dt.timedelta(seconds=off), uid, "click", float(v), "{}")
            for eid, off, uid, v in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )


def _user_from_gaps(uid, gaps_s, eid0):
    offs, t = [0], 0
    rows = [(eid0, 0, uid, 0.0)]
    for i, g in enumerate(gaps_s):
        t += g
        rows.append((eid0 + 1 + i, t, uid, 0.0))
    return rows


def test_bot_regularity_cv_threshold_pinned(spark, tmp_path):
    """cv just above/below 0.1 at n=4 and n=9 gaps.

    n=4:  gaps [90,110,90,110]  → cv = sqrt(400/3)/100 ≈ 0.1155 → human
          gaps [93,107,93,107]  → cv = sqrt(196/3)/100 ≈ 0.0808 → bot
    n=9:  gaps [89×4, 111×4, 100] → cv = 0.11 → human
          gaps [91×4, 109×4, 100] → cv = 0.09 → bot
    Under the dropped-factor-n bug (cv < √n/10) every one of these four
    users would flag bot-like; under the correct inequality exactly two
    do.
    """
    from elective_waiting_times_pipeline_spark.plans.catalog_relational import (
        bot_regularity_flags,
    )

    rows = []
    rows += _user_from_gaps(1, [90, 110, 90, 110], 0)        # cv≈0.1155
    rows += _user_from_gaps(2, [93, 107, 93, 107], 100)      # cv≈0.0808
    rows += _user_from_gaps(3, [89] * 4 + [111] * 4 + [100], 200)  # cv=0.11
    rows += _user_from_gaps(4, [91] * 4 + [109] * 4 + [100], 300)  # cv=0.09
    df = _events(spark, rows)
    sf = str(tmp_path)
    df.repartition(3).write.parquet(f"{sf}/events.parquet")
    got = {r.user_id: r.is_bot_like for r in bot_regularity_flags(spark, sf).collect()}
    assert got == {1: False, 2: True, 3: False, 4: True}


def test_bot_regularity_spark_matches_oracle_at_boundary(spark, tmp_path):
    """The DuckDB oracle and the Spark plan agree row-for-row on the
    same boundary fixture (both must carry the corrected inequality)."""
    import duckdb

    from elective_waiting_times_pipeline_spark.plans.catalog_relational import (
        bot_regularity_flags,
    )
    from elective_waiting_times_pipeline_spark.plans.registry import ORACLE_SQL

    rows = []
    rows += _user_from_gaps(1, [90, 110, 90, 110], 0)
    rows += _user_from_gaps(2, [93, 107, 93, 107], 100)
    rows += _user_from_gaps(3, [89] * 4 + [111] * 4 + [100], 200)
    rows += _user_from_gaps(4, [91] * 4 + [109] * 4 + [100], 300)
    df = _events(spark, rows)
    sf = str(tmp_path)
    df.repartition(3).write.parquet(f"{sf}/events.parquet")

    spark_rows = {
        r.user_id: (r.n_events, r.mean_gap_s, r.is_bot_like)
        for r in bot_regularity_flags(spark, sf).collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet/*.parquet')"
    )
    oracle_rows = {
        uid: (n, mg, bool(b))
        for uid, n, mg, b in con.execute(ORACLE_SQL["bot_regularity_flags"]).fetchall()
    }
    assert spark_rows == oracle_rows


def test_trimmed_mean_trims_exact_rowcounts(spark, tmp_path):
    """Flag A: 10 rows valued 1..10 → n div 10 = 1 trimmed per side →
    mean(2..9) = 5.5 over 8 kept rows. Flag B: 3 rows → n div 10 = 0,
    nothing trimmed."""
    from elective_waiting_times_pipeline_spark.plans.catalog_relational import (
        trimmed_mean_price,
    )

    import datetime as dt2

    rows = []
    for i in range(1, 11):
        rows.append((i, 1, 1, 1, 1.0, float(i), 0.0, 0.0, "A", "O",
                     dt2.datetime(2024, 1, 1), dt2.datetime(2024, 1, 2), dt2.datetime(2024, 1, 3)))
    for i, p in enumerate([10.0, 20.0, 90.0]):
        rows.append((100 + i, 1, 1, 1, 1.0, p, 0.0, 0.0, "B", "O",
                     dt2.datetime(2024, 1, 1), dt2.datetime(2024, 1, 2), dt2.datetime(2024, 1, 3)))
    df = spark.createDataFrame(
        rows,
        "l_orderkey long, l_linenumber long, l_partkey long, l_suppkey long, "
        "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
        "l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp, l_commitdate timestamp, l_receiptdate timestamp",
    )
    sf = str(tmp_path)
    df.repartition(2).write.parquet(f"{sf}/lineitem.parquet")
    got = {r.flag: r for r in trimmed_mean_price(spark, sf).collect()}
    assert got["A"].n_kept == 8 and abs(got["A"].trimmed_mean - 5.5) < 1e-9
    assert got["B"].n_kept == 3 and abs(got["B"].trimmed_mean - 40.0) < 1e-9


def test_monetary_unit_sample_hits_lattice_rows(spark, tmp_path):
    """$10M lattice over cumulative value: rows are selected exactly
    when a lattice point falls inside their cent interval."""
    import datetime as dt2

    from elective_waiting_times_pipeline_spark.plans.catalog_relational import (
        monetary_unit_sample,
    )

    # cum cents: 6e8 | 1.1e9 | 2.3e9 -> units 0,1,2 -> rows 2,3 selected
    prices = [6_000_000.0, 5_000_000.0, 12_000_000.0]
    rows = [
        (i + 1, 1, 1, 1, 1.0, p, 0.0, 0.0, "A", "O",
         dt2.datetime(2024, 1, 1), dt2.datetime(2024, 1, 2), dt2.datetime(2024, 1, 3))
        for i, p in enumerate(prices)
    ]
    df = spark.createDataFrame(
        rows,
        "l_orderkey long, l_linenumber long, l_partkey long, l_suppkey long, "
        "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
        "l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp, l_commitdate timestamp, l_receiptdate timestamp",
    )
    sf = str(tmp_path)
    df.repartition(2).write.parquet(f"{sf}/lineitem.parquet")
    got = sorted(
        (r.l_orderkey, r.dollar_unit) for r in monetary_unit_sample(spark, sf).collect()
    )
    assert got == [(2, 1), (3, 2)]


def test_lead_lag_detects_one_day_view_lead(spark, tmp_path):
    """Purchases replay the previous day's view counts exactly →
    pearson_r = 1.0 at lag +1 and the day-pair counts line up."""
    from elective_waiting_times_pipeline_spark.plans.catalog_events import (
        view_purchase_lead_lag,
    )

    import datetime as dt2

    views = [1, 2, 3, 1, 2, 3]
    recs = []
    eid = 0
    base = dt2.datetime(2024, 1, 1)
    for day, nv in enumerate(views):
        for _ in range(nv):
            recs.append((eid, base + dt2.timedelta(days=day), 1, "view", 0.0, "{}")); eid += 1
        for _ in range(nv):
            recs.append((eid, base + dt2.timedelta(days=day + 1, seconds=60), 2, "purchase", 0.0, "{}")); eid += 1
    df = spark.createDataFrame(
        recs,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    sf = str(tmp_path)
    df.repartition(3).write.parquet(f"{sf}/events.parquet")
    got = {r.lag_days: r for r in view_purchase_lead_lag(spark, sf).collect()}
    assert got[1].pearson_r == 1.0
    # lag 0 pairs views with same-day purchases = previous day's counts
    # ([1,2,3,1,2] vs [_,1,2,3,1,2] aligned) — far from 1
    assert got[0].pearson_r is None or got[0].pearson_r < 1.0


def test_heaps_beta_linear_vs_saturated_vocab(spark, tmp_path):
    """Every doc all-new tokens → V(n) = 3n → β ≈ 1; every doc the
    SAME tokens → V(n) constant → β ≈ 0."""
    from elective_waiting_times_pipeline_spark.plans.catalog_text import heaps_law_fit

    sf1 = str(tmp_path / "grow")
    rows = [(i, f"tok{i}a tok{i}b tok{i}c", "en", "s", 20) for i in range(64)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).repartition(2).write.parquet(f"{sf1}/documents.parquet")
    grow = heaps_law_fit(spark, sf1).collect()[0]
    assert grow.n_points == 32 and abs(grow.heaps_beta - 1.0) < 0.02

    sf2 = str(tmp_path / "flat")
    rows = [(i, "alpha beta gamma", "en", "s", 16) for i in range(64)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).repartition(2).write.parquet(f"{sf2}/documents.parquet")
    flat = heaps_law_fit(spark, sf2).collect()[0]
    assert abs(flat.heaps_beta) < 0.02


def test_rrf_top_doc_in_both_pools_scores_two_terms(spark, tmp_path):
    """A doc ranked #1 by both BM25 and tf-idf fuses to
    floor((1/61 + 1/61)·1e6 + 0.5) = 32787 ppm and wins the fusion."""
    from elective_waiting_times_pipeline_spark.plans.catalog_text import rrf_fusion_topk

    rows = [(0, "hash join filter scan hash join filter scan", "en", "s", 44)]
    rows += [(i, "hash alpha beta gamma delta epsilon", "en", "s", 35) for i in range(1, 8)]
    rows += [(i, "unrelated words only here", "en", "s", 25) for i in range(8, 12)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).repartition(2).write.parquet(f"{tmp_path}/documents.parquet")
    got = rrf_fusion_topk(spark, str(tmp_path)).collect()
    top = got[0]
    assert top.doc_id == 0 and top.bm25_rank == 1 and top.tfidf_rank == 1
    assert top.rrf_ppm == 32787


def test_scale_probe_reshuffle_rotation_properties(spark):
    """The content-reshuffling replication transform must (a) be a
    bijection on [a-zA-Z0-9] (length and character-class preserved, so
    token counts and length statistics survive), (b) produce DISTINCT
    text for replicas with different (i%26, (i//26)%10) keys, and
    (c) be the identity for replica 0."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "scale_probe", os.path.join(os.path.dirname(__file__), "..", "scripts", "scale_probe.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    df = spark.createDataFrame(
        [(1, "The Quick brown fox 42 jumps")], "doc_id long, text string"
    )
    texts = {}
    for i in (0, 1, 27, 53):
        out = mod._reshuffle_text(df, "text", i).collect()[0].text
        texts[i] = out
        assert len(out) == len("The Quick brown fox 42 jumps")
        # spaces untouched; classes preserved
        assert out.count(" ") == 5
        assert out[3] == " " and out[9] == " "
    assert texts[0] == "The Quick brown fox 42 jumps"
    # 1 vs 27: same letter rotation (1), different digit rotation
    assert texts[1] != texts[0] and texts[27] != texts[1] and texts[53] != texts[27]
    letters = lambda s: "".join(c for c in s if c.isalpha())  # noqa: E731
    assert letters(texts[1]) == letters(texts[27])  # digits differ only
    digits = lambda s: "".join(c for c in s if c.isdigit())  # noqa: E731
    assert digits(texts[1]) != digits(texts[27])


def test_prefix_jaccard_complete_vs_brute_and_prunes(spark, tmp_path):
    """Prefix filtering must return EXACTLY the brute inverted-index
    join's >= t pairs (completeness theorem), while indexing fewer
    postings than the brute join touches."""
    from elective_waiting_times_pipeline_spark.operators import dedup as D

    base = "w%d"
    rows = []
    # family A: 3 near-identical docs (high overlap)
    common = " ".join(base % i for i in range(20))
    rows.append((1, common, "en", "s", len(common)))
    rows.append((2, common + " extra one", "en", "s", 1))
    rows.append((3, common.replace("w3", "x3"), "en", "s", 1))
    # unrelated docs sharing only a hot boilerplate phrase
    for i in range(4, 20):
        rows.append((i, f"hot phrase unique{i} token{i} other{i} words{i}", "en", "s", 1))
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    t = 0.4
    got = sorted(
        (r.id_a, r.id_b, r.jaccard)
        for r in D.prefix_filter_jaccard_pairs(df, threshold=t, shingle_n=2).collect()
    )
    want = sorted(
        (r.id_a, r.id_b, r.jaccard)
        for r in D.ngram_jaccard_pairs(df, shingle_n=2, min_jaccard=t).collect()
    )
    assert got == want and len(got) >= 2
    # pruning: the "hot phrase" shingle is shared by 16 docs but each
    # of those docs' prefixes hold their RARE unique shingles, so no
    # cross-family candidate pair survives
    assert all(a <= 3 and b <= 3 for a, b, _ in got)


# ---------------------------------------------------------------------------
# Round-7 second-session additions
# ---------------------------------------------------------------------------


def test_seat_apportionment_largest_remainder_pinned(spark, tmp_path):
    """Revenues 7/6/5 cents, 1000 seats: quotas 388.8/333.3/277.7 →
    bases 388/333/277 (=998), remainders .8/.3/.7 → the two leftover
    seats go to nations 1 and 3 → 389/333/278."""
    from elective_waiting_times_pipeline_spark.plans.catalog_relational import (
        seat_apportionment,
    )

    sf = str(tmp_path)
    spark.createDataFrame(
        [(1, 0.07), (2, 0.06), (3, 0.05)], "o_custkey long, o_totalprice double"
    ).write.parquet(f"{sf}/orders.parquet")
    spark.createDataFrame(
        [(1, 10), (2, 20), (3, 30)], "c_custkey long, c_nationkey long"
    ).write.parquet(f"{sf}/customer.parquet")
    spark.createDataFrame(
        [(10, "N1"), (20, "N2"), (30, "N3")], "n_nationkey long, n_name string"
    ).write.parquet(f"{sf}/nation.parquet")
    got = {r.nation: r.seats for r in seat_apportionment(spark, sf).collect()}
    assert got == {"N1": 389, "N2": 333, "N3": 278}
    assert sum(got.values()) == 1000


def test_winsorized_mean_clamps_tails_to_fences(spark, tmp_path):
    """Values 1..9 and 100 dollars (n=10, k=1): fences are the rank-2
    and rank-9 order statistics (2 and 9); 1→2 and 100→9 gives sum 55
    → mean 5.5. The plain mean (14.5) and the trimmed mean (5.5 of 8
    kept = 44/8) would both differ."""
    from elective_waiting_times_pipeline_spark.plans.catalog_relational import (
        winsorized_mean_price,
    )

    sf = str(tmp_path)
    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 100.0]
    spark.createDataFrame(
        [("A", v) for v in vals], "l_returnflag string, l_extendedprice double"
    ).repartition(3).write.parquet(f"{sf}/lineitem.parquet")
    rows = winsorized_mean_price(spark, sf).collect()
    assert len(rows) == 1
    assert rows[0].n_rows == 10
    assert rows[0].winsorized_mean == 5.5


def test_capped_running_balance_clamps_at_zero(spark, tmp_path):
    """ship 5 (clamped to 0), return 3 (→3), ship 1 (→2): final 2,
    peak 3 — the unclamped running sum would end at -3."""
    import datetime as dt

    from elective_waiting_times_pipeline_spark.plans.catalog_relational import (
        capped_running_balance,
    )

    sf = str(tmp_path)
    d0 = dt.datetime(2024, 1, 1)
    rows = [
        (7, 5.0, "N", d0, 1, 1),
        (7, 3.0, "R", d0 + dt.timedelta(days=1), 2, 1),
        (7, 1.0, "N", d0 + dt.timedelta(days=2), 3, 1),
    ]
    spark.createDataFrame(
        rows,
        "l_suppkey long, l_quantity double, l_returnflag string,"
        " l_shipdate timestamp, l_orderkey long, l_linenumber long",
    ).repartition(2).write.parquet(f"{sf}/lineitem.parquet")
    got = capped_running_balance(spark, sf).collect()
    assert len(got) == 1
    assert (got[0].n_moves, got[0].final_balance, got[0].peak_balance) == (3, 2, 3)


def test_attribution_time_decay_weights_and_window_edge(spark, tmp_path):
    """One $1.00 purchase, clicks at age 0 (weight 1000000) and age 7
    exactly (weight 500000): credits 2/3 and 1/3 of the dollar with
    the documented floor-snap; a click 7 days + 1 s before the
    purchase earns nothing."""
    import datetime as dt

    from elective_waiting_times_pipeline_spark.plans.catalog_events import (
        attribution_time_decay,
    )

    sf = str(tmp_path)
    pt = dt.datetime(2024, 3, 15, 12, 0, 0)
    rows = [
        (1, pt, 9, "purchase", 1.0, "{}"),
        (2, pt, 9, "click", None, "{}"),
        (3, pt - dt.timedelta(days=7), 9, "click", None, "{}"),
        (4, pt - dt.timedelta(days=7, seconds=1), 9, "click", None, "{}"),
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).write.parquet(f"{sf}/events.parquet")
    got = {
        r.click_day: (r.n_touches, r.attributed_revenue)
        for r in attribution_time_decay(spark, sf).collect()
    }
    import math

    c0 = math.floor(100 * 1000000.0 * 1000000 / 1500000 + 0.5) / 1e8
    c7 = math.floor(100 * 1000000.0 * 500000 / 1500000 + 0.5) / 1e8
    assert got == {
        pt.replace(hour=0): (1, round(c0, 6)),
        (pt - dt.timedelta(days=7)).replace(hour=0): (1, round(c7, 6)),
    }


def test_bigram_backoff_hits_all_three_branches(spark, tmp_path):
    """Train doc 'a b' (even id), score doc 'a b b c' (odd id): pair
    (a,b) is a seen bigram (ln 1/1 = 0), (b,b) backs off to the seen
    unigram b, (b,c) backs off to the OOV default — expected mean
    computed independently with math.log and the same micro-snap."""
    import math

    from elective_waiting_times_pipeline_spark.plans.catalog_text import (
        bigram_backoff_logprob,
    )

    sf = str(tmp_path)
    spark.createDataFrame(
        [(0, "a b", "en", "s", 3), (1, "a b b c", "en", "s", 7)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{sf}/documents.parquet")
    got = bigram_backoff_logprob(spark, sf).collect()
    assert len(got) == 1 and got[0].doc_id == 1 and got[0].n_pairs == 3
    n_total, vocab = 2.0, 2.0
    snap = lambda x: math.floor(math.log(x) * 1000000 + 0.5)
    lpm = [
        snap(1.0 / 1.0),                                   # (a,b) seen bigram
        snap(0.4 * (1 + 0.5) / (n_total + 0.5 * vocab)),   # (b,b) backoff to b
        snap(0.4 * 0.5 / (n_total + 0.5 * vocab)),         # (b,c) OOV default
    ]
    want = round(sum(lpm) / 3.0 / 1000000, 6)
    assert got[0].mean_logprob == want


def test_survival_conversion_third_engine_witness(spark):
    """Pure-python Kaplan-Meier from first principles (pandas read of
    the raw parquet, no SQL engine) as a THIRD witness beside the
    Spark plan and the DuckDB oracle — the one query with a red driver
    record gets an implementation-independent value pin. Same spec:
    first-view anchor, first post-anchor purchase, whole-hour floors,
    exclusive-prefix risk sets, explicit left-fold of the survival
    product, ppm floor-snap."""
    import math

    import pandas as pd

    from elective_waiting_times_pipeline_spark.plans.catalog_events import (
        survival_conversion,
    )

    sf = "/root/testdata/sf0.001"
    ev = pd.read_parquet(f"{sf}/events.parquet")
    us = ev["ts"].astype("datetime64[us]").astype("int64")  # epoch micros
    ev = ev.assign(_us=us)
    pop = []
    for _, g in ev.groupby("user_id"):
        views = g.loc[g["event_type"] == "view", "_us"]
        if views.empty:
            continue
        t0 = int(views.min())
        t_last = int(g["_us"].max())
        pur = g.loc[(g["event_type"] == "purchase") & (g["_us"] > t0), "_us"]
        if pur.empty:
            pop.append(((t_last - t0) // 3_600_000_000, 0))
        else:
            pop.append(((int(pur.min()) - t0) // 3_600_000_000, 1))
    total = len(pop)
    marks: dict[int, list[int]] = {}
    for t_h, e in pop:
        d, leaving = marks.get(t_h, [0, 0])
        marks[t_h] = [d + e, leaving + 1]
    want_rows = {}
    surv, seen = 1.0, 0
    first = True
    for t_h in sorted(marks):
        d, leaving = marks[t_h]
        n_risk = total - seen
        seen += leaving
        if d <= 0 or d >= n_risk:
            continue
        factor = 1.0 - d / n_risk
        surv = factor if first else surv * factor
        first = False
        want_rows[t_h] = (n_risk, d, math.floor(surv * 1_000_000 + 0.5))
    got = {
        r.delay_hours: (r.n_risk, r.d_events, r.survival_ppm)
        for r in survival_conversion(spark, sf).collect()
    }
    assert got == want_rows
