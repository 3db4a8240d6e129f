"""Crafted-data invariants for the round-6 operators — the oracle
tests prove engine parity on the synthetic corpus; these pin the
SEMANTICS on inputs built to hit the edges (tie pins, island merges,
dominance duplicates, even/odd weighted-median frames)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


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


def test_ohlc_open_close_pin_on_timestamp_ties(spark, tmp_path):
    """Two events at the SAME timestamp: open/close must follow
    event_id order, not arrival/partition order."""
    from elective_waiting_times_pipeline_spark.plans.catalog_events import tumbling_ohlc

    df = _events(
        spark,
        [
            (2, 0, 1, 5.0),   # same ts as event 1 — higher id
            (1, 0, 1, 3.0),   # open must be 3.0 (lower event_id)
            (3, 60, 1, 9.0),
            (4, 120, 1, 1.0),  # close must be 1.0 (latest ts)
        ],
    )
    sf = str(tmp_path)
    df.repartition(4).write.parquet(f"{sf}/events.parquet")
    out = tumbling_ohlc(spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.open, r.high, r.low, r.close) == (3.0, 9.0, 1.0, 1.0)
    assert r.n_events == 4


def test_interval_union_merges_and_counts_islands(spark, tmp_path):
    """Overlap chains merge into one island; a gap > the 300 s
    interval length starts a new one; total coverage is the union,
    not the sum, of interval lengths."""
    from elective_waiting_times_pipeline_spark.plans.catalog_events import (
        interval_union_length,
    )

    df = _events(
        spark,
        [
            # user 1: [0,300) ∪ [100,400) ∪ [350,650) → island [0,650)
            (1, 0, 1, 0.0),
            (2, 100, 1, 0.0),
            (3, 350, 1, 0.0),
            # then a gap: [1000,1300) → second island
            (4, 1000, 1, 0.0),
            # user 2: two touching intervals [0,300) ∪ [300,600):
            # start == running end is NOT a gap (half-open intervals)
            (5, 0, 2, 0.0),
            (6, 300, 2, 0.0),
        ],
    )
    sf = str(tmp_path)
    df.repartition(3).write.parquet(f"{sf}/events.parquet")
    got = {r.user_id: r for r in interval_union_length(spark, sf).collect()}
    assert got[1].n_islands == 2
    assert got[1].covered_us == (650 + 300) * 1_000_000
    assert got[2].n_islands == 1
    assert got[2].covered_us == 600 * 1_000_000


def test_pareto_front_keeps_duplicates_and_drops_dominated(spark, tmp_path):
    """Equal (price, size) pairs do not dominate each other (both
    stay); strict domination on either axis with weak on the other
    drops a row; the frontier of a monotone trade-off keeps all."""
    from elective_waiting_times_pipeline_spark.plans.catalog_relational import (
        pareto_front_2d,
    )

    rows = [
        # frontier trade-off: cheaper ↔ smaller
        (1, "a", "B", "T", 10, 100.0),
        (2, "b", "B", "T", 20, 200.0),
        (3, "c", "B", "T", 30, 300.0),
        # duplicate of part 2: same price & size — BOTH survive
        (4, "d", "B", "T", 20, 200.0),
        # dominated: same price as 2, smaller size
        (5, "e", "B", "T", 15, 200.0),
        # dominated: same size as 2, higher price
        (6, "f", "B", "T", 20, 250.0),
        # dominated strictly on both axes
        (7, "g", "B", "T", 5, 400.0),
    ]
    df = spark.createDataFrame(
        rows, "p_partkey long, p_name string, p_brand string, p_type string, p_size int, p_retailprice double"
    )
    sf = str(tmp_path)
    df.repartition(3).write.parquet(f"{sf}/part.parquet")
    keep = sorted(r.p_partkey for r in pareto_front_2d(spark, sf).collect())
    assert keep == [1, 2, 3, 4]


def test_weighted_median_lower_rule(spark, tmp_path):
    """Weighted median = smallest value whose doubled cumulative
    weight reaches the total — exact at the boundary (2·cw == tw
    selects the value) and weight-sensitive (not the row median)."""
    from elective_waiting_times_pipeline_spark.plans.catalog_relational import (
        weighted_median_value,
    )

    # flag A: values 1,2,3 with weights 1,1,6 → median 3 (weight pulls right)
    # flag B: values 10,20 with weights 5,5 → 2*cw(10)=10 == tw → 10 (lower median)
    rows = []
    oid = 1

    def li(flag, price, qty):
        nonlocal oid
        r = (
            oid, oid, 1, 1, float(qty), price, 0.0, 0.0,
            flag, "O",
            dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 2), dt.datetime(2024, 1, 3),
        )
        oid += 1
        return r

    rows += [li("A", 0.01, 1), li("A", 0.02, 1), li("A", 0.03, 6)]
    rows += [li("B", 0.10, 5), li("B", 0.20, 5)]
    df = spark.createDataFrame(
        rows,
        "l_orderkey long, l_linenumber long, l_partkey long, l_suppkey long, "
        "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
        "l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp, l_commitdate timestamp, l_receiptdate timestamp",
    )
    sf = str(tmp_path)
    df.repartition(2).write.parquet(f"{sf}/lineitem.parquet")
    got = {r.flag: r for r in weighted_median_value(spark, sf).collect()}
    assert got["A"].weighted_median == 0.03 and got["A"].total_weight == 8
    assert got["B"].weighted_median == 0.10 and got["B"].total_weight == 10


def test_bot_regularity_flag_boundary(spark, tmp_path):
    """A metronome user (zero gap variance) flags; a bursty user with
    the same mean gap does not; users under 5 events are excluded."""
    from elective_waiting_times_pipeline_spark.plans.catalog_relational import (
        bot_regularity_flags,
    )

    rows = []
    # user 1: exact 60 s clock — cv = 0 < 0.1 → bot-like
    rows += [(i, 60 * i, 1, 0.0) for i in range(6)]
    # user 2: same mean gap (four gaps 1,119,1,119 → mean 60 s), huge
    # spread → human
    offs, t = [0], 0
    for i in range(4):
        t += 1 if i % 2 == 0 else 119
        offs.append(t)
    rows += [(100 + i, o, 2, 0.0) for i, o in enumerate(offs)]
    # user 3: only 3 events — below the n >= 5 floor, absent
    rows += [(200 + i, 60 * i, 3, 0.0) for i in range(3)]
    df = _events(spark, rows)
    sf = str(tmp_path)
    df.repartition(3).write.parquet(f"{sf}/events.parquet")
    got = {r.user_id: r for r in bot_regularity_flags(spark, sf).collect()}
    assert set(got) == {1, 2}
    assert got[1].is_bot_like and got[1].mean_gap_s == 60.0
    assert not got[2].is_bot_like and got[2].mean_gap_s == 60.0


def test_duplicate_ngram_coverage_detects_repeats(spark, tmp_path):
    """A 5-gram repeated across docs marks BOTH occurrences as
    duplicated; a doc of unique grams scores 0; sub-5-token docs are
    excluded."""
    from elective_waiting_times_pipeline_spark.plans.catalog_text import (
        duplicate_ngram_coverage,
    )

    shared = "alpha beta gamma delta epsilon"
    rows = [
        (1, shared, "en", "s1", len(shared)),                      # 1 gram, duplicated
        (2, shared + " zeta", "en", "s1", len(shared) + 5),        # 2 grams, 1 duplicated
        (3, "one two three four five six", "en", "s2", 27),        # 2 grams, unique
        (4, "too short", "en", "s2", 9),                           # excluded
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    sf = str(tmp_path)
    df.repartition(2).write.parquet(f"{sf}/documents.parquet")
    got = {r.source: r for r in duplicate_ngram_coverage(spark, sf).collect()}
    # s1: doc1 = 1/1 dup, doc2 = 1/2 dup → mean (1.0 + 0.5)/2 = 0.75
    assert got["s1"].n_docs == 2 and abs(got["s1"].mean_dup_coverage - 0.75) < 1e-9
    assert got["s2"].n_docs == 1 and got["s2"].mean_dup_coverage == 0.0


def test_active_streaks_gaps_and_islands(spark, tmp_path):
    """Consecutive days chain into one streak; a 1-day gap splits;
    multiple same-day events count once."""
    from elective_waiting_times_pipeline_spark.plans.catalog_events import active_streaks

    rows = []
    # user 1: days 0,1,2 (streak 3), day 4 (streak 1); two events on day 1
    for i, day in enumerate([0, 1, 1, 2, 4]):
        rows.append((i, day * 86400, 1, 0.0))
    # user 2: single day
    rows.append((100, 0, 2, 0.0))
    df = _events(spark, rows)
    sf = str(tmp_path)
    df.repartition(3).write.parquet(f"{sf}/events.parquet")
    got = {r.user_id: r for r in active_streaks(spark, sf).collect()}
    assert (got[1].longest_streak_days, got[1].n_streaks, got[1].active_days) == (3, 2, 4)
    assert (got[2].longest_streak_days, got[2].n_streaks, got[2].active_days) == (1, 1, 1)


def test_compression_ratio_flags_repetition_and_noise(spark, tmp_path):
    """Highly repetitive text compresses far below the boilerplate
    threshold; high-entropy text stays near 1; short/None texts don't
    crash; the per-source means are deterministic across layouts."""
    import random

    from elective_waiting_times_pipeline_spark.plans.catalog_text import (
        text_compression_ratio,
    )

    rng = random.Random(7)
    noisy = "".join(rng.choice("abcdefghijklmnopqrstuvwxyz0123456789") for _ in range(4000))
    rows = [
        (1, "spam spam spam " * 300, "en", "rep", 4500),
        (2, noisy, "en", "rnd", 4000),
        (3, "", "en", "rep", 0),  # empty → NULL ratio, excluded
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    sf = str(tmp_path)
    df.repartition(2).write.parquet(f"{sf}/documents.parquet")
    got = {r.source: r for r in text_compression_ratio(spark, sf).collect()}
    assert got["rep"].n_docs == 1 and got["rep"].n_too_compressible == 1
    assert got["rnd"].n_too_compressible == 0 and got["rnd"].mean_ratio > 0.5
    # determinism across partition layouts
    df.repartition(7).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    again = {r.source: r for r in text_compression_ratio(spark, sf).collect()}
    assert {k: (v.n_docs, v.mean_ratio) for k, v in got.items()} == {
        k: (v.n_docs, v.mean_ratio) for k, v in again.items()
    }
