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
