"""Property-based checks for the round-7 operators: randomized inputs
against an independent pure-Python reference (the
test_round6_properties pattern)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_WORDS = [f"w{i}" for i in range(14)]  # tiny vocabulary → real overlap


def _py_jaccard_pairs(texts: dict[int, str], n: int, t: float):
    """Reference: exact word-n-gram Jaccard over all pairs."""
    sets = {}
    for i, txt in texts.items():
        toks = txt.lower().split()
        sets[i] = {" ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)}
    out = set()
    ids = sorted(sets)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            if not sets[a] or not sets[b]:
                continue
            inter = len(sets[a] & sets[b])
            if inter == 0:
                continue
            jac = inter / (len(sets[a]) + len(sets[b]) - inter)
            if round(jac, 6) >= t:
                out.add((a, b, round(jac, 6)))
    return out


@given(
    st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=2, max_size=10),
        min_size=2,
        max_size=14,
    ),
    st.sampled_from([0.1, 0.3, 0.4, 0.5, 0.7, 0.9]),
)
@settings(**_SETTINGS)
def test_prefix_jaccard_matches_python_reference(spark, docs, t):
    """prefix_filter_jaccard_pairs == an independent brute-force Python
    Jaccard on random small-vocabulary corpora, at several thresholds —
    the completeness theorem holds on arbitrary tie/df structure, not
    just the handcrafted fixture."""
    from elective_waiting_times_pipeline_spark.operators.dedup import (
        prefix_filter_jaccard_pairs,
    )

    texts = {i: " ".join(ws) for i, ws in enumerate(docs)}
    df = spark.createDataFrame(
        [(i, s) for i, s in texts.items()], "doc_id long, text string"
    )
    got = {
        (r.id_a, r.id_b, r.jaccard)
        for r in prefix_filter_jaccard_pairs(df, threshold=t, shingle_n=2).collect()
    }
    assert got == _py_jaccard_pairs(texts, 2, t)


def test_prefix_jaccard_tie_at_threshold_included(spark):
    """A pair whose exact Jaccard EQUALS the threshold must be emitted:
    the prefix length n − ceil(t·n) + 1 and the final >= filter both
    sit on closed boundaries. Doc 0 has bigrams {a b, b c, c d, d e}
    (4), doc 1 {a b, b c, c q} (3): J = 2/(4+3−2) = 0.4 exactly. Doc 2
    shares only its two leading bigrams with doc 0 at J = 1/3 < 0.4
    and must be excluded vs doc 0 — but ties doc 1 at J = 0.4 via
    {a b, b c} of its own 4 shingles... checked against the brute
    reference rather than hand enumeration."""
    from elective_waiting_times_pipeline_spark.operators.dedup import (
        prefix_filter_jaccard_pairs,
    )

    texts = {
        0: "a b c d e",
        1: "a b c q",
        2: "a b c x y",
        3: "p q r s",
    }
    df = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    for t in (0.4, 0.4000001):
        got = {
            (r.id_a, r.id_b, r.jaccard)
            for r in prefix_filter_jaccard_pairs(df, threshold=t, shingle_n=2).collect()
        }
        want = _py_jaccard_pairs(texts, 2, t)
        assert got == want, f"t={t}"
        if t == 0.4:
            assert (0, 1, 0.4) in got  # the exact-threshold tie is kept
        else:
            assert (0, 1, 0.4) not in got  # and excluded just above it


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["A", "B"]),
            st.integers(min_value=0, max_value=50),
            st.integers(min_value=1, max_value=9),
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_ordered_prefix_total_weight_matches_group_sums(spark, rows):
    """out_total_weight attaches each group's FULL weight sum to every
    row, and the running prefix reaches exactly that total on the last
    row of the (val, uid) order — checked against plain Python sums."""
    from elective_waiting_times_pipeline_spark.operators.sampling import (
        ordered_prefix,
        range_bucket,
        range_cut_points,
    )

    data = [(g, v, w, i) for i, (g, v, w) in enumerate(rows)]
    df = spark.createDataFrame(data, "g string, v long, w long, uid long")
    cuts = range_cut_points(df, "v", n_buckets=4, sample_rows=16)
    out = ordered_prefix(
        df,
        [F.col("v"), F.col("uid")],
        range_bucket(F.col("v"), cuts),
        group_cols=["g"],
        weight="w",
        out_prefix="cw",
        out_total_weight="tw",
    ).collect()
    want_tot = {}
    for g, v, w, i in data:
        want_tot[g] = want_tot.get(g, 0) + w
    assert all(r.tw == want_tot[r.g] for r in out)
    # prefix is a monotone permutation reaching the total
    by_g = {}
    for r in sorted(out, key=lambda r: (r.g, r.v, r.uid)):
        prev = by_g.get(r.g, 0)
        assert r.cw == prev + r.w
        by_g[r.g] = r.cw
    assert by_g == want_tot


def _py_clamped_balance(deltas: list[int]) -> tuple[int, int]:
    """Reference: the literal sequential recurrence b_t = max(0, b + d)."""
    b, peak = 0, 0
    for d in deltas:
        b = max(0, b + d)
        peak = max(peak, b)
    return b, peak


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["s1", "s2", "s3"]),
            st.integers(min_value=-50, max_value=50),
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_clamped_balance_identity_matches_sequential_loop(spark, moves):
    """The closed form b_t = S_t - min(0, min_{k<=t} S_k) used by
    capped_running_balance must equal the naive per-key loop for any
    delta sequence (the identity the oracle and the Spark plan share,
    pinned here against an independent reference)."""
    from pyspark.sql import Window

    data = [(k, i, d) for i, (k, d) in enumerate(moves)]
    df = spark.createDataFrame(data, "k string, seq long, delta long")
    w = (
        Window.partitionBy("k")
        .orderBy("seq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    rows = df.withColumn("rs", F.sum("delta").over(w)).withColumn(
        "b", F.col("rs") - F.least(F.lit(0).cast("long"), F.min("rs").over(w))
    )
    got = {
        r.k: (r.final_balance, r.peak_balance)
        for r in rows.groupBy("k")
        .agg(
            (F.sum("delta") - F.least(F.lit(0).cast("long"), F.min("rs")))
            .cast("long")
            .alias("final_balance"),
            F.max("b").cast("long").alias("peak_balance"),
        )
        .collect()
    }
    by_key: dict[str, list[int]] = {}
    for k, _, d in data:
        by_key.setdefault(k, []).append(d)
    want = {k: _py_clamped_balance(ds) for k, ds in by_key.items()}
    assert got == want


def _py_winsorized(vals_cents: list[int]) -> tuple[int, float]:
    """Reference: clamp to the rank-(k+1)/(n-k) order statistics."""
    n = len(vals_cents)
    k = n // 10
    s = sorted(vals_cents)
    lo, hi = s[k], s[n - k - 1]
    return n, sum(min(max(v, lo), hi) for v in s) / n / 100


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["A", "N", "R"]),
            st.integers(min_value=1, max_value=99999),
        ),
        min_size=1,
        max_size=60,
    )
)
@settings(**_SETTINGS)
def test_winsorized_mean_matches_python_reference(spark, tmp_path_factory, rows):
    from elective_waiting_times_pipeline_spark.plans.catalog_relational import (
        winsorized_mean_price,
    )

    sf = str(tmp_path_factory.mktemp("wins"))
    spark.createDataFrame(
        [(f, c / 100.0) for f, c in rows],
        "l_returnflag string, l_extendedprice double",
    ).repartition(3).write.parquet(f"{sf}/lineitem.parquet")
    got = {
        r.flag: (r.n_rows, r.winsorized_mean)
        for r in winsorized_mean_price(spark, sf).collect()
    }
    by_flag: dict[str, list[int]] = {}
    for f, c in rows:
        by_flag.setdefault(f, []).append(c)
    want = {f: _py_winsorized(cs) for f, cs in by_flag.items()}
    assert set(got) == set(want)
    for f in want:
        assert got[f][0] == want[f][0]
        assert abs(got[f][1] - want[f][1]) < 1e-9


@given(
    st.lists(st.integers(min_value=1, max_value=10**7), min_size=1, max_size=12)
)
@settings(**_SETTINGS)
def test_seat_apportionment_invariants(spark, tmp_path_factory, revs):
    """Hamilton invariants: seats sum to exactly 1000, every nation is
    within 1 of its exact quota, and allocation is monotone in
    revenue."""
    from elective_waiting_times_pipeline_spark.plans.catalog_relational import (
        seat_apportionment,
    )

    sf = str(tmp_path_factory.mktemp("seats"))
    spark.createDataFrame(
        [(i, r / 100.0) for i, r in enumerate(revs)],
        "o_custkey long, o_totalprice double",
    ).write.parquet(f"{sf}/orders.parquet")
    spark.createDataFrame(
        [(i, i) for i in range(len(revs))], "c_custkey long, c_nationkey long"
    ).write.parquet(f"{sf}/customer.parquet")
    spark.createDataFrame(
        [(i, f"N{i:02d}") for i in range(len(revs))],
        "n_nationkey long, n_name string",
    ).write.parquet(f"{sf}/nation.parquet")
    got = {r.nation: r.seats for r in seat_apportionment(spark, sf).collect()}
    assert sum(got.values()) == 1000
    tot = sum(revs)
    for i, r in enumerate(revs):
        quota = 1000 * r / tot
        assert quota - 1 < got[f"N{i:02d}"] < quota + 1
    for i, ri in enumerate(revs):
        for j, rj in enumerate(revs):
            if ri > rj:
                assert got[f"N{i:02d}"] >= got[f"N{j:02d}"]
