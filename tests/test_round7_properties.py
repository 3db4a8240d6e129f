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
    st.sampled_from([0.3, 0.5, 0.7]),
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
