"""Semantic invariants for the round-5 additions — cheap properties
that hold regardless of data (the oracle hash pins exact values; these
pin MEANING, so a future refactor that stays hash-green against a
changed oracle still can't drift semantically)."""

from __future__ import annotations

from pyspark.sql import functions as F

from elective_waiting_times_pipeline_spark.plans import catalog

SF = "/root/testdata/sf0.001"


def test_silhouette_bounds_and_partition(spark):
    out = catalog.SPARK_QUERIES["silhouette_approx"](spark, SF).collect()
    n_emb = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    assert sum(r.n_points for r in out) == n_emb  # every vector scored once
    assert all(-1.0 <= r.mean_silhouette <= 1.0 for r in out)


def test_entity_clusters_partition_and_anchor(spark):
    out = catalog.SPARK_QUERIES["entity_clusters"](spark, SF).collect()
    n_sup = spark.read.parquet(f"{SF}/supplier.parquet").count()
    assert len(out) == n_sup  # a partition of the suppliers
    assert all(r.entity_id <= r.s_suppkey for r in out)  # min-member label
    anchors = {r.entity_id for r in out}
    keys = {r.s_suppkey for r in out}
    assert anchors <= keys  # every entity anchored at a real member


def test_golden_record_one_row_per_entity(spark):
    ents = catalog.SPARK_QUERIES["entity_clusters"](spark, SF)
    golden = catalog.SPARK_QUERIES["golden_record_merge"](spark, SF)
    n_entities = ents.select("entity_id").distinct().count()
    assert golden.count() == n_entities
    assert golden.filter(F.col("best_acctbal").isNull()).count() == 0


def test_pit_join_covers_every_order_and_never_leaks_future(spark):
    out = catalog.SPARK_QUERIES["pit_feature_join"](spark, SF)
    n_orders = spark.read.parquet(f"{SF}/orders.parquet").count()
    assert out.count() == n_orders  # left semantics: one row per fact
    # leakage check: the attached segment's valid_from must be <= the
    # lagged lookup date for every matched row
    dim = (
        catalog.SPARK_QUERIES["scd2_history"](spark, SF)
        .filter(F.col("valid_to").isNull() | (F.col("valid_to") > F.col("valid_from")))
    )
    joined = out.filter(F.col("segment_at_pit").isNotNull()).join(
        dim.select("custkey", F.col("attr").alias("segment_at_pit"), "valid_from"),
        ["custkey", "segment_at_pit"],
    )
    bad = joined.groupBy("o_orderkey", "pit_date").agg(
        F.min("valid_from").alias("earliest")
    ).filter(F.col("earliest") > F.col("pit_date"))
    assert bad.count() == 0


def test_pit_zero_length_versions_are_invisible(spark):
    """Two attribute changes on one day create a zero-length version
    (valid_from == valid_to); the PIT dim filter must keep exactly ONE
    version per (key, valid_from) — the end-of-day state — so as-of
    matches are unambiguous."""
    from elective_waiting_times_pipeline_spark.operators.scd2 import build_scd2

    rows = [
        (1, "A", "2024-01-01", 1),
        (1, "B", "2024-01-05", 2),  # B starts and ends on Jan 5
        (1, "C", "2024-01-05", 3),
        (1, "C", "2024-02-01", 4),
    ]
    obs = spark.createDataFrame(rows, "custkey long, attr string, eff string, tie long").select(
        "custkey", "attr", F.col("eff").cast("timestamp").alias("eff"), "tie"
    )
    hist = build_scd2(obs)
    assert hist.count() == 3  # A, B (zero-length), C
    dim = hist.filter(F.col("valid_to").isNull() | (F.col("valid_to") > F.col("valid_from")))
    got = {(r.attr, str(r.valid_from)[:10]) for r in dim.collect()}
    # B's zero-length version is gone; Jan 5's surviving state is C
    assert got == {("A", "2024-01-01"), ("C", "2024-01-05")}
    per_start = dim.groupBy("custkey", "valid_from").count().filter(F.col("count") > 1)
    assert per_start.count() == 0


def test_mmr_first_pick_is_relevance_argmax_and_ranks_unique(spark):
    out = sorted(
        catalog.SPARK_QUERIES["mmr_diversified_topk"](spark, SF).collect(),
        key=lambda r: r.mmr_rank,
    )
    assert [r.mmr_rank for r in out] == list(range(1, len(out) + 1))
    assert len({r.vec_id for r in out}) == len(out)
    top1 = catalog.SPARK_QUERIES["ann_cosine_topk"](spark, SF).collect()[0]
    assert out[0].vec_id == top1.vec_id  # empty selected set -> pure relevance


def test_collocation_pmi_min_count_and_cap(spark):
    out = catalog.SPARK_QUERIES["collocation_pmi"](spark, SF).collect()
    assert 0 < len(out) <= 20
    assert all(r.n_pairs >= 5 for r in out)


def test_stl_components_reassemble(spark):
    out = catalog.SPARK_QUERIES["stl_decompose_daily"](spark, SF).collect()
    assert len(out) > 0
    for r in out:
        # additive identity within the 1e-6 rounding of each component
        assert abs(r.revenue - (r.trend + r.seasonal + r.remainder)) < 5e-6


def test_revenue_bridge_effects_reassemble_delta(spark):
    """Identity: volume_effect + price_effect == delta_revenue (exact
    in real arithmetic; to component rounding here)."""
    rows = catalog.SPARK_QUERIES["revenue_bridge"](spark, SF).collect()
    assert len(rows) > 0
    for r in rows:
        assert abs(r.delta_revenue - (r.volume_effect + r.price_effect)) < 5e-6


def test_seasonal_anomaly_rows_ranked_by_abs_z(spark):
    out = catalog.SPARK_QUERIES["seasonal_anomaly_how"](spark, SF).collect()
    zs = [abs(r.z_score) for r in out]
    assert zs == sorted(zs, reverse=True)
