"""Deterministic k-means operator invariants (the catalog oracle test
covers value parity; these pin the properties that make it usable as a
curation primitive)."""

from __future__ import annotations

from pyspark.sql import functions as F

from elective_waiting_times_pipeline_spark.operators.kmeans import (
    assign_clusters,
    kmeans_lloyd,
    recompute_centroids,
    snap_micros,
)
from elective_waiting_times_pipeline_spark.sources.readers import load_table


def test_kmeans_layout_independent(spark, sf_dir):
    """The assignment must not depend on physical partitioning — the
    whole point of the integer-arithmetic design."""
    emb = load_table(spark, sf_dir, "embeddings")
    a = {(r.vec_id, r.cluster) for r in kmeans_lloyd(emb, k=4, iters=2).collect()}
    b = {
        (r.vec_id, r.cluster)
        for r in kmeans_lloyd(emb.repartition(13, "label"), k=4, iters=2).collect()
    }
    assert a == b and len(a) == emb.count()


def test_kmeans_inertia_non_increasing(spark, sf_dir):
    """Lloyd's guarantee holds in the quantized domain too (up to the
    1e-6 centroid snap): total squared distance after a further
    assign+recompute round must not grow materially. We assert strict
    improvement from round 1 to round 2 on this data."""
    emb = load_table(spark, sf_dir, "embeddings")

    def inertia(assigned, centroids):
        from elective_waiting_times_pipeline_spark.operators.kmeans import _sq_dist

        joined = assigned.join(
            F.broadcast(centroids), assigned.cluster == centroids.cid
        )
        return joined.agg(F.sum(_sq_dist(F.col("xv"), F.col("cv")))).collect()[0][0]

    vecs = snap_micros(emb.select("vec_id", "embedding"))
    seed_rows = emb.select("vec_id").orderBy("vec_id").limit(4).collect()
    seed_map = spark.createDataFrame(
        [(r[0], i) for i, r in enumerate(seed_rows)], "vec_id long, cid int"
    )
    c0 = vecs.join(F.broadcast(seed_map), "vec_id").select("cid", F.col("xv").alias("cv"))
    a1 = assign_clusters(vecs, c0)
    c1 = recompute_centroids(a1)
    a2 = assign_clusters(vecs, c1)
    c2 = recompute_centroids(a2)
    i1, i2 = inertia(a1, c1), inertia(a2, c2)
    assert i2 < i1, (i1, i2)


def test_kmeans_all_rows_assigned_k_clusters(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    out = kmeans_lloyd(emb, k=4, iters=2)
    rows = out.collect()
    assert len(rows) == emb.count()
    assert {r.cluster for r in rows} == {0, 1, 2, 3}
