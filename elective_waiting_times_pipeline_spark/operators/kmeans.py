"""Deterministic distributed k-means (Lloyd's algorithm) over an
embedding column — the clustering step of semantic dedup / corpus
curation (cluster-then-sample, cluster-balanced mixtures), kept fully
declarative so every iteration is one Spark job shape:

    assign:    map-side — k×dim centroid table BROADCAST, distance per
               row computed in a codegen'd array fold (no shuffle)
    recompute: one shuffle on (cluster, dim) — the per-dimension sums
               are map-side-combined partials, so the exchange carries
               k*dim rows, not the corpus

Determinism (and DuckDB-oracle parity) comes from doing ALL arithmetic
in micro-scaled longs: vectors are snapped once to floor(x*1e6+0.5),
squared-L2 distances are exact BIGINT sums (summation order
irrelevant), ties break to the smallest cluster id, and recomputed
centroids are re-snapped to integer micros via floor(sum/n + 0.5)
(sums stay < 2^53, so the double division is exact). Float k-means
diverges across engines/partitionings at the 1e-15 level, which flips
argmins; integer k-means cannot.

At 100 TB: the corpus is scanned once per iteration (iterations are
small constants, 2-10); each adds one k*dim-row exchange. The
iteration chain is built driver-side but the lineage stays shallow —
each round's centroid table is a tiny aggregated relation, and the
assignment never materializes intermediate corpora. MLlib's KMeans
solves the same problem with sampling-based init; this form exists for
reproducible curation decisions where the cluster assignment must be
bit-stable across runs and engines (reference parallel: the curation
layer's deterministic sampling contracts, `operators/sampling.py`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def snap_micros(df: DataFrame, vec_col: str = "embedding", out_col: str = "xv") -> DataFrame:
    """Quantize a float vector column to micro-scaled longs (1e-6
    resolution) — the exact-arithmetic domain all k-means math runs in."""
    return df.withColumn(
        out_col,
        F.transform(F.col(vec_col), lambda x: F.floor(x * MICRO + F.lit(0.5)).cast("long")),
    )


def _sq_dist(xv, cv) -> F.Column:
    """Exact squared L2 between two micro-long arrays (BIGINT fold)."""
    return F.aggregate(
        F.zip_with(xv, cv, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, d: acc + d,
    )


def assign_clusters(
    vecs: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "xv",
) -> DataFrame:
    """Nearest-centroid assignment, fully ROW-LOCAL: the k-row
    centroid table collapses to a single-row array (sorted by cid),
    broadcast-crossJoined onto every vector row, and the argmin is
    array_min over the per-centroid struct(dist, cid) transforms —
    struct ordering compares d first then cid, the exact semantics of
    the previous min(struct(d, cid)) aggregation (ties to the
    smallest cid). The previous shape multiplied the corpus k× and
    shuffled a corpus-sized (id, best, xv) relation back through
    groupBy(id) — a full corpus exchange (with the vector payload)
    that pure map-side evaluation eliminates; each Lloyd iteration is
    now assignment-shuffle-free, leaving recompute_centroids' k·dim
    exchange as the only shuffle per round.
    Precondition: `centroids` is NON-EMPTY (seeded k>=1 everywhere in
    this engine). An empty centroid table yields one row with an
    empty array and every vector gets cluster=NULL (array_min over an
    empty transform) — where the old crossJoin shape produced zero
    output rows.
    Output: (id_col, cluster, xv)."""
    cents = centroids.agg(
        F.array_sort(F.collect_list(F.struct(F.col("cid"), F.col("cv")))).alias("_cents")
    )
    scored = vecs.crossJoin(F.broadcast(cents))
    best = F.array_min(
        F.transform(
            F.col("_cents"),
            lambda c: F.struct(
                _sq_dist(F.col(vec_col), c["cv"]).alias("d"), c["cid"].alias("cid")
            ),
        )
    )
    return scored.select(F.col(id_col), best["cid"].alias("cluster"), F.col(vec_col))


def recompute_centroids(assigned: DataFrame, vec_col: str = "xv") -> DataFrame:
    """Per-cluster mean, re-snapped to integer micros. One shuffle on
    (cluster, dim); the posexplode keeps dim index so the centroid
    array rebuilds in dimension order regardless of row order."""
    per_dim = (
        assigned.select("cluster", F.posexplode(vec_col).alias("pos", "x"))
        .groupBy("cluster", "pos")
        .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
        .select(
            "cluster",
            "pos",
            F.floor(F.col("s") / F.col("n") + F.lit(0.5)).cast("long").alias("m"),
        )
    )
    return (
        per_dim.groupBy("cluster")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("dims"))
        .select(
            F.col("cluster").alias("cid"),
            F.transform(F.col("dims"), lambda s: s["m"]).alias("cv"),
        )
    )


def kmeans_lloyd(
    df: DataFrame,
    k: int = 4,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Run `iters` Lloyd rounds from deterministic seeds (the k rows
    with the smallest ids — reproducible, engine-independent init).
    Returns (id_col, cluster) for every input row."""
    if k < 1 or iters < 1:
        raise ValueError(f"k and iters must be >= 1: k={k}, iters={iters}")
    vecs = snap_micros(df.select(id_col, vec_col), vec_col)
    # bounded driver collect (k ids) — relabels seeds to dense 0..k-1
    # without a global window in the plan
    seed_rows = df.select(id_col).orderBy(id_col).limit(k).collect()
    spark = df.sparkSession
    seed_map = spark.createDataFrame(
        [(r[0], i) for i, r in enumerate(seed_rows)], f"{id_col} long, cid int"
    )
    centroids = vecs.join(F.broadcast(seed_map), id_col).select("cid", F.col("xv").alias("cv"))
    assigned = None
    for _ in range(iters):
        assigned = assign_clusters(vecs, centroids, id_col=id_col)
        centroids = recompute_centroids(assigned)
    return assigned.select(id_col, "cluster")
