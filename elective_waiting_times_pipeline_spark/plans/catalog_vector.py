"""Catalog: similarity search over the `embeddings` table
(ARRAY<FLOAT> column) — brute-force cosine baseline + LSH scale path."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from elective_waiting_times_pipeline_spark.operators import similarity as S
from elective_waiting_times_pipeline_spark.plans.registry import query
from elective_waiting_times_pipeline_spark.sources.readers import load_table


# ---------------------------------------------------------------------------
# ANN baseline: exact cosine top-k against a query vector (vec_id=0),
# one corpus scan, query side broadcast. Ordering on ROUNDED similarity
# + id so top-k membership is engine-independent.
# ---------------------------------------------------------------------------
@query(
    "ann_cosine_topk",
    headline=True,
    oracle="""
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0)
    SELECT vec_id,
           ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]), qv), 6) AS cosine_sim
    FROM embeddings, q
    ORDER BY cosine_sim DESC, vec_id ASC
    LIMIT 10
    """,
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    qdf = emb.filter(F.col("vec_id") == 0)
    return S.cosine_topk(emb, qdf, k=10)


# ---------------------------------------------------------------------------
# FILTERED vector search: top-k cosine restricted to a metadata
# predicate (label = 2) — the vector-DB operation behind "search only
# docs matching this filter". Strategy is PRE-filtering: the predicate
# is applied before scoring, so recall within the filtered set is
# exact (post-filtering a global top-k can starve the result), and the
# predicate reaches the parquet scan as a pushed filter — on a
# label-partitioned/bucketed store at 100 TB this prunes row groups
# before a single distance is computed.
# ---------------------------------------------------------------------------
@query(
    "ann_filtered_topk",
    oracle="""
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0)
    SELECT vec_id,
           ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]), qv), 6) AS cosine_sim
    FROM embeddings, q
    WHERE label = 2
    ORDER BY cosine_sim DESC, vec_id ASC
    LIMIT 10
    """,
)
def ann_filtered_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    qdf = emb.filter(F.col("vec_id") == 0)
    return S.cosine_topk(emb.filter(F.col("label") == 2), qdf, k=10)


# ---------------------------------------------------------------------------
# Diversified retrieval: Maximal Marginal Relevance re-rank of the
# cosine top-30 pool (λ=0.7, k=10) — "relevant but not redundant",
# the standard answer to a near-dup-heavy corpus flooding a top-k
# with copies. The DISTRIBUTED work is the corpus-wide pool scoring
# (one scan + TakeOrdered) and the pool's pairwise similarities; the
# greedy selection itself is inherently sequential and runs on the
# driver over the BOUNDED 30-row pool (the kmeans-seed-collect class
# of driver step — O(pool²) = 900 doubles, constant in corpus size).
# Every similarity is snapped to 6dp before the greedy, and the MMR
# score is one fixed multiply/subtract sequence on those snapped
# doubles, so selection order is engine-independent; the oracle
# replays the greedy as 10 unrolled argmax CTE steps.
# ---------------------------------------------------------------------------
_MMR_K, _MMR_POOL, _MMR_LAM = 10, 30, 0.7


def _mmr_oracle(k: int = _MMR_K, pool: int = _MMR_POOL, lam: float = _MMR_LAM) -> str:
    sql = f"""
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
    pool AS MATERIALIZED (
      -- NULL similarities (zero-norm vectors) are dropped AFTER the
      -- top-k cut, mirroring the Spark side: they sort last under
      -- DESC on both engines, so the surviving set is identical
      SELECT * FROM (
        SELECT vec_id,
               ROUND(list_cosine_similarity(CAST(embedding AS DOUBLE[]), qv), 6) AS rel
        FROM embeddings, q ORDER BY rel DESC, vec_id LIMIT {pool}
      ) WHERE rel IS NOT NULL
    ), pv AS MATERIALIZED (
      SELECT p.vec_id, p.rel, CAST(e.embedding AS DOUBLE[]) AS v
      FROM pool p JOIN embeddings e USING (vec_id)
    ), ps AS MATERIALIZED (
      SELECT a.vec_id AS ca, b.vec_id AS cb,
             ROUND(list_cosine_similarity(a.v, b.v), 6) AS s
      FROM pv a JOIN pv b ON a.vec_id <> b.vec_id
    ), sel1 AS MATERIALIZED (
      SELECT vec_id, rel, 1 AS mmr_rank, {lam} * rel - {1 - lam} * 0.0 AS score
      FROM pool ORDER BY {lam} * rel - {1 - lam} * 0.0 DESC, vec_id LIMIT 1
    )"""
    for i in range(2, k + 1):
        sql += f""", sel{i} AS MATERIALIZED (
      SELECT * FROM sel{i - 1}
      UNION ALL
      SELECT vec_id, rel, {i} AS mmr_rank, score FROM (
        SELECT p.vec_id, p.rel,
               {lam} * p.rel - {1 - lam} * COALESCE(
                 (SELECT MAX(s) FROM ps
                  WHERE ps.ca = p.vec_id
                    AND ps.cb IN (SELECT vec_id FROM sel{i - 1})), 0.0) AS score
        FROM pool p WHERE p.vec_id NOT IN (SELECT vec_id FROM sel{i - 1})
        ORDER BY score DESC, p.vec_id LIMIT 1
      )
    )"""
    sql += f"""
    SELECT CAST(mmr_rank AS INT) AS mmr_rank, vec_id,
           CAST(floor(score * 1000000 + 0.5) AS BIGINT) AS mmr_score_ppm
    FROM sel{k}
    """
    return sql


@query("mmr_diversified_topk", oracle=_mmr_oracle())
def mmr_diversified_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    emb = load_table(spark, sf_dir, "embeddings")
    qdf = emb.filter(F.col("vec_id") == 0)
    # drop NULL similarities (zero-norm query/candidates) after the
    # top-k cut — they sort last under DESC on both engines, and a
    # None relevance would crash the driver greedy's arithmetic
    pool = S.cosine_topk(emb, qdf, k=_MMR_POOL).filter(F.col("cosine_sim").isNotNull())
    pv = pool.join(emb.select("vec_id", "embedding"), "vec_id")
    a, b = pv.alias("a"), pv.alias("b")
    ps = (
        a.crossJoin(b)
        .filter(F.col("a.vec_id") != F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("ca"),
            F.col("b.vec_id").alias("cb"),
            F.round(S.cosine(F.col("a.embedding"), F.col("b.embedding")), 6).alias("s"),
        )
    )
    rel = {r["vec_id"]: r["cosine_sim"] for r in pool.collect()}  # bounded: pool rows
    sims = {(r["ca"], r["cb"]): r["s"] for r in ps.collect()}  # bounded: pool²
    selected: list[int] = []
    remaining = set(rel)
    rows = []
    for rank in range(1, _MMR_K + 1):
        if not remaining:  # pool smaller than k (heavily filtered corpus)
            break
        best = None
        for v in remaining:
            vals = [sims[(v, u)] for u in selected if sims.get((v, u)) is not None]
            maxsim = max(vals) if vals else 0.0
            score = _MMR_LAM * rel[v] - (1 - _MMR_LAM) * maxsim
            key = (-score, v)
            if best is None or key < best[0]:
                best = (key, v, score)
        _, v, score = best
        selected.append(v)
        remaining.remove(v)
        rows.append((rank, v, int(math.floor(score * 1000000 + 0.5))))
    return spark.createDataFrame(rows, "mmr_rank int, vec_id long, mmr_score_ppm long")


# ---------------------------------------------------------------------------
# Embedding near-dup pairs (brute force on a vec_id<150 slice so the
# oracle's quadratic join stays small; lsh_near_dup_pairs is the
# corpus-scale variant).
# ---------------------------------------------------------------------------
@query(
    "cosine_near_dup_pairs",
    oracle="""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])), 6) AS cosine_sim
    FROM embeddings a
    JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE a.vec_id < 150 AND b.vec_id < 150
      AND ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                       CAST(b.embedding AS DOUBLE[])), 6) >= 0.5
    """,
)
def cosine_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 150)
    return S.cosine_near_dup_pairs(emb, threshold=0.5)


# ---------------------------------------------------------------------------
# LSH-bucketed near-dup (random-hyperplane signatures, fixed seed):
# the 100TB path — equi-join on signature instead of all-pairs.
# Promoted from rows-only to a FULL hash oracle (round 10) by making
# the bucket decision integer-exact: vectors are quantized to
# integer-valued doubles (floor(x*1000 + 0.5) — both engines' floor
# is exact) and the hyperplanes are integer-quantized, so every
# signature dot product is an exact float64 integer and the sign —
# hence the bucket, hence the candidate set — is bit-identical in
# Spark and DuckDB. The oracle embeds the SAME seeded plane constants
# (generated by `integer_hyperplanes`, not copied by hand) and
# replays signature → bucket equi-join → cosine verify end-to-end.
# Recall vs brute force stays covered by tests/test_dedup_similarity.
# ---------------------------------------------------------------------------
_LSH_PLANES = S.integer_hyperplanes(dim=64, n_planes=12, seed=42)


def _lsh_pairs_oracle() -> str:
    lst = lambda row: "[" + ", ".join(f"{v}.0" for v in row) + "]"
    sig = " + ".join(
        f"(CASE WHEN list_dot_product(ei, {lst(p)}) >= 0 THEN {1 << i} ELSE 0 END)"
        for i, p in enumerate(_LSH_PLANES)
    )
    return f"""
    WITH q AS (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]), x -> floor(x*1000 + 0.5)) AS ei
      FROM embeddings WHERE embedding IS NOT NULL
    ), s AS (
      SELECT vec_id, ei, {sig} AS sig FROM q
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_cosine_similarity(a.ei, b.ei), 6) AS cosine_sim
    FROM s a JOIN s b ON a.sig = b.sig AND a.vec_id < b.vec_id
    WHERE ROUND(list_cosine_similarity(a.ei, b.ei), 6) >= 0.5
    """


@query("lsh_near_dup_pairs", oracle=_lsh_pairs_oracle())
def lsh_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    quant = emb.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * 1000 + F.lit(0.5)).cast("double"),
        ).alias("embedding"),
    )
    return S.lsh_bucketed_pairs(quant, dim=64, threshold=0.5, planes=_LSH_PLANES)


# ---------------------------------------------------------------------------
# IVF ANN (coarse KMeans cells, probe the nearest n_probe cells):
# the partition-pruned scale path for top-k. Rows-only check (cell
# assignment is engine-specific); recall vs brute force is tested.
# ---------------------------------------------------------------------------
# Build-once index cache for the IVF catalog query: (sf_dir, n_cells)
# -> directory holding the cell-partitioned index + centroid table.
# The one-shot ivf_topk (fit + assign + probe per call) re-pushes the
# WHOLE corpus through the assignment UDF on every search — measured
# ~35 s at x100 embeddings, all index build. Production (and this
# query) pays that once: the probe then scans ~n_probe/n_cells of the
# corpus via partition pruning (tests/test_skew_ivf_simhash.py asserts
# both pruning and one-shot-equality of the persisted lifecycle).
_IVF_INDEX_CACHE: dict[tuple, str] = {}


def _source_fingerprint(path: str) -> tuple:
    """Cheap invalidation key for the cached index: (size, mtime) of
    the source parquet (or of every file under it when it is a
    directory). Regenerated source data gets a fresh index instead of
    stale vec_ids from the old snapshot."""
    import os

    if os.path.isdir(path):
        parts = []
        for root, _dirs, files in os.walk(path):
            for f in sorted(files):
                st = os.stat(os.path.join(root, f))
                parts.append((f, st.st_size, st.st_mtime_ns))
        return tuple(parts)
    st = os.stat(path)
    return (st.st_size, st.st_mtime_ns)


def _ivf_index(spark: SparkSession, sf_dir: str, n_cells: int = 16):
    key = (sf_dir, n_cells, _source_fingerprint(f"{sf_dir}/embeddings.parquet"))
    if key not in _IVF_INDEX_CACHE:
        import atexit
        import shutil
        import tempfile

        emb = load_table(spark, sf_dir, "embeddings")
        cents = S.ivf_fit(emb, n_cells=n_cells)
        root = tempfile.mkdtemp(prefix="ivf_index_")
        atexit.register(shutil.rmtree, root, ignore_errors=True)
        S.ivf_assign(emb, cents, cell_col="cell").write.partitionBy("cell").parquet(
            f"{root}/index"
        )
        cents.write.parquet(f"{root}/centroids")
        # drop stale snapshots of the same (sf_dir, n_cells)
        for old_key in [k for k in _IVF_INDEX_CACHE if k[:2] == (sf_dir, n_cells)]:
            shutil.rmtree(_IVF_INDEX_CACHE.pop(old_key), ignore_errors=True)
        _IVF_INDEX_CACHE[key] = root
    root = _IVF_INDEX_CACHE[key]
    return spark.read.parquet(f"{root}/index"), spark.read.parquet(f"{root}/centroids")


@query("ivf_cosine_topk", headline=True)
def ivf_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    indexed, cents = _ivf_index(spark, sf_dir, n_cells=16)
    qdf = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") == 0)
    return S.ivf_probe(indexed, cents, qdf, k=10, n_probe=6, cell_col="cell")


# ---------------------------------------------------------------------------
# Per-label centroid (class mean / cluster centroid primitive), long
# form. posexplode → hash agg: one shuffle of |labels|×dim cells
# regardless of corpus size. DuckDB mirrors with a 1-based index lambda.
# ---------------------------------------------------------------------------
@query(
    "embedding_centroids",
    oracle="""
    WITH ex AS (
      SELECT label,
             unnest(list_transform(embedding, (x, i) -> struct_pack(pos := i, val := CAST(x AS DOUBLE)))) AS s
      FROM embeddings
    )
    SELECT label, CAST(s.pos AS INT) AS pos, ROUND(AVG(s.val), 6) AS centroid_val
    FROM ex GROUP BY label, s.pos
    """,
)
def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    from elective_waiting_times_pipeline_spark.operators.similarity import group_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    return group_centroids(emb, group_col="label", vec_col="embedding")


# ---------------------------------------------------------------------------
# Embedding-outlier curation: cosine of each vector to its label
# centroid; below-threshold vectors flagged (mislabeled / noise — the
# embedding-side analog of the MAD text filter). Corpus never
# re-shuffles: one |labels|×dim centroid agg, broadcast back; cosine
# is a deterministic codegen'd fold. DuckDB replays it with
# list_cosine_similarity over the same 6-dp-rounded centroids.
# ---------------------------------------------------------------------------
@query(
    "embedding_outlier_filter",
    oracle="""
    WITH ex AS (
      SELECT label,
             unnest(list_transform(embedding, (x, i) -> struct_pack(pos := i, val := CAST(x AS DOUBLE)))) AS s
      FROM embeddings
    ), c AS (
      SELECT label, s.pos AS pos, ROUND(AVG(s.val), 6) AS cv FROM ex GROUP BY 1, 2
    ), ca AS (
      SELECT label, list(cv ORDER BY pos) AS cvec FROM c GROUP BY 1
    )
    SELECT e.vec_id, e.label,
           ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), ca.cvec), 6) AS centroid_sim,
           ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), ca.cvec), 6) < 0.0 AS is_outlier
    FROM embeddings e JOIN ca USING (label)
    """,
)
def embedding_outlier_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return S.centroid_outliers(emb, min_sim=0.0)


# ---------------------------------------------------------------------------
# int8-quantized maximum-inner-product top-k: scoring runs entirely on
# 4x-compressed int8 vectors (exact integer dot x two scale factors) —
# the float store is never read at query time. Oracle replays the
# identical quantization in DuckDB list lambdas; determinism holds
# because the quantizer involves no float summation (see
# operators/similarity.py::quantize_int8).
# ---------------------------------------------------------------------------
@query(
    "quantized_ip_topk",
    headline=True,
    oracle="""
    WITH base AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), qz AS (
      SELECT vec_id,
             list_max(list_transform(v, x -> abs(x))) AS s,
             list_transform(v, x -> CASE
               WHEN list_max(list_transform(v, y -> abs(y))) = 0 THEN CAST(0 AS BIGINT)
               ELSE CAST(floor(127 * x /
                 list_max(list_transform(v, y -> abs(y))) + 0.5) AS BIGINT) END) AS q
      FROM base
    ), qvec AS (SELECT s AS sq, q AS qq FROM qz WHERE vec_id = 0)
    SELECT z.vec_id,
           ROUND(list_sum(list_transform(list_zip(z.q, qvec.qq), p -> p[1] * p[2]))
                 * z.s * qvec.sq / 16129.0, 6) AS ip_score
    FROM qz z, qvec
    ORDER BY ip_score DESC, z.vec_id ASC
    LIMIT 10
    """,
)
def quantized_ip_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    qdf = emb.filter(F.col("vec_id") == 0)
    return S.quantized_ip_topk(emb, qdf, k=10)


# ---------------------------------------------------------------------------
# Semantic dedup decision: embedding-cosine near-dup pairs -> connected
# components -> keep the min-id vector per cluster. The vector-space
# mirror of the text-side dedup_keep_canonical chain (operators/
# cluster.py Hash-Min CC); pairs come from the brute-force slice here
# so the DuckDB recursive-CTE oracle replays the identical closure —
# lsh_near_dup_pairs is the corpus-scale pair generator to swap in at
# 100 TB.
# ---------------------------------------------------------------------------
@query(
    "semantic_dedup_decision",
    oracle="""
    WITH RECURSIVE e0 AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      WHERE a.vec_id < 150 AND b.vec_id < 150
        AND ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[])), 6) >= 0.35
    ), edges AS (
      SELECT id_a AS a, id_b AS b FROM e0
      UNION
      SELECT id_b AS a, id_a AS b FROM e0
    ), reach(v, l) AS (
      SELECT vec_id, vec_id FROM embeddings WHERE vec_id < 150
      UNION
      SELECT e.a, r.l FROM edges e JOIN reach r ON e.b = r.v
    )
    SELECT v AS vec_id, CAST(MIN(l) AS BIGINT) AS cluster_id, MIN(l) = v AS keep
    FROM reach GROUP BY v
    """,
)
def semantic_dedup_decision(spark: SparkSession, sf_dir: str) -> DataFrame:
    from elective_waiting_times_pipeline_spark.operators.cluster import connected_components

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 150)
    pairs = S.cosine_near_dup_pairs(emb, threshold=0.35)
    cc = connected_components(pairs, src="id_a", dst="id_b").withColumnRenamed("v", "vec_id")
    return (
        emb.select("vec_id")
        .join(cc, "vec_id", "left")
        .select(
            "vec_id",
            F.coalesce("label", "vec_id").cast("long").alias("cluster_id"),
            (F.coalesce("label", "vec_id") == F.col("vec_id")).alias("keep"),
        )
    )


# ---------------------------------------------------------------------------
# Class-separation matrix: cosine similarity between every pair of
# label centroids — the embedding-space health check (labels whose
# centroids nearly coincide are confusable). Runs over the 6-dp
# ROUNDED centroid relation (|labels| x dim), so both engines fold
# identical doubles; the corpus itself is touched only by the one
# centroid aggregation.
# ---------------------------------------------------------------------------
@query(
    "label_separation",
    oracle="""
    WITH ex AS (
      SELECT label,
             unnest(list_transform(embedding, (x, i) -> struct_pack(pos := i, val := CAST(x AS DOUBLE)))) AS s
      FROM embeddings
    ), cent AS (
      SELECT label, CAST(s.pos AS INT) AS pos, ROUND(AVG(s.val), 6) AS v
      FROM ex GROUP BY label, s.pos
    ), dots AS (
      SELECT a.label AS label_a, b.label AS label_b,
             SUM(a.v * b.v) AS ab, SUM(a.v * a.v) AS aa, SUM(b.v * b.v) AS bb
      FROM cent a JOIN cent b ON a.pos = b.pos AND a.label < b.label
      GROUP BY 1, 2
    )
    SELECT CAST(label_a AS INT) AS label_a, CAST(label_b AS INT) AS label_b,
           ROUND(ab / sqrt(aa) / sqrt(bb), 6) AS centroid_cosine
    FROM dots
    """,
)
def label_separation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from elective_waiting_times_pipeline_spark.operators.similarity import group_centroids

    emb = load_table(spark, sf_dir, "embeddings")
    cent = group_centroids(emb, group_col="label", vec_col="embedding").select(
        "label", "pos", F.col("centroid_val").alias("v")
    )
    a, b = cent.alias("a"), cent.alias("b")
    dots = (
        a.join(b, (F.col("a.pos") == F.col("b.pos")) & (F.col("a.label") < F.col("b.label")))
        .groupBy(F.col("a.label").alias("label_a"), F.col("b.label").alias("label_b"))
        .agg(
            F.sum(F.col("a.v") * F.col("b.v")).alias("ab"),
            F.sum(F.col("a.v") * F.col("a.v")).alias("aa"),
            F.sum(F.col("b.v") * F.col("b.v")).alias("bb"),
        )
    )
    return dots.select(
        F.col("label_a").cast("int"),
        F.col("label_b").cast("int"),
        F.round(F.col("ab") / F.sqrt("aa") / F.sqrt("bb"), 6).alias("centroid_cosine"),
    )


# ---------------------------------------------------------------------------
# Batch retrieval: top-10 per query for a 3-query batch in ONE corpus
# scan (exploded broadcast queries + per-query window rank) — the
# multi-query complement of ann_cosine_topk's single-query contract.
# ---------------------------------------------------------------------------
@query(
    "batch_cosine_topk",
    oracle="""
    WITH q AS (
      SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id IN (0, 1, 2)
    ), scored AS (
      SELECT q.query_id, e.vec_id,
             ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qv), 6)
               AS cosine_sim
      FROM embeddings e CROSS JOIN q
    ), ranked AS (
      SELECT query_id, vec_id, cosine_sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine_sim DESC, vec_id ASC) AS rk
      FROM scored
    )
    SELECT query_id, vec_id, cosine_sim FROM ranked WHERE rk <= 10
    """,
)
def batch_cosine_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    qdf = emb.filter(F.col("vec_id").isin([0, 1, 2])).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return S.batch_cosine_topk(emb, qdf, k=10)


# ---------------------------------------------------------------------------
# Embedding QA 1: L2-norm distribution per label — the first sanity
# report on any embedding dump (un-normalized batches, zero vectors,
# and scale drift between shards all show up here). One scan; the
# norm is a per-row fold over the array (no explode), micro-snapped
# to integer MILLIONTHS before grouping so min/max/avg hash
# identically across engines.
# ---------------------------------------------------------------------------
@query(
    "embedding_norm_stats",
    oracle="""
    WITH norms AS (
      SELECT label,
             CAST(floor(sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                                     x -> x * x))) * 1000000 + 0.5)
                  AS BIGINT) AS nm
      FROM embeddings
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vectors,
           ROUND(MIN(nm) / 1000000.0, 6) AS min_norm,
           ROUND(MAX(nm) / 1000000.0, 6) AS max_norm,
           ROUND(SUM(nm) / CAST(COUNT(*) AS DOUBLE) / 1000000, 6) AS avg_norm
    FROM norms GROUP BY label
    """,
)
def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    sq = F.aggregate(
        F.col("embedding").cast("array<double>"),
        F.lit(0.0),
        lambda acc, x: acc + x * x,
    )
    nm = F.floor(F.sqrt(sq) * 1000000 + 0.5).cast("long")
    return (
        emb.select("label", nm.alias("nm"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vectors"),
            F.round(F.min("nm") / 1000000.0, 6).alias("min_norm"),
            F.round(F.max("nm") / 1000000.0, 6).alias("max_norm"),
            F.round(F.sum("nm") / F.count(F.lit(1)).cast("double") / 1000000, 6).alias("avg_norm"),
        )
    )


# ---------------------------------------------------------------------------
# Embedding QA 2: per-dimension mean/variance — finds dead (constant)
# and exploding dimensions, the projection-layer bug signature. The
# posexplode fans each vector into 64 (dim, value) rows, reduced
# map-side; per-element values are micro-snapped to integer
# MILLIONTHS so the exact long/decimal sums are order-independent,
# and the closed-form variance (S2 - S1^2/n)/n runs on those exact
# sums — identical float ops in both engines.
# ---------------------------------------------------------------------------
@query(
    "embedding_dim_variance",
    oracle="""
    WITH e AS (
      SELECT generate_subscripts(embedding, 1) - 1 AS dim,
             CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS xm
      FROM embeddings
    )
    SELECT CAST(dim AS INT) AS dim,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(xm) AS DOUBLE) / COUNT(*) / 1000000, 6) AS mean_val,
           ROUND((CAST(SUM(CAST(xm AS HUGEINT) * xm) AS DOUBLE)
                  - CAST(SUM(xm) AS DOUBLE) * CAST(SUM(xm) AS DOUBLE) / COUNT(*))
                 / COUNT(*) / 1e12, 6) AS variance
    FROM e GROUP BY dim
    """,
)
def embedding_dim_variance(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    e = emb.select(F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "x"))
    xm = F.floor(F.col("x") * 1000000 + 0.5).cast("long")
    dec = "decimal(38,0)"
    agg = e.select(F.col("dim"), xm.alias("xm")).groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xm").cast("long").alias("s1"),
        F.sum(F.col("xm").cast(dec) * F.col("xm")).alias("s2"),
    )
    return agg.select(
        F.col("dim").cast("int"),
        F.col("n").cast("long"),
        F.round(F.col("s1").cast("double") / F.col("n") / 1000000, 6).alias("mean_val"),
        F.round(
            (
                F.col("s2").cast("double")
                - F.col("s1").cast("double") * F.col("s1").cast("double") / F.col("n")
            )
            / F.col("n")
            / F.lit(1e12),
            6,
        ).alias("variance"),
    )


# ---------------------------------------------------------------------------
# PageRank coreset selection over the kNN graph: rank vectors by
# centrality in their k-nearest-neighbor cosine graph — the classic
# graph-based data-pruning / representative-example selector (central
# nodes cover dense regions; tail nodes are outliers). Demonstrates
# the iterative-algorithm pattern beyond connected components: 5
# power iterations, each one join + one aggregate, lineage truncated
# per round. EXACT cross-engine parity for an iterative float
# algorithm is achieved by running the whole recurrence in integer
# arithmetic: pr lives in "pico-mass" units (total mass 10^12), the
# damping update is
#     pr'(v) = (15*SCALE) // (100*N) + (85 * sum_{u->v} pr(u) // k) // 100
# — floor divisions on non-negative longs, identical in Spark (`div`)
# and DuckDB (`//`). The quadratic kNN edge build is the guarded
# verification baseline (swap in lsh_bucketed_pairs / ivf_assign
# candidate generation at corpus scale); out-degree is exactly k by
# construction, so the share division is constant.
# ---------------------------------------------------------------------------
_PR_SCALE = 10**12
_PR_K = 5
_PR_ITERS = 5


def _pagerank_oracle(k: int = _PR_K, iters: int = _PR_ITERS) -> str:
    sql = f"""
    WITH pairs AS (
      SELECT qa.vec_id AS a, qb.vec_id AS b,
             ROUND(list_cosine_similarity(CAST(qa.embedding AS DOUBLE[]),
                                          CAST(qb.embedding AS DOUBLE[])), 6) AS s
      FROM embeddings qa JOIN embeddings qb ON qa.vec_id <> qb.vec_id
    ), e AS (
      SELECT a, b FROM (
        SELECT a, b, ROW_NUMBER() OVER (PARTITION BY a ORDER BY s DESC, b) AS rk
        FROM pairs
      ) WHERE rk <= {k}
    ), nodes AS (SELECT vec_id AS v FROM embeddings),
    cnt AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM nodes),
    pr0 AS (SELECT v, {_PR_SCALE} // c AS pr FROM nodes, cnt)"""
    for i in range(1, iters + 1):
        sql += f""", pr{i} AS (
      SELECT nodes.v,
             (15 * {_PR_SCALE}) // (100 * cnt.c)
               + (85 * COALESCE(s.inflow, 0)) // 100 AS pr
      FROM nodes
      LEFT JOIN (SELECT e.b AS v, SUM(p.pr // {k}) AS inflow
                 FROM e JOIN pr{i - 1} p ON e.a = p.v GROUP BY e.b) s USING (v),
      cnt
    )"""
    sql += f"""
    SELECT v AS vec_id, CAST(pr AS BIGINT) AS pagerank_pico
    FROM pr{iters} ORDER BY pr DESC, v LIMIT 20
    """
    return sql


@query("knn_pagerank_coreset", oracle=_pagerank_oracle())
def knn_pagerank_coreset(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.count()
    if n > 20_000:
        raise ValueError(
            f"knn_pagerank_coreset's brute-force kNN build is quadratic: {n} rows "
            "> 20000. Generate the edge list with lsh_bucketed_pairs/ivf_assign "
            "blocking at corpus scale and run the same iteration over it."
        )
    # per-side norms bound once per ROW before the quadratic kNN join
    # (S.cosine_with_norms: bit-identical doubles, 3 O(dim) folds per
    # pair -> 1 — this join is the query's dominant stage: n² pairs)
    a = emb.select(
        F.col("vec_id").alias("a"),
        F.col("embedding").cast("array<double>").alias("_va"),
        S.norm(F.col("embedding").cast("array<double>")).alias("_na"),
    )
    b = emb.select(
        F.col("vec_id").alias("b"),
        F.col("embedding").cast("array<double>").alias("_vb"),
        S.norm(F.col("embedding").cast("array<double>")).alias("_nb"),
    )
    sim = F.round(
        S.cosine_with_norms(F.col("_va"), F.col("_vb"), F.col("_na"), F.col("_nb")), 6
    )
    pairs = a.join(b, F.col("a") != F.col("b")).select("a", "b", sim.alias("s"))
    w = Window.partitionBy("a").orderBy(F.col("s").desc(), F.col("b"))
    edges = (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _PR_K)
        .select("a", "b")
        .localCheckpoint(eager=False)
    )
    nodes = emb.select(F.col("vec_id").alias("v"))
    teleport = (15 * _PR_SCALE) // (100 * n)
    pr = nodes.withColumn("pr", F.lit(_PR_SCALE // n).cast("long"))
    for _ in range(_PR_ITERS):
        inflow = (
            edges.join(pr, edges["a"] == pr["v"])
            .select(F.col("b"), F.expr(f"pr div {_PR_K}").alias("share"))
            .groupBy("b")
            .agg(F.sum("share").alias("inflow"))
        )
        pr = (
            nodes.join(inflow, nodes["v"] == inflow["b"], "left")
            .select(
                "v",
                (
                    F.lit(teleport)
                    + F.expr("(85 * coalesce(inflow, 0)) div 100")
                ).cast("long").alias("pr"),
            )
            .localCheckpoint(eager=False)
        )
    return (
        pr.orderBy(F.col("pr").desc(), "v")
        .limit(20)
        .select(F.col("v").alias("vec_id"), F.col("pr").alias("pagerank_pico"))
    )


# Shared integer k-means oracle chain (k=4, 2 Lloyd rounds): v (micro-
# snapped vectors) -> seeds -> c0 -> d1/a1 (round-1 assign) -> m1/c1
# (round-1 recompute) -> d2 (round-2 distances). Consumers pick their
# final select: kmeans_clusters takes the argmin, cluster_balanced_
# sample caps per cluster, silhouette_approx scores the assignment.
_KMEANS_D2 = """WITH v AS (
      SELECT vec_id,
             list_transform(CAST(embedding AS DOUBLE[]),
                            x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS xv
      FROM embeddings
    ), seeds AS (
      SELECT vec_id, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid
      FROM v ORDER BY vec_id LIMIT 4
    ), c0 AS (
      SELECT s.cid, v.xv AS cv FROM seeds s JOIN v USING (vec_id)
    ), d1 AS (
      SELECT v.vec_id, v.xv, c.cid,
             list_sum(list_transform(v.xv, (x, i) -> (x - c.cv[i]) * (x - c.cv[i]))) AS d
      FROM v CROSS JOIN c0 c
    ), a1 AS (
      SELECT vec_id, xv, cid FROM (
        SELECT vec_id, xv, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rk
        FROM d1) WHERE rk = 1
    ), e1 AS (
      SELECT cid, unnest(list_transform(xv, (x, i) -> {'i': i, 'x': x})) AS u FROM a1
    ), m1 AS (
      SELECT cid, u.i AS pos,
             CAST(floor(CAST(SUM(u.x) AS DOUBLE) / COUNT(*) + 0.5) AS BIGINT) AS m
      FROM e1 GROUP BY cid, u.i
    ), c1 AS (
      SELECT cid, list(m ORDER BY pos) AS cv FROM m1 GROUP BY cid
    ), d2 AS (
      SELECT v.vec_id, c.cid,
             list_sum(list_transform(v.xv, (x, i) -> (x - c.cv[i]) * (x - c.cv[i]))) AS d
      FROM v CROSS JOIN c1 c
    )"""


# ---------------------------------------------------------------------------
# Deterministic k-means over the embedding corpus (k=4, 2 Lloyd
# rounds, seeds = 4 smallest vec_ids) — the clustering stage of
# cluster-then-sample curation. All math in micro-scaled longs
# (operators/kmeans.py), so the DuckDB oracle replays the identical
# integer iterations: distances are exact BIGINT folds, centroids
# re-snap via floor(sum/n + 0.5), argmin ties go to the smaller
# cluster id. Scale: assignment is a broadcast map pass; recompute
# exchanges k*dim rows per round.
# ---------------------------------------------------------------------------
@query(
    "kmeans_clusters",
    oracle=_KMEANS_D2
    + """
    SELECT vec_id, cid AS cluster FROM (
      SELECT vec_id, cid,
             row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rk
      FROM d2) WHERE rk = 1
    """,
)
def kmeans_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from elective_waiting_times_pipeline_spark.operators.kmeans import kmeans_lloyd

    emb = load_table(spark, sf_dir, "embeddings")
    return kmeans_lloyd(emb, k=4, iters=2)


# ---------------------------------------------------------------------------
# Cluster-then-sample curation (SemDeDup-style): k-means the embedding
# corpus, then keep at most 40 hash-smallest members per cluster — a
# diversity-preserving downsample (no semantic region may dominate the
# mixture). Composes kmeans_clusters with the skew-safe cap machinery
# (operators/sampling.py::cap_per_group): even a cluster holding half
# the corpus fans across 256 bucket windows, never one task. The
# oracle replays the integer k-means chain, then the identical
# md5-ordered cap.
# ---------------------------------------------------------------------------
@query(
    "cluster_balanced_sample",
    oracle=_KMEANS_D2
    + """, clusters AS (
      SELECT vec_id, cid AS cluster FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rk
        FROM d2) WHERE rk = 1
    )
    SELECT vec_id, cluster, CAST(rn AS BIGINT) AS position
    FROM (SELECT vec_id, cluster,
                 ROW_NUMBER() OVER (
                   PARTITION BY cluster
                   ORDER BY md5(CAST(vec_id AS VARCHAR) || 'cbal'), vec_id
                 ) AS rn
          FROM clusters)
    WHERE rn <= 40
    """,
)
def cluster_balanced_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from elective_waiting_times_pipeline_spark.operators.kmeans import kmeans_lloyd
    from elective_waiting_times_pipeline_spark.operators.sampling import cap_per_group

    emb = load_table(spark, sf_dir, "embeddings")
    clusters = kmeans_lloyd(emb, k=4, iters=2)
    return cap_per_group(clusters, "vec_id", ["cluster"], max_rows=40, salt="cbal").select(
        "vec_id", "cluster", "position"
    )


# ---------------------------------------------------------------------------
# Clustering QUALITY: centroid-based (simplified) silhouette per
# cluster over the k-means assignment — the go/no-go gauge for
# cluster-then-sample curation (a mixture built on clusters with
# silhouette ≈ 0 is noise, not structure). Per point: a = distance to
# own centroid, b = nearest other centroid, s = (b−a)/max(a,b) — the
# classic O(n²) pairwise silhouette collapsed to O(n·k), the standard
# approximation at corpus scale. One corpus scan against the
# BROADCAST k-row centroid table; per-point distances are exact
# BIGINT folds (order-free), s is a fixed sequence of correctly-
# rounded double ops (sqrt included — IEEE-exact, no transcendental),
# micro-snapped so the per-cluster mean accumulates as an exact
# integer sum. Oracle replays the integer k-means chain, then scores
# d2 — the same all-(point, centroid) distance relation.
# ---------------------------------------------------------------------------
@query(
    "silhouette_approx",
    headline=True,
    oracle=_KMEANS_D2
    + """
    , a2 AS (
      SELECT vec_id, cid AS cluster FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rk
        FROM d2) WHERE rk = 1
    ), ab AS (
      SELECT d2.vec_id, a2.cluster,
             MIN(CASE WHEN d2.cid = a2.cluster THEN d2.d END) AS da,
             MIN(CASE WHEN d2.cid <> a2.cluster THEN d2.d END) AS db
      FROM d2 JOIN a2 USING (vec_id) GROUP BY 1, 2
    ), s AS (
      SELECT cluster,
             CAST(floor(CASE WHEN greatest(sqrt(CAST(da AS DOUBLE)), sqrt(CAST(db AS DOUBLE))) = 0
                             THEN 0.0
                             ELSE (sqrt(CAST(db AS DOUBLE)) - sqrt(CAST(da AS DOUBLE)))
                                  / greatest(sqrt(CAST(da AS DOUBLE)), sqrt(CAST(db AS DOUBLE)))
                        END * 1000000 + 0.5) AS BIGINT) AS sppm
      FROM ab
    )
    SELECT CAST(cluster AS INT) AS cluster,
           CAST(COUNT(*) AS BIGINT) AS n_points,
           ROUND(CAST(SUM(sppm) AS DOUBLE) / COUNT(*) / 1000000, 6) AS mean_silhouette
    FROM s GROUP BY cluster
    """,
)
def silhouette_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    from elective_waiting_times_pipeline_spark.operators.kmeans import (
        _sq_dist,
        assign_clusters,
        recompute_centroids,
        snap_micros,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    vecs = snap_micros(emb.select("vec_id", "embedding"))
    # round-1 centroids exactly as kmeans_lloyd(k=4, iters=2) derives
    # them: smallest-id seeds -> assign -> recompute
    seed_rows = emb.select("vec_id").orderBy("vec_id").limit(4).collect()
    seed_map = spark.createDataFrame(
        [(r[0], i) for i, r in enumerate(seed_rows)], "vec_id long, cid int"
    )
    c0 = vecs.join(F.broadcast(seed_map), "vec_id").select("cid", F.col("xv").alias("cv"))
    c1 = recompute_centroids(assign_clusters(vecs, c0))
    # all (point, centroid) exact distances ROW-LOCALLY: the k
    # centroids collapse to one broadcast array row, and the sorted
    # per-point distance structs come from array_sort over a
    # transform — the same comparator the previous
    # groupBy + collect_list + array_sort shape applied, without
    # multiplying the corpus k× and shuffling it back through an
    # aggregation (assign_clusters got the same rewrite)
    cents = c1.agg(
        F.array_sort(F.collect_list(F.struct(F.col("cid"), F.col("cv")))).alias("_cents")
    )
    agg = vecs.crossJoin(F.broadcast(cents)).select(
        "vec_id",
        F.array_sort(
            F.transform(
                F.col("_cents"),
                lambda c: F.struct(
                    _sq_dist(F.col("xv"), c["cv"]).alias("d"), c["cid"].alias("cid")
                ),
            )
        ).alias("ds"),
    )
    best = F.element_at("ds", 1)
    cluster = best["cid"]
    da = F.sqrt(best["d"].cast("double"))
    db = F.sqrt(
        F.array_min(F.filter(F.col("ds"), lambda s: s["cid"] != cluster))["d"].cast("double")
    )
    sil = F.when(F.greatest(da, db) == 0, F.lit(0.0)).otherwise(
        (db - da) / F.greatest(da, db)
    )
    return (
        agg.select(
            cluster.alias("cluster"),
            F.floor(sil * 1000000 + 0.5).cast("long").alias("sppm"),
        )
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.round(F.sum("sppm").cast("double") / F.count(F.lit(1)) / 1000000, 6).alias(
                "mean_silhouette"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Triangle census of the cosine near-dup graph (vec_id<150 slice at
# threshold 0.35 — same edge list as semantic_dedup_decision): edges,
# nodes, triangles, global clustering coefficient. The closed-triple
# count is the oriented three-way equi-join (a<b<c matches each
# triangle once); a graph whose transitivity is high tells the dedup
# consumer that connected components ≈ cliques, i.e. cluster-collapse
# loses little. The O(n²) pair generator is the oracle-friendly
# baseline; the kernel itself consumes any edge list (LSH/banded at
# corpus scale).
# ---------------------------------------------------------------------------
@query(
    "graph_triangle_stats",
    oracle="""
    WITH e AS (
      SELECT a.vec_id AS s, b.vec_id AS t
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
      WHERE a.vec_id < 150 AND b.vec_id < 150
        AND ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[])), 6) >= 0.35
    ), deg AS (
      SELECT v, CAST(COUNT(*) AS BIGINT) AS d
      FROM (SELECT s AS v FROM e UNION ALL SELECT t AS v FROM e)
      GROUP BY v
    ), tri AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
      FROM e e1 JOIN e e2 ON e1.t = e2.s
                JOIN e e3 ON e3.s = e1.s AND e3.t = e2.t
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM e) AS n_edges,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_nodes,
           n_triangles,
           ROUND(CASE WHEN (SELECT SUM(d * (d - 1)) FROM deg) = 0 THEN 0
                      ELSE 6.0 * n_triangles / (SELECT SUM(d * (d - 1)) FROM deg)
                 END, 6) AS clustering_coeff
    FROM tri
    """,
)
def graph_triangle_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from elective_waiting_times_pipeline_spark.operators.cluster import triangle_stats

    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 150)
    # four consumers walk the edge list; checkpoint so the O(n²)
    # cosine generator runs once, not once per branch
    pairs = S.cosine_near_dup_pairs(emb, threshold=0.35).localCheckpoint(eager=False)
    return triangle_stats(pairs.select("id_a", "id_b"))


# ---------------------------------------------------------------------------
# int8 quantization fidelity profile — how much cosine geometry the
# 4x-compressed vector store (quantize_int8, the ANN scale path's
# storage format) gives up, per label: mean and worst cosine between
# each float vector and its own int8 quantization. Each cosine snaps
# to exact ppm (floor(cos·1e6 + 0.5)) BEFORE aggregating, so the sums
# are order-independent integers; quantization itself is per-element
# IEEE math both engines reproduce exactly (no float summation in q).
# ---------------------------------------------------------------------------
@query(
    "quantization_error_profile",
    oracle="""
    WITH q AS (
      SELECT label,
             CAST(embedding AS DOUBLE[]) AS e,
             list_transform(CAST(embedding AS DOUBLE[]),
               x -> floor(127 * x / list_max(list_transform(CAST(embedding AS DOUBLE[]),
                                                            y -> abs(y))) + 0.5)) AS qv
      FROM embeddings
      WHERE list_max(list_transform(CAST(embedding AS DOUBLE[]), y -> abs(y))) > 0
    ), c AS (
      SELECT label,
             CAST(floor(list_cosine_similarity(e, qv) * 1000000 + 0.5) AS BIGINT) AS ppm
      FROM q
    )
    SELECT label,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           ROUND(CAST(SUM(ppm) AS DOUBLE) / COUNT(*) / 1000000, 6) AS mean_cos,
           ROUND(CAST(MIN(ppm) AS DOUBLE) / 1000000, 6) AS worst_cos
    FROM c GROUP BY label
    """,
)
def quantization_error_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    # all-zero vectors are excluded on BOTH sides: cosine against a
    # zero vector is undefined (the oracle's list_cosine_similarity
    # raises on the NULLs its unguarded 127*x/0 produces)
    emb = load_table(spark, sf_dir, "embeddings").filter(
        S.max_abs(F.col("embedding")) > 0
    )
    e = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    _, qv = S.quantize_int8(F.col("embedding"))
    qd = F.transform(qv, lambda x: x.cast("double"))
    ppm = F.floor(S.cosine(e, qd) * 1000000 + 0.5).cast("long")
    c = emb.select("label", ppm.alias("ppm"))
    return c.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.round(F.sum("ppm").cast("double") / F.count(F.lit(1)) / 1000000, 6).alias("mean_cos"),
        F.round(F.min("ppm").cast("double") / 1000000, 6).alias("worst_cos"),
    )
