"""Near-duplicate clustering: connected components over a pair graph,
then keep-canonical dedup.

The near-dup operators (operators/dedup.py) emit PAIRS; turning pairs
into "keep one doc per duplicate group" needs the transitive closure —
A~B and B~C must collapse to one group even when A and C were never
compared. That is connected components.

Algorithm: min-label propagation with label-of-label shortcutting
(Hash-Min + pointer doubling, per Kiveris et al. "Connected Components
in MapReduce and Beyond", SOCC'14 family). Each round every vertex
takes the min of its own label, its neighbors' labels, and its label's
label; shortcutting makes convergence O(log diameter) rounds instead
of O(diameter). Each round is two shuffled equi-joins + one groupBy —
all hash-partitioned on vertex id, no driver-side state; per-round
`localCheckpoint` truncates the lineage so plans stay flat at any
iteration count (an iterative-plan must in Spark — without it the
optimizer re-analyzes an exponentially growing tree).

The reference has no graph operator (dedup there is exact
`!duplicated`, `1b.R:283`); this extends the beyond-reference dedup
family so `minhash_lsh_candidates`/`ngram_jaccard_pairs` outputs can
drive an actual dedup decision at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _union_find_labels(sym: DataFrame) -> DataFrame:
    """Driver-side closure for the small-graph fast path: union-find
    with path compression over the collected symmetric edge list,
    labeling every vertex with the MIN member of its component — the
    exact semantics of the distributed Hash-Min loop. Input size is
    already bounded by the caller's threshold check."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.setdefault(root, root) != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for r in sym.collect():
        ra, rb = find(r.a), find(r.b)
        if ra != rb:
            # larger root attaches UNDER the smaller: every tree's
            # root is therefore the component's min member, so the
            # final label is simply find(v)
            parent[max(ra, rb)] = min(ra, rb)
    rows = [(v, find(v)) for v in list(parent)]
    return sym.sparkSession.createDataFrame(rows, "v long, label long")


def _symmetrize(edges: DataFrame, src: str, dst: str) -> DataFrame:
    """Deduplicated symmetric closure of an edge list, (a, b) columns.

    Symmetrizes ROW-LOCALLY — each edge explodes into its two
    orientations — instead of union(sym, swap(sym)): the union form
    plants the (often expensive) edge subtree TWICE and exchange reuse
    does not fire across the legs (verified on dedup_clusters at the
    ×10 lake: the union-built sym plan held 2 ShuffledHashJoins and
    0 ReusedExchange — the whole Σdf² pair-generation join ran twice;
    8.0 → 5.4 s end-to-end from this alone). The explode references
    the subtree once; output rows are identical (self-loops dropped,
    both orientations emitted, exact duplicates collapsed)."""
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    return (
        sym.select(
            F.explode(
                F.array(
                    F.struct(F.col("a"), F.col("b")),
                    F.struct(F.col("b").alias("a"), F.col("a").alias("b")),
                )
            ).alias("_e")
        )
        .select("_e.a", "_e.b")
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    max_iter: int = 25,
    small_graph_edges: int = 200_000,
) -> DataFrame:
    """(vertex, component) for every vertex appearing in `edges`,
    where component = min vertex id reachable in the undirected graph.
    Deterministic regardless of partitioning (min is order-free).
    Converges in O(log diameter) rounds; raises if `max_iter` rounds
    don't reach a fixpoint (pathological only: 2^max_iter diameter).

    ADAPTIVE STRATEGY: after blocking/LSH, real dedup graphs are often
    tiny relative to the corpus (the corpus-sized work already
    happened in pair generation). A distributed fixpoint on a
    10k-edge graph still pays 3-5 Spark jobs PER ROUND — measured
    ~4-5 s of pure scheduling at any input size. So when the
    (deduplicated, symmetric) edge list holds at most
    `small_graph_edges` rows AND both endpoints are integral types,
    the closure runs as a driver-side union-find over the collected
    edges — the broadcast-equivalent move, bounded at ~2·threshold
    longs — and returns the identical min-reachable labeling. Larger
    graphs take the distributed Hash-Min loop unchanged. Equivalence
    of the two paths is property-tested (tests/test_cluster_properties
    .py); pass small_graph_edges=0 to force the distributed path."""
    sym = _symmetrize(edges, src, dst).localCheckpoint(eager=False)
    # long-only: the fast path emits `v long, label long`, and a
    # narrower input would silently widen its output dtype vs the
    # distributed path (which preserves the input type)
    integral = all(sym.schema[c].dataType.typeName() == "long" for c in ("a", "b"))
    # the count also materializes the checkpoint the distributed path
    # would pay for anyway — one small job either way
    if integral and small_graph_edges > 0 and sym.count() <= small_graph_edges:
        return _union_find_labels(sym)
    # Seed labels with round 1's output directly: starting from
    # label(v)=v, the first propagation round computes exactly
    # min({v} ∪ neighbors(v)) (the label-of-label join is the identity
    # on that start), so folding it into initialization is one groupBy
    # over the already-checkpointed edge list instead of a full
    # two-join round. Typical near-dup graphs (tiny star/clique
    # components) then converge in 1-2 loop rounds instead of 2-3.
    labels = (
        sym.select(F.col("a").alias("v"), F.col("b").alias("label"))
        .unionByName(sym.select(F.col("a").alias("v"), F.col("a").alias("label")))
        .groupBy("v")
        .agg(F.min("label").alias("label"))
        .localCheckpoint(eager=False)
    )
    # Fixpoint detection by exact label sum: every update strictly
    # DECREASES some vertex's label (min of candidates), so the sum is
    # strictly decreasing until convergence and an unchanged sum ⟺ an
    # unchanged labeling. One tiny agg job per round over the freshly
    # checkpointed labels, vs a join + count. DECIMAL(38,0) so the sum
    # is exact at any vertex count (a wrapped long sum could alias).
    prev_sum = None
    for _ in range(max_iter):
        nbr = (
            sym.join(labels.withColumnRenamed("v", "b"), "b")
            .select(F.col("a").alias("v"), "label")
        )
        lol = (
            labels.alias("x")
            .join(labels.select(F.col("v").alias("label"), F.col("label").alias("l2")), "label")
            .select(F.col("x.v").alias("v"), F.col("l2").alias("label"))
        )
        new = (
            labels.unionByName(nbr)
            .unionByName(lol)
            .groupBy("v")
            .agg(F.min("label").alias("label"))
            # Lazy: the fixpoint agg right below is the round's first
            # action, so ONE job both materializes the checkpoint and
            # computes the sum (eager=True ran a separate
            # checkpoint-only job per round — measured ~2× the whole
            # query at sf0.1, where per-job overhead dominates).
            .localCheckpoint(eager=False)
        )
        cur_sum = new.agg(F.sum(F.col("label").cast("decimal(38,0)"))).first()[0]
        labels = new
        if cur_sum == prev_sum:
            return labels
        prev_sum = cur_sum
    raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")


def assign_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """`docs` + a `cluster_id` column: min doc id of the near-dup
    component, own id for singletons (docs in no pair)."""
    # rename BOTH component columns: a docs-side 'label' column (the
    # default ML class column elsewhere in this package) would make
    # the coalesce ambiguous and the drop destructive
    cc = (
        connected_components(pairs, src, dst)
        .withColumnRenamed("v", "_cc_v")
        .withColumnRenamed("label", "_cc_label")
    )
    return (
        docs.join(cc, docs[id_col] == cc["_cc_v"], "left")
        .withColumn("cluster_id", F.coalesce(F.col("_cc_label"), F.col(id_col)))
        .drop("_cc_v", "_cc_label")
    )


def near_dup_clusters(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    min_jaccard: float = 0.1,
) -> DataFrame:
    """(id, cluster_id) with cluster_id = min doc id reachable through
    exact-Jaccard ≥ `min_jaccard` word-shingle pairs; docs with fewer
    than `shingle_n` tokens (no shingles) are singletons.

    Scale shape: EXACT duplicates are collapsed before pair
    generation. A duplicate-heavy corpus (the reason dedup exists)
    makes the all-docs inverted-index fan-out grow with the SQUARE of
    the copy count, while the result is decided entirely by one
    representative per distinct token sequence: copies share their
    rep's shingle set, and the copy↔rep edge is jaccard 1 ≥ any
    threshold, so components over reps lift exactly to components over
    docs (cluster_id = the rep's component label, since rep id = min
    doc id of its copy group). Pair-gen cost is therefore
    O(distinct texts), not O(docs) — ×100 copy replication leaves it
    unchanged. Result is provably identical to running the pair join
    over all docs."""
    from elective_waiting_times_pipeline_spark.operators.dedup import ngram_jaccard_pairs
    from elective_waiting_times_pipeline_spark.operators.text import tokens

    toks = tokens(text_col)
    keyed = docs.select(
        F.col(id_col),
        F.col(text_col),
        F.md5(F.concat_ws("\x1f", toks)).alias("_k"),
        F.size(toks).alias("_nt"),
    )
    eligible = keyed.filter(F.col("_nt") >= shingle_n)
    # ONE aggregation yields both the rep id (min) and the rep's text
    # (min_by) per distinct token sequence — map-side combinable, so a
    # pathologically hot fingerprint still reduces to one row per
    # mapper before the exchange (a window/row_number rewrite would
    # funnel every copy's text into one task). Replaces the previous
    # agg + join-back, which shuffled the full text relation twice.
    # Materialize once: the result feeds BOTH sides of the pair join
    # plus the set-size agg plus the symmetrized edge union — six
    # re-evaluations of the scan+tokenize+dedup subtree without a
    # checkpoint (measured ~2× the whole query at sf0.1).
    rep_full = (
        eligible.groupBy("_k")
        .agg(
            F.min(id_col).alias("_rep"),
            F.min_by(text_col, F.col(id_col)).alias(text_col),
        )
        .localCheckpoint(eager=False)
    )
    reps = rep_full.select("_k", "_rep")
    rep_docs = rep_full.select(F.col("_rep").alias(id_col), text_col)
    pairs = ngram_jaccard_pairs(
        rep_docs, text_col, id_col, shingle_n=shingle_n, min_jaccard=min_jaccard
    )
    cc = connected_components(pairs).withColumnRenamed("v", "_rep")
    return (
        keyed.join(reps, "_k", "left")
        .join(cc, "_rep", "left")
        .select(
            F.col(id_col),
            F.when(
                F.col("_nt") >= shingle_n, F.coalesce("label", "_rep")
            )
            .otherwise(F.col(id_col))
            .alias("cluster_id"),
        )
    )


def dedup_keep_canonical(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Drop every non-canonical member of each near-dup cluster,
    keeping the min-id doc (deterministic, SURVEY §7.5 rule — never
    'first encountered')."""
    withc = assign_clusters(docs, pairs, id_col, src, dst)
    return withc.filter(F.col(id_col) == F.col("cluster_id")).drop("cluster_id")


# ---------------------------------------------------------------------------
# Persisted cluster store: the production lifecycle for the dedup
# DECISIONS (keep-canonical / keep-longest), mirroring the IVF index
# and int8 vector store. Computing the transitive closure is the
# expensive part (pair-gen + O(log diameter) CC rounds over the whole
# corpus); the decisions on top of it are one cheap join each. A
# pipeline that recomputes the closure per decision pays it twice
# (measured at ×100: dedup_keep_canonical ~294 s of recomputed
# closure vs ~190 s for the shared clustering work alone) — write the
# (id, cluster_id) map once, let every downstream decision read it.
# ---------------------------------------------------------------------------


def write_cluster_store(clusters: DataFrame, path: str) -> None:
    """Persist an (id, cluster_id) map (the `near_dup_clusters` /
    `assign_clusters` output) as the reusable cluster store. Plain
    parquet: two int64 columns, splittable, partition-count chosen by
    the writer upstream — at 100 TB the map is ~16 bytes/doc, orders
    of magnitude smaller than the corpus it summarizes."""
    clusters.write.mode("overwrite").parquet(path)


def keep_canonical_from_store(
    docs: DataFrame, store: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """`dedup_keep_canonical`, but against a persisted (id, cluster_id)
    store instead of recomputing the closure. The canonical is the MIN
    id among the cluster's members PRESENT IN `docs` — not the stored
    cluster_id blindly — so a store that is stale relative to the
    input (the original min-id doc was filtered or deleted upstream)
    elects a new representative instead of emitting zero rows for the
    cluster, matching what a one-shot recompute over `docs` would do.
    When the store and `docs` cover the same corpus the two rules
    agree (the stored cluster_id IS the present min). Docs absent from
    the store are kept — a doc the clustering never saw is a singleton
    until the next store refresh (the same new-data semantics as the
    incremental-LSH path in operators/dedup.py). One hash join to
    attach the label plus one map-side-combinable MIN per cluster and
    a narrow rejoin — no pair generation, no CC iterations: O(read)
    at any scale."""
    canon = store.select(
        F.col(id_col).alias("_st_id"), F.col("cluster_id").alias("_st_cl")
    )
    labeled = (
        docs.join(canon, docs[id_col] == F.col("_st_id"), "left")
        .withColumn("_cl", F.coalesce(F.col("_st_cl"), F.col(id_col)))
        .drop("_st_id", "_st_cl")
    )
    winners = labeled.groupBy("_cl").agg(F.min(id_col).alias("_win"))
    return (
        labeled.join(winners, "_cl")
        .filter(F.col(id_col) == F.col("_win"))
        .drop("_cl", "_win")
    )


def keep_longest_from_store(
    docs: DataFrame,
    store: DataFrame,
    id_col: str = "doc_id",
    length_col: str = "n_chars",
) -> DataFrame:
    """Keep-longest per cluster from the persisted store: one join to
    attach cluster_id, one map-side-combinable MIN-of-struct per
    cluster (longest doc wins, tie → min id). NOT a ROW_NUMBER window:
    a mega-cluster — the expected shape of a duplicate-heavy corpus —
    would sort and buffer every member in one window task, while the
    agg reduces each mapper's share of the hot cluster to one struct
    before the exchange. Docs absent from the store are their own
    singleton cluster. Returns (id, cluster_id, length) like the
    one-shot form."""
    joined = docs.select(id_col, length_col).join(
        store.select(F.col(id_col).alias("_st_id"), F.col("cluster_id").alias("_st_cl")),
        F.col(id_col) == F.col("_st_id"),
        "left",
    )
    winner = F.min(
        F.struct(
            (-F.col(length_col)).alias("_negL"), F.col(id_col).alias("_id")
        )
    ).alias("_w")
    return (
        joined.withColumn("cluster_id", F.coalesce(F.col("_st_cl"), F.col(id_col)))
        .groupBy("cluster_id")
        .agg(winner)
        .select(
            F.col("_w._id").alias(id_col),
            "cluster_id",
            (-F.col("_w._negL")).alias(length_col),
        )
    )


def update_cluster_store(
    old_store: DataFrame,
    new_pairs: DataFrame,
    new_ids: DataFrame,
    id_col: str = "doc_id",
    src: str = "id_a",
    dst: str = "id_b",
) -> DataFrame:
    """Merge newly-arrived docs into a persisted (id, cluster_id)
    store WITHOUT re-clustering the old corpus: the refreshed store
    equals a full rebuild over the combined corpus, at the cost of the
    delta.

    Why it's exact: jaccard(a, b) depends only on the two documents,
    so old↔old pairs cannot appear or vanish when new docs arrive —
    the old components are already the closure over every old↔old
    edge, and each old component is represented EXACTLY by its star
    edges (member → cluster_id) from the store. Components over
    (star edges ∪ pairs-touching-new) therefore equal components over
    the combined corpus's full pair graph, and Hash-Min's min-id label
    is the same min over the same merged vertex sets. `new_pairs` must
    contain every qualifying pair with ≥1 new endpoint (from
    `ngram_jaccard_pairs_delta`, or banded LSH candidates + verify at
    corpus scale — the `incremental_lsh_candidates` feed); new docs in
    no pair come out as singletons via `new_ids`.

    Cost shape: each pair endpoint is PROJECTED onto its old cluster
    id first (a new doc projects to itself), so the CC runs on the
    collapsed component graph — |delta pairs| edges, NOT |old docs|
    star edges — and old members get their possibly-merged label back
    through one hash join on cluster_id. The projection is exact
    because the old cluster id is already the min member id: the
    merged component's min over {old cluster mins ∪ new ids} equals
    its min over all member ids. (This also makes the operator robust
    to a pair feed that includes old↔old pairs — they collapse to a
    cluster-level edge and merge the clusters.) No corpus re-tokenize,
    no old↔old posting join, CC sized by the delta. Equivalence to the
    one-shot rebuild is property-tested
    (tests/test_round9_invariants.py)."""
    m_src = old_store.select(
        F.col(id_col).alias(src), F.col("cluster_id").alias("_cl_a")
    )
    m_dst = old_store.select(
        F.col(id_col).alias(dst), F.col("cluster_id").alias("_cl_b")
    )
    proj = (
        new_pairs.select(src, dst)
        .join(m_src, src, "left")
        .join(m_dst, dst, "left")
        .select(
            F.coalesce(F.col("_cl_a"), F.col(src)).alias(src),
            F.coalesce(F.col("_cl_b"), F.col(dst)).alias(dst),
        )
    )
    cc = (
        connected_components(proj, src, dst)
        .withColumnRenamed("v", "_cc_v")
        .withColumnRenamed("label", "_cc_label")
    )
    relabeled_old = (
        old_store.join(cc, old_store["cluster_id"] == F.col("_cc_v"), "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("_cc_label"), F.col("cluster_id")).alias("cluster_id"),
        )
    )
    new_only = new_ids.select(id_col).join(
        old_store.select(id_col), id_col, "left_anti"
    )
    labeled_new = (
        new_only.join(cc, new_only[id_col] == F.col("_cc_v"), "left")
        .select(
            F.col(id_col),
            F.coalesce(F.col("_cc_label"), F.col(id_col)).alias("cluster_id"),
        )
    )
    return relabeled_old.unionByName(labeled_new)


def triangle_stats(pairs: DataFrame, src: str = "id_a", dst: str = "id_b") -> DataFrame:
    """Global triangle census of an undirected edge list: edge count,
    node count, triangle count, and the global clustering coefficient
    3·triangles / wedges (wedges = Σ d(d-1)/2).

    Input edges must be canonical `src < dst` (the near-dup pair
    generators emit exactly that). Triangles count each closed triple
    once via the oriented join — e1=(a,b), e2=(b,c), closed by
    e3=(a,c); with a<b<c each triangle matches exactly one (e1,e2,e3)
    assignment. All three legs are hash equi-joins on vertex keys, the
    standard distributed triangle-count plan; at corpus scale the edge
    list itself comes from a bucketed (LSH/banding) generator, never
    the quadratic baseline, and the canonical a<b orientation already
    halves the join fan-out of high-degree hubs. The edge list feeds
    four branches (two joins, degrees, counts) — callers pass a
    checkpointed/cached relation when the upstream generator is
    expensive (the catalog query does)."""
    e = pairs.select(F.col(src).alias("s"), F.col(dst).alias("t"))
    deg = (
        e.select(F.col("s").alias("v"))
        .unionByName(e.select(F.col("t").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    e1 = e.select(F.col("s").alias("a"), F.col("t").alias("b"))
    e2 = e.select(F.col("s").alias("b2"), F.col("t").alias("c"))
    e3 = e.select(F.col("s").alias("a3"), F.col("t").alias("c3"))
    tri = (
        e1.join(e2, F.col("b") == F.col("b2"))
        .join(e3, (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3")))
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    counts = e.agg(F.count(F.lit(1)).alias("n_edges"))
    nodes = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"), F.sum(F.col("d") * (F.col("d") - 1)).alias("dd")
    )
    return (
        counts.join(F.broadcast(nodes))
        .join(F.broadcast(tri))
        .select(
            "n_edges",
            "n_nodes",
            "n_triangles",
            F.round(
                F.when(F.col("dd") == 0, F.lit(0.0)).otherwise(
                    6.0 * F.col("n_triangles") / F.col("dd")
                ),
                6,
            ).alias("clustering_coeff"),
        )
    )
