"""Sequence packing: laying documents into fixed token-budget context
windows — the step between a curated corpus and a training batch.

Two standard disciplines, both provided:

1. `chunk_offsets` — **concat-and-chunk** (GPT-style pretraining):
   within a shard, documents are laid head-to-tail in a deterministic
   order and the token stream is cut every `budget` tokens; a document
   may straddle a cut. We emit each doc's start offset and the chunk
   containing its first token. Fully SQL-expressible (DuckDB-oracle-
   checked); with `id_cuts` the cum-sum rides the range-bucketed
   distributed prefix so per-task depth stays bounded at corpus scale
   even with few shards (see `chunk_offsets`).

2. `greedy_pack` — **no-split first-fit-decreasing** (SFT-style: a
   document must not straddle windows). Bin packing is inherently
   sequential, so it runs as `applyInPandas` per shard with a
   deterministic visit order (n_tokens desc, id asc). Oversize docs
   (> budget) get a singleton bin flagged `oversize`. State per task is
   O(open bins) ≈ O(shard tokens / budget); shard by enough keys that a
   shard's docs fit an executor — the packing quality loss vs global
   FFD is negligible for corpus-scale shards.

Reference has no packing surface; beyond-reference training-data
operator set (SURVEY §7.3 M5).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

SHARD_COL = "shard"


def _with_shard(df: DataFrame, id_col: str, shards: int) -> DataFrame:
    # positive-key modulo (pmod == % for non-negative ids, matching the
    # SQL oracle); production keys that aren't dense ints should hash
    # first (operators/sampling.hash_hex_prefix)
    return df.withColumn(SHARD_COL, F.pmod(F.col(id_col), F.lit(shards)).cast("int"))


def chunk_offsets(
    df: DataFrame,
    ntok_col: str = "n_tokens",
    id_col: str = "doc_id",
    budget: int = 512,
    shards: int = 8,
    id_cuts: list[float] | None = None,
) -> DataFrame:
    """Concat-and-chunk offsets: (id, shard, start_offset, chunk_id)
    where chunk_id = floor(start_offset / budget) under a head-to-tail
    layout ordered by `id_col` within each shard.

    Without `id_cuts`, the running sum is a plain per-shard window —
    each of the `shards` partitions sorts corpus/shards rows, so this
    form only holds at scale if `shards` is raised with the data. Pass
    `id_cuts` (range_cut_points over the id column — sample the RAW
    table's id so the action does not replay this df's lineage, e.g.
    a corpus tokenize) and the sum rides the range-bucketed
    distributed prefix instead: partition depth ~corpus/|cuts| at any
    shard count, exclusive prefix = inclusive − own weight."""
    sharded = _with_shard(df, id_col, shards)
    if id_cuts is not None:
        from elective_waiting_times_pipeline_spark.operators.sampling import (
            ordered_prefix,
            range_bucket,
        )

        pre = ordered_prefix(
            sharded,
            [F.col(id_col)],
            range_bucket(id_col, id_cuts),
            group_cols=[SHARD_COL],
            weight=ntok_col,
            out_prefix="cum_tok",
        )
        excl = (F.col("cum_tok") - F.col(ntok_col)).cast("long")
        return pre.select(
            F.col(id_col),
            F.col(SHARD_COL),
            excl.alias("start_offset"),
            F.floor(excl / budget).cast("long").alias("chunk_id"),
        )
    w = (
        Window.partitionBy(SHARD_COL)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return sharded.select(
        F.col(id_col),
        F.col(SHARD_COL),
        F.coalesce(F.sum(ntok_col).over(w), F.lit(0)).cast("long").alias("start_offset"),
        F.floor(F.coalesce(F.sum(ntok_col).over(w), F.lit(0)) / budget)
        .cast("long")
        .alias("chunk_id"),
    )


def greedy_pack(
    df: DataFrame,
    ntok_col: str = "n_tokens",
    id_col: str = "doc_id",
    budget: int = 512,
    shards: int = 8,
) -> DataFrame:
    """First-fit-decreasing no-split packing per shard. Output:
    (id, shard, n_tokens, bin_id, oversize). Deterministic: visit order
    is (n_tokens desc, id asc); first bin with room wins."""
    out_schema = StructType.fromDDL(
        f"{id_col} long, {SHARD_COL} int, {ntok_col} long, bin_id int, oversize boolean"
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([ntok_col, id_col], ascending=[False, True])
        remaining: list[int] = []  # room left per open bin
        bin_ids, oversize = [], []
        for n in pdf[ntok_col]:
            n = int(n)
            if n > budget:
                remaining.append(0)  # singleton, permanently full
                bin_ids.append(len(remaining) - 1)
                oversize.append(True)
                continue
            for b, room in enumerate(remaining):
                # strict > for zero-token docs: room >= 0 would admit
                # them into permanently-full bins, including oversize
                # singletons whose bin must stay single-document
                if room >= n and (n > 0 or room > 0):
                    remaining[b] = room - n
                    bin_ids.append(b)
                    break
            else:
                remaining.append(budget - n)
                bin_ids.append(len(remaining) - 1)
            oversize.append(False)
        return pd.DataFrame(
            {
                id_col: pdf[id_col].astype("int64"),
                SHARD_COL: pdf[SHARD_COL].astype("int32"),
                ntok_col: pdf[ntok_col].astype("int64"),
                "bin_id": pd.Series(bin_ids, index=pdf.index, dtype="int32"),
                "oversize": pd.Series(oversize, index=pdf.index),
            }
        )

    sharded = _with_shard(
        df.select(F.col(id_col), F.col(ntok_col).cast("long")), id_col, shards
    )
    return sharded.groupBy(SHARD_COL).applyInPandas(pack, schema=out_schema)


def sliding_chunks(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 64,
    stride: int = 48,
) -> DataFrame:
    """WITHIN-document sliding-window chunking: cut each document's
    token sequence into `window`-token chunks advancing by `stride`
    (overlap = window - stride) — the RAG / long-context prep step,
    complementary to the cross-document disciplines above. Every token
    is covered; the last chunk may be short; docs with ≤ window tokens
    yield exactly one chunk; empty docs yield none.

    One row per (doc, chunk): chunk_idx, start_tok (0-based),
    n_chunk_tokens, chunk_text. Pure array expressions — tokenize
    once, explode a chunk-index sequence, slice the token array; no
    UDF, no shuffle at all (the explode is in-partition), so the
    operator streams a 100 TB corpus at scan speed with output
    amplification ≈ window/stride."""
    if window < 1 or stride < 1:
        raise ValueError("window and stride must be ≥ 1")
    from elective_waiting_times_pipeline_spark.operators.text import tokens

    n = F.col("_n")
    # chunks start at 0, stride, 2·stride, …; the last is the first
    # whose end reaches n — ceil((n-window)/stride)+1 — except when
    # stride > window (gap-subsampling), where that start could land
    # past the end: clamp by ceil(n/stride) so every start is < n.
    n_chunks = F.when(n <= window, F.lit(1)).otherwise(
        F.least(
            F.expr(f"((_n - {window} + {stride} - 1) div {stride})") + 1,
            F.expr(f"((_n + {stride} - 1) div {stride})"),
        )
    )
    start = F.col("chunk_idx") * stride
    return (
        df.select(F.col(id_col), tokens(text_col).alias("_w"))
        .withColumn("_n", F.size("_w"))
        .filter(n >= 1)
        .select(id_col, "_w", "_n", F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"))
        .select(
            id_col,
            F.col("chunk_idx").cast("int"),
            start.cast("int").alias("start_tok"),
            F.least(F.lit(window), n - start).cast("int").alias("n_chunk_tokens"),
            F.concat_ws(" ", F.slice("_w", start + 1, window)).alias("chunk_text"),
        )
    )
