"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Queries live in ``elective_waiting_times_pipeline_spark.plans.catalog`` — one
entry per implemented operator from SURVEY.md §2 (plus the
beyond-reference dedup/similarity/text/streaming surface).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from elective_waiting_times_pipeline_spark.plans import catalog


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the signature
    histogram-quantile dashboard kernel over the lineitem fact analog."""
    return catalog.SPARK_QUERIES["histogram_quantile"](spark, "/root/testdata/sf0.001")


# The driver's harness has verified exactly the FIRST 50 queries (in
# dict order) each round — CORRECTNESS_r01/r02 hold the same 50 keys —
# leaving 23 of the 73 registered queries driver-unchecked twice.
# Rotation: surface the never-checked 23 first this round (events /
# vector / sampling / packing / spatial families), then the rest in
# catalog order. Every query keeps its local DuckDB-oracle test
# regardless of rotation (tests/test_catalog_oracle.py).
_ROTATE_FIRST = (
    "simhash_near_dup_pairs", "ngram_top_bigrams", "sample_split_hash",
    "pack_chunks", "pack_greedy", "tfidf_top_terms", "mixture_sample",
    "mad_outlier_filter", "ann_cosine_topk", "cosine_near_dup_pairs",
    "lsh_near_dup_pairs", "ivf_cosine_topk", "embedding_centroids",
    "events_tumbling_window", "sessionize", "month_series",
    "spatial_point_in_polygon", "asof_join_backward",
    "range_join_busy_windows", "events_json_extract", "rolling_mean_1h",
    "events_hopping_window", "events_trending_topk",
    "text_token_count_bpe",  # new in round 3 — never driver-checked
    "dedup_keep_canonical",  # new in round 3 — never driver-checked
    "text_pii_redact",       # new in round 3 — never driver-checked
    "text_repetition",       # new in round 3 — never driver-checked
    "contamination_check",   # new in round 3 — never driver-checked
    "training_order",        # new in round 3 — never driver-checked
    "source_cap_sample",     # new in round 3 — never driver-checked
    "token_budget_select",   # new in round 3 — never driver-checked
    "curation_pipeline",     # new in round 3 — never driver-checked
    "unigram_logprob",       # new in round 3 — never driver-checked
    "skew_salted_agg",       # new in round 3 — never driver-checked
    "skew_salted_join",      # new in round 3 — never driver-checked
    "chunk_sliding_window",  # new in round 3 — never driver-checked
    "embedding_outlier_filter",  # new in round 3 — never driver-checked
    "minhash_estimate_pairs",    # new in round 3 — never driver-checked (rows-only)
    "bm25_topk",                 # new in round 3 — never driver-checked
    "funnel_conversion",         # new in round 3 — never driver-checked
    "cohort_retention",          # new in round 3 — never driver-checked
    "lang_id_confusion",         # new in round 3 — never driver-checked
    "mixture_temperature",       # new in round 3 — never driver-checked
    "dedup_keep_longest",        # new in round 3 — never driver-checked
    "text_lang_id",          # err in r02 (oracle generator bug, fixed
                             # this round) — surface the driver re-check
    "events_gapfill_locf",       # new in round 3 — never driver-checked
    "events_anomaly_zscore",     # new in round 3 — never driver-checked
    "heavy_hitter_terms",        # new in round 3 — never driver-checked
    "runtime_filter_semi_join",  # new in round 3 — never driver-checked
    "quantized_ip_topk",         # new in round 3 — never driver-checked
)


def _rotated(d: dict) -> dict:
    head = {k: d[k] for k in _ROTATE_FIRST if k in d}
    return head | {k: v for k, v in d.items() if k not in head}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _rotated(dict(catalog.SPARK_QUERIES))


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted for
    non-SQL-expressible ops → driver records a rows-only check)."""
    return _rotated(dict(catalog.ORACLE_SQL))
