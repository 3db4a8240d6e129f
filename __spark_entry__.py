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


# The driver's harness value-checks exactly the FIRST 50 queries() keys
# (dict order) each round. Rotation is DERIVED, not hand-maintained:
# every query that has never appeared green in a past round's
# CORRECTNESS_r*.json (shipped in this repo by the driver) sorts
# first, in registration order, so each round's 50-query window
# spends itself on never-verified or previously-failing queries.
# Every query keeps its local DuckDB-oracle test regardless of
# rotation (tests/test_catalog_oracle.py, same comparator).

import glob as _glob
import json as _json
import os as _os


def _green_rounds() -> dict[str, int]:
    """round-of-latest-record for every query whose LATEST driver check
    succeeded at full strength: hash-verified for oracle-backed
    queries, rows-only completion for no-oracle queries (rows-only IS
    their maximum achievable check, so they must not squat window
    slots forever). A later round's status replaces an earlier one — a
    green-then-regressed query (e.g. text_lang_id, green r1 / err r2)
    re-enters the window, and a green query's STALENESS (how long ago
    its record was refreshed) drives the window ordering below."""
    import re as _re

    status: dict[str, bool] = {}
    last: dict[str, int] = {}
    here = _os.path.dirname(_os.path.abspath(__file__))
    # sort by PARSED round number, not path: lexicographic order would
    # put a future CORRECTNESS_r100.json before r11 and let a stale
    # record overwrite a newer one in the latest-wins fold below
    found: list[tuple[int, str]] = []
    for path in _glob.glob(_os.path.join(here, "CORRECTNESS_r*.json")):
        m = _re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        found.append((int(m.group(1)) if m else 0, path))
    for rnd, path in sorted(found):
        try:
            with open(path) as f:
                data = _json.load(f)
        except (OSError, ValueError):
            continue
        for name, row in data.items():
            if not isinstance(row, dict):
                continue
            err = row.get("err")
            if err is None:
                ok = bool(row.get("hash_match"))
            elif err == "no_oracle":
                ok = row.get("spark_rows") is not None
            else:
                ok = False
            status[name] = ok  # ascending-round fold: latest wins
            last[name] = rnd
    return {n: last[n] for n, ok in status.items() if ok}


def _previously_green() -> set[str]:
    return set(_green_rounds())


# Queries registered AFTER round 3's correctness file was recorded:
# they queue behind the older never-checked backlog so the 50-query
# window drains oldest-first (every query carries an equal-strength
# local oracle test regardless of window slot). Append here when
# adding queries mid-round; prune once they go driver-green.
_REGISTERED_AFTER_R3 = {
    "char_entropy",
    "embedding_norm_stats",
    "embedding_dim_variance",
    "order_priority_count",
    "promo_revenue_share",
    "returned_item_revenue",
    "daily_autocorrelation",
    "knn_pagerank_coreset",
    "k_anonymity_report",
    "leakage_safe_split",
    "split_leakage_audit",
    # TPC-H optimizer-shape completion (this session)
    "nation_trade_volume",
    "market_share",
    "product_type_profit",
    "customer_order_distribution",
    "small_qty_avg_revenue",
    "disjunctive_revenue",
    "idle_customers",
    "revenue_concentration",
    "boilerplate_gram_score",
    "kmeans_clusters",
    "cluster_balanced_sample",
    "stratified_exact_split",
    # second session of round 4
    "late_shipment_priority",
    "top_revenue_supplier",
    "chunk_dedup_exact",
    "flagged_word_profile",
    "theil_sen_trend",
    "graph_triangle_stats",
    # third session of round 4
    "spearman_corr",
    "mann_whitney_value",
    "benford_first_digit",
    "min_cost_supplier",
    "supplier_cnt_by_part",
    "excess_share_suppliers",
    "cusum_changepoint",
    "l_diversity_report",
    "mutual_information",
    "heavy_hitters_cms",
    "psi_drift",
    "ks_test_sources",
    "feature_scale_profile",
    "skew_adaptive_agg",
    "join_null_safe",
    "quantization_error_profile",
    "pareto_revenue_share",
    "rfm_segments",
    "dedup_size_histogram",
    "table_diff_summary",
    "table_checksum",
    "audience_overlap",
    "attribution_last_touch",
    "attribution_linear",
    "fk_integrity_audit",
    "decayed_engagement_topk",
    "log2_value_histogram",
    "source_language_purity",
    "weekend_effect_mwu",
    "supplier_hhi",
    "price_anova_brand",
    "cohort_ltv_matrix",
    # round 5
    "entity_clusters",
    "seasonal_anomaly_how",
    "silhouette_approx",
    "ann_filtered_topk",
    "collocation_pmi",
    "mmr_diversified_topk",
    "pit_feature_join",
    "golden_record_merge",
    "multimodal_image_profile",
    "hier_share_of_parent",
    "bpe_learn_merges",
    "stl_decompose_daily",
    "corr_matrix",
    "bpe_token_stats",
    "cdc_extract",
    "cume_dist_daily_revenue",
    "session_duration_stats",
    "ols_trend_by_type",
    "revenue_bridge",
    "fulfillment_lag_percentiles",
    # round 6
    "tumbling_ohlc",
    "interval_union_length",
    "rolling_median_7d",
    "weighted_median_value",
    "pareto_front_2d",
    "duplicate_ngram_coverage",
    "readability_score",
    "target_encode_smoothed",
    "bot_regularity_flags",
    "funnel_within_1h",
    "stickiness_dau_mau",
    "active_streaks",
    "text_compression_ratio",
    "session_bounce_rate",
    # round 7
    "trimmed_mean_price",
    "monetary_unit_sample",
    "view_purchase_lead_lag",
    "heaps_law_fit",
    "rrf_fusion_topk",
    "prefix_jaccard_pairs",
    "weighted_p90_value",
    "iqr_outlier_fences",
    "orderkey_gap_islands",
    "winsorized_mean_price",
    "capped_running_balance",
    "seat_apportionment",
    "attribution_time_decay",
    "bigram_backoff_logprob",
    # round 9
    "dedup_clusters_incremental",
    # round 10
    "store_ingest_dedup_report",
}

# Queries whose CHECK CLASS upgraded since their latest driver record
# (e.g. an oracle added to a formerly rows-only query): treat as
# never-green so the stronger check gets a driver record. Prune once
# the hash-green round lands.
_FORCE_RECHECK: set[str] = set()
# round 10's four oracle promotions (lsh_near_dup_pairs,
# minhash_estimate_pairs, simhash64, simhash_near_dup_pairs) got
# hash-green driver records in CORRECTNESS_r10 — pruned round 11.


def _rotated(d: dict) -> dict:
    # never-green first (oldest backlog before this round's additions),
    # then greens LEAST-RECENTLY-VERIFIED first: with the whole catalog
    # green, each round's 50-slot window refreshes the stalest third of
    # the records instead of re-checking the same registration prefix
    # forever. Ties (same round) keep registration order.
    rounds = _green_rounds()
    green = set(rounds) - _FORCE_RECHECK
    head = {k: v for k, v in d.items() if k not in green and k not in _REGISTERED_AFTER_R3}
    head |= {k: v for k, v in d.items() if k not in green}
    reg = {k: i for i, k in enumerate(d)}
    stale_first = sorted(
        (k for k in d if k not in head), key=lambda k: (rounds.get(k, 0), reg[k])
    )
    return head | {k: d[k] for k in stale_first}


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _rotated(dict(catalog.SPARK_QUERIES))


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted for
    non-SQL-expressible ops → driver records a rows-only check)."""
    return _rotated(dict(catalog.ORACLE_SQL))
