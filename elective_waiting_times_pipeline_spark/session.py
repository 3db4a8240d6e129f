"""SparkSession factory with scale-aware defaults.

Local test/bench runs use ``local[N]``; the same configuration set is
what we would ship to a 1000-executor cluster (AQE on, skew-join on,
sane shuffle partitioning, Arrow for the few Pandas-UDF paths, UTC
session timezone so results are oracle-comparable).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "elective_waiting_times_pipeline_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    Defaults are driven by env vars so the driver/bench harness can
    steer them: ``SPARK_GRAFT_CPUS`` sets local parallelism.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # local mode = driver-only JVM; the default 1g heap OOMs on
        # wide plans and big shuffles long before the box (128 GiB) is
        # near full. Effective only at JVM launch.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        # Shuffle sizing: ~cores locally; AQE coalesces at runtime so a
        # too-high static number is cheap, a too-low one is not.
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Adaptive execution: runtime partition coalescing, skew-join
        # splitting, and dynamic join-strategy switching. These are the
        # knobs that make the same plan survive a 100x scale-up.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow for the pandas_udf / createDataFrame(pandas) edges.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Oracle comparability: DuckDB timestamps are UTC-naive.
        .config("spark.sql.session.timeZone", "UTC")
        # Parquet TIMESTAMP(NANOS) (events table) has no Spark type:
        # read as long; sources.readers converts to TimestampType at
        # the scan edge (truncating ns → µs).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Quiet the UI for headless runs.
        .config("spark.ui.enabled", "false")
        # InferFiltersFromGenerate adds `size(e) > 0 AND isnotnull(e)`
        # below every explode/Generate, and predicate pushdown inlines
        # the generator's DEFINING EXPRESSION into that filter. Every
        # explode in this engine feeds on a COMPUTED array (tokenize /
        # shingle / hash-chain pipelines), so the inferred filter
        # re-evaluates the full expression per row — doubling the
        # dominant per-row cost of the text family — and never reaches
        # the parquet scan (no raw-column explodes exist here, so the
        # rule's pushdown upside is structurally zero in this engine).
        # Verified in optimized plans (the tokenize chain appeared in
        # both Filter and Generate) and by A/B: text-family headline
        # subset 15.2 s → 14.0 s at sf0.1; at scale the win is a full
        # tokenize pass per explode consumer. Scale-independent plan
        # hygiene, not a local[32] tune.
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
        # Whole-stage-codegen class cache. The default 100 entries
        # thrash in a session that runs the whole catalog: the
        # range_bucket 63-term CASE-WHEN (the distributed-rank
        # bucketer) costs seconds to janino-compile, and eviction by
        # ~interleaved other queries forces a recompile on every pass
        # (measured: weighted_median_value 2.2 s warm vs 5.9 s when 4
        # other lineitem queries run in between; 2.6 s with this cache
        # raised). Static JVM-wide cache, read once at first use.
        .config("spark.sql.codegen.cache.maxEntries", "2000")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            # excludedRules MERGES with the built-in exclusion instead
            # of replacing it: bind_once's single-evaluation contract
            # (functions/barrier.py) depends on InferFiltersFromGenerate
            # staying excluded, and a caller overriding the conf for an
            # unrelated rule would silently re-enable it.
            if k == "spark.sql.optimizer.excludedRules":
                builtin = (
                    "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate"
                )
                rules = [r.strip() for r in v.split(",") if r.strip()]
                if builtin not in rules:
                    rules.append(builtin)
                v = ",".join(rules)
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
