"""Query registry shared by all catalog modules.

Each query is registered as a (spark_fn, duckdb_oracle_sql) pair; the
driver contract (`__spark_entry__.py`) and bench harness read these
dicts. Determinism rules (why oracles match hash-for-hash) are
documented in plans/catalog.py.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SPARK_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}

# Headline subset for bench.py (kept small enough to run per-round at
# sf0.1; representative of scan/join/agg/window/text/vector paths).
HEADLINE: list[str] = []


def query(name: str, oracle: str | None = None, headline: bool = False):
    def deco(fn):
        if name in SPARK_QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        SPARK_QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        if headline:
            HEADLINE.append(name)
        return fn

    return deco


def dec2(c) -> F.Column:
    """Cast to DECIMAL(18,2) — the order-independent sum path."""
    return (F.col(c) if isinstance(c, str) else c).cast("decimal(18,2)")


def sum2(c, alias: str):
    """Order-independent double sum (via decimal)."""
    return F.sum(dec2(c)).cast("double").alias(alias)
