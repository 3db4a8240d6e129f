"""Every catalog query with an oracle must match DuckDB on sf0.001
(the driver repeats this at sf0.01 — same code path).

SPARK_GRAFT_ORACLE_SHARD="i/k" restricts the parametrization to the
queries whose crc32(name) % k == i — scripts/test_shard.py sets one
sub-shard per worker so this file (the suite's single heaviest, and
with file-level sharding its wall-time floor) splits across all
workers. The union over i of 0..k-1 is exactly the full key set and
test IDs are unchanged, so sharded coverage == `pytest tests/`."""

from __future__ import annotations

import os
import zlib

import pytest

from elective_waiting_times_pipeline_spark.plans import catalog
from tests.oracle import assert_matches_oracle

ORACLE_KEYS = sorted(catalog.ORACLE_SQL)

_shard = os.environ.get("SPARK_GRAFT_ORACLE_SHARD")
if _shard:
    _i, _k = (int(x) for x in _shard.split("/"))
    ORACLE_KEYS = [n for n in ORACLE_KEYS if zlib.crc32(n.encode()) % _k == _i]


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(spark, sf_dir, name):
    df = catalog.SPARK_QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, catalog.ORACLE_SQL[name], sf_dir)


def test_all_queries_have_entries():
    assert set(catalog.ORACLE_SQL) <= set(catalog.SPARK_QUERIES)
    assert len(catalog.SPARK_QUERIES) >= len(catalog.ORACLE_SQL)
