"""Every catalog query with an oracle must match DuckDB on sf0.001
(the driver repeats this at sf0.01 — same code path)."""

from __future__ import annotations

import pytest

from elective_waiting_times_pipeline_spark.plans import catalog
from tests.oracle import assert_matches_oracle

ORACLE_KEYS = sorted(catalog.ORACLE_SQL)


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(spark, sf_dir, name):
    df = catalog.SPARK_QUERIES[name](spark, sf_dir)
    assert_matches_oracle(df, catalog.ORACLE_SQL[name], sf_dir)


def test_all_queries_have_entries():
    assert set(catalog.ORACLE_SQL) <= set(catalog.SPARK_QUERIES)
    assert len(catalog.SPARK_QUERIES) >= len(catalog.ORACLE_SQL)
