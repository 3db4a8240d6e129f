"""The driver imports __spark_entry__ and runs queries in ITS OWN
SparkSession (default confs — no nanosAsLong, possibly non-UTC). The
engine must self-configure at the source edge; these tests run the
contract through a fresh default-conf session to prove it."""

from __future__ import annotations

import importlib
import sys

import pytest

sys.path.insert(0, "/root/repo")


@pytest.fixture(scope="module")
def entry_mod():
    return importlib.import_module("__spark_entry__")


@pytest.fixture(scope="module")
def fresh(spark):
    # newSession(): same JVM, fresh default SQLConf — the driver-sim.
    return spark.newSession()


def test_entry_runs_under_default_session(entry_mod, fresh):
    rows = entry_mod.entry(fresh).collect()
    assert len(rows) >= 1


def test_every_oracle_key_has_query(entry_mod):
    qs, os_ = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) >= 50


@pytest.mark.parametrize("name", ["events_tumbling_window", "sessionize", "date_funcs", "asof_join_backward"])
def test_timezone_sensitive_queries_match_oracle_under_default_session(entry_mod, fresh, sf_dir, name):
    from tests.oracle import assert_matches_oracle

    df = entry_mod.queries()[name](fresh, sf_dir)
    assert_matches_oracle(df, entry_mod.oracle_sql()[name], sf_dir)


def test_rotation_fits_driver_window(entry_mod):
    # The driver value-checks the FIRST 50 queries() entries. Every
    # rotated-in name must be a real query, the rotation must fit the
    # window, and rotation must never drop or duplicate a query.
    import __spark_entry__ as m

    qs = list(entry_mod.queries())
    assert len(m._ROTATE_FIRST) <= 50
    assert len(set(m._ROTATE_FIRST)) == len(m._ROTATE_FIRST)
    missing = [n for n in m._ROTATE_FIRST if n not in qs]
    assert not missing, f"rotated names not in catalog: {missing}"
    assert qs[: len(m._ROTATE_FIRST)] == list(m._ROTATE_FIRST)
    assert len(qs) == len(set(qs))
