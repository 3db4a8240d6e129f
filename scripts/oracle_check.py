#!/usr/bin/env python
"""Strict oracle check for NAMED queries (same representation-
sensitive hash as preflight_window.py), at one or more SF dirs.

Usage: python scripts/oracle_check.py q1 [q2 ...] [--sf dir ...]
Defaults to sf0.001 and sf0.01. Exit 1 on any mismatch.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import duckdb

_ARGS = sys.argv[1:]
sys.argv = sys.argv[:1]  # preflight_window parses sys.argv at import
from preflight_window import TABLES, strict_hash  # type: ignore  # noqa: E402


def main() -> None:
    args = list(_ARGS)
    names: list[str] = []
    sfs: list[str] = []
    it = iter(args)
    for a in it:
        if a == "--sf":
            sfs.append(next(it))
        else:
            names.append(a)
    if not sfs:
        sfs = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]

    import importlib

    entry = importlib.import_module("__spark_entry__")
    from elective_waiting_times_pipeline_spark import get_spark

    spark = get_spark(app_name="oracle_check")
    qs, oracles = entry.queries(), entry.oracle_sql()
    fails: list[str] = []
    for sf in sfs:
        con = duckdb.connect()
        for t in TABLES:
            path = os.path.join(sf, f"{t}.parquet")
            if os.path.exists(path):
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
                )
        for name in names:
            sdf = qs[name](spark, sf).toPandas()
            if name not in oracles:
                print(f"{sf} {name}: rows-only ({len(sdf)} rows)")
                continue
            odf = con.sql(oracles[name]).df()
            hs, ds = strict_hash(sdf)
            ho, do = strict_hash(odf)
            if hs == ho:
                print(f"{sf} {name}: OK ({len(sdf)} rows)")
            else:
                print(
                    f"{sf} {name}: HASH MISMATCH spark={ds} oracle={do} "
                    f"rows {len(sdf)}/{len(odf)}"
                )
                fails.append(f"{sf}:{name}")
    if fails:
        print("FAILS:", fails)
        sys.exit(1)


if __name__ == "__main__":
    main()
