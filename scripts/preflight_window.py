#!/usr/bin/env python
"""Pre-flight the driver's next correctness window: run the FIRST 50
`__spark_entry__.queries()` keys at sf0.01 (the driver's scale) and
compare each against its DuckDB oracle under a REPRESENTATION-SENSITIVE
hash (pandas hash_pandas_object over name-sorted, value-sorted columns
— the strictness class that caught survival_conversion's HUGEINT
column when the dtype-normalizing suite comparator could not).

Usage: python scripts/preflight_window.py [sf_dir] [n_window]
Prints one line per query and a FAIL summary; exit 1 on any mismatch.
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 50

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def strict_hash(df: pd.DataFrame) -> tuple[str, dict]:
    df = df[sorted(df.columns)].copy()
    # unify datetime RESOLUTION only (Spark toPandas gives ns, DuckDB
    # .df() gives us; the values are µs-precision either way) — every
    # other representation difference (e.g. HUGEINT→object/float128 vs
    # int64) must still fail the hash, that's the class this exists for
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    h = hashlib.md5(
        pd.util.hash_pandas_object(df, index=False).values.tobytes()
    ).hexdigest()
    return h, {c: str(df[c].dtype) for c in df.columns}


def main() -> None:
    import importlib

    entry = importlib.import_module("__spark_entry__")
    from elective_waiting_times_pipeline_spark import get_spark

    spark = get_spark(app_name="preflight")
    qs, oracles = entry.queries(), entry.oracle_sql()
    window = list(qs)[:N]

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    fails: list[str] = []
    for name in window:
        try:
            sdf = qs[name](spark, SF).toPandas()
        except Exception as e:
            print(f"{name}: SPARK ERR {type(e).__name__}: {str(e)[:120]}")
            fails.append(name)
            continue
        if name not in oracles:
            print(f"{name}: rows-only ({len(sdf)} rows)")
            continue
        try:
            odf = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"{name}: ORACLE ERR {type(e).__name__}: {str(e)[:120]}")
            fails.append(name)
            continue
        hs, ds = strict_hash(sdf)
        ho, do = strict_hash(odf)
        if hs == ho:
            print(f"{name}: OK ({len(sdf)} rows)")
        else:
            print(f"{name}: HASH MISMATCH spark={ds} oracle={do} "
                  f"rows {len(sdf)}/{len(odf)}")
            fails.append(name)
    print(f"\n{len(window) - len(fails)}/{len(window)} green")
    if fails:
        print("FAILS:", fails)
        sys.exit(1)


if __name__ == "__main__":
    main()
