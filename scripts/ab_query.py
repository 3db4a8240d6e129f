#!/usr/bin/env python
"""A/B one catalog query in a fresh session: warmup + min-of-N timed runs.

Usage: python scripts/ab_query.py <query> [--conf k=v ...] [--runs N]
Prints one JSON line {"query": ..., "sec": min, "all": [...]}.
A fresh-session harness is the only honest way to A/B a SESSION CONF
(e.g. an optimizer rule exclusion): conf set after getOrCreate() would
silently no-op for static confs and poison same-session comparisons.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from elective_waiting_times_pipeline_spark import get_spark
from elective_waiting_times_pipeline_spark.plans import catalog


def main() -> None:
    args = sys.argv[1:]
    name = args.pop(0)
    conf: dict[str, str] = {}
    runs = 2
    while args:
        a = args.pop(0)
        if a == "--conf":
            k, _, v = args.pop(0).partition("=")
            conf[k] = v
        elif a == "--runs":
            runs = int(args.pop(0))
        else:
            raise SystemExit(f"unknown arg {a}")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name=f"ab:{name}", extra_conf=conf or None)
    import gc

    def run() -> float:
        t0 = time.perf_counter()
        catalog.SPARK_QUERIES[name](spark, sf_dir).collect()
        dt = time.perf_counter() - t0
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        return dt

    run()  # warmup
    times = [round(run(), 3) for _ in range(runs)]
    print(json.dumps({"query": name, "sec": min(times), "all": times, "conf": conf}))


if __name__ == "__main__":
    main()
