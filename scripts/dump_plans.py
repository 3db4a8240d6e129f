#!/usr/bin/env python
"""Dump `.explain("formatted")` for headline (or named) queries to
plans/<tag>/<query>_<suffix>.txt — the optimization-round evidence files.

Also prints a one-line summary per query: #Exchange, #Sort, join nodes,
#BatchEvalPython/ArrowEvalPython, and the Spark JOB count the full
execution pays (jobs are pure scheduling overhead at small sf; a query
that launches 15 jobs at sf0.1 is latency-bound on the driver, not on
data).

Usage: python scripts/dump_plans.py <tag> <suffix> [query ...]
  e.g. python scripts/dump_plans.py r10 before
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from elective_waiting_times_pipeline_spark import get_spark
from elective_waiting_times_pipeline_spark.plans import catalog

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:] or list(catalog.HEADLINE)
    outdir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                          "plans", tag)
    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(app_name=f"dump_plans_{tag}")
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    for name in names:
        spark.sparkContext.setJobDescription(f"{name} [{suffix}]")
        df = catalog.SPARK_QUERIES[name](spark, SF)
        jobs0 = len(tracker.getJobIdsForGroup(None) or [])
        # execute THIS DataFrame's QueryExecution so AQE finalizes on it
        df.toPandas()
        jobs1 = len(tracker.getJobIdsForGroup(None) or [])
        import io
        from contextlib import redirect_stdout

        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        formatted = buf.getvalue()
        final = df._jdf.queryExecution().executedPlan().toString()
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(f"== query: {name} @ {SF} ==\n\n")
            f.write("== explain(formatted) ==\n")
            f.write(formatted)
            f.write("\n== final executed plan (AQE) ==\n")
            f.write(final)
        n_ex = len(re.findall(r"Exchange ", final))
        n_sort = len(re.findall(r"\bSort ", final))
        n_py = len(re.findall(r"(BatchEvalPython|ArrowEvalPython|MapInArrow|MapInPandas|FlatMapGroupsInPandas)", final))
        joins = sorted(set(re.findall(r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)", final)))
        print(f"{name}: jobs={jobs1 - jobs0} exchanges={n_ex} sorts={n_sort} "
              f"py={n_py} joins={joins}")
        spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
