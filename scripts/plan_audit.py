#!/usr/bin/env python
"""Plan audit: run every headline query through the noop sink and
summarize its FINAL (AQE-decided) physical plan — scans, shuffles,
broadcasts, whole-stage-codegen spans, pushed filters, reuse — into a
markdown table (PLANS.md). The per-query review the scale brief asks
for ("explain('formatted') and iterate"), kept as a regenerable
artifact.

Usage: python scripts/plan_audit.py [sf_dir] > PLANS.md
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from elective_waiting_times_pipeline_spark import get_spark
from elective_waiting_times_pipeline_spark.plans import catalog

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def audit(df):
    # drive THIS DataFrame's own QueryExecution (df.write would execute
    # a clone, leaving this plan's AQE un-finalized)
    df.toPandas()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # finalized AQE prints "== Final Plan ==" then "== Initial Plan ==";
    # keep only the final section or every node counts twice
    plan = plan.split("== Initial Plan ==")[0]
    scans = plan.count("FileScan parquet")
    rdd_scans = plan.count("Scan ExistingRDD")
    bcasts = plan.count("BroadcastExchange")
    reused = plan.count("ReusedExchange")
    shuffles = len(re.findall(r"Exchange (?:hash|range|Single)", plan))
    pushed = len(re.findall(r"PushedFilters: \[(?!\])", plan))
    codegen = len(set(re.findall(r"\*\((\d+)\)", plan)))
    topk = "TakeOrderedAndProject" in plan
    return scans, rdd_scans, shuffles, bcasts, reused, pushed, codegen, topk


def main():
    spark = get_spark(shuffle_partitions=8)
    print("# PLANS — final-physical-plan audit of the FULL query catalog")
    print()
    print(f"Regenerate: `python scripts/plan_audit.py {SF} > PLANS.md`.")
    print("Plans are the EXECUTED (AQE-final) plans through the noop sink.")
    print("Shuffle = hash/range/single-partition Exchange; checkpointed")
    print("subtrees appear as RDD scans (their upstream cost runs once).")
    print("Headline queries (bench.py's set) are listed first, then every")
    print("other registered catalog query alphabetically.")
    print()
    print("| query | headline | parquet scans | rdd scans | shuffles | broadcasts | reused exch | pushed-filter scans | codegen spans | top-k |")
    print("|---|---|---|---|---|---|---|---|---|---|")
    headline = list(catalog.HEADLINE)
    rest = sorted(set(catalog.SPARK_QUERIES) - set(headline))
    for name in headline + rest:
        hl = "yes" if name in headline else "—"
        try:
            df = catalog.SPARK_QUERIES[name](spark, SF)
            s, r, x, b, ru, p, c, t = audit(df)
            print(
                f"| {name} | {hl} | {s} | {r} | {x} | {b} | {ru} | {p} | {c} | {'yes' if t else '—'} |"
            )
        except Exception as ex:  # pragma: no cover — audit must not die mid-table
            print(f"| {name} | {hl} | ERR: {str(ex)[:60]} | | | | | | | |")


if __name__ == "__main__":
    main()
