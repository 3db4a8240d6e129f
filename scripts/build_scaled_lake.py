#!/usr/bin/env python
"""Build a PERSISTENT ×N replica lake from sf0.1 for larger-SF bench
runs (round-11 measurement-scale fix: the sf0.1 headline bench is
~40% per-query scheduling floor, so shuffle-level wins are sub-noise
there — see VERDICT r10 item 3).

Reuses scale_probe.replicate with the honest-cardinality modes ON by
default (override via the usual env knobs):
  - SPARK_GRAFT_SHIFT_KEYS=o_custkey,l_suppkey,l_partkey,user_id —
    key cardinality scales with the data (TPC-H semantics), FK dims
    replicated with matching PK shifts so joins stay live;
  - SPARK_GRAFT_SHIFT_TEXT=1 — vocabulary scales with the data
    instead of every gram going ×N hot.

Usage: python scripts/build_scaled_lake.py [factor] [out_dir]
Default: factor 10, out dir /root/sf1lake/sf1 (dir basename must end
in "sf<val>" so bench.py reports the right sf).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

os.environ.setdefault(
    "SPARK_GRAFT_SHIFT_KEYS", "o_custkey,l_suppkey,l_partkey,user_id"
)
os.environ.setdefault("SPARK_GRAFT_SHIFT_TEXT", "1")


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/sf1lake/sf1"
    from elective_waiting_times_pipeline_spark import get_spark
    from scale_probe import replicate

    os.makedirs(out, exist_ok=True)
    spark = get_spark(app_name="build_scaled_lake")
    replicate(spark, factor, out)
    # sanity: the orderkey FK must stay live across replicas (lineitem
    # shifts by max(l_orderkey)+1, orders by max(o_orderkey)+1 — these
    # must be the SAME modulus or replica joins dangle)
    from elective_waiting_times_pipeline_spark.sources.readers import load_table

    li = load_table(spark, "/root/testdata/sf0.1", "lineitem")
    od = load_table(spark, "/root/testdata/sf0.1", "orders")
    ml = li.agg({"l_orderkey": "max"}).collect()[0][0]
    mo = od.agg({"o_orderkey": "max"}).collect()[0][0]
    if ml != mo:
        print(f"WARNING: orderkey moduli differ (lineitem {ml} vs orders {mo}) "
              f"— replica FK joins dangle for the mismatched stride")
    big = load_table(spark, out, "lineitem")
    print("lineitem rows:", big.count(), "| orderkey moduli:", ml, mo)


if __name__ == "__main__":
    main()
