#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints one
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with the noop sink (full execution, no
driver collect).  A warmup query amortizes JVM startup, and each query
runs $SPARK_GRAFT_BENCH_RUNS times (default 3) reporting the fastest
run — steady-state plan execution, excluding the one-time whole-stage
codegen compilation a resident engine pays once.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from ffiec_pq_spark import catalog
from ffiec_pq_spark.session import get_spark

HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_nation_revenue",
    "full_outer_coalesce",
    "unpivot_measures",
    "pivot_roundtrip",
    "dup_key_groups",
    "union_distinct_keys",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("ffiec_pq_spark_bench")
    queries = catalog.queries()
    names = [n for n in HEADLINE if n in queries]

    # warmup: boot executors + codegen on a trivial plan
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    timings: dict[str, float] = {}
    for name in names:
        df = queries[name](spark, sf_dir)
        best = float("inf")
        for _ in range(runs):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
