#!/usr/bin/env python
"""Benchmark harness — runs the declared-query registry at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

  {"metric": "total_query_wall", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1}

Each query is timed to completion (count() forces full execution incl.
sinks' shuffle; results are small aggregates so collection cost is nil).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mongoshake_spark.plans import QUERIES  # noqa: E402
from mongoshake_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0
    spark = get_spark("mongoshake-bench")
    # Warm the JVM/codegen and the Python UDF workers once so the first
    # timed query doesn't pay session startup (we measure query cost,
    # not JVM boot / worker spin-up).
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.range(64).mapInPandas(
        lambda it: it, schema="id bigint"
    ).selectExpr("count(*)").collect()

    timings: dict[str, float] = {}
    for name, q in QUERIES.items():
        t0 = time.perf_counter()
        df = q.fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 3)
        _ = n
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
