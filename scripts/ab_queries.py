"""Targeted serial A/B timer: bench.py's serial protocol (fresh warmed
session, .count() action, min of N passes) over a named query subset.

    python scripts/ab_queries.py q1,q2[,...] [passes]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1].split(",")
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from mongoshake_spark.plans import QUERIES
    from mongoshake_spark.session import get_spark

    spark = get_spark("ab-queries")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet("/root/testdata/sf0.001/events.parquet").count()
    spark.range(64).mapInPandas(lambda it: it, schema="id bigint").selectExpr(
        "count(*)"
    ).collect()

    def drain():
        import gc

        from mongoshake_spark.functions.dedup import release_shingle_indexes
        from mongoshake_spark.functions.retrieval import release_tf_tables

        release_shingle_indexes()
        release_tf_tables()
        gc.collect()
        spark.catalog.clearCache()

    allspans = []
    for p in range(passes):
        spans = {}
        for n in names:
            t0 = time.perf_counter()
            QUERIES[n].fn(spark, sf_dir).count()
            spans[n] = round(time.perf_counter() - t0, 3)
        drain()
        allspans.append(spans)
    best = {n: min(s[n] for s in allspans) for n in names}
    print(json.dumps({"best": best, "passes": allspans, "total_best": round(sum(best.values()), 3)}))


if __name__ == "__main__":
    main()
