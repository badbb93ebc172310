"""Sample active stages during one query run: which stage dominates the
wall and how many tasks it has (scaling-diagnosis tool for
BENCH_SCALING.md).

    SPARK_GRAFT_CPUS=32 python scripts/probe_stages.py <query> [sf_dir]
"""

from __future__ import annotations

import os
import sys
import threading
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/sfscale/sf1"

    from mongoshake_spark.plans import QUERIES
    from mongoshake_spark.session import get_spark

    spark = get_spark("probe-stages")
    # warm
    QUERIES[name].fn(spark, "/root/testdata/sf0.01").write.format("noop").mode(
        "overwrite"
    ).save()
    spark.catalog.clearCache()
    from mongoshake_spark.functions.dedup import release_shingle_indexes

    release_shingle_indexes()

    st = spark.sparkContext.statusTracker()
    samples: dict[int, float] = defaultdict(float)
    info: dict[int, tuple] = {}
    stop = threading.Event()

    def sampler():
        while not stop.is_set():
            for sid in st.getActiveStageIds() or []:
                samples[sid] += 0.1
                si = st.getStageInfo(sid)
                if si:
                    info[sid] = (si.numTasks, si.name[:90])
            time.sleep(0.1)

    th = threading.Thread(target=sampler, daemon=True)
    th.start()
    t0 = time.time()
    df = QUERIES[name].fn(spark, sf_dir)
    t_build = time.time() - t0
    t0 = time.time()
    df.write.format("noop").mode("overwrite").save()
    t_run = time.time() - t0
    stop.set()
    th.join(2)
    print(f"{name}: build {t_build:.2f}s  noop {t_run:.2f}s")
    for sid, sec in sorted(samples.items(), key=lambda kv: -kv[1])[:12]:
        nt, nm = info.get(sid, ("?", "?"))
        print(f"  stage {sid:>4}  ~{sec:6.1f}s active  tasks={nt}  {nm}")


if __name__ == "__main__":
    main()
