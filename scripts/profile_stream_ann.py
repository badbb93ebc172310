"""Per-phase wall + job-count profile of stream_ann_ingest /
stream_ann_compaction (VERDICT r12 item 3: the stream bootstrap floor).

Runs the SAME steps as the registry query fns with a timer around each
phase and the statusTracker job counter sampled between phases, so the
floor claim ("micro-batch scheduling + sink commits") is auditable
per phase instead of per query.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mongoshake_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    import shutil

    from pyspark.sql import functions as F

    from mongoshake_spark.plans.queries._shared import (
        _stream_tmpdir,
        _write_class_feed,
        load_table,
    )
    from mongoshake_spark.streaming.ann_ingest import (
        ann_index_bootstrap,
        ann_index_topk,
        streaming_ann_ingest,
    )

    spark = get_spark()
    st = spark.sparkContext.statusTracker()

    t_last = [time.time()]
    j_last = [len(st.getJobIdsForGroup(None) or [])]

    def phase(name: str) -> None:
        now = time.time()
        jobs = len(st.getJobIdsForGroup(None) or [])
        print(f"{name:28s} {now - t_last[0]:7.2f}s  jobs+{jobs - j_last[0]}")
        t_last[0] = now
        j_last[0] = jobs

    vecs = load_table(spark, SF_DIR, "embeddings")
    vecs.count()
    phase("warmup count")

    for rep in range(2):
        tmp = _stream_tmpdir("annprof_")
        feed_dir, ckpt_dir, index_dir = (
            f"{tmp}/feed",
            f"{tmp}/ckpt",
            f"{tmp}/index",
        )
        prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        t_last[0] = time.time()
        print(f"--- rep {rep} ---")
        try:
            ann_index_bootstrap(vecs, index_dir, m=4, k_code=8, iters=2)
            phase("bootstrap (fit+write)")
            _write_class_feed(vecs, F.col("vec_id") % 3, 3, feed_dir, tmp)
            phase("feed build")
            stream = (
                spark.readStream.schema(vecs.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(feed_dir)
            )
            q = streaming_ann_ingest(stream, index_dir, ckpt_dir)
            if not q.awaitTermination(600):
                q.stop()
                raise RuntimeError("drain timed out")
            phase("drain (3 batches)")
            out = ann_index_topk(
                spark, index_dir, vecs.filter(F.col("vec_id") < 10), k=5, n_probe=2
            )
            out.orderBy("query_id", "rank").localCheckpoint(eager=True)
            phase("probe + checkpoint")
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
            shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
