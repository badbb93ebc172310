"""Split stream_ann_ingest's drain wall into per-batch encode time vs
structured-streaming machinery (offset/commit logs, file-source listing,
trigger scheduling) by timing the foreachBatch body itself."""

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
    from mongoshake_spark.streaming import ann_ingest as ai

    spark = get_spark()
    vecs = load_table(spark, SF_DIR, "embeddings")
    vecs.count()

    spans = []
    orig_encode = ai.ivfpq_assign_residuals

    for rep in range(2):
        tmp = _stream_tmpdir("drainprof_")
        feed_dir, ckpt_dir, index_dir = f"{tmp}/feed", f"{tmp}/ckpt", f"{tmp}/index"
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        try:
            t0 = time.time()
            ai.ann_index_bootstrap(vecs, index_dir, m=4, k_code=8, iters=2)
            t_boot = time.time() - t0
            _write_class_feed(vecs, F.col("vec_id") % 3, 3, feed_dir, tmp)

            stream = (
                spark.readStream.schema(vecs.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(feed_dir)
            )
            batch_times = []
            q = ai.streaming_ann_ingest(stream, index_dir, ckpt_dir)
            # wrap: re-start with our own foreachBatch timing — instead,
            # simpler: the query is already started; drain it and rely on
            # recentProgress durations.
            if not q.awaitTermination(600):
                q.stop()
                raise RuntimeError("drain timed out")
            t_drain_end = time.time()
            for p in q.recentProgress:
                d = p["durationMs"]
                batch_times.append(
                    (
                        p["batchId"],
                        p["numInputRows"],
                        d.get("triggerExecution"),
                        d.get("addBatch"),
                        d.get("latestOffset"),
                        d.get("walCommit"),
                        d.get("commitOffsets"),
                        d.get("queryPlanning"),
                    )
                )
            print(f"rep{rep} bootstrap {t_boot:.2f}s")
            print(
                "  batch  rows  trigExec  addBatch  latestOff  walCommit  commitOff  planning"
            )
            for b in batch_times:
                print(
                    f"  {b[0]:>5} {b[1]:>5} "
                    + " ".join(f"{(x if x is not None else -1):>9}" for x in b[2:])
                )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
            shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
