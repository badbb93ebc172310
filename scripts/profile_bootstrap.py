"""Step-level breakdown of ann_index_bootstrap (the stream-floor fit)."""

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

    from mongoshake_spark.functions.quantization import (
        ivfpq_assign_residuals,
        pq_train,
    )
    from mongoshake_spark.functions.similarity import with_norm
    from mongoshake_spark.plans.queries._shared import _stream_tmpdir, load_table

    spark = get_spark()
    vecs = load_table(spark, SF_DIR, "embeddings")
    vecs.count()

    for rep in range(3):
        tmp = _stream_tmpdir("bootprof_")
        prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        try:
            t = time.time()

            def mark(name):
                nonlocal t
                now = time.time()
                print(f"  {name:28s} {now - t:6.2f}s")
                t = now

            unit = with_norm(vecs, "embedding")
            cents = (
                unit.filter((F.col("vec_id") % 29) == 0)
                .select(
                    F.col("vec_id").alias("cid"),
                    F.col("embedding").alias("cvec"),
                    F.col("vnorm").alias("cnorm"),
                )
                .localCheckpoint(eager=True)
            )
            mark("cents checkpoint")
            cents.select(F.size("cvec").alias("d")).first()
            mark("dim probe first()")
            res = ivfpq_assign_residuals(unit, cents, "vec_id", "embedding").persist()
            mark("residuals lazy+persist")
            codebooks = pq_train(res, 4, 8, 2, "vec_id", "res")
            mark("pq_train (seed+1 Lloyd)")
            cents.write.mode("overwrite").parquet(f"{tmp}/mc")
            mark("write centroids")
            codebooks.write.mode("overwrite").parquet(f"{tmp}/cb")
            mark("write codebooks")
            res.unpersist()
            print(f"--- rep {rep} done ---")
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", prev)
            shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
