"""addBatch durations for the stream_neardup / stream_media_neardup
drains (recentProgress), to isolate the per-batch encode cost from
fresh-JVM noise when A/B-ing the batch fan-out."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mongoshake_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    import shutil

    from pyspark.sql import functions as F

    from mongoshake_spark.operators import multimodal
    from mongoshake_spark.plans.queries._shared import (
        _stream_tmpdir,
        _write_class_feed,
        load_table,
    )
    from mongoshake_spark.streaming.neardup import (
        streaming_lsh_dedup,
        streaming_phash_dedup,
    )

    spark = get_spark()
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    docs.count()

    for rep in range(2):
        tmp = _stream_tmpdir("ndprof_")
        try:
            feed = f"{tmp}/feed"
            _write_class_feed(docs, F.col("doc_id") % 2, 2, feed, tmp)
            prev = spark.conf.get("spark.sql.shuffle.partitions")
            spark.conf.set("spark.sql.shuffle.partitions", "8")
            stream = (
                spark.readStream.schema(docs.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(feed)
            )
            q = streaming_lsh_dedup(stream, f"{tmp}/idx", f"{tmp}/pairs", f"{tmp}/ck")
            q.awaitTermination(600)
            spark.conf.set("spark.sql.shuffle.partitions", prev)
            print(
                f"rep{rep} lsh  addBatch:",
                [p["durationMs"].get("addBatch") for p in q.recentProgress],
            )
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    media = multimodal.attach_fake_media(load_table(spark, SF_DIR, "documents"))
    for rep in range(2):
        tmp = _stream_tmpdir("mdprof_")
        try:
            feed = f"{tmp}/feed"
            _write_class_feed(media, F.col("doc_id") % 2, 2, feed, tmp)
            stream = (
                spark.readStream.schema(media.schema)
                .option("maxFilesPerTrigger", 1)
                .parquet(feed)
            )
            q = streaming_phash_dedup(stream, f"{tmp}/idx", f"{tmp}/pairs", f"{tmp}/ck")
            q.awaitTermination(600)
            print(
                f"rep{rep} phash addBatch:",
                [p["durationMs"].get("addBatch") for p in q.recentProgress],
            )
        finally:
            shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
