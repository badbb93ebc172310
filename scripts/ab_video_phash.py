"""Interleaved A/B for the min-matching-band emission in simhash_pairs64
(dedup_video_phash / phash consumers): OLD shape (join -> hamming ->
distinct) inlined here vs the NEW library path, same session, noop sink,
alternating reps."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mongoshake_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from pyspark.sql import functions as F

    from mongoshake_spark.functions.dedup import simhash_band_keys
    from mongoshake_spark.operators import multimodal
    from mongoshake_spark.operators.multimodal import (
        VIDEO_FRAME_BITS,
        VIDEO_FRAME_LIMIT,
        frame_phashes,
    )
    from mongoshake_spark.sources.tables import load_table

    spark = get_spark("ab-video")
    docs = load_table(spark, SF_DIR, "documents")
    media = multimodal.attach_fake_media(docs).withColumn(
        "n_frames", (F.col("doc_id") % 5 + 3).cast("int")
    )

    def sims_df():
        fp = frame_phashes(media, "n_frames", 1, "fake")
        ordinal = F.expr("frame div 1")
        fid = (
            F.when(
                ordinal >= VIDEO_FRAME_LIMIT, F.lit(None).cast("bigint")
            )
            .otherwise(F.shiftleft(F.col("doc_id"), VIDEO_FRAME_BITS) + ordinal)
            .alias("doc_id")
        )
        return fp.select(fid, F.col("phash").alias("simhash")).localCheckpoint(
            eager=True
        )

    def old_pairs(sims):
        keyed = simhash_band_keys(sims).withColumn("sub", F.lit(0))
        a, b = keyed.alias("a"), keyed.alias("b")
        return (
            a.join(
                b,
                (F.col("a.k") == F.col("b.k"))
                & (F.col("a.band_val") == F.col("b.band_val"))
                & (F.col("a.sub") == F.col("b.sub"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
                F.expr("CAST(bit_count(a.simhash ^ b.simhash) AS INT)").alias(
                    "hamming"
                ),
            )
            .filter(F.col("hamming") <= 3)
            .distinct()
        )

    def new_pairs(sims):
        from mongoshake_spark.functions import dedup as _dedup

        return _dedup.simhash_pairs64(media, max_hamming=3, sims=sims)

    def vote(frame_pairs):
        return (
            frame_pairs.select(
                F.shiftright(F.col("doc_a"), VIDEO_FRAME_BITS).alias("video_a"),
                F.shiftright(F.col("doc_b"), VIDEO_FRAME_BITS).alias("video_b"),
            )
            .filter(F.col("video_a") != F.col("video_b"))
            .groupBy("video_a", "video_b")
            .agg(F.count("*").alias("n_shared_frames"))
            .filter(F.col("n_shared_frames") >= 2)
        )

    # warm both plans once
    for mk in (old_pairs, new_pairs):
        s = sims_df()
        vote(mk(s)).write.format("noop").mode("overwrite").save()

    res = {"old": [], "new": []}
    for _ in range(4):
        for tag, mk in (("old", old_pairs), ("new", new_pairs)):
            s = sims_df()
            df = vote(mk(s))
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            res[tag].append(round(time.perf_counter() - t0, 3))
    print("old:", res["old"], "min", min(res["old"]))
    print("new:", res["new"], "min", min(res["new"]))


if __name__ == "__main__":
    main()
