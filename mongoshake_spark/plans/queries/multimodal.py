"""Registry domain: multimodal (split from plans/queries.py; registration order preserved within the file)."""

from __future__ import annotations

from mongoshake_spark.plans.queries._shared import (  # noqa: F401
    F,
    _POLY_TEXT,
    _q,
    load_table,
)



@_q(
    "mm_decode_meta",
    """SELECT doc_id, CAST((doc_id % 64 + 1) * 16 AS INT) AS width,
       CAST((doc_id % 48 + 1) * 16 AS INT) AS height,
       CAST(3 AS INT) AS channels,
       CAST(12 + length(text) AS BIGINT) AS n_bytes
FROM documents ORDER BY doc_id""",
    "Multimodal plumbing: binary payload -> mapInPandas decode -> typed "
    "metadata. The oracle recomputes the deterministic fake-decoder output "
    "directly, verifying the whole binary/Arrow/UDF path end-to-end.",
)
def mm_decode_meta(spark, sf_dir):
    from mongoshake_spark.operators import multimodal

    docs = load_table(spark, sf_dir, "documents")
    decoded = multimodal.decode_media(multimodal.attach_fake_media(docs))
    return decoded.select("doc_id", "width", "height", "channels", "n_bytes").orderBy(
        "doc_id"
    )


_MM_FEAT_ORACLE = f"""WITH h AS (
  SELECT doc_id, {_POLY_TEXT} AS ph FROM documents)
SELECT doc_id,
       array_to_string(list_transform(range(0, 16),
         j -> CAST((ph * (2*j + 1) + 7919 * j) % 997 AS INT)), ',') AS features
FROM h ORDER BY doc_id"""


@_q(
    "mm_features",
    _MM_FEAT_ORACLE,
    "Multimodal feature extraction: fake media payloads -> 16-dim float "
    "embeddings via Arrow-batched mapInPandas (payload bytes cross to "
    "Python once; binary pruned downstream). The fake extractor hashes "
    "the payload BODY with the dialect-portable polynomial hash, so the "
    "oracle recomputes the identical integral-float vectors from the "
    "source text the fixture embedded. The vector is projected to a "
    "comma-joined string of its (integral) components on BOTH sides: the "
    "round driver's pandas canonicalizer cannot sort array cells "
    "(CORRECTNESS_r05 ERR), and the int-cast avoids any float-formatting "
    "dialect divergence.",
)
def mm_features_q(spark, sf_dir):
    from mongoshake_spark.operators import multimodal

    docs = load_table(spark, sf_dir, "documents")
    media = multimodal.attach_fake_media(docs)
    feats = multimodal.extract_features(media)
    return feats.select(
        "doc_id",
        F.array_join(
            F.transform("features", lambda x: x.cast("int").cast("string")), ","
        ).alias("features"),
    ).orderBy("doc_id")


@_q(
    "mm_resize_frames",
    """WITH m AS (SELECT doc_id,
    CAST((doc_id % 64 + 1) * 16 AS INT) AS w,
    CAST((doc_id % 48 + 1) * 16 AS INT) AS h
  FROM documents)
SELECT doc_id,
  CAST(floor(w * CASE WHEN greatest(w, h) > 256
                      THEN 256.0 / greatest(w, h) ELSE 1.0 END) AS INT) AS target_w,
  CAST(floor(h * CASE WHEN greatest(w, h) > 256
                      THEN 256.0 / greatest(w, h) ELSE 1.0 END) AS INT) AS target_h,
  CAST(1 + floor((h - 1) / 10.0) AS INT) AS n_frames_sampled,
  CAST(floor((h - 1) / 10.0) * 10 AS INT) AS last_frame
FROM m ORDER BY doc_id""",
    "Multimodal resize + frame-sample planning over DECODED metadata: "
    "aspect-preserving target dims capped at 256, and every-10th frame "
    "indexes bounded by the decoded frame count (the fake decoder's "
    "height doubles as the fake video's frame count — real decoders swap "
    "in behind the same columns). Both are pure JVM column math after the "
    "mapInPandas decode; the oracle recomputes the deterministic fake "
    "header arithmetic (operators/multimodal.resize_plan, "
    "frame_sample_plan).",
)
def mm_resize_frames_q(spark, sf_dir):
    from mongoshake_spark.operators import multimodal

    docs = load_table(spark, sf_dir, "documents")
    decoded = multimodal.decode_media(multimodal.attach_fake_media(docs))
    fr = multimodal.frame_sample_plan("height", every_k=10)
    return (
        multimodal.resize_plan(decoded, max_side=256)
        .select(
            "doc_id",
            "target_w",
            "target_h",
            F.size(fr).alias("n_frames_sampled"),
            F.element_at(fr, -1).alias("last_frame"),
        )
        .orderBy("doc_id")
    )
