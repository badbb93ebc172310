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


# unrolled 16-term dot product over the feature lists (fixed FEATURE_DIM;
# far faster in DuckDB than a per-element list_reduce lambda at the
# pipeline's survivors^2 pair count)
def _dot16(a: str, b: str) -> str:
    return "(" + " + ".join(f"{a}[{i}]*{b}[{i}]" for i in range(1, 17)) + ")"


from mongoshake_spark.plans.queries.dedup import _PHASH_CTES  # noqa: E402

_PIPELINE_MEDIA_ORACLE = f"""WITH {_PHASH_CTES},
p1 AS (SELECT DISTINCT y.doc_id AS drop_id
       FROM phs x JOIN phs y ON x.doc_id < y.doc_id
       WHERE bit_count(xor(x.phash, y.phash)) <= 3),
dd AS (SELECT ph.doc_id, ph.h, d.text
       FROM ph JOIN documents d USING (doc_id)
       WHERE ph.doc_id NOT IN (SELECT drop_id FROM p1)),
f AS (SELECT doc_id, text,
             list_transform(range(0, 16),
                            j -> CAST((h*(2*j + 1) + 7919*j) % 997 AS DOUBLE)) AS v
      FROM dd),
n AS (SELECT doc_id, text, v, sqrt({_dot16('v', 'v')}) AS vn FROM f),
p2 AS (SELECT DISTINCT b.doc_id AS drop_id
       FROM n a JOIN n b ON a.doc_id < b.doc_id
       WHERE {_dot16('a.v', 'b.v')} * 20 >= 19 * (a.vn * b.vn)),
k AS (SELECT doc_id, text FROM n WHERE doc_id NOT IN (SELECT drop_id FROM p2))
SELECT doc_id,
       CAST((doc_id % 64 + 1) * 16 AS INT) AS width,
       CAST((doc_id % 48 + 1) * 16 AS INT) AS height,
       CAST(12 + length(text) AS BIGINT) AS n_bytes
FROM k
WHERE (doc_id % 64 + 1) * 16 >= 128
  AND (doc_id % 48 + 1) * 16 >= 128
  AND 12 + length(text) >= 64
ORDER BY doc_id"""


@_q(
    "pipeline_media",
    _PIPELINE_MEDIA_ORACLE,
    "The end-to-end MEDIA curation pipeline — the multimodal twin of "
    "pipeline_curation, proving the media operators COMPOSE: perceptual "
    "dHash near-dup keep-set (phash_pairs band join, drop the higher id "
    "of every Hamming<=3 pair) -> feature extraction on the survivors "
    "(extract_features, one Arrow crossing, binary pruned after) -> "
    "semantic near-dup over those features via the composed 100TB LSH "
    "path (neardup_pairs(prebucket='lsh'), cos >= 0.95, same drop rule) "
    "-> decoded-metadata quality gate (min resolution 128x128, min "
    "payload 64 bytes). The keep-set survives as the curated media "
    "catalog. The oracle replays every stage in SQL with BRUTE-FORCE "
    "pair enumeration on both dedup stages, so a hash match pins the "
    "band join's pigeonhole exactness AND the LSH prebucket's recall "
    "on the composed pipeline, not just per-operator. Scale shape: "
    "band-join + bucketed-LSH shuffles only (never all-pairs on the "
    "Spark side), one lazy checkpoint where the dedup'd corpus fans "
    "out to two consumers (operators/multimodal.phash_pairs, "
    "extract_features, decode_media; functions/similarity.neardup_pairs).",
)
def pipeline_media_q(spark, sf_dir):
    from mongoshake_spark.functions import similarity
    from mongoshake_spark.operators import multimodal

    docs = load_table(spark, sf_dir, "documents")
    media = multimodal.attach_fake_media(docs)
    # stage 1: perceptual near-dup keep-set (greedy drop-higher-id —
    # the oracle replays the same rule)
    pairs = multimodal.phash_pairs(media)
    media_dd = media.join(
        pairs.select(F.col("doc_b").alias("doc_id")).distinct(),
        "doc_id",
        "left_anti",
    # lazy checkpoint: the dedup'd corpus feeds BOTH the feature
    # extractor and the final decode gate — same two-consumer break
    # as pipeline_curation's quality-gated branch
    ).localCheckpoint(eager=False)
    # stage 2: features (payload crosses Arrow once; binary pruned after)
    feats = multimodal.extract_features(media_dd)
    # stage 3: semantic near-dup on the composed LSH path (recall == exact
    # pinned by the brute-force oracle; geometry as dedup_embedding_lsh)
    sem = similarity.neardup_pairs(
        feats,
        19,
        20,
        vec_col="features",
        id_col="doc_id",
        prebucket="lsh",
        n_bands=24,
        band_planes=3,
    )
    keep = media_dd.join(
        sem.select(F.col("doc_b").alias("doc_id")).distinct(),
        "doc_id",
        "left_anti",
    )
    # stage 4: decoded-metadata quality gate -> curated catalog
    meta = multimodal.decode_media(keep)
    return (
        meta.filter(
            (F.col("width") >= 128)
            & (F.col("height") >= 128)
            & (F.col("n_bytes") >= 64)
        )
        .select("doc_id", "width", "height", "n_bytes")
        .orderBy("doc_id")
    )
