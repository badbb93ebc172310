"""Deterministic distributed k-means over an embedding column.

Corpus organization for training-data pipelines (SemDedup cells, topic
balancing, IVF coarse quantizers) needs a clustering primitive. This is
Lloyd's algorithm made fully deterministic and cross-engine replayable:

- init: the k vectors with the smallest ids, cluster ids 0..k-1 in id
  order (no RNG — portable to any engine);
- assignment: nearest centroid by squared L2 ROUNDED to 6 decimals,
  ties to the smallest cluster id (the rounding pins the argmin across
  engines whose unrounded doubles differ in the last ulp);
- update: element-wise mean, ROUNDED to 6 decimals before the next
  iteration (so both engines iterate from bit-identical centroids —
  float sums are order-sensitive and each engine aggregates in its own
  order; without the rounding the drift compounds per iteration);
- fixed iteration count (the caller picks; no data-dependent stopping).

Scale shape: centroids are a k-row table BROADCAST to every task — the
corpus is never shuffled for assignment (a map-side zip_with/aggregate
fold per row). The only corpus-wide exchange per iteration is the
centroid update: posexplode emits dim rows per vector and the
(cluster, pos) partial means combine map-side, so the shuffle carries
k*dim rows per upstream partition, not the corpus. Driver holds nothing
but the plan. At 100 TB use sampled init (e.g. min-id within hash
buckets) and fewer update passes — the operator shape is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _init_centroids(vecs: DataFrame, k: int, id_col: str, vec_col: str) -> DataFrame:
    """k-row (cluster, centroid) table: the k smallest-id vectors, cluster
    ids assigned 0..k-1 in id order.

    The k rows are collected to the driver — bounded by the operator's
    own ``k`` parameter, never by data size (the same driver-residency
    Spark MLlib gives k-means centroids), and the cluster-id numbering
    needs a total order that a distributed plan would spell as a global
    ordered window. Rounding happens Spark-side (``F.round`` is
    HALF_UP like the oracle's; Python's ``round`` is banker's and would
    diverge on exact half-ulp ties)."""
    rows = vecs.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
    spark = vecs.sparkSession
    init = spark.createDataFrame(
        [(i, list(r[1])) for i, r in enumerate(rows)],
        "cluster int, centroid array<double>",
    )
    return init.select(
        "cluster",
        F.transform("centroid", lambda x: F.round(x, 6)).alias("centroid"),
    )


def _best_struct(cents_arr, vec_col: str):
    """Per-row argmin over a collected ``array<struct<cluster,centroid>>``
    column: ``struct<d2, cluster>`` of the nearest centroid, computed
    entirely in-row. The d2 arithmetic is the exact fold the old
    grouped form used — zip_with squared-diff fold, ``round(.., 6)`` —
    and ``array_min`` over ``(d2, cluster)`` structs is the same
    lexicographic comparison as ``min(struct(d2, cluster))``, so the
    winning (cluster, d2) per vector is bit-identical; only the plan
    shape changes (no per-vector shuffle)."""
    def one(c):
        d2 = F.aggregate(
            F.zip_with(
                F.col(vec_col),
                c["centroid"],
                lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        return F.struct(
            F.round(d2, 6).alias("d2"), c["cluster"].alias("cluster")
        )

    return F.array_min(F.transform(cents_arr, one))


def _assign_carry(
    vecs: DataFrame, cents: DataFrame, vec_col: str
) -> DataFrame:
    """All of ``vecs``'s columns plus ``(cluster, d2)`` — the nearest
    centroid computed IN-ROW against the k-row centroid table collected
    into a one-row array and broadcast (guide §2.4: the old shape
    exploded k candidate rows per vector and re-grouped them by id,
    shuffling the corpus once per assignment; the argmin needs no
    exchange at all). Carrying the vector through means the update pass
    needs no corpus self-join either."""
    carr = cents.agg(
        F.collect_list(F.struct("cluster", "centroid")).alias("_cents")
    )
    best = _best_struct(F.col("_cents"), vec_col)
    return (
        vecs.crossJoin(F.broadcast(carr))
        .withColumn("_best", best)
        .select(
            *vecs.columns,
            F.col("_best.cluster").alias("cluster"),
            F.col("_best.d2").alias("d2"),
        )
    )


def _assign(vecs: DataFrame, cents: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    """(id, cluster, d2): nearest centroid per vector — map-only, no
    shuffle (see :func:`_assign_carry`). Ties break to the smaller
    cluster id via the (rounded d2, cluster) lexicographic min."""
    return _assign_carry(vecs.select(id_col, vec_col), cents, vec_col).select(
        id_col, "cluster", "d2"
    )


def _update_from(assigned_full: DataFrame, vec_col: str) -> DataFrame:
    """New centroids from an assignment that carries its vectors
    (:func:`_assign_carry`): per-(cluster, position) mean, rounded to 6,
    packed back into arrays. k*dim result rows; the mean combines
    map-side — the ONLY exchange of a Lloyd iteration, carrying k·dim
    rows per upstream partition. (The former shape joined the (id,
    cluster) assignment back to the vector table by id — a corpus-sized
    shuffle of both sides per iteration that the carried vector makes
    unnecessary; the averaged row multiset is identical.)"""
    pos = assigned_full.select(
        "cluster", F.posexplode(vec_col).alias("pos", "val")
    )
    means = pos.groupBy("cluster", "pos").agg(
        F.round(F.avg(F.col("val").cast("double")), 6).alias("m")
    )
    return means.groupBy("cluster").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
        ).alias("centroid")
    )


def kmeans_fit(
    vecs: DataFrame,
    k: int,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> tuple[DataFrame, DataFrame]:
    """Run ``iters`` Lloyd iterations; returns ``(assigned, centroids)``
    — the final assignment ``(id_col, cluster, d2)`` and the centroid
    table ``(cluster, centroid)`` it was computed against (the LAST
    update's centroids; clusters emptied by an update disappear)."""
    if k < 1 or iters < 1:
        raise ValueError("kmeans_assign: k and iters must be >= 1")
    cents = _init_centroids(vecs, k, id_col, vec_col)
    # the assignment carries the vector through the whole loop so the
    # update pass never joins back to the corpus (see _update_from)
    full = _assign_carry(vecs.select(id_col, vec_col), cents, vec_col)
    for _ in range(iters - 1):
        # truncate the k-row centroid lineage each update (MLlib does the
        # same): without it every downstream use re-analyzes and re-runs
        # the whole preceding Lloyd chain — plan depth (and driver
        # analysis time) grows per iteration while the data is k rows
        cents = _update_from(full, vec_col).localCheckpoint()
        full = _assign_carry(vecs.select(id_col, vec_col), cents, vec_col)
    return full.select(id_col, "cluster", "d2"), cents


def kmeans_assign(
    vecs: DataFrame,
    k: int,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Cluster assignment after ``iters`` Lloyd iterations (an iteration =
    assign to nearest centroid, then recompute means; the returned
    assignment is against the centroids produced by the LAST update).
    Returns ``(id_col, cluster, d2)`` with ``d2`` the rounded squared L2
    to the winning centroid."""
    return kmeans_fit(vecs, k, iters, id_col, vec_col)[0]


def sample_cluster_balanced(
    vecs: DataFrame,
    k: int = 8,
    per_cluster: int = 10,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 0,
) -> DataFrame:
    """Cluster-balanced (diversity) sampling — the embedding-space dual
    of ``curation.sample_exact_k``: assign each vector to its k-means
    cluster, then keep exactly ``per_cluster`` rows per cluster by the
    portable hash priority (ties impossible: the id breaks collisions).
    This is the coverage-sampling step training-data pipelines run after
    semantic dedup (SemDeDup / DoReMi-adjacent): a uniform sample lets a
    dominant content cluster flood the mix; the per-cluster quota keeps
    the sample's topical coverage flat regardless of cluster mass.
    Returns ``(id_col, cluster, d2)`` for the survivors.

    Scale shape: assignment is the broadcast-centroid map from
    ``kmeans_assign`` (the corpus never shuffles to be assigned); the
    quota reuses ``cap_per_domain``'s skew-safe two-phase top-K with the
    hash as the order, so even a cluster holding most of the corpus
    spreads over the scan's partitions — no single task ever sorts a
    whole cluster. Deterministic end to end (no RNG state): re-running
    on a re-partitioned corpus keeps the identical sample, and a smaller
    quota keeps a strict subset of a larger one (ranks only truncate).
    """
    from mongoshake_spark.functions.curation import cap_per_domain
    from mongoshake_spark.functions.packing import knuth_u32

    assigned = kmeans_assign(vecs, k=k, iters=iters, id_col=id_col, vec_col=vec_col)
    hashed = assigned.withColumn("_neg_u", -knuth_u32(id_col, seed))
    return cap_per_domain(
        hashed,
        per_cluster,
        domain_col="cluster",
        order_col="_neg_u",
        id_col=id_col,
    ).drop("_neg_u")


def cluster_topics(
    docs: DataFrame,
    vecs: DataFrame,
    k: int = 8,
    iters: int = 2,
    top_terms: int = 3,
    id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
    text_col: str = "text",
) -> DataFrame:
    """Topic labels for embedding clusters — the corpus-cartography step
    (BERTopic's class-based tf-idf, with the linear idf variant this
    module's keyword extraction uses so both engines agree bitwise):
    k-means-assign the embeddings, pool each cluster's documents into
    one pseudo-document, and rank terms per cluster by
    ``tf_(t,c) · n_clusters / df_t`` where ``df_t`` counts the CLUSTERS
    containing the term — a term scores high when frequent in this
    cluster and absent from the others, which is exactly what makes a
    readable label. Returns ``(cluster, term, rank, score)`` with rank
    1..top_terms per cluster (ties break term-ascending).

    Scale shape: assignment is the broadcast-centroid map; the corpus
    shuffle carries (cluster, term) pairs with map-side combine — one
    row per DISTINCT (cluster, term), never per token; the cluster df
    is a second aggregate OF that table (k·|vocab| rows max); the rank
    window partitions by cluster, groups bounded by a cluster's
    distinct-term count. The documents themselves never re-shuffle.
    """
    from mongoshake_spark.functions.retrieval import tokenize

    assigned = kmeans_assign(vecs, k=k, iters=iters, id_col=vec_id_col).select(
        F.col(vec_id_col).alias(id_col), "cluster"
    )
    tok = tokenize(docs.select(id_col, text_col), text_col)
    tf = (
        tok.join(assigned, id_col)
        .select("cluster", F.explode("tokens").alias("term"))
        .groupBy("cluster", "term")
        .agg(F.count("*").alias("tf"))
    )
    df_t = tf.groupBy("term").agg(F.count("*").alias("df"))
    # non-empty cluster count as a broadcast one-row aggregate (the
    # tfidf_top_terms stats pattern) — a driver-side distinct().count()
    # here would be an extra job re-evaluating the assignment chain
    nc = tf.agg(F.count_distinct("cluster").cast("double").alias("_nc"))
    scored = (
        tf.join(df_t, "term")
        .crossJoin(F.broadcast(nc))
        .select(
            "cluster",
            "term",
            (F.col("tf").cast("double") * F.col("_nc") / F.col("df")).alias(
                "score"
            ),
        )
    )
    w = Window.partitionBy("cluster").orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= top_terms)
        .select("cluster", "term", "rank", F.round("score", 6).alias("score"))
    )
