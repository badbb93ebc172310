"""Product quantization (PQ) — vector compression for the ANN plane.

At 100 TB the embedding STORE, not the index math, dominates ANN cost:
a 64-dim float64 corpus is 512 bytes/vector, while PQ codes at m=4
subspaces × 8 codewords are 4 bytes/vector (m log2(k) bits) plus an
m·k-row codebook — a ~128× reduction that turns the scoring pass into a
scan of tiny code arrays plus broadcast lookup tables (Jégou, Douze,
Schmid, "Product Quantization for Nearest Neighbor Search", TPAMI 2011).
No reference analog (MongoShake has no vector plane); standard
training-data-pipeline infrastructure.

Pieces (all composable DataFrame ops, no driver-side corpus loops):

- :func:`pq_train` — per-subspace codebooks via the same deterministic
  Lloyd arithmetic as ``clustering.kmeans_fit`` (smallest-id init,
  rounded centroids/distances), all m subspaces trained JOINTLY in one
  (sub, cluster)-keyed chain — m·k codebook rows total;
- :func:`pq_encode` — nearest-codeword assignment per subspace: the
  corpus is exploded to (id, sub, subvector) rows and joined against the
  BROADCAST codebook — map-only over the corpus, argmin via a struct
  min exactly like ``clustering._assign``;
- :func:`pq_reconstruct` — codes back to the quantized vector (codebook
  lookups, order-preserving flatten);
- :func:`pq_topk` — asymmetric distance computation (ADC): the query
  keeps its EXACT subvectors; per (query, sub, codeword) inner products
  form a Q·m·k-row lookup table, broadcast; each corpus code row then
  scores by m table lookups. Approximate cosine =
  ADC-dot / (‖q‖ · ‖reconstruction‖), with ‖reconstruction‖² =
  Σ_sub ‖codeword‖² (the subspaces are an orthogonal decomposition).

Float determinism: every cross-engine-checked sum folds in a FIXED
order (per-sub dots left-to-right inside a subspace via the shared
``dot_expr`` fold; across subspaces via an array_sort-by-sub fold) so
the DuckDB oracle reproduces bit-identical doubles — an unordered
SQL ``sum()`` over doubles would be association-order-dependent.

Scale shape: codebooks and ADC tables are k·m- and Q·m·k-row
broadcasts; the corpus is touched by one map-only pass per train
iteration, one encode pass, and one scoring pass over the m-row-per-
vector code explosion with map-side partial aggregation. Nothing is
all-pairs; nothing collects the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mongoshake_spark.functions.similarity import dot_expr, with_norm


def _infer_dim(vecs: DataFrame, vec_col: str) -> int:
    row = vecs.select(F.size(F.col(vec_col)).alias("d")).first()
    if row is None:
        raise ValueError("pq: empty vector table")
    return int(row["d"])


def _sub_rows(
    vecs: DataFrame, m: int, d: int, id_col: str, vec_col: str
) -> DataFrame:
    """(id, sub, sv): the corpus exploded into its m subvectors in-row."""
    subs = F.array(
        *[
            F.struct(
                F.lit(s).alias("sub"),
                F.slice(F.col(vec_col), s * d + 1, d).alias("sv"),
            )
            for s in range(m)
        ]
    )
    return vecs.select(id_col, F.explode(subs).alias("x")).select(
        id_col, "x.sub", "x.sv"
    )


def pq_train(
    vecs: DataFrame,
    m: int = 4,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Fit per-subspace codebooks; returns ``(sub, cluster, centroid)``
    — m·k rows, localCheckpoint'ed (broadcast-sized, reused by encode
    and every ADC query batch).

    All m subspaces train JOINTLY: one Lloyd chain over (id, sub, sv)
    rows keyed by (sub, cluster) instead of m independent chains —
    identical arithmetic per subspace (same smallest-id init, same
    round(d2,6)/cluster-asc tie-break, same rounded means as
    ``clustering.kmeans_fit``), but one assign job and one update job
    per iteration for ALL subspaces, so the fit costs O(iters) Spark
    jobs rather than O(m·iters) (measured ~2x on the registry query)."""
    if k < 1 or iters < 1:
        raise ValueError("pq_train: k and iters must be >= 1")
    dim = _infer_dim(vecs, vec_col)
    if dim % m != 0:
        raise ValueError(f"pq_train: dim {dim} not divisible by m={m}")
    d = dim // m
    # init: the k smallest-id vectors, sliced per subspace (k·m rows
    # total, k bounded by the operator's own parameter — the same
    # driver residency clustering._init_centroids has)
    seed_rows = (
        vecs.select(id_col, vec_col).orderBy(id_col).limit(k).collect()
    )
    spark = vecs.sparkSession
    init = spark.createDataFrame(
        [
            (s, i, list(r[1])[s * d : (s + 1) * d])
            for s in range(m)
            for i, r in enumerate(seed_rows)
        ],
        "sub int, cluster int, centroid array<double>",
    )
    cents = init.select(
        "sub",
        "cluster",
        F.transform("centroid", lambda x: F.round(x, 6)).alias("centroid"),
    )
    rows = _sub_rows(vecs, m, d, id_col, vec_col)
    d2 = F.aggregate(
        F.zip_with(
            F.col("sv"),
            F.col("centroid"),
            lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )

    def assign(cb: DataFrame) -> DataFrame:
        cand = rows.join(F.broadcast(cb), "sub").select(
            id_col, "sub", F.round(d2, 6).alias("d2"), "cluster"
        )
        return (
            cand.groupBy(id_col, "sub")
            .agg(F.min(F.struct("d2", "cluster")).alias("_b"))
            .select(id_col, "sub", F.col("_b.cluster").alias("cluster"))
        )

    for _ in range(iters - 1):
        assigned = assign(cents)
        pos = (
            assigned.join(rows, [id_col, "sub"])
            .select("sub", "cluster", F.posexplode("sv").alias("pos", "val"))
        )
        means = pos.groupBy("sub", "cluster", "pos").agg(
            F.round(F.avg(F.col("val").cast("double")), 6).alias("mv")
        )
        # truncate the m·k-row centroid lineage per update, like
        # clustering.kmeans_fit does
        cents = (
            means.groupBy("sub", "cluster")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "mv"))),
                    lambda s: s["mv"],
                ).alias("centroid")
            )
            .localCheckpoint()
        )
    return cents.localCheckpoint(eager=True)


def pq_encode(
    vecs: DataFrame,
    codebooks: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, codes array<int>): nearest codeword per subspace, codes
    ordered by subspace index. Distance ties break to the smaller
    cluster id, exactly like ``clustering._assign`` (and the oracle)."""
    m_d = codebooks.agg(
        F.max("sub").alias("mx"), F.max(F.size("centroid")).alias("d")
    ).first()
    m, d = int(m_d["mx"]) + 1, int(m_d["d"])
    rows = _sub_rows(vecs, m, d, id_col, vec_col).join(
        F.broadcast(codebooks), "sub"
    )
    d2 = F.aggregate(
        F.zip_with(
            F.col("sv"),
            F.col("centroid"),
            lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    best = (
        rows.select(id_col, "sub", F.round(d2, 6).alias("d2"), "cluster")
        .groupBy(id_col, "sub")
        .agg(F.min(F.struct("d2", "cluster")).alias("_b"))
        .select(id_col, "sub", F.col("_b.cluster").alias("cluster"))
    )
    return best.groupBy(id_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("sub", "cluster"))),
            lambda s: s["cluster"],
        ).alias("codes")
    )


def pq_reconstruct(
    codes: DataFrame,
    codebooks: DataFrame,
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, embedding): the quantized reconstruction — each code replaced
    by its codeword, subspaces concatenated in order."""
    exploded = codes.select(
        id_col, F.posexplode("codes").alias("sub", "cluster")
    ).join(F.broadcast(codebooks), ["sub", "cluster"])
    return exploded.groupBy(id_col).agg(
        F.flatten(
            F.transform(
                F.array_sort(F.collect_list(F.struct("sub", "centroid"))),
                lambda s: s["centroid"],
            )
        ).alias("embedding")
    )


def pq_topk(
    vecs: DataFrame,
    query_ids,
    k: int = 5,
    m: int = 4,
    k_code: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codebooks: DataFrame | None = None,
) -> DataFrame:
    """Approximate cosine top-k by ADC over PQ codes. Queries score with
    their EXACT vectors against the quantized corpus; pass pre-trained
    ``codebooks`` to reuse a fitted quantizer (the production shape —
    train once, encode incrementally)."""
    if codebooks is None:
        codebooks = pq_train(vecs, m, k_code, iters, id_col, vec_col)
    m_d = codebooks.agg(
        F.max("sub").alias("mx"), F.max(F.size("centroid")).alias("d")
    ).first()
    m, d = int(m_d["mx"]) + 1, int(m_d["d"])
    codes = pq_encode(vecs, codebooks, id_col, vec_col)
    # per-codeword squared norms: the reconstruction's norm decomposes
    # across the orthogonal subspaces
    cn = codebooks.select(
        "sub", "cluster", F.expr(dot_expr("centroid", "centroid")).alias("cn2")
    )
    unit = with_norm(vecs, vec_col)
    q_subs = _sub_rows(
        unit.filter(F.col(id_col).isin(list(query_ids))), m, d, id_col, vec_col
    ).withColumnRenamed(id_col, "query_id").withColumnRenamed("sv", "qsv")
    qnorm = unit.filter(F.col(id_col).isin(list(query_ids))).select(
        F.col(id_col).alias("query_id"), F.col("vnorm").alias("qnorm")
    )
    # ADC lookup table: Q*m*k rows, broadcast to the code scan
    adc = q_subs.join(F.broadcast(codebooks), "sub").select(
        "query_id",
        "sub",
        "cluster",
        F.expr(dot_expr("qsv", "centroid")).alias("dsub"),
    )
    scored = (
        codes.select(
            F.col(id_col).alias("neighbor_id"),
            F.posexplode("codes").alias("sub", "cluster"),
        )
        .join(F.broadcast(adc), ["sub", "cluster"])
        .join(F.broadcast(cn), ["sub", "cluster"])
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .groupBy("query_id", "neighbor_id")
        .agg(
            # fixed-order folds (by sub) so the oracle's list_sum over
            # the same ordering reproduces identical doubles
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("sub", "dsub"))),
                    lambda s: s["dsub"],
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ).alias("adc_dot"),
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("sub", "cn2"))),
                    lambda s: s["cn2"],
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ).alias("cn2_sum"),
        )
    )
    out = scored.join(F.broadcast(qnorm), "query_id").select(
        "query_id",
        "neighbor_id",
        F.round(
            F.col("adc_dot") / (F.col("qnorm") * F.sqrt(F.col("cn2_sum"))), 6
        ).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        out.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )
