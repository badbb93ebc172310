"""Embedding dimensionality reduction (PCA) for the training-data
pipeline: second-moment computation, principal-component fitting, and
map-only projection — the standard preprocessing step in front of ANN
(score in d' << d dims, exact-rerank a shortlist) and the basis for
embedding-drift / whitening analyses.

100 TB shape, stage by stage:

- **Moments** (`embedding_moments`): one pass over the corpus via
  ``mapInPandas`` — each partition folds its Arrow batches into numpy
  float64 partials ``(n, sum(x), sum(x xᵀ))`` and emits ONE row, so the
  driver combines #partitions rows of ``2 + dim + dim²`` doubles (the
  treeAggregate shape MLlib's ``RowMatrix.computeCovariance`` uses; for
  dim=1024 a partial row is ~8 MB — at very large partition counts insert
  a ``coalesce``-level pre-combine, noted below). No shuffle anywhere:
  the corpus crosses Arrow once and nothing per-row ever reaches the
  driver.
- **Fit** (`pca_fit`): ``numpy.linalg.eigh`` on the dim×dim covariance —
  driver-side and *independent of corpus size* (the documented bounded
  contract: cost is dim³, not rows). Component sign is fixed
  deterministically (largest-|coefficient| entry made positive, first
  index on ties) so a refit on identical data is bit-stable.
- **Project** (`pca_project`): the fitted components are embedded as
  SQL double-literal arrays and evaluated as JVM fold expressions —
  map-only, no UDF, stays inside whole-stage codegen. Centering uses
  ``dot(x, c) - dot(mean, c)`` with the scalar offset precomputed in
  Python, so the hot path is one fold per component.
- **ANN finisher** (`pca_topk`): score ALL query×corpus pairs in the
  d'-dim projected space (the FLOP/bandwidth win — d'/d of the exact
  cost), shortlist top-C per query, then exact-rerank ONLY the Q·C
  shortlist at full precision via the shared broadcast-shortlist
  finisher (`quantization._exact_rerank` — candidate-sized I/O, never a
  corpus shuffle). Composes with the IVF cell restriction for the full
  production stack.

Reference parity: the reference engine ships no dimensionality
reduction; this is part of the training-data-pipeline surface the brief
adds on top of SURVEY.md §2.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mongoshake_spark.functions.similarity import dot_expr, with_norm


@dataclass(frozen=True)
class Moments:
    """First/second raw moments of an embedding column. ``cov`` is the
    POPULATION covariance  E[x xᵀ] − μ μᵀ  (what both the DuckDB oracle
    and `pca_fit` consume)."""

    n: int
    mean: "object"  # np.ndarray (dim,)
    cov: "object"  # np.ndarray (dim, dim)


def embedding_moments(
    vecs: DataFrame, vec_col: str = "embedding"
) -> Moments:
    """Single-pass distributed moments: per-partition numpy partials,
    driver combine in partition-id order (deterministic for a given
    input + partitioning — re-runs reproduce bit-identical sums)."""
    import numpy as np

    def partials(batches: Iterator["object"]) -> Iterator["object"]:
        import pandas as pd
        from pyspark import TaskContext

        n = 0
        s = None
        xx = None
        for pdf in batches:
            if not len(pdf):
                continue
            mat = np.asarray(
                [np.asarray(v, dtype=np.float64) for v in pdf[vec_col]]
            )
            if s is None:
                s = np.zeros(mat.shape[1])
                xx = np.zeros((mat.shape[1], mat.shape[1]))
            n += mat.shape[0]
            s += mat.sum(axis=0)
            xx += mat.T @ mat
        if n:
            yield pd.DataFrame(
                {
                    "pid": [TaskContext.get().partitionId()],
                    "n": [n],
                    "s": [s.tolist()],
                    "xx": [xx.ravel().tolist()],
                }
            )

    rows = (
        vecs.select(vec_col)
        .mapInPandas(
            partials, schema="pid int, n long, s array<double>, xx array<double>"
        )
        .collect()  # bounded: one row per non-empty partition
    )
    if not rows:
        raise ValueError("embedding_moments: empty input")
    rows.sort(key=lambda r: r["pid"])
    n = sum(r["n"] for r in rows)
    dim = len(rows[0]["s"])
    s = np.zeros(dim)
    xx = np.zeros((dim, dim))
    for r in rows:
        s += np.asarray(r["s"])
        xx += np.asarray(r["xx"]).reshape(dim, dim)
    mean = s / n
    cov = xx / n - np.outer(mean, mean)
    return Moments(n=n, mean=mean, cov=cov)


def covariance_df(
    spark: SparkSession, m: Moments, round_digits: int = 6
) -> DataFrame:
    """Upper-triangle (i <= j) covariance entries as a DataFrame —
    dim·(dim+1)/2 rows (4 KB-scale for any realistic dim), created
    driver-side from the already-bounded moments."""
    dim = len(m.mean)
    rows = [
        (i, j, round(float(m.cov[i, j]), round_digits))
        for i in range(dim)
        for j in range(i, dim)
    ]
    return spark.createDataFrame(rows, "i int, j int, cov double")


@dataclass(frozen=True)
class PCAModel:
    mean: "object"  # np.ndarray (dim,)
    components: "object"  # np.ndarray (k, dim) — rows orthonormal
    explained_variance: "object"  # np.ndarray (k,) — eigenvalues desc


def pca_fit(vecs: DataFrame, k: int, vec_col: str = "embedding") -> PCAModel:
    """Fit top-``k`` principal components. Deterministic: eigh on the
    symmetric covariance (ascending eigenvalues, reversed), then each
    component's largest-|coefficient| entry (first index on ties) is
    made positive — the sign convention sklearn's ``svd_flip`` uses, so
    refits are stable and test assertions can pin component values."""
    import numpy as np

    m = embedding_moments(vecs, vec_col)
    dim = len(m.mean)
    if not 0 < k <= dim:
        raise ValueError(f"pca_fit: k={k} out of range for dim={dim}")
    evals, evecs = np.linalg.eigh(m.cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # (k, dim)
    for c in comps:
        pivot = int(np.argmax(np.abs(c)))
        if c[pivot] < 0:
            np.negative(c, out=c)
    return PCAModel(
        mean=m.mean,
        components=comps,
        explained_variance=np.maximum(evals[order], 0.0),
    )


def _lit_array(values) -> str:
    """SQL double-array literal. ``repr`` emits the shortest decimal that
    round-trips the exact IEEE double, so the JVM parses back the same
    bits."""
    return "array(" + ", ".join(f"CAST({v!r} AS DOUBLE)" for v in values) + ")"


def project_exprs(model: PCAModel, vec_col: str) -> list[str]:
    """One fold expression per component: ``dot(x, c) - dot(mean, c)``
    with the centering offset folded to a Python scalar — the per-row
    cost is a single zip_with/aggregate pass, fully JVM-side."""
    import numpy as np

    offsets = model.components @ np.asarray(model.mean)
    return [
        f"{dot_expr(vec_col, _lit_array(c.tolist()))} - CAST({float(o)!r} AS DOUBLE)"
        for c, o in zip(model.components, offsets)
    ]


def pca_project(
    df: DataFrame,
    model: PCAModel,
    vec_col: str = "embedding",
    out_col: str = "pvec",
) -> DataFrame:
    """Adds ``out_col``: the k-dim projection of ``vec_col`` (centered,
    not whitened). Map-only; the source column is untouched so callers
    can still exact-rerank against it.

    The components ride as ONE broadcast row of (component, offset)
    structs and each coordinate is a zip_with/aggregate fold against
    its component — the same left-to-right dot fold (and the same
    driver-computed centering offsets) as the literal-expression form
    in :func:`project_exprs`, so projections are bit-identical; but the
    expression tree is O(1) instead of O(k·dim) literals pushed through
    the SQL parser, which cost ~2 s of driver plan-build per query at
    k=48, dim=64 (measured; guide §7.3 — planning time is driver-side,
    single-threaded)."""
    import numpy as np

    offsets = model.components @ np.asarray(model.mean)
    rows = [
        (
            [
                (list(map(float, c)), float(o))
                for c, o in zip(model.components, offsets)
            ],
        )
    ]
    crow = df.sparkSession.createDataFrame(
        rows, "_comps array<struct<c:array<double>,o:double>>"
    )

    def one(comp):
        dot = F.aggregate(
            F.zip_with(
                F.col(vec_col),
                comp["c"],
                lambda x, y: x.cast("double") * y.cast("double"),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        return dot - comp["o"]

    return (
        df.crossJoin(F.broadcast(crow))
        .withColumn(out_col, F.transform(F.col("_comps"), one))
        .drop("_comps")
    )


def pca_topk(
    vecs: DataFrame,
    query_ids,
    k: int = 5,
    d: int = 16,
    shortlist: int = 25,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    model: PCAModel | None = None,
) -> DataFrame:
    """Two-stage ANN with a PCA first stage: rank by cosine in the
    ``d``-dim projected space (d/dim of the exact FLOPs and bandwidth —
    the stage that scans the whole corpus), keep the top-``shortlist``
    per query, exact-rerank only those Q·C rows at full precision, and
    emit the exact-cosine top-k. Pass a pre-fitted ``model`` to reuse a
    trained projection (the production shape — fit once on a sample,
    project incrementally). Shortlist recall is measured in
    tests/test_projection.py; at C=5k on the clustered fixture corpus the
    rerank recovers the exact top-k (the registry hash-match gate)."""
    from mongoshake_spark.functions.quantization import _exact_rerank

    if model is None:
        model = pca_fit(vecs, d, vec_col)
    unit = with_norm(vecs, vec_col)
    proj = pca_project(unit, model, vec_col).withColumn(
        "pnorm", F.expr(f"sqrt({dot_expr('pvec', 'pvec')})")
    )
    # the query side projects ONLY the filtered Q rows — deriving it
    # from `proj` re-ran the full-corpus projection a second time
    # (projection is per-row, so the Q-row projection is identical)
    q = pca_project(
        unit.filter(F.col(id_col).isin(list(query_ids))), model, vec_col
    ).select(
        F.col(id_col).alias("query_id"),
        F.col("pvec").alias("qpvec"),
        F.expr(f"sqrt({dot_expr('pvec', 'pvec')})").alias("qpnorm"),
    )
    scored = (
        proj.select(
            F.col(id_col).alias("neighbor_id"), "pvec", "pnorm"
        )
        .join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            # A zero projected norm (vector == mean within the subspace)
            # would make this 0/0 = NaN, and Spark ranks NaN ABOVE every
            # real double — guard to NULL instead (desc sorts nulls last,
            # so degenerate rows can't crowd the shortlist).
            F.when(
                F.col("qpnorm") * F.col("pnorm") > 0,
                F.round(
                    F.expr(dot_expr("qpvec", "pvec"))
                    / (F.col("qpnorm") * F.col("pnorm")),
                    6,
                ),
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    qv = unit.filter(F.col(id_col).isin(list(query_ids))).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        F.col("vnorm").alias("_qn"),
    )
    out = _exact_rerank(
        scored, w, unit, qv, shortlist, k, id_col, vec_col, "pca_topk"
    )
    return (
        out.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def merge_moments(a: Moments, b: Moments) -> Moments:
    """Exact merge of two Moments (the parallel-variance identity on raw
    sums): recover each side's raw sums from (n, mean, cov), add, and
    re-derive. Enables incremental maintenance — compute moments for an
    ingest increment only and merge with the persisted corpus moments,
    so a PCA/OPQ refit never re-scans history (the projection-plane
    analog of the ANN store's incremental encode; pair with
    streaming/index_lifecycle generations to persist the running
    moments)."""
    import numpy as np

    am, bm = np.asarray(a.mean), np.asarray(b.mean)
    s = a.n * am + b.n * bm
    xx = (
        a.n * (np.asarray(a.cov) + np.outer(am, am))
        + b.n * (np.asarray(b.cov) + np.outer(bm, bm))
    )
    n = a.n + b.n
    mean = s / n
    return Moments(n=n, mean=mean, cov=xx / n - np.outer(mean, mean))


def pca_fit_from_moments(m: Moments, k: int) -> PCAModel:
    """`pca_fit` for pre-computed (possibly merged) moments."""
    import numpy as np

    dim = len(m.mean)
    if not 0 < k <= dim:
        raise ValueError(f"pca_fit_from_moments: k={k} out of range for dim={dim}")
    evals, evecs = np.linalg.eigh(m.cov)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T
    for c in comps:
        pivot = int(np.argmax(np.abs(c)))
        if c[pivot] < 0:
            np.negative(c, out=c)
    return PCAModel(
        mean=m.mean,
        components=comps,
        explained_variance=np.maximum(evals[order], 0.0),
    )
