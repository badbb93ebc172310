"""functions/projection.py — distributed moments, PCA fit/project, and
the PCA-shortlist ANN finisher. The registry hash-match at three SFs is
the end-to-end gate (embedding_covariance / ann_pca_rerank); these pin
the numeric contracts the queries rely on."""

from __future__ import annotations

import numpy as np
import pytest

from mongoshake_spark.functions import projection

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def vecs(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def xmat(vecs):
    rows = vecs.select("vec_id", "embedding").orderBy("vec_id").collect()
    return np.array([r["embedding"] for r in rows], dtype=np.float64)


def test_moments_match_numpy(vecs, xmat):
    m = projection.embedding_moments(vecs)
    assert m.n == xmat.shape[0]
    # partial-sum order differs from numpy's pairwise sum — close, not
    # bit-equal
    np.testing.assert_allclose(m.mean, xmat.mean(axis=0), rtol=1e-12)
    np.testing.assert_allclose(
        m.cov, np.cov(xmat.T, bias=True), rtol=1e-9, atol=1e-12
    )


def test_moments_deterministic_rerun(vecs):
    a = projection.embedding_moments(vecs)
    b = projection.embedding_moments(vecs)
    # same input + partitioning => partials combine in pid order =>
    # bit-identical sums (what makes the covariance oracle roundable)
    assert np.array_equal(a.mean, b.mean)
    assert np.array_equal(a.cov, b.cov)


def test_moments_empty_raises(vecs):
    from pyspark.sql import functions as F

    with pytest.raises(ValueError, match="empty"):
        projection.embedding_moments(vecs.filter(F.lit(False)))


def test_pca_fit_contract(vecs):
    model = projection.pca_fit(vecs, k=8)
    comps = np.asarray(model.components)
    assert comps.shape == (8, 64)
    # rows orthonormal
    np.testing.assert_allclose(comps @ comps.T, np.eye(8), atol=1e-10)
    # eigenvalues descending, non-negative
    ev = np.asarray(model.explained_variance)
    assert (np.diff(ev) <= 1e-12).all() and (ev >= 0).all()
    # sign convention: largest-|coef| entry positive
    for c in comps:
        assert c[int(np.argmax(np.abs(c)))] > 0


def test_pca_fit_k_out_of_range(vecs):
    with pytest.raises(ValueError, match="out of range"):
        projection.pca_fit(vecs, k=65)


def test_project_matches_numpy(vecs, xmat):
    model = projection.pca_fit(vecs, k=4)
    out = (
        projection.pca_project(vecs, model)
        .select("vec_id", "pvec")
        .orderBy("vec_id")
        .collect()
    )
    got = np.array([r["pvec"] for r in out])
    want = (xmat - np.asarray(model.mean)) @ np.asarray(model.components).T
    # JVM fold vs numpy dot: same math, different accumulation order
    np.testing.assert_allclose(got, want, atol=1e-10)


def test_pca_spectrum_near_isotropic(vecs):
    """Pins the fixture property the ann_pca_rerank parameters (d=48,
    C=200) are chosen for: the synthetic corpus is near-isotropic, the
    PCA worst case. If the driver ever regenerates testdata with real
    cluster structure, this fails and the registry query's d/C can be
    tightened."""
    model = projection.pca_fit(vecs, k=64)
    ev = np.asarray(model.explained_variance)
    assert ev[:16].sum() / ev.sum() < 0.6  # no dominant subspace


def test_pca_topk_shortlist_recall(spark, vecs):
    """Approximate-stage quality gate independent of the registry's
    recall-1.0 hash match: at d=32, C=50 the projected-cosine shortlist
    must still recover >= 0.9 of the exact top-5."""
    from mongoshake_spark.functions.similarity import brute_topk

    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in brute_topk(vecs, list(range(10)), k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in projection.pca_topk(
            vecs, list(range(10)), k=5, d=32, shortlist=50
        ).collect()
    }
    assert len(exact & approx) / len(exact) >= 0.9


def test_pca_topk_shortlist_lt_k_raises(vecs):
    with pytest.raises(ValueError, match="rerank"):
        projection.pca_topk(vecs, [0], k=5, shortlist=3).collect()


def test_lit_array_roundtrips_doubles():
    vals = [1.0 / 3.0, -2.5e-17, 0.1 + 0.2, 1e300]
    expr = projection._lit_array(vals)
    assert expr.startswith("array(") and expr.count("CAST") == len(vals)
    for v in vals:
        assert repr(v) in expr


def test_merge_moments_exact(vecs, xmat):
    from pyspark.sql import functions as F

    a = projection.embedding_moments(vecs.filter(F.col("vec_id") % 2 == 0))
    b = projection.embedding_moments(vecs.filter(F.col("vec_id") % 2 == 1))
    merged = projection.merge_moments(a, b)
    assert merged.n == xmat.shape[0]
    np.testing.assert_allclose(merged.mean, xmat.mean(axis=0), rtol=1e-12)
    np.testing.assert_allclose(
        merged.cov, np.cov(xmat.T, bias=True), rtol=1e-9, atol=1e-12
    )


def test_pca_fit_from_merged_moments_matches_full_fit(vecs):
    from pyspark.sql import functions as F

    full = projection.pca_fit(vecs, k=8)
    a = projection.embedding_moments(vecs.filter(F.col("vec_id") % 3 == 0))
    b = projection.embedding_moments(vecs.filter(F.col("vec_id") % 3 != 0))
    inc = projection.pca_fit_from_moments(projection.merge_moments(a, b), k=8)
    # same covariance up to fp merge noise => same subspace; components
    # agree to tight tolerance with the deterministic sign convention
    np.testing.assert_allclose(
        np.asarray(inc.components), np.asarray(full.components), atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(inc.explained_variance),
        np.asarray(full.explained_variance),
        rtol=1e-9,
    )
