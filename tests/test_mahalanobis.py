"""Mahalanobis outlier detection: NumPy-equivalence and the planted
separation contract (cross-engine parity lives in the oracle gate)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from data_pipeline_001_spark.operators.vector_stats import (
    mahalanobis_distances,
)

SF = "/root/testdata/sf0.001"


def test_matches_numpy_reference(spark):
    """Distances from the distributed scorer must equal the textbook
    d² = (x-μ)ᵀΣ⁻¹(x-μ) computed locally (same ridge)."""
    rng = [
        (i, [float((i * 7 + j * 3) % 11) / 3.0 + (0.5 if j % 2 else -0.25)
             for j in range(4)])
        for i in range(40)
    ]
    df = spark.createDataFrame(rng, "vec_id long, embedding array<float>")
    got = {r.vec_id: r.d2 for r in mahalanobis_distances(df).collect()}

    X = np.array([v for _, v in rng], dtype=np.float64)
    mu = X.mean(axis=0)
    # the operator consumes the 6-decimal-rounded covariance rows and
    # inverts via eigendecomposition with a magnitude-scaled spectral
    # floor (robust to rounding-perturbed near-singular fits), so the
    # reference must do the same
    C = np.round(np.cov(X, rowvar=False, bias=True), 6)
    C = (C + C.T) / 2.0
    evals, evecs = np.linalg.eigh(C)
    floor = max(1e-6, 1e-6 * np.trace(C))
    evals = np.maximum(evals, floor)
    inv = evecs @ np.diag(1.0 / evals) @ evecs.T
    for i, v in rng:
        z = np.asarray(v, dtype=np.float64) - mu
        assert got[i] == pytest.approx(float(z @ inv @ z), rel=1e-6)


def test_planted_outliers_separate(spark):
    from data_pipeline_001_spark.plans.queries_mining import (
        embedding_mahalanobis_outliers,
    )

    row = embedding_mahalanobis_outliers(spark, SF).collect()[0]
    assert row.n_planted > 0
    assert row.n_vecs > row.n_planted
    assert row.all_planted_outrank is True
    assert row.topk_all_planted is True


def test_fit_excludes_contamination(spark):
    """fit_df must control the fit: scoring a frame against a clean
    fit gives the planted point a huge distance; fitting ON the
    contaminated frame shrinks it (the outlier inflates Σ)."""
    clean = [(i, [float((i % 5) - 2), float((i % 3) - 1)]) for i in range(30)]
    dirty = clean + [(99, [50.0, 50.0])]
    cdf = spark.createDataFrame(clean, "vec_id long, embedding array<float>")
    ddf = spark.createDataFrame(dirty, "vec_id long, embedding array<float>")
    d_clean_fit = {
        r.vec_id: r.d2
        for r in mahalanobis_distances(ddf, fit_df=cdf).collect()
    }
    d_self_fit = {
        r.vec_id: r.d2 for r in mahalanobis_distances(ddf).collect()
    }
    assert d_clean_fit[99] > 10 * d_self_fit[99]
    assert d_clean_fit[99] > max(
        v for k, v in d_clean_fit.items() if k != 99
    )


def test_singular_fit_does_not_crash(spark):
    """A rank-deficient fit corpus (all mass on one line) used to make
    np.linalg.cholesky raise once 6-decimal covariance rounding pushed
    an eigenvalue below the fixed ridge; the spectral floor must keep
    the whitener finite and the planted far point still ranked last."""
    line = [(i, [float(i), 2.0 * float(i)]) for i in range(20)]
    df = spark.createDataFrame(
        line + [(99, [100.0, -100.0])],
        "vec_id long, embedding array<float>",
    )
    fit = spark.createDataFrame(line, "vec_id long, embedding array<float>")
    got = {
        r.vec_id: r.d2
        for r in mahalanobis_distances(df, fit_df=fit).collect()
    }
    assert all(np.isfinite(v) for v in got.values())
    assert got[99] == max(got.values())


def test_empty_fit_raises(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 1.0])], "vec_id long, embedding array<float>"
    )
    with pytest.raises(ValueError, match="empty"):
        mahalanobis_distances(df, fit_df=df.where("vec_id < 0")).collect()
