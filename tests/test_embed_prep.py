"""Embedding preprocessing (operators/embed_prep.py): L2 normalize is
exact, PCA components satisfy the spectral invariants, whitening gives
unit variance, and the partition-partial covariance equals the
single-machine computation."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from dynamics_365_to_bigquery_spark_etl_pipeline_spark.catalog import load_table
from dynamics_365_to_bigquery_spark_etl_pipeline_spark.operators import embed_prep as EP

SF_DIR = "/root/testdata/sf0.01"


def _X(spark):
    rows = (
        load_table(spark, SF_DIR, "embeddings")
        .select("vec_id", "embedding")
        .collect()
    )
    rows.sort(key=lambda r: r.vec_id)
    return np.array([r.embedding for r in rows], dtype=np.float64)


def test_l2_normalize_unit_norms_and_zero_vector(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    nv = emb.select(
        F.sqrt(
            EP.dot(
                EP.l2_normalize(F.col("embedding")),
                EP.l2_normalize(F.col("embedding")),
            )
        ).alias("n")
    )
    [row] = nv.agg(F.max(F.abs(F.col("n") - 1.0)).alias("d")).collect()
    assert row.d < 1e-9

    z = spark.createDataFrame([(1, [0.0, 0.0])], "id long, embedding array<double>")
    [r] = z.select(EP.l2_normalize(F.col("embedding")).alias("v")).collect()
    assert r.v == [0.0, 0.0]


def test_fit_pca_matches_local_and_is_orthonormal(spark):
    emb = load_table(spark, SF_DIR, "embeddings").repartition(7)
    model = EP.fit_pca(emb, k=8)
    X = _X(spark)

    # distributed two-moment reduction == local covariance
    np.testing.assert_allclose(model["mean"], X.mean(axis=0), atol=1e-9)
    cov = np.cov(X, rowvar=False)
    evals = np.sort(np.linalg.eigvalsh(cov))[::-1][:8]
    np.testing.assert_allclose(model["explained_variance"], evals, rtol=1e-8)

    C = model["components"]
    np.testing.assert_allclose(C @ C.T, np.eye(8), atol=1e-9)  # orthonormal
    assert all(
        a >= b for a, b in zip(model["explained_variance"], model["explained_variance"][1:])
    )
    # canonical sign: each axis's largest-|coeff| entry is positive
    for row in C:
        assert row[int(np.argmax(np.abs(row)))] > 0

    with pytest.raises(ValueError, match="empty"):
        EP.fit_pca(emb.limit(0))


def test_project_variance_and_whitening(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    model = EP.fit_pca(emb, k=4)
    proj = EP.project(emb, model, out_col="p")
    P = np.array([r.p for r in proj.select("p").collect()])
    # variance along each principal axis == its eigenvalue
    np.testing.assert_allclose(
        P.var(axis=0, ddof=1), model["explained_variance"], rtol=1e-6
    )

    white = EP.project(emb, model, out_col="w", whiten=True)
    W = np.array([r.w for r in white.select("w").collect()])
    np.testing.assert_allclose(W.var(axis=0, ddof=1), np.ones(4), rtol=1e-6)

    # schema: original columns preserved + the new array<double> column
    assert proj.columns == emb.columns + ["p"]


def test_reconstruction_error_decreases_with_k(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    X = _X(spark)
    errs = []
    for k in (2, 8, 32):
        m = EP.fit_pca(emb, k=k)
        C = m["components"]
        R = (X - m["mean"]) @ C.T @ C + m["mean"]
        errs.append(float(((X - R) ** 2).sum()))
    assert errs[0] > errs[1] > errs[2]
