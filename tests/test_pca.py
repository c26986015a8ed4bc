"""Distributed PCA: numpy-mirror exactness, variance/orthogonality
invariants, whitening, determinism under repartitioning, plan discipline,
and the ANN-preprocessing recall story."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from ballista_spark.operators.pca import pca_fit, pca_project
from ballista_spark.sources.registry import load_table
from tests.conftest import SF_SMOKE


def _mirror(X: np.ndarray, k: int):
    """Independent numpy PCA with the same sign convention."""
    mean = X.mean(axis=0)
    cov = np.cov(X, rowvar=False, ddof=1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = []
    for i in order:
        v = evecs[:, i]
        j = int(np.argmax(np.abs(v)))
        comps.append(-v if v[j] < 0 else v)
    return mean, np.stack(comps), evals[order]


@pytest.fixture(scope="module")
def emb(spark):
    return load_table(spark, SF_SMOKE, "embeddings")


def test_fit_matches_numpy_mirror(spark, emb):
    X = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in emb.collect()])
    model = pca_fit(emb, k=8)
    mean, comps, evals = _mirror(X, 8)
    assert model.n == X.shape[0] and model.d == X.shape[1] and model.k == 8
    np.testing.assert_allclose(model.mean, mean, rtol=1e-9, atol=1e-9)
    np.testing.assert_allclose(model.explained_var, evals, rtol=1e-7, atol=1e-9)
    np.testing.assert_allclose(np.stack(model.components), comps, rtol=1e-6, atol=1e-8)
    # eigenvalues descending, components orthonormal
    assert sorted(model.explained_var, reverse=True) == model.explained_var
    G = np.stack(model.components) @ np.stack(model.components).T
    np.testing.assert_allclose(G, np.eye(8), atol=1e-9)


def test_project_matches_numpy_and_whitening(spark, emb):
    X = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in emb.collect()])
    ids = [r["vec_id"] for r in emb.collect()]
    model = pca_fit(emb, k=4)
    got = {
        r["vec_id"]: np.asarray(r["pca"])
        for r in pca_project(emb, model, out_col="pca").collect()
    }
    mean, comps = np.asarray(model.mean), np.stack(model.components)
    want = (X - mean) @ comps.T
    for i, vid in enumerate(ids):
        np.testing.assert_allclose(got[vid], want[i], rtol=1e-7, atol=1e-9)
    # whitened coordinates have ~unit variance
    wgot = np.stack(
        [
            np.asarray(r["pca"])
            for r in pca_project(emb, model, out_col="pca", whiten=True).collect()
        ]
    )
    np.testing.assert_allclose(wgot.var(axis=0, ddof=1), np.ones(4), rtol=1e-6)


def test_fit_deterministic_under_repartition(spark, emb):
    a = pca_fit(emb, k=3)
    b = pca_fit(emb.repartition(13), k=3)
    np.testing.assert_allclose(a.mean, b.mean, rtol=1e-12)
    np.testing.assert_allclose(
        np.stack(a.components), np.stack(b.components), rtol=1e-9, atol=1e-12
    )


def test_null_and_empty_vectors(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [3.0, 4.0]), (3, None), (4, [5.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    model = pca_fit(df, k=2)
    assert model.n == 3  # null skipped
    rows = {r["vec_id"]: r["pca"] for r in pca_project(df, model).collect()}
    assert rows[3] is None
    assert rows[1] is not None


def test_projection_plan_map_only_no_python(spark, emb):
    model = pca_fit(emb, k=4)
    plan = (
        pca_project(emb, model)._jdf.queryExecution().executedPlan().toString()
    )
    for bad in ("BatchEvalPython", "ArrowEvalPython", "Exchange", "CartesianProduct"):
        # BroadcastExchange is expected; data Exchange is not
        if bad == "Exchange":
            assert "ShuffleExchange" not in plan and "Exchange hashpartitioning" not in plan
        else:
            assert bad not in plan


def test_pca_then_ann_preserves_cluster_structure(spark):
    """The ANN-preprocessing story: on blob data with a low-dimensional
    signal subspace (16 informative dims + 48 noise dims), 8-dim PCA (an
    8x scan-byte cut) keeps each query's nearest neighbor inside the
    query's own generating cluster.  (The sf testdata embeddings are
    near-isotropic — flat eigen-spectrum — so, as with the kmeans/semdedup
    recall tests, the separability claim needs constructed blobs.)"""
    from ballista_spark.operators.similarity import cosine_topk

    rng = np.random.default_rng(7)
    d, n_per, k_blobs = 64, 50, 4
    centers = rng.normal(0, 4.0, (k_blobs, 16))
    rows, labels = [], {}
    for b in range(k_blobs):
        for i in range(n_per):
            vid = b * n_per + i
            sig = centers[b] + rng.normal(0, 0.5, 16)
            v = np.concatenate([sig, rng.normal(0, 0.5, d - 16)])
            rows.append((vid, [float(x) for x in v]))
            labels[vid] = b
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    model = pca_fit(df, k=8)
    red = pca_project(df, model, out_col="pv").select(
        "vec_id", F.col("pv").alias("embedding")
    )
    q_red = red.where(F.col("vec_id") % 10 == 0)
    red_top = {
        r["query_id"]: r["neighbor_id"]
        for r in cosine_topk(red, q_red, k=1).collect()
    }
    assert len(red_top) == 20
    agree = sum(labels[q] == labels[n] for q, n in red_top.items())
    assert agree >= 19, (agree, len(red_top))
