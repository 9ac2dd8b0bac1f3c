"""Distributed PCA vs in-memory numpy eigendecomposition."""

import numpy as np
import pandas as pd

import ray.data as rd

from table_annotation_ray.stages.decomp import pca_fit, pca_transform


def _aniso_data(n=3000, d=12, seed=21):
    rng = np.random.default_rng(seed)
    scales = np.geomspace(8.0, 0.2, d)
    basis, _ = np.linalg.qr(rng.normal(size=(d, d)))
    X = rng.normal(size=(n, d)) * scales @ basis.T + rng.normal(size=d) * 3
    return pd.DataFrame(
        {"vec_id": np.arange(n, dtype=np.int64), "embedding": list(X.astype(np.float64))}
    )


def test_pca_fit_matches_numpy(ray_session):
    df = _aniso_data()
    X = np.stack(df["embedding"].to_numpy())
    model = pca_fit(
        rd.from_pandas(df).repartition(6), n_components=4, batch_size=256
    )
    np.testing.assert_allclose(model["mean"], X.mean(axis=0), rtol=1e-10)
    cov = np.cov(X, rowvar=False)
    evals = np.sort(np.linalg.eigvalsh(cov))[::-1][:4]
    np.testing.assert_allclose(model["explained_variance"], evals, rtol=1e-8)
    # components span the same directions (up to sign)
    _, evecs = np.linalg.eigh(cov)
    ref = evecs[:, np.argsort(np.linalg.eigvalsh(cov))[::-1][:4]].T
    dots = np.abs(np.sum(model["components"] * ref, axis=1))
    np.testing.assert_allclose(dots, 1.0, atol=1e-8)
    assert abs(model["explained_variance_ratio"].sum() - (evals.sum() / np.trace(cov))) < 1e-10


def test_pca_transform_projects(ray_session):
    df = _aniso_data(n=1200, d=8, seed=5)
    ds = rd.from_pandas(df).repartition(4)
    model = pca_fit(ds, n_components=2, batch_size=300)
    out = (
        pca_transform(ds, model, keep_cols=["vec_id"], batch_size=300)
        .to_pandas()
        .sort_values("vec_id")
        .reset_index(drop=True)
    )
    X = np.stack(df["embedding"].to_numpy())
    ref = (X - model["mean"]) @ model["components"].T
    np.testing.assert_allclose(out[["pc0", "pc1"]].to_numpy(), ref, rtol=1e-9, atol=1e-9)
    # projection variance along pc0 equals the top eigenvalue
    assert abs(out["pc0"].var(ddof=1) - model["explained_variance"][0]) < 1e-6 * model["explained_variance"][0] + 1e-9


def test_pca_fit_deterministic_sign(ray_session):
    df = _aniso_data(n=800, d=6, seed=8)
    m1 = pca_fit(rd.from_pandas(df).repartition(3), n_components=3, batch_size=128)
    m2 = pca_fit(rd.from_pandas(df).repartition(5), n_components=3, batch_size=200)
    np.testing.assert_allclose(m1["components"], m2["components"], atol=1e-9)
