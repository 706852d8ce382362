"""Distributed PCA (stages/pca.py) vs single-process numpy."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray.data


def _ds(x):
    n, d = x.shape
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(x.reshape(-1).astype(np.float64)), d
            ),
        }
    )
    return ray.data.from_arrow(t).repartition(5)


def _ref_pca(x):
    mean = x.mean(axis=0)
    cov = (x - mean).T @ (x - mean) / (len(x) - 1)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1]
    comps = evecs[:, order].T
    for r in range(len(comps)):
        j = int(np.argmax(np.abs(comps[r])))
        if comps[r, j] < 0:
            comps[r] = -comps[r]
    return mean, np.maximum(evals[order], 0.0), comps


def test_fit_matches_numpy(ray_session):
    from fineweb2_ro_ray.stages.pca import fit_pca

    rng = np.random.default_rng(1)
    # anisotropic data: a few dominant directions
    x = rng.normal(size=(200, 6)) * np.array([5.0, 3.0, 1.0, 0.5, 0.2, 0.1])
    x = x @ rng.normal(size=(6, 6))  # rotate
    m = fit_pca(_ds(x))
    mean, evals, comps = _ref_pca(x)
    np.testing.assert_allclose(m["mean"], mean, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(m["explained_variance"], evals, rtol=1e-8)
    np.testing.assert_allclose(m["components"], comps, rtol=1e-7, atol=1e-9)
    assert m["n"] == 200


def test_transform_and_whiten(ray_session):
    from fineweb2_ro_ray.stages.pca import fit_pca, pca_transform

    rng = np.random.default_rng(2)
    x = rng.normal(size=(120, 5)) * np.array([4.0, 2.0, 1.0, 0.3, 0.1])
    ds = _ds(x)
    m = fit_pca(ds, n_components=3)
    out = pca_transform(ds, m).to_pandas().sort_values("vec_id")
    y = np.stack(out["pca"].to_numpy())
    assert y.shape == (120, 3)
    mean, evals, comps = _ref_pca(x)
    np.testing.assert_allclose(y, (x - mean) @ comps[:3].T, rtol=1e-7, atol=1e-9)
    # whitened projection has ~unit variance per component
    mw = fit_pca(ds, n_components=3, whiten=True)
    yw = np.stack(
        pca_transform(ds, mw).to_pandas().sort_values("vec_id")["pca"].to_numpy()
    )
    np.testing.assert_allclose(yw.var(axis=0, ddof=1), np.ones(3), rtol=1e-8)


def test_small_input_raises(ray_session):
    from fineweb2_ro_ray.stages.pca import fit_pca

    with pytest.raises(ValueError, match=">= 2 rows"):
        fit_pca(_ds(np.zeros((1, 3))))
