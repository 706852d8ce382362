"""Distributed PCA over an embedding column — one sufficient-statistics
pass (count, Σx, Σxxᵀ per batch → d×d driver solve), the same shape as
the ridge trainer (``training/trainer.py``) and k-means fit
(``stages/clustering.py``): rows never shuffle, driver state is O(d²)
(d=64 → 32 KB) at any corpus size.

PCA/whitening is the standard preprocessing in front of the ANN lane
(IVF codebooks train faster and bucket better in decorrelated space —
the FAISS `PCAMatrix` pattern) and gives the embedding family a
dimensionality-reduction operator to pair with ``stages/similarity``
and ``stages/semdedup``.

Determinism: eigenvectors come from ``numpy.linalg.eigh`` on the
driver-side covariance (bit-stable given identical sufficient stats,
which are exact integer-weighted float sums reduced in a fixed driver
fold); each component's sign is normalized so its largest-|entry|
coordinate is positive (ties → lowest index), so reruns and block
layouts cannot flip components.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data

from .similarity import _to_matrix


def fit_pca(
    ds: ray.data.Dataset,
    *,
    emb_col: str = "embedding",
    n_components: int | None = None,
    whiten: bool = False,
    eps: float = 1e-12,
) -> dict:
    """ONE streamed pass → ``{"mean": (d,), "components": (p, d),
    "explained_variance": (p,), "n": int, "whiten": bool}``.
    Components are unit eigenvectors of the sample covariance
    (denominator n−1), sorted by eigenvalue descending."""

    def partial(t: pa.Table) -> pa.Table:
        x = _to_matrix(t[emb_col]).astype(np.float64)
        n, d = x.shape
        s1 = x.sum(axis=0)
        s2 = x.T @ x
        return pa.table(
            {
                "n": pa.array([n], pa.int64()),
                "s1": pa.array([s1.tolist()]),
                "s2": pa.array([s2.reshape(-1).tolist()]),
            }
        )

    n_total = 0
    s1: np.ndarray | None = None
    s2: np.ndarray | None = None
    for b in (
        ds.select_columns([emb_col])
        .map_batches(partial, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    ):
        for i in range(b.num_rows):
            n_total += int(b["n"][i].as_py())
            bs1 = np.asarray(b["s1"][i].as_py(), dtype=np.float64)
            bs2 = np.asarray(b["s2"][i].as_py(), dtype=np.float64)
            s1 = bs1 if s1 is None else s1 + bs1
            s2 = bs2 if s2 is None else s2 + bs2
    if n_total < 2 or s1 is None:
        raise ValueError(f"fit_pca needs >= 2 rows, got {n_total}")
    d = len(s1)
    mean = s1 / n_total
    cov = (s2.reshape(d, d) - n_total * np.outer(mean, mean)) / (n_total - 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1]
    evals = np.maximum(evals[order], 0.0)
    comps = evecs[:, order].T  # (d, d) rows = components
    # sign convention: largest-|entry| coordinate positive, ties -> lowest idx
    for r in range(len(comps)):
        j = int(np.argmax(np.abs(comps[r])))
        if comps[r, j] < 0:
            comps[r] = -comps[r]
    p = d if n_components is None else min(n_components, d)
    return {
        "mean": mean,
        "components": comps[:p],
        "explained_variance": evals[:p],
        "n": n_total,
        "whiten": whiten,
        "eps": eps,
    }


def pca_transform(
    ds: ray.data.Dataset,
    model: dict,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    out_col: str = "pca",
) -> ray.data.Dataset:
    """(id, out_col) with out_col = (x − mean) · componentsᵀ, optionally
    whitened (divided by √eigenvalue). Model broadcast once."""
    w = model["components"].T.copy()  # (d, p)
    if model["whiten"]:
        w = w / np.sqrt(np.maximum(model["explained_variance"], model["eps"]))
    ref = ray.put((model["mean"], w))
    p = w.shape[1]

    def proj(t: pa.Table) -> pa.Table:
        mean, ww = ray.get(ref)
        if t.num_rows == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    out_col: pa.array([], pa.list_(pa.float64(), p)),
                }
            )
        x = _to_matrix(t[emb_col]).astype(np.float64)
        y = (x - mean) @ ww
        return pa.table(
            {
                id_col: t[id_col],
                out_col: pa.FixedSizeListArray.from_arrays(
                    pa.array(y.reshape(-1), pa.float64()), p
                ),
            }
        )

    return ds.select_columns([id_col, emb_col]).map_batches(
        proj, batch_format="pyarrow"
    )
