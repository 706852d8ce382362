"""Distributed k-means (stages/clustering.py) and n-gram overlap
decontamination (stages/decontaminate.py round-4 additions)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray.data


def _emb_ds(n=120, d=6, seed=7, ids=None):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, d)).astype(np.float64)
    vid = np.arange(n, dtype=np.int64) if ids is None else np.asarray(ids)
    t = pa.table(
        {
            "vec_id": pa.array(vid),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(x.reshape(-1)), d
            ),
        }
    )
    return ray.data.from_arrow(t).repartition(5), x, vid


def _lloyd_reference(x, cent, n_iters):
    """Single-process numpy Lloyd, same semantics: exact (x-c)^2,
    first-min tie-break, empty clusters keep their centroid."""
    cent = cent.copy()
    k = len(cent)
    counts = np.zeros(k, dtype=np.int64)
    inertia = []
    for _ in range(n_iters):
        diff = x[:, None, :] - cent[None, :, :]
        dist = np.einsum("nkd,nkd->nk", diff, diff)
        a = np.argmin(dist, axis=1)
        d2 = dist[np.arange(len(a)), a]
        counts = np.bincount(a, minlength=k).astype(np.int64)
        inertia.append(float(d2.sum()))
        for c in range(k):
            if counts[c]:
                cent[c] = x[a == c].mean(axis=0)
    return cent, counts, inertia


def test_init_smallest_ids_deterministic(ray_session):
    from fineweb2_ro_ray.stages.clustering import init_smallest_ids

    perm_ids = np.array([50, 3, 99, 7, 1, 42, 13, 8, 77, 2] * 12)[:120]
    # make ids unique but unsorted
    ids = np.argsort(np.argsort(perm_ids, kind="stable"), kind="stable")
    rng = np.random.default_rng(0)
    ids = rng.permutation(120).astype(np.int64)
    ds, x, vid = _emb_ds(ids=ids)
    cent, labs = init_smallest_ids(ds, 5)
    order = np.argsort(vid)
    assert list(labs) == list(np.sort(vid)[:5])
    np.testing.assert_array_equal(cent, x[order[:5]])


def test_kmeans_fit_matches_numpy_reference(ray_session):
    from fineweb2_ro_ray.stages.clustering import (
        init_smallest_ids,
        kmeans_fit_distributed,
    )

    ds, x, _ = _emb_ds()
    init, _ = init_smallest_ids(ds, 4)
    res = kmeans_fit_distributed(ds, k=4, n_iters=3, init=init)
    ref_cent, ref_counts, ref_inertia = _lloyd_reference(x, init, 3)
    np.testing.assert_allclose(res["centroids"], ref_cent, rtol=1e-12)
    np.testing.assert_array_equal(res["counts"], ref_counts)
    np.testing.assert_allclose(res["inertia"], ref_inertia, rtol=1e-12)


def test_kmeans_fit_empty_cluster_keeps_centroid(ray_session):
    from fineweb2_ro_ray.stages.clustering import kmeans_fit_distributed

    # all points near the origin; a far-away init centroid stays put
    x = np.zeros((20, 3))
    x[:, 0] = np.linspace(-0.1, 0.1, 20)
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(20, dtype=np.int64)),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(x.reshape(-1)), 3
            ),
        }
    )
    ds = ray.data.from_arrow(t)
    init = np.array([[0.0, 0.0, 0.0], [1e6, 1e6, 1e6]])
    res = kmeans_fit_distributed(ds, k=2, n_iters=2, init=init)
    np.testing.assert_array_equal(res["centroids"][1], init[1])
    assert res["counts"][1] == 0 and res["counts"][0] == 20


def test_kmeans_assign_labels_and_tiebreak(ray_session):
    from fineweb2_ro_ray.stages.clustering import kmeans_assign

    # two identical centroids -> first index wins -> label of index 0
    x = np.array([[1.0, 0.0], [0.0, 1.0]])
    t = pa.table(
        {
            "vec_id": pa.array([10, 11], pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(x.reshape(-1)), 2
            ),
        }
    )
    ds = ray.data.from_arrow(t)
    cent = np.array([[1.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
    out = kmeans_assign(ds, cent, labels=np.array([3, 7, 9])).to_pandas()
    out = out.sort_values("vec_id")
    assert list(out["cluster"]) == [3, 9]
    with pytest.raises(ValueError, match="ascending"):
        kmeans_assign(ds, cent, labels=np.array([7, 3, 9]))


def _naive_ngram_report(docs, eval_ids, n, num, den, modulus=97):
    eval_grams = set()
    for did, text in docs:
        if did % modulus == 0:
            ws = text.split(" ")
            for i in range(len(ws) - n + 1):
                eval_grams.add(tuple(ws[i : i + n]))
    rows = {}
    for did, text in docs:
        ws = text.split(" ")
        grams = [tuple(ws[i : i + n]) for i in range(len(ws) - n + 1)]
        n_hit = sum(g in eval_grams for g in grams)
        rows[did] = (
            len(grams),
            n_hit,
            len(grams) > 0 and n_hit * den >= len(grams) * num,
        )
    return rows


def test_ngram_contamination_matches_naive(ray_session):
    from fineweb2_ro_ray.stages.decontaminate import (
        eval_ngram_keys,
        ngram_contamination_report,
    )

    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(12)]
    docs = []
    for did in range(60):
        nw = int(rng.integers(0, 14))  # includes sub-n docs
        docs.append((did, " ".join(rng.choice(vocab, size=nw))))
    # make doc 5 a near-copy of eval doc 0 (did % 97 == 0)
    docs[0] = (0, " ".join(vocab[:10]))
    docs[5] = (5, " ".join(vocab[:10] + ["extra"]))
    t = pa.table(
        {
            "doc_id": pa.array([d for d, _ in docs], pa.int64()),
            "text": pa.array([s for _, s in docs]),
        }
    )
    ds = ray.data.from_arrow(t).repartition(4)
    n = 4
    keys = eval_ngram_keys(ds, n=n)
    out = (
        ngram_contamination_report(ds, keys, n=n, threshold=(4, 5))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    ref = _naive_ngram_report(docs, None, n, 4, 5)
    assert len(out) == len(docs)
    for _, r in out.iterrows():
        ng, nh, flag = ref[r["doc_id"]]
        assert (r["n_grams"], r["n_hit"], bool(r["contaminated"])) == (ng, nh, flag)
    # doc 0 is its own eval doc -> fully contaminated; doc 5 shares
    # 7/8 grams (87.5% >= 80%) -> contaminated
    byid = out.set_index("doc_id")
    assert bool(byid.loc[0, "contaminated"])
    assert bool(byid.loc[5, "contaminated"])


def test_eval_ngram_keys_bound(ray_session):
    from fineweb2_ro_ray.stages.decontaminate import eval_ngram_keys

    words = " ".join(f"u{i}" for i in range(80))
    t = pa.table({"doc_id": pa.array([0], pa.int64()), "text": pa.array([words])})
    ds = ray.data.from_arrow(t)
    with pytest.raises(ValueError, match="max_eval_grams"):
        eval_ngram_keys(ds, n=3, max_eval_grams=10)


def test_ngram_contamination_empty_eval(ray_session):
    from fineweb2_ro_ray.stages.decontaminate import ngram_contamination_report

    t = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["a b c d e", "x"]),
        }
    )
    ds = ray.data.from_arrow(t)
    empty = (np.empty(0, np.uint64), np.empty(0, np.uint64))
    out = (
        ngram_contamination_report(ds, empty, n=3, threshold=(4, 5))
        .to_pandas()
        .sort_values("doc_id")
    )
    assert list(out["n_grams"]) == [3, 0]
    assert list(out["n_hit"]) == [0, 0]
    assert not out["contaminated"].any()
