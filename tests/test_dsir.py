"""DSIR importance resampling (stages/dsir.py) vs a single-process
reference that shares only the gram-key primitive (the distributed
plumbing — per-batch partials, driver fold, broadcast scoring, local
top-k merge — is what's under test; the rolling gram hash itself is
ground-truth-pinned in the spans tests)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data


def _docs(seed=0, n=80):
    rng = np.random.default_rng(seed)
    target_vocab = [f"t{i}" for i in range(8)]
    other_vocab = [f"o{i}" for i in range(20)]
    rows = []
    for did in range(n):
        is_target_like = did % 3 == 0
        vocab = target_vocab if is_target_like else other_vocab
        nw = int(rng.integers(0, 15))  # includes empty docs
        rows.append((did, " ".join(rng.choice(vocab, size=nw)), is_target_like))
    t = pa.table(
        {
            "doc_id": pa.array([d for d, _, _ in rows], pa.int64()),
            "text": pa.array([s for _, s, _ in rows]),
            "is_t": pa.array([b for _, _, b in rows], pa.bool_()),
        }
    )
    return ray.data.from_arrow(t).repartition(5), rows


def _ref_buckets(text, ks, n_buckets):
    """Reference bucket stream for one doc: the same gram keys the
    engine derives, computed one doc at a time through the primitive."""
    from fineweb2_ro_ray.stages.dsir import _mix
    from fineweb2_ro_ray.stages.spans import _batch_windows

    t = pa.table({"text": pa.array([text])})
    out = []
    for k in ks:
        _, _, _, win, g1, _ = _batch_windows(t, text_col="text", k=k, sep=" ")
        salt = np.uint64((0x9E3779B97F4A7C15 * k) & 0xFFFFFFFFFFFFFFFF)
        if len(g1):
            out.append((_mix(g1 ^ salt) % np.uint64(n_buckets)).astype(np.int64))
    return np.concatenate(out) if out else np.array([], np.int64)


def test_fit_and_weights_match_reference(ray_session):
    from fineweb2_ro_ray.stages.dsir import dsir_weights, fit_dsir

    ds, rows = _docs()
    B = 512
    lr = fit_dsir(
        ds,
        lambda t: t["is_t"].to_numpy(zero_copy_only=False),
        n_buckets=B,
        ks=(1, 2),
    )
    # reference fit
    raw = np.zeros(B, np.int64)
    tgt = np.zeros(B, np.int64)
    for did, text, is_t in rows:
        bk = _ref_buckets(text, (1, 2), B)
        np.add.at(raw, bk, 1)
        if is_t:
            np.add.at(tgt, bk, 1)
    pt = (tgt + 1.0) / (tgt.sum() + B)
    pr = (raw + 1.0) / (raw.sum() + B)
    np.testing.assert_allclose(lr, np.log(pt) - np.log(pr), rtol=1e-12)

    w = dsir_weights(ds, lr, ks=(1, 2)).to_pandas().set_index("doc_id")
    for did, text, _ in rows:
        bk = _ref_buckets(text, (1, 2), B)
        np.testing.assert_allclose(
            w.loc[did, "logw"], float(lr[bk].sum()), rtol=1e-9, atol=1e-12
        )
    # target-like docs must score higher on average (the point of DSIR)
    t_mean = w.loc[[d for d, _, b in rows if b], "logw"].mean()
    o_mean = w.loc[[d for d, _, b in rows if not b], "logw"].mean()
    assert t_mean > o_mean


def test_select_topk_and_gumbel(ray_session):
    from fineweb2_ro_ray.stages.dsir import dsir_select, dsir_weights, fit_dsir

    ds, rows = _docs(seed=2)
    lr = fit_dsir(
        ds, lambda t: t["is_t"].to_numpy(zero_copy_only=False), n_buckets=256
    )
    out = dsir_select(ds, lr, 15).to_pandas()
    assert len(out) == len(rows) and out["selected"].sum() == 15
    w = dsir_weights(ds, lr).to_pandas()
    merged = out.merge(w, on="doc_id", suffixes=("", "_w"))
    np.testing.assert_allclose(merged["logw"], merged["logw_w"])
    # top-k rule: every selected weight >= every unselected (ties by id)
    sel = out[out["selected"]].sort_values(["logw", "doc_id"])
    uns = out[~out["selected"]]
    assert sel["logw"].min() >= uns["logw"].max() - 1e-12
    # gumbel: deterministic across reruns, same size; with weights
    # shrunk so the noise matters, different seeds pick different sets
    lr_small = lr * 0.01
    g1 = dsir_select(ds, lr_small, 15, gumbel=True, seed=7).to_pandas()
    g2 = dsir_select(ds, lr_small, 15, gumbel=True, seed=7).to_pandas()
    assert g1.sort_values("doc_id")["selected"].tolist() == g2.sort_values(
        "doc_id"
    )["selected"].tolist()
    assert g1["selected"].sum() == 15
    g3 = dsir_select(ds, lr_small, 15, gumbel=True, seed=8).to_pandas()
    assert (
        g3.sort_values("doc_id")["selected"].tolist()
        != g1.sort_values("doc_id")["selected"].tolist()
    )


def test_empty_and_tiny_inputs(ray_session):
    from fineweb2_ro_ray.stages.dsir import dsir_select, fit_dsir

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["", "a", None]),
            "is_t": pa.array([True, False, False]),
        }
    )
    ds = ray.data.from_arrow(t)
    lr = fit_dsir(ds, lambda x: x["is_t"].to_numpy(zero_copy_only=False), n_buckets=64)
    out = dsir_select(ds, lr, 2).to_pandas().sort_values("doc_id")
    assert len(out) == 3 and out["selected"].sum() == 2
    # gram-less docs (null text -> zero words) score exactly 0;
    # empty string splits to one empty word, so doc 1 has a unigram
    assert out.loc[out["doc_id"] == 3, "logw"].iloc[0] == 0.0
