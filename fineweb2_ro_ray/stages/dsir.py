"""DSIR — Data Selection via Importance Resampling
(Xie et al. 2023, arXiv:2302.03169).

Select raw-corpus documents whose hashed n-gram profile looks like a
TARGET domain: fit bucketed unigram+bigram count distributions over
the target slice and the raw corpus, score every document with the
log importance weight  Σ_grams log p_target(bucket) − log p_raw(bucket),
then keep the top-k — either directly or under Gumbel noise (the
paper's sampled variant, which preserves diversity near the boundary).

Engine shape (everything bounded by the feature width B, never by N):

- **Hash features reuse the spans gram machinery**: one flat word
  array per batch (`spans._batch_windows`), rolling 64-bit polynomial
  keys for the k-grams, bucket = g1 mod B. No Python over rows or
  grams anywhere.
- **Fit is one streamed pass per distribution**: each batch emits a
  dense bucket histogram only when B is tiny, else a sparse
  (bucket, count) table; the driver folds partials into ONE length-B
  int64 array (B ≈ 2^16 → 512 KB). Target and raw fits share the
  corpus read when the target is a column predicate
  (:func:`fit_dsir` emits both partials from the same pass).
- **Scoring broadcasts the length-B float64 log-ratio once**
  (`ray.put`); each batch scores via two `bincount`-weighted
  reductions (unigram + bigram lanes). Driver never sees rows.
- **Selection**: per-batch local top-k then a k-bounded streaming
  driver merge (the `knn_bruteforce` pattern) — the driver holds at
  most 2k candidate rows. ``gumbel=True`` perturbs each weight with
  deterministic Gumbel noise derived from splitmix64(id, seed), so
  reruns and cluster layouts cannot change the sample.

Laplace smoothing (+α on every bucket) keeps both distributions
strictly positive; ties in the top-k boundary break on smallest id.

The reference repo selects data by model-scored quality; DSIR is the
classical lexical-statistics alternative used by the same
training-data literature (cited by FineWeb/DataComp-LM) and extends
the engine's curation family (mixing / dedup / decontaminate).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .bloom import _SEED1, _mix64


def _mix(x: np.ndarray) -> np.ndarray:
    return _mix64(np.asarray(x, dtype=np.uint64), _SEED1)


def _doc_buckets(
    t: pa.Table, text_col: str, ks: tuple[int, ...], n_buckets: int, sep: str
) -> tuple[np.ndarray, np.ndarray]:
    """(parent_row_index, bucket) for every k-gram occurrence of every
    k in ``ks`` — one flat-array pass per k."""
    from .spans import _batch_windows

    pars: list[np.ndarray] = []
    bks: list[np.ndarray] = []
    for k in ks:
        _, parents, _, win, g1, _ = _batch_windows(t, text_col=text_col, k=k, sep=sep)
        if len(win) == 0:
            continue
        # salt by k so a unigram and a bigram never share a bucket lane
        salt = np.uint64((0x9E3779B97F4A7C15 * k) & 0xFFFFFFFFFFFFFFFF)
        salted = _mix(g1 ^ salt)
        pars.append(parents[win])
        bks.append((salted % np.uint64(n_buckets)).astype(np.int64))
    if not pars:
        z = np.array([], np.int64)
        return z, z
    return np.concatenate(pars), np.concatenate(bks)


def fit_dsir(
    ds: ray.data.Dataset,
    target_expr,
    *,
    text_col: str = "text",
    ks: tuple[int, ...] = (1, 2),
    n_buckets: int = 1 << 16,
    sep: str = " ",
    smoothing: float = 1.0,
) -> np.ndarray:
    """ONE corpus pass → the length-B float64 log importance ratio
    log p_target − log p_raw (Laplace-smoothed). ``target_expr`` is a
    callable ``pa.Table -> bool ndarray`` marking the target rows
    (e.g. ``lambda t: t["lang"].to_numpy(False) == "en"``). Raw = the
    whole corpus (the paper's raw pool includes the target's lexical
    mass; pass a complement mask inside ``target_expr``'s closure if
    strict exclusion is wanted)."""

    def partial(t: pa.Table) -> pa.Table:
        par, bk = _doc_buckets(t, text_col, ks, n_buckets, sep)
        mask = np.asarray(target_expr(t), dtype=bool)
        raw = np.bincount(bk, minlength=n_buckets).astype(np.int64)
        tgt = (
            np.bincount(bk[mask[par]], minlength=n_buckets).astype(np.int64)
            if mask.any() and len(bk)
            else np.zeros(n_buckets, dtype=np.int64)
        )
        nz = np.nonzero(raw)[0]
        return pa.table(
            {
                "bucket": pa.array(nz, pa.int64()),
                "raw": pa.array(raw[nz], pa.int64()),
                "target": pa.array(tgt[nz], pa.int64()),
            }
        )

    raw_c = np.zeros(n_buckets, dtype=np.int64)
    tgt_c = np.zeros(n_buckets, dtype=np.int64)
    stream = ds.map_batches(partial, batch_format="pyarrow")
    for b in stream.iter_batches(batch_format="pyarrow"):
        bk = b["bucket"].to_numpy(zero_copy_only=False)
        np.add.at(raw_c, bk, b["raw"].to_numpy(zero_copy_only=False))
        np.add.at(tgt_c, bk, b["target"].to_numpy(zero_copy_only=False))
    pt = (tgt_c + smoothing) / (tgt_c.sum() + smoothing * n_buckets)
    pr = (raw_c + smoothing) / (raw_c.sum() + smoothing * n_buckets)
    return np.log(pt) - np.log(pr)


def dsir_weights(
    ds: ray.data.Dataset,
    log_ratio: np.ndarray,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    ks: tuple[int, ...] = (1, 2),
    sep: str = " ",
) -> ray.data.Dataset:
    """(id, logw) per document — logw = Σ log_ratio[bucket] over the
    document's gram occurrences (0.0 for docs with no grams)."""
    n_buckets = len(log_ratio)
    ref = ray.put(np.asarray(log_ratio, dtype=np.float64))

    def score(t: pa.Table) -> pa.Table:
        lr = ray.get(ref)
        par, bk = _doc_buckets(t, text_col, ks, n_buckets, sep)
        w = (
            np.bincount(par, weights=lr[bk], minlength=t.num_rows)
            if len(bk)
            else np.zeros(t.num_rows)
        )
        return pa.table(
            {id_col: t[id_col], "logw": pa.array(w, pa.float64())}
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        score, batch_format="pyarrow"
    )


def _gumbel(ids: np.ndarray, seed: int) -> np.ndarray:
    """Deterministic per-id Gumbel(0,1) noise: splitmix64(id ^ seed)
    → uniform in (0,1) → −log(−log(u)). Rerun- and layout-invariant."""
    u64 = _mix(ids.astype(np.uint64) ^ np.uint64(seed))
    u = (u64.astype(np.float64) + 1.0) / 18446744073709551616.0  # (0,1]
    u = np.minimum(u, 1.0 - 1e-16)
    return -np.log(-np.log(u))


def dsir_select(
    ds: ray.data.Dataset,
    log_ratio: np.ndarray,
    k: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    ks: tuple[int, ...] = (1, 2),
    sep: str = " ",
    gumbel: bool = False,
    seed: int = 0,
) -> ray.data.Dataset:
    """Top-k selection: (id, logw, selected) for EVERY document.
    ``gumbel=True`` ranks on logw + Gumbel(id, seed) — the paper's
    importance RESAMPLING; False ranks on logw alone (top-k filter).
    Rank key ties break on smallest id. Per-batch local top-k + a
    k-bounded streaming driver merge pick the boundary; the full
    weight table streams back with the flag attached via one
    broadcast id membership test (k ids, sorted)."""
    w = dsir_weights(
        ds, log_ratio, id_col=id_col, text_col=text_col, ks=ks, sep=sep
    ).materialize()

    def rank_key(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        lw = t["logw"].to_numpy(zero_copy_only=False)
        key = lw + _gumbel(ids, seed) if gumbel else lw
        return pa.table(
            {id_col: pa.array(ids), "key": pa.array(key, pa.float64())}
        )

    def localk(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t
        return t.take(
            pc.select_k_unstable(
                t, k, [("key", "descending"), (id_col, "ascending")]
            )
        )

    best: pa.Table | None = None
    keyed = w.map_batches(rank_key, batch_format="pyarrow").map_batches(
        localk, batch_format="pyarrow"
    )
    for b in keyed.iter_batches(batch_format="pyarrow"):
        if b.num_rows == 0:
            continue
        cand = b if best is None else pa.concat_tables([best, b])
        if cand.num_rows > k:
            cand = cand.take(
                pc.select_k_unstable(
                    cand, k, [("key", "descending"), (id_col, "ascending")]
                )
            )
        best = cand.combine_chunks()
    sel_ids = (
        np.sort(best[id_col].to_numpy(zero_copy_only=False).astype(np.int64))
        if best is not None
        else np.array([], np.int64)
    )
    sel_ref = ray.put(sel_ids)

    def flag(t: pa.Table) -> pa.Table:
        s = ray.get(sel_ref)
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(s):
            pos = np.minimum(np.searchsorted(s, ids), len(s) - 1)
            selected = s[pos] == ids
        else:
            selected = np.zeros(len(ids), dtype=bool)
        return t.append_column("selected", pa.array(selected, pa.bool_()))

    return w.map_batches(flag, batch_format="pyarrow")
