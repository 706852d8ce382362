"""Distributed k-means (Lloyd) over an embedding column.

Corpus-scale clustering is a first-class training-data operation
(domain discovery, semantic dedup buckets, data-mixture curation — the
SemDeDup / k-means-curation family). The engine already had a
DRIVER-SIDE sample k-means (``similarity.train_kmeans``) as the IVF
codebook trainer; this module is the full-data distributed version:

- **One map_batches pass per Lloyd iteration.** Each batch emits only
  SUFFICIENT STATISTICS — per-centroid (count, coordinate sum, inertia)
  — so the shuffle-free reduce moves k x (d+2) numbers per batch, never
  rows. The driver folds the partials with a STREAMING
  ``iter_batches`` reduce and holds exactly one (k, d) accumulator:
  driver memory is O(k·d) regardless of corpus size.
- **Centroids broadcast once per iteration** via ``ray.put`` (read in
  every task, never re-shipped per batch).
- **The pruned projection is materialized once** (``select_columns``
  then ``materialize``) so N iterations don't re-read and re-decode
  the parquet N times; the pinned blocks are the embedding column
  only, and Ray spills them under memory pressure. Pass
  ``materialize_input=False`` to re-scan instead (cheaper object
  store, N x the read work).
- **Deterministic init**: ``init_smallest_ids`` takes the embeddings
  of the k smallest ids — per-batch local top-k then a k-bounded
  streaming driver merge (the ``knn_bruteforce`` pattern), so the
  init is reproducible AND oracle-expressible (``ORDER BY id LIMIT
  k`` in SQL), unlike a random sample.
- **Assignment is exact L2 with first-min tie-break** (lowest centroid
  index wins), mirrored by the DuckDB oracle's ``ORDER BY
  list_distance(...), cid`` — the ``kmeans_assign`` query is
  value-exact, not rows-only, because its output is integer-only.

Empty clusters keep their previous centroid (standard Lloyd practice;
deterministic). Distances are computed in float64 from the explicit
(x - c)^2 form — numerically the same quantity the oracle's
``list_distance`` evaluates (up to summation order), unlike the
catastrophic-cancellation-prone |x|^2 - 2x·C + |c|^2 expansion; per-row
chunking bounds the (rows, k, d) intermediate at ~16 MB per task.

The reference repo contains no clustering operator — this belongs to
the training-data extension family alongside dedup / ANN / mixing
(SURVEY.md §2.7+).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

from .similarity import _to_matrix

# bound on the (rows_chunk, k, d) float64 intermediate per assign call
_CHUNK_FLOATS = 2_000_000


def _assign_core(x: np.ndarray, c: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Nearest centroid per row: (assignment, squared L2 distance).
    Exact (x - c)^2 form, first-min tie-break (np.argmin), row-chunked
    so the broadcast intermediate stays bounded for any k·d."""
    n, d = x.shape
    k = len(c)
    a = np.empty(n, dtype=np.int64)
    d2 = np.empty(n, dtype=np.float64)
    step = max(1, _CHUNK_FLOATS // max(1, k * d))
    for i in range(0, n, step):
        diff = x[i : i + step, None, :] - c[None, :, :]
        dist = np.einsum("nkd,nkd->nk", diff, diff)
        ai = np.argmin(dist, axis=1)
        a[i : i + step] = ai
        d2[i : i + step] = dist[np.arange(len(ai)), ai]
    return a, d2


def init_smallest_ids(
    ds: ray.data.Dataset,
    k: int,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic centroid init: embeddings of the k SMALLEST ids.
    Per-batch local k-smallest, then a k-bounded streaming driver merge
    — the driver never holds more than 2k candidate rows."""
    cols = [id_col, emb_col]

    def localk(t: pa.Table) -> pa.Table:
        t = t.select(cols)
        if t.num_rows <= k:
            return t
        return t.take(pc.select_k_unstable(t, k, [(id_col, "ascending")]))

    best: pa.Table | None = None
    it = ds.select_columns(cols).map_batches(localk, batch_format="pyarrow")
    for b in it.iter_batches(batch_format="pyarrow"):
        if b.num_rows == 0:
            continue
        cand = b if best is None else pa.concat_tables([best, b])
        if cand.num_rows > k:
            cand = cand.take(pc.select_k_unstable(cand, k, [(id_col, "ascending")]))
        best = cand.combine_chunks()
    if best is None or best.num_rows == 0:
        raise ValueError("init_smallest_ids: empty input dataset")
    order = pc.sort_indices(best, sort_keys=[(id_col, "ascending")])
    best = best.take(order)
    return _to_matrix(best[emb_col]), best[id_col].to_numpy(zero_copy_only=False)


_STATS_SCHEMA_COLS = ("cluster", "n", "inertia", "vsum")


def _stats_table(k: int, d: int, cnt, sums, inert) -> pa.Table:
    offs = pa.array(np.arange(k + 1, dtype=np.int32) * d)
    return pa.table(
        {
            "cluster": pa.array(np.arange(k, dtype=np.int64)),
            "n": pa.array(cnt.astype(np.int64)),
            "inertia": pa.array(inert.astype(np.float64)),
            "vsum": pa.ListArray.from_arrays(
                offs, pa.array(sums.reshape(-1), pa.float64())
            ),
        }
    )


def kmeans_fit_distributed(
    ds: ray.data.Dataset,
    *,
    k: int = 8,
    n_iters: int = 10,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    init: np.ndarray | None = None,
    materialize_input: bool = True,
) -> dict:
    """Full-data Lloyd k-means. Returns ``{"centroids": (k, d) float64,
    "counts": (k,) int64, "inertia": [per-iteration float], "k": k}``.
    ``init`` defaults to ``init_smallest_ids`` (deterministic)."""
    cent = (
        np.asarray(init, dtype=np.float64)
        if init is not None
        else init_smallest_ids(ds, k, id_col=id_col, emb_col=emb_col)[0]
    )
    if len(cent) != k:
        raise ValueError(f"init has {len(cent)} centroids, expected k={k}")
    base = ds.select_columns([emb_col])
    if materialize_input:
        base = base.materialize()
    d = cent.shape[1]
    counts = np.zeros(k, dtype=np.int64)
    inertia_hist: list[float] = []
    for _ in range(n_iters):
        ref = ray.put(cent)

        def stats(t: pa.Table, _ref=ref) -> pa.Table:
            c = ray.get(_ref)
            kk, dd = c.shape
            if t.num_rows == 0:
                z = np.zeros(kk)
                return _stats_table(kk, dd, z, np.zeros((kk, dd)), z)
            x = _to_matrix(t[emb_col])
            a, d2 = _assign_core(x, c)
            sums = np.zeros((kk, dd), dtype=np.float64)
            np.add.at(sums, a, x)
            cnt = np.bincount(a, minlength=kk)
            inert = np.bincount(a, weights=d2, minlength=kk)
            return _stats_table(kk, dd, cnt, sums, inert)

        agg_sum = np.zeros((k, d), dtype=np.float64)
        agg_n = np.zeros(k, dtype=np.int64)
        agg_in = np.zeros(k, dtype=np.float64)
        part = base.map_batches(stats, batch_format="pyarrow")
        for b in part.iter_batches(batch_format="pyarrow"):
            # one iter_batches batch can coalesce SEVERAL per-block stats
            # tables, so cluster ids repeat -> np.add.at, never fancy +=
            cl = b["cluster"].to_numpy(zero_copy_only=False)
            np.add.at(agg_n, cl, b["n"].to_numpy(zero_copy_only=False))
            np.add.at(agg_in, cl, b["inertia"].to_numpy(zero_copy_only=False))
            vs = b["vsum"]
            if isinstance(vs, pa.ChunkedArray):
                vs = vs.combine_chunks()
            np.add.at(
                agg_sum,
                cl,
                vs.flatten().to_numpy(zero_copy_only=False).reshape(len(cl), d),
            )
        nonzero = agg_n > 0
        new_cent = cent.copy()  # empty clusters keep their centroid
        new_cent[nonzero] = agg_sum[nonzero] / agg_n[nonzero, None]
        cent = new_cent
        counts = agg_n
        inertia_hist.append(float(agg_in.sum()))
    return {"centroids": cent, "counts": counts, "inertia": inertia_hist, "k": k}


def kmeans_assign(
    ds: ray.data.Dataset,
    centroids: np.ndarray,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    labels: np.ndarray | None = None,
    out_col: str = "cluster",
    with_distance: bool = False,
) -> ray.data.Dataset:
    """Append the nearest-centroid assignment to every row. ``labels``
    relabels centroid INDEX i to ``labels[i]`` (e.g. the init rows'
    ids, matching an ``ORDER BY dist, cid`` SQL tie-break as long as
    labels are ascending). Integer output — value-exact vs the oracle."""
    c = np.asarray(centroids, dtype=np.float64)
    lab = None if labels is None else np.asarray(labels, dtype=np.int64)
    if lab is not None and not np.all(np.diff(lab) > 0):
        raise ValueError("labels must be strictly ascending (tie-break contract)")
    ref = ray.put((c, lab))

    def assign(t: pa.Table) -> pa.Table:
        cc, ll = ray.get(ref)
        if t.num_rows == 0:
            t = t.append_column(out_col, pa.array([], pa.int64()))
            if with_distance:
                t = t.append_column("sq_dist", pa.array([], pa.float64()))
            return t
        x = _to_matrix(t[emb_col])
        a, d2 = _assign_core(x, cc)
        out = ll[a] if ll is not None else a
        t = t.append_column(out_col, pa.array(out, pa.int64()))
        if with_distance:
            t = t.append_column("sq_dist", pa.array(d2, pa.float64()))
        return t

    return ds.select_columns([id_col, emb_col]).map_batches(
        assign, batch_format="pyarrow"
    )
