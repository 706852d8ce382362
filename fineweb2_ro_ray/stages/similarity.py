"""Similarity search over an embedding column (``list<float>``).

Brute-force cosine top-k is the baseline: the query matrix is broadcast
ONCE via ``ray.put`` and read inside each task (never re-shipped per
batch); each batch computes a local top-k; the driver merges the tiny
per-batch candidate sets.  The scale path is LSH bucketing (random
hyperplane signs): embeddings are hash-partitioned into buckets and only
the query's bucket is scanned — an IVF-style probe without a trained
codebook (no external models in this sandbox).

The reference has no vector search; the analogous shape is its
embed-then-score stage (``/root/reference/ro_vs_eng/fineweb2_jql.py:13-23``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


def _to_matrix(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """list<float> column → (n, d) float64 matrix, zero-copy-ish."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(col)
    return flat.reshape(n, -1) if n else flat.reshape(0, 0)


def knn_bruteforce(
    ds: ray.data.Dataset,
    query_matrix: np.ndarray,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> pd.DataFrame:
    """Exact cosine top-k for each query row. Returns a small DataFrame
    (query_id, rank, vec_id, sim) — ranks 1..k, ties broken by vec_id.

    query_matrix: (q, d). Broadcast via ``ray.put`` so every map task
    reads the same object-store copy."""
    q = np.asarray(query_matrix, dtype=np.float64)
    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-30)
    q_ref = ray.put(qn)

    def local_topk(batch: pa.Table) -> pa.Table:
        qn = ray.get(q_ref)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        m = _to_matrix(batch[emb_col])
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
        sims = mn @ qn.T  # (n, q)
        out_q, out_id, out_sim = [], [], []
        kk = min(k, len(ids))
        for qi in range(qn.shape[0]):
            s = sims[:, qi]
            idx = np.argpartition(-s, kk - 1)[:kk] if kk < len(ids) else np.arange(len(ids))
            out_q += [qi] * len(idx)
            out_id += ids[idx].tolist()
            out_sim += s[idx].tolist()
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                id_col: pa.array(out_id, pa.int64()),
                "sim": pa.array(out_sim, pa.float64()),
            }
        )

    cands = ds.select_columns([id_col, emb_col]).map_batches(
        local_topk, batch_format="pyarrow"
    )
    df = cands.to_pandas()  # tiny: k × queries × num_batches
    df = df.sort_values(["query_id", "sim", id_col], ascending=[True, False, True])
    df["rank"] = df.groupby("query_id").cumcount() + 1
    df = df[df["rank"] <= k].reset_index(drop=True)
    return df[["query_id", "rank", id_col, "sim"]]


def embedding_neardup_pairs(
    ds: ray.data.Dataset,
    *,
    threshold: float = 0.45,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> ray.data.Dataset:
    """Embedding-cosine near-duplicate pairs (§2.7 extra): all (a < b)
    pairs with cosine >= threshold.

    Exact variant: the normalized matrix is broadcast ONCE (``ray.put``)
    and every batch computes batch × all sims — correct while the
    embedding table fits the object store (small-side broadcast rule).
    The 100 TB path is ``HyperplaneLSH`` bucketing + within-bucket
    pairing (same shape as MinHash banding)."""
    import pandas as pd  # noqa: F401

    tbl = ds.select_columns([id_col, emb_col]).to_pandas()
    tbl = tbl.sort_values(id_col)
    ids_all = tbl[id_col].to_numpy()
    m = np.stack(tbl[emb_col].to_numpy()).astype(np.float64)
    mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)
    ref = ray.put((ids_all, mn))

    def pairs(batch: pa.Table) -> pa.Table:
        ids_all, mn = ray.get(ref)
        pos = {v: i for i, v in enumerate(ids_all)}
        b_ids = batch[id_col].to_numpy(zero_copy_only=False)
        rows = np.array([pos[v] for v in b_ids])
        bm = mn[rows]
        sims = bm @ mn.T  # (nb, N)
        out_a, out_b = [], []
        for r, i in enumerate(rows):
            hit = np.flatnonzero(sims[r] >= threshold)
            hit = hit[ids_all[hit] > b_ids[r]]  # a < b, no self-pairs
            out_a += [int(b_ids[r])] * len(hit)
            out_b += [int(x) for x in ids_all[hit]]
        return pa.table(
            {
                "vec_a": pa.array(out_a, pa.int64()),
                "vec_b": pa.array(out_b, pa.int64()),
            }
        )

    return ds.select_columns([id_col]).map_batches(pairs, batch_format="pyarrow")


class HyperplaneLSH:
    """Actor-pool stage: bucket embeddings by the sign pattern of
    ``n_planes`` fixed random projections (state built once per actor)."""

    def __init__(self, dim: int, n_planes: int = 8, seed: int = 99) -> None:
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, n_planes))

    def bucket_of(self, vecs: np.ndarray) -> np.ndarray:
        signs = (vecs @ self.planes) > 0
        return (signs @ (1 << np.arange(signs.shape[1]))).astype(np.int64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = _to_matrix(batch["embedding"])
        b = self.bucket_of(m) if len(m) else np.array([], dtype=np.int64)
        return batch.append_column("bucket", pa.array(b, pa.int64()))


def knn_lsh(
    ds: ray.data.Dataset,
    query_matrix: np.ndarray,
    *,
    k: int = 10,
    dim: int = 64,
    n_planes: int = 8,
    id_col: str = "vec_id",
) -> pd.DataFrame:
    """Approximate top-k: scan only rows whose LSH bucket matches the
    query's bucket (single-probe IVF-style). Trades recall for a
    1/2^n_planes scan fraction — the 100 TB path."""
    lsh = HyperplaneLSH(dim, n_planes)
    q = np.asarray(query_matrix, dtype=np.float64)
    q_buckets = lsh.bucket_of(q)
    wanted = pa.array(np.unique(q_buckets), pa.int64())

    bucketed = ds.map_batches(
        HyperplaneLSH,
        fn_constructor_kwargs={"dim": dim, "n_planes": n_planes},
        batch_format="pyarrow",
        concurrency=(1, 4),
    )
    import pyarrow.compute as pc

    filtered = bucketed.map_batches(
        lambda t: t.filter(pc.is_in(t["bucket"], value_set=wanted)),
        batch_format="pyarrow",
    )
    return knn_bruteforce(filtered, q, k=k, id_col=id_col)
