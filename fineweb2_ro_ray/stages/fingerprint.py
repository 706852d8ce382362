"""Document fingerprinting: winnowing over k-gram rolling hashes
(Schleimer, Wilkerson, Aiken, SIGMOD 2003 — public algorithm; the MOSS
fingerprint). Guarantee: any two documents sharing a substring of at
least w+k-1 bytes share at least one fingerprint, while only ~2/(w+1)
of positions are kept — the sketch a plagiarism / near-dup scanner
stores per document at corpus scale.

Shuffle-free: fingerprints are a per-batch kernel (each doc's
fingerprints depend only on its own bytes); downstream joins/groupbys
on the fingerprint column ride the hash exchange like any key.

Vectorization mirrors the MinHash kernel (`dedup.py`): ONE rolling
polynomial hash over the batch's concatenated utf-8 bytes, then a
strided sliding-window min over the gathered per-doc hash stream with
boundary-crossing windows masked out — no per-byte or per-window
Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ..schema import from_pandas_clean


def _batch_fingerprints(
    b: pa.Table, *, text_col: str, id_col: str, k: int, w: int
) -> pa.Table:
    from ..functions.textstats import utf8_flat_view

    ids = b[id_col].to_numpy(zero_copy_only=False)
    flat, lens = utf8_flat_view(b[text_col])  # zero-copy utf-8 view
    offsets = np.zeros(len(lens) + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])

    empty = pa.table(
        {
            id_col: pa.array([], b[id_col].type),
            "fingerprint": pa.array([], pa.uint64()),
        }
    )
    if len(flat) < k:
        return empty

    # one rolling hash over the whole batch (identical arithmetic to
    # the MinHash kernel; wrap-around mod 2^64 is deterministic)
    arr = flat.astype(np.uint64)
    L = len(arr)
    base = np.uint64(1099511628211)
    with np.errstate(over="ignore"):
        h_all = np.zeros(L - k + 1, dtype=np.uint64)
        for j in range(k):
            h_all = h_all * base + arr[j : L - k + 1 + j]

    # gather each doc's valid k-gram hash range [off, off+len-k] into
    # one stream; docs shorter than k+w-1 have no full window and emit
    # no fingerprints (standard winnowing behavior for tiny docs)
    doc_mask = lens >= k + w - 1
    if not doc_mask.any():
        return empty
    seg_start = offsets[:-1][doc_mask]
    seg_len = (lens - k + 1)[doc_mask]
    bnd = np.zeros(len(seg_len) + 1, dtype=np.int64)
    np.cumsum(seg_len, out=bnd[1:])
    idx = (
        np.arange(bnd[-1], dtype=np.int64)
        - np.repeat(bnd[:-1], seg_len)
        + np.repeat(seg_start, seg_len)
    )
    hv = h_all[idx]

    # sliding-window min over the gathered stream (strided view, no
    # copy); a window starting at p is valid iff p+w-1 stays inside the
    # same doc segment
    wins = np.lib.stride_tricks.sliding_window_view(hv, w).min(axis=1)
    starts = np.arange(len(hv) - w + 1, dtype=np.int64)
    doc_of = np.repeat(np.arange(len(seg_len)), seg_len)
    valid = doc_of[starts] == doc_of[starts + w - 1]
    sel = wins[valid]
    sel_doc = doc_of[starts[valid]]

    # distinct fingerprints per doc, vectorized
    df = pd.DataFrame({"d": sel_doc, "fingerprint": sel}).drop_duplicates()
    kept_ids = ids[doc_mask]
    out = pd.DataFrame(
        {id_col: kept_ids[df["d"].to_numpy()], "fingerprint": df["fingerprint"].to_numpy()}
    )
    return from_pandas_clean(out).cast(
        pa.schema([(id_col, b[id_col].type), ("fingerprint", pa.uint64())])
    )


def winnow_fingerprints(
    ds: ray.data.Dataset,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    w: int = 16,
) -> ray.data.Dataset:
    """(id, fingerprint) rows per document — see module docstring."""
    return ds.map_batches(
        lambda b: _batch_fingerprints(b, text_col=text_col, id_col=id_col, k=k, w=w),
        batch_format="pyarrow",
    )
