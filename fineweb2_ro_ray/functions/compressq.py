"""Compression-ratio quality signal — the classic cheap detector for
repetitive / boilerplate / machine-generated text (low ratio = highly
compressible = repetitive; used alongside the Gopher repetition rules,
arXiv:2112.11446 §A1.1, which `stages.sketches` implements as exact
word/n-gram fractions).

zlib is a per-string C call, so the per-batch kernel is a tight loop of
C invocations over the batch's raw utf-8 buffers — the same cost model
as a batched model call, not a per-row Python-math loop. DEFLATE output
is fully deterministic for a fixed (level, strategy, library) triple;
the gate entry is rows-only (SQL cannot zlib) and the pytest pins the
values against direct zlib calls plus the ordering invariant
(repetitive < natural < random).
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def compress_ratio_batch(
    b: pa.Table,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    level: int = 6,
) -> pa.Table:
    """(doc_id, raw_bytes, comp_bytes, compress_ratio) per row;
    ratio = comp/raw as one float division (NULL text / empty text →
    NULL ratio)."""
    text = b[text_col]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    raw = pc.binary_length(pc.cast(text, pa.binary())).to_numpy(
        zero_copy_only=False
    )
    comp = np.zeros(len(text), dtype=np.int64)
    valid = np.zeros(len(text), dtype=bool)
    # per-row C calls (see module docstring); buffers come straight off
    # the Arrow array without a table->pylist of the whole batch
    for i, v in enumerate(text):
        s = v.as_py()
        if s is None:
            continue
        valid[i] = True
        comp[i] = len(zlib.compress(s.encode("utf-8"), level))
    raw_i = np.where(valid, raw, 0).astype(np.int64)
    ratio = np.where(
        valid & (raw_i > 0), comp / np.maximum(raw_i, 1), np.nan
    )
    mask = pa.array(~(valid & (raw_i > 0)))
    return pa.table(
        {
            id_col: b[id_col],
            "raw_bytes": pc.if_else(
                pa.array(~valid), pa.scalar(None, pa.int64()), pa.array(raw_i)
            ),
            "comp_bytes": pc.if_else(
                pa.array(~valid), pa.scalar(None, pa.int64()), pa.array(comp)
            ),
            "compress_ratio": pc.if_else(
                mask, pa.scalar(None, pa.float64()), pa.array(ratio)
            ),
        }
    )


def repetitive_mask(ratios: pa.Array, *, min_ratio: float = 0.3) -> pa.Array:
    """Keep-mask: drop rows whose text compresses below ``min_ratio``
    (too repetitive). NULL ratio (null/empty text) is DROPPED — no
    signal means no keep, matching the engine's conjunctive keep
    rules."""
    return pc.fill_null(pc.greater_equal(ratios, min_ratio), False)
