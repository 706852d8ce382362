"""Row-shape operators: list explode (UNNEST) and column unpivot (melt).

Both are embarrassingly parallel — pure per-batch Arrow kernels with NO
shuffle, so they stream at read speed regardless of corpus size. These
are the reshape half of the pivot family (``analysis.pivot_counts`` is
the wide direction); a 100 TB embedding or measurement table reshapes
block-by-block with peak memory = one batch x fan-out.

Reference analog: the reference flattens nested HF dataset fields onto
shard rows when writing JSON shards (fineweb/fineweb2_download.py:22-41);
here the reshape is a first-class streaming operator.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def explode_list(
    ds: ray.data.Dataset,
    *,
    list_col: str,
    id_cols: list[str],
    pos_col: str = "pos",
    val_col: str = "val",
) -> ray.data.Dataset:
    """UNNEST a ``list<T>`` column: one output row per element, carrying
    the parent's ``id_cols``, the 1-based element position and the
    element value. Fully vectorized: ``list_parent_indices`` +
    ``list_flatten`` are zero-copy Arrow kernels; positions come from a
    single arange minus repeated offsets (no Python per row)."""

    def explode(b: pa.Table) -> pa.Table:
        col = b[list_col]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        parents = pc.list_parent_indices(col)
        flat = pc.list_flatten(col)
        # NULL lists emit no rows (SQL UNNEST semantics): their length
        # is null -> treated as 0 below, and list_parent_indices /
        # list_flatten already skip them.
        lens = pc.fill_null(pc.list_value_length(col), 0).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        starts = np.concatenate(([0], np.cumsum(lens)[:-1])) if len(lens) else lens
        total = int(lens.sum())
        pos = np.arange(total, dtype=np.int64) - np.repeat(starts, lens) + 1
        cols = {c: b[c].take(parents) for c in id_cols}
        cols[pos_col] = pa.array(pos, type=pa.int64())
        cols[val_col] = flat
        return pa.table(cols)

    return ds.map_batches(explode, batch_format="pyarrow")


def unpivot(
    ds: ray.data.Dataset,
    *,
    id_cols: list[str],
    value_cols: list[str],
    name_col: str = "measure",
    value_col: str = "value",
    value_type: pa.DataType | None = None,
) -> ray.data.Dataset:
    """Wide -> long melt (SQL UNPIVOT): each input row emits one output
    row per entry in ``value_cols``, tagged with the source column name.
    Per-batch concat of K projections — K small constant, no shuffle;
    measure values are cast to a common type (default float64)."""
    vt = value_type or pa.float64()

    def melt(b: pa.Table) -> pa.Table:
        pieces = []
        for vc in value_cols:
            cols = {c: b[c] for c in id_cols}
            cols[name_col] = pa.array([vc] * b.num_rows, type=pa.string())
            cols[value_col] = b[vc].cast(vt)
            pieces.append(pa.table(cols))
        return pa.concat_tables(pieces)

    return ds.map_batches(melt, batch_format="pyarrow")
