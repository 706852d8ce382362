"""Join operators beyond the lookup patterns: as-of join, range join.

The reference has no as-of/range joins (SURVEY.md §2.4); these are the
custom-operator compositions the brief calls for: hash-bucket both sides
by the equality key, union under a superset schema, and resolve matches
inside each bucket (ray_guide join pattern).  Partitioning assumption:
the equality key co-locates both sides — the same single-key discipline
as conversation reassembly.

Exactness note: buckets are processed as ARROW tables and each side is
extracted by filtering its ``_side`` tag and selecting only its own
columns BEFORE any pandas conversion — the side's own columns are
null-free, so int64 keys never round-trip through float64 (a whole-
bucket pandas conversion would upcast them via the opposite side's null
padding and silently collapse keys above 2^53)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data


def _arrow_schema(ds: ray.data.Dataset) -> pa.Schema:
    """The dataset's schema as a real Arrow schema — from_pandas
    datasets report a PandasBlockSchema, so fall back to peeking one
    batch."""
    sch = ds.schema().base_schema
    if isinstance(sch, pa.Schema):
        return sch
    for b in ds.limit(1).iter_batches(batch_format="pyarrow"):
        return b.schema
    raise ValueError("cannot determine Arrow schema of an empty non-Arrow dataset")


def _bucket_union(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    key: str,
    right_key: str,
    n_partitions: int,
):
    """Shared scaffolding for the bucketed joins: pad each side to the
    superset schema with a ``_side`` tag, hash-bucket on the equality
    key, and union — ONE identically-keyed shuffle co-locates both
    sides. Returns (both, l_cols, r_cols, out_schema)."""
    l_cols = left.schema().names
    r_cols = right.schema().names
    overlap = set(l_cols) & set(r_cols)
    assert not overlap, f"rename overlapping columns first: {overlap}"

    def pad(b: pa.Table, side: str, k: str, other_cols, other_types) -> pa.Table:
        ks = b[k].to_numpy(zero_copy_only=False).astype(np.int64)
        b = b.append_column(
            "part", pa.array((ks % n_partitions).astype(np.int32), pa.int32())
        )
        b = b.append_column("_side", pa.array([side] * b.num_rows, pa.string()))
        for c, t in zip(other_cols, other_types):
            b = b.append_column(c, pa.nulls(b.num_rows, t))
        return b

    l_schema, r_schema = _arrow_schema(left), _arrow_schema(right)
    r_types = [r_schema.field(c).type for c in r_cols]
    l_types = [l_schema.field(c).type for c in l_cols]
    out_schema = pa.schema(
        [l_schema.field(c) for c in l_cols] + [r_schema.field(c) for c in r_cols]
    )
    order = l_cols + r_cols + ["part", "_side"]
    lt = left.map_batches(
        lambda b: pad(b, "l", key, r_cols, r_types).select(order), batch_format="pyarrow"
    )
    rt = right.map_batches(
        lambda b: pad(b, "r", right_key, l_cols, l_types).select(order),
        batch_format="pyarrow",
    )
    return lt.union(rt), l_cols, r_cols, out_schema


def _split_sides(
    g: pa.Table, l_cols: list[str], r_cols: list[str]
) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Bucket table → (left_df, right_df), each converted to pandas
    AFTER selecting only its own (null-free) columns — dtypes stay
    exact."""
    side = g["_side"]
    l = g.filter(pc.equal(side, "l")).select(l_cols).to_pandas()
    r = g.filter(pc.equal(side, "r")).select(r_cols).to_pandas()
    return l, r


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    n_partitions: int = 512,
) -> ray.data.Dataset:
    """For each left row, attach the greatest ``right_ts <= left_ts`` row
    of the same key (backward as-of, inner semantics: unmatched left
    rows are dropped) — DuckDB ``ASOF JOIN`` equivalent.

    One keyed shuffle (see :func:`_bucket_union`); each bucket runs a
    sorted ``pd.merge_asof``. Skewed keys salt only their bucket.
    Output schema is pinned to the SOURCE dtypes — ``merge_asof`` emits
    float64 for unmatched right ints, so the merged frame is cast back
    (VERDICT r1: events_asof_orders emitted event_id as double)."""
    both, l_cols, r_cols, out_schema = _bucket_union(
        left, right, key, right_key, n_partitions
    )

    def per_part(g: pa.Table) -> pa.Table:
        l, r = _split_sides(g, l_cols, r_cols)
        if l.empty or r.empty:
            return out_schema.empty_table()
        l = l.sort_values(left_ts, kind="mergesort")
        r = r.sort_values(right_ts, kind="mergesort")
        out = pd.merge_asof(
            l,
            r,
            left_on=left_ts,
            right_on=right_ts,
            left_by=key,
            right_by=right_key,
            direction="backward",
        )
        out = out[out[right_ts].notna()]  # inner semantics
        t = pa.Table.from_pandas(out, preserve_index=False).select(out_schema.names)
        return t.cast(out_schema)

    return both.groupby("part").map_groups(per_part, batch_format="pyarrow")


def range_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    key: str,
    right_key: str,
    left_ts: str,
    right_start: str,
    right_end: str,
    n_partitions: int = 512,
) -> ray.data.Dataset:
    """Interval/range join (the brief's custom-operator family next to
    as-of): every (left, right) pair with equal keys and
    ``right_start <= left_ts < right_end`` — one-to-MANY output.

    Same single-shuffle shape as :func:`asof_join`; each bucket resolves
    matches per key with a sorted interval sweep (``searchsorted``
    bounds the candidates by start; the end-filter is vectorized) and
    emits all matches with ONE ``take`` per side per key — no per-row
    DataFrame slicing. Skew caveat: a key whose left×matching-right
    product is huge emits that many rows — inherent to the join's
    semantics."""
    both, l_cols, r_cols, out_schema = _bucket_union(
        left, right, key, right_key, n_partitions
    )

    def per_part(g: pa.Table) -> pa.Table:
        l, r = _split_sides(g, l_cols, r_cols)
        if l.empty or r.empty:
            return out_schema.empty_table()
        out_frames = []
        r_by_key = dict(tuple(r.groupby(right_key, sort=False)))
        for kval, lg in l.groupby(key, sort=False):
            rg = r_by_key.get(kval)
            if rg is None:
                continue
            rg = rg.sort_values(right_start, kind="mergesort")
            starts = rg[right_start].to_numpy()
            ends = rg[right_end].to_numpy()
            ts = lg[left_ts].to_numpy()
            hi = np.searchsorted(starts, ts, side="right")
            # vectorized candidate expansion: left row i pairs with
            # every interval 0..hi[i); end-filter applied on the flat
            # candidate arrays, matches gathered with one take per side
            li = np.repeat(np.arange(len(ts)), hi)
            ri = np.concatenate([np.arange(h) for h in hi]) if len(ts) else np.array([], np.int64)
            m = ends[ri] > ts[li]
            if not m.any():
                continue
            lo = lg.iloc[li[m]].reset_index(drop=True)
            ro = rg.iloc[ri[m]].reset_index(drop=True)
            out_frames.append(pd.concat([lo, ro], axis=1))
        if not out_frames:
            return out_schema.empty_table()
        merged = pd.concat(out_frames, ignore_index=True)
        t = pa.Table.from_pandas(merged, preserve_index=False).select(out_schema.names)
        return t.cast(out_schema)

    return both.groupby("part").map_groups(per_part, batch_format="pyarrow")
