"""Raw-Ray two-stage hash exchange for keyed map_groups.

This is the engine's one deliberate drop below the Dataset API (the
"raw tasks only where Dataset can't express it" rule): Ray Data 2.49
expresses a keyed ``groupby().map_groups`` ONLY as a range-partitioned
SORT — boundary sampling, per-block sort, merge reduce — and its
experimental hash-shuffle strategy hangs in local mode (measured,
BASELINE.md). A keyed map_groups needs CO-LOCATION of each key's rows,
not global order, so the sort is pure overhead: profiled at ~2/3 of
the flagship wall (Sort 51 s vs 19 s of scoring compute at sf-bench,
scripts/profile_flagship.py), and a multi-second fixed floor per
groupby on small inputs (sampling pass + sort tasks + merge).

Shape (classic push-based hash shuffle, the same exchange the
reference delegates to its external dedup/shuffle tooling for):

    M map tasks    — split each upstream block into P slices by a
                     canonical 64-bit key hash (``schema.hash_key_u64``
                     per key column, splitmix64-combined; single string
                     keys use the engine-pinned crc32 of
                     ``state.checkpoint.add_partition_column``);
    P reduce tasks — concat their M slices, run ONE vectorized
                     reduce_fn over the whole partition (every key's
                     rows are now co-located), emit an Arrow block.

vs the sort-based groupby: no sampling pass, no per-block sort, no
merge heap; each byte crosses the object store exactly once. Object
count is M x P — the same as the sort's shuffle-block count. Both are
all-to-all pipeline BARRIERS (the input materializes either way).

Scale notes (100 TB): pick ``n_reducers`` ~ input_bytes / 256 MB so a
reduce partition fits a worker's heap; skewed keys skew only their
partition (a key's rows must land in one reducer — thinning partitions
is the lever). Map outputs are plain object-store objects, so Ray
spills them to disk under memory pressure exactly as it spills sort
blocks."""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


def _part_codes(t: pa.Table, keys: list[str], n_reducers: int) -> np.ndarray:
    """Partition id per row: canonical per-column 64-bit hashes,
    splitmix64-combined across key columns (dtype-representation-safe —
    see ``schema.hash_key_u64``)."""
    from ..schema import hash_key_u64
    from .bloom import _mix64

    acc: np.ndarray | None = None
    for c in keys:
        h = hash_key_u64(t[c])
        acc = h if acc is None else _mix64(acc ^ h, np.uint64(0xA076_1D64_78BD_642F))
    return (acc % np.uint64(n_reducers)).astype(np.int64)


@ray.remote
def _split_block(n_reducers: int, key: str | list[str], *blocks) -> tuple:
    """Map side: one task per GROUP of upstream blocks (the driver
    coalesces small blocks to ~64 MB per task — an actor-pool stage
    emits one ~batch-sized block per call, and splitting each of ~1500
    such blocks into P slices floods the object store with M x P tiny
    objects; grouping cuts both the object count and the reduce-side
    concat fan-in ~an order of magnitude). Returns ``n_reducers`` table
    slices. A single STRING key routes via the engine-pinned crc32
    partition hash (computed per *unique* key — cheap for multi-turn
    conversations); other keys via the canonical hash.

    Accepts pandas-backed blocks too (Ray stores ``from_pandas`` /
    pandas-map_groups outputs as DataFrames): converted to Arrow here,
    metadata-stripped."""
    tabs = [
        pa.Table.from_pandas(b, preserve_index=False).replace_schema_metadata(None)
        if isinstance(b, pd.DataFrame)
        else b
        for b in blocks
    ]
    live = [t for t in tabs if t.num_rows > 0]
    # Ray 2.49 map operators emit 0-row blocks with an EMPTY schema (no
    # key column to hash) — drop them unless everything is empty
    t = pa.concat_tables(live).combine_chunks() if live else tabs[0]
    if t.num_rows == 0:
        # Ray 2.49 map operators emit 0-row blocks with an EMPTY schema
        # (no key column to hash); route an empty slice everywhere —
        # the reduce side drops row-less chunks before concat
        return tuple(t for _ in range(n_reducers))
    if isinstance(key, str) and pa.types.is_string(t.schema.field(key).type):
        from ..state.checkpoint import add_partition_column

        # the routing column is appended LAST; remove it by index so a
        # user column that happens to be named "part" is untouched
        # (pyarrow drop_columns raises on duplicate names)
        t2 = add_partition_column(t, n_reducers, key=key)
        part = t2.column(t2.num_columns - 1).to_numpy(zero_copy_only=False)
        tt = t2.remove_column(t2.num_columns - 1)
    else:
        keys = [key] if isinstance(key, str) else list(key)
        part = _part_codes(t, keys, n_reducers)
        tt = t
    order = np.argsort(part, kind="stable")
    sorted_part = part[order]
    tt = tt.take(pa.array(order, pa.int64()))
    bounds = np.searchsorted(sorted_part, np.arange(n_reducers + 1))
    return tuple(
        tt.slice(bounds[i], bounds[i + 1] - bounds[i]) for i in range(n_reducers)
    )


@ray.remote
def _num_rows(t: pa.Table) -> int:
    return t.num_rows


@ray.remote
def _reduce_partition(
    fn: Callable,
    out_schema: pa.Schema | None,
    batch_format: str,
    *chunks: pa.Table,
) -> pa.Table:
    """Reduce side: all of one partition's slices → one vectorized
    ``fn`` call → one Arrow block. ``out_schema`` pins the output type
    so an empty partition emits a schema-identical empty block (pandas
    would otherwise upcast empty columns to object/float64)."""
    live = [c for c in chunks if c.num_rows > 0]
    if not live:
        # every upstream slice was a 0-row (possibly empty-SCHEMA) block
        if out_schema is not None:
            return out_schema.empty_table()
        return chunks[0]  # degenerate; pruned by the 0-row filter below
    t = pa.concat_tables(live).combine_chunks()
    if batch_format == "pyarrow":
        out_t = fn(t)
        return out_t.cast(out_schema) if out_schema is not None else out_t
    out = fn(t.to_pandas())
    if out_schema is not None:
        return pa.Table.from_pandas(out, schema=out_schema, preserve_index=False)
    from ..schema import from_pandas_like

    # pin columns shared with the input partition to its types: a
    # partition whose string key is entirely null would re-infer as
    # double and poison any downstream concat/to_pandas
    return from_pandas_like(out, t)


def hash_exchange_map_groups(
    ds: ray.data.Dataset,
    fn: Callable,
    *,
    key: str | list[str],
    n_reducers: int | None = None,
    out_schema: pa.Schema | None = None,
    batch_format: str = "pandas",
) -> ray.data.Dataset:
    """Hash-partition ``ds`` by ``key`` (one column or several) and
    apply ``fn`` once per partition (all rows of any key value
    co-located), bypassing Ray Data's sort-based groupby. Returns a
    Dataset over the reduce outputs, so downstream stages
    (``write_parquet``, further ``map_batches``) stream as usual.

    ``fn`` must be partition-local and key-complete (the contract of
    ``groupby(key).map_groups`` with a vectorized body): it receives
    EVERY row of each key in the partition (a pandas frame, or an
    Arrow table with ``batch_format="pyarrow"``) and groups
    internally. Unlike ``map_groups`` it is called once per PARTITION,
    not per key — no bucket pre-binning column needed."""
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    p = n_reducers or max(8, 2 * cpus)
    p = max(2, p)  # num_returns>=2 so _split_block returns a tuple of refs
    # Map side consumes the upstream STREAM: split tasks launch as the
    # executor yields each block, overlapping the exchange's map phase
    # with upstream compute, and — because the driver drops each block
    # ref once its split task holds it — letting Ray free upstream
    # blocks incrementally instead of pinning the whole input in a
    # materialize() until every split ran (peak object-store residency
    # ~1x the exchanged bytes, not 2x). The reduce barrier below is
    # unchanged: it is inherent to any hash exchange.
    # coalesce the upstream stream into ~64 MB map tasks: each split
    # task still launches as soon as its group fills, preserving the
    # map/compute overlap, but the exchange's object count drops from
    # (upstream blocks x P) to (bytes/64MB x P)
    import os

    target = int(os.environ.get("FW2_EXCHANGE_SPLIT_BYTES", str(64 << 20)))
    splits, pend, pend_bytes = [], [], 0

    def _flush() -> None:
        nonlocal pend, pend_bytes
        if pend:
            splits.append(
                _split_block.options(num_returns=p).remote(p, key, *pend)
            )
            pend, pend_bytes = [], 0

    for bundle in ds.iter_internal_ref_bundles():
        for r, meta in zip(bundle.block_refs, bundle.metadata):
            pend.append(r)
            pend_bytes += meta.size_bytes or 0
            if pend_bytes >= target or len(pend) >= 128:
                _flush()
    _flush()
    if not splits:
        # zero bundles yielded: empty input. Preserve the output schema
        # when pinned; else fall back to the (empty, cheap) plan.
        if out_schema is not None:
            return ray.data.from_arrow(out_schema.empty_table())
        return ds.materialize()
    outs = [
        _reduce_partition.remote(fn, out_schema, batch_format, *[s[i] for s in splits])
        for i in range(p)
    ]
    # drop 0-row partitions: Ray's map operators emit an EMPTY-SCHEMA
    # block for a 0-row input block (observed on 2.49), which then
    # poisons any downstream keyed stage with a KeyError; the exchange
    # is a barrier anyway, so this row-count sync costs nothing extra
    counts = ray.get([_num_rows.remote(o) for o in outs])
    keep = [o for o, n in zip(outs, counts) if n > 0]
    return ray.data.from_arrow_refs(keep or outs[:1])
