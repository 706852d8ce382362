"""Raw-Ray two-stage hash exchange for keyed reassembly.

This is the engine's one deliberate drop below the Dataset API (the
"raw tasks only where Dataset can't express it" rule): Ray Data 2.49
expresses a keyed ``groupby().map_groups`` ONLY as a range-partitioned
SORT — boundary sampling, per-block sort, merge reduce — and its
experimental hash-shuffle strategy hangs in local mode (measured,
BASELINE.md). Conversation reassembly needs CO-LOCATION of each
conversation's turns, not global order, so the sort is pure overhead:
profiled at ~2/3 of the flagship wall (Sort 51 s vs 19 s of scoring
compute at sf-bench, scripts/profile_flagship.py).

Shape (classic push-based hash shuffle, the same exchange the
reference delegates to its external dedup/shuffle tooling for):

    M map tasks    — split each upstream block into P slices by
                     crc32(key) % P (``state.checkpoint.partition_of``,
                     the engine's ONE partitioning hash);
    P reduce tasks — concat their M slices, run ONE vectorized
                     reduce_fn over the whole partition (every key's
                     rows are now co-located), emit an Arrow block.

vs the sort-based groupby: no sampling pass, no per-block sort, no
merge heap; each byte crosses the object store exactly once. Object
count is M x P — the same as the sort's shuffle-block count. Both are
all-to-all pipeline BARRIERS (the input materializes either way).

Scale notes (100 TB): pick ``n_reducers`` ~ input_bytes / 256 MB so a
reduce partition fits a worker's heap; skewed keys skew only their
partition (a conversation must land in exactly one reducer — salting
is impossible for reassembly semantics, thinning partitions is the
lever). Map outputs are plain object-store objects, so Ray spills
them to disk under memory pressure exactly as it spills sort blocks.
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


@ray.remote
def _split_block(t: pa.Table, n_reducers: int, key: str) -> tuple:
    """Map side: one task per upstream block; returns ``n_reducers``
    table slices, routed by the engine-pinned crc32 partition hash
    (computed per *unique* key — cheap for multi-turn conversations)."""
    from ..state.checkpoint import add_partition_column

    t2 = add_partition_column(t, n_reducers, key=key)
    part = t2["part"].to_numpy(zero_copy_only=False)
    order = np.argsort(part, kind="stable")
    sorted_part = part[order]
    tt = t2.take(pa.array(order, pa.int64())).drop_columns(["part"])
    bounds = np.searchsorted(sorted_part, np.arange(n_reducers + 1))
    return tuple(
        tt.slice(bounds[i], bounds[i + 1] - bounds[i]) for i in range(n_reducers)
    )


@ray.remote
def _reduce_partition(
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    out_schema: pa.Schema | None,
    *chunks: pa.Table,
) -> pa.Table:
    """Reduce side: all of one partition's slices → one vectorized
    ``fn`` call → one Arrow block. ``out_schema`` pins the output type
    so an empty partition emits a schema-identical empty block (pandas
    would otherwise upcast empty columns to object/float64)."""
    t = pa.concat_tables(chunks).combine_chunks()
    out = fn(t.to_pandas())
    if out_schema is not None:
        return pa.Table.from_pandas(out, schema=out_schema, preserve_index=False)
    from ..schema import from_pandas_clean

    return from_pandas_clean(out)


def hash_exchange_map_groups(
    ds: ray.data.Dataset,
    fn: Callable[[pd.DataFrame], pd.DataFrame],
    *,
    key: str = "conv_id",
    n_reducers: int | None = None,
    out_schema: pa.Schema | None = None,
) -> ray.data.Dataset:
    """Hash-partition ``ds`` by ``key`` and apply ``fn`` once per
    partition (all rows of any key value co-located), bypassing Ray
    Data's sort-based groupby. Returns a Dataset over the reduce
    outputs, so downstream stages (``write_parquet``, further
    ``map_batches``) stream as usual.

    ``fn`` must be partition-local and key-complete (the contract of
    ``groupby(key).map_groups`` with a vectorized body): it receives a
    pandas frame holding EVERY row of each key in the partition and
    groups internally. Unlike ``map_groups`` it is called once per
    PARTITION, not per key — no 4096-bucket pre-binning needed."""
    mat = ds.materialize()
    refs: list = []
    for bundle in mat.iter_internal_ref_bundles():
        refs.extend(bundle.block_refs)
    if not refs:
        return mat
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    p = n_reducers or max(8, 2 * cpus)
    p = max(2, p)  # num_returns>=2 so _split_block returns a tuple of refs
    splits = [_split_block.options(num_returns=p).remote(r, p, key) for r in refs]
    outs = [
        _reduce_partition.remote(fn, out_schema, *[s[i] for s in splits])
        for i in range(p)
    ]
    return ray.data.from_arrow_refs(outs)
