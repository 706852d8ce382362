"""Distributed PageRank (integer fixed-point power iteration).

The iterative-graph shape the engine otherwise lacks: K rounds of
"ship each node's rank along its out-edges, sum at the destination" —
per round ONE thin exchange join (ranks → edges on src) and ONE thin
keyed sum (contributions on dst); edge rows carry (src, dst,
out-degree) only, rank rows (id, r) only. The edge table (+ per-src
out-degree) is built once — distinct edges via a keyed exchange, the
degree attached by a second — and MATERIALIZED, because K dependent
iterations re-consume it (Ray lineage would otherwise re-derive it
from the raw input every round; the distinct edge set is the small
invariant working set, the same justification as bpe_train's shards).

Arithmetic is INTEGER fixed-point so the result is bit-deterministic
under any execution order and SQL-expressible (DuckDB mirrors it with
unrolled-CTE iterations and BIGINT ``//``):

    r_0(v)   = SCALE                        (SCALE = 10^12)
    c(u→v)   = (85 * r_i(u)) // (100 * d_out(u))
    r_{i+1}(v) = (15 * SCALE) // 100 + Σ_{u→v} c(u→v)

i.e. standard damping 0.85 with every division floored — the rank mass
a real-valued PageRank would spread as fractions is truncated
identically on both sides, and dangling-node mass is dropped (nodes
with no out-edges contribute nothing; their own rank still updates).
Node ids must be int64; callers building bipartite graphs offset one
side into a disjoint id range.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..schema import from_pandas_like
from .exchange import hash_exchange_map_groups

SCALE = 10**12


def distinct_edges(ds: ray.data.Dataset, src: str = "src", dst: str = "dst") -> ray.data.Dataset:
    """Exact distinct (src, dst) via per-batch local distinct (the
    combiner) + one keyed exchange."""

    def local(b: pa.Table) -> pa.Table:
        return b.select([src, dst]).group_by([src, dst]).aggregate([])

    def reduce_distinct(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates([src, dst], ignore_index=True)

    return hash_exchange_map_groups(
        ds.map_batches(local, batch_format="pyarrow"),
        reduce_distinct,
        key=src,
    )


def pagerank(
    edges: ray.data.Dataset,
    *,
    n_iters: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> ray.data.Dataset:
    """Integer fixed-point PageRank over a directed edge Dataset.
    Returns (id, r) for every node appearing as src OR dst. See the
    module docstring for the exact (SQL-mirrored) recurrence."""
    e = distinct_edges(edges, src, dst)

    # attach out-degree to each edge row once: (src, dst, d)
    def deg_reduce(df: pd.DataFrame) -> pd.DataFrame:
        d = df.groupby(src)[dst].transform("size").astype("int64")
        out = df.copy()
        out["d"] = d
        return out

    ewd = hash_exchange_map_groups(e, deg_reduce, key=src).materialize()

    # node universe: src ∪ dst, exact distinct
    def nodes_local(b: pa.Table) -> pa.Table:
        ids = pa.concat_arrays(
            [
                b[src].combine_chunks().cast(pa.int64()),
                b[dst].combine_chunks().cast(pa.int64()),
            ]
        )
        return pa.table({"id": ids}).group_by(["id"]).aggregate([])

    def nodes_reduce(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates(["id"], ignore_index=True)

    nodes = hash_exchange_map_groups(
        ewd.map_batches(nodes_local, batch_format="pyarrow"),
        nodes_reduce,
        key="id",
    ).materialize()  # thin (id) rows; re-joined every iteration

    def init(b: pa.Table) -> pa.Table:
        return b.append_column(
            "r", pa.array(np.full(b.num_rows, SCALE, np.int64), pa.int64())
        )

    ranks = nodes.map_batches(init, batch_format="pyarrow").materialize()
    base = 15 * SCALE // 100

    from .joins import hash_join

    for _ in range(n_iters):
        # contributions: edges ⋈ ranks on src (one thin exchange join),
        # then map-side partial sums on dst + one thin keyed sum
        def rank_src(b: pa.Table) -> pa.Table:
            return pa.table({"_rs": b["id"], "r": b["r"]})

        j = hash_join(
            ewd,
            ranks.map_batches(rank_src, batch_format="pyarrow"),
            key=src,
            right_key="_rs",
            how="inner",
        )

        def contrib_partial(b: pa.Table) -> pa.Table:
            r = b["r"].to_numpy(zero_copy_only=False).astype(np.int64)
            d = b["d"].to_numpy(zero_copy_only=False).astype(np.int64)
            c = (85 * r) // (100 * d)
            df = pd.DataFrame(
                {"id": b[dst].to_numpy(zero_copy_only=False).astype(np.int64), "c": c}
            )
            out = df.groupby("id", as_index=False)["c"].sum()
            return from_pandas_like(out, pa.table({"id": out["id"].to_numpy()}))

        partials = j.map_batches(contrib_partial, batch_format="pyarrow")

        def sum_contrib(df: pd.DataFrame) -> pd.DataFrame:
            out = df.groupby("id", as_index=False)["c"].sum()
            out["c"] = out["c"].astype("int64")
            return out

        sums = hash_exchange_map_groups(partials, sum_contrib, key="id")

        def csum(b: pa.Table) -> pa.Table:
            return pa.table({"_cs": b["id"], "c": b["c"]})

        merged = hash_join(
            nodes,
            sums.map_batches(csum, batch_format="pyarrow"),
            key="id",
            right_key="_cs",
            how="left",
        )

        def new_rank(b: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            c = pc.fill_null(b["c"], 0).cast(pa.int64())
            r = pc.add(pc.cast(c, pa.int64()), base)
            return pa.table({"id": b["id"], "r": r})

        ranks = merged.map_batches(new_rank, batch_format="pyarrow").materialize()

    return ranks
