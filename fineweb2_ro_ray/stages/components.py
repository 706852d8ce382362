"""Distributed connected components over an id-pair edge list.

The primitive behind near-duplicate CLUSTERING: the reference consumes
the upstream FineWeb-2 ``minhash_cluster_size`` passenger column
(``/root/reference/fineweb/fineweb2_download.py:22``) — the cluster ids
that column summarizes are the connected components of the near-dup
pair graph. This module computes them Ray-Data-native so the engine can
produce that column itself (pairs → components → cluster sizes →
keep-one-per-cluster).

Algorithm: iterative neighbor-min label propagation. Every node starts
labeled with its own id; each round every node takes the min of its
label and its neighbors' labels; converged when the global label SUM
stops decreasing (labels only ever decrease, so an unchanged sum is
exact convergence, checked with one tiny aggregate — no driver diff).
Rounds = graph diameter; near-dup clusters are dense (quasi-cliques),
so 2–3 rounds in practice.

Scale shape per round: two keyed attach exchanges
(:func:`~fineweb2_ro_ray.stages.dedup.attach_payload_exchange`) ship
(edge-endpoint, 8-byte label) rows, then one groupby-min over thin
(node, candidate) rows. Nothing ever concentrates the graph on the
driver; the edge list is materialized once in the object store.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray.data
from ray.data.aggregate import Min


def connected_components(
    pairs: ray.data.Dataset,
    *,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 25,
    driver_edge_limit: int = 2_000_000,
) -> ray.data.Dataset:
    """(doc_id, component) for every node appearing in ``pairs``, where
    ``component`` is the MIN node id of its connected component.

    Path selection (the broadcast-vs-shuffle rule): an edge list under
    ``driver_edge_limit`` (16 B/edge — the DEDUPED near-dup pair set,
    not the corpus) is solved with a driver union-find in one pass; a
    larger graph runs the distributed label propagation, whose per-
    round exchanges only pay off once the graph itself is beyond one
    machine. Both paths are exact and equality-tested."""
    from .dedup import attach_payload_exchange

    edges = pairs.map_batches(
        lambda t: pa.table(
            {
                "a": t[a_col].cast(pa.int64()),
                "b": t[b_col].cast(pa.int64()),
            }
        ),
        batch_format="pyarrow",
    ).materialize()

    if edges.count() <= driver_edge_limit:
        ea, eb = [], []
        for t in edges.iter_batches(batch_format="pyarrow"):
            ea.append(t["a"].to_numpy(zero_copy_only=False))
            eb.append(t["b"].to_numpy(zero_copy_only=False))
        a = np.concatenate(ea) if ea else np.array([], np.int64)
        b = np.concatenate(eb) if eb else np.array([], np.int64)
        nodes = np.unique(np.concatenate([a, b]))
        ia = np.searchsorted(nodes, a)
        ib = np.searchsorted(nodes, b)
        # vectorized label propagation (a per-edge Python union-find
        # loop was this operator's hot spot at 444k edges): each round
        # every endpoint takes the edge-min label (np.minimum.at), then
        # pointer-jumps lab <- lab[lab] to collapse chains; labels are
        # INDICES into the ascending-sorted node array, so min index ==
        # min node id and the final label is exact. Rounds ~ O(log
        # diameter); near-dup clusters are quasi-cliques (2-4 rounds).
        lab = np.arange(len(nodes), dtype=np.int64)
        while True:
            m = np.minimum(lab[ia], lab[ib])
            new = lab.copy()
            np.minimum.at(new, ia, m)
            np.minimum.at(new, ib, m)
            while True:  # full pointer-jump collapse (strictly decreasing)
                jumped = new[new]
                if np.array_equal(jumped, new):
                    break
                new = jumped
            if np.array_equal(new, lab):
                break
            lab = new
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(nodes, pa.int64()),
                    "component": pa.array(nodes[lab], pa.int64()),
                }
            )
        )

    def init_labels(t: pa.Table) -> pa.Table:
        u = np.unique(
            np.concatenate(
                [
                    t["a"].to_numpy(zero_copy_only=False),
                    t["b"].to_numpy(zero_copy_only=False),
                ]
            )
        )
        return pa.table(
            {"doc_id": pa.array(u, pa.int64()), "lbl": pa.array(u, pa.int64())}
        )

    from .exchange import hash_exchange_map_groups

    lbl_min = lambda df: df.groupby("doc_id", as_index=False)["lbl"].min()  # noqa: E731
    labels = hash_exchange_map_groups(
        edges.map_batches(init_labels, batch_format="pyarrow"),
        lbl_min,
        key="doc_id",
    ).materialize()

    edge_schema = pa.schema([pa.field("a", pa.int64()), pa.field("b", pa.int64())])
    lbl_schema = pa.schema(
        [pa.field("doc_id", pa.int64()), pa.field("lbl", pa.int64())]
    )

    def label_sum(lds: ray.data.Dataset) -> int:
        # ONE distributed aggregate; only the scalar reaches the driver
        from ray.data.aggregate import Sum

        return int(lds.aggregate(Sum("lbl", alias_name="s"))["s"])

    prev_sum = label_sum(labels)
    converged = False
    for _ in range(max_iter):
        # attach each endpoint's current label to the edge, emit the
        # cross-propagated candidates plus the self rows, reduce by min
        wa = attach_payload_exchange(
            edges, labels, key="a", id_col="doc_id", payload_col="lbl",
            out_col="l_a", pairs_schema=edge_schema, payload_type=pa.int64(),
        )
        wab = attach_payload_exchange(
            wa, labels, key="b", id_col="doc_id", payload_col="lbl",
            out_col="l_b",
            pairs_schema=edge_schema.append(pa.field("l_a", pa.int64())),
            payload_type=pa.int64(),
        )

        def cands(t: pa.Table) -> pa.Table:
            a = t["a"].to_numpy(zero_copy_only=False)
            b = t["b"].to_numpy(zero_copy_only=False)
            la = t["l_a"].to_numpy(zero_copy_only=False)
            lb = t["l_b"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "doc_id": pa.array(np.concatenate([a, b]), pa.int64()),
                    "lbl": pa.array(np.concatenate([lb, la]), pa.int64()),
                }
            )

        prop = wab.map_batches(cands, batch_format="pyarrow")
        labels = hash_exchange_map_groups(
            prop.union(labels), lbl_min, key="doc_id"
        ).materialize()
        # pointer jump: l(x) <- min(l(x), l(l(x))). Every label IS a
        # node id, so the lookup always resolves; combined with the
        # neighbor-min this gives O(log diameter) rounds instead of
        # O(diameter) — a long transitive chain converges within the
        # iteration budget instead of silently falling out of it.
        jumped = attach_payload_exchange(
            labels, labels, key="lbl", id_col="doc_id", payload_col="lbl",
            out_col="lbl2", pairs_schema=lbl_schema, payload_type=pa.int64(),
        )

        def shortcut(t: pa.Table) -> pa.Table:
            l1 = t["lbl"].to_numpy(zero_copy_only=False)
            l2 = t["lbl2"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "doc_id": t["doc_id"].cast(pa.int64()),
                    "lbl": pa.array(np.minimum(l1, l2), pa.int64()),
                }
            )

        labels = jumped.map_batches(shortcut, batch_format="pyarrow").materialize()
        cur = label_sum(labels)
        if cur == prev_sum:  # labels only decrease: fixed point reached
            converged = True
            break
        prev_sum = cur
    if not converged:
        raise RuntimeError(
            f"connected_components: no fixed point within max_iter={max_iter} "
            f"rounds (graph diameter > 2^{max_iter}?) — raise max_iter"
        )

    return labels.map_batches(
        lambda t: pa.table(
            {"doc_id": t["doc_id"].cast(pa.int64()), "component": t["lbl"].cast(pa.int64())}
        ),
        batch_format="pyarrow",
    )


def cluster_sizes(components: ray.data.Dataset) -> ray.data.Dataset:
    """(component, cluster_size) — the engine-side derivation of the
    reference's ``minhash_cluster_size`` passenger column."""
    from .exchange import hash_exchange_map_groups

    def count_per_part(df):
        out = df.groupby("component", as_index=False).size()
        return out.rename(columns={"size": "cluster_size"})

    return hash_exchange_map_groups(components, count_per_part, key="component")


def dedup_by_components(
    components: ray.data.Dataset,
) -> ray.data.Dataset:
    """Canonical survivor per near-dup cluster: the MIN doc id (= the
    component label itself). Returns one (doc_id,) row per cluster."""
    from .exchange import hash_exchange_map_groups

    return hash_exchange_map_groups(
        components,
        lambda df: df.groupby("component", as_index=False)["doc_id"].min(),
        key="component",
    ).select_columns(["doc_id"])
