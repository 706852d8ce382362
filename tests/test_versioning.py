from __future__ import annotations

import numpy as np
import pyarrow as pa

import pytest
import ray.data
import ray.data as rd

from fineweb2_ro_ray.stages.versioning import content_fingerprint, snapshot_diff


def _diff_df(old, new, **kw):
    out = snapshot_diff(
        rd.from_arrow(old), rd.from_arrow(new), key="doc_id", compare=["text"], **kw
    )
    return (
        out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    )


def test_snapshot_diff_statuses():
    old = pa.table({"doc_id": [1, 2, 3, 4], "text": ["a", "b", "c", "d"]})
    new = pa.table({"doc_id": [2, 3, 4, 5], "text": ["b", "X", "d", "e"]})
    df = _diff_df(old, new, n_reducers=3)
    assert list(df["doc_id"]) == [1, 2, 3, 4, 5]
    assert list(df["status"]) == [
        "removed",
        "unchanged",
        "changed",
        "unchanged",
        "added",
    ]


def test_snapshot_diff_exclude_unchanged_and_nulls():
    # null text on both sides is "unchanged" (null fingerprints equal);
    # null vs value is "changed"
    old = pa.table({"doc_id": [1, 2, 3], "text": [None, None, "x"]})
    new = pa.table({"doc_id": [1, 2, 3], "text": [None, "v", "x"]})
    df = _diff_df(old, new, include_unchanged=False)
    assert list(df["doc_id"]) == [2]
    assert list(df["status"]) == ["changed"]


def test_snapshot_diff_multi_column_compare_order_sensitive():
    # the fingerprint fold is order-sensitive across compare columns:
    # swapped values in (a, b) must register as changed
    old = rd.from_arrow(
        pa.table({"k": [1, 2], "a": ["x", "p"], "b": ["y", "q"]})
    )
    new = rd.from_arrow(
        pa.table({"k": [1, 2], "a": ["y", "p"], "b": ["x", "q"]})
    )
    df = (
        snapshot_diff(old, new, key="k", compare=["a", "b"])
        .to_pandas()
        .sort_values("k")
    )
    assert list(df["status"]) == ["changed", "unchanged"]


def test_content_fingerprint_dtype_canonical():
    # int32 vs int64 physical representation must fingerprint equal
    t32 = pa.table({"v": pa.array([1, 2, 3], pa.int32())})
    t64 = pa.table({"v": pa.array([1, 2, 3], pa.int64())})
    assert np.array_equal(
        content_fingerprint(t32, ["v"]), content_fingerprint(t64, ["v"])
    )
    # and distinct values must (overwhelmingly) differ
    ta = pa.table({"v": pa.array(np.arange(1000))})
    fps = content_fingerprint(ta, ["v"])
    assert len(np.unique(fps)) == 1000


def test_cap_per_key_quota_and_null_group():
    from fineweb2_ro_ray.stages.mixing import cap_per_key

    t = pa.table(
        {
            "dom": ["a", "a", "a", "b", None, None, None, "b"],
            "id": [5, 1, 3, 9, 4, 2, 6, 7],
        }
    )
    out = (
        cap_per_key(rd.from_arrow(t), "dom", ["id"], 2)
        .to_pandas()
        .sort_values(["dom", "id"], na_position="last")
        .reset_index(drop=True)
    )
    assert [
        (d if isinstance(d, str) else None, i)
        for d, i in zip(out["dom"], out["id"])
    ] == [("a", 1), ("a", 3), ("b", 7), ("b", 9), (None, 2), (None, 4)]


def test_apply_changeset_edges():
    """Duplicate-change refusal; delete of a missing key is a no-op;
    insert + upsert + delete coexist; layout invariance."""
    from fineweb2_ro_ray.stages.versioning import apply_changeset

    base = pa.table({"k": [1, 2, 3], "v": ["a", "b", "c"]})
    ch = pa.table(
        {
            "k": [2, 4, 9],
            "v": ["B", "d", None],
            "op": ["upsert", "upsert", "delete"],  # 9 never existed
        }
    )
    for nb in (1, 3):
        got = (
            apply_changeset(
                rd.from_arrow(base).repartition(nb),
                rd.from_arrow(ch),
                key="k",
            )
            .to_pandas()
            .sort_values("k", ignore_index=True)
        )
        assert got.values.tolist() == [[1, "a"], [2, "B"], [3, "c"], [4, "d"]]
    dup = pa.table(
        {"k": [5, 5], "v": ["x", "y"], "op": ["upsert", "upsert"]}
    )
    with pytest.raises(Exception, match="multiple change rows"):
        apply_changeset(
            rd.from_arrow(base), rd.from_arrow(dup), key="k"
        ).to_pandas()


def test_matview_refresh_equals_rebuild():
    """refresh(build(base), deltas) ≡ build(merged) on randomized
    tables; key drop at zero; new-key appearance; untouched-partition
    behavior (file mtimes unchanged for partitions with no deltas)."""
    import os
    import time

    from fineweb2_ro_ray.stages.matview import (
        build_counts_view,
        read_counts_view,
        refresh_counts_view,
    )

    rng = np.random.default_rng(11)
    keys = [f"k{i}" for i in range(20)]
    base = pa.table(
        {"g": [keys[i] for i in rng.integers(0, 20, 300)]}
    )
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "view")
        build_counts_view(rd.from_arrow(base), p, "g", n_parts=8)
        # deltas: remove ALL of k0 (drop to zero), add brand-new key
        n_k0 = base.to_pandas().g.eq("k0").sum()
        deltas = pa.table(
            {
                "key": ["k0", "brand_new", "k1"],
                "dn": pa.array([-int(n_k0), 5, 2], pa.int64()),
            }
        )
        import glob as _g

        before = {
            f: os.path.getmtime(f)
            for f in _g.glob(os.path.join(p, "part=*", "counts.parquet"))
        }
        time.sleep(0.05)
        refresh_counts_view(p, rd.from_arrow(deltas))
        got = read_counts_view(p).to_pandas()
        # rebuild oracle
        df = base.to_pandas().g.value_counts().to_dict()
        df.pop("k0")
        df["brand_new"] = 5
        df["k1"] = df.get("k1", 0) + 2
        want = sorted(df.items())
        assert list(map(tuple, got.values.tolist())) == want
        # partitions that received no delta were not rewritten
        touched = 0
        for f, m in before.items():
            if os.path.getmtime(f) != m:
                touched += 1
        assert touched <= 3  # at most the partitions of the 3 delta keys
