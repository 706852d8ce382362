"""Tests for stages.incremental — persisted cross-snapshot hash index."""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from fineweb2_ro_ray.stages.incremental import (
    _hex_prefix_uint,
    build_hash_index,
    filter_against_index,
    load_meta,
    update_index,
)


def _ds(ids, texts):
    return rd.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts, pa.string())})
    )


def _kept_ids(ds):
    return sorted(ds.to_pandas()["doc_id"].tolist())


def test_hex_prefix_uint_matches_int():
    import hashlib

    hs = np.array(
        [hashlib.md5(str(i).encode()).hexdigest() for i in range(200)], dtype=object
    )
    for n in (8, 16):
        got = _hex_prefix_uint(hs, n)
        want = np.array([int(h[:n], 16) for h in hs], np.uint64)
        assert np.array_equal(got, want)


def test_build_and_filter_exact(tmp_path):
    idx = str(tmp_path / "idx")
    old = _ds([0, 1, 2], ["alpha", "beta", "gamma"])
    stats = build_hash_index(old, idx, n_parts=4)
    assert stats["n_hashes_indexed"] == 3
    # new snapshot: 'beta' is a cross-snapshot dup; '' and NULL are not
    new = _ds([10, 11, 12, 13, 14], ["beta", "delta", "", None, "alpha"])
    kept = filter_against_index(new, idx)
    assert _kept_ids(kept) == [11, 12, 13]  # NULL text always kept
    # bloom fast-path and exact path agree
    kept2 = filter_against_index(new, idx, use_bloom=False)
    assert _kept_ids(kept2) == [11, 12, 13]


def test_update_appends_only_new_hashes(tmp_path):
    idx = str(tmp_path / "idx")
    build_hash_index(_ds([0, 1], ["a", "b"]), idx, n_parts=4, snapshot="s0")
    up = update_index(_ds([2, 3, 4], ["b", "c", "c"]), idx, snapshot="s1")
    assert up["n_hashes_added"] == 1  # only 'c'; 'b' already indexed
    kept = filter_against_index(_ds([9, 10, 11], ["a", "c", "d"]), idx)
    assert _kept_ids(kept) == [11]
    assert load_meta(idx)["snapshots"] == ["s0", "s1"]
    # snapshot names must be unique
    with pytest.raises(ValueError):
        update_index(_ds([5], ["e"]), idx, snapshot="s1")


def test_partition_files_disjoint_and_idempotent_names(tmp_path):
    idx = str(tmp_path / "idx")
    texts = [f"t{i}" for i in range(100)]
    build_hash_index(_ds(list(range(100)), texts), idx, n_parts=8, snapshot="s0")
    update_index(_ds(list(range(100, 150)), texts[:25] + [f"u{i}" for i in range(25)]),
                 idx, snapshot="s1")
    import pyarrow.parquet as pq

    all_hashes: list[str] = []
    for f in glob.glob(os.path.join(idx, "part=*", "*.parquet")):
        part = int(os.path.basename(os.path.dirname(f)).split("=")[1])
        col = pq.read_table(f)["text_md5"].to_pylist()
        all_hashes.extend(col)
        # every hash landed in the partition its own prefix names
        assert all(int(h[:8], 16) % 8 == part for h in col)
    # disjoint across snapshots and partitions: 100 old + 25 new
    assert len(all_hashes) == len(set(all_hashes)) == 125


def test_filter_matches_naive_python(tmp_path):
    rng = np.random.default_rng(7)
    old_texts = [f"doc {i % 37}" for i in range(120)]
    new_texts = [f"doc {int(v)}" for v in rng.integers(0, 80, size=90)]
    idx = str(tmp_path / "idx")
    build_hash_index(_ds(list(range(120)), old_texts), idx, n_parts=8)
    kept = filter_against_index(_ds(list(range(90)), new_texts), idx)
    want = sorted(i for i, t in enumerate(new_texts) if t not in set(old_texts))
    assert _kept_ids(kept) == want


def test_compact_preserves_membership(tmp_path):
    from fineweb2_ro_ray.stages.incremental import compact_index, index_stats

    idx = str(tmp_path / "idx")
    build_hash_index(_ds([0, 1, 2], ["a", "b", "c"]), idx, n_parts=4, snapshot="s0")
    update_index(_ds([3, 4], ["d", "e"]), idx, snapshot="s1")
    update_index(_ds([5], ["f"]), idx, snapshot="s2")
    before = index_stats(idx)
    probe = _ds(list(range(8)), ["a", "b", "c", "d", "e", "f", "g", "h"])
    kept_before = _kept_ids(filter_against_index(probe, idx))
    r = compact_index(idx)
    after = index_stats(idx)
    assert r["files_removed"] > 0
    assert after["n_files"] <= before["n_files"] - r["files_removed"]
    assert after["n_hashes"] == 6  # distinct hashes unchanged
    assert _kept_ids(filter_against_index(probe, idx)) == kept_before == [6, 7]
    # idempotent: second compaction is a no-op
    r2 = compact_index(idx)
    assert r2["files_removed"] == 0


def test_index_cli_chain(tmp_path):
    """build -> filter -> update -> compact -> stats via the CLI module
    (in-process so it reuses the session Ray instead of spawning one)."""
    import pyarrow.dataset as pds
    import pyarrow.parquet as pq_mod

    from fineweb2_ro_ray.index_cli import main as cli

    d0, d1 = tmp_path / "in0", tmp_path / "in1"
    d0.mkdir(); d1.mkdir()
    pq_mod.write_table(
        pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()), "text": ["a", "b", "c"]}),
        str(d0 / "p.parquet"),
    )
    pq_mod.write_table(
        pa.table({"doc_id": pa.array([4, 5, 6], pa.int64()), "text": ["b", "d", "e"]}),
        str(d1 / "p.parquet"),
    )
    idx, out = str(tmp_path / "idx"), str(tmp_path / "out")
    assert cli(["build", "--input", str(d0), "--index", idx, "--n-parts", "8"]) == 0
    assert cli(["filter", "--input", str(d1), "--index", idx, "--output", out]) == 0
    assert sorted(pds.dataset(out).to_table()["doc_id"].to_pylist()) == [5, 6]
    assert cli(["update", "--input", out, "--index", idx, "--snapshot", "d1"]) == 0
    assert cli(["compact", "--index", idx]) == 0
    assert cli(["stats", "--index", idx]) == 0
    from fineweb2_ro_ray.stages.incremental import index_stats

    st = index_stats(idx)
    assert st["n_hashes"] == 5 and st["snapshots"] == ["s0000", "d1"]
