"""Grouped-returns exchange wiring: output equality vs the ungrouped
path, auto-width selection, and fault tolerance through the new
``_split_block_grouped`` / ``_ungroup_merge`` tasks.

The grouped wiring exists to bound the driver's transient slice-ref
matrix (M x P → max(M x ⌈P/W⌉, (M/F) x P)); locally it never
auto-enables (M x P is tiny), so these tests force it via the
``group_width`` parameter / ``FW2_EXCHANGE_GROUP_WIDTH`` env and
assert bit-equality with the default wiring on every shape the
exchange supports: single string key, multi-column key, pinned and
unpinned output schema, pyarrow and pandas batch formats, empty
partitions, and merge-tree depth > 1 (fan-in forced to 2).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from fineweb2_ro_ray.stages import exchange
from fineweb2_ro_ray.stages.exchange import (
    _auto_group_width,
    hash_exchange_map_groups,
)


def _mk_ds(n_rows: int = 5000, n_keys: int = 37, seed: int = 3) -> rd.Dataset:
    rng = np.random.default_rng(seed)
    t = pa.table(
        {
            "k": pa.array(
                [f"key-{i}" for i in rng.integers(0, n_keys, n_rows)]
            ),
            "g": pa.array(rng.integers(0, 5, n_rows).astype(np.int64)),
            "v": pa.array(rng.normal(size=n_rows)),
        }
    )
    # many small blocks => many map groups once split-bytes is tiny
    return rd.from_arrow(t).repartition(40)


def _mk_aggs():
    """Reduce bodies built as closures so cloudpickle ships them by
    value (a module-level test function isn't importable in workers)."""

    def agg_pa(t: pa.Table) -> pa.Table:
        g = t.group_by("k").aggregate([("v", "sum"), ("v", "count")])
        return g.select(["k", "v_sum", "v_count"]).sort_by("k")

    def agg_pd(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby(["k", "g"], as_index=False)["v"]
            .sum()
            .sort_values(["k", "g"])
            .reset_index(drop=True)
        )

    return agg_pa, agg_pd


def _collect(ds: rd.Dataset, by: list[str]) -> pd.DataFrame:
    return ds.to_pandas().sort_values(by).reset_index(drop=True)


def test_grouped_equals_ungrouped_all_shapes(ray_session, monkeypatch):
    # deep merge tree + many map groups through both wirings
    monkeypatch.setenv("FW2_EXCHANGE_SPLIT_BYTES", "1")
    monkeypatch.setenv("FW2_EXCHANGE_MERGE_FANIN", "2")
    ds = _mk_ds()
    agg_pa, agg_pd = _mk_aggs()

    # pyarrow body, pinned schema, string key
    schema = pa.schema(
        [("k", pa.string()), ("v_sum", pa.float64()), ("v_count", pa.int64())]
    )
    base = _collect(
        hash_exchange_map_groups(
            ds, agg_pa, key="k", n_reducers=13, out_schema=schema,
            batch_format="pyarrow", group_width=1,
        ),
        ["k"],
    )
    assert len(base) == 37
    for w in (2, 3, 6):  # 13 % 3 == 1 exercises the merged trailing group
        got = _collect(
            hash_exchange_map_groups(
                ds, agg_pa, key="k", n_reducers=13, out_schema=schema,
                batch_format="pyarrow", group_width=w,
            ),
            ["k"],
        )
        pd.testing.assert_frame_equal(got, base)

    # pandas body, NO pinned schema (row-count sync path), multi-col key,
    # empty partitions (n_reducers >> key cardinality)
    base2 = _collect(
        hash_exchange_map_groups(
            ds, agg_pd, key=["k", "g"], n_reducers=64, group_width=1
        ),
        ["k", "g"],
    )
    got2 = _collect(
        hash_exchange_map_groups(
            ds, agg_pd, key=["k", "g"], n_reducers=64, group_width=7
        ),
        ["k", "g"],
    )
    pd.testing.assert_frame_equal(got2, base2)


def test_grouped_env_forced_flagship_identical(ray_session, monkeypatch, tmp_path):
    """FW2_EXCHANGE_GROUP_WIDTH routes EVERY wide op in the flagship
    through the grouped wiring; output must equal the default run."""
    from fineweb2_ro_ray.pipelines.quality_filter import (
        annotate,
        read_transcripts,
        reassemble,
    )
    from fineweb2_ro_ray.sources.synth import write_transcripts

    src = str(tmp_path / "in")
    write_transcripts(src, 150, seed=11)

    def run() -> pd.DataFrame:
        out = reassemble(annotate(read_transcripts(src))).to_pandas()
        return out.sort_values("conv_id").reset_index(drop=True)

    clean = run()
    assert len(clean) == 150
    monkeypatch.setenv("FW2_EXCHANGE_GROUP_WIDTH", "3")
    monkeypatch.setenv("FW2_EXCHANGE_SPLIT_BYTES", "65536")
    pd.testing.assert_frame_equal(run(), clean)


def test_grouped_survives_split_merge_reduce_death(ray_session, monkeypatch, tmp_path):
    """SIGKILL one worker per stage (split / ungroup-merge / reduce)
    mid-run through the grouped wiring; retries must reproduce the
    clean output exactly."""
    monkeypatch.setenv("FW2_EXCHANGE_SPLIT_BYTES", "1")
    monkeypatch.setenv("FW2_EXCHANGE_MERGE_FANIN", "2")
    ds = _mk_ds(2000, 23, seed=9)
    agg_pa, _ = _mk_aggs()
    schema = pa.schema(
        [("k", pa.string()), ("v_sum", pa.float64()), ("v_count", pa.int64())]
    )

    def run() -> pd.DataFrame:
        return _collect(
            hash_exchange_map_groups(
                ds, agg_pa, key="k", n_reducers=11, out_schema=schema,
                batch_format="pyarrow", group_width=4,
            ),
            ["k"],
        )

    clean = run()
    assert len(clean) == 23
    for stage in ("split", "merge", "reduce"):
        marker = str(tmp_path / f"died_grouped_{stage}")
        exchange._TEST_FAILPOINT = (stage, marker)
        try:
            got = run()
        finally:
            exchange._TEST_FAILPOINT = None
        assert os.path.exists(marker), f"failpoint never fired for {stage}"
        pd.testing.assert_frame_equal(got, clean)


def test_auto_group_width_rules(monkeypatch):
    monkeypatch.delenv("FW2_EXCHANGE_GROUP_WIDTH", raising=False)
    monkeypatch.delenv("FW2_EXCHANGE_DRIVER_REFS_MAX", raising=False)
    # under budget: ungrouped
    assert _auto_group_width(100, 64, fanin=64) == 1
    # 100-TB shape: M=1.6e6, P=4e5 => W caps at fan-in
    assert _auto_group_width(1_600_000, 400_000, fanin=64) == 64
    # just over budget: smallest sufficient W
    monkeypatch.setenv("FW2_EXCHANGE_DRIVER_REFS_MAX", "1000")
    assert _auto_group_width(100, 30, fanin=64) == 3
    # never more than P/2 (num_returns needs >= 2 groups)
    assert _auto_group_width(10_000, 8, fanin=64) == 4
    # env force wins, still clamped to P/2
    monkeypatch.setenv("FW2_EXCHANGE_GROUP_WIDTH", "50")
    assert _auto_group_width(10, 12, fanin=64) == 6
