"""Fault-injection tests for the raw-Ray hash exchange.

The exchange bypasses Ray Data's map operators, so its fault paths are
plain Ray task semantics: split / merge / reduce are stateless
idempotent tasks with default ``max_retries=3``; a SIGKILL'd worker's
task is re-executed automatically, and a lost intermediate object is
rebuilt by lineage re-running its producer. These tests kill one
worker per stage mid-run (via the exchange's ``_TEST_FAILPOINT`` hook,
claimed atomically so exactly one task instance dies) and assert the
flagship output is identical to the clean run.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from fineweb2_ro_ray.stages import exchange


def _flagship(tmp_in: str) -> pd.DataFrame:
    from fineweb2_ro_ray.pipelines.quality_filter import (
        annotate,
        read_transcripts,
        reassemble,
    )

    out = reassemble(annotate(read_transcripts(tmp_in))).to_pandas()
    return out.sort_values("conv_id").reset_index(drop=True)


def _with_failpoint(stage: str, marker: str, fn):
    exchange._TEST_FAILPOINT = (stage, marker)
    try:
        return fn()
    finally:
        exchange._TEST_FAILPOINT = None


def test_flagship_survives_split_and_reduce_worker_death(
    ray_session, tmp_path
):
    """Kill one _split_block worker and (separately) one
    _reduce_partition worker mid-flagship; output must equal the clean
    run exactly (values, dtypes, row count)."""
    from fineweb2_ro_ray.sources.synth import write_transcripts

    src = str(tmp_path / "in")
    write_transcripts(src, 120, seed=21)
    clean = _flagship(src)
    assert len(clean) == 120

    for stage in ("split", "reduce"):
        marker = str(tmp_path / f"died_{stage}")
        got = _with_failpoint(stage, marker, lambda: _flagship(src))
        assert os.path.exists(marker), f"failpoint never fired for {stage}"
        pd.testing.assert_frame_equal(got, clean)


def test_tree_merge_survives_merge_worker_death(
    ray_session, tmp_path, monkeypatch
):
    """Force the multi-level tree (one split per upstream block, fan-in
    2) and kill one _merge_slices worker; the keyed aggregate must be
    unchanged. Also covers lineage reconstruction: the dead merge's
    retry re-fetches (or re-creates) its input slices."""
    monkeypatch.setenv("FW2_EXCHANGE_SPLIT_BYTES", "0")
    monkeypatch.setenv("FW2_EXCHANGE_MERGE_FANIN", "2")

    rng = np.random.default_rng(3)
    frames = [
        pd.DataFrame(
            {
                "k": [f"g{int(x)}" for x in rng.integers(0, 11, 30)],
                "v": rng.integers(0, 100, 30).astype(np.int64),
            }
        )
        for _ in range(24)
    ]

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("k", as_index=False)["v"].sum()

    def run() -> pd.DataFrame:
        ds = rd.from_pandas(frames)
        return (
            exchange.hash_exchange_map_groups(ds, per_part, key="k")
            .to_pandas()
            .sort_values("k")
            .reset_index(drop=True)
        )

    clean = run()
    marker = str(tmp_path / "died_merge")
    got = _with_failpoint("merge", marker, run)
    assert os.path.exists(marker), "merge failpoint never fired"
    pd.testing.assert_frame_equal(got, clean)
    want = (
        pd.concat(frames)
        .groupby("k", as_index=False)["v"]
        .sum()
        .sort_values("k")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
