"""Disk-segment exchange mode (Spark-ESS-style map output files):
output equality vs the object-store wiring on every shape the exchange
supports, file-format invariants (atomicity — no .tmp leftovers;
offset index consistency), empty-partition schema recovery, and fault
tolerance (SIGKILL of a split and of a reduce worker mid-run).

The segment mode exists to collapse the driver's transient slice-ref
matrix to M + P (no M x P term at any scale); locally it never
auto-enables — these tests force it via the ``segment_dir`` parameter
/ ``FW2_EXCHANGE_SEGMENT_DIR`` env and assert bit-equality with the
default wiring.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from fineweb2_ro_ray.stages import exchange
from fineweb2_ro_ray.stages.exchange import hash_exchange_map_groups


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
    return rd.from_arrow(t).repartition(40)


def _mk_aggs():
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


def test_segment_equals_objectstore_all_shapes(ray_session, monkeypatch, tmp_path):
    monkeypatch.setenv("FW2_EXCHANGE_SPLIT_BYTES", "1")  # many map groups
    ds = _mk_ds()
    agg_pa, agg_pd = _mk_aggs()
    seg = str(tmp_path / "segs")

    # pyarrow body, pinned schema, single string key
    schema = pa.schema(
        [("k", pa.string()), ("v_sum", pa.float64()), ("v_count", pa.int64())]
    )
    base = _collect(
        hash_exchange_map_groups(
            ds, agg_pa, key="k", n_reducers=13, out_schema=schema,
            batch_format="pyarrow",
        ),
        ["k"],
    )
    assert len(base) == 37
    got = _collect(
        hash_exchange_map_groups(
            ds, agg_pa, key="k", n_reducers=13, out_schema=schema,
            batch_format="pyarrow", segment_dir=seg,
        ),
        ["k"],
    )
    pd.testing.assert_frame_equal(got, base)

    # pandas body, NO pinned schema (row-count sync path), multi-col
    # key, empty partitions (n_reducers >> key cardinality)
    base2 = _collect(
        hash_exchange_map_groups(ds, agg_pd, key=["k", "g"], n_reducers=64),
        ["k", "g"],
    )
    got2 = _collect(
        hash_exchange_map_groups(
            ds, agg_pd, key=["k", "g"], n_reducers=64, segment_dir=seg
        ),
        ["k", "g"],
    )
    pd.testing.assert_frame_equal(got2, base2)

    # deferred mode too (byte-auto-sized reducers)
    got3 = _collect(
        hash_exchange_map_groups(
            ds, agg_pd, key=["k", "g"], segment_dir=seg
        ),
        ["k", "g"],
    )
    pd.testing.assert_frame_equal(got3, base2)

    # file invariants: every exchange left only seg-*.data(+.idx), no
    # .tmp orphans, and every .idx is a monotone int64 offset array
    # whose last entry equals the data file size
    for root, _dirs, files in os.walk(seg):
        for f in files:
            assert not f.startswith(".tmp-"), f"orphan tmp file {f}"
        for f in files:
            if f.endswith(".data"):
                idx = np.fromfile(
                    os.path.join(root, f + ".idx"), dtype="<i8"
                )
                assert (np.diff(idx) >= 0).all()
                assert idx[-1] == os.path.getsize(os.path.join(root, f))


def test_segment_env_var_switches_engine(ray_session, monkeypatch, tmp_path):
    """FW2_EXCHANGE_SEGMENT_DIR routes exchanges through segment files
    without any call-site change (the engine-wide switch)."""
    ds = _mk_ds(n_rows=800, n_keys=11)
    agg_pa, _ = _mk_aggs()
    schema = pa.schema(
        [("k", pa.string()), ("v_sum", pa.float64()), ("v_count", pa.int64())]
    )
    base = _collect(
        hash_exchange_map_groups(
            ds, agg_pa, key="k", n_reducers=5, out_schema=schema,
            batch_format="pyarrow",
        ),
        ["k"],
    )
    monkeypatch.setenv("FW2_EXCHANGE_SEGMENT_DIR", str(tmp_path / "env_segs"))
    got = _collect(
        hash_exchange_map_groups(
            ds, agg_pa, key="k", n_reducers=5, out_schema=schema,
            batch_format="pyarrow",
        ),
        ["k"],
    )
    pd.testing.assert_frame_equal(got, base)
    # segments were actually written
    sub = os.listdir(tmp_path / "env_segs")
    assert sub and any(s.startswith("exch-") for s in sub)


def test_segment_all_empty_partition_keeps_schema(ray_session, tmp_path):
    """A partition whose every slice is empty reconstructs a 0-row
    table with the TRUE schema from the segment's leading schema-only
    stream (unpinned-schema path)."""
    t = pa.table({"k": pa.array(["a", "a", "b"]), "v": [1.0, 2.0, 3.0]})
    ds = rd.from_arrow(t)

    def ident(df: pd.DataFrame) -> pd.DataFrame:
        return df

    out = hash_exchange_map_groups(
        ds, ident, key="k", n_reducers=32, segment_dir=str(tmp_path)
    )
    got = out.to_pandas().sort_values(["k", "v"]).reset_index(drop=True)
    assert list(got["k"]) == ["a", "a", "b"]
    assert list(got["v"]) == [1.0, 2.0, 3.0]


def test_segment_fault_injection(ray_session, monkeypatch, tmp_path):
    """SIGKILL one split worker and (separately) one reduce worker
    mid-run: task retry reproduces the clean output exactly. A killed
    split leaves at most a .tmp orphan (never a half-visible segment);
    its retry writes a fresh uuid file."""
    monkeypatch.setenv("FW2_EXCHANGE_SPLIT_BYTES", "1")
    ds = _mk_ds(n_rows=2000, n_keys=23, seed=7)
    agg_pa, _ = _mk_aggs()
    schema = pa.schema(
        [("k", pa.string()), ("v_sum", pa.float64()), ("v_count", pa.int64())]
    )

    def run(seg: str) -> pd.DataFrame:
        return _collect(
            hash_exchange_map_groups(
                ds, agg_pa, key="k", n_reducers=9, out_schema=schema,
                batch_format="pyarrow", segment_dir=seg,
            ),
            ["k"],
        )

    clean = run(str(tmp_path / "clean"))
    for stage in ("split", "reduce"):
        marker = str(tmp_path / f"fp-{stage}")
        monkeypatch.setattr(
            exchange, "_TEST_FAILPOINT", (stage, marker), raising=True
        )
        try:
            got = run(str(tmp_path / f"faulty-{stage}"))
        finally:
            monkeypatch.setattr(exchange, "_TEST_FAILPOINT", None, raising=True)
        assert os.path.exists(marker), f"failpoint for {stage} never fired"
        pd.testing.assert_frame_equal(got, clean)
    # no half-visible segment: every visible .data has a matching .idx
    for root, _dirs, files in os.walk(tmp_path):
        names = set(files)
        for f in files:
            if f.endswith(".data") and not f.startswith(".tmp-"):
                assert f + ".idx" in names


def test_segment_env_forced_flagship_identical(ray_session, monkeypatch, tmp_path):
    """FW2_EXCHANGE_SEGMENT_DIR routes EVERY wide op in the flagship
    through segment files; output must equal the default run."""
    import pandas as _pd

    from fineweb2_ro_ray.pipelines.quality_filter import (
        annotate,
        read_transcripts,
        reassemble,
    )
    from fineweb2_ro_ray.sources.synth import write_transcripts

    src = str(tmp_path / "in")
    write_transcripts(src, 150, seed=11)

    def run() -> _pd.DataFrame:
        out = reassemble(annotate(read_transcripts(src))).to_pandas()
        return out.sort_values("conv_id").reset_index(drop=True)

    clean = run()
    assert len(clean) == 150
    monkeypatch.setenv("FW2_EXCHANGE_SEGMENT_DIR", str(tmp_path / "segs"))
    monkeypatch.setenv("FW2_EXCHANGE_SPLIT_BYTES", "65536")
    _pd.testing.assert_frame_equal(run(), clean)
