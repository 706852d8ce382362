"""Resumable partitioned output: manifest, lineage, resume-after-failure
(the reference's shard-existence idempotency re-created per partition,
``/root/reference/fineweb/big_inference.py:296-303``)."""

from __future__ import annotations

import glob
import json
import os
import shutil

import pyarrow.parquet as pq
import pytest

from fineweb2_ro_ray.pipelines.quality_filter import annotate
from fineweb2_ro_ray.sources.synth import write_transcripts
from fineweb2_ro_ray.state.checkpoint import Manifest, partition_of, run_resumable


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ckpt") / "in")
    n = write_transcripts(path, 60, seed=11, rows_per_file=1000)
    return path, n


def _total_rows(out: str) -> int:
    return sum(
        pq.read_metadata(f).num_rows for f in glob.glob(os.path.join(out, "part=*", "*.parquet"))
    )


def test_run_and_resume(corpus, tmp_path):
    inp, n = corpus
    out = str(tmp_path / "out")
    s1 = run_resumable(inp, out, lambda ds: annotate(ds, batch_size=512), n_groups=3)
    assert s1["groups_run"] == 3 and s1["rows"] == n
    assert _total_rows(out) == n
    recs = [json.loads(l) for l in open(os.path.join(out, "manifest.jsonl"))]
    assert len(recs) == 3
    for r in recs:
        assert r["status"] == "committed"
        assert "drop_reasons" in r and "input_fingerprint" in r and r["rows"] > 0

    # no-op rerun: everything skipped
    s2 = run_resumable(inp, out, lambda ds: annotate(ds, batch_size=512), n_groups=3)
    assert s2 == {"groups_run": 0, "groups_skipped": 3, "rows": 0, "kept": 0}

    # simulate a failed partition: drop dir + manifest line → only that
    # group is recomputed and totals are restored exactly
    shutil.rmtree(os.path.join(out, "part=1"))
    keep = [r for r in recs if r["group"] != 1]
    with open(os.path.join(out, "manifest.jsonl"), "w") as f:
        for r in keep:
            f.write(json.dumps(r) + "\n")
    s3 = run_resumable(inp, out, lambda ds: annotate(ds, batch_size=512), n_groups=3)
    assert s3["groups_run"] == 1 and s3["groups_skipped"] == 2
    assert _total_rows(out) == n


def test_partitioning_is_stable_and_total(corpus):
    inp, n = corpus
    # every conv_id maps to exactly one group — the invariant that makes
    # group-wise reassembly correct
    assert partition_of("conv-00000001", 8) == partition_of("conv-00000001", 8)
    assert 0 <= partition_of("anything", 5) < 5


def test_manifest_roundtrip(tmp_path):
    m = Manifest(str(tmp_path))
    m.record({"group": 0, "status": "committed"})
    m.record({"group": 1, "status": "failed"})
    assert m.completed_groups() == {0}


def test_resumable_conversation_output(corpus, tmp_path):
    """Conversation-level resumable output: each hash group holds whole
    conversations, so reassembly inside the per-group build is valid."""
    from fineweb2_ro_ray.pipelines.quality_filter import reassemble

    inp, n = corpus
    out = str(tmp_path / "conv_out")
    s = run_resumable(
        inp,
        out,
        lambda ds: reassemble(annotate(ds, batch_size=512), n_partitions=64),
        n_groups=3,
        metrics_cols=("conv_keep",),
    )
    assert s["groups_run"] == 3
    import glob

    import pyarrow.parquet as pq

    convs = sum(
        pq.read_metadata(f).num_rows
        for f in glob.glob(os.path.join(out, "part=*", "*.parquet"))
    )
    assert convs == 60  # one row per conversation, none lost across groups


def test_input_read_once_per_run(corpus, tmp_path, monkeypatch):
    """The 100-TB read-amplification guarantee: the ORIGINAL input files
    are scanned exactly once per completed run (the staging pass);
    per-group work reads only its own staging partition."""
    import ray.data as rd

    from fineweb2_ro_ray.state import checkpoint as ck

    inp, n = corpus
    out = str(tmp_path / "scan_out")
    input_files = set(ck._list_parquet(inp))
    counts = {"input": 0, "other": 0}
    real_read = rd.read_parquet

    def counting_read(paths, *a, **kw):
        plist = paths if isinstance(paths, list) else [paths]
        if input_files & set(plist):
            counts["input"] += 1
        else:
            counts["other"] += 1
        return real_read(paths, *a, **kw)

    monkeypatch.setattr(rd, "read_parquet", counting_read)
    s = run_resumable(inp, out, lambda ds: annotate(ds, batch_size=512), n_groups=4)
    assert s["groups_run"] == 4
    assert counts["input"] == 1  # one staging scan, not n_groups scans
    assert counts["other"] == 4  # one staging-partition read per group
    assert _total_rows(out) == n


def test_resume_lineage_validation(corpus, tmp_path):
    """A committed manifest line is only honoured when the recorded
    input fingerprint matches AND the partition directory exists
    (ADVICE r1: stale manifests must not mask missing/changed data)."""
    inp, n = corpus
    out = str(tmp_path / "lineage_out")
    run_resumable(inp, out, lambda ds: annotate(ds, batch_size=512), n_groups=2)

    # deleted part dir, manifest intact -> that group is recomputed
    shutil.rmtree(os.path.join(out, "part=0"))
    s = run_resumable(inp, out, lambda ds: annotate(ds, batch_size=512), n_groups=2)
    assert s["groups_run"] == 1 and s["groups_skipped"] == 1
    assert _total_rows(out) == n

    # changed input (new fingerprint) -> everything is recomputed
    extra = write_transcripts(inp + "_v2", 10, seed=12, rows_per_file=1000)
    s2 = run_resumable(
        inp + "_v2", out, lambda ds: annotate(ds, batch_size=512), n_groups=2
    )
    assert s2["groups_run"] == 2 and s2["groups_skipped"] == 0
    assert _total_rows(out) == extra


def test_interrupted_staging_is_redone(corpus, tmp_path):
    """A staging pass that died before writing its .complete marker is
    discarded and redone (no torn staging is ever trusted)."""
    inp, n = corpus
    out = str(tmp_path / "stage_out")
    from fineweb2_ro_ray.state.checkpoint import _input_fingerprint, _list_parquet

    fp = _input_fingerprint(_list_parquet(inp))
    staging = os.path.join(out, f".staging-{fp}")
    # simulate a torn staging dir from a crashed run: partial garbage,
    # no marker
    os.makedirs(os.path.join(staging, "part=0"), exist_ok=True)
    with open(os.path.join(staging, "part=0", "torn.parquet"), "w") as f:
        f.write("not parquet")
    s = run_resumable(inp, out, lambda ds: annotate(ds, batch_size=512), n_groups=2)
    assert s["groups_run"] == 2 and s["rows"] == n
    assert _total_rows(out) == n
    assert not os.path.isdir(staging)  # cleaned up after full commit
