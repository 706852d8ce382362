"""Resumable partitioned output with per-partition lineage.

Ray Data has no job-level resume, so we re-create the reference's
file-existence idempotency (skip a shard when its output exists:
``/root/reference/fineweb/big_inference.py:296-303``, ``ro_vs_eng/
fineweb2_jql.py:61-64``, ``small_model_inference/shard_manager.py:19-26``)
at the granularity of *hash partitions of the conversation key*:

- the conversation key is hashed (crc32, engine-pinned) into
  ``n_partitions`` buckets; a *partition group* is the unit of one
  streaming sub-job, written to ``out/part={g}/`` via temp-dir +
  atomic rename, then recorded in ``manifest.jsonl`` with lineage
  (input fingerprint, row/keep counts, drop-reason histogram, wall
  seconds);
- on restart, a group is skipped only when its manifest record is
  committed, its recorded ``input_fingerprint`` matches the CURRENT
  input, and its output directory still exists — changed input or a
  deleted partition directory forces recomputation (lineage check);
- the input is scanned ONCE per run: a staging pass writes the raw
  rows hive-partitioned by group (``.staging-<fp>/part=g/``), and each
  group's sub-job reads only its own staging partition.  (Round 1
  filtered the full input per group — n_groups full scans; at 100 TB
  with 256 groups that is 256 scans of the corpus. Now it is 1 + 1.)

At 100 TB this is the resume story: partition count is chosen so one
group is minutes of work, and a failed run loses at most one group
(or, at worst, the staging pass, which carries no model compute).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import zlib
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

import ray.data


def partition_of(conv_id: str, n_partitions: int) -> int:
    """Engine-pinned partition hash (crc32 of utf-8 key)."""
    return zlib.crc32(conv_id.encode("utf-8")) % n_partitions


def add_partition_column(
    batch: pa.Table, n_partitions: int, key: str = "conv_id"
) -> pa.Table:
    """Vectorized-ish partition assignment: crc32 per *unique* key in the
    batch, broadcast back via dictionary encoding (cheap because unique
    keys per batch << rows for multi-turn conversations)."""
    import pyarrow.compute as pc

    col = batch[key]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    dic = col.dictionary_encode()
    uniq = dic.dictionary.to_pylist()
    lut = np.array(
        [zlib.crc32(u.encode("utf-8")) % n_partitions for u in uniq], dtype=np.int32
    )
    # NULL keys form a real group (e.g. md5(NULL) in dedup) and land
    # deterministically in partition 0; an ALL-null batch has an empty
    # dictionary, so nothing may index lut at all
    if len(lut) == 0:
        part = np.zeros(batch.num_rows, dtype=np.int32)
    else:
        valid = pc.is_valid(dic.indices).to_numpy(zero_copy_only=False)
        idx = pc.fill_null(dic.indices, 0).to_numpy(zero_copy_only=False)
        part = lut[idx.astype(np.int64)]
        part[~valid] = 0
    return batch.append_column("part", pa.array(part, pa.int32()))


@dataclass
class Manifest:
    path: str

    def _file(self) -> str:
        return os.path.join(self.path, "manifest.jsonl")

    def completed_records(self) -> dict[int, dict]:
        """Latest committed record per group (later lines win)."""
        done: dict[int, dict] = {}
        f = self._file()
        if os.path.exists(f):
            with open(f) as fh:
                for line in fh:
                    rec = json.loads(line)
                    if rec.get("status") == "committed":
                        done[rec["group"]] = rec
                    elif rec.get("group") in done:
                        del done[rec["group"]]
        return done

    def completed_groups(self) -> set[int]:
        return set(self.completed_records())

    def record(self, rec: dict) -> None:
        os.makedirs(self.path, exist_ok=True)
        with open(self._file(), "a") as fh:
            fh.write(json.dumps(rec, sort_keys=True) + "\n")


def _input_fingerprint(paths: list[str]) -> str:
    """Cheap input lineage: sorted (path, size, mtime) crc — identifies
    *which* input produced a partition without reading it."""
    h = 0
    for p in sorted(paths):
        st = os.stat(p)
        h = zlib.crc32(f"{p}:{st.st_size}:{int(st.st_mtime)}".encode(), h)
    return f"{h:08x}"


def _list_parquet(input_path: str | list[str]) -> list[str]:
    if isinstance(input_path, list):
        return list(input_path)
    if os.path.isdir(input_path):
        return [
            os.path.join(input_path, f)
            for f in sorted(os.listdir(input_path))
            if f.endswith(".parquet")
        ]
    return [input_path]


def _stage_input(
    files: list[str], staging: str, n_groups: int, key: str
) -> None:
    """ONE pass over the input: hash each row's ``key`` into its group
    and write hive-partitioned staging (``part=g/``). Idempotent via a
    ``.complete`` marker; a died staging pass is simply redone."""
    marker = os.path.join(staging, ".complete")
    if os.path.exists(marker):
        return
    shutil.rmtree(staging, ignore_errors=True)
    ds = ray.data.read_parquet(files)
    ds = ds.map_batches(
        lambda b: add_partition_column(b, n_groups, key), batch_format="pyarrow"
    )
    ds.write_parquet(staging, partition_cols=["part"])
    with open(marker, "w") as f:
        f.write("ok")


def run_resumable(
    input_path: str | list[str],
    output_dir: str,
    build: "callable",
    *,
    n_groups: int = 8,
    key: str = "conv_id",
    metrics_cols: tuple[str, ...] = ("keep", "drop_reason", "pii_hits", "tox_hits"),
) -> dict:
    """Run ``build(ds) -> ds`` over the input in ``n_groups`` resumable
    partition groups.

    ``build`` receives the raw per-group Dataset and must return the
    labeled per-turn Dataset (it may include the reassembly groupby —
    hash-partitioning by ``key`` group means every conversation lives in
    exactly one group, so the groupby stays correct under group-wise
    execution).

    Returns summary metrics merged over groups run *this* call.
    """
    files = _list_parquet(input_path)
    fp = _input_fingerprint(files)
    manifest = Manifest(output_dir)
    done = manifest.completed_records()
    summary = {"groups_run": 0, "groups_skipped": 0, "rows": 0, "kept": 0}
    staging = os.path.join(output_dir, f".staging-{fp}")
    staged = False

    for g in range(n_groups):
        final = os.path.join(output_dir, f"part={g}")
        rec0 = done.get(g)
        # lineage check: committed + same input + directory still there
        if rec0 and rec0.get("input_fingerprint") == fp and os.path.isdir(final):
            summary["groups_skipped"] += 1
            continue
        t0 = time.time()
        if not staged:
            # stale staging from a different input: reclaim the disk
            for d in os.listdir(output_dir) if os.path.isdir(output_dir) else []:
                if d.startswith(".staging-") and d != f".staging-{fp}":
                    shutil.rmtree(os.path.join(output_dir, d), ignore_errors=True)
            os.makedirs(output_dir, exist_ok=True)
            _stage_input(files, staging, n_groups, key)
            staged = True
        part_dir = os.path.join(staging, f"part={g}")
        if not os.path.isdir(part_dir):  # group hashed to zero rows
            os.makedirs(final, exist_ok=True)
            manifest.record(
                {"group": g, "input_fingerprint": fp, "status": "committed",
                 "rows": 0, "wall_sec": round(time.time() - t0, 3)}
            )
            summary["groups_run"] += 1
            continue
        out = build(ray.data.read_parquet(part_dir))

        tmp = os.path.join(output_dir, f".tmp-part-{g}")
        shutil.rmtree(tmp, ignore_errors=True)
        out.write_parquet(tmp)

        # lineage metrics from the written partition (columnar re-read of
        # the tiny metric columns only — reference pattern G1 partials,
        # /root/reference/full_dataset_analysis/main.py:8-39)
        rec: dict = {"group": g, "input_fingerprint": fp, "status": "committed"}
        try:
            import pyarrow.parquet as pq

            frag_cols = [c for c in metrics_cols if c is not None]
            tbls = []
            for f in os.listdir(tmp):
                if f.endswith(".parquet"):
                    t = pq.read_table(os.path.join(tmp, f))
                    avail = [c for c in frag_cols if c in t.schema.names]
                    tbls.append(t.select(avail) if avail else t.select([]))
            if tbls:
                t = pa.concat_tables(tbls)
                rec["rows"] = t.num_rows
                if "keep" in t.schema.names:
                    rec["kept"] = int(pa.compute.sum(t["keep"]).as_py() or 0)
                if "drop_reason" in t.schema.names:
                    vc = t["drop_reason"].to_pandas().value_counts()
                    rec["drop_reasons"] = {k: int(v) for k, v in vc.items() if k}
                for c in ("pii_hits", "tox_hits"):
                    if c in t.schema.names:
                        rec[c] = int(pa.compute.sum(t[c]).as_py() or 0)
        except Exception as e:  # lineage must never fail the job
            rec["metrics_error"] = repr(e)

        shutil.rmtree(final, ignore_errors=True)
        os.replace(tmp, final)
        rec["wall_sec"] = round(time.time() - t0, 3)
        manifest.record(rec)
        summary["groups_run"] += 1
        summary["rows"] += rec.get("rows", 0)
        summary["kept"] += rec.get("kept", 0)
    if staged:  # all groups now committed for this fingerprint
        shutil.rmtree(staging, ignore_errors=True)
    return summary
