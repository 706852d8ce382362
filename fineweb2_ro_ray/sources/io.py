"""Source/sink utilities mirroring the reference's S-family operators
(SURVEY.md §2.1) in Ray Data terms."""

from __future__ import annotations

import os
from collections.abc import Iterable, Iterator

import pyarrow as pa
import pyarrow.parquet as pq

import ray.data


def ingest_record_stream(
    records: Iterator[dict] | Iterable[dict],
    out_dir: str,
    *,
    shard_rows: int = 1300,
    resume: bool = True,
) -> dict:
    """S1: streaming ingestion from an arbitrary record iterator into
    fixed-size parquet shards — the reference streams the HF dataset
    and writes 1300-doc shards with skip-if-exists resume
    (``/root/reference/fineweb/fineweb2_download.py:12,27-57``).

    Network sources are env-blocked in this sandbox, so the interface
    takes ANY Python iterator of dicts (a local JSONL reader here; a
    ``load_dataset(..., streaming=True)`` handle in a real deployment).
    The upstream iterator is inherently serial, so this is driver-side:
    each full shard lands as one parquet file, and downstream Ray
    stages get file-level parallelism from the shard layout. On resume,
    already-written shards are skipped by fast-forwarding the stream
    (the reference's ``os.path.exists`` idempotency)."""
    os.makedirs(out_dir, exist_ok=True)
    it = iter(records)
    shard = 0
    written = 0
    skipped = 0

    import re

    _shard_re = re.compile(r"^shard-(\d+)\.parquet$")

    def _stale_after(shard: int) -> list[str]:
        # strict name match: foreign files like 'shard-merged.parquet'
        # must not crash the happy path, and indices beyond 6 digits
        # must parse fully (a fixed [6:12] slice truncated them)
        out = []
        for f in os.listdir(out_dir):
            m = _shard_re.match(f)
            if m and int(m.group(1)) >= shard:
                out.append(f)
        return sorted(out)

    while True:
        path = os.path.join(out_dir, f"shard-{shard:06d}.parquet")
        if resume and os.path.exists(path):
            n = pq.read_metadata(path).num_rows
            for _ in range(n):  # fast-forward the serial stream
                if next(it, None) is None:
                    # the replayed stream is SHORTER than the spool:
                    # everything from this shard on is not covered by
                    # the stream — surface it, never silently keep it
                    return {
                        "shards": shard,
                        "rows_written": written,
                        "shards_skipped": skipped,
                        "stale_shards": _stale_after(shard),
                    }
            skipped += 1
            shard += 1
            continue
        buf = []
        for _ in range(shard_rows):
            rec = next(it, None)
            if rec is None:
                break
            buf.append(rec)
        if not buf:
            break
        tmp = path + ".tmp"
        pq.write_table(pa.Table.from_pylist(buf), tmp, row_group_size=4096)
        os.replace(tmp, path)  # atomic: a died run never leaves a torn shard
        written += len(buf)
        shard += 1
        if len(buf) < shard_rows:
            break
    out = {"shards": shard, "rows_written": written, "shards_skipped": skipped}
    stale = _stale_after(shard)
    if stale:  # leftovers from a previous longer run
        out["stale_shards"] = stale
    return out


def dataset_from_stream(
    records: Iterator[dict] | Iterable[dict],
    spool_dir: str,
    *,
    shard_rows: int = 1300,
) -> ray.data.Dataset:
    """S1 composition: spool a serial stream to sharded parquet, then
    open it as a Dataset (file-parallel from there on). Raises if the
    spool holds shards the supplied stream does not cover (a silently
    shorter replay would otherwise return rows not in the stream)."""
    s = ingest_record_stream(records, spool_dir, shard_rows=shard_rows)
    if s.get("stale_shards"):
        raise ValueError(
            f"spool {spool_dir} contains shards not covered by this stream: "
            f"{s['stale_shards']} — remove them or replay the full stream"
        )
    from ..schema import strip_metadata

    return ray.data.read_parquet(spool_dir).map_batches(
        strip_metadata, batch_format="pyarrow"
    )


def publish_dataset(
    ds: ray.data.Dataset,
    repo_dir: str,
    *,
    max_shard_bytes: int = 500 * 2**20,
    card: dict | None = None,
) -> dict:
    """S8: dataset publisher (``/root/reference/dataset_upload.py:10-60``
    — generator over shards → ``push_to_hub(max_shard_size="500MB")``).
    The Hub network call is env-blocked here, so the target is a LOCAL
    repo layout with the same contract: size-bounded parquet shards
    under ``data/``, a ``README.md`` dataset card (schema + row count +
    the caller's metadata), and a ``manifest.json`` with per-file
    sha256/rows/bytes so a downstream mirror can verify integrity.
    Swap the directory for an HfApi upload call when network exists."""
    import hashlib
    import json
    import shutil

    data_dir = os.path.join(repo_dir, "data")
    # publish REPLACES: write_parquet appends into an existing dir, so
    # a re-publish (retry, refreshed dataset) would double-count rows
    # and manifest stale shards
    shutil.rmtree(data_dir, ignore_errors=True)
    os.makedirs(data_dir, exist_ok=True)

    # one execution: materialize, then count/size/ write are metadata +
    # a block write (count()/size_bytes()/write each re-execute a lazy
    # pipeline otherwise — 3 full runs of the upstream DAG)
    ds = ds.materialize()
    n_rows = ds.count()
    est_bytes = ds.size_bytes() or 1
    rows_per_file = max(1, int(max_shard_bytes / max(1, est_bytes / max(1, n_rows))))
    ds.write_parquet(data_dir, max_rows_per_file=rows_per_file)

    files = []
    total_rows = 0
    for f in sorted(os.listdir(data_dir)):
        if not f.endswith(".parquet"):
            continue
        path = os.path.join(data_dir, f)
        h = hashlib.sha256()
        with open(path, "rb") as fh:
            while chunk := fh.read(1 << 20):
                h.update(chunk)
        meta = pq.read_metadata(path)
        total_rows += meta.num_rows
        files.append(
            {
                "path": f"data/{f}",
                "rows": meta.num_rows,
                "bytes": os.path.getsize(path),
                "sha256": h.hexdigest(),
            }
        )
    if files:
        schema = pq.read_schema(os.path.join(data_dir, files[0]["path"].split("/")[-1]))
    else:  # empty dataset → empty-but-valid repo (schema from the Dataset)
        sch = ds.schema()
        base = getattr(sch, "base_schema", None)
        schema = base if isinstance(base, pa.Schema) else pa.schema([])
    manifest = {
        "total_rows": total_rows,
        "n_shards": len(files),
        "max_shard_bytes": max_shard_bytes,
        "schema": {f.name: str(f.type) for f in schema},
        "files": files,
    }
    with open(os.path.join(repo_dir, "manifest.json"), "w") as fh:
        json.dump(manifest, fh, indent=2, sort_keys=True)

    card = card or {}
    lines = ["# " + card.get("name", os.path.basename(repo_dir.rstrip("/"))), ""]
    if "description" in card:
        lines += [card["description"], ""]
    lines += [
        f"- rows: {total_rows}",
        f"- shards: {len(files)} (≤ {max_shard_bytes} bytes each)",
        "",
        "## Schema",
        "",
    ]
    lines += [f"- `{name}`: {typ}" for name, typ in manifest["schema"].items()]
    with open(os.path.join(repo_dir, "README.md"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    return manifest


def _json_read_kwargs(path: str | list[str], compression: str | None) -> dict:
    """Stream-decompression kwargs for ``read_json``: web corpora ship
    ``.jsonl.gz`` shards, and Arrow's JSON reader needs the codec named
    explicitly — infer it from the extension when not given
    (gzip/bz2 are stdlib-backed; zstd only if the wheel carries it)."""
    if compression is None:
        first = path[0] if isinstance(path, list) else path
        for ext, codec in ((".gz", "gzip"), (".bz2", "bz2"), (".zst", "zstd")):
            if str(first).endswith(ext):
                compression = codec
                break
    if compression is None:
        return {}
    return {"arrow_open_stream_args": {"compression": compression}}


def read_transcripts_json(
    path: str | list[str], *, compression: str | None = None
) -> ray.data.Dataset:
    """S4: JSON shard loader (``/root/reference/small_model_inference/
    shard_manager.py:52-58``) — Ray-native: one call reads a directory
    of shards with file-level parallelism. Compressed shards
    (``.jsonl.gz`` etc.) decompress in-stream per file — never a
    driver-side unpack."""
    return ray.data.read_json(path, **_json_read_kwargs(path, compression))


def write_sharded_parquet(
    ds: ray.data.Dataset, path: str, rows_per_file: int = 1300
) -> None:
    """S2: fixed-size shard writer (1300-doc shards,
    ``fineweb/fineweb2_download.py:27-37``). Durability comes from the
    deterministic partitioned layout + lineage manifest, not a mirror
    copy."""
    ds.write_parquet(path, min_rows_per_file=rows_per_file)


def json_to_parquet(
    src: str,
    dst: str,
    columns: list[str] | None = None,
    *,
    compression: str | None = None,
) -> None:
    """S6: streaming JSON→Parquet converter (``small_model_inference/
    parquet.py:8-35``) — a read + optional projection + write; the
    streaming executor handles incremental batching."""
    ds = ray.data.read_json(src, **_json_read_kwargs(src, compression))
    if columns:
        ds = ds.select_columns(columns)
    ds.write_parquet(dst)


def concat_shards(src: str, dst: str) -> None:
    """S7: shard concatenator (``small_model_inference/json_joiner.py:6-28``)
    — at scale keep multi-file output; repartition(1) only for small
    exports."""
    ray.data.read_parquet(src).repartition(1).write_parquet(dst)


def read_csv_shards(
    path: str | list[str],
    *,
    column_types: dict | None = None,
) -> ray.data.Dataset:
    """S-family extension: CSV shard loader — Ray-native
    ``read_csv`` with optional explicit column types (Arrow CSV
    inference can mis-type an all-digits id shard; pin with
    ``column_types={'doc_id': pa.int64()}``). Quoted fields carry
    embedded newlines/commas/quotes correctly (RFC 4180)."""
    import pyarrow as pa  # noqa: F401
    from pyarrow import csv as pacsv

    kwargs = {}
    if column_types:
        kwargs["convert_options"] = pacsv.ConvertOptions(
            column_types=column_types
        )
    return ray.data.read_csv(path, **kwargs)


def write_csv_shards(ds: ray.data.Dataset, path: str) -> None:
    """CSV shard writer (interchange with non-Arrow tooling); one file
    per block, RFC-4180 quoting."""
    ds.write_csv(path)


def write_ipc_shards(ds: ray.data.Dataset, path: str) -> None:
    """Arrow IPC (Feather v2) shard writer — zero-parse interchange
    with other Arrow-native tooling: one ``.arrow`` file per block,
    written inside the tasks (no driver materialization)."""
    import os
    import uuid

    import pyarrow as pa
    import pyarrow.ipc as paipc

    os.makedirs(path, exist_ok=True)

    def write_block(t: pa.Table) -> pa.Table:
        if t.num_rows:
            f = os.path.join(path, f"shard-{uuid.uuid4().hex[:16]}.arrow")
            tmp = f + ".tmp"
            with paipc.new_file(tmp, t.schema) as w:
                w.write_table(t)
            os.replace(tmp, f)
        return pa.table({"rows": pa.array([t.num_rows], pa.int64())})

    # consume the stream; the tiny per-block row counts are the only
    # thing that reaches the driver
    ds.map_batches(write_block, batch_format="pyarrow").to_pandas()


def read_ipc_shards(path: str | list[str]) -> ray.data.Dataset:
    """Arrow IPC shard loader: file-parallel ``read_binary_files`` +
    in-task IPC decode (Ray has no native IPC reader); each file
    becomes one block, zero row-level Python."""
    import pyarrow as pa
    import pyarrow.ipc as paipc

    import glob as _glob
    import os as _os

    if isinstance(path, str) and _os.path.isdir(path):
        files = sorted(_glob.glob(_os.path.join(path, "*.arrow")))
    elif isinstance(path, str):
        files = [path]
    else:
        files = list(path)

    bin_ds = ray.data.read_binary_files(files)

    def decode(b: pa.Table) -> pa.Table:
        outs = []
        for buf in b["bytes"]:
            with paipc.open_file(pa.BufferReader(buf.as_py())) as r:
                outs.append(r.read_all())
        return pa.concat_tables(outs)

    return bin_ds.map_batches(decode, batch_format="pyarrow")


def ingest_jsonl_quarantine(
    paths: str | list[str],
    out_dir: str,
    *,
    shard_rows: int = 1300,
    resume: bool = True,
    required: tuple[str, ...] = ("conv_id", "turn_idx", "text"),
    max_raw_bytes: int = 4096,
) -> dict:
    """S1/S6 ingestion with the reference's ERROR-sentinel philosophy
    applied AT THE SOURCE (round-5, VERDICT r4 #6): malformed JSONL
    records — broken JSON, non-object rows, rows missing ``required``
    keys — are routed to a quarantine shard set with full lineage
    (source file, line number, truncated raw payload, error) instead of
    failing the job, mirroring how the LLM-output parser downgrades
    unparseable generations to an ``"ERROR"`` row rather than crashing
    (``small_model_inference/small_model_inference.py`` parse loop).

    Good records flow into :func:`ingest_record_stream` unchanged
    (fixed-size shards, atomic replace, skip-if-exists resume); the
    quarantine set lands under ``out_dir/quarantine/`` as its own
    parquet shards and is REBUILT per run (parsing is deterministic, so
    a resumed replay reproduces it exactly — no duplicate entries).
    Returns the ingest summary + ``rows_quarantined`` /
    ``quarantine_shards``, so lineage always accounts for every input
    line: ``rows_written + rows_skipped + rows_quarantined`` covers the
    stream."""
    import gzip
    import json as _json
    import shutil as _shutil

    plist = [paths] if isinstance(paths, str) else sorted(paths)
    qdir = os.path.join(out_dir, "quarantine")
    _shutil.rmtree(qdir, ignore_errors=True)
    os.makedirs(qdir, exist_ok=True)
    qstate = {"rows": 0, "shards": 0, "buf": []}

    def _flush_quarantine() -> None:
        if not qstate["buf"]:
            return
        t = pa.table(
            {
                "source_file": pa.array(
                    [r[0] for r in qstate["buf"]], pa.string()
                ),
                "line_no": pa.array([r[1] for r in qstate["buf"]], pa.int64()),
                "raw": pa.array([r[2] for r in qstate["buf"]], pa.string()),
                "error": pa.array([r[3] for r in qstate["buf"]], pa.string()),
            }
        )
        path = os.path.join(qdir, f"quarantine-{qstate['shards']:06d}.parquet")
        tmp = path + ".tmp"
        pq.write_table(t, tmp, row_group_size=4096)
        os.replace(tmp, path)
        qstate["shards"] += 1
        qstate["buf"] = []

    def _opener(p: str):
        if p.endswith(".gz"):
            return gzip.open(p, "rt", encoding="utf-8", errors="replace")
        return open(p, "rt", encoding="utf-8", errors="replace")

    def good_records():
        for p in plist:
            with _opener(p) as fh:
                for i, line in enumerate(fh):
                    if not line.strip():
                        continue
                    try:
                        rec = _json.loads(line)
                        if not isinstance(rec, dict):
                            raise ValueError(
                                f"not a JSON object: {type(rec).__name__}"
                            )
                        missing = [k for k in required if k not in rec]
                        if missing:
                            raise ValueError(f"missing keys: {missing}")
                    except Exception as e:
                        qstate["rows"] += 1
                        qstate["buf"].append(
                            (
                                p,
                                i,
                                line.rstrip("\n")[:max_raw_bytes],
                                f"{type(e).__name__}: {e}"[:512],
                            )
                        )
                        if len(qstate["buf"]) >= shard_rows:
                            _flush_quarantine()
                        continue
                    yield rec

    summary = ingest_record_stream(
        good_records(), out_dir, shard_rows=shard_rows, resume=resume
    )
    _flush_quarantine()
    summary["rows_quarantined"] = qstate["rows"]
    summary["quarantine_shards"] = qstate["shards"]
    return summary
