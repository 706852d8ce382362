"""Raw-Ray tree-merged hash exchange for keyed map_groups.

This is the engine's one deliberate drop below the Dataset API (the
"raw tasks only where Dataset can't express it" rule): Ray Data 2.49
expresses a keyed ``groupby().map_groups`` ONLY as a range-partitioned
SORT — boundary sampling, per-block sort, merge reduce — and its
experimental hash-shuffle strategy hangs in local mode (measured,
BASELINE.md). A keyed map_groups needs CO-LOCATION of each key's rows,
not global order, so the sort is pure overhead: profiled at ~2/3 of
the flagship wall (Sort 51 s vs 19 s of scoring compute at sf-bench,
scripts/profile_flagship.py), and a multi-second fixed floor per
groupby on small inputs (sampling pass + sort tasks + merge).

Shape (push-based hash shuffle with a tree-merge reduce fan-in, the
same exchange the reference delegates to its external dedup/shuffle
tooling for):

    M map tasks     — split each ~64 MB group of upstream blocks into
                      P slices by a canonical 64-bit key hash
                      (``schema.hash_key_u64`` per key column,
                      splitmix64-combined; single string keys use the
                      engine-pinned crc32 of
                      ``state.checkpoint.add_partition_column``);
    merge levels    — per reduce partition, slices are concatenated in
                      a tree with fan-in F (default 64): M slices →
                      ⌈M/F⌉ merged chunks → … until ≤ F chunks remain.
                      With M ≤ F (every local run) the tree is empty
                      and the wiring is identical to a flat exchange.
    P reduce tasks  — concat their ≤ F chunks, run ONE vectorized
                      reduce_fn over the whole partition (every key's
                      rows are now co-located), emit an Arrow block.

vs the sort-based groupby: no sampling pass, no per-block sort, no
merge heap. Both are all-to-all pipeline BARRIERS (the input
materializes either way — no reducer can finish before every map ran).

Reducer count ``P`` auto-sizes from the STREAMED input bytes:
``P = clamp(bytes / FW2_EXCHANGE_PARTITION_BYTES, min = max(8,
2 x cluster CPUs), max = FW2_EXCHANGE_MAX_REDUCERS)`` with a 256 MB
default partition target, so a reduce partition fits a worker heap at
any input size instead of scaling with driver-visible CPU count.
Callers with key-cardinality knowledge can still pass ``n_reducers``.

Scale notes (100 TB, 256 MB partitions → P ≈ 4e5, M ≈ 1.6e6 map
groups): the tree merge bounds every task's ref fan-in at F (the flat
exchange handed each reducer all M slice refs — ~1.6e6 task args — and
concatenated them in one go). The driver's transient slice-ref matrix
is bounded by GROUPED RETURNS: past a ref budget
(``FW2_EXCHANGE_DRIVER_REFS_MAX``, default 4e6) splits return
⌈P/W⌉ group-objects of W consecutive-partition slices instead of P
singles, and an ``_ungroup_merge`` level (fan-in F over group-objects,
W returns each) restores per-partition chunks — driver peak drops from
M x P to max(M x ⌈P/W⌉, (M/F) x P), i.e. W = F = 64 cuts the 100-TB
point from ~6e11 refs to ~1e10 for one extra object-store copy of the
data. FULLY collapsing the matrix — to M + P — is the disk-SEGMENT
mode (``segment_dir`` / ``FW2_EXCHANGE_SEGMENT_DIR``): map outputs
become Spark-ESS-style on-disk segment files with an offset index and
reducers range-read their slice, trading Ray lineage durability for
file-system durability (full analysis at the segment-mode block
comment below). Skewed keys skew only their
partition (a key's rows must land in one reducer — thinning partitions
is the lever, and byte-based P sizing does exactly that). Map outputs
are plain object-store objects, so Ray spills them to disk under
memory pressure exactly as it spills sort blocks.

Fault tolerance: split / merge / reduce are stateless idempotent tasks
(``max_retries`` applies, default 3). A worker death re-runs the dead
task; a LOST intermediate slice is rebuilt by Ray's lineage
reconstruction re-running its producer split. Proven by
``tests/test_exchange_faults.py`` (SIGKILL of a split worker and of a
reduce worker mid-run → byte-identical output).
"""

from __future__ import annotations

import os
from typing import Callable

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data


def _concat_named(tabs: list[pa.Table], where: str) -> pa.Table:
    """``pa.concat_tables`` that, on schema drift between blocks (a
    producer that bypassed ``from_pandas_like`` type pinning), fails
    with the mismatching schemas named instead of a bare Arrow error —
    the coalesced map side concats up to 128 upstream blocks, so the
    failure needs enough context to find the odd producer.

    Permissive promotion is allowed ONLY when every drifted field is
    null-typed on one side (an all-null or empty block whose type
    Arrow re-inferred as null): promoting null → the pinned type is
    lossless. Two DISTINCT non-null types for the same field (e.g. an
    int64 key re-inferred as float64 by a pandas producer) raise the
    named error instead of being silently unified — a permissive
    int64→float64 promotion would collapse ids above 2^53 and merge
    rows under the wrong key with no signal."""
    try:
        return pa.concat_tables(tabs)
    except (pa.ArrowInvalid, pa.ArrowTypeError) as e:
        types: dict[str, set] = {}
        for t in tabs:
            for f in t.schema:
                if not pa.types.is_null(f.type):
                    types.setdefault(f.name, set()).add(f.type)
        real_drift = sorted(n for n, ts in types.items() if len(ts) > 1)
        if not real_drift:
            try:
                return pa.concat_tables(tabs, promote_options="permissive")
            except (pa.ArrowInvalid, pa.ArrowTypeError):
                pass  # fall through to the named error
        uniq: list[str] = []
        for t in tabs:
            s = str(t.schema)
            if s not in uniq:
                uniq.append(s)
        raise ValueError(
            f"exchange {where}: schema drift across {len(tabs)} blocks "
            f"({len(uniq)} distinct schemas"
            + (
                f"; conflicting non-null types for {real_drift}"
                if real_drift
                else ", not permissively unifiable"
            )
            + "):\n"
            + "\n---\n".join(uniq[:4])
        ) from e


# Test-only fault injection: set to ("split"|"merge"|"reduce",
# marker_path) and the FIRST task of that stage to run SIGKILLs its
# worker (atomically claimed via O_EXCL on the marker, so exactly one
# instance dies and its retry proceeds). Read driver-side at wiring
# time and shipped into tasks as a plain argument — no env plumbing.
# Exercised by tests/test_exchange_faults.py to prove the exchange's
# task-retry / lineage-reconstruction semantics.
_TEST_FAILPOINT: tuple[str, str] | None = None


def _maybe_die(failpoint: tuple[str, str] | None, stage: str) -> None:
    if failpoint is not None and failpoint[0] == stage:
        try:
            fd = os.open(failpoint[1], os.O_CREAT | os.O_EXCL | os.O_WRONLY)
            os.close(fd)
        except FileExistsError:
            return  # this stage already died once; the retry proceeds
        os.kill(os.getpid(), 9)


def _part_codes(t: pa.Table, keys: list[str], n_reducers: int) -> np.ndarray:
    """Partition id per row: canonical per-column 64-bit hashes,
    splitmix64-combined across key columns (dtype-representation-safe —
    see ``schema.hash_key_u64``)."""
    from ..schema import hash_key_u64
    from .bloom import _mix64

    acc: np.ndarray | None = None
    for c in keys:
        h = hash_key_u64(t[c])
        acc = h if acc is None else _mix64(acc ^ h, np.uint64(0xA076_1D64_78BD_642F))
    return (acc % np.uint64(n_reducers)).astype(np.int64)


def _split_core(
    n_reducers: int,
    key: str | list[str],
    blocks: tuple,
) -> list[pa.Table]:
    """Shared split body: coalesce a group of upstream blocks and cut
    the result into ``n_reducers`` hash-routed slices. A single STRING
    key routes via the engine-pinned crc32 partition hash (computed
    per *unique* key — cheap for multi-turn conversations); other keys
    via the canonical hash.

    Accepts pandas-backed blocks too (Ray stores ``from_pandas`` /
    pandas-map_groups outputs as DataFrames): converted to Arrow here,
    metadata-stripped."""
    tabs = [
        pa.Table.from_pandas(b, preserve_index=False).replace_schema_metadata(None)
        if isinstance(b, pd.DataFrame)
        else b
        for b in blocks
    ]
    live = [t for t in tabs if t.num_rows > 0]
    # Ray 2.49 map operators emit 0-row blocks with an EMPTY schema (no
    # key column to hash) — drop them unless everything is empty
    t = _concat_named(live, "map-side split").combine_chunks() if live else tabs[0]
    if t.num_rows == 0:
        # route an empty slice everywhere — the reduce side drops
        # row-less chunks before concat
        return [t for _ in range(n_reducers)]
    if callable(key):
        # custom partitioner (e.g. range routing for sample_sort):
        # key(table) -> int64 partition codes in [0, n_reducers)
        part = np.asarray(key(t), dtype=np.int64)
        tt = t
    elif isinstance(key, str) and pa.types.is_string(t.schema.field(key).type):
        from ..state.checkpoint import add_partition_column

        # the routing column is appended LAST; remove it by index so a
        # user column that happens to be named "part" is untouched
        # (pyarrow drop_columns raises on duplicate names)
        t2 = add_partition_column(t, n_reducers, key=key)
        part = t2.column(t2.num_columns - 1).to_numpy(zero_copy_only=False)
        tt = t2.remove_column(t2.num_columns - 1)
    else:
        keys = [key] if isinstance(key, str) else list(key)
        part = _part_codes(t, keys, n_reducers)
        tt = t
    order = np.argsort(part, kind="stable")
    sorted_part = part[order]
    tt = tt.take(pa.array(order, pa.int64()))
    bounds = np.searchsorted(sorted_part, np.arange(n_reducers + 1))
    return [
        tt.slice(bounds[i], bounds[i + 1] - bounds[i]) for i in range(n_reducers)
    ]


@ray.remote
def _split_block(
    n_reducers: int,
    key: str | list[str],
    failpoint: tuple[str, str] | None,
    *blocks,
) -> tuple:
    """Map side, ungrouped returns: one task per GROUP of upstream
    blocks (the driver coalesces small blocks to ~64 MB per task — an
    actor-pool stage emits one ~batch-sized block per call, and
    splitting each of ~1500 such blocks into P slices floods the
    object store with M x P tiny objects; grouping cuts both the
    object count and the reduce-side concat fan-in ~an order of
    magnitude). Returns ``n_reducers`` table slices, one driver ref
    each."""
    _maybe_die(failpoint, "split")
    return tuple(_split_core(n_reducers, key, blocks))


@ray.remote
def _split_block_grouped(
    n_reducers: int,
    group_bounds: tuple,
    key: str | list[str],
    failpoint: tuple[str, str] | None,
    *blocks,
) -> tuple:
    """Map side, grouped returns: same split as ``_split_block`` but
    the P slices come back packed into ``len(group_bounds) - 1``
    GROUP-OBJECTS of consecutive-partition slices (group ``c`` holds
    partitions ``group_bounds[c]:group_bounds[c+1]``), so the driver
    holds M x ⌈P/W⌉ refs instead of M x P while wiring the merge tree.
    ``_ungroup_merge`` restores per-partition chunks downstream."""
    _maybe_die(failpoint, "split")
    slices = _split_core(n_reducers, key, blocks)
    return tuple(
        tuple(slices[a:b]) for a, b in zip(group_bounds, group_bounds[1:])
    )


@ray.remote
def _ungroup_merge(
    failpoint: tuple[str, str] | None,
    width: int,
    *gobjs,
) -> tuple:
    """Grouped-exchange merge level: take up to F same-group
    GROUP-OBJECTS (each a tuple of ``width`` consecutive-partition
    slices from one split task) and emit ``width`` per-partition
    merged chunks (slot j = concat of every input's slot j). Pure data
    movement like ``_merge_slices`` — idempotent/retryable — and the
    point where the grouped wiring rejoins the ordinary per-partition
    tree."""
    _maybe_die(failpoint, "merge")
    outs: list[pa.Table] = []
    for j in range(width):
        live = [g[j] for g in gobjs if g[j].num_rows > 0]
        outs.append(
            _concat_named(live, "grouped ungroup-merge").combine_chunks()
            if live
            else gobjs[0][j]
        )
    return tuple(outs)


@ray.remote
def _num_rows(t: pa.Table) -> int:
    return t.num_rows


@ray.remote
def _merge_slices(failpoint: tuple[str, str] | None, *chunks: pa.Table) -> pa.Table:
    """Intermediate tree-merge level: concatenate up to F same-partition
    slices into one object. Pure data movement — no reduce_fn — so it
    is trivially idempotent/retryable and keeps per-task ref fan-in at
    F however many map groups ran."""
    _maybe_die(failpoint, "merge")
    live = [c for c in chunks if c.num_rows > 0]
    if not live:
        return chunks[0]
    return _concat_named(live, "tree merge").combine_chunks()


def _reduce_core(
    fn: Callable,
    out_schema: pa.Schema | None,
    batch_format: str,
    t: pa.Table,
) -> pa.Table:
    """Shared reduce tail: one vectorized ``fn`` call over a whole
    partition table, output types pinned (``out_schema`` cast, or
    ``from_pandas_like`` against the input partition — a partition
    whose string key is entirely null would otherwise re-infer as
    double and poison any downstream concat/to_pandas)."""
    if batch_format == "pyarrow":
        out_t = fn(t)
        return out_t.cast(out_schema) if out_schema is not None else out_t
    out = fn(t.to_pandas())
    if out_schema is not None:
        return pa.Table.from_pandas(out, schema=out_schema, preserve_index=False)
    from ..schema import from_pandas_like

    return from_pandas_like(out, t)


@ray.remote
def _reduce_partition(
    fn: Callable,
    out_schema: pa.Schema | None,
    batch_format: str,
    failpoint: tuple[str, str] | None,
    *chunks: pa.Table,
) -> pa.Table:
    """Reduce side: all of one partition's (merged) chunks → one
    vectorized ``fn`` call → one Arrow block. ``out_schema`` pins the
    output type so an empty partition emits a schema-identical empty
    block (pandas would otherwise upcast empty columns to
    object/float64)."""
    _maybe_die(failpoint, "reduce")
    live = [c for c in chunks if c.num_rows > 0]
    if not live:
        # every upstream slice was a 0-row (possibly empty-SCHEMA) block
        if out_schema is not None:
            return out_schema.empty_table()
        return chunks[0]  # degenerate; pruned by the 0-row filter below
    t = _concat_named(live, "reduce concat").combine_chunks()
    return _reduce_core(fn, out_schema, batch_format, t)


# --- Disk-segment exchange (Magnet/Spark-ESS-style map output files) ---
#
# The object-store wirings above bound, but cannot fully collapse, the
# driver's transient slice-ref matrix: even grouped returns leave
# max(M x ceil(P/W), (M/F) x P) refs at the 100-TB point (~1e10). The
# segment mode collapses it to M + P by taking map outputs OUT of the
# object store entirely, the way Spark's sort-based shuffle (and its
# Magnet push-merge evolution, SIGMOD'20) does:
#
#   each map task writes ONE data file — a leading schema-only Arrow
#   IPC stream, then the P partition slices as back-to-back IPC
#   streams (0-row slices take zero bytes) — plus a sidecar ``.idx``
#   of P+1 little-endian int64 end-offsets, both via write-tmp +
#   atomic rename; its task return is just the file path (a string).
#   Each reducer receives ONE broadcast list of the M paths (`ray.put`
#   once), and per segment does two bounded reads: 16 bytes of the
#   index at offset 8*i, then the [lo, hi) byte range of its slice.
#
# Driver state: M path strings + P reduce refs — no M x P term at any
# scale. The trade, stated honestly: (a) reducers issue M random
# range-reads each (the seek pattern Magnet exists to consolidate;
# fine on node-local NVMe, and a per-partition-range merge level — the
# actual "push-merge" — is the extension point if it ever dominates);
# (b) durability moves from Ray lineage to the file system: on one
# node (or a shared FS) a lost reduce task simply re-reads, but a
# multi-node deployment needs ``segment_dir`` on storage that survives
# the producing worker (shared FS / fetch service), else a lost node's
# segments raise FileNotFoundError and the exchange must be re-run —
# exactly Spark's fetch-failure → stage-retry semantics. Retried split
# tasks are idempotent by construction (fresh uuid file per attempt;
# the attempt whose return value is consumed names the file that gets
# read; orphans from a killed attempt are unreferenced garbage for the
# caller's directory cleanup).
#
# Enable per call (``segment_dir=``) or engine-wide via the
# ``FW2_EXCHANGE_SEGMENT_DIR`` env var (every wide operator routes
# through this exchange, so the env var switches the whole engine);
# the caller owns the directory's lifetime and deletes it after the
# consuming Dataset has fully executed.
#
# PUSH-MERGE CONSOLIDATION (the Magnet extension, SIGMOD'20 §4): when
# the map count M is large, each of the P reducers issuing M random
# range-reads is the dominating seek pattern — at the 100-TB point
# (M ~ 1.6e6, P ~ 4e5) that is ~6e11 reads of ~0.6 KB each. The
# consolidation level inserts G = ceil(P / R) merger tasks between map
# and reduce, each owning a CONTIGUOUS partition range [lo, hi) of
# width R: because a segment file lays its P slices back-to-back in
# partition order, a merger reads ONE contiguous byte range
# [idx[lo], idx[hi]) per segment (M sequential-ish reads of R-slice
# granularity), re-groups the slices by partition, and writes ONE
# merged segment file — format-identical to a map segment, with R
# local partitions — so every reducer then does exactly ONE range-read
# from exactly one merged file. Read count drops from M x P to
# M x P / R (mergers) + P (reducers); with R = F = 64 the 100-TB point
# falls ~6e11 -> ~1e10 reads at 64x the granularity, and the re-encode
# also compacts each partition's M tiny IPC streams into one stream of
# combined record batches (faster reducer parse). Cost: one extra
# on-disk copy of the data — so it auto-enables only when M > F (below
# that a reducer's fan-in already meets the same bound F the
# object-store tree enforces). ``FW2_EXCHANGE_SEGMENT_MERGE``
# (auto|1|0) forces/disables; ``FW2_EXCHANGE_SEGMENT_MERGE_PARTS``
# sets R (default F). Merger tasks are stateless and idempotent
# (fresh-uuid tmp+rename writes) — a killed merger is retried by Ray
# like any split/reduce task.


def _write_segment(slices: list[pa.Table], seg_dir: str, prefix: str = "seg") -> str:
    import uuid

    name = uuid.uuid4().hex
    final = os.path.join(seg_dir, f"{prefix}-{name}.data")
    tmp = os.path.join(seg_dir, f".tmp-{name}.data")
    offsets: list[int] = []
    with open(tmp, "wb") as f:
        # leading schema-only stream: reducers whose every slice is
        # empty rebuild a 0-row table with the TRUE partition schema
        # (the object-store path only sees whatever degenerate block
        # reached it)
        with pa.ipc.new_stream(f, slices[0].schema):
            pass
        offsets.append(f.tell())
        for s in slices:
            if s.num_rows:
                with pa.ipc.new_stream(f, s.schema) as w:
                    w.write_table(s)
            offsets.append(f.tell())
    tmp_i, final_i = tmp + ".idx", final + ".idx"
    with open(tmp_i, "wb") as f:
        f.write(np.asarray(offsets, dtype="<i8").tobytes())
    os.rename(tmp_i, final_i)
    os.rename(tmp, final)
    return final


@ray.remote
def _split_block_segment(
    n_reducers: int,
    key: str | list[str],
    seg_dir: str,
    failpoint: tuple[str, str] | None,
    *blocks,
) -> str:
    """Map side, segment mode: same split as ``_split_block`` but the
    P slices go to ONE on-disk segment file (+ ``.idx``) instead of P
    object-store returns; the task returns only the file path."""
    _maybe_die(failpoint, "split")
    return _write_segment(_split_core(n_reducers, key, blocks), seg_dir)


def _segment_merge_parts(m: int, p: int, fanin: int) -> int:
    """Push-merge consolidation width R (partitions per merged segment
    file); 0 = no consolidation. Auto rule: consolidate only when the
    per-reducer read fan-in M exceeds the merge fan-in F — below that,
    a reducer's M range-reads already meet the same bound F the
    object-store tree enforces on task fan-in, and the extra on-disk
    copy buys nothing. ``FW2_EXCHANGE_SEGMENT_MERGE`` = ``1`` forces
    consolidation at any M, ``0``/``off`` disables it;
    ``FW2_EXCHANGE_SEGMENT_MERGE_PARTS`` overrides R (default F)."""
    mode = os.environ.get("FW2_EXCHANGE_SEGMENT_MERGE", "auto").lower()
    if mode in ("0", "off", "false"):
        return 0
    r = int(os.environ.get("FW2_EXCHANGE_SEGMENT_MERGE_PARTS", "0")) or fanin
    if mode != "1" and m <= fanin:
        return 0
    return max(1, min(r, p))


@ray.remote
def _merge_segment_range(
    lo: int,
    hi: int,
    seg_dir: str,
    failpoint: tuple[str, str] | None,
    paths: list[str],
) -> str:
    """Consolidation level (Magnet-style push-merge): own partitions
    [lo, hi) across EVERY map segment. Slices are back-to-back in
    partition order inside each segment, so this reads ONE contiguous
    byte range per segment, re-groups by partition, concats each
    partition's tables into one stream, and writes ONE merged segment
    file (format-identical to a map segment, with hi-lo local
    partitions). Idempotent: fresh-uuid tmp+rename write per attempt."""
    _maybe_die(failpoint, "segmerge")
    r = hi - lo
    parts: list[list[pa.Table]] = [[] for _ in range(r)]
    schema: pa.Schema | None = None
    try:
        for p in paths:
            with open(p + ".idx", "rb") as f:
                pe = int(np.frombuffer(f.read(8), dtype="<i8")[0])
                f.seek(8 * lo)
                offs = np.frombuffer(f.read(8 * (r + 1)), dtype="<i8")
            if schema is None:
                with open(p, "rb") as f:
                    schema = pa.ipc.open_stream(
                        pa.py_buffer(f.read(pe))
                    ).schema
            blo, bhi = int(offs[0]), int(offs[-1])
            if bhi <= blo:
                continue
            with open(p, "rb") as f:
                f.seek(blo)
                buf = memoryview(f.read(bhi - blo))
            for j in range(r):
                a, b = int(offs[j]) - blo, int(offs[j + 1]) - blo
                if b > a:
                    parts[j].append(
                        pa.ipc.open_stream(pa.py_buffer(buf[a:b])).read_all()
                    )
    except FileNotFoundError as e:
        raise FileNotFoundError(
            f"exchange segment lost: {e.filename!r} — segment files are "
            "outside Ray lineage; if the producing node (or the segment "
            "directory) is gone, re-run the exchange (Spark-style "
            "fetch-failure semantics)"
        ) from e
    slices = [
        _concat_named(ts, "segment consolidation").combine_chunks()
        if ts
        else schema.empty_table()
        for ts in parts
    ]
    return _write_segment(slices, seg_dir, prefix="mseg")


def _read_segment_range(path: str, part_idx: int) -> pa.Table | None:
    """One reducer's slice of one segment: 16 index bytes, then the
    byte range; ``None`` when the slice is empty (lo == hi)."""
    with open(path + ".idx", "rb") as f:
        f.seek(8 * part_idx)
        lo, hi = np.frombuffer(f.read(16), dtype="<i8")
    if hi <= lo:
        return None
    with open(path, "rb") as f:
        f.seek(lo)
        buf = f.read(int(hi - lo))
    return pa.ipc.open_stream(pa.py_buffer(buf)).read_all()


@ray.remote
def _reduce_partition_segments(
    fn: Callable,
    out_schema: pa.Schema | None,
    batch_format: str,
    part_idx: int,
    failpoint: tuple[str, str] | None,
    paths: list[str] | str,
) -> pa.Table:
    """Reduce side, segment mode: range-read this partition's slice
    from every segment file, concat, run ``fn`` once. ``paths`` is the
    single `ray.put`-broadcast list of all M segment paths — or, in
    push-merge mode, ONE merged-segment path (the merger task's return,
    passed as a bare ObjectRef so this reducer launches the moment its
    merger finishes, with no driver barrier on the whole level)."""
    _maybe_die(failpoint, "reduce")
    if isinstance(paths, str):
        paths = [paths]
    try:
        tabs = [
            t
            for t in (_read_segment_range(p, part_idx) for p in paths)
            if t is not None
        ]
        if not tabs:
            if out_schema is not None:
                return out_schema.empty_table()
            # schema-only leading stream of any segment: a 0-row table
            # with the true partition schema
            with open(paths[0] + ".idx", "rb") as f:
                end = int(np.frombuffer(f.read(8), dtype="<i8")[0])
            with open(paths[0], "rb") as f:
                buf = f.read(end)
            return pa.ipc.open_stream(pa.py_buffer(buf)).read_all()
    except FileNotFoundError as e:
        raise FileNotFoundError(
            f"exchange segment lost: {e.filename!r} — segment files are "
            "outside Ray lineage; if the producing node (or the segment "
            "directory) is gone, re-run the exchange (Spark-style "
            "fetch-failure semantics)"
        ) from e
    t = _concat_named(tabs, "segment reduce concat").combine_chunks()
    return _reduce_core(fn, out_schema, batch_format, t)


def _auto_reducers(total_bytes: int, cpus: int) -> int:
    """Byte-based reducer count: one reducer per
    ``FW2_EXCHANGE_PARTITION_BYTES`` (default 256 MB) of map input, so
    a reduce partition fits a worker heap at any scale, clamped below
    by the parallelism floor ``max(8, 2 x CPUs)`` (small inputs) and
    above by ``FW2_EXCHANGE_MAX_REDUCERS`` (ref-matrix guard)."""
    part_bytes = int(os.environ.get("FW2_EXCHANGE_PARTITION_BYTES", str(256 << 20)))
    cap = int(os.environ.get("FW2_EXCHANGE_MAX_REDUCERS", str(1 << 16)))
    floor = max(8, 2 * cpus)
    by_bytes = -(-total_bytes // part_bytes) if total_bytes > 0 else 0
    return max(2, min(cap, max(floor, by_bytes)))


def _auto_group_width(n_groups: int, p: int, fanin: int) -> int:
    """Grouped-returns width W: 1 (ungrouped) while the driver's
    transient slice-ref matrix M x P stays under
    ``FW2_EXCHANGE_DRIVER_REFS_MAX`` (default 4e6 refs ~ a few hundred
    MB of driver heap); beyond that, the smallest W that brings
    M x ⌈P/W⌉ back under budget, capped at the merge fan-in (a wider W
    buys nothing once the ungroup level's output matrix (M/F) x P
    dominates) and at P/2 (at least two groups, so grouped splits can
    use ``num_returns``). ``FW2_EXCHANGE_GROUP_WIDTH`` forces a width
    (0 = auto)."""
    forced = int(os.environ.get("FW2_EXCHANGE_GROUP_WIDTH", "0"))
    if forced:
        return max(1, min(forced, p // 2))
    max_refs = int(
        os.environ.get("FW2_EXCHANGE_DRIVER_REFS_MAX", str(4_000_000))
    )
    refs = n_groups * p
    if refs <= max_refs:
        return 1
    return max(2, min(-(-refs // max_refs), fanin, p // 2))


def hash_exchange_map_groups(
    ds: ray.data.Dataset,
    fn: Callable,
    *,
    key: str | list[str] | Callable,
    n_reducers: int | None = None,
    out_schema: pa.Schema | None = None,
    batch_format: str = "pandas",
    group_width: int | None = None,
    segment_dir: str | None = None,
) -> ray.data.Dataset:
    """Hash-partition ``ds`` by ``key`` (one column or several) and
    apply ``fn`` once per partition (all rows of any key value
    co-located), bypassing Ray Data's sort-based groupby. Returns a
    Dataset over the reduce outputs — IN PARTITION ORDER (block i holds
    partition i's reduce output; range partitioners rely on this) — so
    downstream stages (``write_parquet``, further ``map_batches``)
    stream as usual. ``key`` may instead be a CALLABLE
    ``(pa.Table) -> int64 codes in [0, n_reducers)`` for non-hash
    routing (range partitioning for ordered sorts, bucket routing); it
    ships to every split task, so capture big payloads (splitter
    arrays) via ``ray.put`` and fetch inside.

    ``fn`` must be partition-local and key-complete (the contract of
    ``groupby(key).map_groups`` with a vectorized body): it receives
    EVERY row of each key in the partition (a pandas frame, or an
    Arrow table with ``batch_format="pyarrow"``) and groups
    internally. Unlike ``map_groups`` it is called once per PARTITION,
    not per key — no bucket pre-binning column needed.

    ``n_reducers=None`` auto-sizes from the streamed input bytes (see
    ``_auto_reducers``); pass it explicitly only when key cardinality
    is known to be small. ``group_width=None`` auto-selects the
    grouped-returns width from the driver-ref budget (see
    ``_auto_group_width``; 1 = today's ungrouped wiring); pass it only
    in tests/benchmarks that force a specific wiring.

    ``segment_dir`` (or the ``FW2_EXCHANGE_SEGMENT_DIR`` env var)
    switches map outputs to on-disk segment files (Spark-ESS-style; see
    the segment-mode block comment above): driver state M + P instead
    of any M x P term, at the cost of file-system durability semantics.
    A per-exchange subdirectory is created under it; the caller owns
    cleanup after the consuming Dataset has fully executed."""
    cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    target = int(os.environ.get("FW2_EXCHANGE_SPLIT_BYTES", str(64 << 20)))
    fp = _TEST_FAILPOINT
    fanin = max(2, int(os.environ.get("FW2_EXCHANGE_MERGE_FANIN", "64")))
    seg_root = segment_dir or os.environ.get("FW2_EXCHANGE_SEGMENT_DIR") or None
    seg_dir: str | None = None
    if seg_root:
        import uuid

        seg_dir = os.path.join(seg_root, f"exch-{uuid.uuid4().hex}")
        os.makedirs(seg_dir, exist_ok=True)

    # Two launch modes for the map side:
    #   EAGER (n_reducers explicit): the reducer count — and therefore
    #   every split task's num_returns — is known up front, so splits
    #   launch AS the upstream stream drains; each group's block refs
    #   are handed to its split task and dropped immediately, so
    #   upstream blocks are freed/spilled incrementally and split CPU
    #   overlaps the upstream stage. The grouped-returns width comes
    #   from the ``group_width`` param / FW2_EXCHANGE_GROUP_WIDTH env
    #   only (the ref-budget auto-width needs the final map-group
    #   count).
    #   DEFERRED (n_reducers=None): byte-based reducer auto-sizing
    #   needs the TOTAL streamed bytes, so block refs are held until
    #   the stream ends, then every split launches. The deferral costs
    #   no reduce-side wall time (the exchange is a barrier either
    #   way: no reducer can start until every split ran), but it DOES
    #   pin the whole input in the object store until the splits
    #   consume it — the price of not knowing P in advance; Ray spills
    #   the pinned blocks to disk under memory pressure.
    eager = n_reducers is not None
    p = 0
    gb: tuple | None = None
    n_g = 0

    def _resolve_wiring(n_red: int, n_groups_hint: int) -> None:
        nonlocal p, gb, n_g
        p = max(2, n_red)  # num_returns >= 2 so splits return ref tuples
        if seg_dir is not None:
            return  # segment mode: no grouped returns, no merge tree
        if group_width is not None:
            gw = group_width
        elif eager:
            gw = int(os.environ.get("FW2_EXCHANGE_GROUP_WIDTH", "0")) or 1
        else:
            gw = _auto_group_width(n_groups_hint, p, fanin)
        gw = max(1, min(gw, p // 2))
        if gw >= 2:
            b = list(range(0, p, gw)) + [p]
            if p % gw == 1:  # no width-1 trailing group (num_returns >= 2)
                del b[-2]
            gb, n_g = tuple(b), len(b) - 1

    splits: list = []

    def _launch(blocks: list) -> None:
        if seg_dir is not None:
            splits.append(
                _split_block_segment.remote(p, key, seg_dir, fp, *blocks)
            )
        elif gb is not None:
            splits.append(
                _split_block_grouped.options(num_returns=n_g).remote(
                    p, gb, key, fp, *blocks
                )
            )
        else:
            splits.append(
                _split_block.options(num_returns=p).remote(p, key, fp, *blocks)
            )

    if eager:
        _resolve_wiring(n_reducers, 0)
    groups: list[list] = []
    pend: list = []
    pend_bytes = 0
    total_bytes = 0

    def _flush() -> None:
        nonlocal pend, pend_bytes
        if pend:
            if eager:
                _launch(pend)
            else:
                groups.append(pend)
            pend, pend_bytes = [], 0

    for bundle in ds.iter_internal_ref_bundles():
        for r, meta in zip(bundle.block_refs, bundle.metadata):
            pend.append(r)
            b = meta.size_bytes or 0
            pend_bytes += b
            total_bytes += b
            if pend_bytes >= target or len(pend) >= 128:
                _flush()
    _flush()
    if not splits and not groups:
        # zero bundles yielded: empty input. Preserve the output schema
        # when pinned; else fall back to the (empty, cheap) plan.
        if out_schema is not None:
            return ray.data.from_arrow(out_schema.empty_table())
        return ds.materialize()
    if not eager:
        _resolve_wiring(_auto_reducers(total_bytes, cpus), len(groups))
        for g in groups:
            _launch(g)
        del groups

    outs = []
    if seg_dir is not None:
        # Segment mode: the splits' returns are just M path strings —
        # wait for them (the exchange is a barrier regardless: no
        # reducer can start before every map ran), broadcast the list
        # once, and launch one range-reading reducer per partition.
        # Driver-held refs: M strings + P reduce outputs; no M x P
        # term, no merge tree. Past M > F maps, a push-merge
        # consolidation level (see the segment-mode block comment)
        # rewrites the M segments as ceil(P/R) per-partition-range
        # merged files so each reducer does ONE range-read instead of M.
        paths = ray.get(splits)
        paths_ref = ray.put(paths)
        r_parts = _segment_merge_parts(len(paths), p, fanin)
        if r_parts:
            bounds = list(range(0, p, r_parts))
            bounds.append(p)
            merged = [
                _merge_segment_range.remote(
                    bounds[g], bounds[g + 1], seg_dir, fp, paths_ref
                )
                for g in range(len(bounds) - 1)
            ]
            # each reducer takes its merger's return as a BARE ref:
            # group g's reducers launch the moment merger g finishes
            # (no driver barrier across the consolidation level)
            for i in range(p):
                g = i // r_parts
                outs.append(
                    _reduce_partition_segments.remote(
                        fn,
                        out_schema,
                        batch_format,
                        i - bounds[g],
                        fp,
                        merged[g],
                    )
                )
        else:
            for i in range(p):
                outs.append(
                    _reduce_partition_segments.remote(
                        fn, out_schema, batch_format, i, fp, paths_ref
                    )
                )
    elif gb is not None:
        # Grouped-returns wiring: splits returned ⌈P/W⌉ GROUP-OBJECTS
        # of W consecutive-partition slices each, cutting the driver's
        # transient ref matrix from M x P to max(M x ⌈P/W⌉, (M/F) x P).
        # An _ungroup_merge level (fan-in F over group-objects, W
        # returns) restores per-partition chunks, after which the
        # ordinary per-partition tree + reduce runs unchanged. Costs
        # one extra copy of the data through the object store, so it
        # auto-enables only past the driver-ref budget
        # (_auto_group_width); output is ref-for-ref equal to the
        # ungrouped wiring (tests/test_exchange_grouped.py).
        for c in range(n_g):
            grefs = [s[c] for s in splits]
            w = gb[c + 1] - gb[c]
            cols: list[list] = [[] for _ in range(w)]
            for j in range(0, len(grefs), fanin):
                rs = _ungroup_merge.options(num_returns=w).remote(
                    fp, w, *grefs[j : j + fanin]
                )
                for t in range(w):
                    cols[t].append(rs[t])
            for t in range(w):
                refs = cols[t]
                while len(refs) > fanin:
                    refs = [
                        _merge_slices.remote(fp, *refs[j : j + fanin])
                        for j in range(0, len(refs), fanin)
                    ]
                outs.append(
                    _reduce_partition.remote(
                        fn, out_schema, batch_format, fp, *refs
                    )
                )
    else:
        # Tree-merge each partition's slice column with bounded fan-in
        # F: with M <= F (every local-scale run) no merge task is
        # created and the wiring degenerates to the flat exchange;
        # beyond that, each level collapses F refs into one object
        # until a reducer's argument list fits F. Slice refs are
        # dropped level by level, so Ray frees consumed intermediate
        # objects as the tree drains.
        for i in range(p):
            refs = [s[i] for s in splits]
            while len(refs) > fanin:
                refs = [
                    _merge_slices.remote(fp, *refs[j : j + fanin])
                    for j in range(0, len(refs), fanin)
                ]
            outs.append(
                _reduce_partition.remote(fn, out_schema, batch_format, fp, *refs)
            )
    del splits
    if out_schema is not None:
        # empty partitions emit schema-correct empty blocks
        # (out_schema.empty_table() / cast), which downstream stages
        # skip harmlessly — no row-count sync needed, saving P tasks +
        # a driver barrier per exchange (P ~ 4e5 at the 100-TB point)
        return ray.data.from_arrow_refs(outs)
    # no pinned schema: drop 0-row partitions — Ray's map operators
    # emit an EMPTY-SCHEMA block for a 0-row input block (observed on
    # 2.49), and a fully-empty partition propagates that degenerate
    # block (see _reduce_partition), which poisons any downstream keyed
    # stage with a KeyError; the exchange is a barrier anyway, so this
    # row-count sync costs nothing extra here
    counts = ray.get([_num_rows.remote(o) for o in outs])
    keep = [o for o, n in zip(outs, counts) if n > 0]
    return ray.data.from_arrow_refs(keep or outs[:1])
