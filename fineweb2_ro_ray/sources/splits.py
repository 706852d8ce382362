"""Deterministic dataset splits (K3).

The reference splits by shard index (test = shards 1-16, val = 17-24,
train = rest — ``/root/reference/training/shard_loader.py:8-10,24-42``)
and *asserts* disjointness (``:72-74``). For transcripts the unit that
must stay together is the conversation, so we split by a hash of
``conv_id`` — deterministic, stable across runs and cluster sizes, and
whole conversations land in exactly one split.

Hash: first 6 bytes of md5 (big-endian) mod 100 — chosen over crc32
(round 1) because it is expressible in ANSI SQL
(``('0x' || substr(md5(key), 1, 12))::BIGINT % 100``), which makes the
split assignment oracle-checkable end to end; 48 bits keeps the band
bias < 2^-40."""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

SPLITS = {"test": (0, 8), "val": (8, 12), "train": (12, 100)}  # % bands


def hash_band(key: str) -> int:
    """THE canonical md5 band hash (0..99) — single definition shared
    by splits and hash-fraction sampling; its SQL mirror is
    ``('0x' || substr(md5(key), 1, 12))::BIGINT % 100``."""
    return int.from_bytes(hashlib.md5(key.encode("utf-8")).digest()[:6], "big") % 100


def split_of(conv_id: str) -> str:
    h = hash_band(conv_id)
    for name, (lo, hi) in SPLITS.items():
        if lo <= h < hi:
            return name
    raise AssertionError


def add_split_column(batch: pa.Table, key: str = "conv_id") -> pa.Table:
    col = batch[key]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    dic = col.dictionary_encode()
    import numpy as np

    lut = np.array([SPLIT_IDS[split_of(u)] for u in dic.dictionary.to_pylist()], np.int8)
    names = np.array(list(SPLIT_IDS), dtype=object)
    idx = dic.indices.to_numpy(zero_copy_only=False)
    return batch.append_column("split", pa.array(names[lut[idx]], pa.string()))


SPLIT_IDS = {name: i for i, name in enumerate(SPLITS)}


def _filter(b: pa.Table, name: str, key: str) -> pa.Table:
    b = add_split_column(b, key)
    return b.filter(pc.equal(b["split"], name)).drop_columns(["split"])


def select_split(ds: ray.data.Dataset, name: str, key: str = "conv_id") -> ray.data.Dataset:
    assert name in SPLITS
    return ds.map_batches(lambda b: _filter(b, name, key), batch_format="pyarrow")
