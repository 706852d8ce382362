"""Source/sink utilities mirroring the reference's S-family operators
(SURVEY.md §2.1) in Ray Data terms."""

from __future__ import annotations

import ray.data


def read_transcripts_json(path: str | list[str]) -> ray.data.Dataset:
    """S4: JSON shard loader (``/root/reference/small_model_inference/
    shard_manager.py:52-58``) — Ray-native: one call reads a directory
    of shards with file-level parallelism."""
    return ray.data.read_json(path)


def write_sharded_parquet(
    ds: ray.data.Dataset, path: str, rows_per_file: int = 1300
) -> None:
    """S2: fixed-size shard writer (1300-doc shards,
    ``fineweb/fineweb2_download.py:27-37``). Durability comes from the
    deterministic partitioned layout + lineage manifest, not a mirror
    copy."""
    ds.write_parquet(path, min_rows_per_file=rows_per_file)


def json_to_parquet(src: str, dst: str, columns: list[str] | None = None) -> None:
    """S6: streaming JSON→Parquet converter (``small_model_inference/
    parquet.py:8-35``) — a read + optional projection + write; the
    streaming executor handles incremental batching."""
    ds = ray.data.read_json(src)
    if columns:
        ds = ds.select_columns(columns)
    ds.write_parquet(dst)


def concat_shards(src: str, dst: str) -> None:
    """S7: shard concatenator (``small_model_inference/json_joiner.py:6-28``)
    — at scale keep multi-file output; repartition(1) only for small
    exports."""
    ray.data.read_parquet(src).repartition(1).write_parquet(dst)
