"""Multimodal column plumbing — opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with a
``kind`` tag and JSON metadata; decode / feature-extract / resize /
frame-sample run as actor-pool ``map_batches`` stages with SMALL batch
sizes (payload bytes dominate block size — cap rows per batch, not
bytes).

The real codec libraries are not in this container, so the decode step
is STUBBED: ``MediaDecoder(fake=False)`` raises ``NotImplementedError``
at first batch; ``fake=True`` substitutes a deterministic fake decode
(crc-seeded dimensions + byte stats) so the Ray-side plumbing — schema,
batch sizing, actor signature, output layout — is real and tested.
"""

from __future__ import annotations

import json
import zlib

import numpy as np
import pyarrow as pa

import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("media_id", pa.int64()),
        pa.field("conv_id", pa.string()),
        pa.field("kind", pa.string()),  # image | audio | video
        pa.field("payload", pa.binary()),
        pa.field("meta", pa.string()),  # JSON: codec, claimed dims, etc.
    ]
)


def synth_media(n: int, seed: int = 42) -> pa.Table:
    """Deterministic fake payload table (no external data)."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio", "video"]
    rows = {"media_id": [], "conv_id": [], "kind": [], "payload": [], "meta": []}
    for i in range(n):
        k = kinds[i % 3]
        size = int(rng.integers(200, 5000))
        payload = rng.integers(0, 256, size=size, dtype=np.uint8).tobytes()
        rows["media_id"].append(i)
        rows["conv_id"].append(f"conv-{i % 7:08d}")
        rows["kind"].append(k)
        rows["payload"].append(payload)
        rows["meta"].append(json.dumps({"codec": "fake", "bytes": size}))
    return pa.table(rows, schema=MEDIA_SCHEMA)


class MediaDecoder:
    """Actor-pool decode stage. Real decoding (PIL/ffmpeg/soundfile) is
    unavailable in this container — STUB. ``fake=True`` produces
    deterministic pseudo-decodes so downstream plumbing is testable."""

    def __init__(self, fake: bool = False) -> None:
        self.fake = fake

    def _decode(self, payload: bytes, kind: str) -> dict:
        if not self.fake:
            raise NotImplementedError(
                "media codecs are not available in this environment; "
                "construct MediaDecoder(fake=True) for the deterministic stub"
            )
        crc = zlib.crc32(payload)
        return {
            "width": 16 + crc % 64,
            "height": 16 + (crc >> 8) % 64,
            "n_bytes": len(payload),
            "checksum": crc,
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        kinds = batch["kind"].to_pylist()
        decs = [self._decode(p, k) for p, k in zip(payloads, kinds)]
        for field, typ in [
            ("width", pa.int32()),
            ("height", pa.int32()),
            ("n_bytes", pa.int64()),
            ("checksum", pa.int64()),
        ]:
            batch = batch.append_column(field, pa.array([d[field] for d in decs], typ))
        return batch


class MediaFeaturizer:
    """Feature extraction over decoded payloads: a deterministic 16-dim
    byte-histogram embedding (the model-based extractor would load its
    weights here, once per actor)."""

    DIM = 16

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        feats = np.zeros((len(payloads), self.DIM), dtype=np.float32)
        for i, p in enumerate(payloads):
            arr = np.frombuffer(p, dtype=np.uint8)
            hist = np.bincount(arr >> 4, minlength=self.DIM).astype(np.float32)
            feats[i] = hist / max(1, len(arr))
        col = pa.FixedSizeListArray.from_arrays(
            pa.array(feats.reshape(-1)), self.DIM
        )
        return batch.append_column("features", col)


class MediaResizer:
    """Resize stage (images): real resizing needs a codec library —
    STUB behind ``fake``; the fake path emits a deterministic
    byte-subsampled payload plus the true target dimensions, so the
    binary-out schema, payload-size reduction and row-capped batching
    are all real."""

    def __init__(self, target_w: int = 32, target_h: int = 32, fake: bool = False) -> None:
        self.tw, self.th, self.fake = target_w, target_h, fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "image codecs are not available in this environment; "
                "construct MediaResizer(fake=True) for the deterministic stub"
            )
        target = self.tw * self.th
        out = []
        for p in batch["payload"].to_pylist():
            arr = np.frombuffer(p, dtype=np.uint8)
            step = max(1, len(arr) // target)
            out.append(arr[::step][:target].tobytes())
        return (
            batch.drop_columns(["payload"])
            .append_column("payload", pa.array(out, pa.binary()))
            .append_column(
                "width", pa.array(np.full(batch.num_rows, self.tw, np.int32))
            )
            .append_column(
                "height", pa.array(np.full(batch.num_rows, self.th, np.int32))
            )
        )


class FrameSampler:
    """Frame-sample stage (videos): one INPUT row → ``n_frames`` OUTPUT
    rows (the flat-map shape over binary columns). The fake decode
    slices the payload into equal frame windows; a real build would
    seek keyframes. Non-video rows pass through as a single frame 0."""

    def __init__(self, n_frames: int = 4, fake: bool = False) -> None:
        self.n_frames, self.fake = n_frames, fake

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            raise NotImplementedError(
                "video codecs are not available in this environment; "
                "construct FrameSampler(fake=True) for the deterministic stub"
            )
        ids, convs, kinds = (
            batch["media_id"].to_pylist(),
            batch["conv_id"].to_pylist(),
            batch["kind"].to_pylist(),
        )
        out = {"media_id": [], "conv_id": [], "frame_idx": [], "frame": []}
        for mid, conv, kind, p in zip(ids, convs, kinds, batch["payload"].to_pylist()):
            if kind != "video":
                out["media_id"].append(mid)
                out["conv_id"].append(conv)
                out["frame_idx"].append(0)
                out["frame"].append(p)
                continue
            n = max(1, min(self.n_frames, len(p)))
            w = len(p) // n
            for f in range(n):
                out["media_id"].append(mid)
                out["conv_id"].append(conv)
                out["frame_idx"].append(f)
                out["frame"].append(p[f * w : (f + 1) * w] if w else p)
        return pa.table(
            {
                "media_id": pa.array(out["media_id"], pa.int64()),
                "conv_id": pa.array(out["conv_id"], pa.string()),
                "frame_idx": pa.array(out["frame_idx"], pa.int32()),
                "frame": pa.array(out["frame"], pa.binary()),
            }
        )


def sample_frames(
    ds: ray.data.Dataset, *, n_frames: int = 4, fake: bool = True, batch_size: int = 32
) -> ray.data.Dataset:
    """Video → per-frame rows (row-capped batches; frames multiply the
    byte volume, so the cap is on input rows)."""
    return ds.map_batches(
        FrameSampler,
        fn_constructor_kwargs={"n_frames": n_frames, "fake": fake},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, 4),
    )


def decode_and_featurize(
    ds: ray.data.Dataset, *, fake: bool = True, batch_size: int = 64
) -> ray.data.Dataset:
    """The multimodal pipeline shape: small batches (payload-heavy
    rows), actor pools for both stages."""
    ds = ds.map_batches(
        MediaDecoder,
        fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, 4),
    )
    return ds.map_batches(
        MediaFeaturizer, batch_format="pyarrow", batch_size=batch_size, concurrency=(1, 4)
    )
