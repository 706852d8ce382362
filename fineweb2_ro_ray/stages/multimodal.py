"""Multimodal column plumbing — opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with a
``kind`` tag and JSON metadata; decode / feature-extract / resize /
frame-sample run as actor-pool ``map_batches`` stages with SMALL batch
sizes (payload bytes dominate block size — cap rows per batch, not
bytes).

Decode is REAL for the uncompressed formats parseable with the stdlib
+ numpy — PCM WAV (RIFF parse via ``wave``) and 24-bit BI_RGB BMP
(header + padded-row reshape) — including a real nearest-neighbor BMP
resize. COMPRESSED codecs (JPEG/PNG/MP4/...) need libraries absent
from this container: ``MediaDecoder(fake=False)`` raises
``NotImplementedError`` for those payloads, and ``fake=True``
substitutes a deterministic fake decode (crc-seeded dimensions + byte
stats) so the Ray-side plumbing — schema, batch sizing, actor
signature, output layout — stays testable for every modality.
"""

from __future__ import annotations

import io
import wave

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


def synth_media(n: int, seed: int = 42, real: bool = False) -> pa.Table:
    """Deterministic payload table (no external data). ``real=True``
    emits genuinely decodable payloads — BMP images and PCM WAV audio —
    so the non-fake decode path runs end to end in tests."""
    rng = np.random.default_rng(seed)
    kinds = ["image", "audio"] if real else ["image", "audio", "video"]
    rows = {"media_id": [], "conv_id": [], "kind": [], "payload": [], "meta": []}
    for i in range(n):
        k = kinds[i % len(kinds)]
        if not real:
            size = int(rng.integers(200, 5000))
            payload = rng.integers(0, 256, size=size, dtype=np.uint8).tobytes()
            meta = {"codec": "fake", "bytes": size}
        elif k == "image":
            w, h = int(rng.integers(4, 40)), int(rng.integers(4, 40))
            payload = encode_bmp(rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8))
            meta = {"codec": "bmp", "width": w, "height": h}
        else:
            rate = int(rng.choice([8000, 16000, 44100]))
            n_samp = int(rng.integers(100, 4000))
            t = np.arange(n_samp) / rate
            f0 = float(rng.uniform(100, 2000))
            samples = (np.sin(2 * np.pi * f0 * t) * 12000).astype(np.int16)
            payload = encode_wav(samples, rate)
            meta = {"codec": "pcm_s16le", "rate": rate, "samples": n_samp}
        rows["media_id"].append(i)
        rows["conv_id"].append(f"conv-{i % 7:08d}")
        rows["kind"].append(k)
        rows["payload"].append(payload)
        rows["meta"].append(json.dumps(meta))
    return pa.table(rows, schema=MEDIA_SCHEMA)


# ---------------------------------------------------------------------------
# real codecs for the uncompressed formats (stdlib + numpy only)
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, rate: int, channels: int = 1) -> bytes:
    """int16 PCM → RIFF/WAVE bytes (stdlib ``wave``)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(np.ascontiguousarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[int, int, np.ndarray]:
    """RIFF/WAVE PCM bytes → (rate, channels, int16 samples)."""
    with wave.open(io.BytesIO(data), "rb") as w:
        if w.getsampwidth() != 2:
            raise NotImplementedError("only 16-bit PCM WAV is parsed here")
        rate, ch = w.getframerate(), w.getnchannels()
        raw = w.readframes(w.getnframes())
    return rate, ch, np.frombuffer(raw, dtype="<i2")


def encode_bmp(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit BI_RGB BMP (bottom-up, 4-byte
    padded rows — the format's own layout rules)."""
    h, w, _ = pixels.shape
    row = w * 3
    pad = (-row) % 4
    stride = row + pad
    img = np.zeros((h, stride), np.uint8)
    img[:, :row] = pixels[::-1, :, ::-1].reshape(h, row)  # bottom-up, BGR
    data = img.tobytes()
    import struct

    header = struct.pack(
        "<2sIHHIIiiHHIIiiII",
        b"BM", 54 + len(data), 0, 0, 54,
        40, w, h, 1, 24, 0, len(data), 2835, 2835, 0, 0,
    )
    return header + data


def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit BI_RGB BMP → (h, w, 3) uint8 RGB."""
    import struct

    if data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", data, 10)[0]
    w, h = struct.unpack_from("<ii", data, 18)
    bpp = struct.unpack_from("<H", data, 28)[0]
    comp = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or comp != 0:
        raise NotImplementedError("only uncompressed 24-bit BMP is parsed here")
    flip = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    img = np.frombuffer(data, np.uint8, count=h * stride, offset=off).reshape(h, stride)
    px = img[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR → RGB
    return px[::-1] if flip else px


class MediaDecoder:
    """Actor-pool decode stage. REAL for uncompressed payloads (sniffed
    by magic bytes): 24-bit BMP images (true dims + pixel mean) and PCM
    WAV audio (rate / channels / duration / RMS). Compressed codecs
    (JPEG/PNG/MP4/…) need libraries absent from this container and
    raise ``NotImplementedError``; ``fake=True`` produces deterministic
    pseudo-decodes for any payload so downstream plumbing is testable.

    Output columns: width/height (images; null for audio),
    sample_rate/n_channels/duration_ms/rms (audio; null for images),
    n_bytes/checksum (all)."""

    _FIELDS = [
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_bytes", pa.int64()),
        ("checksum", pa.int64()),
        ("sample_rate", pa.int32()),
        ("n_channels", pa.int32()),
        ("duration_ms", pa.int32()),
        ("rms", pa.float32()),
    ]

    def __init__(self, fake: bool = False) -> None:
        self.fake = fake

    def _decode(self, payload: bytes, kind: str) -> dict:
        crc = zlib.crc32(payload)
        base = {f: None for f, _ in self._FIELDS}
        base.update(n_bytes=len(payload), checksum=crc)
        if self.fake:
            base.update(width=16 + crc % 64, height=16 + (crc >> 8) % 64)
            return base
        if payload[:2] == b"BM":
            px = decode_bmp(payload)
            base.update(width=px.shape[1], height=px.shape[0])
            return base
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            rate, ch, samples = decode_wav(payload)
            n_frames = len(samples) // max(1, ch)
            rms = float(np.sqrt(np.mean((samples.astype(np.float64) / 32768.0) ** 2))) if len(samples) else 0.0
            base.update(
                sample_rate=rate,
                n_channels=ch,
                duration_ms=int(round(1000 * n_frames / rate)),
                rms=rms,
            )
            return base
        raise NotImplementedError(
            "compressed media codecs are not available in this environment "
            "(real decode covers BMP + PCM WAV); construct "
            "MediaDecoder(fake=True) for the deterministic stub"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_pylist()
        kinds = batch["kind"].to_pylist()
        decs = [self._decode(p, k) for p, k in zip(payloads, kinds)]
        for field, typ in self._FIELDS:
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
    """Resize stage (images). REAL nearest-neighbor resize for BMP
    payloads (decode → index-grid gather → re-encode); other codecs
    raise ``NotImplementedError`` (compressed formats need absent
    libraries). The fake path emits a deterministic byte-subsampled
    payload instead, so schema/batching stay testable for any bytes."""

    def __init__(self, target_w: int = 32, target_h: int = 32, fake: bool = False) -> None:
        self.tw, self.th, self.fake = target_w, target_h, fake

    def _resize_real(self, p: bytes) -> bytes:
        if p[:2] != b"BM":
            raise NotImplementedError(
                "real resize covers BMP only in this environment; "
                "construct MediaResizer(fake=True) for the deterministic stub"
            )
        px = decode_bmp(p)
        h, w, _ = px.shape
        yi = np.minimum((np.arange(self.th) * h) // self.th, h - 1)
        xi = np.minimum((np.arange(self.tw) * w) // self.tw, w - 1)
        return encode_bmp(px[yi][:, xi])

    def __call__(self, batch: pa.Table) -> pa.Table:
        if not self.fake:
            out = [self._resize_real(p) for p in batch["payload"].to_pylist()]
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
