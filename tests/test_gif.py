"""GIF codec (stages/gif.py): LZW + container round-trips against our
own spec-clean encoder, composition semantics (transparency, disposal),
and the real FrameSampler video path over animated GIFs."""

import numpy as np
import pyarrow as pa
import pytest

from fineweb2_ro_ray.stages.gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
    quantize_rgb,
)


def test_lzw_roundtrip_widths_and_reset():
    rng = np.random.default_rng(0)
    for mcs in (2, 3, 4, 8):
        k = 1 << mcs
        for n in (0, 1, 2, 257, 5000):
            seq = rng.integers(0, k, size=n).astype(np.uint8)
            assert np.array_equal(_lzw_decode(_lzw_encode(seq, mcs), mcs, n), seq)
        # run-heavy stream exercises KwKwK; 30k noise forces ≥1 dict reset
        runs = np.repeat(rng.integers(0, k, 400), rng.integers(1, 50, 400)).astype(
            np.uint8
        )
        assert np.array_equal(
            _lzw_decode(_lzw_encode(runs, mcs), mcs, len(runs)), runs
        )
    noise = rng.integers(0, 256, size=30000).astype(np.uint8)
    enc = _lzw_encode(noise, 8)
    assert np.array_equal(_lzw_decode(enc, 8, len(noise)), noise)


def test_gif_roundtrip_plain_and_interlaced():
    rng = np.random.default_rng(1)
    for trial in range(4):
        h, w = int(rng.integers(2, 40)), int(rng.integers(2, 40))
        ncol = int(rng.integers(2, 257))
        pal = rng.integers(0, 256, size=(ncol, 3), dtype=np.uint8)
        px = pal[rng.integers(0, ncol, size=(h, w))]
        for interlace in (False, True):
            frames, delays = decode_gif(encode_gif(px, interlace=interlace))
            assert frames.shape == (1, h, w, 3)
            assert np.array_equal(frames[0], px)


def test_gif_animated_delays_and_duration():
    rng = np.random.default_rng(2)
    pal = rng.integers(0, 256, size=(40, 3), dtype=np.uint8)
    frames = pal[rng.integers(0, 40, size=(5, 17, 23))]
    out, delays = decode_gif(encode_gif(frames, delays_cs=[3, 6, 9, 12, 15]))
    assert np.array_equal(out, frames)
    assert delays == [3, 6, 9, 12, 15]


def test_gif_transparency_keeps_canvas_and_disposal_restores():
    # two-frame GIF: frame 2 is entirely the transparent color, so the
    # composed second frame must show frame 1's canvas underneath
    pal = np.array([[10, 20, 30], [200, 0, 0], [0, 200, 0]], np.uint8)
    f1 = pal[np.array([[1, 1], [2, 2]])]
    f2 = pal[np.array([[0, 0], [0, 0]])]  # all (10,20,30)
    g = encode_gif(np.stack([f1, f2]), transparent_rgb=(10, 20, 30), disposal=1)
    frames, _ = decode_gif(g)
    assert np.array_equal(frames[0], f1)
    assert np.array_equal(frames[1], f1)  # canvas kept under transparency
    # disposal 2 restores background between frames
    g2 = encode_gif(np.stack([f1, f2]), disposal=2)
    frames2, _ = decode_gif(g2)
    assert np.array_equal(frames2[0], f1)
    assert np.array_equal(frames2[1], f2)


def test_quantize_rejects_over_256_colors():
    grad = np.arange(300, dtype=np.uint16)
    px = np.stack(
        [grad % 256, grad // 256, np.zeros_like(grad)], axis=1
    ).astype(np.uint8).reshape(30, 10, 3)
    with pytest.raises(ValueError, match="distinct colors"):
        quantize_rgb(px)


def test_frame_sampler_real_gif(ray_session):
    import ray.data as rd

    from fineweb2_ro_ray.stages.gif import decode_gif as dg
    from fineweb2_ro_ray.stages.multimodal import (
        decode_bmp,
        sample_frames,
        synth_media,
    )

    t = synth_media(18, real=True)
    vids = t.filter(pa.compute.equal(t["kind"], "video"))
    assert vids.num_rows > 0
    out = (
        sample_frames(rd.from_arrow(t), n_frames=3, fake=False)
        .to_pandas()
        .sort_values(["media_id", "frame_idx"])
    )
    # every video row yields BMP frames matching its decoded GIF frames
    for mid, payload in zip(vids["media_id"].to_pylist(), vids["payload"].to_pylist()):
        frames, _ = dg(payload)
        rows = out[out.media_id == mid]
        n = min(3, frames.shape[0])
        assert len(rows) == n
        picks = np.linspace(0, frames.shape[0] - 1, n).round().astype(int)
        for (_, r), src in zip(rows.iterrows(), picks):
            assert np.array_equal(decode_bmp(r["frame"]), frames[src])
    # non-video rows pass through untouched as frame 0
    imgs = t.filter(pa.compute.equal(t["kind"], "image"))
    for mid in imgs["media_id"].to_pylist():
        assert list(out[out.media_id == mid].frame_idx) == [0]
