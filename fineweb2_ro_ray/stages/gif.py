"""GIF codec in pure numpy + stdlib — the third real compressed image
codec (after zlib-PNG and baseline/progressive JPEG), and the first one
that makes the VIDEO lane real: animated GIF is a genuine multi-frame
compressed container, so ``FrameSampler`` can decode and sample actual
frames instead of the fake byte-window stub.

Covers, per the GIF89a spec (public: https://www.w3.org/Graphics/GIF/
spec-gif89a.txt):

- variable-width LZW (3..12-bit codes, CLEAR/EOI, 4096-entry dict with
  mid-stream CLEAR reset, KwKwK case), sub-block packaging;
- global + local color tables, interlaced images (4-pass row order),
  frame offsets smaller than the logical screen;
- Graphic Control Extensions: per-frame delay, transparency index,
  disposal methods 1 (keep) and 2 (restore to background);
- encoder emits spec-clean GIF89a for ground-truth round-trip tests
  (palette-quantized input, optional interlace / transparency).

Reference parity note: the reference pipeline treats media as opaque
rows; frame sampling here is the Ray-native extension (SURVEY §2
multimodal family). Decode is per-payload sequential by nature (LZW is
a serial code stream); parallelism comes from the actor pool over rows,
not from inside a payload.
"""

from __future__ import annotations

import numpy as np

_MAX_CODE = 1 << 12  # GIF LZW hard cap


# ---------------------------------------------------------------------------
# LZW (GIF variant: variable code width, CLEAR/EOI)
# ---------------------------------------------------------------------------


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """Palette indices → GIF LZW code stream (no sub-block framing)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width = min_code_size + 1
    table: dict[tuple[int, int], int] = {}
    avail = eoi + 1  # next slot to assign (giflib RunningCode)
    emit(clear, width)
    seq = [int(v) for v in indices]
    if not seq:
        emit(eoi, width)
        if nbits:
            out.append(acc & 0xFF)
        return bytes(out)
    prefix = seq[0]
    for k in seq[1:]:
        key = (prefix, k)
        nxt = table.get(key)
        if nxt is not None:
            prefix = nxt
            continue
        emit(prefix, width)
        # canonical (giflib) width rule: the code emitted WHILE the
        # next-slot counter sits at 2^width is still old-width; the
        # bump lands after it, pre-insert — decoder mirrors this with
        # its own per-code counter
        if avail >= (1 << width) and width < 12:
            width += 1
        if avail >= _MAX_CODE - 1:  # table full: reset (giflib LZ_MAX_CODE)
            emit(clear, width)
            table.clear()
            width = min_code_size + 1
            avail = eoi + 1
        else:
            table[key] = avail
            avail += 1
        prefix = k
    emit(prefix, width)
    # same bump check as in-loop (giflib flushes the last data code
    # through the same path): the decoder may widen before reading EOI
    if avail >= (1 << width) and width < 12:
        width += 1
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int, n_expected: int) -> np.ndarray:
    """GIF LZW code stream → palette indices (length ``n_expected``)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    base = [bytes([i]) for i in range(clear)]
    out = bytearray()
    # spec does not require a leading CLEAR: start in post-clear state
    table: list[bytes] = list(base) + [b"", b""]
    width = min_code_size + 1
    cnt = eoi + 1  # giflib RunningCode: counts data codes, not table adds
    prev: bytes | None = None

    buf = np.frombuffer(data, dtype=np.uint8)
    acc = 0
    nbits = 0
    pos = 0
    n = len(buf)
    while len(out) < n_expected:
        while nbits < width:
            if pos >= n:
                raise ValueError("GIF: LZW stream truncated")
            acc |= int(buf[pos]) << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(base) + [b"", b""]  # placeholders at clear/eoi slots
            width = min_code_size + 1
            cnt = eoi + 1
            prev = None
            continue
        if code == eoi:
            break
        can_add = len(table) < _MAX_CODE  # deferred-clear encoders freeze here
        if prev is None:
            if code >= len(table):
                raise ValueError(f"GIF: literal code {code} out of range")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if can_add:
                table.append(prev + entry[:1])
        elif code == len(table) and can_add:  # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"GIF: LZW code {code} out of range")
        out += entry
        # giflib width rule, mirrored from the encoder: the per-code
        # counter (NOT table length — the decoder's adds lag the
        # encoder's by one code) crosses 2^width → next code is wider
        if cnt < _MAX_CODE + 1:
            cnt += 1
            if cnt > (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) < n_expected:
        raise ValueError(f"GIF: LZW produced {len(out)} of {n_expected} pixels")
    return np.frombuffer(bytes(out[:n_expected]), dtype=np.uint8)


# ---------------------------------------------------------------------------
# container
# ---------------------------------------------------------------------------

_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(h: int) -> np.ndarray:
    return np.concatenate([np.arange(start, h, step) for start, step in _INTERLACE_PASSES])


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def quantize_rgb(px: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(h,w,3) uint8 → (palette (k,3), indices (h,w)); requires ≤256
    distinct colors (synthetic ground-truth inputs are built that way —
    a full median-cut quantizer is out of scope for a codec test rig)."""
    flat = px.reshape(-1, 3).astype(np.uint32)
    keys = (flat[:, 0] << 16) | (flat[:, 1] << 8) | flat[:, 2]
    uniq, inv = np.unique(keys, return_inverse=True)
    if len(uniq) > 256:
        raise ValueError(f"GIF encode: {len(uniq)} distinct colors > 256")
    palette = np.stack(
        [(uniq >> 16) & 0xFF, (uniq >> 8) & 0xFF, uniq & 0xFF], axis=1
    ).astype(np.uint8)
    return palette, inv.reshape(px.shape[:2]).astype(np.uint8)


def encode_gif(
    frames: np.ndarray,
    *,
    delays_cs: list[int] | None = None,
    interlace: bool = False,
    transparent_rgb: tuple[int, int, int] | None = None,
    disposal: int = 1,
) -> bytes:
    """(n,h,w,3) or (h,w,3) uint8 → GIF89a bytes. One global color
    table shared by all frames (palette union must fit 256).
    ``transparent_rgb`` names the transparent COLOR (resolved to its
    quantized palette slot — the palette is sort-ordered, so a raw
    index would be caller-unpredictable)."""
    if frames.ndim == 3:
        frames = frames[None]
    n, h, w, _ = frames.shape
    palette, _ = quantize_rgb(frames.reshape(n * h, w, 3))
    k = len(palette)
    gct_bits = max(1, int(np.ceil(np.log2(max(k, 2)))))
    gct_size = 1 << gct_bits
    pad = np.zeros((gct_size - k, 3), np.uint8)
    gct = np.concatenate([palette, pad])

    lut = {
        (int(r) << 16) | (int(g) << 8) | int(b): i
        for i, (r, g, b) in enumerate(palette)
    }

    out = bytearray(b"GIF89a")
    out += int(w).to_bytes(2, "little") + int(h).to_bytes(2, "little")
    out.append(0x80 | ((gct_bits - 1) << 4) | (gct_bits - 1))  # GCT flag+sizes
    out.append(0)  # background color index
    out.append(0)  # pixel aspect ratio
    out += gct.tobytes()

    if n > 1:  # NETSCAPE2.0 loop extension, standard for animations
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"

    transparent_index = None
    if transparent_rgb is not None:
        r, g_, b = (int(v) for v in transparent_rgb)
        transparent_index = lut.get((r << 16) | (g_ << 8) | b)
        if transparent_index is None:
            raise ValueError("transparent_rgb not present in the palette")

    delays = delays_cs or [10] * n
    mcs = max(2, gct_bits)
    for f in range(n):
        flags = (disposal & 0x7) << 2
        tidx = 0
        if transparent_index is not None:
            flags |= 1
            tidx = transparent_index
        out += b"\x21\xf9\x04"
        out.append(flags)
        out += int(delays[f % len(delays)]).to_bytes(2, "little")
        out.append(tidx)
        out.append(0)
        # image descriptor: full-frame, global table
        out += b"\x2c"
        out += (0).to_bytes(2, "little") * 2
        out += int(w).to_bytes(2, "little") + int(h).to_bytes(2, "little")
        out.append(0x40 if interlace else 0x00)
        fl = frames[f].reshape(-1, 3).astype(np.uint32)
        keys = (fl[:, 0] << 16) | (fl[:, 1] << 8) | fl[:, 2]
        idx = np.array([lut[int(key)] for key in keys], np.uint8).reshape(h, w)
        if interlace:
            idx = idx[_interlace_order(h)]
        out.append(mcs)
        out += _sub_blocks(_lzw_encode(idx.ravel(), mcs))
    out += b"\x3b"
    return bytes(out)


def _read_sub_blocks(data: bytes, pos: int) -> tuple[bytes, int]:
    out = bytearray()
    while True:
        if pos >= len(data):
            raise ValueError("GIF: truncated sub-blocks")
        ln = data[pos]
        pos += 1
        if ln == 0:
            return bytes(out), pos
        out += data[pos : pos + ln]
        pos += ln
    # unreachable


def decode_gif(data: bytes) -> tuple[np.ndarray, list[int]]:
    """GIF bytes → ((n,h,w,3) uint8 composed frames, per-frame delays
    in centiseconds). Handles GCT/LCT, interlace, frame offsets,
    transparency, disposal 1 (keep) / 2 (restore background)."""
    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    w = int.from_bytes(data[6:8], "little")
    h = int.from_bytes(data[8:10], "little")
    packed = data[10]
    bg_index = data[11]
    pos = 13
    gct = None
    if packed & 0x80:
        size = 2 << (packed & 0x7)
        gct = np.frombuffer(data[pos : pos + 3 * size], np.uint8).reshape(size, 3)
        pos += 3 * size

    canvas = np.zeros((h, w, 3), np.uint8)
    if gct is not None and bg_index < len(gct):
        canvas[:] = gct[bg_index]
    bg_fill = canvas[0, 0].copy() if h and w else np.zeros(3, np.uint8)

    frames: list[np.ndarray] = []
    delays: list[int] = []
    delay = 0
    transparent: int | None = None
    disposal = 0
    while pos < len(data):
        b0 = data[pos]
        pos += 1
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension
            label = data[pos]
            pos += 1
            if label == 0xF9:  # graphic control
                blk, pos = _read_sub_blocks(data, pos)
                flags = blk[0]
                delay = int.from_bytes(blk[1:3], "little")
                transparent = blk[3] if flags & 1 else None
                disposal = (flags >> 2) & 0x7
            else:  # comment / app / plain text: skip
                _, pos = _read_sub_blocks(data, pos)
            continue
        if b0 != 0x2C:
            raise ValueError(f"GIF: unexpected block 0x{b0:02x}")
        left = int.from_bytes(data[pos : pos + 2], "little")
        top = int.from_bytes(data[pos + 2 : pos + 4], "little")
        fw = int.from_bytes(data[pos + 4 : pos + 6], "little")
        fh = int.from_bytes(data[pos + 6 : pos + 8], "little")
        iflags = data[pos + 8]
        pos += 9
        table = gct
        if iflags & 0x80:
            size = 2 << (iflags & 0x7)
            table = np.frombuffer(data[pos : pos + 3 * size], np.uint8).reshape(size, 3)
            pos += 3 * size
        if table is None:
            raise ValueError("GIF: image with no color table")
        mcs = data[pos]
        pos += 1
        stream, pos = _read_sub_blocks(data, pos)
        idx = _lzw_decode(stream, mcs, fw * fh).reshape(fh, fw)
        if iflags & 0x40:
            deinter = np.empty_like(idx)
            deinter[_interlace_order(fh)] = idx
            idx = deinter
        region = canvas[top : top + fh, left : left + fw]
        px = table[np.minimum(idx, len(table) - 1)]
        if transparent is not None:
            opaque = idx != transparent
            region[opaque] = px[opaque]
        else:
            region[:] = px
        frames.append(canvas.copy())
        delays.append(delay)
        if disposal == 2:
            canvas[top : top + fh, left : left + fw] = bg_fill
        transparent = None
        delay = 0
        disposal = 0
    if not frames:
        raise ValueError("GIF: no image blocks")
    return np.stack(frames), delays
