"""Baseline JPEG codec in pure numpy + stdlib — no external libraries.

Closes the "compressed codecs are env-gated" gap for JPEG the same way
``multimodal.decode_png`` closed it for PNG: baseline sequential JPEG
(ITU T.81, SOF0) needs only marker parsing, canonical Huffman
decoding, dequantization, an 8x8 IDCT (one numpy matmul pair) and
chroma upsampling — all expressible with the stdlib + numpy. The
DECODER is general baseline: it reads the quant/Huffman tables FROM
THE STREAM (any encoder's tables, Annex K included), supports
grayscale and interleaved YCbCr with arbitrary 1-2x sampling factors
(4:4:4, 4:2:2, 4:2:0), multi-scan-segment entropy data with restart
markers (DRI/RSTn), and refuses progressive (SOF2) / arithmetic /
12-bit streams with ``NotImplementedError`` rather than guessing.

The ENCODER exists to ground-truth the decoder without external test
vectors: it emits valid baseline streams (its own canonical Huffman
tables and quant tables are embedded in DHT/DQT, as the format
requires) for gray/RGB at 4:4:4 or 4:2:0 with optional restart
intervals. With a flat quant table (quality=100 here ⇒ all-ones) and
4:4:4, a round trip is exact up to DCT rounding (±2/channel), and a
single-DCT-block flat-color image decodes bit-exactly.

Scale note: entropy decoding is an inherently sequential bit walk —
a per-payload Python loop. That is the correct shape for the
metadata/feature-extraction stages this engine runs (dims, pixel
stats, thumbnails on row-capped actor-pool batches); a pixel-heavy
100 TB image corpus would swap this kernel for a native lib in the
same ``MediaDecoder`` slot, which is exactly the swap point the
multimodal stage documents.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# shared tables
# ---------------------------------------------------------------------------


def _zigzag() -> np.ndarray:
    """The 64-entry zigzag scan order, generated (not transcribed):
    diagonals by i+j; odd diagonals run top-right→bottom-left (by i),
    even ones bottom-left→top-right (by j)."""
    cells = sorted(
        ((i, j) for i in range(8) for j in range(8)),
        key=lambda t: (t[0] + t[1], t[0] if (t[0] + t[1]) % 2 else t[1]),
    )
    return np.array([i * 8 + j for i, j in cells], dtype=np.int64)


_ZZ = _zigzag()
_UNZZ = np.argsort(_ZZ)


def _dct_matrix() -> np.ndarray:
    n = np.arange(8)
    k = n[:, None]
    t = np.cos((2 * n[None, :] + 1) * k * np.pi / 16) * np.sqrt(2 / 8)
    t[0] /= np.sqrt(2)
    return t


_T = _dct_matrix()


def _quant_table(quality: int) -> np.ndarray:
    """Simple embedded quant table: all-ones at quality>=100 (near
    lossless), else 1 + (1+i+j)*scale — the classic example-table
    formula. The exact values never matter for decode correctness:
    they ship in DQT."""
    if quality >= 100:
        return np.ones((8, 8), dtype=np.int64)
    scale = max(1, (100 - quality) // 4)
    i, j = np.meshgrid(np.arange(8), np.arange(8), indexing="ij")
    return (1 + (1 + i + j) * scale).astype(np.int64)


# ---------------------------------------------------------------------------
# canonical Huffman (shared by encoder table-build and decoder)
# ---------------------------------------------------------------------------


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) per T.81 C.2 canonical assignment."""
    out, code = {}, 0
    i = 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            out[vals[i]] = (code, ln)
            code += 1
            i += 1
        code <<= 1
    return out


class _HuffDecoder:
    """min/max-code per length decoder (T.81 F.2.2.3 shape)."""

    def __init__(self, bits: list[int], vals: list[int]) -> None:
        self.vals = vals
        self.mincode = [0] * 17
        self.maxcode = [-1] * 17
        self.valptr = [0] * 17
        code, k = 0, 0
        for ln in range(1, 17):
            if bits[ln - 1]:
                self.valptr[ln] = k
                self.mincode[ln] = code
                code += bits[ln - 1]
                k += bits[ln - 1]
                self.maxcode[ln] = code - 1
            code <<= 1

    def decode(self, br: "_BitReader") -> int:
        code = br.bit()
        ln = 1
        while code > self.maxcode[ln]:
            ln += 1
            if ln > 16:
                raise ValueError("corrupt JPEG: Huffman code over 16 bits")
            code = (code << 1) | br.bit()
        return self.vals[self.valptr[ln] + code - self.mincode[ln]]


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.d = data
        self.pos = 0
        self.bit_pos = 0

    def bit(self) -> int:
        if self.pos >= len(self.d):
            raise ValueError("corrupt JPEG: entropy stream exhausted")
        b = (self.d[self.pos] >> (7 - self.bit_pos)) & 1
        self.bit_pos += 1
        if self.bit_pos == 8:
            self.bit_pos = 0
            self.pos += 1
        return b

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _extend(v: int, ssss: int) -> int:
    return v - (1 << ssss) + 1 if ssss and v < (1 << (ssss - 1)) else v


# ---------------------------------------------------------------------------
# encoder
# ---------------------------------------------------------------------------


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | code
        self.n += length
        while self.n >= 8:
            self.n -= 8
            byte = (self.acc >> self.n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
        self.acc &= (1 << self.n) - 1

    def align(self) -> None:
        if self.n:
            self.write((1 << (8 - self.n)) - 1, 8 - self.n)  # pad with 1s


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _mag_bits(v: int, ssss: int) -> int:
    return v if v >= 0 else v + (1 << ssss) - 1


def _build_tables() -> tuple[dict, dict, list, list]:
    """Fixed valid canonical tables the encoder embeds: 12 DC
    categories at length 4 (16 codes, no all-ones used); all 256
    possible AC RRRRSSSS symbols split 255 at length 9 + 1 at length
    10 (a DHT count byte caps at 255) — ample code-space slack."""
    dc_bits = [0] * 16
    dc_bits[3] = 12  # length 4
    dc_vals = list(range(12))
    ac_bits = [0] * 16
    ac_bits[8] = 255  # length 9
    ac_bits[9] = 1  # length 10
    ac_vals = list(range(256))
    return (
        _canonical_codes(dc_bits, dc_vals),
        _canonical_codes(ac_bits, ac_vals),
        dc_bits,
        ac_bits,
    )


_DC_CODES, _AC_CODES, _DC_BITS, _AC_BITS = _build_tables()
_DC_VALS = list(range(12))
_AC_VALS = list(range(256))


def _blocks_of(plane: np.ndarray) -> np.ndarray:
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _encode_block(
    w: _BitWriter, zz: np.ndarray, pred: int, dc_codes: dict, ac_codes: dict
) -> int:
    dc = int(zz[0])
    diff = dc - pred
    s = _category(diff)
    c, ln = dc_codes[s]
    w.write(c, ln)
    if s:
        w.write(_mag_bits(diff, s), s)
    run = 0
    nz = np.flatnonzero(zz[1:])
    last = nz[-1] + 1 if len(nz) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if k > last:
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, ln = ac_codes[0xF0]
            w.write(c, ln)
            run -= 16
        s = _category(v)
        c, ln = ac_codes[(run << 4) | s]
        w.write(c, ln)
        w.write(_mag_bits(v, s), s)
        run = 0
    if last < 63:
        c, ln = ac_codes[0x00]
        w.write(c, ln)
    return dc


def encode_jpeg(
    pixels: np.ndarray,
    quality: int = 100,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """uint8 (h, w) gray or (h, w, 3) RGB → baseline JFIF bytes."""
    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    q = _quant_table(quality)
    if gray:
        planes = [px.astype(np.float64) - 128.0]
        samp = [(1, 1)]
    else:
        r, g, b = (px[:, :, i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsampling == "444":
            planes = [y - 128.0, cb - 128.0, cr - 128.0]
            samp = [(1, 1), (1, 1), (1, 1)]
        elif subsampling == "420":
            he, we = (h + 1) & ~1, (w + 1) & ~1
            cbp = np.pad(cb, ((0, he - h), (0, we - w)), mode="edge")
            crp = np.pad(cr, ((0, he - h), (0, we - w)), mode="edge")
            cb2 = cbp.reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
            cr2 = crp.reshape(he // 2, 2, we // 2, 2).mean(axis=(1, 3))
            planes = [y - 128.0, cb2 - 128.0, cr2 - 128.0]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            raise ValueError("subsampling must be '444' or '420'")
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = -(-w // mcu_w)
    mcus_y = -(-h // mcu_h)
    # pad each plane to its own MCU-aligned size and pre-DCT all blocks
    coeffs = []
    for p, (sh, sv) in zip(planes, samp):
        ph, pw = mcus_y * sv * 8, mcus_x * sh * 8
        pp = np.pad(
            p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge"
        )
        blocks = _blocks_of(pp)
        d = np.einsum("ij,njk,lk->nil", _T, blocks, _T)
        zz = np.round(d / q).astype(np.int64).reshape(-1, 64)[:, _ZZ]
        coeffs.append((zz, pw // 8))
    # headers
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    qz = q.reshape(-1)[_ZZ].astype(np.uint8).tobytes()
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + qz  # DQT id 0
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sh, sv = samp[ci]
        sof += struct.pack(">BBB", ci + 1, (sh << 4) | sv, 0)
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    for cls, bits, vals in ((0, _DC_BITS, _DC_VALS), (1, _AC_BITS, _AC_VALS)):
        seg = bytes([cls << 4 | 0]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(seg)) + seg
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])  # DC table 0, AC table 0
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    # entropy-coded data, interleaved per MCU
    bw = _BitWriter()
    preds = [0] * ncomp
    rst = 0
    n_mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci in range(ncomp):
                sh, sv = samp[ci]
                zz, bw_blocks = coeffs[ci]
                for by in range(sv):
                    for bx in range(sh):
                        bi = (my * sv + by) * bw_blocks + (mx * sh + bx)
                        preds[ci] = _encode_block(
                            bw, zz[bi], preds[ci], _DC_CODES, _AC_CODES
                        )
            n_mcu += 1
            if (
                restart_interval
                and n_mcu % restart_interval == 0
                and n_mcu < mcus_x * mcus_y
            ):
                bw.align()
                out += bytes(bw.out)
                bw = _BitWriter()
                out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                preds = [0] * ncomp
    bw.align()
    out += bytes(bw.out)
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes → uint8 (h, w) gray or (h, w, 3) RGB.
    General baseline: tables from the stream, 1-2x sampling factors,
    restart markers. Progressive/arithmetic/12-bit refuse honestly."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffDecoder] = {}
    frame = None
    ri = 0
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("corrupt JPEG: expected marker")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue
        (seg_len,) = struct.unpack_from(">H", data, pos)
        body = data[pos + 2 : pos + seg_len]
        pos += seg_len
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(body):
                pq, tq = body[off] >> 4, body[off] & 0xF
                off += 1
                if pq:
                    raise NotImplementedError("16-bit quant tables (12-bit JPEG)")
                tbl = np.frombuffer(body[off : off + 64], np.uint8).astype(np.int64)
                qt[tq] = tbl[_UNZZ].reshape(8, 8)
                off += 64
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(body):
                tc, th = body[off] >> 4, body[off] & 0xF
                bits = list(body[off + 1 : off + 17])
                n = sum(bits)
                vals = list(body[off + 17 : off + 17 + n])
                huff[(tc, th)] = _HuffDecoder(bits, vals)
                off += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, fh, fw, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError("only 8-bit precision JPEG")
            comps = []
            for i in range(nc):
                cid, s, tq = struct.unpack_from(">BBB", body, 6 + 3 * i)
                comps.append({"id": cid, "h": s >> 4, "v": s & 0xF, "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "progressive/extended/arithmetic JPEG is not parsed here (baseline only)"
            )
        elif marker == 0xDD:  # DRI
            (ri,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("corrupt JPEG: SOS before SOF")
            ns = body[0]
            scan = []
            for i in range(ns):
                cs, tt = body[1 + 2 * i], body[2 + 2 * i]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append((comp, tt >> 4, tt & 0xF))
            # collect entropy bytes (unstuff FF00, stop at a marker)
            ent = bytearray()
            segments = [ent]
            p = pos
            while p < len(data) - 1:
                b = data[p]
                if b == 0xFF:
                    nxt = data[p + 1]
                    if nxt == 0x00:
                        segments[-1].append(0xFF)
                        p += 2
                        continue
                    if 0xD0 <= nxt <= 0xD7:  # restart marker
                        segments.append(bytearray())
                        p += 2
                        continue
                    break  # real marker ends the scan
                segments[-1].append(b)
                p += 1
            pos = p
            return _decode_scan(frame, scan, qt, huff, segments, ri)
        # other markers (APPn, COM): skipped
    raise ValueError("corrupt JPEG: no SOS scan found")


def _decode_scan(frame, scan, qt, huff, segments, ri) -> np.ndarray:
    h, w = frame["h"], frame["w"]
    comps = [s[0] for s in scan]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    n_mcus = mcus_x * mcus_y
    store = []
    for c in comps:
        bw_blocks = mcus_x * c["h"]
        bh_blocks = mcus_y * c["v"]
        store.append(np.zeros((bh_blocks * bw_blocks, 64), dtype=np.int64))
    seg_i = 0
    br = _BitReader(bytes(segments[0]))
    preds = [0] * len(comps)
    for m in range(n_mcus):
        if ri and m and m % ri == 0:
            seg_i += 1
            if seg_i >= len(segments):
                raise ValueError("corrupt JPEG: missing restart segment")
            br = _BitReader(bytes(segments[seg_i]))
            preds = [0] * len(comps)
        my, mx = divmod(m, mcus_x)
        for ci, (c, td, ta) in enumerate(scan):
            dc_t = huff.get((0, td))
            ac_t = huff.get((1, ta))
            if dc_t is None or ac_t is None:
                raise ValueError("corrupt JPEG: missing Huffman table")
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    zz = np.zeros(64, dtype=np.int64)
                    s = dc_t.decode(br)
                    diff = _extend(br.bits(s), s) if s else 0
                    preds[ci] += diff
                    zz[0] = preds[ci]
                    k = 1
                    while k < 64:
                        rs = ac_t.decode(br)
                        r, s = rs >> 4, rs & 0xF
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise ValueError("corrupt JPEG: AC index overflow")
                        zz[k] = _extend(br.bits(s), s)
                        k += 1
                    bi = (my * c["v"] + by) * (mcus_x * c["h"]) + (mx * c["h"] + bx)
                    store[ci][bi] = zz
    # dequantize + IDCT, vectorized per component
    planes = []
    for c, zzs in zip(comps, store):
        q = qt[c["tq"]]
        blocks = zzs[:, _UNZZ].reshape(-1, 8, 8) * q
        px = np.einsum("ji,njk,kl->nil", _T, blocks, _T) + 128.0
        bw_blocks = mcus_x * c["h"]
        bh_blocks = mcus_y * c["v"]
        plane = (
            px.reshape(bh_blocks, bw_blocks, 8, 8)
            .transpose(0, 2, 1, 3)
            .reshape(bh_blocks * 8, bw_blocks * 8)
        )
        plane = np.repeat(np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)
