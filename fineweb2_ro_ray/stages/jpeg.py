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
    progressive: bool = False,
    successive: bool = False,
) -> bytes:
    """uint8 (h, w) gray or (h, w, 3) RGB → JFIF bytes. Baseline
    (SOF0) by default; ``progressive=True`` emits an SOF2 multi-scan
    stream (spectral-selection bands; ``successive=True`` adds DC+AC
    successive-approximation refinement scans) — the coefficients are
    identical to the baseline encoding, so a correct decoder must
    reproduce the baseline decode bit-for-bit."""
    if progressive and restart_interval:
        raise ValueError("progressive encode does not emit restart markers here")
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
    out += (b"\xff\xc2" if progressive else b"\xff\xc0") + struct.pack(
        ">H", 2 + len(sof)
    ) + sof
    for cls, bits, vals in ((0, _DC_BITS, _DC_VALS), (1, _AC_BITS, _AC_VALS)):
        seg = bytes([cls << 4 | 0]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(seg)) + seg
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    if progressive:
        _emit_progressive_scans(
            out, coeffs, samp, ncomp, mcus_x, mcus_y, w, h, hmax, vmax, successive
        )
        out += b"\xff\xd9"  # EOI
        return bytes(out)
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


def _sos_header(comp_ids: list[int], ss: int, se: int, ah: int, al: int) -> bytes:
    body = bytes([len(comp_ids)])
    for cid in comp_ids:
        body += bytes([cid, 0x00])  # DC table 0 / AC table 0
    body += bytes([ss, se, (ah << 4) | al])
    return b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body


def _nr_grid(w: int, h: int, sh: int, sv: int, hmax: int, vmax: int) -> tuple[int, int]:
    """Non-interleaved block grid (ceil of the component's own sample
    dims / 8) — smaller than the MCU-padded storage grid."""
    return (
        -(-(-(-w * sh // hmax)) // 8),
        -(-(-(-h * sv // vmax)) // 8),
    )


def _emit_progressive_scans(
    out, coeffs, samp, ncomp, mcus_x, mcus_y, w, h, hmax, vmax, successive
) -> None:
    """T.81 G.1.2 scan sequence: DC first (interleaved) [+ DC refine],
    then per-component AC band scans [+ AC refinement]. Coefficients
    match the baseline encoding exactly."""
    al_dc = 1 if successive else 0
    ids = list(range(1, ncomp + 1))

    # --- DC first scan (interleaved, diff-coded at >> al_dc) ---
    out += _sos_header(ids, 0, 0, 0, al_dc)
    bw = _BitWriter()
    preds = [0] * ncomp
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci in range(ncomp):
                sh, sv = samp[ci]
                zz, bwb = coeffs[ci]
                for by in range(sv):
                    for bx in range(sh):
                        bi = (my * sv + by) * bwb + (mx * sh + bx)
                        v = int(zz[bi][0]) >> al_dc
                        diff = v - preds[ci]
                        preds[ci] = v
                        s = _category(diff)
                        c, ln = _DC_CODES[s]
                        bw.write(c, ln)
                        if s:
                            bw.write(_mag_bits(diff, s), s)
    bw.align()
    out += bytes(bw.out)

    if successive:  # --- DC refinement: one raw bit per block ---
        out += _sos_header(ids, 0, 0, al_dc, 0)
        bw = _BitWriter()
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for ci in range(ncomp):
                    sh, sv = samp[ci]
                    zz, bwb = coeffs[ci]
                    for by in range(sv):
                        for bx in range(sh):
                            bi = (my * sv + by) * bwb + (mx * sh + bx)
                            bw.write(int(zz[bi][0]) & 1, 1)
        bw.align()
        out += bytes(bw.out)

    # --- AC scans: one component each, non-interleaved grid ---
    bands = [(1, 63)] if successive else [(1, 20), (21, 63)]
    for ci in range(ncomp):
        sh, sv = samp[ci]
        zz, bwb = coeffs[ci]
        bw_nr, bh_nr = _nr_grid(w, h, sh, sv, hmax, vmax)
        blocks = [
            zz[by * bwb + bx] for by in range(bh_nr) for bx in range(bw_nr)
        ]
        for ss, se in bands:
            out += _sos_header([ci + 1], ss, se, 0, 1 if successive else 0)
            bw = _BitWriter()
            _enc_ac_first(bw, blocks, ss, se, 1 if successive else 0)
            bw.align()
            out += bytes(bw.out)
        if successive:
            out += _sos_header([ci + 1], 1, 63, 1, 0)
            bw = _BitWriter()
            _enc_ac_refine(bw, blocks, 1, 63, 0)
            bw.align()
            out += bytes(bw.out)


def _enc_ac_first(bw, blocks, ss, se, al) -> None:
    """AC first scan with EOB-run coalescing (G.1.2.2): values are the
    sign-preserving magnitude shift |c| >> al."""
    eob_run = 0

    def emit_eobrun() -> None:
        nonlocal eob_run
        if eob_run > 0:
            nbits = eob_run.bit_length() - 1
            c, ln = _AC_CODES[nbits << 4]
            bw.write(c, ln)
            if nbits:
                bw.write(eob_run - (1 << nbits), nbits)
            eob_run = 0

    for zz in blocks:
        band = zz[ss : se + 1]
        v = np.sign(band) * (np.abs(band) >> al)
        nz = np.flatnonzero(v)
        if len(nz) == 0:
            eob_run += 1
            if eob_run == 0x7FFF:
                emit_eobrun()
            continue
        emit_eobrun()
        last = nz[-1]
        r = 0
        for k in range(last + 1):
            val = int(v[k])
            if val == 0:
                r += 1
                continue
            while r > 15:
                c, ln = _AC_CODES[0xF0]
                bw.write(c, ln)
                r -= 16
            s = _category(val)
            c, ln = _AC_CODES[(r << 4) | s]
            bw.write(c, ln)
            bw.write(_mag_bits(val, s), s)
            r = 0
        if last < se - ss:
            eob_run += 1
            if eob_run == 0x7FFF:
                emit_eobrun()
    emit_eobrun()


def _enc_ac_refine(bw, blocks, ss, se, al) -> None:
    """AC successive-approximation refinement (G.1.2.3, the libjpeg
    encode_mcu_AC_refine structure): ±1 symbols for newly-significant
    coefficients, buffered correction bits for history-nonzero ones,
    correction bits riding EOB runs."""
    eob_run = 0
    be: list[int] = []  # correction bits pending with the EOB run

    def emit_eobrun() -> None:
        nonlocal eob_run, be
        if eob_run > 0:
            nbits = eob_run.bit_length() - 1
            c, ln = _AC_CODES[nbits << 4]
            bw.write(c, ln)
            if nbits:
                bw.write(eob_run - (1 << nbits), nbits)
            for b in be:
                bw.write(b, 1)
            be = []
            eob_run = 0

    for zz in blocks:
        band = zz[ss : se + 1]
        absv = np.abs(band) >> al
        # last newly-significant position bounds where ZRLs are needed
        newly = np.flatnonzero(absv == 1)
        eobpos = newly[-1] if len(newly) else -1
        r = 0
        br_bits: list[int] = []
        for k in range(len(band)):
            t = int(absv[k])
            if t == 0:
                r += 1
                continue
            # emit required ZRLs at the FIRST nonzero target (libjpeg
            # placement — bit-stream order must equal walk order), but
            # not when they can fold into the EOB run
            while r > 15 and k <= eobpos:
                emit_eobrun()
                c, ln = _AC_CODES[0xF0]
                bw.write(c, ln)
                r -= 16
                for b in br_bits:
                    bw.write(b, 1)
                br_bits = []
            if t > 1:  # history-nonzero: buffered correction bit
                br_bits.append(t & 1)
                continue
            # newly significant (t == 1)
            emit_eobrun()
            c, ln = _AC_CODES[(r << 4) | 1]
            bw.write(c, ln)
            bw.write(1 if band[k] > 0 else 0, 1)
            for b in br_bits:
                bw.write(b, 1)
            br_bits = []
            r = 0
        if r > 0 or br_bits:
            eob_run += 1
            be.extend(br_bits)
            if eob_run == 0x7FFF:
                emit_eobrun()
    emit_eobrun()


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------


def decode_jpeg(data: bytes) -> np.ndarray:
    """JFIF bytes → uint8 (h, w) gray or (h, w, 3) RGB. General
    baseline (SOF0/1) AND progressive (SOF2: spectral selection +
    successive approximation per T.81 G.1.2 — the stb_image/libjpeg
    scan algorithms): tables from the stream, 1-2x sampling factors,
    restart markers, multi-scan coefficient accumulation.
    Arithmetic/hierarchical/12-bit streams refuse honestly."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffDecoder] = {}
    frame = None
    progressive = False
    ri = 0
    geom = None  # (hmax, vmax, mcus_x, mcus_y)
    store: list[np.ndarray] | None = None
    saw_scan = False
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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            progressive = marker == 0xC2
            prec, fh, fw, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise NotImplementedError("only 8-bit precision JPEG")
            comps = []
            for i in range(nc):
                cid, s, tq = struct.unpack_from(">BBB", body, 6 + 3 * i)
                comps.append({"id": cid, "h": s >> 4, "v": s & 0xF, "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps}
            hmax = max(c["h"] for c in comps)
            vmax = max(c["v"] for c in comps)
            geom = (hmax, vmax, -(-fw // (8 * hmax)), -(-fh // (8 * vmax)))
            store = [
                np.zeros((geom[3] * c["v"] * geom[2] * c["h"], 64), dtype=np.int64)
                for c in comps
            ]
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "lossless/arithmetic/hierarchical JPEG is not parsed here"
            )
        elif marker == 0xDD:  # DRI
            (ri,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("corrupt JPEG: SOS before SOF")
            ns = body[0]
            scan = []
            for i in range(ns):
                cs, tt = body[1 + 2 * i], body[2 + 2 * i]
                ci = next(
                    i2 for i2, c in enumerate(frame["comps"]) if c["id"] == cs
                )
                scan.append((ci, tt >> 4, tt & 0xF))
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            ahal = body[3 + 2 * ns]
            ah, al = ahal >> 4, ahal & 0xF
            # collect entropy bytes (unstuff FF00, split at RSTn)
            segments = [bytearray()]
            p = pos
            while p < len(data) - 1:
                b = data[p]
                if b == 0xFF:
                    nxt = data[p + 1]
                    if nxt == 0x00:
                        segments[-1].append(0xFF)
                        p += 2
                        continue
                    if 0xD0 <= nxt <= 0xD7:
                        segments.append(bytearray())
                        p += 2
                        continue
                    break
                segments[-1].append(b)
                p += 1
            pos = p
            saw_scan = True
            if progressive:
                _scan_progressive(
                    frame, geom, store, scan, huff, segments, ri, ss, se, ah, al
                )
            else:
                _scan_baseline(frame, geom, store, scan, huff, segments, ri)
        # other markers (APPn, COM): skipped
    if not saw_scan:
        raise ValueError("corrupt JPEG: no SOS scan found")
    return _finish(frame, geom, store, qt)


def _scan_baseline(frame, geom, store, scan, huff, segments, ri) -> None:
    hmax, vmax, mcus_x, mcus_y = geom
    comps = frame["comps"]
    if len(scan) == 1:
        # non-interleaved scan: the MCU is ONE block over the
        # component's own (unpadded) block grid
        _scan_baseline_single(frame, geom, store, scan[0], huff, segments, ri)
        return
    seg_i = 0
    br = _BitReader(bytes(segments[0]))
    preds = {ci: 0 for ci, _, _ in scan}
    for m in range(mcus_x * mcus_y):
        if ri and m and m % ri == 0:
            seg_i += 1
            if seg_i >= len(segments):
                raise ValueError("corrupt JPEG: missing restart segment")
            br = _BitReader(bytes(segments[seg_i]))
            preds = {ci: 0 for ci, _, _ in scan}
        my, mx = divmod(m, mcus_x)
        for ci, td, ta in scan:
            c = comps[ci]
            dc_t, ac_t = huff.get((0, td)), huff.get((1, ta))
            if dc_t is None or ac_t is None:
                raise ValueError("corrupt JPEG: missing Huffman table")
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    bi = (my * c["v"] + by) * (mcus_x * c["h"]) + (mx * c["h"] + bx)
                    preds[ci] = _block_baseline(
                        br, store[ci][bi], dc_t, ac_t, preds[ci]
                    )


def _scan_baseline_single(frame, geom, store, one, huff, segments, ri) -> None:
    hmax, vmax, mcus_x, mcus_y = geom
    ci, td, ta = one
    c = frame["comps"][ci]
    dc_t, ac_t = huff.get((0, td)), huff.get((1, ta))
    if dc_t is None or ac_t is None:
        raise ValueError("corrupt JPEG: missing Huffman table")
    bw_nr = -(-(-(-frame["w"] * c["h"] // hmax)) // 8)
    bh_nr = -(-(-(-frame["h"] * c["v"] // vmax)) // 8)
    stride = mcus_x * c["h"]
    seg_i, pred, n = 0, 0, 0
    br = _BitReader(bytes(segments[0]))
    for by in range(bh_nr):
        for bx in range(bw_nr):
            if ri and n and n % ri == 0:
                seg_i += 1
                if seg_i >= len(segments):
                    raise ValueError("corrupt JPEG: missing restart segment")
                br = _BitReader(bytes(segments[seg_i]))
                pred = 0
            pred = _block_baseline(br, store[ci][by * stride + bx], dc_t, ac_t, pred)
            n += 1


def _block_baseline(br, coef, dc_t, ac_t, pred) -> int:
    s = dc_t.decode(br)
    diff = _extend(br.bits(s), s) if s else 0
    pred += diff
    coef[0] = pred
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
        coef[k] = _extend(br.bits(s), s)
        k += 1
    return pred


def _scan_progressive(
    frame, geom, store, scan, huff, segments, ri, ss, se, ah, al
) -> None:
    hmax, vmax, mcus_x, mcus_y = geom
    comps = frame["comps"]
    if ss == 0:  # DC scan (interleaved over the scan's components)
        if se != 0:
            raise ValueError("corrupt JPEG: DC scan with Se != 0")
        seg_i = 0
        br = _BitReader(bytes(segments[0]))
        preds = {ci: 0 for ci, _, _ in scan}
        for m in range(mcus_x * mcus_y):
            if ri and m and m % ri == 0:
                seg_i += 1
                if seg_i >= len(segments):
                    raise ValueError("corrupt JPEG: missing restart segment")
                br = _BitReader(bytes(segments[seg_i]))
                preds = {ci: 0 for ci, _, _ in scan}
            my, mx = divmod(m, mcus_x)
            for ci, td, _ta in scan:
                c = comps[ci]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        bi = (my * c["v"] + by) * (mcus_x * c["h"]) + (
                            mx * c["h"] + bx
                        )
                        coef = store[ci][bi]
                        if ah == 0:  # DC first
                            dc_t = huff.get((0, td))
                            if dc_t is None:
                                raise ValueError("corrupt JPEG: missing DC table")
                            s = dc_t.decode(br)
                            diff = _extend(br.bits(s), s) if s else 0
                            preds[ci] += diff
                            coef[0] = preds[ci] << al
                        else:  # DC refinement: one raw bit
                            if br.bit():
                                coef[0] |= 1 << al
        return
    # AC scan: exactly one component, non-interleaved block grid
    if len(scan) != 1:
        raise ValueError("corrupt JPEG: progressive AC scan with >1 component")
    ci, _td, ta = scan[0]
    c = comps[ci]
    ac_t = huff.get((1, ta))
    if ac_t is None:
        raise ValueError("corrupt JPEG: missing AC table")
    bw_nr = -(-(-(-frame["w"] * c["h"] // hmax)) // 8)
    bh_nr = -(-(-(-frame["h"] * c["v"] // vmax)) // 8)
    stride = mcus_x * c["h"]
    seg_i, n = 0, 0
    br = _BitReader(bytes(segments[0]))
    eob_run = 0
    for by in range(bh_nr):
        for bx in range(bw_nr):
            if ri and n and n % ri == 0:
                seg_i += 1
                if seg_i >= len(segments):
                    raise ValueError("corrupt JPEG: missing restart segment")
                br = _BitReader(bytes(segments[seg_i]))
                eob_run = 0
            n += 1
            coef = store[ci][by * stride + bx]
            if ah == 0:
                eob_run = _block_ac_first(br, coef, ac_t, ss, se, al, eob_run)
            else:
                eob_run = _block_ac_refine(br, coef, ac_t, ss, se, al, eob_run)


def _block_ac_first(br, coef, ac_t, ss, se, al, eob_run) -> int:
    if eob_run:
        return eob_run - 1
    k = ss
    while k <= se:
        rs = ac_t.decode(br)
        r, s = rs >> 4, rs & 0xF
        if s == 0:
            if r < 15:
                run = (1 << r) - 1
                if r:
                    run += br.bits(r)
                return run  # EOB for this block; run more blocks follow
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("corrupt JPEG: AC index overflow")
        coef[k] = _extend(br.bits(s), s) << al
        k += 1
    return 0


def _block_ac_refine(br, coef, ac_t, ss, se, al, eob_run) -> int:
    """T.81 G.1.2.3 AC successive-approximation refinement (the
    stb_image/libjpeg walk): correction bits for history-nonzero
    coefficients, ±1<<al for newly-significant ones, EOB runs carry
    correction bits too."""
    bit = 1 << al
    if eob_run:
        for k in range(ss, se + 1):
            if coef[k] != 0 and br.bit() and (coef[k] & bit) == 0:
                coef[k] += bit if coef[k] > 0 else -bit
        return eob_run - 1
    k = ss
    while k <= se:
        rs = ac_t.decode(br)
        r, s = rs >> 4, rs & 0xF
        val = 0
        if s == 0:
            if r < 15:
                eob_run = (1 << r) - 1
                if r:
                    eob_run += br.bits(r)
                r = 64  # walk out the rest of the band on correction bits
        else:
            if s != 1:
                raise ValueError("corrupt JPEG: refinement magnitude != 1")
            val = bit if br.bit() else -bit
        while k <= se:
            if coef[k] != 0:
                if br.bit() and (coef[k] & bit) == 0:
                    coef[k] += bit if coef[k] > 0 else -bit
            else:
                if r == 0:
                    if val:
                        coef[k] = val
                    k += 1
                    break
                r -= 1
            k += 1
    return eob_run


def _finish(frame, geom, store, qt) -> np.ndarray:
    hmax, vmax, mcus_x, mcus_y = geom
    h, w = frame["h"], frame["w"]
    planes = []
    for c, zzs in zip(frame["comps"], store):
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
        plane = np.repeat(
            np.repeat(plane, vmax // c["v"], axis=0), hmax // c["h"], axis=1
        )
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255).astype(np.uint8)
