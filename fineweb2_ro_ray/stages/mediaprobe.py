"""Header-level metadata probes for MP3 and MP4 — stdlib + numpy only.

Full SAMPLE decode of these formats needs entropy/filterbank libraries
absent from this container (that stays honestly env-gated in
``stages.multimodal``), but the METADATA a corpus pipeline actually
extracts — duration, bitrate, sample rate, stream validity — lives in
plain frame headers (MP3) and the ISO-BMFF box tree (MP4), both
parseable exactly:

- **MP3** (MPEG-1/2/2.5 Layer III): skip an ID3v2 tag if present, find
  the first frame sync, then WALK every frame header (version, bitrate
  index, sample-rate index, padding → frame length) summing samples.
  Duration is exact per the header math (CBR and VBR alike — each
  frame is visited, not extrapolated), which is strictly better than
  the header-extrapolation most quick probes do.
- **MP4 / ISO BMFF**: walk the top-level box tree to ``moov``, then its
  children to ``mvhd`` (version 0 and 1 layouts): timescale + duration
  → milliseconds.

Used by ``multimodal.MediaDecoder`` to fill duration_ms /
sample_rate for these payloads while ``rms`` stays null — no sample
decode is claimed.
"""

from __future__ import annotations

import struct

# MPEG audio Layer III tables (ISO 11172-3 / 13818-3)
_BITRATES_V1_L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320]
_BITRATES_V2_L3 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160]
_RATES = {
    3: [44100, 48000, 32000],  # MPEG-1
    2: [22050, 24000, 16000],  # MPEG-2
    0: [11025, 12000, 8000],  # MPEG-2.5
}


def _id3v2_size(data: bytes) -> int:
    """Bytes to skip for a leading ID3v2 tag (syncsafe size), else 0."""
    if data[:3] != b"ID3" or len(data) < 10:
        return 0
    b = data[6:10]
    return 10 + ((b[0] & 0x7F) << 21 | (b[1] & 0x7F) << 14 | (b[2] & 0x7F) << 7 | (b[3] & 0x7F))


def _parse_frame_header(h: int) -> tuple[int, int, int] | None:
    """MP3 frame header word → (frame_bytes, samples, sample_rate), or
    None if not a valid Layer III header."""
    if (h >> 21) & 0x7FF != 0x7FF:
        return None
    version = (h >> 19) & 0x3  # 3=MPEG1, 2=MPEG2, 0=MPEG2.5, 1=reserved
    layer = (h >> 17) & 0x3  # 1 = Layer III
    if version == 1 or layer != 1:
        return None
    br_idx = (h >> 12) & 0xF
    sr_idx = (h >> 10) & 0x3
    if br_idx in (0, 15) or sr_idx == 3:
        return None  # free-format / invalid
    pad = (h >> 9) & 0x1
    rate = _RATES[version][sr_idx]
    if version == 3:
        bitrate = _BITRATES_V1_L3[br_idx] * 1000
        samples = 1152
    else:
        bitrate = _BITRATES_V2_L3[br_idx] * 1000
        samples = 576
    frame_bytes = samples * bitrate // (8 * rate) + pad
    return frame_bytes, samples, rate


def probe_mp3(data: bytes) -> dict:
    """Walk every MP3 frame: returns n_frames / sample_rate /
    duration_ms / bitrate_kbps (mean over frames — exact for CBR,
    honest average for VBR). Raises ValueError if no valid frame
    stream is found."""
    pos = _id3v2_size(data)
    # resync: scan forward to the first valid header
    first = None
    while pos + 4 <= len(data):
        if data[pos] == 0xFF and (data[pos + 1] & 0xE0) == 0xE0:
            h = struct.unpack_from(">I", data, pos)[0]
            parsed = _parse_frame_header(h)
            if parsed:
                first = pos
                break
        pos += 1
    if first is None:
        raise ValueError("no MP3 frame sync found")
    n_frames = 0
    total_samples = 0
    total_bytes = 0
    rate = None
    pos = first
    while pos + 4 <= len(data):
        h = struct.unpack_from(">I", data, pos)[0]
        parsed = _parse_frame_header(h)
        if not parsed:
            break  # trailing tag / garbage ends the stream
        fb, samples, r = parsed
        if rate is None:
            rate = r
        elif r != rate:
            break  # rate change = not one coherent stream; stop honestly
        if fb <= 4:
            break
        n_frames += 1
        total_samples += samples
        total_bytes += fb
        pos += fb
    duration_s = total_samples / rate
    return {
        "n_frames": n_frames,
        "sample_rate": rate,
        "duration_ms": int(round(1000 * duration_s)),
        "bitrate_kbps": int(round(total_bytes * 8 / duration_s / 1000))
        if duration_s
        else 0,
    }


def encode_mp3_silence(
    n_frames: int, rate: int = 44100, bitrate_kbps: int = 128, id3: bool = False
) -> bytes:
    """Synthesize a VALID MPEG-1 Layer III frame-header stream with
    zeroed payloads (header math is real; the audio content is not
    claimed) — the ground-truth vector for :func:`probe_mp3`."""
    sr_idx = _RATES[3].index(rate)
    br_idx = _BITRATES_V1_L3.index(bitrate_kbps)
    out = bytearray()
    if id3:
        body = b"\x00" * 100
        out += b"ID3\x04\x00\x00" + bytes(
            [(len(body) >> 21) & 0x7F, (len(body) >> 14) & 0x7F, (len(body) >> 7) & 0x7F, len(body) & 0x7F]
        ) + body
    h = (
        (0x7FF << 21)
        | (3 << 19)  # MPEG-1
        | (1 << 17)  # Layer III
        | (1 << 16)  # no CRC
        | (br_idx << 12)
        | (sr_idx << 10)
        | (0 << 9)  # no padding
        | (0x3 << 6)  # mono
    )
    frame_bytes = 1152 * bitrate_kbps * 1000 // (8 * rate)
    header = struct.pack(">I", h)
    for _ in range(n_frames):
        out += header + b"\x00" * (frame_bytes - 4)
    return bytes(out)


def _walk_boxes(data: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", data, pos)
        typ = data[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                return
            (size,) = struct.unpack_from(">Q", data, pos + 8)
            hdr = 16
        elif size == 0:  # to end of file
            size = end - pos
        if size < hdr or pos + size > end:
            return
        yield typ, pos + hdr, pos + size
        pos += size


def probe_mp4(data: bytes) -> dict:
    """ISO-BMFF box walk to ``moov``/``mvhd``: returns duration_ms /
    timescale / brand. Raises ValueError when the box tree has no
    mvhd."""
    brand = None
    for typ, s, e in _walk_boxes(data, 0, len(data)):
        if typ == b"ftyp":
            brand = data[s : s + 4].decode("latin-1")
        elif typ == b"moov":
            for t2, s2, e2 in _walk_boxes(data, s, e):
                if t2 == b"mvhd":
                    version = data[s2]
                    if version == 1:
                        timescale, duration = struct.unpack_from(">IQ", data, s2 + 20)
                    else:
                        timescale, duration = struct.unpack_from(">II", data, s2 + 12)
                    if timescale == 0:
                        raise ValueError("mvhd timescale is zero")
                    return {
                        "duration_ms": int(round(1000 * duration / timescale)),
                        "timescale": timescale,
                        "brand": brand,
                    }
    raise ValueError("no moov/mvhd box found")


def encode_mp4_stub(duration_ms: int, timescale: int = 1000, version: int = 0) -> bytes:
    """Minimal valid ftyp+moov/mvhd box tree for :func:`probe_mp4`
    ground truth (no media samples are claimed)."""
    duration = duration_ms * timescale // 1000
    ftyp = b"isom\x00\x00\x02\x00isommp41"
    ftyp_box = struct.pack(">I", 8 + len(ftyp)) + b"ftyp" + ftyp
    if version == 1:
        body = (
            b"\x01\x00\x00\x00"
            + b"\x00" * 16  # creation/modification (64-bit)
            + struct.pack(">IQ", timescale, duration)
            + b"\x00" * 80
        )
    else:
        body = (
            b"\x00\x00\x00\x00"
            + b"\x00" * 8  # creation/modification
            + struct.pack(">II", timescale, duration)
            + b"\x00" * 80
        )
    mvhd = struct.pack(">I", 8 + len(body)) + b"mvhd" + body
    moov = struct.pack(">I", 8 + len(mvhd)) + b"moov" + mvhd
    return ftyp_box + moov
