"""Header-level metadata parsers for codec-bound formats (round 5).

PNG and WAV decode fully in stdlib (``png_minimal``/``wav_minimal``).
JPEG pixels need a Huffman+IDCT decoder and MP4 frames need video
codecs — neither is in this container — but their METADATA is plain
header structure, fully parseable with ``struct``:

- JPEG: scan the marker stream for SOF0/1/2 (baseline/extended/
  progressive start-of-frame) → true width/height/channel count.
- MP4 (ISO/IEC 14496-12 BMFF): walk the box tree → ``mvhd`` duration/
  timescale, ``tkhd`` track dimensions, ``stts`` sample (frame)
  counts.

So the multimodal kernels report REAL dimensions/duration for these
formats and only the pixel/sample payloads remain stubbed — the
honest middle ground, clearly separated.

Registered for cloudpickle by-value serialization in
operators/multimodal.py like the other codecs.
"""

from __future__ import annotations

import struct


# ----------------------------------------------------------- JPEG ---

def is_jpeg(blob: bytes) -> bool:
    return blob[:2] == b"\xff\xd8"


def jpeg_dimensions(blob: bytes) -> tuple[int, int, int]:
    """True (width, height, n_channels) from the SOF marker — no
    entropy decode. Raises on a truncated/markerless stream."""
    if not is_jpeg(blob):
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    while pos + 4 <= len(blob):
        if blob[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        marker = blob[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2  # standalone markers carry no length
            continue
        (seg_len,) = struct.unpack(">H", blob[pos + 2:pos + 4])
        # SOF0 (baseline), SOF1 (extended), SOF2 (progressive)
        if marker in (0xC0, 0xC1, 0xC2):
            if pos + 4 + 6 > len(blob):
                raise ValueError("truncated SOF segment")
            _prec, height, width, n_ch = struct.unpack(
                ">BHHB", blob[pos + 4:pos + 10])
            return width, height, n_ch
        if marker == 0xDA:  # start of scan — SOF must precede it
            break
        pos += 2 + seg_len
    raise ValueError("no SOF marker before scan data")


# ------------------------------------------------------------ MP4 ---

def is_mp4(blob: bytes) -> bool:
    return len(blob) >= 12 and blob[4:8] == b"ftyp"


def _walk_boxes(buf: bytes, start: int, end: int):
    """Yield (box_type, body_start, body_end) at one nesting level."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", buf[pos:pos + 4])
        typ = buf[pos + 4:pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize
            (size,) = struct.unpack(">Q", buf[pos + 8:pos + 16])
            body = pos + 16
        elif size == 0:  # to end of enclosing box
            size = end - pos
        if size < 8 or pos + size > end:
            raise ValueError(f"bad box size {size} for {typ!r}")
        yield typ, body, pos + size
        pos += size


def mp4_metadata(blob: bytes) -> dict:
    """True container metadata from the ISO-BMFF box tree:
    ``duration_ms`` (mvhd), per-track ``width``/``height`` (tkhd,
    16.16 fixed point) and ``n_samples`` (stts entry sum — the frame
    count for video tracks)."""
    if not is_mp4(blob):
        raise ValueError("not an ISO-BMFF (mp4) blob")
    out: dict = {"duration_ms": None, "tracks": []}

    def find(buf, start, end, path):
        head, *rest = path
        for typ, b, e in _walk_boxes(buf, start, end):
            if typ == head:
                if not rest:
                    yield b, e
                else:
                    yield from find(buf, b, e, rest)

    moov = list(find(blob, 0, len(blob), [b"moov"]))
    if not moov:
        raise ValueError("no moov box")
    m_start, m_end = moov[0]
    for b, e in find(blob, m_start, m_end, [b"mvhd"]):
        version = blob[b]
        if version == 1:
            timescale, duration = struct.unpack(">IQ", blob[b + 20:b + 32])
        else:
            timescale, duration = struct.unpack(">II", blob[b + 12:b + 20])
        if timescale:
            out["duration_ms"] = int(duration * 1000 // timescale)
    for t_start, t_end in find(blob, m_start, m_end, [b"trak"]):
        track: dict = {"width": None, "height": None, "n_samples": None}
        for b, e in find(blob, t_start, t_end, [b"tkhd"]):
            version = blob[b]
            off = b + (96 if version == 1 else 84) - 8
            w, h = struct.unpack(">II", blob[off:off + 8])
            track["width"], track["height"] = w >> 16, h >> 16
        for b, e in find(blob, t_start, t_end,
                         [b"mdia", b"minf", b"stbl", b"stts"]):
            (n_entries,) = struct.unpack(">I", blob[b + 4:b + 8])
            total = 0
            for i in range(n_entries):
                cnt, _delta = struct.unpack(
                    ">II", blob[b + 8 + i * 8:b + 16 + i * 8])
                total += cnt
            track["n_samples"] = total
        out["tracks"].append(track)
    return out
