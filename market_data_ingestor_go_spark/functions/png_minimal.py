"""Minimal from-scratch PNG codec — stdlib ``zlib``/``struct`` only.

The container ships no media libraries (no PIL/opencv), but PNG is a
fully public format (ISO/IEC 15948 / RFC 2083): DEFLATE-compressed
scanlines with 5 per-row predictive filters. That is decodable with
nothing but ``zlib``, so the image kernels in
``operators/multimodal.py`` get REAL dimensions and luma for PNG
blobs instead of stub values.

Scope (honest bounds, enforced with clear errors):
- 8-bit depth only; color types 0 (gray), 2 (RGB), 3 (palette,
  expanded to RGB), 4 (gray+alpha), 6 (RGBA); non-interlaced only.
- CRCs are verified — a truncated/corrupt blob raises instead of
  returning garbage features into a training table.

This module is registered for cloudpickle BY-VALUE serialization in
operators/multimodal.py so mapInPandas workers never need this
package importable on their own sys.path (a driver process may import
this library from any cwd).
"""

from __future__ import annotations

import struct
import zlib

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# channels per PNG color type (before palette expansion)
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def is_png(blob: bytes) -> bool:
    return blob[:8] == PNG_SIGNATURE


def _paeth(a: int, b: int, c: int) -> int:
    """Paeth predictor (PNG spec §9.4): closest of left/up/upper-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def png_decode(blob: bytes) -> tuple[int, int, int, bytes]:
    """Decode a PNG blob → ``(width, height, channels, pixels)``.

    ``pixels`` is the raw interleaved 8-bit buffer, row-major,
    ``width * height * channels`` bytes; palette images come back
    expanded to 3-channel RGB.
    """
    if not is_png(blob):
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = ctype = None
    idat = bytearray()
    plte: bytes | None = None
    while pos + 12 <= len(blob):
        (ln,) = struct.unpack(">I", blob[pos:pos + 4])
        typ = blob[pos + 4:pos + 8]
        data = blob[pos + 8:pos + 8 + ln]
        if len(data) != ln:
            raise ValueError("truncated chunk")
        (crc,) = struct.unpack(">I", blob[pos + 8 + ln:pos + 12 + ln])
        if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {typ!r} chunk")
        if typ == b"IHDR":
            width, height, depth, ctype, comp, filt, interlace = \
                struct.unpack(">IIBBBBB", data)
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth} (8 only)")
            if ctype not in _CHANNELS:
                raise ValueError(f"unsupported color type {ctype}")
            if interlace != 0:
                raise ValueError("interlaced PNG unsupported")
            if comp != 0 or filt != 0:
                raise ValueError("nonstandard compression/filter method")
        elif typ == b"PLTE":
            plte = data
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
        pos += 12 + ln
    if width is None:
        raise ValueError("missing IHDR")
    raw = zlib.decompress(bytes(idat))
    ch = _CHANNELS[ctype]
    stride = width * ch
    if len(raw) != (stride + 1) * height:
        raise ValueError("IDAT size does not match dimensions")

    out = bytearray(stride * height)
    prev = bytearray(stride)  # zero row above the first scanline
    for y in range(height):
        base = y * (stride + 1)
        f = raw[base]
        row = bytearray(raw[base + 1:base + 1 + stride])
        if f == 1:    # Sub
            for i in range(ch, stride):
                row[i] = (row[i] + row[i - ch]) & 0xFF
        elif f == 2:  # Up
            for i in range(stride):
                row[i] = (row[i] + prev[i]) & 0xFF
        elif f == 3:  # Average
            for i in range(stride):
                left = row[i - ch] if i >= ch else 0
                row[i] = (row[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for i in range(stride):
                left = row[i - ch] if i >= ch else 0
                ul = prev[i - ch] if i >= ch else 0
                row[i] = (row[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif f != 0:
            raise ValueError(f"bad filter byte {f}")
        out[y * stride:(y + 1) * stride] = row
        prev = row

    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        rgb = bytearray(width * height * 3)
        for j, idx in enumerate(out):
            rgb[3 * j:3 * j + 3] = plte[3 * idx:3 * idx + 3]
        return width, height, 3, bytes(rgb)
    return width, height, ch, bytes(out)


def png_encode(width: int, height: int, channels: int,
               pixels: bytes) -> bytes:
    """Encode a raw 8-bit pixel buffer as a valid PNG (filter 0 rows,
    single IDAT). Used by resize_images output and by tests to build
    real fixture images."""
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError("pixel buffer does not match dimensions")
    raw = bytearray()
    for y in range(height):
        raw.append(0)
        raw += pixels[y * stride:(y + 1) * stride]

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", width, height, 8, ctype, 0, 0, 0)
    return (PNG_SIGNATURE + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def mean_luma(channels: int, pixels: bytes) -> float:
    """Mean luminance in [0, 1]: Rec.601 weights for color buffers,
    plain mean for gray(+alpha); alpha channels are ignored."""
    if not pixels:
        return 0.0
    n = len(pixels) // channels
    if channels <= 2:
        return sum(pixels[0::channels]) / n / 255.0
    r = sum(pixels[0::channels])
    g = sum(pixels[1::channels])
    b = sum(pixels[2::channels])
    return (0.299 * r + 0.587 * g + 0.114 * b) / n / 255.0


def resize_nearest(width: int, height: int, channels: int, pixels: bytes,
                   target_w: int, target_h: int) -> bytes:
    """Nearest-neighbor resample to ``target_w × target_h`` (same
    channel count). The standard cheap normalize-to-encoder-input step."""
    out = bytearray(target_w * target_h * channels)
    for ty in range(target_h):
        sy = ty * height // target_h
        row_off = sy * width * channels
        o = ty * target_w * channels
        for tx in range(target_w):
            src = row_off + (tx * width // target_w) * channels
            out[o:o + channels] = pixels[src:src + channels]
            o += channels
    return bytes(out)
