"""From-scratch GIF decoder, stdlib-only (round 5).

Third REAL image codec for the multimodal kernels (after the PNG
codec in ``png_minimal`` and the JPEG/MP4 header parsers): full LZW
decompression of the first frame — true dimensions, true pixels, true
mean luma — with no imaging library in the container.

Spec: GIF87a/89a (CompuServe 1987/1989, public specification).
Layout parsed here: header + logical screen descriptor → optional
global color table → extension blocks (skipped) → first image
descriptor → optional local color table → LZW-compressed index
stream in length-prefixed sub-blocks. Codes are packed LSB-first;
the code width starts at ``min_code_size+1`` and grows with the
dictionary until 12 bits; CLEAR resets the dictionary, END stops.
Interlaced images store rows in four passes (8/8, 8/8+4, 4/4+2,
2/2+1) and are de-interlaced after decode.

Scale posture: identical to the PNG codec — this runs inside the
Arrow-batched ``mapInPandas`` kernels (operators/multimodal.py), one
Python call per blob, no driver involvement.
"""

from __future__ import annotations

import struct


def is_gif(blob: bytes) -> bool:
    return blob[:6] in (b"GIF87a", b"GIF89a")


def _lzw_decode(min_code_size: int, data: bytes) -> list[int]:
    """Decode a GIF LZW stream into palette indices."""
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    dictionary: list[list[int]] = [[i] for i in range(clear)] + [[], []]
    out: list[int] = []
    prev: list[int] | None = None

    acc = 0
    nbits = 0
    pos = 0
    while True:
        while nbits < code_size:
            if pos >= len(data):
                return out  # truncated stream: emit what we have
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size

        if code == clear:
            dictionary = [[i] for i in range(clear)] + [[], []]
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            return out

        if code < len(dictionary) and dictionary[code]:
            entry = dictionary[code]
        elif code == len(dictionary) and prev is not None:
            entry = prev + [prev[0]]        # the KwKwK special case
        else:  # pragma: no cover - corrupt stream
            raise ValueError(f"bad LZW code {code}")
        out.extend(entry)
        if prev is not None and len(dictionary) < 4096:
            dictionary.append(prev + [entry[0]])
            if (len(dictionary) == (1 << code_size)
                    and code_size < 12):
                code_size += 1
        prev = entry


def _deinterlace(rows: list[list[int]]) -> list[list[int]]:
    h = len(rows)
    order = ([*range(0, h, 8)] + [*range(4, h, 8)]
             + [*range(2, h, 4)] + [*range(1, h, 2)])
    out: list[list[int] | None] = [None] * h
    for src, dst in enumerate(order):
        out[dst] = rows[src]
    return out  # type: ignore[return-value]


def gif_frames(blob: bytes):
    """Yield (width, height, channels=3, rgb bytes) per frame.

    Each frame decodes as its OWN patch (its descriptor's size and
    color table) — animation composition onto the logical screen
    (disposal methods, transparency) is out of scope: frame sampling
    for ML features wants each frame's decoded content, not a
    player-accurate canvas.
    """
    if not is_gif(blob):
        raise ValueError("not a GIF")
    _sw, _sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", blob, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = blob[pos:pos + 3 * n]
        pos += 3 * n

    while pos < len(blob):
        b = blob[pos]
        if b == 0x21:                      # extension: skip sub-blocks
            pos += 2
            while blob[pos] != 0:
                pos += 1 + blob[pos]
            pos += 1
        elif b == 0x2C:                    # image descriptor
            _left, _top, w, h, ipacked = struct.unpack_from(
                "<HHHHB", blob, pos + 1)
            pos += 10
            table = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                table = blob[pos:pos + 3 * n]
                pos += 3 * n
            if table is None:  # pragma: no cover - spec-corrupt
                raise ValueError("no color table")
            min_code_size = blob[pos]
            pos += 1
            data = bytearray()
            while blob[pos] != 0:
                ln = blob[pos]
                data += blob[pos + 1:pos + 1 + ln]
                pos += 1 + ln
            pos += 1                        # the 0x00 terminator
            idx = _lzw_decode(min_code_size, bytes(data))[:w * h]
            rows = [idx[r * w:(r + 1) * w] for r in range(h)]
            if ipacked & 0x40:
                rows = _deinterlace(rows)
            rgb = bytearray()
            for row in rows:
                for i in row:
                    rgb += table[3 * i:3 * i + 3]
            yield w, h, 3, bytes(rgb)
        elif b == 0x3B:                    # trailer
            return
        else:  # pragma: no cover - corrupt stream
            raise ValueError(f"bad block 0x{b:02x}")


def gif_decode(blob: bytes) -> tuple[int, int, int, bytes]:
    """Decode the FIRST frame: (width, height, channels=3, rgb)."""
    for frame in gif_frames(blob):
        return frame
    raise ValueError("no image data")


# Rec.601 mean luma: GIF frames are always decoded to 3-channel RGB,
# which png_minimal.mean_luma already handles — one implementation to
# keep the luma convention in (review catch: the 13-line twin drifted).
from .png_minimal import mean_luma  # noqa: E402,F401


def gif_encode(width: int, height: int, palette: list[tuple[int, int, int]],
               indices: list[int]) -> bytes:
    """Minimal GIF87a writer with REAL LZW compression (tests/
    fixtures): dictionary-building encoder with code-width growth and
    reset at 4096, so round-trips exercise the decoder's growth,
    KwKwK and reset paths — not just the fixed-width fast path."""
    bits = max(2, (len(palette) - 1).bit_length())
    n = 1 << bits
    pal = bytearray()
    for r, g, b in palette:
        pal += bytes((r, g, b))
    pal += b"\x00" * (3 * (n - len(palette)))

    out = bytearray(b"GIF87a")
    out += struct.pack("<HHBBB", width, height,
                       0x80 | (bits - 1), 0, 0)
    out += pal
    _append_image_block(out, width, height, bits, indices)
    out += b"\x3b"
    return bytes(out)


def gif_encode_animated(width: int, height: int,
                        palette: list[tuple[int, int, int]],
                        frames: list[list[int]]) -> bytes:
    """Multi-frame GIF87a writer (tests/fixtures): one image block per
    frame, all sharing the global color table."""
    bits = max(2, (len(palette) - 1).bit_length())
    n = 1 << bits
    pal = bytearray()
    for r, g, b in palette:
        pal += bytes((r, g, b))
    pal += b"\x00" * (3 * (n - len(palette)))
    out = bytearray(b"GIF87a")
    out += struct.pack("<HHBBB", width, height,
                       0x80 | (bits - 1), 0, 0)
    out += pal
    for indices in frames:
        _append_image_block(out, width, height, bits, indices)
    out += b"\x3b"
    return bytes(out)


def _append_image_block(out: bytearray, width: int, height: int,
                        bits: int, indices: list[int]) -> None:
    out.append(0x2C)                                       # image separator
    out += struct.pack("<HHHHB", 0, 0, width, height, 0)  # descriptor
    out.append(bits)                                       # min code size

    clear = 1 << bits
    end = clear + 1
    acc = 0
    nbits = 0
    payload = bytearray()
    code_size = bits + 1

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += code_size
        while nbits >= 8:
            payload.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[tuple[int, ...], int] = {(i,): i for i in range(clear)}
    next_code = end + 1
    emit(clear)
    run: tuple[int, ...] = ()
    for px in indices:
        cand = run + (px,)
        if cand in table:
            run = cand
            continue
        emit(table[run])
        table[cand] = next_code
        next_code += 1
        # decoder grows its width when ITS dict hits 2^size; its dict
        # trails the encoder's by one entry, so grow on next_code+...
        if next_code == (1 << code_size) + 1 and code_size < 12:
            code_size += 1
        if next_code == 4097:
            emit(clear)
            table = {(i,): i for i in range(clear)}
            next_code = end + 1
            code_size = bits + 1
        run = (px,)
    if run:
        emit(table[run])
    emit(end)
    if nbits:
        payload.append(acc & 0xFF)
    for i in range(0, len(payload), 255):
        chunk = payload[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00"
