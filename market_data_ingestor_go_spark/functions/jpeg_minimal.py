"""Baseline JPEG (SOF0/SOF1) decoder + grayscale encoder, stdlib-only.

Finishes the from-scratch media codec family (png_minimal: zlib +
Paeth; gif_minimal: full LZW + interlace; wav_minimal: PCM): a real
Huffman + dequantize + IDCT pixel decode for baseline sequential
JPEG, built against the public ITU T.81 spec — no PIL/opencv in this
container (probed every round). The decoder targets the LUMA channel
(what ``extract_image_features`` needs for mean_luma): Y blocks get
the full IDCT; chroma blocks are entropy-decoded (the bitstream is
sequential — you cannot skip them) but not inverse-transformed.

Supported: SOF0/SOF1 frames, 8-bit, any sampling factors (4:4:4,
4:2:2, 4:2:0), restart markers, multiple DQT/DHT segments.
Unsupported here (raises ValueError): progressive (SOF2) — decoded
for real by ``jpeg_progressive_minimal`` (r8), which callers try
next; arithmetic coding, 12-bit and DNL fall back to header-only
metadata (permanently out of scope, SURVEY.md §2.11).

The encoder writes GRAYSCALE baseline JPEG (one component, standard
Annex-K luminance quant table, self-consistent Huffman tables — the
same tables are written into DHT and used for the entropy data, so
round-trip correctness never depends on transcribing the spec
perfectly). It exists so tests can property-check decode against
known pixels without any third-party codec.

Reference parity note: the reference engine has no media path at all;
this module serves SURVEY.md §2.11's multimodal mandate
(operators/multimodal.py).
"""

from __future__ import annotations

import math
import struct

# zigzag index -> natural (row-major) index
ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# ITU T.81 Annex K.1 luminance quantization table (zigzag order here
# is NOT used — this is natural row-major order).
QUANT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]

# Annex K.3 typical luminance Huffman tables: (bits[1..16], values).
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# precomputed IDCT basis: _COS[u][x] = C(u) * cos((2x+1) u pi / 16)
_COS = [[(math.sqrt(0.5) if u == 0 else 1.0)
         * math.cos((2 * x + 1) * u * math.pi / 16)
         for x in range(8)] for u in range(8)]


def _build_huffman(bits: list[int], vals: list[int]) -> dict:
    """Canonical Huffman table → {(length, code): value}."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _BitReader:
    """Entropy-segment bit reader: 0xFF00 unstuffing; any other
    marker ends the stream (RST markers are consumed explicitly by
    the MCU loop via ``restart``)."""

    def __init__(self, buf: bytes, pos: int):
        self.buf, self.pos, self.bit = buf, pos, 0

    def _byte_ok(self, i: int) -> bool:
        b = self.buf[i]
        if b != 0xFF:
            return True
        return i + 1 < len(self.buf) and self.buf[i + 1] == 0x00

    def read_bit(self) -> int:
        if self.pos >= len(self.buf) or not self._byte_ok(self.pos):
            raise ValueError("entropy data exhausted")
        b = self.buf[self.pos]
        v = (b >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 2 if b == 0xFF else 1  # skip stuffed 0x00
        return v

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def restart(self) -> None:
        """Byte-align and consume an RSTn marker."""
        if self.bit:
            self.bit = 0
            self.pos += 2 if self.buf[self.pos] == 0xFF else 1
        if (self.pos + 1 >= len(self.buf)
                or self.buf[self.pos] != 0xFF
                or not 0xD0 <= self.buf[self.pos + 1] <= 0xD7):
            raise ValueError("expected restart marker")
        self.pos += 2


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1: map a received magnitude to its signed value."""
    return v if s == 0 or v >= (1 << (s - 1)) else v - (1 << s) + 1


def _huff_decode(r: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | r.read_bit()
        if (length, code) in table:
            return table[(length, code)]
    raise ValueError("invalid Huffman code")


def _decode_block(r: _BitReader, dc_tbl: dict, ac_tbl: dict,
                  quant: list[int], pred: int) -> tuple[list[float], int]:
    """One 8×8 block → (dequantized natural-order coefficients, new
    DC predictor)."""
    coef = [0.0] * 64
    s = _huff_decode(r, dc_tbl)
    pred += _extend(r.receive(s), s)
    coef[0] = pred * quant[0]
    k = 1
    while k < 64:
        rs = _huff_decode(r, ac_tbl)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:  # ZRL: sixteen zeros
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("AC run past block end")
        coef[ZIGZAG[k]] = _extend(r.receive(size), size) * quant[k]
        k += 1
    return coef, pred


def _idct8x8(coef: list[float]) -> list[int]:
    """Separable float IDCT + level shift + clamp → 64 pixel values."""
    # rows (u over columns) then columns
    tmp = [0.0] * 64
    for y in range(8):
        row = coef[y * 8:y * 8 + 8]
        for x in range(8):
            tmp[y * 8 + x] = 0.5 * sum(row[u] * _COS[u][x]
                                       for u in range(8) if row[u])
    out = [0] * 64
    for x in range(8):
        col = [tmp[y * 8 + x] for y in range(8)]
        for y in range(8):
            v = 0.5 * sum(col[u] * _COS[u][y] for u in range(8))
            p = int(round(v)) + 128
            out[y * 8 + x] = 0 if p < 0 else (255 if p > 255 else p)
    return out


def is_baseline_jpeg(blob: bytes) -> bool:
    return blob[:2] == b"\xff\xd8"


def jpeg_decode_luma(blob: bytes):
    """Decode a baseline JPEG's LUMA plane.

    Returns (width, height, n_components, luma_bytes) with
    ``luma_bytes`` a row-major ``bytes`` of length width*height
    (Y channel for color images, the single channel for grayscale).
    Raises ValueError for non-baseline/corrupt input (corrupt-blob
    hardening: truncated segments must fail as ValueError, never
    leak IndexError/struct.error into the calling kernel).
    """
    try:
        return _jpeg_decode_luma(blob)
    except (IndexError, struct.error) as exc:
        raise ValueError(f"corrupt JPEG: {exc}") from exc


def _jpeg_decode_luma(blob: bytes):
    if not is_baseline_jpeg(blob):
        raise ValueError("not a JPEG (missing SOI)")
    quants: dict[int, list[int]] = {}
    huffs: dict[tuple[int, int], dict] = {}
    frame = None  # (h, w, comps) with comps = [(cid, hs, vs, tq)]
    dri = 0
    i = 2
    while i + 4 <= len(blob):
        if blob[i] != 0xFF:
            raise ValueError("bad marker stream")
        marker = blob[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:
            break
        (seg_len,) = struct.unpack_from(">H", blob, i + 2)
        seg = blob[i + 4:i + 2 + seg_len]
        if marker == 0xDB:  # DQT: one or more tables
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                zz = list(seg[p + 1:p + 65])
                if len(zz) < 64:
                    raise ValueError("truncated DQT segment")
                q = [0] * 64
                for z in range(64):
                    q[z] = zz[z]  # keep zigzag order: dequant by k
                quants[tq] = q
                p += 65
        elif marker in (0xC0, 0xC1):  # SOF0/1: baseline sequential
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline JPEG (progressive/arith)")
        elif marker == 0xC4:  # DHT: one or more tables
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1:p + 17])
                n = sum(bits)
                vals = list(seg[p + 17:p + 17 + n])
                if len(bits) < 16 or len(vals) < n:
                    raise ValueError("truncated DHT segment")
                huffs[(tc, th)] = _build_huffman(bits, vals)
                p += 17 + n
        elif marker == 0xDD:  # DRI
            (dri,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tables = seg[1 + 2 * c], seg[2 + 2 * c]
                scan.append((cs, tables >> 4, tables & 0x0F))
            return _decode_scan(blob, i + 2 + seg_len, frame, scan,
                                quants, huffs, dri)
        i += 2 + seg_len
    raise ValueError("no scan data (SOS) found")


def _decode_scan(blob, pos, frame, scan, quants, huffs, dri):
    h, w, comps = frame
    if len(scan) != len(comps):
        raise ValueError("partial scans unsupported")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    # per-component decode config in scan order
    cfg = []
    y_idx = None
    for (cs, td, ta) in scan:
        for (cid, hs, vs, tq) in comps:
            if cid == cs:
                break
        else:
            raise ValueError("scan references unknown component")
        if tq not in quants or (0, td) not in huffs or (1, ta) not in huffs:
            raise ValueError("missing quant/Huffman table")
        cfg.append((hs, vs, quants[tq], huffs[(0, td)], huffs[(1, ta)]))
    # luma = first component (grayscale: the only one)
    y_idx = 0
    y_hs, y_vs = cfg[0][0], cfg[0][1]
    luma = bytearray(w * h)
    preds = [0] * len(cfg)
    r = _BitReader(blob, pos)
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and (my * mcux + mx) and (my * mcux + mx) % dri == 0:
                r.restart()
                preds = [0] * len(cfg)
            for ci, (hs, vs, quant, dct, act) in enumerate(cfg):
                for by in range(vs):
                    for bx in range(hs):
                        coef, preds[ci] = _decode_block(
                            r, dct, act, quant, preds[ci])
                        if ci != y_idx:
                            continue  # chroma: bitstream only
                        px = _idct8x8(coef)
                        # Y maps to full resolution scaled by hs/hmax
                        x0 = (mx * hs + bx) * 8 * hmax // y_hs
                        yy0 = (my * vs + by) * 8 * vmax // y_vs
                        sx = hmax // y_hs  # pixel replication factor
                        sy = vmax // y_vs
                        for py in range(8):
                            for ry in range(sy):
                                ty = yy0 + py * sy + ry
                                if ty >= h:
                                    break
                                base = ty * w
                                for pxx in range(8):
                                    v = px[py * 8 + pxx]
                                    for rx in range(sx):
                                        tx = x0 + pxx * sx + rx
                                        if tx < w:
                                            luma[base + tx] = v
    return w, h, len(comps), bytes(luma)


def jpeg_mean_luma(blob: bytes) -> tuple[int, int, int, float]:
    """(width, height, n_components, mean luma in [0,1]) — the
    ``extract_image_features`` contract for real pixel decode."""
    w, h, nc, y = jpeg_decode_luma(blob)
    if not y:
        return w, h, nc, 0.0
    return w, h, nc, sum(y) / len(y) / 255.0


# ------------------------------------------------------------------
# Encoder: GRAYSCALE baseline (test/fixture generator — round-trip
# property tests need a real entropy-coded stream and no third-party
# codec exists in this container).
# ------------------------------------------------------------------


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc, self.n = 0, 0

    def flush(self) -> None:
        while self.n:  # pad with 1s per spec
            self.write(1, 1)


def _encode_table(bits: list[int], vals: list[int]) -> dict:
    """value -> (code, length) for encoding."""
    dec = _build_huffman(bits, vals)
    return {v: (code, length) for (length, code), v in dec.items()}


def _fdct8x8(px: list[int]) -> list[float]:
    out = [0.0] * 64
    for u in range(8):
        for v in range(8):
            s = 0.0
            for y in range(8):
                for x in range(8):
                    s += ((px[y * 8 + x] - 128)
                          * _COS[v][x] * _COS[u][y])
            out[u * 8 + v] = 0.25 * s
    return out


def _mag_bits(v: int) -> tuple[int, int]:
    """(size, code) for a signed coefficient per T.81 F.1.2.2.1."""
    if v == 0:
        return 0, 0
    a, s = abs(v), 0
    while a:
        a >>= 1
        s += 1
    code = v if v > 0 else v + (1 << s) - 1
    return s, code


def _encode_block(wtr: _BitWriter, block: list[int], quant_zz: list[int],
                  dc_enc: dict, ac_enc: dict, pred: int) -> int:
    coef = _fdct8x8(block)
    qz = [int(math.floor(coef[ZIGZAG[z]] / quant_zz[z] + 0.5))
          for z in range(64)]
    diff = qz[0] - pred
    s, code = _mag_bits(diff)
    hc, hl = dc_enc[s]
    wtr.write(hc, hl)
    if s:
        wtr.write(code, s)
    run = 0
    last_nz = max((z for z in range(1, 64) if qz[z]), default=0)
    for z in range(1, last_nz + 1):
        if qz[z] == 0:
            run += 1
            continue
        while run > 15:
            hc, hl = ac_enc[0xF0]  # ZRL
            wtr.write(hc, hl)
            run -= 16
        s, code = _mag_bits(qz[z])
        hc, hl = ac_enc[(run << 4) | s]
        wtr.write(hc, hl)
        wtr.write(code, s)
        run = 0
    if last_nz < 63:
        hc, hl = ac_enc[0x00]  # EOB
        wtr.write(hc, hl)
    return qz[0]


def _block_at(plane: bytes, width: int, height: int, bx: int,
              by: int) -> list[int]:
    block = [0] * 64
    for y in range(8):
        sy = min(by * 8 + y, height - 1)  # edge replication
        for x in range(8):
            sx = min(bx * 8 + x, width - 1)
            block[y * 8 + x] = plane[sy * width + sx]
    return block


def _jpeg_encode(width: int, height: int, planes: list[bytes],
                 restart_interval: int = 0) -> bytes:
    """Shared baseline encoder: 1 plane = grayscale, 3 planes =
    YCbCr 4:4:4 (all components 1×1 sampling, shared Annex-K luma
    tables — legal and self-consistent)."""
    nc = len(planes)
    for p in planes:
        if len(p) != width * height:
            raise ValueError("pixel buffer size mismatch")
    quant_zz = [QUANT_LUMA[ZIGZAG[z]] for z in range(64)]
    dc_enc = _encode_table(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_enc = _encode_table(AC_LUMA_BITS, AC_LUMA_VALS)

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" \
        + bytes(quant_zz)  # DQT id 0, zigzag order
    sof = struct.pack(">BHHB", 8, height, width, nc) \
        + b"".join(bytes([c + 1, 0x11, 0]) for c in range(nc))
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    out += b"\xff\xc4" + struct.pack(">H", 19 + len(DC_LUMA_VALS)) \
        + b"\x00" + bytes(DC_LUMA_BITS) + bytes(DC_LUMA_VALS)
    out += b"\xff\xc4" + struct.pack(">H", 19 + len(AC_LUMA_VALS)) \
        + b"\x10" + bytes(AC_LUMA_BITS) + bytes(AC_LUMA_VALS)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([nc]) + b"".join(bytes([c + 1, 0]) for c in range(nc)) \
        + bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    wtr = _BitWriter()
    preds = [0] * nc
    mcux, mcuy = (width + 7) // 8, (height + 7) // 8
    rst = 0
    for by in range(mcuy):
        for bx in range(mcux):
            mcu_i = by * mcux + bx
            if restart_interval and mcu_i \
                    and mcu_i % restart_interval == 0:
                wtr.flush()
                out += wtr.out
                out += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                wtr = _BitWriter()
                preds = [0] * nc
            for c in range(nc):
                preds[c] = _encode_block(
                    wtr, _block_at(planes[c], width, height, bx, by),
                    quant_zz, dc_enc, ac_enc, preds[c])
    wtr.flush()
    out += wtr.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def jpeg_encode_gray(width: int, height: int, pixels: bytes,
                     restart_interval: int = 0) -> bytes:
    """Encode an 8-bit grayscale buffer as baseline JPEG (quality =
    the unscaled Annex-K table)."""
    return _jpeg_encode(width, height, [pixels], restart_interval)


def jpeg_encode_ycbcr444(width: int, height: int, y: bytes, cb: bytes,
                         cr: bytes, restart_interval: int = 0) -> bytes:
    """Encode pre-separated Y/Cb/Cr planes as a 4:4:4 baseline JPEG —
    exercises the decoder's multi-component scan (chroma blocks are
    entropy-decoded but not inverse-transformed)."""
    return _jpeg_encode(width, height, [y, cb, cr], restart_interval)
