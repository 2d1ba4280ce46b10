"""Progressive JPEG (SOF2) decoder + encoder, stdlib-only.

Closes the last real gap in the from-scratch media codec family
(png_minimal, gif_minimal, wav_minimal, jpeg_minimal): a full
Huffman-coded progressive decode — spectral selection AND successive
approximation, DC + AC first/refinement passes, EOB runs, interleaved
DC scans, restart markers — built against the public ITU T.81 spec
(Annexes G.1/G.2), sharing the bit/Huffman/DCT machinery of
``jpeg_minimal``. Like the baseline decoder it targets the LUMA
plane: every scan is entropy-decoded (required — coefficient state
accumulates across scans), but only the Y component is inverse
transformed.

The encoder writes progressive streams (grayscale or YCbCr 4:4:4)
with a scan script that exercises every decoder path: a
point-transformed interleaved DC first scan, a DC refinement scan,
banded AC first scans with real EOB-run accumulation, and AC
refinement scans with buffered correction bits (T.81 G.1.2.3 — the
libjpeg-published algorithm re-derived from the spec). Because
progressive refinement is lossless over the quantized coefficients,
a full scan script must reproduce the EXACT coefficients of the
baseline encoder — tests assert bit-identical pixels against
``jpeg_minimal``'s baseline round-trip, a much stronger oracle than
a tolerance bound.

Out of scope (permanently — see SURVEY.md §2.11): arithmetic-coded
JPEG (patent-historical, near-zero corpus share), 12-bit precision,
WebP and video frame payloads. Those return honest header metadata
with NULL luma via ``media_meta_minimal``.

Reference parity note: the reference engine (internal/app/*.go) has
no media path; this serves SURVEY.md §2.11's multimodal mandate.
"""

from __future__ import annotations

import math
import struct

from .jpeg_minimal import (
    AC_LUMA_VALS,
    DC_LUMA_BITS,
    DC_LUMA_VALS,
    QUANT_LUMA,
    ZIGZAG,
    _BitReader,
    _BitWriter,
    _build_huffman,
    _extend,
    _fdct8x8,
    _huff_decode,
    _idct8x8,
    _mag_bits,
    _block_at,
)

# Flat canonical AC table for PROGRESSIVE scans: all 256 run/size
# symbols (255 at 9 bits + 1 at 10 — a DHT count is one byte, so a
# single 256-entry length class is unrepresentable). Needed because
# the Annex-K sequential AC table has no EOBn codes (r<<4 for r>=1),
# which progressive EOB runs require; a flat self-consistent table
# keeps round-trip correctness independent of spec transcription.
PROG_AC_BITS = [0, 0, 0, 0, 0, 0, 0, 0, 255, 1, 0, 0, 0, 0, 0, 0]
PROG_AC_VALS = list(range(256))


def is_progressive_jpeg(blob: bytes) -> bool:
    """True if the stream's frame header is SOF2 (scan for the first
    SOF marker; cheap — headers precede entropy data)."""
    if blob[:2] != b"\xff\xd8":
        return False
    i = 2
    while i + 4 <= len(blob):
        if blob[i] != 0xFF:
            return False
        marker = blob[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xC2:
            return True
        if marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                      0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF, 0xDA, 0xD9):
            return False
        if i + 4 > len(blob):
            return False
        (seg_len,) = struct.unpack_from(">H", blob, i + 2)
        i += 2 + seg_len
    return False


def jpeg_decode_luma_progressive(blob: bytes):
    """Decode a progressive JPEG's LUMA plane.

    Same contract as ``jpeg_minimal.jpeg_decode_luma``: returns
    (width, height, n_components, luma_bytes); raises ValueError on
    corrupt/unsupported input (never IndexError/struct.error — the
    mapInPandas kernel treats ValueError as the corrupt-blob route).
    """
    try:
        return _decode(blob)
    except (IndexError, struct.error) as exc:
        raise ValueError(f"corrupt JPEG: {exc}") from exc


def _decode(blob: bytes):
    if blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    quants: dict[int, list[int]] = {}
    huffs: dict[tuple[int, int], dict] = {}
    frame = None          # (h, w, comps); comps = [(cid, hs, vs, tq)]
    state = None          # per-component zigzag coefficient grids
    dri = 0
    i = 2
    while i + 2 <= len(blob):
        if blob[i] != 0xFF:
            raise ValueError("bad marker stream")
        marker = blob[i + 1]
        if marker == 0xFF:    # fill byte
            i += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:    # EOI
            break
        (seg_len,) = struct.unpack_from(">H", blob, i + 2)
        seg = blob[i + 4:i + 2 + seg_len]
        if marker == 0xDB:
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                zz = list(seg[p + 1:p + 65])
                if len(zz) < 64:
                    raise ValueError("truncated DQT segment")
                quants[tq] = zz          # kept in zigzag order
                p += 65
        elif marker == 0xC2:
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (h, w, comps)
            state = _init_state(frame)
        elif marker in (0xC0, 0xC1, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("not a progressive (SOF2) JPEG")
        elif marker == 0xC4:
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
        elif marker == 0xDD:
            (dri,) = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scomps = []
            for c in range(ns):
                scomps.append((seg[1 + 2 * c], seg[2 + 2 * c] >> 4,
                               seg[2 + 2 * c] & 0x0F))
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah_al = seg[3 + 2 * ns]
            i = _decode_prog_scan(
                blob, i + 2 + seg_len, frame, state, scomps,
                ss, se, ah_al >> 4, ah_al & 0x0F, huffs, dri)
            continue
        i += 2 + seg_len
    if frame is None or state is None:
        raise ValueError("no SOF2 frame found")
    return _reconstruct_luma(frame, state, quants)


def _init_state(frame):
    """Per component: (padded-grid block width, non-padded nbx, nby,
    list of 64-int zigzag coefficient blocks)."""
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    state = []
    for (_cid, hs, vs, _tq) in comps:
        cw = (w * hs + hmax - 1) // hmax
        ch = (h * vs + vmax - 1) // vmax
        nbx = (cw + 7) // 8
        nby = (ch + 7) // 8
        gw, gh = mcux * hs, mcuy * vs
        blocks = [[0] * 64 for _ in range(gw * gh)]
        state.append((gw, nbx, nby, blocks))
    return state


def _decode_prog_scan(blob, pos, frame, state, scomps, ss, se, ah, al,
                      huffs, dri):
    h, w, comps = frame
    cidx = []
    for (cs, td, ta) in scomps:
        for ci, (cid, _hs, _vs, _tq) in enumerate(comps):
            if cid == cs:
                cidx.append((ci, td, ta))
                break
        else:
            raise ValueError("scan references unknown component")
    r = _BitReader(blob, pos)
    if ss == 0:
        if se != 0:
            raise ValueError("DC scan with Se != 0")
        _decode_dc_scan(r, frame, state, cidx, ah, al, huffs, dri)
    else:
        if len(cidx) != 1:
            raise ValueError("progressive AC scan must be single-component")
        _decode_ac_scan(r, state, cidx[0], ss, se, ah, al, huffs, dri)
    # skip to the next marker (entropy data may end mid-byte)
    i = r.pos
    while i + 1 < len(blob):
        if (blob[i] == 0xFF and blob[i + 1] not in (0x00, 0xFF)
                and not 0xD0 <= blob[i + 1] <= 0xD7):
            return i
        i += 1
    return len(blob)


def _decode_dc_scan(r, frame, state, cidx, ah, al, huffs, dri):
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    preds = [0] * len(cidx)
    tables = []
    for (ci, td, _ta) in cidx:
        if ah == 0 and (0, td) not in huffs:
            raise ValueError("missing DC Huffman table")
        tables.append(huffs.get((0, td)))

    def one_block(si, coef):
        if ah == 0:                       # first pass
            s = _huff_decode(r, tables[si])
            preds[si] += _extend(r.receive(s), s)
            coef[0] = preds[si] << al
        else:                             # refinement: one raw bit
            if r.read_bit():
                coef[0] |= 1 << al

    if len(cidx) > 1:                     # interleaved MCU order
        n = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if dri and n and n % dri == 0:
                    r.restart()
                    preds = [0] * len(cidx)
                n += 1
                for si, (ci, _td, _ta) in enumerate(cidx):
                    gw, _nbx, _nby, blocks = state[ci]
                    hs, vs = comps[ci][1], comps[ci][2]
                    for by in range(vs):
                        for bx in range(hs):
                            idx = (my * vs + by) * gw + (mx * hs + bx)
                            one_block(si, blocks[idx])
    else:                                 # single component raster
        ci = cidx[0][0]
        gw, nbx, nby, blocks = state[ci]
        n = 0
        for by in range(nby):
            for bx in range(nbx):
                if dri and n and n % dri == 0:
                    r.restart()
                    preds = [0] * len(cidx)
                n += 1
                one_block(0, blocks[by * gw + bx])


def _decode_ac_scan(r, state, cta, ss, se, ah, al, huffs, dri):
    ci, _td, ta = cta
    if (1, ta) not in huffs:
        raise ValueError("missing AC Huffman table")
    act = huffs[(1, ta)]
    gw, nbx, nby, blocks = state[ci]
    eobrun = 0
    p1 = 1 << al
    m1 = -1 << al
    n = 0
    for by in range(nby):
        for bx in range(nbx):
            if dri and n and n % dri == 0:
                r.restart()
                eobrun = 0
            n += 1
            coef = blocks[by * gw + bx]
            if ah == 0:
                eobrun = _ac_first_block(r, act, coef, ss, se, al, eobrun)
            else:
                eobrun = _ac_refine_block(r, act, coef, ss, se, p1, m1,
                                          eobrun)
    return eobrun


def _ac_first_block(r, act, coef, ss, se, al, eobrun):
    """T.81 G.2.2: AC coefficients, first pass for this band/Al."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _huff_decode(r, act)
        run, s = rs >> 4, rs & 0x0F
        if s == 0:
            if run == 15:                 # ZRL
                k += 16
                continue
            eobrun = 1 << run
            if run:
                eobrun += r.receive(run)
            return eobrun - 1             # current block is one EOB
        k += run
        if k > se:
            raise ValueError("AC run past band end")
        coef[k] = _extend(r.receive(s), s) << al
        k += 1
    return 0


def _ac_refine_block(r, act, coef, ss, se, p1, m1, eobrun):
    """T.81 G.2.3 (successive-approximation AC refinement): walk the
    band; zero-history positions consume the run/new-coefficient
    codes, nonzero-history positions each consume one correction
    bit in positional order."""

    def refine_at(k):
        if r.read_bit() and (coef[k] & p1) == 0:
            coef[k] += p1 if coef[k] >= 0 else m1

    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _huff_decode(r, act)
            run, s = rs >> 4, rs & 0x0F
            if s == 0:
                if run != 15:             # EOBn
                    eobrun = 1 << run
                    if run:
                        eobrun += r.receive(run)
                    break
                val = 0                   # ZRL: 16 zero-history skips
            else:
                if s != 1:
                    raise ValueError("refinement magnitude must be 1")
                val = p1 if r.read_bit() else m1
            while k <= se:
                if coef[k] != 0:
                    refine_at(k)
                else:
                    if run == 0:
                        break
                    run -= 1
                k += 1
            if val and k <= se:
                coef[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:                    # correction bits to band end
            if coef[k] != 0:
                refine_at(k)
            k += 1
        return eobrun - 1
    return 0


def _reconstruct_luma(frame, state, quants):
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    _cid, y_hs, y_vs, y_tq = comps[0]
    if y_tq not in quants:
        raise ValueError("missing quant table for luma")
    quant = quants[y_tq]
    gw, nbx, nby, blocks = state[0]
    luma = bytearray(w * h)
    sx = hmax // y_hs
    sy = vmax // y_vs
    for by in range(nby):
        for bx in range(nbx):
            zz = blocks[by * gw + bx]
            nat = [0.0] * 64
            for z in range(64):
                if zz[z]:
                    nat[ZIGZAG[z]] = zz[z] * quant[z]
            px = _idct8x8(nat)
            x0 = bx * 8 * sx
            y0 = by * 8 * sy
            for py in range(8):
                for ry in range(sy):
                    ty = y0 + py * sy + ry
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


def jpeg_mean_luma_progressive(blob: bytes):
    """(width, height, n_components, mean luma in [0,1]) — the
    ``extract_image_features`` contract, progressive variant."""
    w, h, nc, y = jpeg_decode_luma_progressive(blob)
    if not y:
        return w, h, nc, 0.0
    return w, h, nc, sum(y) / len(y) / 255.0


# ------------------------------------------------------------------
# Encoder (test/fixture generator, same philosophy as jpeg_minimal's:
# the tables written into DHT are the tables used for the entropy
# data, so round-trip correctness is self-consistent).
# ------------------------------------------------------------------

# Default scan script: every decoder path. (band-first then refine;
# DC scan is interleaved when nc > 1.)
DEFAULT_SCANS = [
    ("dc", 0, 0, 0, 1),     # (kind, Ss, Se, Ah, Al) DC first, Al=1
    ("dc", 0, 0, 1, 0),     # DC refinement
    ("ac", 1, 5, 0, 1),     # low band, point-transformed
    ("ac", 6, 63, 0, 1),    # high band, point-transformed
    ("ac", 1, 5, 1, 0),     # low-band refinement
    ("ac", 6, 63, 1, 0),    # high-band refinement
]


class _ScanWriter:
    """Entropy writer for one progressive scan: EOB-run accumulation
    plus the refinement-pass buffered correction bits (emitted after
    the next Huffman symbol, in positional order — T.81 G.1.2.3)."""

    def __init__(self, wtr: _BitWriter, ac_enc: dict):
        self.w = wtr
        self.ac = ac_enc
        self.eobrun = 0
        self.pending: list[int] = []

    def symbol(self, rs: int) -> None:
        code, length = self.ac[rs]
        self.w.write(code, length)

    def flush_pending(self) -> None:
        for b in self.pending:
            self.w.write(b, 1)
        self.pending = []

    def flush_eobrun(self) -> None:
        if self.eobrun:
            r = self.eobrun.bit_length() - 1
            self.symbol(r << 4)
            if r:
                self.w.write(self.eobrun - (1 << r), r)
            self.eobrun = 0
        self.flush_pending()


def _encode_ac_first(sw: _ScanWriter, qz: list[int], ss, se, al):
    vals = [0] * (se + 1)
    last = 0
    for k in range(ss, se + 1):
        v = abs(qz[k]) >> al
        vals[k] = -v if qz[k] < 0 else v
        if v:
            last = k
    if last == 0:
        sw.eobrun += 1
        if sw.eobrun == 0x7FFF:
            sw.flush_eobrun()
        return
    sw.flush_eobrun()
    run = 0
    for k in range(ss, last + 1):
        if vals[k] == 0:
            run += 1
            continue
        while run > 15:
            sw.symbol(0xF0)               # ZRL
            run -= 16
        s, code = _mag_bits(vals[k])
        sw.symbol((run << 4) | s)
        sw.w.write(code, s)
        run = 0
    if last < se:
        sw.eobrun += 1
        if sw.eobrun == 0x7FFF:
            sw.flush_eobrun()


def _encode_ac_refine(sw: _ScanWriter, qz: list[int], ss, se, al):
    """T.81 G.1.2.3 refinement pass (the libjpeg-published walk).

    The ZRL flush must happen at the FIRST nonzero position after the
    pending zero run crosses 15 — this is what keeps the buffered
    correction bits positionally aligned with the decoder's
    skip-16-zeros walk. A magnitude of exactly 1 at this level is
    always newly nonzero (abs in [2^Al, 2^{Al+1}) ⇒ previous level
    saw 0), so no explicit history check is needed there.
    """
    absv = [0] * (se + 1)
    eob = 0                               # last newly-nonzero index
    for k in range(ss, se + 1):
        absv[k] = abs(qz[k]) >> al
        if absv[k] == 1:
            eob = k
    run = 0
    block_bits: list[int] = []            # correction bits since last symbol
    for k in range(ss, se + 1):
        t = absv[k]
        if t == 0:
            run += 1
            continue
        while run > 15 and k <= eob:      # fold trailing runs into EOB
            sw.flush_eobrun()
            sw.symbol(0xF0)
            run -= 16
            for b in block_bits:
                sw.w.write(b, 1)
            block_bits = []
        if t > 1:                         # previously nonzero: one bit
            block_bits.append(t & 1)
            continue
        sw.flush_eobrun()                 # prior blocks' EOB run first
        sw.symbol((run << 4) | 1)
        sw.w.write(1 if qz[k] > 0 else 0, 1)   # sign bit
        for b in block_bits:
            sw.w.write(b, 1)
        block_bits = []
        run = 0
    if run > 0 or block_bits:             # band tail: EOB for this block
        sw.eobrun += 1
        sw.pending.extend(block_bits)
        if sw.eobrun == 0x7FFF:
            sw.flush_eobrun()


def jpeg_encode_progressive(width: int, height: int,
                            planes: list[bytes],
                            scans=None,
                            restart_interval: int = 0) -> bytes:
    """Encode 1 (grayscale) or 3 (YCbCr 4:4:4) planes as a
    progressive (SOF2) JPEG using ``scans`` — a list of
    ``(kind, Ss, Se, Ah, Al)`` with kind ``"dc"``/``"ac"``; DC scans
    are interleaved across all components, AC scans are emitted once
    per component (spec: single-component only)."""
    nc = len(planes)
    if nc not in (1, 3):
        raise ValueError("1 or 3 planes")
    for p in planes:
        if len(p) != width * height:
            raise ValueError("pixel buffer size mismatch")
    scans = DEFAULT_SCANS if scans is None else scans
    quant_zz = [QUANT_LUMA[ZIGZAG[z]] for z in range(64)]
    dc_enc = {v: (code, length) for (length, code), v in
              _build_huffman(DC_LUMA_BITS, DC_LUMA_VALS).items()}
    ac_enc = {v: (code, length) for (length, code), v in
              _build_huffman(PROG_AC_BITS, PROG_AC_VALS).items()}

    # quantized zigzag coefficients for every block of every plane
    nbx, nby = (width + 7) // 8, (height + 7) // 8
    allq = []
    for p in planes:
        comp = []
        for by in range(nby):
            for bx in range(nbx):
                coef = _fdct8x8(_block_at(p, width, height, bx, by))
                # EXACT same rounding as the baseline encoder
                # (jpeg_minimal._encode_block) so a full progressive
                # scan script reproduces identical coefficients —
                # tests assert bit-identical pixels across the two.
                comp.append([int(math.floor(coef[ZIGZAG[z]] / quant_zz[z]
                                            + 0.5))
                             for z in range(64)])
        allq.append(comp)

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(quant_zz)
    sof = struct.pack(">BHHB", 8, height, width, nc) \
        + b"".join(bytes([c + 1, 0x11, 0]) for c in range(nc))
    out += b"\xff\xc2" + struct.pack(">H", 2 + len(sof)) + sof
    out += b"\xff\xc4" + struct.pack(">H", 19 + len(DC_LUMA_VALS)) \
        + b"\x00" + bytes(DC_LUMA_BITS) + bytes(DC_LUMA_VALS)
    out += b"\xff\xc4" + struct.pack(">H", 19 + len(PROG_AC_VALS)) \
        + b"\x10" + bytes(PROG_AC_BITS) + bytes(PROG_AC_VALS)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    def emit_scan(scomps, ss, se, ah, al, body):
        nonlocal out
        sos = bytes([len(scomps)]) \
            + b"".join(bytes([cid, tt]) for cid, tt in scomps) \
            + bytes([ss, se, (ah << 4) | al])
        out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
        out += body

    rst_no = 0
    for (kind, ss, se, ah, al) in scans:
        if kind == "dc":
            wtr = _BitWriter()
            preds = [0] * nc
            nunit = 0
            body = bytearray()
            for bi in range(nbx * nby):   # MCU order == block raster (1x1)
                if restart_interval and nunit \
                        and nunit % restart_interval == 0:
                    wtr.flush()
                    body += wtr.out
                    body += bytes([0xFF, 0xD0 + (rst_no % 8)])
                    rst_no += 1
                    wtr = _BitWriter()
                    preds = [0] * nc
                nunit += 1
                for c in range(nc):
                    q0 = allq[c][bi][0]
                    # DC point transform is an ARITHMETIC shift of the
                    # signed value (T.81 G.1.2.1) — the decoder's
                    # refinement OR (coef |= 1<<Al) only composes with
                    # floor-shifted first-pass values; a magnitude
                    # shift would be off by one for negative DCs.
                    lvl = q0 >> al
                    if ah == 0:
                        diff = lvl - preds[c]
                        preds[c] = lvl
                        s, code = _mag_bits(diff)
                        hc, hl = dc_enc[s]
                        wtr.write(hc, hl)
                        if s:
                            wtr.write(code, s)
                    else:
                        wtr.write((q0 >> al) & 1, 1)
            wtr.flush()
            body += wtr.out
            emit_scan([(c + 1, 0x00) for c in range(nc)],
                      ss, se, ah, al, bytes(body))
        else:
            for c in range(nc):           # one AC scan per component
                wtr = _BitWriter()
                sw = _ScanWriter(wtr, ac_enc)
                body = bytearray()
                nunit = 0
                for bi in range(nbx * nby):
                    if restart_interval and nunit \
                            and nunit % restart_interval == 0:
                        sw.flush_eobrun()
                        wtr.flush()
                        body += wtr.out
                        body += bytes([0xFF, 0xD0 + (rst_no % 8)])
                        rst_no += 1
                        wtr = _BitWriter()
                        sw = _ScanWriter(wtr, ac_enc)
                    nunit += 1
                    if ah == 0:
                        _encode_ac_first(sw, allq[c][bi], ss, se, al)
                    else:
                        _encode_ac_refine(sw, allq[c][bi], ss, se, al)
                sw.flush_eobrun()
                wtr.flush()
                body += wtr.out
                emit_scan([(c + 1, 0x00)], ss, se, ah, al, bytes(body))
    out += b"\xff\xd9"
    return bytes(out)


def jpeg_encode_gray_progressive(width: int, height: int, pixels: bytes,
                                 scans=None,
                                 restart_interval: int = 0) -> bytes:
    return jpeg_encode_progressive(width, height, [pixels], scans,
                                   restart_interval)


def jpeg_encode_ycbcr444_progressive(width: int, height: int, y: bytes,
                                     cb: bytes, cr: bytes, scans=None,
                                     restart_interval: int = 0) -> bytes:
    return jpeg_encode_progressive(width, height, [y, cb, cr], scans,
                                   restart_interval)
