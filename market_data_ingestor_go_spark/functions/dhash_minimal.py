"""64-bit perceptual difference hash (dHash) over a decoded luma plane.

Public algorithm (Krawetz 2013, "Kind of Like That", hackerfactor.com):
box-downsample the luma plane to a 9×8 grid and set bit ``r*8 + c``
iff ``grid[r][c] > grid[r][c+1]`` — 8 horizontal gradient comparisons
per row × 8 rows = 64 bits. The hash is invariant to the edits that
defeat byte/text/embedding dedup on images:

- lossless re-encode (different PNG bytes, same pixels → same grid);
- resize (the box average recovers the gradient structure; an exact
  integer-ratio nearest-neighbor upscale recovers the grid EXACTLY);
- global brightness shift without clipping (every comparison shifts by
  the same constant, so no bit flips).

Two near-identical images differ in a few bits, so near-dup pairs come
from a Hamming-distance join — exactly the SimHash machinery
(``operators/dedup.py::hamming_pairs``: pigeonhole block equi-join,
complete for Hamming ≤ num_blocks−1, never an all-pairs scan).

Determinism contract (this is what the DuckDB oracle reproduces): the
downsample cell (r, c) covers source rows ⌊r·h/8⌋..⌊(r+1)·h/8⌋−1 and
cols ⌊c·w/9⌋..⌊(c+1)·w/9⌋−1 (never empty: the end is clamped to start
+1), averaged in float — exact whenever a cell holds equal values, in
particular for any integer-ratio nearest-neighbor upscale of a 9×8
source. Pure stdlib; registered for cloudpickle by-value serialization
in operators/multimodal.py like the codecs it composes with.
"""

from __future__ import annotations

GRID_W, GRID_H = 9, 8


def luma_plane(channels: int, pixels: bytes) -> bytes:
    """Collapse an interleaved 8-bit pixel buffer to one luma byte per
    pixel: gray(+alpha) takes channel 0; color uses integer Rec.601
    (floor of (299R + 587G + 114B)/1000 — deterministic, no float)."""
    if channels == 1:
        return pixels
    if channels == 2:
        return pixels[0::2]
    n = len(pixels) // channels
    return bytes(
        (299 * pixels[i * channels]
         + 587 * pixels[i * channels + 1]
         + 114 * pixels[i * channels + 2]) // 1000
        for i in range(n))


def box_downsample(width: int, height: int, luma: bytes,
                   target_w: int, target_h: int) -> list[list[float]]:
    """Box-average ``luma`` (row-major, width×height) to a
    ``target_h``-row × ``target_w``-col float grid with the floor-grid
    cell boundaries documented in the module docstring."""
    if width < 1 or height < 1 or len(luma) != width * height:
        raise ValueError("luma buffer does not match dimensions")
    grid = []
    for r in range(target_h):
        y0 = r * height // target_h
        y1 = max((r + 1) * height // target_h, y0 + 1)
        row = []
        for c in range(target_w):
            x0 = c * width // target_w
            x1 = max((c + 1) * width // target_w, x0 + 1)
            s = 0
            for y in range(y0, y1):
                base = y * width
                for x in range(x0, x1):
                    s += luma[base + x]
            row.append(s / ((y1 - y0) * (x1 - x0)))
        grid.append(row)
    return grid


def dhash64(width: int, height: int, luma: bytes) -> int:
    """The 64-bit dHash as a SIGNED two's-complement int (bit 63 maps
    to −2^63) so the value round-trips a Spark/DuckDB BIGINT column
    and Hamming distance is ``bit_count(a XOR b)`` in either engine."""
    g = box_downsample(width, height, luma, GRID_W, GRID_H)
    v = 0
    for r in range(GRID_H):
        for c in range(GRID_W - 1):
            if g[r][c] > g[r][c + 1]:
                v |= 1 << (r * 8 + c)
    return v - (1 << 64) if v >= (1 << 63) else v
