"""64-bit perceptual audio fingerprint over decoded PCM.

The image dHash idea (functions/dhash_minimal.py) applied to the
time-frequency plane, in the spirit of the band-energy-difference
fingerprints of Haitsma & Kalker 2002 ("A Highly Robust Audio
Fingerprint Extraction Method", ISMIR): split the clip into
``GRID_COLS`` equal time segments, compute each segment's magnitude
spectrum (numpy rfft), fold it into ``GRID_ROWS`` log-spaced frequency
bands, and set bit ``r*8 + c`` iff band r's energy RISES from time
segment c to segment c+1 — 8 temporal gradient comparisons per band ×
8 bands = 64 bits.

Why gradients of band energies: the bits depend only on energy
ORDERINGS, so the hash is invariant to the edits that defeat byte-level
dedup on audio —
- uniform gain change (every energy scales by the same factor ⇒ no
  comparison flips, up to PCM requantization noise);
- bit-depth re-encode (16-bit ↔ 8-bit adds ~flat quantization noise
  well under inter-segment energy contrasts);
- lossless container re-pack (same samples → same spectra).

Two near-identical clips differ in a few bits ⇒ near-dup pairs come
from the SAME pigeonhole Hamming join as SimHash/dHash
(``operators/dedup.py::hamming_pairs``).

Not SQL-expressible (FFT), so queries over it are rows-only by design
— the precedent of simhash_neardup/knn_ann_*; correctness is pinned by
invariance + discrimination unit tests and the e2e recall test
instead. numpy-based (Arrow kernels already require it); registered
for cloudpickle by-value serialization in operators/multimodal.py.
"""

from __future__ import annotations

import numpy as np

GRID_ROWS, GRID_COLS = 8, 9   # bands × time segments
_FMIN_FRAC = 0.01             # band edges span [fmin, nyquist)·fractions


def band_time_grid(samples: np.ndarray, n_rows: int = GRID_ROWS,
                   n_cols: int = GRID_COLS) -> np.ndarray:
    """Mono float samples → (n_rows bands × n_cols time segments)
    energy grid. Segment boundaries are floor-grid (the dHash cell
    rule); bands are log-spaced between 1% and 100% of Nyquist over
    each segment's rfft magnitude-squared spectrum (DC excluded so a
    constant offset never dominates band 0)."""
    n = len(samples)
    if n < n_cols:
        raise ValueError(f"clip too short ({n} samples < {n_cols})")
    grid = np.zeros((n_rows, n_cols))
    # log-spaced band edges over the per-segment spectrum's bin axis,
    # as FRACTIONS of the segment Nyquist bin (rate-independent)
    fracs = np.logspace(np.log10(_FMIN_FRAC), 0.0, n_rows + 1)
    for c in range(n_cols):
        lo, hi = c * n // n_cols, (c + 1) * n // n_cols
        seg = samples[lo:max(hi, lo + 1)]
        spec = np.abs(np.fft.rfft(seg)) ** 2
        nbins = len(spec)
        edges = np.minimum((fracs * (nbins - 1)).astype(int) + 1, nbins)
        for r in range(n_rows):
            b0, b1 = edges[r], max(edges[r + 1], edges[r] + 1)
            grid[r, c] = float(np.sum(spec[b0:b1]))
    return grid


def afp64(samples: np.ndarray) -> int:
    """The 64-bit audio fingerprint as a SIGNED two's-complement int
    (bit 63 → −2^63), matching the dHash BIGINT convention so
    ``hamming_pairs`` serves both modalities unchanged."""
    g = band_time_grid(np.asarray(samples, dtype=np.float64))
    v = 0
    for r in range(GRID_ROWS):
        for c in range(GRID_COLS - 1):
            if g[r, c + 1] > g[r, c]:
                v |= 1 << (r * 8 + c)
    return v - (1 << 64) if v >= (1 << 63) else v
