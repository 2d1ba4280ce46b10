"""Minimal from-scratch WAV (RIFF/PCM) decoder — stdlib ``struct``
plus numpy for the bulk 16/24-bit sample paths (r16: the per-sample
pack/unpack loops dominated the audio fingerprint queries; the
vectorized forms are byte-identical, pinned by the round-trip tests).

Same motivation as ``png_minimal``: the container has no audio
libraries, but canonical WAV is a public, codec-free format (RIFF
container + raw PCM), so the audio kernel in
``operators/multimodal.py`` can compute REAL durations and RMS energy
for WAV blobs instead of stub values.

Scope (clear errors outside it):
- RIFF/WAVE with a PCM ``fmt `` chunk (audio format 1), 8/16/24/32-bit
  integer samples, any channel count / sample rate.
- Chunk sizes are validated; a truncated blob raises instead of
  feeding garbage energy stats into a training table.

Registered for cloudpickle by-value serialization in
operators/multimodal.py (workers never import this package).
"""

from __future__ import annotations

import struct


def is_wav(blob: bytes) -> bool:
    return (len(blob) >= 12 and blob[:4] == b"RIFF"
            and blob[8:12] == b"WAVE")


def wav_decode(blob: bytes) -> tuple[int, int, int, bytes]:
    """Decode a WAV blob → ``(sample_rate, n_channels, bits, pcm)``
    where ``pcm`` is the raw interleaved sample data."""
    if not is_wav(blob):
        raise ValueError("not a RIFF/WAVE blob")
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(blob):
        cid = blob[pos:pos + 4]
        (ln,) = struct.unpack("<I", blob[pos + 4:pos + 8])
        body = blob[pos + 8:pos + 8 + ln]
        if len(body) != ln:
            raise ValueError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            if ln < 16:
                raise ValueError("fmt chunk too short")
            audio_fmt, n_ch, rate, _br, _ba, bits = \
                struct.unpack("<HHIIHH", body[:16])
            if audio_fmt != 1:
                raise ValueError(f"non-PCM audio format {audio_fmt}")
            if bits not in (8, 16, 24, 32):
                raise ValueError(f"unsupported bit depth {bits}")
            fmt = (rate, n_ch, bits)
        elif cid == b"data":
            data = body
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    return fmt[0], fmt[1], fmt[2], data


def wav_encode(sample_rate: int, n_channels: int, bits: int,
               samples: list[int]) -> bytes:
    """Encode integer samples (interleaved if multichannel) as a
    canonical PCM WAV — used by tests to build real fixtures."""
    if bits == 8:
        pcm = bytes((s + 128) & 0xFF for s in samples)  # 8-bit is unsigned
    elif bits == 16:
        # vectorized (r16, guide §4.2): byte-identical to the former
        # per-sample struct.pack("<h", s) join, including its loud
        # failure on out-of-range samples (numpy would wrap silently)
        import numpy as np
        a = np.asarray(samples, dtype=np.int64)
        if a.size and (a.min() < -0x8000 or a.max() > 0x7FFF):
            raise struct.error("short format requires -32768 <= "
                               "number <= 32767")
        pcm = a.astype("<i2").tobytes()
    elif bits == 24:
        # byte-identical to struct.pack("<i", s << 8)[1:4] per sample:
        # the low 3 LE bytes of the 32-bit value s << 8
        import numpy as np
        a = np.asarray(samples, dtype=np.int64)
        if a.size and ((a.min() << 8) < -0x80000000
                       or (a.max() << 8) > 0x7FFFFFFF):
            raise struct.error("int format requires -2147483648 <= "
                               "number <= 2147483647")
        b4 = (a << 8).astype("<i4").view(np.uint8).reshape(-1, 4)
        pcm = b4[:, 1:4].tobytes()
    elif bits == 32:
        pcm = b"".join(struct.pack("<i", s) for s in samples)
    else:
        raise ValueError(f"unsupported bit depth {bits}")
    byte_rate = sample_rate * n_channels * bits // 8
    block_align = n_channels * bits // 8
    fmt = struct.pack("<HHIIHH", 1, n_channels, sample_rate,
                      byte_rate, block_align, bits)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm
            + (b"\0" if len(pcm) & 1 else b""))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def pcm_samples(pcm: bytes, bits: int) -> list[float]:
    """Raw PCM bytes → normalized samples in [-1, 1)."""
    if bits == 8:
        return [(b - 128) / 128.0 for b in pcm]
    if bits == 16:
        # vectorized (r16): same IEEE divisions as the former
        # struct.unpack loop, returned as the same list of floats
        import numpy as np
        n = len(pcm) // 2
        return (np.frombuffer(pcm[:n * 2], dtype="<i2")
                .astype(np.float64) / 32768.0).tolist()
    if bits == 24:
        import numpy as np
        n = len(pcm) // 3
        b = (np.frombuffer(pcm[:n * 3], dtype=np.uint8)
             .reshape(-1, 3).astype(np.int64))
        v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        v -= (v >= 1 << 23) * (1 << 24)      # sign-extend int24
        return (v.astype(np.float64) / 8388608.0).tolist()
    if bits == 32:
        n = len(pcm) // 4
        return [s / 2147483648.0
                for s in struct.unpack(f"<{n}i", pcm[:n * 4])]
    raise ValueError(f"unsupported bit depth {bits}")


def window_rms(samples: list[float], n_channels: int, sample_rate: int,
               window_ms: int) -> list[float]:
    """Per-window RMS over mono-mixed normalized samples (the standard
    energy feature; windows shorter than half a window merge into the
    previous one is NOT done — the trailing partial window is kept, so
    every sample contributes exactly once)."""
    if n_channels > 1:
        frames = [sum(samples[i:i + n_channels]) / n_channels
                  for i in range(0, len(samples) - n_channels + 1,
                                 n_channels)]
    else:
        frames = samples
    per_window = max(1, sample_rate * window_ms // 1000)
    out = []
    for start in range(0, len(frames), per_window):
        seg = frames[start:start + per_window]
        out.append((sum(x * x for x in seg) / len(seg)) ** 0.5)
    return out
