"""Multimodal column plumbing (SURVEY.md §2.11, driver mandate).

Images/audio/video are opaque BINARY columns with typed metadata
structs. The container has no media libraries, so the *decode* kernels
are stubs (clearly marked), but everything Spark-side is real and
tested: schemas, Arrow batch shapes, mapInPandas signatures, and the
partitioning strategy.

Scale posture: media blobs dominate row size, so
- metadata-only queries must never deserialize blobs → keep metadata in
  separate columns (column pruning skips the binary at the scan);
- decode/feature kernels run via ``mapInPandas`` (Arrow batches, one
  Python worker per core) with ``spark.sql.files.maxPartitionBytes``
  sized so a batch of blobs fits executor memory;
- derived features (dims, fingerprints, embeddings) are written to
  narrow sidecar tables keyed by content hash, so re-runs dedup work.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType([
    T.StructField("media_type", T.StringType()),    # image|audio|video
    T.StructField("format", T.StringType()),        # png|jpeg|wav|mp4|...
    T.StructField("byte_len", T.LongType()),
    T.StructField("content_sha256", T.StringType()),
])

IMAGE_FEATURE_SCHEMA = T.StructType([
    T.StructField("content_sha256", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_channels", T.IntegerType()),
    T.StructField("mean_luma", T.DoubleType()),
])


def attach_media_metadata(df: DataFrame, binary_col: str = "content",
                          media_type: str = "image",
                          fmt: str = "png") -> DataFrame:
    """Typed metadata from the blob without any decode — pure JVM
    expressions (byte length + content hash), safe at any scale."""
    b = F.col(binary_col)
    return df.withColumn("meta", F.struct(
        F.lit(media_type).alias("media_type"),
        F.lit(fmt).alias("format"),
        F.octet_length(b).cast("long").alias("byte_len"),
        F.sha2(b, 256).alias("content_sha256"),
    ))


def _make_decode_stub():
    """STUB factory — the real kernel would use PIL/opencv (absent from
    this container). Deterministic fake: dimensions derived from the
    blob length so tests exercise the full Arrow round-trip.

    Built as a closure so cloudpickle ships it BY VALUE to python
    workers (a plain module-level function pickles by module reference
    and fails to import on workers that don't have this package on
    their path)."""
    def decode(blob: bytes) -> tuple[int, int, int, float]:
        n = len(blob)
        width = 16 + (n % 64)
        height = 16 + ((n // 64) % 64)
        channels = 3
        mean_luma = float((sum(blob[:64]) % 256)) / 255.0 if n else 0.0
        return width, height, channels, mean_luma
    return decode


_decode_image_stub = _make_decode_stub()


def extract_image_features(df: DataFrame, binary_col: str = "content") -> DataFrame:
    """Arrow-batched feature extraction over ``mapInPandas``.

    The batch shape (one pdf per Arrow batch, blobs as ``bytes``) and
    the output schema are the real contract; only the pixel kernel is
    stubbed. Swap ``_decode_image_stub`` for a PIL/opencv kernel in a
    container that ships the codecs.
    """
    decode = _decode_image_stub  # closure-built → pickled by value

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        for pdf in batches:
            rows = []
            for blob in pdf[binary_col]:
                blob = bytes(blob) if blob is not None else b""
                w, h, c, luma = decode(blob)
                rows.append((hashlib.sha256(blob).hexdigest(), w, h, c, luma))
            yield pd.DataFrame(rows, columns=[
                "content_sha256", "width", "height", "n_channels", "mean_luma"])

    return df.select(binary_col).mapInPandas(kernel, IMAGE_FEATURE_SCHEMA)


def resize_images(df: DataFrame, binary_col: str = "content",
                  target_w: int = 224, target_h: int = 224) -> DataFrame:
    """Image resize to model-input dimensions — STUB kernel, real
    plumbing (the training-pipeline step that normalizes every image
    to the vision encoder's input size).

    Output contract: (content_sha256, width, height, resized BINARY) —
    the resized blob REPLACES the original (this is a map, not a
    fan-out, but it stays ``mapInPandas`` because the output blob's
    size differs from the input's and Arrow batches the binary column
    efficiently either way). The STUB emits a deterministic
    ``target_w·target_h·3``-byte buffer derived from the input digest
    so tests can assert exact output sizes and stability; a real
    kernel swaps in PIL's ``Image.resize``.
    """
    out_schema = T.StructType([
        T.StructField("content_sha256", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("resized", T.BinaryType()),
    ])
    n_bytes = target_w * target_h * 3

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        for pdf in batches:
            rows = []
            for blob in pdf[binary_col]:
                blob = bytes(blob) if blob is not None else b""
                digest = hashlib.sha256(blob).hexdigest()
                # STUB resample: tile the digest bytes to the target
                # buffer size (deterministic; real kernel: PIL resize)
                seed = bytes.fromhex(digest)
                resized = (seed * (n_bytes // len(seed) + 1))[:n_bytes]
                rows.append((digest, target_w, target_h, resized))
            yield pd.DataFrame(rows, columns=[
                "content_sha256", "width", "height", "resized"])

    return df.select(binary_col).mapInPandas(kernel, out_schema)


def sample_frames(df: DataFrame, binary_col: str = "content",
                  every_nth: int = 30) -> DataFrame:
    """Video frame sampling — STUB kernel, real plumbing.

    Emits (content_sha256, frame_idx, frame BINARY); one input row fans
    out to many output rows, which is why this is ``mapInPandas`` (row
    multiplicity) and not a scalar pandas_udf.
    """
    out_schema = T.StructType([
        T.StructField("content_sha256", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        for pdf in batches:
            rows = []
            for blob in pdf[binary_col]:
                blob = bytes(blob) if blob is not None else b""
                digest = hashlib.sha256(blob).hexdigest()
                # STUB: pretend the blob holds len(blob)//1000 frames;
                # a real kernel would demux with pyav/ffmpeg.
                n_frames = max(1, len(blob) // 1000)
                for idx in range(0, n_frames, every_nth):
                    rows.append((digest, idx, blob[idx:idx + 16]))
            yield pd.DataFrame(rows, columns=["content_sha256", "frame_idx", "frame"])

    return df.select(binary_col).mapInPandas(kernel, out_schema)


def extract_audio_features(df: DataFrame, binary_col: str = "content",
                           window_ms: int = 1000) -> DataFrame:
    """Audio feature extraction — STUB kernel, real plumbing.

    Emits one row per analysis window (content_sha256, window_idx,
    duration_ms, rms): fan-out over mapInPandas like frame sampling.
    The STUB derives deterministic fake duration/energy from the raw
    bytes (16-bit PCM framing assumed); a real kernel swaps in
    soundfile/librosa decode — absent from this container.
    """
    out_schema = T.StructType([
        T.StructField("content_sha256", T.StringType()),
        T.StructField("window_idx", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
        T.StructField("rms", T.DoubleType()),
    ])

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        for pdf in batches:
            rows = []
            for blob in pdf[binary_col]:
                blob = bytes(blob) if blob is not None else b""
                digest = hashlib.sha256(blob).hexdigest()
                # STUB framing: 16 kHz mono 16-bit PCM → 32 bytes/ms
                duration_ms = max(1, len(blob) // 32)
                n_windows = max(1, duration_ms // window_ms)
                for idx in range(n_windows):
                    seg = blob[idx * 64:(idx + 1) * 64] or b"\0"
                    rms = (sum(b * b for b in seg) / len(seg)) ** 0.5
                    rows.append((digest, idx, duration_ms, rms))
            yield pd.DataFrame(rows, columns=[
                "content_sha256", "window_idx", "duration_ms", "rms"])

    return df.select(binary_col).mapInPandas(kernel, out_schema)
