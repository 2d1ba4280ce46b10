"""Multi-dimensional data layout (Z-ordering) for write-time file skipping.

At 100 TB the fastest scan is the one that never reads the file:
parquet footers carry per-column min/max, and Spark prunes whole
files / row groups whose stats can't satisfy a pushed-down predicate.
That pruning is only effective if the data LAYOUT clusters each
column's values — and a table can only be range-sorted on one key.
Z-ordering (bit-interleaving of bucketed column ranks — the
Morton curve) gives EVERY interleaved column locality at once, so
selective predicates on any of them skip most files. This is the same
layout primitive Delta Lake's `OPTIMIZE ZORDER BY` and Iceberg's
sort-order rewrite apply; here it is expressed directly on open
parquet with no table-format dependency.

Engine shape (all JVM-side Column expressions, no UDFs):

1. Per column, map values to a bucket rank in [0, 2^bits) using
   APPROX-QUANTILE boundaries (driver-held, sample-derived — the
   skew-robust choice; linear min/max scaling would collapse under a
   heavy-tailed column). The rank lookup compiles to a vectorized
   ``size(filter(boundaries, b -> b <= x))`` over a literal array —
   O(2^bits) per row inside whole-stage codegen, 2^bits ≤ 256.
2. Interleave the rank bits into one BIGINT Morton code.
3. ``repartitionByRange`` on the code (sampled range boundaries — one
   scale-safe shuffle) + ``sortWithinPartitions`` so each output file
   covers a compact Z-curve segment, then write parquet.

Verification is quantitative, not vibes: tests/test_layout.py reads
the written footers with pyarrow and asserts the average per-file
bounding-box area shrinks by an order of magnitude vs the unordered
layout, and that a selective 2-D box predicate could skip most files
(``prunable_file_fraction``).

Reference anchor: the reference (cmd/ingestor, internal/app) writes
append-only history with no layout control — this is part of the
mandated at-scale extension surface, not a port.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def quantile_boundaries(df: DataFrame, col: str, bits: int = 8,
                        relative_error: float = 0.001) -> list[float]:
    """2^bits - 1 approx-quantile cut points for ``col`` (driver-held).

    approxQuantile runs the Greenwald-Khanna sketch distributed with
    partial aggregation — the driver sees only the merged sketch, so
    the cost is independent of row count. Sample-derived boundaries
    are how every production Z-order implementation scales rank
    computation; an exact global rank would be a full sort per column.
    """
    n_buckets = 1 << bits
    probs = [i / n_buckets for i in range(1, n_buckets)]
    return df.stat.approxQuantile(col, probs, relative_error)


def bucket_rank(col: str, boundaries: list[float]) -> Column:
    """Rank of ``col`` against sorted ``boundaries`` → [0, len+1).

    ``size(filter(bs, b -> b <= x))`` counts boundaries at or below the
    value — a branch-free scan over a small literal array that stays
    inside whole-stage codegen. NULLs rank 0 (lowest cell), matching
    NULLS FIRST sort semantics.
    """
    bs = F.lit([float(b) for b in boundaries])
    x = F.col(col).cast("double")
    rank = F.size(F.filter(bs, lambda b: b <= x))
    return F.when(x.isNull(), F.lit(0)).otherwise(rank)


def z_value(ranks: list[Column], bits: int = 8) -> Column:
    """Interleave ``bits`` low bits of each rank into one Morton code.

    Bit b of dimension d lands at position b * ndims + d, so the code
    orders data along the Z-curve over the rank grid. ndims * bits must
    fit a BIGINT (≤ 63) — 2 to 4 dimensions at 8 bits is the sweet
    spot; more dimensions dilute per-column locality (documented
    Z-order behavior, not an implementation limit).
    """
    ndims = len(ranks)
    if ndims * bits > 63:
        raise ValueError(f"{ndims} dims x {bits} bits exceeds a BIGINT")
    z = F.lit(0).cast("long")
    for d, r in enumerate(ranks):
        r = r.cast("long")
        for b in range(bits):
            z = z.bitwiseOR(
                F.shiftleft(F.shiftright(r, b).bitwiseAND(F.lit(1)),
                            b * ndims + d))
    return z


def write_zordered(df: DataFrame, path: str, cols: list[str],
                   n_files: int, bits: int = 8) -> None:
    """Write ``df`` as parquet Z-ordered on ``cols`` into ~n_files files.

    One range shuffle (sampled boundaries) + an in-partition sort —
    the identical cost profile to a single-column sort-write, but every
    column in ``cols`` gets file-skipping locality. On a real cluster
    ``n_files`` is derived from target file size (e.g. total bytes /
    1 GB); callers pass it explicitly here so tests control layout.
    """
    ranks = [bucket_rank(c, quantile_boundaries(df, c, bits)) for c in cols]
    (df.withColumn("_z", z_value(ranks, bits))
       .repartitionByRange(n_files, "_z")
       .sortWithinPartitions("_z")
       .drop("_z")
       .write.mode("overwrite").parquet(path))


def file_column_stats(path: str, cols: list[str]) -> list[dict]:
    """Per-file min/max for ``cols`` read from parquet footers (pyarrow).

    This is exactly the metadata Spark's scan consults for file/row-group
    skipping — the test evidence is the same signal the engine uses.
    """
    import pyarrow.parquet as pq
    import pyarrow.dataset as ds

    out = []
    for frag in ds.dataset(path, format="parquet").get_fragments():
        md = pq.ParquetFile(frag.path).metadata
        stats: dict = {"path": frag.path}
        for c in cols:
            lo, hi = None, None
            for rg in range(md.num_row_groups):
                for ci in range(md.num_columns):
                    col_md = md.row_group(rg).column(ci)
                    if col_md.path_in_schema != c or col_md.statistics is None:
                        continue
                    s = col_md.statistics
                    lo = s.min if lo is None else min(lo, s.min)
                    hi = s.max if hi is None else max(hi, s.max)
            stats[c] = (lo, hi)
        out.append(stats)
    return out


def mean_bbox_area(stats: list[dict], cols: list[str],
                   spans: dict[str, float]) -> float:
    """Mean normalized bounding-box volume across files — the layout
    quality metric (1.0 ≈ every file covers the whole value space)."""
    total = 0.0
    for s in stats:
        vol = 1.0
        for c in cols:
            lo, hi = s[c]
            vol *= (float(hi) - float(lo)) / spans[c] if spans[c] else 0.0
        total += vol
    return total / len(stats) if stats else 0.0


def prunable_file_fraction(stats: list[dict], predicate: dict) -> float:
    """Fraction of files whose footer stats PROVE the predicate empty —
    i.e. files a min/max-pruning scan skips without reading a byte.

    ``predicate`` maps column → (lo, hi) inclusive query box.
    """
    skipped = 0
    for s in stats:
        for c, (qlo, qhi) in predicate.items():
            flo, fhi = s[c]
            if flo is None:
                continue
            if float(fhi) < qlo or float(flo) > qhi:
                skipped += 1
                break
    return skipped / len(stats) if stats else 0.0
