"""Z-order layout tests — quantitative file-skipping evidence.

The assertion signal is the parquet footer min/max stats themselves
(read back with pyarrow) — the exact metadata a min/max-pruning scan
consults — so "Z-ordering enables skipping" is measured, not assumed.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from market_data_ingestor_go_spark.sources.layout import (
    bucket_rank,
    file_column_stats,
    mean_bbox_area,
    prunable_file_fraction,
    quantile_boundaries,
    write_zordered,
    z_value,
)

from conftest import SF_ORACLE

COLS = ["l_partkey", "l_extendedprice"]
N_FILES = 16


@pytest.fixture(scope="module")
def lineitem(spark):
    return spark.read.parquet(f"{SF_ORACLE}/lineitem.parquet") \
        .select("l_orderkey", *COLS)


@pytest.fixture(scope="module")
def layouts(spark, lineitem, tmp_path_factory):
    base = tmp_path_factory.mktemp("layout")
    plain_path = str(base / "plain")
    z_path = str(base / "zorder")
    # baseline: same file count, arrival order (hash-scattered keys)
    lineitem.repartition(N_FILES).write.mode("overwrite").parquet(plain_path)
    write_zordered(lineitem, z_path, COLS, n_files=N_FILES)
    return plain_path, z_path


def _spans(df):
    row = df.agg(*[F.min(c).alias(f"lo_{c}") for c in COLS],
                 *[F.max(c).alias(f"hi_{c}") for c in COLS]).first()
    return {c: float(row[f"hi_{c}"]) - float(row[f"lo_{c}"]) for c in COLS}


def test_zorder_preserves_rows(spark, lineitem, layouts):
    _, z_path = layouts
    back = spark.read.parquet(z_path)
    assert back.count() == lineitem.count()
    assert sorted(back.columns) == sorted(lineitem.columns)
    # bit-exact content: symmetric difference is empty
    assert back.exceptAll(lineitem).count() == 0
    assert lineitem.exceptAll(back).count() == 0


def test_zorder_shrinks_file_bounding_boxes(lineitem, layouts):
    plain_path, z_path = layouts
    spans = _spans(lineitem)
    plain = mean_bbox_area(file_column_stats(plain_path, COLS), COLS, spans)
    z = mean_bbox_area(file_column_stats(z_path, COLS), COLS, spans)
    # random layout: every file covers ~the whole 2-D space
    assert plain > 0.8
    # Z-order: 16 files tile the space — ideal mean box area is 1/16;
    # Z-curve segment jumps cost ~2x over ideal (measured 0.11), so
    # pin a 6x shrink floor that a layout regression would break
    assert z < plain / 6


def test_zorder_enables_file_skipping_on_both_dims(lineitem, layouts):
    plain_path, z_path = layouts
    lo = lineitem.agg(*[F.min(c) for c in COLS]).first()
    spans = _spans(lineitem)
    # a 10%-per-side query box — selective on BOTH dimensions
    box = {c: (float(lo[i]) + 0.45 * spans[c], float(lo[i]) + 0.55 * spans[c])
           for i, c in enumerate(COLS)}
    plain_frac = prunable_file_fraction(file_column_stats(plain_path, COLS), box)
    z_frac = prunable_file_fraction(file_column_stats(z_path, COLS), box)
    # unordered layout proves nothing prunable; Z-order skips most
    # files. repartitionByRange's SAMPLED boundaries carry run-to-run
    # jitter in where the 16 file splits land (observed z_frac
    # 0.4375-0.5625 across full-suite runs on identical code — the
    # 0.5 knife-edge flaked once under concurrent load, r13), so pin
    # the floor at 6/16 plus a strict absolute win over the unordered
    # layout — a layout regression (no Z locality) still fails both.
    assert plain_frac <= 0.25
    assert z_frac >= 6 / 16
    assert z_frac >= plain_frac + 0.3
    # and a single-dimension slice also prunes (multi-column locality).
    # File boundaries carry run-to-run jitter (range-partitioner
    # sampling), so pin a 2-of-16-files floor plus a strict win over
    # the unordered layout rather than a knife-edge constant.
    one_dim = {COLS[0]: box[COLS[0]]}
    z_one = prunable_file_fraction(file_column_stats(z_path, COLS), one_dim)
    plain_one = prunable_file_fraction(
        file_column_stats(plain_path, COLS), one_dim)
    assert z_one >= 2 / N_FILES
    assert z_one > plain_one


def test_bucket_rank_and_z_value_semantics(spark):
    df = spark.createDataFrame(
        [(0.5,), (5.0,), (9.5,), (None,)], "x double")
    ranks = df.select(
        bucket_rank("x", [2.5, 5.0, 7.5]).alias("r")).collect()
    assert [r.r for r in ranks] == [0, 2, 3, 0]
    # interleave check: ranks (1, 2) at 2 bits -> x bits at even
    # positions, y at odd: x=01, y=10 -> z = b0100 | b0001 shifted...
    z = spark.range(1).select(
        z_value([F.lit(1), F.lit(2)], bits=2).alias("z")).first().z
    # x=1 -> bit0 at pos 0; y=2 -> bit1 at pos 3 => z = 1 + 8
    assert z == 9


def test_quantile_boundaries_are_monotone(spark, lineitem):
    bs = quantile_boundaries(lineitem, "l_extendedprice", bits=4)
    assert len(bs) == 15
    assert bs == sorted(bs)


def test_compact_history_zorder(spark, tmp_path):
    """Z-ordered compaction: the rewrite the compactor already pays
    doubles as layout optimization — post-compaction files get tight
    footer stats on every zorder column, rows and layout invariants
    preserved."""
    import os

    from market_data_ingestor_go_spark.streaming.pipeline import (
        compact_history, read_history)

    path = str(tmp_path / "hist")
    for i in range(5):  # five epoch dirs of randomly-interleaved keys
        (spark.range(2000)
         .select((F.xxhash64("id") % 1000).alias("k"),
                 (F.xxhash64("id", F.lit(i)) % 500).alias("v"))
         .repartition(4).write.mode("overwrite")
         .parquet(os.path.join(path, f"epoch={i}")))
    n_files = compact_history(spark, path, target_partitions=8,
                              zorder_by=["k", "v"])
    assert n_files == 8
    back = read_history(spark, path)
    assert back.count() == 10000
    stats = file_column_stats(path, ["k", "v"])
    spans = {c: 2000.0 for c in ("k", "v")}  # xxhash64 % n spans ±n
    area = mean_bbox_area(stats, ["k", "v"], spans)
    # unordered files would each cover ~the full (k, v) space (area ~1);
    # 8 Z-ordered files must tile it
    assert area < 0.4, area


def test_z_value_bijection_and_quadrant_locality(spark):
    """On a full 4x4 rank grid at 2 bits/dim: the Morton code is a
    bijection onto [0,16) and its top two bits identify the 2x2
    quadrant — the property that makes file ranges align with
    rectangular regions of the value space."""
    grid = spark.range(4).selectExpr("id AS x") \
        .crossJoin(spark.range(4).selectExpr("id AS y"))
    rows = grid.select(
        "x", "y", z_value([F.col("x"), F.col("y")], bits=2).alias("z")) \
        .collect()
    zs = sorted(r.z for r in rows)
    assert zs == list(range(16))
    for r in rows:
        assert r.z >> 2 == ((r.y >> 1) << 1 | (r.x >> 1))
