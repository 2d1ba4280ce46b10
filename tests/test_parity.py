"""Strict Spark↔DuckDB parity over the whole declared query corpus.

This mirrors (and is stricter than) the driver's t2 gate: for every
query with an oracle, compare row count, column names, and **exact**
values (doubles bit-compared after a round-trip through repr, i.e. no
tolerance). If this passes at sf0.001/sf0.01, the driver's
order-insensitive value-hash must also match.
"""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from market_data_ingestor_go_spark.plans.oracles import EXTRA_ORACLES, ORACLES
from market_data_ingestor_go_spark.plans.queries import ALL_QUERIES, QUERIES
from market_data_ingestor_go_spark.sources.tables import TABLES

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.01")

ALL_ORACLES = {**ORACLES, **EXTRA_ORACLES}


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


def _canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, bytes):
        return v.hex()
    return repr(v)


def _rows_to_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", sorted(ALL_ORACLES))
def test_parity(spark, name):
    assert name in ALL_QUERIES, f"oracle {name} has no Spark query"
    sdf = ALL_QUERIES[name](spark, SF_DIR)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns

    con = _duck(SF_DIR)
    res = con.execute(ALL_ORACLES[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    con.close()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={spark_cols} duck={duck_cols}")
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}")
    ms_spark = _rows_to_multiset(spark_cols, spark_rows)
    ms_duck = _rows_to_multiset(duck_cols, duck_rows)
    if ms_spark != ms_duck:
        diffs = [(a, b) for a, b in zip(ms_spark, ms_duck) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


def test_all_queries_have_schema_and_run(spark):
    """Queries without oracles still must run and return a stable schema."""
    for name, fn in ALL_QUERIES.items():
        df = fn(spark, SF_DIR)
        assert df.columns, name
        df.limit(1).collect()


def test_driver_window_is_at_most_50():
    """The driver's CORRECTNESS gate checks only the first 50 entries of
    queries(); every declared query (and its oracle) must fit inside."""
    assert len(QUERIES) <= 50
    oracle_only = set(ORACLES) - set(QUERIES)
    assert not oracle_only, f"oracles outside the declared window: {oracle_only}"


def test_round7_rotated_operators_sit_in_declared_window():
    """The round-7 rotation's whole point: the 34 queries that had
    never held an external CORRECTNESS row (22 round-2 demotions + 12
    late-r6 additions) must sit inside the first-50 window the driver
    externally verifies, every one exposing its oracle through
    oracle_sql() (= ORACLES) — the rotated window has zero rows-only
    entries."""
    from market_data_ingestor_go_spark.plans.queries import ROTATED_IN_R7

    window = set(list(QUERIES)[:50])
    assert set(ROTATED_IN_R7) <= window, set(ROTATED_IN_R7) - window
    assert set(ROTATED_IN_R7) <= set(ORACLES)
    assert set(QUERIES) <= set(ORACLES), (
        "window must be 100% hash-checked after the r7 rotation")


def test_rotation_candidates_are_rotatable():
    """The round-8 rotation list must stay mechanically valid: every
    candidate exists, sits OUTSIDE the declared window (else it needs
    no rotation), and has an oracle so rotating it in yields a full
    row+schema+hash check. Every oracle-backed query ADDED in round 7
    must be listed (enforced by the never-verified scan below)."""
    from market_data_ingestor_go_spark.plans.queries import (
        QUERIES, ROTATION_CANDIDATES_R8)

    for name in ROTATION_CANDIDATES_R8:
        assert name in ALL_QUERIES, name
        assert name not in QUERIES, f"{name} already in the window"
        assert name in ALL_ORACLES, f"{name} lacks an oracle"
