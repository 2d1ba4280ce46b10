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
    """Value parity AND Arrow-type parity in ONE test (r16 suite
    budget, verdict #3): the former separate type-scan sweep rebuilt
    every Spark query — for the CC-backed queries that means
    re-running the whole label-propagation loop (~20 s each) just to
    read a schema. One Spark query build and ONE oracle execution
    (`.arrow()`) now serve both checks: the schema check reads the
    Arrow schema (ground truth, same canonicalization as before) and
    the value multiset reads the same table's columns — which is the
    layer the driver's hash actually compares at anyway."""
    assert name in ALL_QUERIES, f"oracle {name} has no Spark query"
    sdf = ALL_QUERIES[name](spark, SF_DIR)
    spark_rows = [tuple(r) for r in sdf.collect()]
    spark_cols = sdf.columns

    con = _duck(SF_DIR)
    tbl = con.execute(ALL_ORACLES[name]).arrow()
    con.close()
    duck_cols = list(tbl.schema.names)

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={spark_cols} duck={duck_cols}")

    # Arrow-level type parity FIRST (the r7 events_vwap failure class
    # — see the comment block above oracle_type_mismatches): the value
    # comparison below reads the oracle rows through this very Arrow
    # conversion, so a type divergence must fail loudly as a TYPE
    # error before it can masquerade as a value diff.
    spark_types = {f.name: _canon_spark_type(f.dataType)
                   for f in sdf.schema.fields}
    duck_types = {f.name: _canon_arrow_type(f.type) for f in tbl.schema}
    mism = {col: {"spark": spark_types.get(col), "duck": duck_types.get(col)}
            for col in set(spark_types) | set(duck_types)
            if spark_types.get(col) != duck_types.get(col)}
    assert not mism, (
        f"{name}: final-projection type divergence (driver hash is "
        f"type-sensitive at the Arrow layer): {mism}")

    cols_data = tbl.to_pydict()
    duck_rows = list(zip(*(cols_data[c] for c in duck_cols))) \
        if duck_cols else []
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}")
    ms_spark = _rows_to_multiset(spark_cols, spark_rows)
    ms_duck = _rows_to_multiset(duck_cols, duck_rows)
    if ms_spark != ms_duck:
        diffs = [(a, b) for a, b in zip(ms_spark, ms_duck) if a != b][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


def test_all_queries_have_schema_and_run(spark):
    """Queries without oracles still must run and return a stable
    schema. Oracle-backed queries are excluded (r16 suite budget):
    test_parity collects their FULL result in this same file — a
    strictly stronger check than limit(1) — so sweeping them here
    doubled ~130 s of work for zero coverage."""
    for name, fn in ALL_QUERIES.items():
        if name in ALL_ORACLES:
            continue
        df = fn(spark, SF_DIR)
        assert df.columns, name
        df.limit(1).collect()


def test_driver_window_is_at_most_50():
    """The driver's CORRECTNESS gate checks only the first 50 entries of
    queries(); every declared query (and its oracle) must fit inside."""
    assert len(QUERIES) <= 50
    oracle_only = set(ORACLES) - set(QUERIES)
    assert not oracle_only, f"oracles outside the declared window: {oracle_only}"


# (The r6–r11 window-membership tests were retired as their rotated-in
# names earned their green external rows and later demoted to
# EXTRA_QUERIES with in-window twins — r9's dup_span_extents,
# events_mad_outliers, doc_bm25_topk, and source_ks_drift demoted in
# the round-12 rotation after three green rounds each; r10's
# doc_pmi_collocations and r11's whole seven-query batch demoted in
# the round-14 rotation after 4 and 3 green rounds respectively.
# Every such name stays parity-tested via test_parity above.)


def test_round12_rotated_operators_sit_in_declared_window():
    """The round-12 rotation's whole point: all twelve
    ROTATION_CANDIDATES_R11 (the round-11 build — leak/dup-span
    scrubs, crawl-delta apply, winnowing near-dup, χ² drift, Gopher
    quality + repetition signals, cohort retention, Markov
    transitions, CUSUM changepoint, embedding covariance +
    correlation) must sit inside the first-50 window the driver
    externally verifies, each exposing its oracle through
    oracle_sql() (= ORACLES) — the rotated window has zero rows-only
    entries."""
    from market_data_ingestor_go_spark.plans.queries import ROTATED_IN_R12

    window = set(list(QUERIES)[:50])
    assert set(ROTATED_IN_R12) <= window, set(ROTATED_IN_R12) - window
    assert set(ROTATED_IN_R12) <= set(ORACLES)
    assert set(QUERIES) <= set(ORACLES), (
        "window must be 100% hash-checked after the r12 rotation")


def test_round13_rotated_operators_sit_in_declared_window():
    """The round-13 rotation's whole point: all nine
    ROTATION_CANDIDATES_R12 (the round-12 build — perceptual image
    dHash near-dup + CC keepers, video frame near-dup, bucket-grain
    CUSUM, RFM segmentation, triangle counting, the interval×interval
    overlap join, per-source quality floors, the per-column DQ
    profile) must sit inside the first-50 window the driver externally
    verifies, each exposing its oracle through oracle_sql() (= ORACLES)
    — the rotated window has zero rows-only entries."""
    from market_data_ingestor_go_spark.plans.queries import ROTATED_IN_R13

    window = set(list(QUERIES)[:50])
    assert set(ROTATED_IN_R13) <= window, set(ROTATED_IN_R13) - window
    assert set(ROTATED_IN_R13) <= set(ORACLES)
    assert set(QUERIES) <= set(ORACLES), (
        "window must be 100% hash-checked after the r13 rotation")


def test_round14_rotated_operators_sit_in_declared_window():
    """The round-14 rotation's whole point: all eight
    ROTATION_CANDIDATES_R13 (the round-13 analytics build — Benford
    first-digit conformance, session path mining, per-source Gini
    concentration, user-grain co-occurrence lift, χ² lang×source
    independence, per-group embedding outlier screen, rolling 7-day
    distinct actives, one-way ANOVA over brands) must sit inside the
    first-50 window the driver externally verifies, each exposing its
    oracle through oracle_sql() (= ORACLES) — the rotated window has
    zero rows-only entries."""
    from market_data_ingestor_go_spark.plans.queries import ROTATED_IN_R14

    window = set(list(QUERIES)[:50])
    assert set(ROTATED_IN_R14) <= window, set(ROTATED_IN_R14) - window
    assert set(ROTATED_IN_R14) <= set(ORACLES)
    assert set(QUERIES) <= set(ORACLES), (
        "window must be 100% hash-checked after the r14 rotation")


def test_round15_rotated_operators_sit_in_declared_window():
    """The round-15 rotation's whole point: all ten
    ROTATION_CANDIDATES_R14 (the round-14 analytics build — FK orphan
    audit, order fulfillment lag, Wilson return-rate ranking, weighted
    systematic sampling, exact skew/kurtosis, growth accounting,
    Pareto revenue concentration, conversion latency, Mann–Whitney U,
    Gini–Simpson lang diversity) must sit inside the first-50 window
    the driver externally verifies, each exposing its oracle through
    oracle_sql() (= ORACLES) — the rotated window has zero rows-only
    entries."""
    from market_data_ingestor_go_spark.plans.queries import ROTATED_IN_R15

    window = set(list(QUERIES)[:50])
    assert set(ROTATED_IN_R15) <= window, set(ROTATED_IN_R15) - window
    assert set(ROTATED_IN_R15) <= set(ORACLES)
    assert set(QUERIES) <= set(ORACLES), (
        "window must be 100% hash-checked after the r15 rotation")


def test_rotation_candidates_are_rotatable():
    """The next-rotation list must stay mechanically valid: every
    candidate exists, sits OUTSIDE the declared window (else it needs
    no rotation), and has an oracle so rotating it in yields a full
    row+schema+hash check. The never-verified scan then enforces the
    listing policy: every oracle-backed query added AFTER the round-14
    close (i.e. not in the frozen ORACLE_BACKED_AT_R14_CLOSE set) must
    either sit in the declared window already or be listed as a
    rotation candidate — new work cannot accumulate unverified."""
    from market_data_ingestor_go_spark.plans.queries import (
        ORACLE_BACKED_AT_R14_CLOSE, QUERIES, ROTATION_CANDIDATES_R15)

    for name in ROTATION_CANDIDATES_R15:
        assert name in ALL_QUERIES, name
        assert name not in QUERIES, f"{name} already in the window"
        assert name in ALL_ORACLES, f"{name} lacks an oracle"

    never_verified = (
        set(ALL_ORACLES)
        - ORACLE_BACKED_AT_R14_CLOSE  # held a green row in r1-r14 or
                                      # collecting it in the r15 window
        - set(QUERIES)                # in-window: verified this round
        - set(ROTATION_CANDIDATES_R15)  # queued for the next rotation
    )
    assert not never_verified, (
        f"oracle-backed queries neither verified, in-window, nor "
        f"queued for rotation: {sorted(never_verified)}")


# --- Arrow-level type parity -------------------------------------------
#
# The r7 events_vwap failure class: values bit-identical but the
# oracle's final projection carried DuckDB HUGEINT (Arrow
# decimal128(38,0)) while the engine returned bigint, so the driver's
# type-sensitive value hash diverged. fetchall() collapses both sides
# to Python int, making the repr-based sweep above structurally blind
# to it. This scan compares the DuckDB result's Arrow schema against
# the Spark DataFrame's declared schema, canonicalized to the buckets
# the driver's hash distinguishes (int / float / decimal(p,s) / str /
# bool / date / timestamp-unit / binary / list / struct / map).

def _canon_arrow_type(t):
    import pyarrow as pa
    if pa.types.is_dictionary(t):
        return _canon_arrow_type(t.value_type)
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t):
        return "float"
    if pa.types.is_decimal(t):
        return ("decimal", t.precision, t.scale)
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_timestamp(t):
        return ("timestamp", t.unit)  # tz-naive vs aware handled by driver
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bin"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return ("list", _canon_arrow_type(t.value_type))
    if pa.types.is_struct(t):
        return ("struct", tuple(sorted(
            (f.name, _canon_arrow_type(f.type)) for f in t)))
    if pa.types.is_map(t):
        return ("map", _canon_arrow_type(t.key_type),
                _canon_arrow_type(t.item_type))
    if pa.types.is_null(t):
        return "null"
    raise AssertionError(f"unmapped arrow type {t}")


def _canon_spark_type(dt):
    from pyspark.sql import types as T
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return "int"
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return "float"
    if isinstance(dt, T.DecimalType):
        return ("decimal", dt.precision, dt.scale)
    if isinstance(dt, (T.StringType, T.VarcharType, T.CharType)):
        return "str"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.DateType):
        return "date"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return ("timestamp", "us")  # Spark timestamps are micros on Arrow
    if isinstance(dt, T.BinaryType):
        return "bin"
    if isinstance(dt, T.ArrayType):
        return ("list", _canon_spark_type(dt.elementType))
    if isinstance(dt, T.StructType):
        return ("struct", tuple(sorted(
            (f.name, _canon_spark_type(f.dataType)) for f in dt.fields)))
    if isinstance(dt, T.MapType):
        return ("map", _canon_spark_type(dt.keyType),
                _canon_spark_type(dt.valueType))
    if isinstance(dt, T.NullType):
        return "null"
    raise AssertionError(f"unmapped spark type {dt}")


TYPE_SF_DIR = os.environ.get("TYPE_PARITY_SF_DIR", "/root/testdata/sf0.001")


def oracle_type_mismatches(spark, name, sf_dir=None):
    """Return per-column canonical-type divergences between the DuckDB
    oracle's Arrow schema and the Spark query's declared schema.
    Shared with the verify skill's sweep."""
    sf_dir = sf_dir or TYPE_SF_DIR
    sdf = ALL_QUERIES[name](spark, sf_dir)
    spark_types = {f.name: _canon_spark_type(f.dataType)
                   for f in sdf.schema.fields}
    con = _duck(sf_dir)
    try:
        arrow_schema = con.execute(ALL_ORACLES[name]).arrow().schema
    finally:
        con.close()
    duck_types = {f.name: _canon_arrow_type(f.type) for f in arrow_schema}
    mismatches = {}
    for col in set(spark_types) | set(duck_types):
        s, d = spark_types.get(col), duck_types.get(col)
        if s != d:
            mismatches[col] = {"spark": s, "duck": d}
    return mismatches


# (The separate parametrized Arrow-type sweep was folded INTO
# test_parity in r16 — same two comparisons, one Spark query build.
# oracle_type_mismatches stays as the verify skill's per-query probe.)
