"""Batch table loaders for the driver fixture tables.

The fixture universe (TESTDATA.md) is a TPC-H-ish star schema plus an
``events`` stream-analog table and the LLM-pipeline tables ``documents``
and ``embeddings``. Parquet scans here are the entry point for every
batch query, so Catalyst's column pruning and predicate pushdown reach
the file scan for free — operators downstream never force a full read.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# Dimensions small enough to always broadcast in joins (≤ a few MB even
# at sf100; the true "big" tables are lineitem/orders/events).
SMALL_DIMS = {"region", "nation", "supplier", "customer", "part"}

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def pin_session_confs(spark: SparkSession) -> None:
    """Pin the runtime confs query correctness depends on, so results
    are right even under a caller-built SparkSession (e.g. the driver's):
    UTC so NTZ↔instant coercions and window alignment match the DuckDB
    oracle; nanosAsLong so the events table's TIMESTAMP(NANOS) parquet
    column is readable (converted explicitly by the events loader)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # perf, not correctness: the 128-column MinHash signature aggregate
    # exceeds the default whole-stage-codegen field limit (100) and
    # falls back to interpreted eval — measured ~25% slower
    spark.conf.set("spark.sql.codegen.maxFields", "300")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    pin_session_confs(spark)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql()."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


# K3 — table bootstrap (postgres.go:46-97): create-if-absent DDL for the
# engine's three persistent tables, run once at engine init. Parquet
# catalog tables here; the DDL mirrors §1.4 of SURVEY.md (SERIAL ids
# become engine-generated monotonically_increasing_id at write time —
# non-contiguous, documented divergence).
BOOTSTRAP_DDL = {
    "market_data": """
        CREATE TABLE IF NOT EXISTS {db}market_data (
          id BIGINT, name STRING NOT NULL, timestamp BIGINT NOT NULL,
          exchange STRING, data STRING) USING parquet
    """,
    "clients_configs": """
        CREATE TABLE IF NOT EXISTS {db}clients_configs (
          id STRING NOT NULL, config STRING) USING parquet
    """,
    "api_keys": """
        CREATE TABLE IF NOT EXISTS {db}api_keys (
          id BIGINT, client_id STRING NOT NULL, key_hash STRING NOT NULL,
          is_active BOOLEAN, last_used_at TIMESTAMP) USING parquet
    """,
}


def bootstrap_tables(spark: SparkSession, database: str | None = None) -> list[str]:
    """Create the engine's persistent tables if absent; returns the
    table names touched (idempotent — second call is a no-op)."""
    prefix = f"{database}." if database else ""
    if database:
        spark.sql(f"CREATE DATABASE IF NOT EXISTS {database}")
    created = []
    for name, ddl in BOOTSTRAP_DDL.items():
        spark.sql(ddl.format(db=prefix))
        created.append(f"{prefix}{name}")
    return created
