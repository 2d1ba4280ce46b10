"""Column-level market-data transforms (SURVEY.md §2.3).

Reference parity map (file:line cites into /root/reference):

- ``validate``        → P1 validation filter
  (internal/app/models/market_data.go:12-20, applied at
  internal/app/services/websocket/ingestor.go:111-115)
- ``decode_payload``  → S2 JSON decode with corrupt-record drop
  (internal/app/services/websocket/ingestor.go:105-110)
- ``flatten``         → P3 flatten/normalize: promote the inner
  ``data.data`` object's keys to top level and attach
  symbol/timestamp/exchange
  (internal/app/services/websocket/server.go:176-188)
- ``hash_api_key``    → P10 sha256 hex digest (internal/utils/helper.go:8-11)
- ``to_wire_json``    → P11 JSON re-serialization (postgres.go:121,
  cache_service.go:46, server.go:117)

All of these are pure Column expressions: they stay inside
WholeStageCodegen on the JVM, never touch Python at runtime, and
compose with both batch and streaming DataFrames.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# The wire envelope: {name, timestamp, exchange, data:{data:{bid,ask,...}}}.
# The payload is double-nested on the wire (server.go:180 consumes
# data["data"]); numeric payload fields are DOUBLE because Go's
# json.Unmarshal yields float64 (server.go:194).
PAYLOAD_SCHEMA = T.StructType([
    T.StructField("data", T.MapType(T.StringType(), T.DoubleType())),
])

MARKET_DATA_SCHEMA = T.StructType([
    T.StructField("name", T.StringType()),
    T.StructField("timestamp", T.LongType()),
    T.StructField("exchange", T.StringType()),
    T.StructField("data", T.StringType()),  # raw JSON payload envelope
])


def validate(df: DataFrame, name_col: str = "name",
             ts_col: str = "timestamp") -> DataFrame:
    """P1: drop rows with empty/null name or non-positive timestamp."""
    return df.filter(
        F.col(name_col).isNotNull()
        & (F.col(name_col) != F.lit(""))
        & (F.col(ts_col) > F.lit(0))
    )


def decode_payload(df: DataFrame, raw_col: str = "data",
                   schema: T.StructType = PAYLOAD_SCHEMA) -> DataFrame:
    """S2: parse the raw JSON payload column; drop undecodable rows.

    PERMISSIVE mode turns malformed JSON into a null struct, which we
    drop — mirroring the reference's unmarshal-error 'continue' path.
    """
    parsed = df.withColumn("_payload", F.from_json(F.col(raw_col), schema))
    return parsed.filter(F.col("_payload").isNotNull())


def flatten(df: DataFrame, payload_col: str = "_payload") -> DataFrame:
    """P3: promote inner ``data.data`` map entries + envelope columns.

    Output shape is the serve-side flat record D5: payload keys at top
    level plus ``symbol`` (from name), ``timestamp``, ``exchange``.
    With a dynamic MAP payload the flat record keeps the map exploded
    into columns only when a typed schema is supplied; the MAP variant
    keeps ``fields MAP<STRING,DOUBLE>`` for schema-on-read consumers.
    """
    return df.select(
        F.col(f"{payload_col}.data").alias("fields"),
        F.col("name").alias("symbol"),
        F.col("timestamp"),
        F.col("exchange"),
    )


def hash_api_key(key: Column | str) -> Column:
    """P10: sha256 hex digest of an API key string."""
    col = F.col(key) if isinstance(key, str) else key
    return F.sha2(col, 256)


def to_wire_json(*cols: str) -> Column:
    """P11: serialize the given columns as a JSON object string."""
    return F.to_json(F.struct(*cols))
