"""SparkSession factory tuned for this engine.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32) but every
setting is chosen to also hold on a multi-executor cluster:

- AQE on (runtime coalescing, skew-join splitting, dynamic join strategy)
  so plans self-correct at 100 TB where static estimates are wrong.
- ``spark.sql.shuffle.partitions`` sized to cores locally; on a real
  cluster AQE's coalescePartitions makes the initial number a ceiling,
  so a high default is safe.
- Arrow enabled for the Pandas-UDF paths (similarity / multimodal).
- Session timezone pinned to UTC so results compare bit-for-bit against
  the DuckDB oracle (DuckDB timestamps are UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def cpu_count() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(app_name: str = "market_data_ingestor_go_spark",
              shuffle_partitions: int | None = None) -> SparkSession:
    cpus = cpu_count()
    if shuffle_partitions is None:
        shuffle_partitions = max(cpus, 8)
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # fixture events.parquet stores TIMESTAMP(NANOS); read as raw
        # int64 nanos and convert explicitly (see plans/queries._events)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Spark 4.1's checkpoint file checksums deadlock HDFSBackedStateStore
        # commits on the local filesystem (stateful streaming hangs forever)
        .config("spark.sql.streaming.checkpoint.fileChecksum.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # wide aggs (128-col MinHash signatures) fall out of whole-stage
        # codegen at the default 100-field limit — measured ~25% slower
        .config("spark.sql.codegen.maxFields", "300")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # deep regex backtracking (conf redaction over long streaming
        # plan strings) and deep codegen both overflow the JVM's 1 MB
        # default thread stack — observed as a StackOverflowError on
        # the stream-execution thread at shutdown
        .config("spark.driver.extraJavaOptions", "-Xss16m")
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()
