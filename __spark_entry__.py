"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in the ``market_data_ingestor_go_spark`` package
(this repo); this module is thin glue.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from market_data_ingestor_go_spark.plans.oracles import ORACLES  # noqa: E402
from market_data_ingestor_go_spark.plans.queries import (  # noqa: E402
    ALL_QUERIES, QUERIES)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    q1 lives in EXTRA_QUERIES since the round-7 window rotation (its
    plan-identical twin sql_api_pricing_summary holds the window slot),
    so the flagship resolves through ALL_QUERIES.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return ALL_QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ §2.11)."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB twins; keys absent here get the weaker rows-only check
    (engine-side LSH bucketing / HLL sketches — see oracles.py doc)."""
    return dict(ORACLES)
