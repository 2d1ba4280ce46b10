"""Bucketed-table helpers — shuffle-free co-located joins.

At 100 TB the dominant recurring cost of orders⋈lineitem-shaped joins
is the shuffle of both sides on the join key. Bucketing pays that
shuffle ONCE at write time: both tables hash-partitioned into the same
number of buckets on the key, so every later equi-join on that key is
bucket-to-bucket with **no Exchange in the plan** (asserted in
tests/test_bucketing.py).

This is the batch analog of Kafka partitioning on symbol for the
streaming path: co-partition once at the boundary, never again.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, key: str, n_buckets: int,
                   sort: bool = True) -> None:
    """Persist ``df`` as a bucketed (and bucket-sorted) managed table.

    Sorting within buckets additionally enables merge-join without a
    per-task sort (SortMergeJoin's sort becomes a no-op).
    """
    writer = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  key: str) -> DataFrame:
    """Equi-join two same-bucketed tables on their bucket key — planned
    without any Exchange when bucket counts match."""
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, key)
