"""Bucketed co-located join: the plan must contain NO shuffle Exchange
on the join key once both sides are bucketed the same way — the
pay-the-shuffle-once design for recurring 100 TB joins."""

from __future__ import annotations

import pytest

from market_data_ingestor_go_spark.sources.bucketing import bucketed_join, write_bucketed
from market_data_ingestor_go_spark.sources.connectors import (
    jdbc_available, kafka_available, read_jdbc_dim, redis_available)
from market_data_ingestor_go_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    # (warehouse dir is a static conf — tables land in ./spark-warehouse
    # and are dropped in the finally block)
    orders = load_table(spark, SF, "orders")
    lineitem = load_table(spark, SF, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey")
    write_bucketed(orders, "b_orders", "o_orderkey", 8)
    write_bucketed(lineitem, "b_lineitem", "o_orderkey", 8)
    try:
        # bucketed join must not broadcast (that would skip bucketing)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = bucketed_join(spark, "b_orders", "b_lineitem", "o_orderkey")
        plan = _plan(joined)
        assert "Exchange" not in plan, plan
        # and it still computes the right thing
        n = joined.count()
        li = load_table(spark, SF, "lineitem")
        plain = orders.join(li, orders.o_orderkey == li.l_orderkey).count()
        assert n == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bootstrap_tables_idempotent(spark):
    # K3 (postgres.go:46-97): create-if-absent, safe to call twice
    from market_data_ingestor_go_spark.sources.tables import bootstrap_tables
    try:
        first = bootstrap_tables(spark, database="mdingest")
        second = bootstrap_tables(spark, database="mdingest")
        assert first == second
        cols = [f.name for f in spark.table("mdingest.market_data").schema.fields]
        assert cols == ["id", "name", "timestamp", "exchange", "data"]
        spark.sql("INSERT INTO mdingest.api_keys VALUES (1, 'c1', 'h', true, NULL)")
        assert spark.table("mdingest.api_keys").count() == 1
        bootstrap_tables(spark, database="mdingest")  # must not wipe data
        assert spark.table("mdingest.api_keys").count() == 1
    finally:
        spark.sql("DROP DATABASE IF EXISTS mdingest CASCADE")


def test_connectors_degrade_explicitly(spark):
    """Connectors must either work or raise NotImplementedError with a
    pointer to the fallback — never fail obscurely at runtime."""
    if not jdbc_available(spark):
        with pytest.raises(NotImplementedError):
            read_jdbc_dim(spark, "jdbc:postgresql://x/y", "api_keys")
    assert isinstance(redis_available(), bool)
    assert isinstance(kafka_available(spark), bool)
