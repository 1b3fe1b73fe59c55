"""Bucketed tables: the write-once/join-free-forever scale path —
asserts the bucketed join plan contains NO Exchange."""

from __future__ import annotations

import pytest

from gomaxscale_spark.catalog import load_table
from gomaxscale_spark.operators.bucketing import bucketed_join, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    # tables land in ./spark-warehouse (gitignored); warehouse.dir is a
    # static conf and can't be repointed on a live session
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    write_bucketed(orders, "orders_b", "o_custkey", n_buckets=8)
    write_bucketed(
        customer.withColumnRenamed("c_custkey", "o_custkey"), "customer_b", "o_custkey", 8
    )
    yield
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS customer_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    # disable broadcast so the planner must pick SMJ — at test scale it
    # would otherwise broadcast (which also skips the shuffle, but we're
    # proving the bucketing path used at fact×fact scale)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "orders_b", "customer_b", "o_custkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan[:2000]}"
    assert "SortMergeJoin" in plan


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    joined = bucketed_join(spark, "orders_b", "customer_b", "o_custkey")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    plain = orders.join(customer, "o_custkey")
    assert joined.count() == plain.count()
