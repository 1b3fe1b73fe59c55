"""Physical-plan regression tests: lock in the plans we tuned for —
pushdown reaching the scans, dims broadcast, top-k as
TakeOrderedAndProject, window top-k with a single shuffle."""

from __future__ import annotations

import pytest

from gomaxscale_spark.plans import all_queries

QUERIES = all_queries()


def plan_str(spark, sf_dir, name: str) -> str:
    df = QUERIES[name].fn(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_and_projection_pushdown(spark, sf_dir):
    p = plan_str(spark, sf_dir, "scan_filter_project")
    assert "PushedFilters: [IsNotNull(o_orderstatus)" in p
    assert "o_orderdate" not in p.split("ReadSchema")[1].splitlines()[0], (
        "projection not pruned — scan reads unused columns"
    )


def test_q6_all_predicates_pushed(spark, sf_dir):
    p = plan_str(spark, sf_dir, "q6_forecast_revenue")
    pushed = p.split("PushedFilters: [")[1].split("]")[0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"{col} not pushed to scan: {pushed}"


def test_q5_dims_broadcast(spark, sf_dir):
    p = plan_str(spark, sf_dir, "q5_region_revenue")
    assert "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_topn_is_take_ordered(spark, sf_dir):
    p = plan_str(spark, sf_dir, "topn_global_orders")
    assert "TakeOrderedAndProject" in p
    assert "Sort " not in p.replace("TakeOrderedAndProject", "")


def test_asof_single_window_single_shuffle(spark, sf_dir):
    p = plan_str(spark, sf_dir, "asof_join_purchase_attribution")
    # union-sort trick: no join node at all, exactly one Window
    assert "SortMergeJoin" not in p and "BroadcastHashJoin" not in p
    assert p.count("Window") == 1, f"expected exactly one Window node:\n{p[:1500]}"


def test_range_join_bucketed_is_equi_join(spark, sf_dir):
    p = plan_str(spark, sf_dir, "range_join_bucketed")
    assert "BroadcastNestedLoopJoin" not in p and "CartesianProduct" not in p


def test_minhash_lsh_no_string_shuffle(spark, sf_dir):
    """The LSH shuffle must carry band hashes, not document text."""
    p = plan_str(spark, sf_dir, "dedup_minhash_lsh")
    exchanges = [seg.splitlines()[0] for seg in p.split("Exchange")[1:]]
    assert all("text" not in e for e in exchanges), exchanges
