"""Physical-plan shape assertions — the 100 TB story, checked at any SF.

Correctness tests prove the values; these prove the *plan*: filters reach the
parquet scan, projections prune columns, dims broadcast, top-k avoids a global
sort. A regression here is invisible at sf0.01 and fatal at 100 TB.
"""

from __future__ import annotations

import pytest

from recsys_spark_spark.registry import load_all
from tests.conftest import SF_SMOKE

QUERIES, _ = load_all()


def plan_of(spark, name: str) -> str:
    df = QUERIES[name](spark, SF_SMOKE)
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_reaches_scan(spark):
    plan = plan_of(spark, "q_scan_filter_pushdown")
    assert "PushedFilters: [" in plan
    assert "IsNotNull(l_shipdate)" in plan or "GreaterThanOrEqual(l_shipdate" in plan


def test_column_pruning(spark):
    plan = plan_of(spark, "q_scan_project")
    assert "ReadSchema" in plan
    # none of the non-projected columns may appear in the scan schema
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    for col in ("l_extendedprice", "l_shipdate", "l_returnflag"):
        assert col not in read_schema


def test_broadcast_join_used_for_dims(spark):
    plan = plan_of(spark, "q_join_broadcast")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_multiway_join_broadcasts_dims(spark):
    plan = plan_of(spark, "q_join_multiway")
    assert "BroadcastHashJoin" in plan


def test_global_topk_avoids_total_sort(spark):
    plan = plan_of(spark, "q_orderby_limit")
    assert "TakeOrderedAndProject" in plan


def test_semi_anti_join_operators(spark):
    assert "LeftSemi" in plan_of(spark, "q_join_semi")
    assert "LeftAnti" in plan_of(spark, "q_join_anti")


def test_flagship_has_no_cartesian(spark):
    plan = plan_of(spark, "q_cf_recommend")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


@pytest.mark.parametrize("name", ["q_cf_cooccurrence", "q_cf_recommend"])
def test_cf_plans_use_hash_aggregate(spark, name):
    plan = plan_of(spark, name)
    assert "HashAggregate" in plan
