"""Physical-plan assertions: the 100 TB design claims must be visible in
the executed plan, not just in docstrings."""

from __future__ import annotations

from tests.conftest import SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _registry():
    from distributed_causal_stream_processing_spark import REGISTRY, all_queries

    all_queries()
    return REGISTRY


def test_broadcast_join_is_broadcast(spark):
    df = _registry()["q_join_broadcast"].fn(spark, SF_SMOKE)
    df.collect()
    assert "BroadcastHashJoin" in _plan(df)


def test_scan_filter_pushdown(spark):
    df = _registry()["q_scan_filter"].fn(spark, SF_SMOKE)
    plan = _plan(df)
    assert "PushedFilters: [" in plan
    # at least one of the two predicates reaches the parquet reader
    assert "GreaterThanOrEqual(l_shipdate" in plan or "LessThan(l_quantity" in plan


def test_scan_project_prunes_columns(spark):
    df = _registry()["q_scan_project"].fn(spark, SF_SMOKE)
    plan = _plan(df)
    # ReadSchema should carry only the 4 selected columns
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "l_orderkey" in read_schema and "l_extendedprice" in read_schema
    assert "l_shipdate" not in read_schema and "l_returnflag" not in read_schema


def test_topk_uses_take_ordered(spark):
    df = _registry()["q_topk"].fn(spark, SF_SMOKE)
    assert "TakeOrderedAndProject" in _plan(df)


def test_agg_is_partial_final(spark):
    df = _registry()["q_agg_group"].fn(spark, SF_SMOKE)
    plan = _plan(df)
    # partial + final hash aggregation (map-side combine before shuffle)
    assert plan.count("HashAggregate") >= 2


def test_flagship_wholestage_codegen(spark):
    df = _registry()["q_agg_group"].fn(spark, SF_SMOKE)
    df.collect()  # materialize so AQE's final plan (with codegen ids) exists
    # "*(n)" prefixes mark whole-stage-codegen'd operators in treeString
    assert "*(" in _plan(df)
