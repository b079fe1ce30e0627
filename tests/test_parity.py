"""Spark-vs-DuckDB parity for every registered query, at the driver's
correctness scale factor (sf0.01)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_CORRECT
from tests.parity import compare, register_duck_views


def _registry():
    from distributed_causal_stream_processing_spark import REGISTRY, all_queries

    all_queries()  # force module loading
    return REGISTRY


@pytest.fixture(scope="session")
def duck_views(duck):
    register_duck_views(duck, SF_CORRECT)
    return duck


def pytest_generate_tests(metafunc):
    if "query_name" in metafunc.fixturenames:
        metafunc.parametrize("query_name", sorted(_registry()))


def test_query_parity(query_name, spark, duck_views):
    spec = _registry()[query_name]
    df = spec.fn(spark, SF_CORRECT)
    if spec.oracle is None:
        assert len(df.take(1)) >= 0  # rows-only smoke: executes cleanly
    else:
        compare(df, duck_views, spec.oracle)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    rows = e.entry(spark).collect()
    assert len(rows) > 0
    assert e.queries().keys() >= {"q_agg_group", "q_causal_seq", "q_stream_tumbling"}
    missing = set(e.oracle_sql()) - set(e.queries())
    assert not missing
