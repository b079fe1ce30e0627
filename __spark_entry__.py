"""Driver contract for the spark-graft builder (PySpark target).

Backed by the distributed_causal_stream_processing_spark package:
every operator from SURVEY.md §2 is registered in
``plans/registry.py`` with its DuckDB oracle; this module just exposes
that registry to the driver.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))
if _REPO_DIR not in sys.path:
    sys.path.insert(0, _REPO_DIR)
# Python workers inherit the driver's environment (not its sys.path);
# worker-crossing closures are pickled by value, but keep the package
# importable for workers spawned after this point as a belt-and-braces.
os.environ["PYTHONPATH"] = (
    _REPO_DIR + os.pathsep + os.environ.get("PYTHONPATH", "")
).rstrip(os.pathsep)

from distributed_causal_stream_processing_spark import all_oracle_sql, all_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shaped pricing summary) on sf0.001."""
    return all_queries()["q_agg_group"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each oracle-checkable query."""
    return all_oracle_sql()
