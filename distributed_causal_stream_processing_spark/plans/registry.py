"""Query registry — the single source of truth for SURVEY.md §2.

Every operator the engine claims is registered here as a named query:
a callable ``(spark, sf_dir) -> DataFrame`` plus (for SQL-expressible
ops) the equivalent DuckDB oracle SQL. ``__spark_entry__.py`` exposes
this registry to the driver; the local pytest parity harness iterates
it too, so "registered" == "tested".

Oracle-parity rules (SURVEY §7.4) every query follows:
- round float aggregates/similarities identically on both sides;
- alias every computed column identically, lowercase;
- tie-break top-k / window ordering with a unique key;
- truncate ``events.ts`` (parquet ns) to µs/second on both sides.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None → driver does rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query under ``name`` with an optional DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query id {name!r}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


# Modules whose import populates REGISTRY. Order roughly follows SURVEY §2.
_QUERY_MODULES = (
    "distributed_causal_stream_processing_spark.operators.scans",
    "distributed_causal_stream_processing_spark.operators.projections",
    "distributed_causal_stream_processing_spark.operators.joins",
    "distributed_causal_stream_processing_spark.operators.aggregates",
    "distributed_causal_stream_processing_spark.operators.windows",
    "distributed_causal_stream_processing_spark.operators.sorts",
    "distributed_causal_stream_processing_spark.operators.sets",
    "distributed_causal_stream_processing_spark.operators.reshape",
    "distributed_causal_stream_processing_spark.functions.scalars",
    "distributed_causal_stream_processing_spark.functions.udfs",
    "distributed_causal_stream_processing_spark.streaming.batch_views",
    "distributed_causal_stream_processing_spark.operators.dedup",
    "distributed_causal_stream_processing_spark.operators.text",
    "distributed_causal_stream_processing_spark.operators.similarity",
    "distributed_causal_stream_processing_spark.operators.multimodal",
    "distributed_causal_stream_processing_spark.operators.tpch",
    "distributed_causal_stream_processing_spark.operators.graph",
)

_loaded = False


def _load_all() -> None:
    global _loaded
    if _loaded:
        return
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    _loaded = True


def all_queries() -> dict[str, QueryFn]:
    _load_all()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def all_oracle_sql() -> dict[str, str]:
    _load_all()
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
