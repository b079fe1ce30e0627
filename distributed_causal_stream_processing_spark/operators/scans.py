"""Scans: parquet source with column pruning + predicate pushdown (SURVEY §2.1).

Reference analogue: the consumer poll from a partitioned log. In Spark
the declarative scan gets us, for free via Catalyst: column pruning
(ReadSchema contains only selected columns), predicate pushdown to
parquet row groups (PushedFilters), and — at 100 TB with a partitioned
layout — partition pruning. tests/test_plans.py asserts pruning and
pushdown actually appear in the physical plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_causal_stream_processing_spark.io import load
from distributed_causal_stream_processing_spark.plans.registry import query


@query(
    "q_scan_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    """,
)
def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parquet scan + column pruning: only 4 of 11 lineitem columns read."""
    return load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )


@query(
    "q_scan_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_shipdate, l_quantity
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
      AND l_quantity < 10
    """,
)
def q_scan_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan with predicates pushed down to the parquet reader (row-group skip)."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_quantity") < 10)
    ).select("l_orderkey", "l_linenumber", "l_shipdate", "l_quantity")
