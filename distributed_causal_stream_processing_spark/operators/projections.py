"""Projection / filter / predicate operators (SURVEY §2.2)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_causal_stream_processing_spark.io import load
from distributed_causal_stream_processing_spark.plans.registry import query


@query(
    "q_project_expr",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount), 4) AS revenue,
           round(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS charge
    FROM lineitem
    """,
)
def q_project_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic expression projection — whole-stage-codegen'd, no shuffle.

    Rounding precision matches the value's exact decimal grid (prices
    and rates are 2-dec, so products are 4-/6-dec): rounding AT the
    grid never sits on a half-way boundary, so Spark's HALF_UP and
    DuckDB's scaled-double rounding agree bit-for-bit.
    """
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(disc_price, 4).alias("revenue"),
        F.round(disc_price * (1 + F.col("l_tax")), 6).alias("charge"),
    )


@query(
    "q_filter_compound",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity, l_discount
    FROM lineitem
    WHERE (l_returnflag IN ('A', 'R') OR l_linestatus = 'O')
      AND l_quantity BETWEEN 5 AND 45
      AND NOT (l_discount > 0.08)
      AND l_shipdate IS NOT NULL
    """,
)
def q_filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound predicates: AND/OR/NOT, IN, BETWEEN, IS NULL."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_returnflag").isin("A", "R") | (F.col("l_linestatus") == "O"))
        & F.col("l_quantity").between(5, 45)
        & ~(F.col("l_discount") > 0.08)
        & F.col("l_shipdate").isNotNull()
    ).select("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity", "l_discount")


@query(
    "q_filter_like",
    oracle="""
    SELECT p_partkey, p_name, p_type
    FROM part
    WHERE p_name LIKE '%o%'
      AND regexp_matches(p_type, '^(STANDARD|SMALL|ECONOMY)')
    """,
)
def q_filter_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIKE pattern + regex predicate."""
    part = load(spark, sf_dir, "part")
    return part.filter(
        F.col("p_name").like("%o%") & F.col("p_type").rlike("^(STANDARD|SMALL|ECONOMY)")
    ).select("p_partkey", "p_name", "p_type")
