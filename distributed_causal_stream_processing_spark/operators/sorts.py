"""Sorts / limits / top-k (SURVEY §2.6).

Scale notes: global ORDER BY is a range-partitioned sort (sampling pass
+ shuffle) — fine when the result feeds a LIMIT; `orderBy().limit(k)`
compiles to TakeOrderedAndProject, which keeps only k rows per
partition then merges k·P rows on the driver — O(k) memory at any input
scale, the right top-k at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_causal_stream_processing_spark.io import load
from distributed_causal_stream_processing_spark.plans.registry import query


@query(
    "q_sort_multi",
    oracle="""
    SELECT o_orderkey, o_orderstatus, round(o_totalprice, 2) AS o_totalprice,
           CAST(row_number() OVER (
               ORDER BY o_orderstatus ASC, o_totalprice DESC NULLS LAST, o_orderkey ASC
           ) AS BIGINT) AS sort_rank
    FROM orders
    WHERE o_totalprice > 400000
    """,
)
def q_sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key ORDER BY; rank column makes the order itself hash-checkable."""
    from pyspark.sql import Window as W

    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    order = [
        F.col("o_orderstatus").asc(),
        F.col("o_totalprice").desc_nulls_last(),
        F.col("o_orderkey").asc(),
    ]
    return o.orderBy(*order).select(
        "o_orderkey",
        "o_orderstatus",
        F.round("o_totalprice", 2).alias("o_totalprice"),
        F.row_number().over(W.orderBy(*order)).cast("bigint").alias("sort_rank"),
    )


@query(
    "q_topk",
    oracle="""
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 25
    """,
)
def q_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORDER BY + LIMIT k → TakeOrderedAndProject (k rows per partition)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(25)
        .select("o_orderkey", "o_custkey", F.round("o_totalprice", 2).alias("o_totalprice"))
    )
