"""Sorts / limits / top-k (SURVEY §2.6).

Scale notes: global ORDER BY is a range-partitioned sort (sampling pass
+ shuffle) — fine when the result feeds a LIMIT; `orderBy().limit(k)`
compiles to TakeOrderedAndProject, which keeps only k rows per
partition then merges k·P rows on the driver — O(k) memory at any input
scale, the right top-k at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
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


@query(
    "q_topk_with_ties",
    oracle="""
    SELECT l_orderkey, l_linenumber, round(l_quantity, 2) AS qty,
           CAST(rnk AS BIGINT) AS rnk
    FROM (
        SELECT l_orderkey, l_linenumber, l_quantity,
               rank() OVER (ORDER BY l_quantity DESC) AS rnk
        FROM lineitem
    )
    WHERE rnk <= 10
    """,
)
def q_topk_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k WITH TIES (FETCH FIRST 10 ROWS WITH TIES semantics):
    every row whose rank ≤ 10 survives, so equal quantities at the
    cutoff all ship — the deterministic alternative to q_topk's
    arbitrary-but-keyed truncation when the business rule is 'nothing
    tied may be dropped'. Output size is data-dependent (≥ 10).

    Scale: rank() over a global ORDER BY is a single-partition sort of
    the full input in the naive plan; Spark 4's window-group-limit
    pushes the rank ≤ 10 filter into per-partition top-k before the
    final sort (the same optimization q_topk_per_group relies on,
    asserted there), so only ~10 rows per partition reach the global
    step."""
    w = W.orderBy(F.desc("l_quantity"))
    return (
        load(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity")
        .withColumn("rnk", F.rank().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 10)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round("l_quantity", 2).alias("qty"),
            "rnk",
        )
    )
