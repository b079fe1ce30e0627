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
    """Multi-key ORDER BY; rank column makes the order itself
    hash-checkable — computed WITHOUT a global single-partition window
    (VERDICT r07 item 3; the `row_number().over(W.orderBy(...))` form
    moved the whole filtered result to one task).

    Same two-level construction as q_win_dist, generalized to a
    composite sort order: the band key is (o_orderstatus,
    -floor(o_totalprice/10k)) — monotone in (status ASC, totalprice
    DESC), so (band, within-band order) is the same total order as the
    ORDER BY. Within-band row numbers are bounded per task by band
    volume; band offsets come from a broadcast theta self-join over the
    tiny per-band count table (lexicographic "strictly earlier band"
    predicate). The final ORDER BY itself stays Spark's range-partitioned
    sort — already scale-safe. Oracle unchanged: the value-hash match
    proves equivalence to the plain global window.
    """
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    order = [
        F.col("o_orderstatus").asc(),
        F.col("o_totalprice").desc_nulls_last(),
        F.col("o_orderkey").asc(),
    ]
    # -floor(price/10k) ascends as price descends → band order == sort order
    nb = -F.floor(F.col("o_totalprice") / F.lit(10_000.0)).cast("long")
    b = o.withColumn("nb", nb)
    w_in = W.partitionBy("o_orderstatus", "nb").orderBy(
        F.col("o_totalprice").desc_nulls_last(), F.col("o_orderkey").asc()
    )
    within = b.withColumn("within", F.row_number().over(w_in))
    counts = b.groupBy("o_orderstatus", "nb").agg(F.count(F.lit(1)).alias("n"))
    earlier = (F.col("p.o_orderstatus") < F.col("a.o_orderstatus")) | (
        (F.col("p.o_orderstatus") == F.col("a.o_orderstatus"))
        & (F.col("p.nb") < F.col("a.nb"))
    )
    offsets = (
        counts.alias("a")
        .join(F.broadcast(counts.alias("p")), earlier, "left")
        .groupBy(
            F.col("a.o_orderstatus").alias("o_orderstatus"),
            F.col("a.nb").alias("nb"),
        )
        .agg(F.coalesce(F.sum("p.n"), F.lit(0)).alias("off"))
    )
    return (
        within.join(F.broadcast(offsets), ["o_orderstatus", "nb"])
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.round("o_totalprice", 2).alias("o_totalprice"),
            (F.col("within") + F.col("off")).cast("bigint").alias("sort_rank"),
        )
        .orderBy("sort_rank")
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
