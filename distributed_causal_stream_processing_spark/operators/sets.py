"""Set operations (SURVEY §2.7).

UNION ALL is a zero-shuffle concatenation; UNION/INTERSECT/EXCEPT add a
distinct (hash aggregate on all columns → one shuffle). At 100 TB,
prefer UNION ALL + a later keyed dedup over repeated DISTINCT unions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_causal_stream_processing_spark.io import load
from distributed_causal_stream_processing_spark.plans.registry import query


def _halves(spark: SparkSession, sf_dir: str):
    """Two overlapping order slices (both contain the middle band)."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus")
    lo = o.filter(F.col("o_orderkey") % 3 != 0)
    hi = o.filter(F.col("o_orderkey") % 2 != 0)
    return lo, hi


_HALVES_SQL = (
    "(SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey % 3 <> 0)",
    "(SELECT o_orderkey, o_orderstatus FROM orders WHERE o_orderkey % 2 <> 0)",
)


@query(
    "q_set_union_all",
    oracle=f"SELECT * FROM {_HALVES_SQL[0]} UNION ALL SELECT * FROM {_HALVES_SQL[1]}",
)
def q_set_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag union — keeps duplicates, no shuffle."""
    lo, hi = _halves(spark, sf_dir)
    return lo.unionAll(hi)


@query(
    "q_set_union_distinct",
    oracle=f"SELECT * FROM {_HALVES_SQL[0]} UNION SELECT * FROM {_HALVES_SQL[1]}",
)
def q_set_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set union — union + distinct."""
    lo, hi = _halves(spark, sf_dir)
    return lo.union(hi).distinct()


@query(
    "q_set_intersect",
    oracle=f"SELECT * FROM {_HALVES_SQL[0]} INTERSECT SELECT * FROM {_HALVES_SQL[1]}",
)
def q_set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct semantics)."""
    lo, hi = _halves(spark, sf_dir)
    return lo.intersect(hi)


@query(
    "q_set_except",
    oracle=f"SELECT * FROM {_HALVES_SQL[0]} EXCEPT SELECT * FROM {_HALVES_SQL[1]}",
)
def q_set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct semantics, matches SQL EXCEPT)."""
    lo, hi = _halves(spark, sf_dir)
    return lo.subtract(hi)


# Multiset (ALL) variants need inputs WITH duplicates to mean anything:
# (l_returnflag, l_linenumber) repeats heavily across lineitem.
_BAGS_SQL = (
    "(SELECT l_returnflag, l_linenumber FROM lineitem WHERE l_suppkey % 2 = 0)",
    "(SELECT l_returnflag, l_linenumber FROM lineitem WHERE l_suppkey % 3 = 0)",
)


def _bags(spark: SparkSession, sf_dir: str):
    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linenumber", "l_suppkey"
    )
    a = li.filter(F.col("l_suppkey") % 2 == 0).drop("l_suppkey")
    b = li.filter(F.col("l_suppkey") % 3 == 0).drop("l_suppkey")
    return a, b


@query(
    "q_set_except_all",
    oracle=f"SELECT * FROM {_BAGS_SQL[0]} EXCEPT ALL SELECT * FROM {_BAGS_SQL[1]}",
)
def q_set_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — multiset difference: a row occurring m times on the
    left and n times on the right survives max(m-n, 0) times (plain
    EXCEPT collapses to 0/1). Physically a per-row-value count
    subtraction: one hash aggregation per side on the full row, never
    a sort — the multiset semantics cost the same single shuffle as
    DISTINCT does."""
    a, b = _bags(spark, sf_dir)
    return a.exceptAll(b)


@query(
    "q_set_intersect_all",
    oracle=f"SELECT * FROM {_BAGS_SQL[0]} INTERSECT ALL SELECT * FROM {_BAGS_SQL[1]}",
)
def q_set_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — multiset intersection: min(m, n) copies
    survive. Same single-shuffle count-based physical shape as
    EXCEPT ALL."""
    a, b = _bags(spark, sf_dir)
    return a.intersectAll(b)
