"""Reshaping + subquery operators: PIVOT, UNPIVOT (melt), exact
percentiles, scalar subqueries — OLAP table-stakes beyond the SURVEY §2
minimum.

Scale notes (100 TB):
- PIVOT with an explicit value list compiles to one hash aggregation
  (one conditional agg column per pivot value) — a single shuffle, no
  extra pass per value. Never pivot on an unbounded column: the value
  list IS the schema.
- UNPIVOT is a generate (row explode) — narrow, no shuffle.
- Exact percentile sorts within groups; at 100 TB prefer
  approx_percentile (t-digest) unless exactness is contractual. Both
  shapes are one shuffle; the exact one materializes each group.
- A scalar subquery becomes a broadcast of a single row — the 100 TB
  fact side streams past it unshuffled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_causal_stream_processing_spark.io import load
from distributed_causal_stream_processing_spark.plans.registry import query

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@query(
    "q_agg_percentile",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.5), 4) AS p50_qty,
           round(quantile_cont(l_quantity, 0.9), 4) AS p90_qty,
           round(quantile_cont(l_extendedprice, 0.95), 4) AS p95_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark `percentile` ==
    DuckDB `quantile_cont`, both linear interpolation)."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_quantity, 0.5)"), 4).alias("p50_qty"),
        F.round(F.expr("percentile(l_quantity, 0.9)"), 4).alias("p90_qty"),
        F.round(F.expr("percentile(l_extendedprice, 0.95)"), 4).alias("p95_price"),
    )


@query(
    "q_pivot",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
           CAST(count(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS click,
           CAST(count(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS error,
           CAST(count(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS purchase,
           CAST(count(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS signup,
           CAST(count(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS view
    FROM events
    GROUP BY 1
    """,
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event counts pivoted wide by event_type. The explicit value
    list keeps it a single hash agg (and a fixed schema)."""
    e = load(spark, sf_dir, "events")
    p = (
        e.groupBy(F.to_date("ts").alias("day"))
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.count(F.lit(1)))
    )
    return p.select(
        "day", *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in EVENT_TYPES]
    )


@query(
    "q_unpivot",
    oracle="""
    WITH wide AS (
        SELECT l_returnflag,
               CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
        FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM wide
    UNION ALL
    SELECT l_returnflag, 'sum_price' AS metric, sum_price AS value FROM wide
    """,
)
def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide per-flag sums melted to long (metric, value) rows via the
    native unpivot — a generate, not a shuffle. Decimal-cast sums keep
    the doubles bit-identical across engines."""
    li = load(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).cast("double").alias("sum_qty"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_price"),
    )
    return wide.unpivot(
        ids=["l_returnflag"],
        values=["sum_qty", "sum_price"],
        variableColumnName="metric",
        valueColumnName="value",
    )


_SCALAR_SUBQ_SQL = """
    SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n_above_avg
    FROM orders
    WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
    GROUP BY o_orderstatus
"""


@query("q_scalar_subquery", oracle=_SCALAR_SUBQ_SQL)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery — planned as a one-row broadcast;
    identical SQL text runs on both engines."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_SCALAR_SUBQ_SQL)


_NULL_SEMANTICS_SQL = """
    SELECT NULLIF(o_orderstatus, 'P') AS status_or_null,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(NULLIF(o_orderstatus, 'P')) AS BIGINT) AS n_nonnull,
           CAST(count(DISTINCT NULLIF(o_orderstatus, 'P')) AS BIGINT) AS n_distinct,
           CAST(sum(CASE WHEN NULLIF(o_orderpriority, '1-URGENT') IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent
    FROM orders
    GROUP BY NULLIF(o_orderstatus, 'P')
"""


@query("q_null_semantics", oracle=_NULL_SEMANTICS_SQL)
def q_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL-handling parity in one query: NULL as a group key (groups,
    doesn't drop), count(*) vs count(col) (the latter skips NULLs),
    count(DISTINCT col) (ignores NULL), and IS NULL predicates —
    identical ANSI semantics asserted on both engines."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_NULL_SEMANTICS_SQL)


_CORR_SUBQ_SQL = """
    SELECT c_custkey, c_name,
           (SELECT CAST(count(*) AS BIGINT) FROM orders o
            WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
               AS n_big_orders
    FROM customer c
    WHERE c_custkey <= 200
"""


@query("q_correlated_subquery", oracle=_CORR_SUBQ_SQL)
def q_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery per customer row. Catalyst
    decorrelates it into a left outer join + aggregation — no per-row
    re-execution, one shuffle — which is exactly the rewrite you'd
    hand-write at 100 TB; declaring it keeps that choice with the
    optimizer."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(_CORR_SUBQ_SQL)


@query(
    "q_profile_table",
    oracle="""
    WITH s AS (SELECT * FROM events)
    SELECT 'event_id' AS col, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) - count(event_id) AS BIGINT) AS n_null,
           CAST(count(DISTINCT event_id) AS BIGINT) AS n_distinct,
           CAST(min(event_id) AS VARCHAR) AS min_val,
           CAST(max(event_id) AS VARCHAR) AS max_val
    FROM s
    UNION ALL
    SELECT 'user_id', CAST(count(*) AS BIGINT),
           CAST(count(*) - count(user_id) AS BIGINT),
           CAST(count(DISTINCT user_id) AS BIGINT),
           CAST(min(user_id) AS VARCHAR), CAST(max(user_id) AS VARCHAR)
    FROM s
    UNION ALL
    SELECT 'event_type', CAST(count(*) AS BIGINT),
           CAST(count(*) - count(event_type) AS BIGINT),
           CAST(count(DISTINCT event_type) AS BIGINT),
           min(event_type), max(event_type)
    FROM s
    UNION ALL
    SELECT 'value', CAST(count(*) AS BIGINT),
           CAST(count(*) - count(value) AS BIGINT),
           CAST(count(DISTINCT value) AS BIGINT),
           CAST(CAST(floor(min(value) * 100) AS BIGINT) AS VARCHAR),
           CAST(CAST(floor(max(value) * 100) AS BIGINT) AS VARCHAR)
    FROM s
    """,
)
def q_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-profile summary (null count, distinct count, min/max as
    strings) for four events columns in ONE scan — the data-quality /
    stats-collection primitive behind CBO statistics and ingest
    monitoring. The per-column stats compute as a single wide
    aggregate (one pass, partial+final; the count-distincts expand to
    Spark's standard distinct-aggregate rewrite) and reshape to one
    row per column with an in-memory stack — no repeated scans, no
    union of four jobs (the oracle's UNION ALL form is for DuckDB
    legibility; DuckDB CSE-merges the scans)."""
    e = load(spark, sf_dir, "events")
    agg = e.agg(
        F.count(F.lit(1)).alias("n_rows"),
        *[
            x
            for c in ("event_id", "user_id", "event_type", "value")
            for x in (
                F.count(c).alias(f"nn_{c}"),
                F.count_distinct(F.col(c)).alias(f"nd_{c}"),
            )
        ],
        F.min("event_id").alias("min_event_id"),
        F.max("event_id").alias("max_event_id"),
        F.min("user_id").alias("min_user_id"),
        F.max("user_id").alias("max_user_id"),
        F.min("event_type").alias("min_event_type"),
        F.max("event_type").alias("max_event_type"),
        # floor-scaled cents, NOT round(x, 2): round() of a double near a
        # representation boundary resolves differently in Spark (HALF_UP on
        # the shortest decimal) vs DuckDB (scale + rint) — floor of the
        # identical product is unambiguous (the rolling-zscore lesson)
        F.floor(F.min("value") * 100).cast("bigint").alias("min_value"),
        F.floor(F.max("value") * 100).cast("bigint").alias("max_value"),
    )
    rows = []
    for c in ("event_id", "user_id", "event_type", "value"):
        rows.append(
            F.struct(
                F.lit(c).alias("col"),
                F.col("n_rows").cast("bigint").alias("n_rows"),
                (F.col("n_rows") - F.col(f"nn_{c}")).cast("bigint").alias("n_null"),
                F.col(f"nd_{c}").cast("bigint").alias("n_distinct"),
                F.col(f"min_{c}").cast("string").alias("min_val"),
                F.col(f"max_{c}").cast("string").alias("max_val"),
            )
        )
    return agg.select(F.explode(F.array(*rows)).alias("p")).select("p.*")


# ---------------------------------------------------------------------------
# Z-order layout evaluation — the data-layout decision instrument.
# A 100 TB table is pruned at scan time by file-level min/max column
# statistics; how much gets pruned is decided ENTIRELY by which rows
# share a file. Sorting by one key makes that key's point queries
# touch one file and every other key's touch all files; interleaving
# the keys' bits (Z-order / Morton order) buys bounded pruning on BOTH.

ZO_BITS = 4  # bits per dimension -> 16 buckets per dim
ZO_FILES = 16  # simulated file count (z range 0..255 / 16)


def _zorder_sql(a: str = "ub", b: str = "hb") -> str:
    """Morton interleave of two ZO_BITS-bit values — ``a`` on odd bits,
    ``b`` on even. Pure arithmetic (floor-div + mod), identical SQL
    text in Spark (F.expr) and DuckDB."""
    terms = []
    for i in range(ZO_BITS):
        terms.append(f"(CAST(floor({a} / {2 ** i}) AS BIGINT) % 2) * {2 ** (2 * i + 1)}")
        terms.append(f"(CAST(floor({b} / {2 ** i}) AS BIGINT) % 2) * {2 ** (2 * i)}")
    return "(" + " + ".join(terms) + ")"


def _zorder_oracle() -> str:
    return f"""
    WITH e AS (
        SELECT user_id % 16 AS ub, hour(ts) % 16 AS hb FROM events
    ),
    z AS (SELECT ub, hb, {_zorder_sql()} AS z FROM e),
    spans AS (
        SELECT 'zorder' AS layout, CAST(floor(z / {ZO_FILES}) AS BIGINT) AS f,
               min(ub) AS umin, max(ub) AS umax,
               min(hb) AS hmin, max(hb) AS hmax
        FROM z GROUP BY CAST(floor(z / {ZO_FILES}) AS BIGINT)
        UNION ALL
        SELECT 'linear', CAST(ub AS BIGINT),
               min(ub), max(ub), min(hb), max(hb)
        FROM z GROUP BY CAST(ub AS BIGINT)
    ),
    probes AS (SELECT unnest(range(16)) AS v),
    per AS (
        SELECT layout, 'user' AS dim, v,
               sum(CASE WHEN v BETWEEN umin AND umax THEN 1 ELSE 0 END) AS files
        FROM spans CROSS JOIN probes GROUP BY layout, v
        UNION ALL
        SELECT layout, 'hour', v,
               sum(CASE WHEN v BETWEEN hmin AND hmax THEN 1 ELSE 0 END)
        FROM spans CROSS JOIN probes GROUP BY layout, v
    )
    SELECT layout, dim,
           floor(avg(files) * 1000000) / 1000000 AS avg_files,
           CAST(max(files) AS BIGINT) AS max_files,
           CAST({ZO_FILES} AS BIGINT) AS n_files
    FROM per GROUP BY layout, dim
    """


@query("q_layout_zorder", oracle=_zorder_oracle())
def q_layout_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-ORDER LAYOUT EVALUATION: compute the Morton-interleaved
    clustering key over two query dimensions (user bucket, hour
    bucket) and MEASURE what each layout buys at scan time — for every
    point probe on each dimension, how many of the 16 simulated files'
    [min, max] spans must be read. Emits 4 rows: (layout ∈ {linear,
    zorder} × dim ∈ {user, hour}) with avg/max files scanned. On this
    fixture the linear (user-sorted) layout reads 1 file for user
    probes and ALL files for hour probes; Z-order reads a small
    bounded number for BOTH — the measured argument for multi-
    dimensional clustering (Delta/Iceberg OPTIMIZE ZORDER) over
    single-key sorting when a 100 TB table serves more than one
    predicate shape.

    Scale shape: one events scan projects (ub, hb, z) — the interleave
    is pure codegen arithmetic (floor-div/mod per bit; no UDF) — then
    two 16-row aggregations (the per-file span tables ARE what a
    parquet footer / Delta stats file stores) and a 32×16 probe cross
    join over model-sized frames. At 100 TB the same z expression
    feeds repartitionByRange(z) before the write, and this query's
    span tables become the table's file-statistics relation; the
    avg_files column is the expected scan fan-in a planner derives
    from those stats."""
    e = load(spark, sf_dir, "events").select(
        F.expr("user_id % 16").alias("ub"), F.expr("hour(ts) % 16").alias("hb")
    )
    z = e.withColumn("z", F.expr(_zorder_sql()))
    span_cols = [
        F.min("ub").alias("umin"),
        F.max("ub").alias("umax"),
        F.min("hb").alias("hmin"),
        F.max("hb").alias("hmax"),
    ]
    spans = (
        z.groupBy(F.expr(f"CAST(floor(z / {ZO_FILES}) AS BIGINT)").alias("f"))
        .agg(*span_cols)
        .withColumn("layout", F.lit("zorder"))
        .unionByName(
            z.groupBy(F.col("ub").cast("bigint").alias("f"))
            .agg(*span_cols)
            .withColumn("layout", F.lit("linear"))
        )
    )
    probes = spark.range(16).select(F.col("id").cast("bigint").alias("v"))
    crossed = spans.crossJoin(F.broadcast(probes))

    def per_dim(dim: str, lo: str, hi: str) -> DataFrame:
        return (
            crossed.groupBy("layout", "v")
            .agg(
                F.sum(
                    F.when(
                        (F.col("v") >= F.col(lo)) & (F.col("v") <= F.col(hi)), 1
                    ).otherwise(0)
                ).alias("files")
            )
            .withColumn("dim", F.lit(dim))
        )

    per = per_dim("user", "umin", "umax").unionByName(per_dim("hour", "hmin", "hmax"))
    from distributed_causal_stream_processing_spark.operators.text import floor6

    return per.groupBy("layout", "dim").agg(
        floor6(F.avg("files")).alias("avg_files"),
        F.max("files").cast("bigint").alias("max_files"),
        F.lit(ZO_FILES).cast("bigint").alias("n_files"),
    )
