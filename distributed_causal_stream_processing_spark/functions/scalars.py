"""Scalar function families (SURVEY §2.8).

All built-in `pyspark.sql.functions` — JVM-side, whole-stage-codegen'd;
no Python in the hot path. Engine-convention divergences vs the DuckDB
oracle are normalized inside the queries (documented per query):
dayofweek origin, floor/length return types, double→string formatting
(avoided), json extraction types.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_causal_stream_processing_spark.io import load
from distributed_causal_stream_processing_spark.plans.registry import query


@query(
    "q_str_funcs",
    oracle="""
    SELECT c_custkey,
           upper(c_name) AS name_upper,
           lower(c_mktsegment) AS seg_lower,
           substring(c_name, 10, 9) AS custno,
           trim(concat('  ', c_name, '  ')) AS trimmed,
           CAST(length(c_name) AS INTEGER) AS name_len,
           regexp_extract(c_name, '([0-9]+)', 1) AS digits,
           regexp_replace(c_name, '[0-9]', '#', 'g') AS masked,
           lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
           string_split(c_name, '#')[1] AS prefix
    FROM customer
    """,
)
def q_str_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: upper/lower/substring/trim/concat/length/regex/lpad/split.

    substring is 1-based in both engines; length → INT on both sides
    (DuckDB's BIGINT cast down); split index: Spark getItem(0) ==
    DuckDB 1-based [1].
    """
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.substring("c_name", 10, 9).alias("custno"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit("  "))).alias("trimmed"),
        F.length("c_name").cast("int").alias("name_len"),
        F.regexp_extract("c_name", r"([0-9]+)", 1).alias("digits"),
        F.regexp_replace("c_name", r"[0-9]", "#").alias("masked"),
        F.lpad(F.col("c_custkey").cast("string"), 8, "0").alias("padded"),
        F.split("c_name", "#").getItem(0).alias("prefix"),
    )


@query(
    "q_date_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           CAST(year(l_shipdate) AS INTEGER)  AS ship_year,
           CAST(month(l_shipdate) AS INTEGER) AS ship_month,
           CAST(day(l_shipdate) AS INTEGER)   AS ship_day,
           CAST(dayofweek(l_shipdate) AS INTEGER) AS ship_dow,
           CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS ship_month_start,
           CAST(l_shipdate AS DATE) + 30 AS ship_plus_30,
           CAST(datediff('day', TIMESTAMP '1995-01-01 00:00:00', l_shipdate)
                AS INTEGER) AS days_since_95,
           CAST(extract(quarter FROM l_shipdate) AS INTEGER) AS ship_quarter
    FROM lineitem
    WHERE l_orderkey < 200
    """,
)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family. Convention note: Spark dayofweek is 1=Sunday,
    DuckDB dayofweek is 0=Sunday → Spark side subtracts 1."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 200)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.year("l_shipdate").alias("ship_year"),
        F.month("l_shipdate").alias("ship_month"),
        F.dayofmonth("l_shipdate").alias("ship_day"),
        (F.dayofweek("l_shipdate") - 1).alias("ship_dow"),
        F.date_trunc("month", "l_shipdate").alias("ship_month_start"),
        F.date_add(F.col("l_shipdate").cast("date"), 30).alias("ship_plus_30"),
        F.datediff(F.col("l_shipdate"), F.lit("1995-01-01").cast("timestamp")).alias(
            "days_since_95"
        ),
        F.quarter("l_shipdate").alias("ship_quarter"),
    )


@query(
    "q_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice, 1) AS price_r1,
           CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
           CAST(ceil(l_extendedprice) AS BIGINT)  AS price_ceil,
           round(abs(l_discount - 0.05), 4) AS disc_dev,
           round(pow(l_quantity, 2), 2) AS qty_sq,
           round(sqrt(l_extendedprice), 4) AS price_sqrt,
           round(ln(l_extendedprice + 1), 6) AS price_ln,
           round(log10(l_extendedprice + 1), 6) AS price_log10,
           CAST(l_orderkey % 7 AS BIGINT) AS key_mod7,
           CAST(sign(l_discount - 0.05) AS INTEGER) AS disc_sign
    FROM lineitem
    WHERE l_orderkey < 500
    """,
)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family. floor/ceil → BIGINT on both sides; pmod on
    non-negative operands ≡ %; sign normalized to INT."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 500)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_r1"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.round(F.abs(F.col("l_discount") - 0.05), 4).alias("disc_dev"),
        F.round(F.pow("l_quantity", F.lit(2)), 2).alias("qty_sq"),
        F.round(F.sqrt("l_extendedprice"), 4).alias("price_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1), 6).alias("price_ln"),
        F.round(F.log10(F.col("l_extendedprice") + 1), 6).alias("price_log10"),
        F.pmod(F.col("l_orderkey"), F.lit(7)).cast("bigint").alias("key_mod7"),
        F.signum(F.col("l_discount") - 0.05).cast("int").alias("disc_sign"),
    )


@query(
    "q_cond_funcs",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_totalprice > 300000 THEN 'big'
                WHEN o_totalprice > 150000 THEN 'mid'
                ELSE 'small' END AS size_class,
           coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_norm,
           round(greatest(o_totalprice, 100000.0), 2) AS price_floor100k,
           round(least(o_totalprice, 400000.0), 2) AS price_cap400k
    FROM orders
    """,
)
def q_cond_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditionals: CASE WHEN / coalesce / nullif / greatest / least."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") > 300000, "big")
        .when(F.col("o_totalprice") > 150000, "mid")
        .otherwise("small")
        .alias("size_class"),
        F.coalesce(F.nullif(F.col("o_orderstatus"), F.lit("P")), F.lit("PENDING")).alias(
            "status_norm"
        ),
        F.round(F.greatest("o_totalprice", F.lit(100000.0)), 2).alias("price_floor100k"),
        F.round(F.least("o_totalprice", F.lit(400000.0)), 2).alias("price_cap400k"),
    )


@query(
    "q_cast_types",
    oracle="""
    SELECT o_orderkey,
           CAST(o_orderkey AS DOUBLE) AS key_dbl,
           CAST(CAST(o_orderkey AS VARCHAR) AS BIGINT) AS key_roundtrip,
           CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) AS price_dec,
           CAST(floor(o_totalprice) AS INTEGER) AS price_int,
           CAST(o_orderdate AS DATE) AS order_date,
           CAST(substring(o_orderpriority, 1, 1) AS INTEGER) AS prio_num
    FROM orders
    """,
)
def q_cast_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Casts int↔double↔string↔date↔decimal(12,2)→string.

    double→string is deliberately absent: Java vs DuckDB float
    formatting differs (scientific-notation thresholds); all other
    directions are exact. The decimal cast is surfaced as its string
    rendering ('205941.60', trailing zeros kept): a raw DecimalType
    column arrives as decimal.Decimal from Spark but float64 from
    DuckDB's pandas bridge, which can never value-hash equal
    (root cause of the round-2 q_cast_types hash miss).
    """
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.col("o_orderkey").cast("double").alias("key_dbl"),
        F.col("o_orderkey").cast("string").cast("bigint").alias("key_roundtrip"),
        F.col("o_totalprice").cast("decimal(12,2)").cast("string").alias("price_dec"),
        F.floor("o_totalprice").cast("int").alias("price_int"),
        F.col("o_orderdate").cast("date").alias("order_date"),
        F.substring("o_orderpriority", 1, 1).cast("int").alias("prio_num"),
    )


@query(
    "q_array_funcs",
    oracle="""
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens,
           list_contains(string_split(text, ' '), 'spark') AS has_spark,
           list_sort(string_split(text, ' '))[1] AS first_token,
           array_to_string(list_sort(list_distinct(string_split(text, ' '))), ',')
               AS vocab
    FROM documents
    WHERE doc_id < 50
    """,
)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array family: split/size/contains/sort/distinct/element_at/join."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    toks = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(toks).cast("int").alias("n_tokens"),
        F.array_contains(toks, "spark").alias("has_spark"),
        F.element_at(F.sort_array(toks), 1).alias("first_token"),
        F.array_join(F.sort_array(F.array_distinct(toks)), ",").alias("vocab"),
    )


@query(
    "q_json_funcs",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_value,
           CASE WHEN CAST(json_extract_string(props, '$.k') AS INTEGER) >= 50
                THEN 'high' ELSE 'low' END AS k_class
    FROM events
    """,
)
def q_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from the events.props payload column.

    Parses ``props`` exactly once with ``from_json`` + explicit schema and
    projects both outputs from the struct — ``get_json_object`` referenced
    by two expressions re-parses the payload per reference (measured 4.3 s
    vs ~0.5 s at sf0.1 for 100 k rows)."""
    e = load(spark, sf_dir, "events")
    k = F.from_json("props", "k INT")["k"]
    return e.select(
        "event_id",
        k.alias("k_value"),
        F.when(k >= 50, "high").otherwise("low").alias("k_class"),
    )


@query(
    "q_map_funcs",
    oracle="""
    SELECT event_id,
           map([event_type], [round(value, 2)])[event_type][1] AS mapped_value,
           array_to_string(map_keys(map([event_type], [value])), ',') AS keys_str
    FROM events
    WHERE event_id < 100
    """,
)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map construction + element_at + map_keys, reduced to scalar output
    so hashes compare across engines' different map literals."""
    e = load(spark, sf_dir, "events").filter(F.col("event_id") < 100)
    m = F.create_map(F.col("event_type"), F.round("value", 2))
    return e.select(
        "event_id",
        F.element_at(m, F.col("event_type")).alias("mapped_value"),
        F.array_join(F.map_keys(F.create_map(F.col("event_type"), F.col("value"))), ",").alias(
            "keys_str"
        ),
    )


# Deterministic nested-JSON payload built from event columns — the
# fixture's props is flat ({"k": N}), so the semi-structured depth the
# variant path must handle is constructed identically on both engines.
_NESTED_JSON_SQL = """
    concat('{"k": ', get_json_object(props, '$.k'),
           ', "meta": {"user": ', CAST(user_id AS STRING),
           ', "flags": ["', event_type, '"]}}')
"""


@query(
    "q_json_variant",
    oracle="""
    WITH j AS (
        SELECT event_id,
               concat('{"k": ', json_extract_string(props, '$.k'),
                      ', "meta": {"user": ', CAST(user_id AS VARCHAR),
                      ', "flags": ["', event_type, '"]}}') AS payload
        FROM events WHERE event_id < 1000
    )
    SELECT event_id,
           CAST(json_extract(payload, '$.k') AS INTEGER) AS k,
           CAST(json_extract(payload, '$.meta.user') AS BIGINT) AS meta_user,
           json_extract_string(payload, '$.meta.flags[0]') AS first_flag,
           CAST(json_array_length(json_extract(payload, '$.meta.flags'))
                AS INTEGER) AS n_flags
    FROM j
    """,
)
def q_json_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured data on Spark 4's VARIANT type: the JSON payload
    is parsed ONCE with parse_json into a binary variant, then typed
    paths are extracted with variant_get — the open-schema ingestion
    path (parse once at the edge, bind types at query time) that
    replaces per-path get_json_object string re-parsing, with nested
    objects and arrays traversed natively.

    Scale shape: pure per-row JVM expressions, no shuffle; the variant
    encoding is columnar-friendly binary (shreddable at write in table
    formats), so repeated path extraction costs no re-parse — the same
    reason q_json_funcs moved from get_json_object to one from_json,
    generalized to schema-on-read. The DuckDB oracle runs its native
    JSON path functions over the identical payload."""
    e = load(spark, sf_dir, "events").filter(F.col("event_id") < 1000)
    v = F.parse_json(F.expr(_NESTED_JSON_SQL.strip()))
    payload = e.select("event_id", v.alias("v"))
    return payload.select(
        "event_id",
        F.variant_get("v", "$.k", "int").alias("k"),
        F.variant_get("v", "$.meta.user", "bigint").alias("meta_user"),
        F.variant_get("v", "$.meta.flags[0]", "string").alias("first_flag"),
        F.size(F.variant_get("v", "$.meta.flags", "array<string>")).cast("int").alias(
            "n_flags"
        ),
    )


@query(
    "q_array_higher_order",
    oracle="""
    SELECT vec_id,
           CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos,
           round(list_sum(list_transform(CAST(embedding AS DOUBLE[]),
                                         x -> x * x)), 5) AS sumsq,
           len(list_filter(CAST(embedding AS DOUBLE[]),
                           x -> abs(x) > 0.4)) > 0 AS has_large
    FROM embeddings
    """,
)
def q_array_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lambda higher-order array functions — transform / filter /
    aggregate / exists — the codegen'd per-element surface q_array_funcs
    (split/size/contains/sort/explode) does not touch. Runs over the
    embedding vectors: positive-component count, sum of squares (the
    fold both engines evaluate LEFT-TO-RIGHT in array order, so the
    float sum is bit-identical and the 5 dp round is cosmetic), and an
    any-large-component existence probe. No explode anywhere: each
    lambda runs inside the row, so the operator is shuffle-free."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("emb")
    )
    return e.select(
        "vec_id",
        F.size(F.filter("emb", lambda x: x > 0)).cast("bigint").alias("n_pos"),
        F.round(
            F.aggregate("emb", F.lit(0.0), lambda acc, x: acc + x * x), 5
        ).alias("sumsq"),
        F.exists("emb", lambda x: F.abs(x) > 0.4).alias("has_large"),
    )


@query(
    "q_explode_outer",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), t -> length(t) > 6) AS long_toks
        FROM documents WHERE doc_id < 50
    )
    SELECT d.doc_id, u.tok
    FROM toks d
    LEFT JOIN LATERAL (SELECT unnest(d.long_toks) AS tok) u ON TRUE
    """,
)
def q_explode_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-preserving generation: ``explode_outer`` keeps a row (with
    NULL) for documents whose filtered token array is EMPTY, where
    plain explode silently drops the document — the left-join-shaped
    generator semantics an audit/coverage query needs (every input row
    accounted for in the output). The oracle is DuckDB's equivalent
    LEFT JOIN LATERAL UNNEST."""
    d = (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 50)
        .select(
            "doc_id",
            F.filter(
                F.split("text", " "), lambda t: F.length(t) > 6
            ).alias("long_toks"),
        )
    )
    return d.select("doc_id", F.explode_outer("long_toks").alias("tok"))


@query(
    "q_try_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           TRY_CAST(l_returnflag AS INTEGER) AS flag_as_int,
           TRY_CAST(CAST(l_quantity AS VARCHAR) AS DOUBLE) AS qty_roundtrip,
           CAST(floor(l_extendedprice / NULLIF(l_quantity - l_quantity, 0) * 100)
                AS BIGINT) AS div_by_zero_cents,
           CAST(floor(l_extendedprice / NULLIF(l_quantity, 0) * 100) AS BIGINT)
               AS unit_price_cents
    FROM lineitem
    WHERE l_orderkey < 200
    """,
)
def q_try_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe error-to-NULL surface: under Spark 4's default ANSI
    mode a bad cast or division by zero is a hard runtime ERROR that
    kills the job — ``try_cast`` / ``try_divide`` convert exactly those
    rows to NULL instead, which is what a 100 TB ingest wants (quarantine
    the malformed row, not abort the 1000-executor stage). The oracle
    expresses the same semantics with DuckDB's TRY_CAST and
    NULLIF-guarded division. flag_as_int is NULL for every row ('A', 'N',
    'R' never parse), div_by_zero is NULL for every row, the round-trip
    cast and guarded unit price succeed — both the failing and the
    succeeding paths are value-checked."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 200)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_returnflag").try_cast("int").alias("flag_as_int"),
        F.col("l_quantity").cast("string").try_cast("double").alias("qty_roundtrip"),
        # floor-scaled cents, not round(x, 2): unit prices are exact
        # rationals that land on the half-grid constantly, where Spark
        # and DuckDB round() disagree (SURVEY §7.4 round-half lesson)
        F.floor(
            F.try_divide("l_extendedprice", F.col("l_quantity") - F.col("l_quantity"))
            * 100
        ).cast("bigint").alias("div_by_zero_cents"),
        F.floor(F.try_divide("l_extendedprice", "l_quantity") * 100)
        .cast("bigint")
        .alias("unit_price_cents"),
    )


@query(
    "q_regex_extract_all",
    oracle="""
    SELECT doc_id,
           array_to_string(regexp_extract_all(text, '[a-z]*o[a-z]*'), ',')
               AS o_words,
           CAST(len(regexp_extract_all(text, '[a-z]*o[a-z]*')) AS BIGINT)
               AS n_matches
    FROM documents WHERE doc_id < 100
    """,
)
def q_regex_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array-returning regex: ALL non-overlapping matches per document
    (vs q_str_funcs' single-match regexp_extract) — the pattern-mining
    primitive behind PII sweeps and template extraction. Both engines
    scan left-to-right greedy non-overlapping, so the match arrays are
    identical; joined to one string for a hash-stable scalar."""
    return (
        load(spark, sf_dir, "documents")
        .filter(F.col("doc_id") < 100)
        .select(
            "doc_id",
            F.array_join(
                F.regexp_extract_all("text", F.lit("[a-z]*o[a-z]*"), 0), ","
            ).alias("o_words"),
            F.size(F.regexp_extract_all("text", F.lit("[a-z]*o[a-z]*"), 0))
            .cast("bigint")
            .alias("n_matches"),
        )
    )


@query(
    "q_histogram_2d",
    oracle="""
    SELECT CAST(hour(CAST(ts AS TIMESTAMP)) AS BIGINT) AS hr,
           CAST(CASE WHEN value < 0 THEN 0
                     WHEN value >= 100 THEN 5
                     ELSE floor(value / 25) + 1 END AS BIGINT) AS val_bucket,
           CAST(count(*) AS BIGINT) AS n
    FROM events
    GROUP BY 1, 2
    """,
)
def q_histogram_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D profiling histogram: hour-of-day × value-quartile-bucket
    counts via ``width_bucket`` (below-range → 0, above → n+1, bounds
    half-open per bucket; DuckDB 1.0 lacks the function, so the oracle
    spells the same semantics with floor arithmetic — equal-width
    buckets on [0,100) divide exactly by 25, so the float paths
    agree). One hash aggregate over 24×6 cells —
    the load-heatmap every ops dashboard draws, map-side combined."""
    e = load(spark, sf_dir, "events")
    return (
        e.select(
            F.hour("ts").cast("bigint").alias("hr"),
            F.width_bucket("value", F.lit(0.0), F.lit(100.0), F.lit(4))
            .cast("bigint")
            .alias("val_bucket"),
        )
        .groupBy("hr", "val_bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
