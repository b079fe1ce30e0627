"""Window-function operators (SURVEY §2.5).

Scale notes (100 TB): a window partitioned by a key shuffles once on
that key and sorts within partitions — same cost shape as a groupBy,
plus the sort. Skewed window keys are the hazard (one giant user);
AQE does not split window skew, so at real scale the per-key windows in
§2.9 would bound partition size by time-bucketing the key first. All
orderings here carry a unique tie-break key (SURVEY §7.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from distributed_causal_stream_processing_spark.io import load
from distributed_causal_stream_processing_spark.plans.registry import query


@query(
    "q_win_rank",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(o_totalprice, 2) AS o_totalprice,
           CAST(row_number() OVER w AS BIGINT) AS rn,
           CAST(rank()       OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def q_win_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number / rank / dense_rank per customer, tie-broken by orderkey."""
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round("o_totalprice", 2).alias("o_totalprice"),
        F.row_number().over(w).cast("bigint").alias("rn"),
        F.rank().over(w).cast("bigint").alias("rnk"),
        F.dense_rank().over(w).cast("bigint").alias("drnk"),
    )


@query(
    "q_win_analytic",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(lag(o_totalprice)  OVER w, 2) AS prev_price,
           round(lead(o_totalprice) OVER w, 2) AS next_price,
           round(first_value(o_totalprice) OVER w, 2) AS first_price,
           round(last_value(o_totalprice)
                 OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2)
               AS last_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def q_win_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/first_value/last_value (last over the full frame)."""
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.lag("o_totalprice").over(w), 2).alias("prev_price"),
        F.round(F.lead("o_totalprice").over(w), 2).alias("next_price"),
        F.round(F.first("o_totalprice").over(w), 2).alias("first_price"),
        F.round(F.last("o_totalprice").over(wfull), 2).alias("last_price"),
    )


@query(
    "q_win_frame_rows",
    oracle="""
    SELECT o_custkey, o_orderkey,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total,
           round(avg(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg3
    FROM orders
    """,
)
def q_win_frame_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum + 3-row moving average (ROWS frames)."""
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.sum("o_totalprice").over(w.rowsBetween(W.unboundedPreceding, 0)), 2).alias(
            "running_total"
        ),
        # 4 dp: a 2-row frame's true avg is a multiple of 0.005 — ON the
        # 2dp half-boundary — so round at a finer grid where it's exact.
        F.round(F.avg("o_totalprice").over(w.rowsBetween(-2, 0)), 4).alias("moving_avg3"),
    )


@query(
    "q_win_frame_range",
    oracle="""
    SELECT p_partkey, p_size,
           CAST(count(*) OVER (
               ORDER BY p_size
               RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS BIGINT) AS n_similar_size
    FROM part
    """,
)
def q_win_frame_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based RANGE frame: parts within ±2 of each size —
    WITHOUT the naive unpartitioned RANGE window (which moves the whole
    table to one task, the q_win_dist trap with a frame attached).

    A RANGE count frame depends only on the ORDER value, so it
    aggregates: per-size counts (one row per distinct size), a
    broadcast band self-join sums each size's ±2 neighborhood over
    that tiny table, and a broadcast join fans the result back onto
    the rows. Frame semantics survive because every row with the same
    p_size has the same frame. Oracle unchanged — hash match proves
    the rewrite."""
    p = load(spark, sf_dir, "part")
    sizes = p.groupBy("p_size").agg(F.count(F.lit(1)).alias("n"))
    near = (
        sizes.alias("a")
        .join(
            F.broadcast(sizes.alias("b")),
            (F.col("b.p_size") >= F.col("a.p_size") - 2)
            & (F.col("b.p_size") <= F.col("a.p_size") + 2),
        )
        .groupBy(F.col("a.p_size").alias("p_size"))
        .agg(F.sum("b.n").cast("bigint").alias("n_similar_size"))
    )
    return p.select("p_partkey", "p_size").join(F.broadcast(near), ["p_size"]).select(
        "p_partkey", "p_size", "n_similar_size"
    )


@query(
    "q_win_dist",
    oracle="""
    SELECT o_orderkey,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume
    FROM orders
    WINDOW w AS (ORDER BY o_totalprice, o_orderkey)
    """,
)
def q_win_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution functions: ntile / percent_rank / cume_dist —
    WITHOUT a global single-partition window (VERDICT r07 item 3).

    The naive `W.orderBy(...)` with no partitionBy moves every row to
    ONE task ("No Partition Defined for Window" warning) — correct at
    sf0.1, a scale-killer at 100 TB. This is the global analogue of
    causal_sequence_skewsafe's two-level construction:

    1. value-bucket the leading sort key into fixed-width bands (at
       100 TB the band boundaries would come from approxQuantile
       sampling, exactly like Spark's own RangePartitioner — the band
       column only affects task sizing, never results);
    2. per-band counts (one row per band) → exclusive prefix sums via
       a broadcast theta self-join over that tiny table, so NO
       unpartitioned window exists anywhere in the plan;
    3. global row number = band offset + within-band row_number; the
       order keys end in the unique o_orderkey, so rank == row_number
       (tie-free) and the distribution functions are closed forms:
       percent_rank = (rn-1)/(N-1), cume_dist = rn/N, and ntile(k)
       gives the first (N mod k) tiles ceil(N/k) rows (the SQL-standard
       split Spark and DuckDB both implement).

    The oracle is still the plain global-window SQL — the value-hash
    match proves the construction equivalent.
    """
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    band = F.floor(F.col("o_totalprice") / F.lit(25_000.0)).cast("long")
    b = o.withColumn("band", band)
    w_in = W.partitionBy("band").orderBy("o_totalprice", "o_orderkey")
    within = b.withColumn("within", F.row_number().over(w_in))
    counts = b.groupBy("band").agg(F.count(F.lit(1)).alias("n"))
    offsets = (
        counts.alias("a")
        .join(
            F.broadcast(counts.alias("p")),
            F.col("p.band") < F.col("a.band"),
            "left",
        )
        .groupBy(F.col("a.band").alias("band"))
        .agg(F.coalesce(F.sum("p.n"), F.lit(0)).alias("off"))
    )
    total = counts.agg(F.sum("n").cast("bigint").alias("n_total"))
    ranked = (
        within.join(F.broadcast(offsets), "band")
        .withColumn("rn", (F.col("within") + F.col("off")).cast("bigint"))
        .crossJoin(F.broadcast(total))
    )
    k = 4
    q = F.floor(F.col("n_total") / k)
    r = F.col("n_total") % k
    big = r * (q + 1)  # rows living in the (N mod k) larger tiles
    tile = F.when(
        F.col("rn") <= big, F.floor((F.col("rn") - 1) / (q + 1)) + 1
    ).otherwise(r + F.floor((F.col("rn") - big - 1) / q) + 1)
    return ranked.select(
        "o_orderkey",
        tile.cast("bigint").alias("quartile"),
        F.round(
            F.when(
                F.col("n_total") > 1,
                (F.col("rn") - 1) / (F.col("n_total") - 1),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("pct_rank"),
        F.round(F.col("rn") / F.col("n_total"), 6).alias("cume"),
    )


@query(
    "q_win_trailing_interval",
    oracle="""
    SELECT event_id, user_id,
           CAST(count(*) OVER (
               PARTITION BY user_id
               ORDER BY epoch_us
               RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS n_last_hour
    FROM (
        SELECT event_id, user_id,
               CAST(epoch_us(CAST(date_trunc('microsecond', ts) AS TIMESTAMP))
                    AS BIGINT) AS epoch_us
        FROM events
    )
    """,
)
def q_win_trailing_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 1-hour event count per user — a time-interval RANGE
    frame, the time-series workhorse (rate limiting, rolling activity).
    Expressed over epoch microseconds so the frame bound is a plain
    number in both engines (DuckDB RANGE over INTERVAL and Spark
    rangeBetween agree once the axis is numeric)."""
    e = load(spark, sf_dir, "events").select(
        "event_id", "user_id", (F.unix_micros("ts")).alias("epoch_us")
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("epoch_us")
        .rangeBetween(-3_600_000_000, W.currentRow)
    )
    return e.select(
        "event_id", "user_id", F.count(F.lit(1)).over(w).alias("n_last_hour")
    )


@query(
    "q_agg_stringagg",
    oracle="""
    SELECT l_returnflag,
           string_agg(DISTINCT l_linestatus, ',' ORDER BY l_linestatus) AS statuses,
           CAST(count(DISTINCT l_linestatus) AS BIGINT) AS n_statuses
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q_agg_stringagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sorted string aggregation (listagg): distinct statuses per flag,
    comma-joined in sorted order — sort_array(collect_set) makes the
    concatenation deterministic under any partitioning."""
    li = load(spark, sf_dir, "lineitem")
    statuses = F.sort_array(F.collect_set("l_linestatus"))
    return li.groupBy("l_returnflag").agg(
        F.array_join(statuses, ",").alias("statuses"),
        F.size(statuses).cast("bigint").alias("n_statuses"),
    )


@query(
    "q_event_funnel",
    oracle="""
    WITH ev AS (
        SELECT user_id, event_type,
               CAST(epoch_us(CAST(date_trunc('microsecond', ts) AS TIMESTAMP))
                    AS BIGINT) AS us
        FROM events
    ),
    s1 AS (
        SELECT user_id, min(us) AS t1 FROM ev
        WHERE event_type = 'signup' GROUP BY user_id
    ),
    s2 AS (
        SELECT ev.user_id, min(us) AS t2
        FROM ev JOIN s1 USING (user_id)
        WHERE event_type = 'click' AND us > t1
        GROUP BY ev.user_id
    ),
    s3 AS (
        SELECT ev.user_id, min(us) AS t3
        FROM ev JOIN s2 USING (user_id)
        WHERE event_type = 'purchase' AND us > t2
        GROUP BY ev.user_id
    )
    SELECT stage, n_users FROM (
        SELECT 'signup' AS stage, CAST(count(*) AS BIGINT) AS n_users, 1 AS o FROM s1
        UNION ALL
        SELECT 'click_after_signup', CAST(count(*) AS BIGINT), 2 FROM s2
        UNION ALL
        SELECT 'purchase_after_click', CAST(count(*) AS BIGINT), 3 FROM s3
    )
    """,
)
def q_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel: signup → first later click → first
    later purchase, counting users surviving each stage. The
    happened-before chaining (each stage's timestamp must exceed the
    previous stage's) is the reference's causal-ordering concept
    applied to product analytics.

    Scale: three hash-aggregations keyed on user_id with the
    events scan filtered per stage; every join is user_id-equi
    (shuffle- or bucket-alignable), each stage's output is one row
    per surviving user — monotonically shrinking, never event-grained.
    """
    ev = load(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    s1 = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("us").alias("t1"))
    )
    s2 = (
        ev.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("us") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t2"))
    )
    s3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(s2, "user_id")
        .filter(F.col("us") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("us").alias("t3"))
    )
    def stage(df, name):
        return df.agg(
            F.lit(name).alias("stage"), F.count(F.lit(1)).alias("n_users")
        )
    return (
        stage(s1, "signup")
        .unionByName(stage(s2, "click_after_signup"))
        .unionByName(stage(s3, "purchase_after_click"))
    )


def sessionize(df: DataFrame, key: str, ts_us: str, gap_us: int) -> DataFrame:
    """Gaps-and-islands sessionization over integer-µs timestamps:
    split each key's event stream into sessions at inactivity gaps
    STRICTLY GREATER than ``gap_us``; one row per session with
    (key, session_start_us, n_events, duration_us).

    One shuffle on the key serves the lag pass, the running-sum pass,
    and the final per-session aggregation (same partitioning — no
    re-exchange). Hypothesis-tested against a brute-force reference in
    tests/test_properties.py; equal-timestamp events always share a
    session, so ties cannot destabilize the output."""
    w = W.partitionBy(key).orderBy(ts_us)
    flagged = df.withColumn(
        "new_sess",
        F.when(
            (F.col(ts_us) - F.lag(ts_us).over(w) > gap_us)
            | F.lag(ts_us).over(w).isNull(),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn(
        "sid", F.sum("new_sess").over(w.rowsBetween(W.unboundedPreceding, 0))
    )
    return (
        sess.groupBy(key, "sid")
        .agg(
            F.min(ts_us).alias("session_start_us"),
            F.count(F.lit(1)).alias("n_events"),
            (F.max(ts_us) - F.min(ts_us)).alias("duration_us"),
        )
        .drop("sid")
    )


@query(
    "q_sessionize",
    oracle="""
    WITH ev AS (
        SELECT user_id,
               CAST(epoch_us(CAST(date_trunc('microsecond', ts) AS TIMESTAMP))
                    AS BIGINT) AS us
        FROM events
    ),
    flagged AS (
        SELECT user_id, us,
               CASE WHEN us - lag(us) OVER w > 14400000000
                         OR lag(us) OVER w IS NULL
                    THEN 1 ELSE 0 END AS new_sess
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY us)
    ),
    sess AS (
        SELECT user_id, us,
               sum(new_sess) OVER (PARTITION BY user_id ORDER BY us) AS sid
        FROM flagged
    )
    SELECT user_id,
           min(us) AS session_start_us,
           CAST(count(*) AS BIGINT) AS n_events,
           max(us) - min(us) AS duration_us
    FROM sess
    GROUP BY user_id, sid
    """,
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (gaps-and-islands): split each user's event
    stream into sessions at >4h inactivity gaps, one output row per
    session with its start, event count, and duration. The batch twin
    of q_stream_session's session_window.

    Scale: one shuffle on user_id serves both window passes AND the
    final agg (same partitioning → no re-exchange); within a partition
    it's lag + running sum over a single sort. Timestamps stay integer
    µs end-to-end — no float drift to break oracle parity. Skew note:
    a pathological single user is bounded by time-bucketing the
    partition key first (see module docstring)."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("us")
    )
    return sessionize(ev, key="user_id", ts_us="us", gap_us=4 * 3600 * 1_000_000)


@query(
    "q_topk_per_group",
    oracle="""
    SELECT c_mktsegment, c_custkey, round(c_acctbal, 2) AS c_acctbal,
           CAST(rn AS BIGINT) AS rn
    FROM (
        SELECT c_mktsegment, c_custkey, c_acctbal,
               row_number() OVER (PARTITION BY c_mktsegment
                                  ORDER BY c_acctbal DESC, c_custkey) AS rn
        FROM customer
    )
    WHERE rn <= 3
    """,
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers by balance per market segment — the per-group
    twin of q_topk's global TakeOrderedAndProject. Scale: one shuffle
    on the group key; Spark inserts a WindowGroupLimit before the
    shuffle (rank-based filter pushdown), so each map task forwards at
    most k rows per group instead of its whole partition — the window
    analogue of a partial aggregation."""
    c = load(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "c_mktsegment",
            "c_custkey",
            F.round("c_acctbal", 2).alias("c_acctbal"),
            F.col("rn").cast("bigint").alias("rn"),
        )
    )


@query(
    "q_win_share",
    oracle="""
    WITH rev AS (
        SELECT n.n_name AS nation, r.r_name AS region,
               CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        JOIN region r   ON n.n_regionkey = r.r_regionkey
        GROUP BY n.n_name, r.r_name
    )
    SELECT region, nation, round(revenue, 2) AS revenue,
           round(revenue / sum(revenue) OVER (PARTITION BY region), 6) AS share,
           round(sum(revenue) OVER (
                     PARTITION BY region ORDER BY revenue DESC, nation
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 / sum(revenue) OVER (PARTITION BY region), 6) AS cum_share
    FROM rev
    """,
)
def q_win_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto analysis: each nation's revenue share of its region and
    the cumulative share in descending-revenue order (the "which 20%
    of nations carry 80%" question).

    Revenue sums run over DECIMAL addends (exact, order-independent),
    so the two window ratios divide identical numerators on both
    engines; the window passes share one shuffle on region."""
    o = load(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = load(spark, sf_dir, "region").select("r_regionkey", "r_name")
    rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue")
        )
    )
    w_all = W.partitionBy("region")
    w_cum = w_all.orderBy(F.desc("revenue"), F.asc("nation")).rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    return rev.select(
        "region",
        "nation",
        F.round("revenue", 2).alias("revenue"),
        F.round(F.col("revenue") / F.sum("revenue").over(w_all), 6).alias("share"),
        F.round(
            F.sum("revenue").over(w_cum) / F.sum("revenue").over(w_all), 6
        ).alias("cum_share"),
    )


# Event-type -> one-char symbol for sequence-pattern matching. Initials
# are unique across the fixture's five event types.
_EVT_SYM = {"signup": "s", "click": "c", "view": "v", "purchase": "p", "error": "e"}
# signup, then any run of clicks/views (nothing else between), then purchase
_SEQ_PATTERN = "s[cv]*p"


@query(
    "q_event_pattern",
    oracle=f"""
    WITH ev AS (
        SELECT user_id,
               CASE event_type
                    WHEN 'signup' THEN 's' WHEN 'click' THEN 'c'
                    WHEN 'view' THEN 'v' WHEN 'purchase' THEN 'p'
                    ELSE 'e' END AS sym,
               CAST(epoch_us(CAST(date_trunc('microsecond', ts) AS TIMESTAMP))
                    AS BIGINT) AS us,
               event_id
        FROM events
    ),
    seqs AS (
        SELECT user_id,
               string_agg(sym, '' ORDER BY us, event_id) AS seq
        FROM ev GROUP BY user_id
    )
    SELECT user_id,
           CAST(length(seq) AS BIGINT) AS n_events,
           CAST(len(regexp_extract_all(seq, '{_SEQ_PATTERN}')) AS BIGINT) AS n_matches
    FROM seqs
    WHERE len(regexp_extract_all(seq, '{_SEQ_PATTERN}')) >= 1
    """,
)
def q_event_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Causal sequence-pattern matching (MATCH_RECOGNIZE-lite): each
    user's events are laid out in causal (ts, event_id) order, encoded
    one symbol per event, and matched against the regex ``s[cv]*p`` —
    signup, then an uninterrupted run of clicks/views, then purchase.
    Counts non-overlapping left-to-right matches per user (identical
    semantics in Java regex and RE2, so the oracle is bit-for-bit).

    Scale shape: ONE shuffle keyed on user_id; the per-user sequence is
    built by sort_array(collect_list(struct)) inside the aggregate —
    no window function, no second shuffle — and the regex runs once
    per user, JVM-side. State per user is their event count; a
    production variant caps the sequence window in time (the same
    pre-filter the funnel uses) rather than collecting unbounded
    history. The symbol encoding is what makes arbitrary sequence
    regexes (alternation, repetition, negation-by-alphabet) express
    MATCH_RECOGNIZE patterns without a dedicated operator."""
    # coalesce to 'e' like the oracle's CASE ... ELSE 'e': a lookup
    # MISS returns NULL, which array_join silently drops — an unknown
    # sixth event type would shorten the Spark sequence but not the
    # oracle's, a silent match-count divergence (review find, round 9)
    sym = F.coalesce(
        F.create_map(*[F.lit(x) for kv in _EVT_SYM.items() for x in kv])[
            F.col("event_type")
        ],
        F.lit("e"),
    )
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("us"),
        "event_id",
        sym.alias("sym"),
    )
    seqs = ev.groupBy("user_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("us", "event_id", "sym"))),
                lambda s: s["sym"],
            ),
            "",
        ).alias("seq")
    )
    n_matches = F.regexp_count("seq", F.lit(_SEQ_PATTERN))
    return seqs.select(
        "user_id",
        F.length("seq").cast("bigint").alias("n_events"),
        n_matches.cast("bigint").alias("n_matches"),
    ).filter(F.col("n_matches") >= 1)


@query(
    "q_win_rolling_zscore",
    oracle="""
    WITH rolled AS (
        SELECT event_id, user_id, value,
               CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
                    OVER w AS BIGINT) AS sum_cents,
               stddev_samp(value) OVER w AS sigma,
               count(*) OVER w AS n_window
        FROM events
        WINDOW w AS (
            PARTITION BY user_id
            ORDER BY CAST(ts AS TIMESTAMP), event_id
            ROWS BETWEEN 9 PRECEDING AND CURRENT ROW
        )
    )
    SELECT event_id, user_id,
           CAST(n_window AS BIGINT) AS n_window,
           CAST((sum_cents * 100) // n_window AS DOUBLE) / 10000
               AS rolling_mean,
           CASE WHEN sigma IS NOT NULL AND sigma > 0
                THEN round((value - CAST(sum_cents AS DOUBLE) / 100 / n_window)
                           / sigma, 4) END AS zscore
    FROM rolled
    """,
)
def q_win_rolling_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score: each event's value standardized against the
    trailing-10 window of its user's history — the streaming-friendly
    outlier screen (the global-stats variant is q_agg_mad_outliers;
    this one needs no second pass and adapts to drift).

    Scale shape: one shuffle on user_id, one sort per partition; the
    frame sum and stddev are incremental frame aggregates (no per-row
    rescan of the frame). The mean is INTEGER-exact end to end: the
    2-decimal values sum as cents (bigint), and the displayed mean is
    a floor division in integer space — float round() diverges at
    representation boundaries between Spark (shortest-decimal-string
    HALF_UP) and DuckDB (binary-value rounding), observed on ~0.03%
    of rows. Guarding sigma > 0 keeps the division NULL-identical."""
    e = load(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-9, W.currentRow)
    )
    n = F.count(F.lit(1)).over(w)
    cents = (F.col("value").cast("decimal(18,2)") * 100).cast("bigint")
    sum_cents = F.sum(cents).over(w).cast("bigint")
    mu = sum_cents.cast("double") / 100 / n
    sigma = F.stddev_samp("value").over(w)
    return e.select(
        "event_id",
        "user_id",
        n.cast("bigint").alias("n_window"),
        # integer truncating division derived from the SAME w/cents
        # objects as the other columns (review find, round 9: a raw
        # F.expr restated the whole window spec, so a frame edit could
        # silently leave rolling_mean on the stale frame). (a - a % n)
        # / n equals a DIV n for longs — both truncate toward zero —
        # and the quotient is an exact integer in double.
        (
            ((sum_cents * 100 - (sum_cents * 100) % n) / n / 10000)
        ).alias("rolling_mean"),
        F.when(
            sigma.isNotNull() & (sigma > 0), F.round((F.col("value") - mu) / sigma, 4)
        ).alias("zscore"),
    )


@query(
    "q_win_ignore_nulls",
    oracle="""
    WITH ev AS (
        SELECT user_id, event_id, ts,
               CASE WHEN event_type = 'purchase' THEN value END AS purchase_value
        FROM events
    )
    SELECT user_id, event_id,
           round(last_value(purchase_value IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
               AS last_purchase,
           round(first_value(purchase_value IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING), 2)
               AS next_purchase
    FROM ev
    """,
)
def q_win_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE NULLS analytic frames — forward-fill (most recent
    purchase value at or before each event) and backward-fill (next
    purchase at or after it) per user. The standard sparse→dense
    carry-forward for feature generation: the fill happens inside the
    window frame (``F.last(..., ignorenulls=True)``), so no self-join
    or sentinel sorting is needed, and the single user_id shuffle
    serves both directions. Events before a user's first purchase
    yield NULL last_purchase (and symmetrically for next_purchase) —
    IS NULL rows are part of the checked contract."""
    ev = load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        F.when(F.col("event_type") == "purchase", F.col("value")).alias(
            "purchase_value"
        ),
    )
    fwd = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    bwd = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.last("purchase_value", ignorenulls=True).over(fwd), 2).alias(
            "last_purchase"
        ),
        F.round(F.first("purchase_value", ignorenulls=True).over(bwd), 2).alias(
            "next_purchase"
        ),
    )


@query(
    "q_event_transitions",
    oracle="""
    WITH seq AS (
        SELECT event_type,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        FROM events
    ),
    pairs AS (
        SELECT event_type, next_type, count(*) AS n
        FROM seq WHERE next_type IS NOT NULL
        GROUP BY event_type, next_type
    ),
    totals AS (
        SELECT event_type, sum(n) AS tot FROM pairs GROUP BY event_type
    )
    SELECT p.event_type AS from_type, p.next_type AS to_type,
           CAST(p.n AS BIGINT) AS n_transitions,
           round(CAST(p.n AS DOUBLE) / t.tot, 4) AS p_transition
    FROM pairs p JOIN totals t USING (event_type)
    """,
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: P(next event type | current type), estimated from
    adjacent pairs in (ts, event_id) order — the behavioral-model
    summary (and anomaly baseline) for event streams, 25 rows out
    regardless of corpus size.

    Scale: one user_id shuffle for the lead() window, then two
    hash-aggregations over (type, next_type) — 5×5 groups, so the
    partial aggregate collapses each task to ≤25 rows before the
    exchange; the totals join is a broadcast of 5 rows."""
    seq = load(spark, sf_dir, "events").select(
        "event_type",
        F.lead("event_type")
        .over(W.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("next_type"),
    )
    pairs = (
        seq.filter(F.col("next_type").isNotNull())
        .groupBy("event_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = pairs.groupBy("event_type").agg(F.sum("n").alias("tot"))
    return pairs.join(F.broadcast(totals), "event_type").select(
        F.col("event_type").alias("from_type"),
        F.col("next_type").alias("to_type"),
        F.col("n").cast("bigint").alias("n_transitions"),
        F.round(F.col("n").cast("double") / F.col("tot"), 4).alias("p_transition"),
    )
