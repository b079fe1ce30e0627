"""Causal / streaming operators — batch-equivalent formulations (SURVEY §2.9).

This is the reference's home turf re-expressed Spark-first. The
reference (zapletal-martin/distributed-causal-stream-processing — a
causal, effectively-once stream-processing PoC; checkout empty in this
environment, see SURVEY.md §0) processes partitioned event logs in
causal (per-key happened-before) order, maintains per-key *views*, and
writes them idempotently (effectively-once).

Mapping:
- per-key causal order      → window `row_number` over (key, ts, id)
                              [streaming: keyed state, streaming/causal.py]
- windowed view maintenance → `F.window` / `F.session_window` groupBys
- idempotent write / dedup  → `dropDuplicates(event_id)`
                              [streaming: dropDuplicatesWithinWatermark +
                              foreachBatch idempotent sink, streaming/sinks.py]

Every query here is expressible in batch SQL, so each carries a DuckDB
oracle; the true streaming executions (readStream → writeStream) of the
same logic live in `streaming/jobs.py` and are semantic-tested in
tests/test_streaming.py.

events.ts is parquet timestamp[ns]; Spark truncates to µs. The data is
µs-granular (verified: no sub-µs components), so DuckDB oracles CAST to
µs TIMESTAMP for exact alignment.

Float-rounding risk note (review, round 9): q_stream_tumbling /
q_stream_sliding / q_stream_stateful_agg compare round(sum(double), 2)
across engines whose summation associations differ — a true sum within
1 ULP of an x.xx5 boundary could round apart. Kept as-is deliberately:
these three have been value-hash green for 8 rounds at three scales
(24+ driver/sweep runs), the fixture's 2-dp values keep true sums off
the boundary grid, and tools/sweep_parity.py re-checks the class at
arbitrary scale whenever rounding or fixtures change. The skew-safe
sibling (q_stream_stateful_agg_skewsafe) shows the quantized-integer
form to reach for if a fixture generation ever lands on the grid.

Scale notes (100 TB): tumbling/sliding window aggs shuffle one partial
row per (window, key) per map partition — the 100 TB-safe shape. The
per-key window functions (causal seq) shuffle the full event stream on
user_id once; skewed users would be handled by time-bucketing the key
(sequence within day, then offset by per-day counts) — noted, not
needed at fixture scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from distributed_causal_stream_processing_spark.io import load
from distributed_causal_stream_processing_spark.plans.registry import query


@query(
    "q_stream_tumbling",
    oracle="""
    SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling window count/sum per event_type (windowed view)."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@query(
    "q_stream_sliding",
    oracle="""
    WITH buckets AS (
        SELECT unnest([
                   time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP)),
                   time_bucket(INTERVAL '30 minutes', CAST(ts AS TIMESTAMP))
                       - INTERVAL '30 minutes'
               ]) AS window_start,
               event_type, value
        FROM events
    )
    SELECT window_start, event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(sum(value), 2) AS sum_value
    FROM buckets
    GROUP BY 1, 2
    """,
)
def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour window sliding every 30 min (each event lands in 2 windows)."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@query(
    "q_stream_session",
    oracle="""
    WITH marked AS (
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
               CASE WHEN CAST(ts AS TIMESTAMP)
                         - lag(CAST(ts AS TIMESTAMP)) OVER
                             (PARTITION BY user_id ORDER BY ts, event_id)
                        <= INTERVAL '15 minutes'
                    THEN 0 ELSE 1 END AS new_session
        FROM events
    ),
    sessions AS (
        SELECT user_id, ts,
               sum(new_session) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id) AS session_no
        FROM marked
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) AS last_event_ts,
           CAST(count(*) AS BIGINT) AS n_events
    FROM sessions
    GROUP BY user_id, session_no
    """,
)
def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows with a 15-minute inactivity gap.

    Spark: native `session_window`. Oracle: gaps-and-islands SQL.
    Output keys on (session_start, last_event_ts) — both defined by the
    event timestamps, independent of the gap-padded window end.
    """
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "15 minutes").alias("w"), "user_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("last_event_ts"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("user_id", "session_start", "last_event_ts", "n_events")
    )


@query(
    "q_stream_dedup",
    oracle="""
    SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type,
           round(value, 2) AS value
    FROM (
        SELECT *, row_number() OVER (PARTITION BY event_id ORDER BY event_id) AS rn
        FROM (SELECT * FROM events UNION ALL SELECT * FROM events)
    )
    WHERE rn = 1
    """,
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once by event_id under at-least-once delivery.

    Models the reference's core guarantee: replayed input (here the
    stream unioned with itself) deduplicated on the unique event id
    restores effectively-once output. Streaming form:
    `dropDuplicatesWithinWatermark` (streaming/jobs.py).
    """
    e = load(spark, sf_dir, "events")
    replayed = e.unionAll(e)  # simulate at-least-once redelivery
    return replayed.dropDuplicates(["event_id"]).select(
        "event_id",
        "ts",
        "user_id",
        "event_type",
        F.round("value", 2).alias("value"),
    )


def causal_sequence_batch(events: DataFrame) -> DataFrame:
    """Append ``seq`` = per-user happened-before rank by (ts, event_id).

    The batch formulation of the reference's causal merge; also
    hypothesis-tested against a brute-force reference in
    tests/test_properties.py. One shuffle on user_id + one sort."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return events.withColumn("seq", F.row_number().over(w).cast("bigint"))


@query(
    "q_causal_seq",
    oracle="""
    SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
           CAST(row_number() OVER (
               PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
           ) AS BIGINT) AS seq
    FROM events
    """,
)
def q_causal_seq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE reference concept: per-key causal (happened-before) sequence.

    Assigns each user's events a monotonic sequence number in
    (event-time, event_id) order — the batch formulation of the
    reference's causal merge. Concurrent events (equal ts) are ordered
    by the unique event id, a deterministic arbitrary order consistent
    with causality. Streaming form: keyed max-seq state via
    transformWithState (streaming/causal.py).
    """
    e = load(spark, sf_dir, "events")
    return causal_sequence_batch(e).select("user_id", "event_id", "ts", "seq")


_SEQ_BUCKET_US = 86_400_000_000  # 1 day


@query(
    "q_causal_seq_skewsafe",
    oracle="""
    SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
           CAST(row_number() OVER (
               PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
           ) AS BIGINT) AS seq
    FROM events
    """,
)
def q_causal_seq_skewsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_causal_seq for HOT KEYS: the same per-key causal sequence,
    computed without ever holding one key's full history in a single
    task — the module docstring's "time-bucket the key" note made
    real (and value-hash-proved identical: the oracle is q_causal_seq's
    plain window, so a hash match IS the equivalence proof).

    Two-level construction, the row_number analogue of the EWMA
    affine fold (operators/aggregates.py::ewma_two_level): level 1
    numbers each (key, day-bucket) segment independently — the task's
    partition is one key-DAY, bounded by daily volume, not by key
    lifetime; level 2 computes each bucket's starting offset as the
    exclusive running sum of PER-BUCKET COUNTS over the tiny
    (key × days) table, and a hash join adds offset + within-rank.
    Order is preserved across the split because ts determines the
    bucket monotonically: (bucket, within-bucket (ts, event_id)) is
    the same total order as (ts, event_id).

    Costs one extra shuffle + one small join vs the plain window —
    the price of boundedness; the bucket width is the knob (hour/day)
    and would be chosen per key-volume at 100 TB. Streaming form needs
    no analogue: the keyed sequencer's state is already O(1) per key."""
    e = load(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    return causal_sequence_skewsafe(e)


def causal_sequence_skewsafe(
    e: DataFrame, bucket_us: int = _SEQ_BUCKET_US
) -> DataFrame:
    """Two-level causal sequencing core over (user_id, event_id, ts) —
    see q_causal_seq_skewsafe. ``bucket_us`` bounds any single task's
    partition to one key's events within one bucket."""
    e2 = e.withColumn(
        "bucket",
        F.floor(F.unix_micros("ts") / F.lit(bucket_us)).cast("long"),
    )
    w_in = W.partitionBy("user_id", "bucket").orderBy("ts", "event_id")
    within = e2.withColumn("within", F.row_number().over(w_in))
    w_off = (
        W.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    offsets = (
        e2.groupBy("user_id", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "user_id",
            "bucket",
            F.coalesce(F.sum("n").over(w_off), F.lit(0)).alias("off"),
        )
    )
    return within.join(offsets, ["user_id", "bucket"]).select(
        "user_id",
        "event_id",
        "ts",
        (F.col("within") + F.col("off")).cast("bigint").alias("seq"),
    )


@query(
    "q_stream_stateful_agg",
    oracle="""
    SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
           CAST(count(*) OVER w AS BIGINT) AS running_count,
           round(sum(value) OVER w, 2) AS running_value
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def q_stream_stateful_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key view state evolution: running count + running value sum.

    Batch analogue of the reference's per-key *view* (materialized
    state updated by each event): row N shows the view contents after
    event N. Streaming form: update-mode groupBy agg (streaming/jobs.py).
    """
    e = load(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        "ts",
        F.count(F.lit(1)).over(w).cast("bigint").alias("running_count"),
        F.round(F.sum("value").over(w), 2).alias("running_value"),
    )


@query(
    "q_stream_stateful_agg_skewsafe",
    oracle="""
    SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
           CAST(count(*) OVER w AS BIGINT) AS running_count,
           CAST(sum(CAST(floor(value * 100) AS BIGINT)) OVER w AS BIGINT)
               AS running_cents
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def q_stream_stateful_agg_skewsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_stream_stateful_agg for HOT KEYS: the same per-key running
    view state, computed without ever holding one key's full history
    in a single task — the row_number analogue already exists
    (q_causal_seq_skewsafe); this is the running-SUM member of the
    family, completing 'every plain-window twin has a skew-safe
    sibling' (the skew instrument measured the plain form degrading
    3.2× under a 49% hot key while the two-level forms stayed flat).

    Construction mirrors causal_sequence_skewsafe: level 1 runs the
    running count/sum within each (key, day-bucket) — the task's
    partition is one key-DAY, bounded by daily volume — and level 2
    adds each bucket's starting offsets from the exclusive running sum
    of PER-BUCKET TOTALS over the tiny (key × days) table. The value
    is quantized to integer cents (floor(value·100) — floor, not
    round, so no half-grid tie class exists in either engine) BEFORE
    summing: integer addition is associative, so the two-level
    regrouping is EXACT, where a double sum re-associated across
    buckets could flip a 2-dp rounding. The oracle is the PLAIN
    single-window formulation over the same cents — a hash match IS
    the equivalence proof for the two-level construction.

    Measured trade (skew instrument, 4M-row events replicas): under a
    49% hot key this form holds ~flat (ratio 0.48) while the plain
    window degrades 2.2×; on UNIFORM high-cardinality data the plain
    window is ~5× cheaper (1.1 s vs 5.6 s — the day-bucket split
    multiplies window groups per key). Reach for the sibling when the
    key distribution has heavy hitters; the plain form wins when it
    does not. The sequencer twin (q_causal_seq_skewsafe) pays far less
    for boundedness because ranks need only per-bucket COUNTS at level
    2, not a second windowed sum of values."""
    e = load(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "ts",
        F.floor(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    return running_state_skewsafe(e)


def running_state_skewsafe(
    e: DataFrame, bucket_us: int = _SEQ_BUCKET_US
) -> DataFrame:
    """Two-level running count/sum core over (user_id, event_id, ts,
    cents) — see q_stream_stateful_agg_skewsafe. ``bucket_us`` bounds
    any single task's partition to one key's events within one
    bucket."""
    e2 = e.withColumn(
        "bucket",
        F.floor(F.unix_micros("ts") / F.lit(bucket_us)).cast("long"),
    )
    w_in = (
        W.partitionBy("user_id", "bucket")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    within = e2.withColumn(
        "wc", F.count(F.lit(1)).over(w_in)
    ).withColumn("ws", F.sum("cents").over(w_in))
    w_off = (
        W.partitionBy("user_id")
        .orderBy("bucket")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    offsets = (
        e2.groupBy("user_id", "bucket")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("cents").alias("s"))
        .select(
            "user_id",
            "bucket",
            F.coalesce(F.sum("n").over(w_off), F.lit(0)).alias("off_n"),
            # off_s stays NULLABLE: SQL's running sum is NULL exactly
            # when no non-null value exists in the prefix, and the
            # two-level form must reproduce that — a plain coalesce
            # to 0 here returned 0 where the plain window returns
            # NULL, and NULL + offset where a bucket's prefix is
            # all-null but PRIOR buckets are not (review find, r09)
            F.sum("s").over(w_off).alias("off_s"),
        )
    )
    running_cents = F.when(
        F.col("ws").isNull() & F.col("off_s").isNull(), F.lit(None)
    ).otherwise(F.coalesce("ws", F.lit(0)) + F.coalesce("off_s", F.lit(0)))
    return within.join(offsets, ["user_id", "bucket"]).select(
        "user_id",
        "event_id",
        "ts",
        (F.col("wc") + F.col("off_n")).cast("bigint").alias("running_count"),
        running_cents.cast("bigint").alias("running_cents"),
    )


@query(
    "q_stream_join_enrich",
    oracle="""
    SELECT e.event_id, e.user_id, e.event_type,
           round(e.value, 2) AS value,
           c.c_name, c.c_mktsegment
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    """,
)
def q_stream_join_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment: events joined to the customer dim.

    Batch form of the stream-static join (the dim is broadcast — at
    100 TB of events the stream side never shuffles).
    """
    e = load(spark, sf_dir, "events")
    c = load(spark, sf_dir, "customer")
    return e.join(F.broadcast(c), e.user_id == c.c_custkey).select(
        "event_id",
        "user_id",
        "event_type",
        F.round("value", 2).alias("value"),
        "c_name",
        "c_mktsegment",
    )


@query(
    "q_causal_audit",
    oracle="""
    WITH ev AS (
        SELECT user_id, event_id,
               epoch_us(CAST(date_trunc('microsecond', ts) AS TIMESTAMP)) AS us
        FROM events
    ),
    by_time AS (
        SELECT user_id, us,
               lag(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
                   AS prev_us
        FROM ev
    ),
    by_id AS (
        SELECT user_id, us,
               lag(us) OVER (PARTITION BY user_id ORDER BY event_id)
                   AS prev_id_us
        FROM ev
    ),
    t AS (
        SELECT user_id,
               count(*) AS n_events,
               sum(CASE WHEN us = prev_us THEN 1 ELSE 0 END) AS n_concurrent,
               max(us - prev_us) AS max_gap_us
        FROM by_time GROUP BY user_id
    ),
    i AS (
        SELECT user_id,
               sum(CASE WHEN us < prev_id_us THEN 1 ELSE 0 END)
                   AS n_inversions,
               max(CASE WHEN us < prev_id_us THEN prev_id_us - us END)
                   AS max_inversion_us
        FROM by_id GROUP BY user_id
    )
    SELECT t.user_id, CAST(t.n_events AS BIGINT) AS n_events,
           CAST(t.n_concurrent AS BIGINT) AS n_concurrent,
           CAST(t.max_gap_us AS BIGINT) AS max_gap_us,
           CAST(i.n_inversions AS BIGINT) AS n_inversions,
           CAST(i.max_inversion_us AS BIGINT) AS max_inversion_us
    FROM t JOIN i ON t.user_id = i.user_id
    """,
)
def q_causal_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Causal-log health audit, per key: the metrics an operator of a
    happened-before log watches before trusting downstream views.

    - ``n_concurrent``: consecutive events (in causal (ts, event_id)
      order) with EQUAL timestamps — concurrency the tie-break rule
      must order deterministically (the sequencer's (ts, event_id)
      policy);
    - ``max_gap_us``: largest inter-event gap — the session/chain gap
      parameter must dominate typical gaps or chains fragment;
    - ``n_inversions`` / ``max_inversion_us``: consecutive events in
      ID-ASSIGNMENT order whose event times run backwards — the
      reorder rate (and worst displacement) the causal merge absorbs;
      max_inversion_us lower-bounds the watermark/buffer any correct
      streaming consumer needs.

    Two window passes over the same per-key partitioning (one per
    ordering) + one hash agg each, joined on the key — O(n) with two
    shuffles, no state beyond the windows'."""
    e = load(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("us")
    )
    wt = W.partitionBy("user_id").orderBy("us", "event_id")
    wi = W.partitionBy("user_id").orderBy("event_id")
    t = (
        e.select("user_id", "us", F.lag("us").over(wt).alias("prev_us"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.when(F.col("us") == F.col("prev_us"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_concurrent"),
            F.max(F.col("us") - F.col("prev_us")).cast("bigint").alias("max_gap_us"),
        )
    )
    i = (
        e.select("user_id", "us", F.lag("us").over(wi).alias("prev_id_us"))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("us") < F.col("prev_id_us"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_inversions"),
            F.max(
                F.when(
                    F.col("us") < F.col("prev_id_us"),
                    F.col("prev_id_us") - F.col("us"),
                )
            )
            .cast("bigint")
            .alias("max_inversion_us"),
        )
    )
    return t.join(i, "user_id")


@query(
    "q_causal_merge",
    oracle="""
    SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
           CASE WHEN event_id % 2 = 0 THEN 'a' ELSE 'b' END AS source,
           CAST(row_number() OVER (
               PARTITION BY event_id % 2, user_id
               ORDER BY CAST(ts AS TIMESTAMP), event_id
           ) AS BIGINT) AS src_offset,
           CAST(row_number() OVER (
               PARTITION BY user_id
               ORDER BY CAST(ts AS TIMESTAMP), event_id
           ) AS BIGINT) AS seq
    FROM events
    """,
)
def q_causal_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's poll→merge step as a checkable batch query
    (VERDICT r06 item 5): TWO partitioned input logs interleaved into
    ONE causally consistent per-key sequence, with each event keeping
    its position in its source log.

    The two sources are the same even/odd event_id split that
    ``streaming.jobs.stage_events_split_sources`` stages physically —
    deriving them in-query keeps the whole merge DuckDB-checkable.
    ``src_offset`` is the event's per-key position WITHIN its source
    (the consumer's resume offset for that topic's key partition);
    ``seq`` is the merged happened-before sequence across both sources,
    ordered by (ts, event_id) regardless of arrival log. Within every
    key, both sources' src_offset subsequences ascend monotonically in
    seq order — the defining property of a causal merge (asserted in
    tests/test_streaming.py against the true-streaming twin
    ``run_multi_source_causal_stream`` on the same staged input).

    Scale — ONE shuffle, not one per source: a per-source row_number
    would need a (source, user_id) partitioning alongside the merge's
    (user_id) one (two exchanges, and at N sources the plan grows with
    N). Instead src_offset is a FILTERED RUNNING COUNT of the row's
    own source inside the single (user_id)-partitioned causal window —
    identical values, because counting source-s rows up to a source-s
    row in merged order IS that row's position within source s. The
    oracle keeps the textbook two-window SQL, so the equivalence is
    value-hash-checked; tests/test_plans.py pins the single exchange.
    No global window anywhere; per-key state is two counters."""
    e = load(spark, sf_dir, "events").select("user_id", "event_id", "ts")
    src = (F.col("event_id") % 2 == 0).alias("is_a")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        e.withColumn("is_a", src)
        .select(
            "user_id",
            "event_id",
            "ts",
            F.when(F.col("is_a"), F.lit("a")).otherwise(F.lit("b")).alias("source"),
            F.when(
                F.col("is_a"),
                F.count(F.when(F.col("is_a"), 1)).over(w),
            )
            .otherwise(F.count(F.when(~F.col("is_a"), 1)).over(w))
            .cast("bigint")
            .alias("src_offset"),
            F.row_number().over(
                W.partitionBy("user_id").orderBy("ts", "event_id")
            )
            .cast("bigint")
            .alias("seq"),
        )
    )
