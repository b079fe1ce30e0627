"""Join operators (SURVEY §2.3).

Scale notes (100 TB):
- Equi joins on fact tables (lineitem⋈orders) shuffle both sides on the
  key; with AQE on, skewed keys are split at runtime. On a real cluster
  the fact tables would be bucketed by orderkey so this join is
  shuffle-free — the declarative form here is unchanged by that layout.
- Dimension joins (nation, region, supplier, part, customer at TPC-H
  ratios) are explicitly broadcast: `F.broadcast(dim)` pins a
  BroadcastHashJoin, removing the shuffle of the 100 TB side entirely.
- Non-equi (theta/band) joins fall back to BroadcastNestedLoopJoin —
  only sane when one side is broadcastable; the range join bounds the
  blow-up with an equi key (same user) + time band.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from distributed_causal_stream_processing_spark.io import load
from distributed_causal_stream_processing_spark.plans.registry import query


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_val: str,
    out_col: str = "asof_val",
) -> DataFrame:
    """Latest ``right_val`` at/before each left row's timestamp per key.

    Union-and-window formulation — the 100 TB-safe as-of join: one
    shuffle on the key, one sort, no quadratic candidate join (the
    conditional-join + row_number alternative materializes every
    (left, earlier-right) candidate pair).

    Semantics: a right row with ``right_ts`` EQUAL to the left row's
    timestamp matches (right sorts before left at equal ts); among
    right rows tied on (key, ts), the largest ``right_val`` wins. Left
    rows with no earlier right row get NULL. Returns all left columns
    plus ``out_col``.
    """
    from pyspark.sql import Window as W

    lcols = [c for c in left.columns if c != key]
    r2 = right.select(
        key,
        F.col(right_ts).cast(left.schema[left_ts].dataType).alias("__ts"),
        F.lit(0).alias("__kind"),
        F.col(right_val).alias("__val"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
    )
    l2 = left.select(
        key,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__kind"),
        F.lit(None).cast(right.schema[right_val].dataType).alias("__val"),
        *lcols,
    )
    w = (
        W.partitionBy(key)
        .orderBy("__ts", "__kind", "__val")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return (
        r2.unionByName(l2)
        .withColumn(out_col, F.last("__val", ignorenulls=True).over(w))
        .filter(F.col("__kind") == 1)
        .select(key, *lcols, out_col)
    )


@query(
    "q_join_inner",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, o.o_custkey, o.o_orderstatus,
           round(l.l_extendedprice * (1 - l.l_discount), 4) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'F'
    """,
)
def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join lineitem⋈orders; planner picks SMJ/shuffled-hash."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    return li.join(o, li.l_orderkey == o.o_orderkey, "inner").select(
        "l_orderkey",
        "l_linenumber",
        "o_custkey",
        "o_orderstatus",
        F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"),
    )


@query(
    "q_join_left",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_totalprice
    FROM customer c
    LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 300000) o
      ON c.c_custkey = o.o_custkey
    """,
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join with a null-producing right side."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000)
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey", "c_name", "o_orderkey", "o_totalprice"
    )


@query(
    "q_join_full",
    oracle="""
    SELECT a.o_orderkey AS f_orderkey, a.o_totalprice, b.o_orderkey AS o_orderkey2,
           b.o_totalprice AS o_totalprice2
    FROM (SELECT * FROM orders WHERE o_orderstatus = 'F') a
    FULL JOIN (SELECT * FROM orders WHERE o_orderstatus = 'O') b
      ON a.o_orderkey = b.o_orderkey
    """,
)
def q_join_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join (disjoint predicates → all rows null on one side)."""
    o = load(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_orderkey").alias("f_orderkey"), "o_totalprice"
    )
    b = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_orderkey").alias("o_orderkey2"),
        F.col("o_totalprice").alias("o_totalprice2"),
    )
    return a.join(b, a.f_orderkey == b.o_orderkey2, "full").select(
        "f_orderkey", "o_totalprice", "o_orderkey2", "o_totalprice2"
    )


@query(
    "q_join_semi",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT'
    )
    """,
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join ≡ EXISTS: customers with at least one urgent order."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_acctbal"
    )


@query(
    "q_join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P'
    )
    """,
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join ≡ NOT EXISTS."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "P")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


@query(
    "q_join_broadcast",
    oracle="""
    SELECT n.n_name,
           CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               AS total_acctbal,
           CAST(count(*) AS BIGINT) AS n_customers
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast-hash join with an explicitly broadcast dimension table.

    tests/test_plans.py asserts BroadcastHashJoin appears in the plan —
    at 100 TB this removes the shuffle of the fact side entirely.
    """
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_acctbal"),
            F.count(F.lit(1)).alias("n_customers"),
        )
    )


@query(
    "q_join_multiway",
    oracle="""
    SELECT n.n_name, o.o_orderpriority,
           CAST(sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4)))
                AS DOUBLE) AS revenue,
           CAST(count(*) AS BIGINT) AS n_lineitems
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderstatus <> 'P'
    GROUP BY n.n_name, o.o_orderpriority
    """,
)
def q_join_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-table star join; AQE/CBO reorder; nation broadcast.

    The revenue sum runs over DECIMAL(18,4)-cast addends: decimal
    addition is exact and order-independent, so the aggregate is
    bit-identical across engines and partitionings — no rounding games.
    """
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") != "P")
    li = load(spark, sf_dir, "lineitem")
    n = load(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", "o_orderpriority")
        .agg(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,4)"))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@query(
    "q_join_cross",
    oracle="""
    SELECT r.r_name, n.n_name
    FROM region r CROSS JOIN nation n
    """,
)
def q_join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product of two small dims (5 × 25 rows)."""
    r = load(spark, sf_dir, "region").select("r_name")
    n = load(spark, sf_dir, "nation").select("n_name")
    return r.crossJoin(n)


@query(
    "q_join_theta",
    oracle="""
    SELECT s.s_suppkey, c.c_custkey,
           round(s.s_acctbal, 2) AS s_acctbal,
           round(c.c_acctbal, 2) AS c_acctbal
    FROM supplier s
    JOIN customer c
      ON c.c_acctbal > s.s_acctbal AND c.c_acctbal < s.s_acctbal + 500
    """,
)
def q_join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Non-equi band join → BroadcastNestedLoopJoin (small side broadcast)."""
    s = load(spark, sf_dir, "supplier")
    c = load(spark, sf_dir, "customer")
    cond = (c.c_acctbal > s.s_acctbal) & (c.c_acctbal < s.s_acctbal + 500)
    return s.join(c, cond).select(
        "s_suppkey",
        "c_custkey",
        F.round("s_acctbal", 2).alias("s_acctbal"),
        F.round("c_acctbal", 2).alias("c_acctbal"),
    )


def banded_range_count(
    df: DataFrame,
    key: str,
    ts: str,
    id_col: str,
    band_seconds: int,
    out_col: str = "n_in_band",
) -> DataFrame:
    """Count, per row, the same-key rows with ts in (row.ts,
    row.ts + band_seconds] — the generic banded self-join.

    Naive shape would be SMJ on the key with the time band as a
    post-filter — but a low-cardinality (or skewed) key makes each
    group a quadratic all-pairs scan (O(per-key²): ruinous when one
    key holds millions of rows at 100 TB). Instead bucket both sides
    into bins the width of the band: a right-side row within the band
    of row a can only live in a's bin or the next one, so expanding
    the right side to (bin, bin-1) and equi-joining on (key, bin)
    bounds candidates to adjacent-bin rows — the join key becomes
    (key, bin), sharding heavy keys across time. An inner bucketed
    join + re-join keeps LEFT semantics (zero-match rows count 0).
    Property-tested against brute force in tests/test_properties.py.
    """
    # F.floor, not a cast: casting double→long truncates toward zero, so
    # for pre-1970 (negative-epoch) timestamps bin 0 would be double-wide
    # and the adjacent-bin expansion below could miss a candidate. floor
    # gives uniform bins over the whole epoch range (ADVICE r04).
    bin_of = lambda c: F.floor(  # noqa: E731
        F.unix_timestamp(c) / F.lit(band_seconds)
    ).cast("long")
    a = df.select(
        F.col(id_col).alias("__ida"),
        F.col(key).alias("__ka"),
        F.col(ts).alias("__ta"),
        bin_of(F.col(ts)).alias("__bin"),
    )
    b = df.select(
        F.col(id_col).alias("__idb"),
        F.col(key).alias("__kb"),
        F.col(ts).alias("__tb"),
        F.explode(
            F.array(bin_of(F.col(ts)), bin_of(F.col(ts)) - F.lit(1))
        ).alias("__bin"),
    )
    band = (F.col("__tb") > F.col("__ta")) & (
        F.col("__tb")
        <= F.col("__ta") + F.make_dt_interval(secs=F.lit(band_seconds))
    )
    counts = (
        a.join(b, (F.col("__ka") == F.col("__kb")) & (a["__bin"] == b["__bin"]))
        .filter(band)
        .groupBy("__ida")
        .agg(F.count("__idb").alias(out_col))
    )
    return (
        df.select(F.col(id_col).alias("__ida"))
        .join(counts, "__ida", "left")
        .select(
            F.col("__ida").alias(id_col),
            F.coalesce(F.col(out_col), F.lit(0)).alias(out_col),
        )
    )


@query(
    "q_join_range",
    oracle="""
    SELECT a.event_id,
           CAST(count(b.event_id) AS BIGINT) AS n_within_hour
    FROM events a
    LEFT JOIN events b
      ON a.user_id = b.user_id
     AND CAST(b.ts AS TIMESTAMP) > CAST(a.ts AS TIMESTAMP)
     AND CAST(b.ts AS TIMESTAMP) <= CAST(a.ts AS TIMESTAMP) + INTERVAL '1 hour'
    GROUP BY a.event_id
    """,
)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-range self-join: events of the same user within the next
    hour, via the bin-bucketed ``banded_range_count`` (see its
    docstring for the 100 TB shape rationale)."""
    e = load(spark, sf_dir, "events")
    return banded_range_count(
        e, key="user_id", ts="ts", id_col="event_id",
        band_seconds=3600, out_col="n_within_hour",
    )


@query(
    "q_join_asof",
    oracle="""
    WITH merged AS (
        SELECT o_custkey AS user_id, o_orderdate AS ts, 0 AS kind,
               o_orderkey, NULL::BIGINT AS event_id
        FROM orders
        UNION ALL
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, 1 AS kind,
               NULL::BIGINT AS o_orderkey, event_id
        FROM events
    ),
    filled AS (
        SELECT user_id, ts, kind, event_id,
               last_value(o_orderkey IGNORE NULLS) OVER (
                   PARTITION BY user_id
                   ORDER BY ts, kind, coalesce(o_orderkey, event_id)
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS asof_orderkey
        FROM merged
    )
    SELECT event_id, user_id, ts, asof_orderkey
    FROM filled WHERE kind = 1
    """,
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: latest order at/before each event's ts per customer.

    Uses the generic ``asof_join`` (union-and-window — the 100 TB-safe
    as-of: one shuffle on the key, one sort, no quadratic candidate
    join; hypothesis-tested against a brute-force reference in
    tests/test_properties.py). An order exactly at ts matches;
    equal-date orders tie-break on the highest o_orderkey.
    """
    e = load(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    o = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"), "o_orderdate", "o_orderkey"
    )
    return asof_join(
        e, o, key="user_id", left_ts="ts", right_ts="o_orderdate",
        right_val="o_orderkey", out_col="asof_orderkey",
    ).select("event_id", "user_id", "ts", "asof_orderkey"
    )


N_SALTS = 8


@query(
    "q_join_salted",
    oracle="""
    SELECT p.p_brand, CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size <= 10
    GROUP BY p.p_brand
    """,
)
def q_join_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted equi join — identical RESULT to the plain join (the
    oracle is the unsalted SQL), different SHUFFLE: the fact side's key
    is extended with salt = pmod(hash(row-unique cols), 8) and the dim
    side is replicated across all 8 salts, so one hot key spreads over
    8 reducers instead of melting one.

    This is the manual fallback for when AQE's runtime skew-join split
    can't apply (e.g. skew into a broadcast-disabled join, or a
    stateful streaming join where AQE is unavailable). The replicated
    dim costs 8× its (small) size — never salt with a big dim; bucket
    or pre-aggregate instead.
    """
    n_salts = F.lit(N_SALTS)
    li = load(spark, sf_dir, "lineitem").withColumn(
        "salt", F.pmod(F.hash("l_orderkey", "l_linenumber"), n_salts)
    )
    # replicate via explode(sequence), not crossJoin(range): the same
    # plan shape q_join_salted_events uses — no nested-loop node, so
    # this query needs no CARTESIAN_OK exemption and the registry-wide
    # no-NLJ audit keeps covering it (review find, round 9)
    p = (
        load(spark, sf_dir, "part")
        .filter(F.col("p_size") <= 10)
        .withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(N_SALTS - 1))))
        .withColumn("salt", F.col("salt").cast("int"))
    )
    return (
        li.join(p, (li.l_partkey == p.p_partkey) & (li.salt == p.salt))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_quantity").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_qty"),
        )
    )


@query(
    "q_join_salted_events",
    oracle="""
    SELECT c.c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def q_join_salted_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted events⋈customer — the q_join_salted pattern on the
    fixture's genuinely skewed key (events.user_id is zipf-ish: a few
    hot users own a large share of events). Result is identical to the
    plain join (the oracle is unsalted SQL); the shuffle is not: the
    fact side's join key is extended with salt = pmod(hash(event_id), 8)
    — a per-row value, so one hot user's events spread across all 8
    (user_id, salt) reducer keys — and the small dim side is replicated
    ×8 to meet them.

    This is the manual pre-plan for the case AQE's runtime skew split
    can't cover (stateful streaming joins, broadcast-disabled
    environments); tests/test_plans.py asserts — with AQE OFF — that
    the salt column participates in the physical join keys and the
    pre-join exchange, i.e. the spread exists in the plan itself, not
    as an AQE afterthought.

    The dim is replicated with explode(sequence(0..7)) rather than a
    crossJoin against range(8): same rows, but a Generate node instead
    of a (nested-loop) join — keeps the plan cartesian-free so the
    suite-wide no-NLJ audit stays meaningful."""
    n_salts = F.lit(N_SALTS)
    e = load(spark, sf_dir, "events").withColumn(
        "salt", F.pmod(F.hash("event_id"), n_salts)
    )
    c = load(spark, sf_dir, "customer").withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(N_SALTS - 1)))
    )
    return (
        e.join(c, (e.user_id == c.c_custkey) & (e.salt == c.salt))
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            # value is exactly 2dp in the fixture; a decimal sum is
            # lossless and immune to cross-engine float-summation order
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
    )


@query(
    "q_join_events_shuffle",
    oracle="""
    SELECT c.c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
)
def q_join_events_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PLAIN shuffle events⋈customer — q_join_salted_events' unsalted
    twin, pinned to a sort-merge join via the merge hint so it stays a
    genuine both-sides shuffle even where the dim would broadcast. Two
    jobs: (a) the API surface for broadcast-disabled enrichment (memory
    ceilings, stateful streaming joins — the regimes where BHJ is off
    the table and the join MUST shuffle on the key); (b) the measured
    plain twin in tools/scale_bench.py's skewed-key instrument: under a
    ~49%-hot user_id this plan lands the hot key in ONE reducer task
    while q_join_salted_events spreads it over N_SALTS — the pair's
    skewed/uniform ratios quantify exactly what the salt buys. Result
    is identical to the salted variant (same oracle); only the shuffle
    differs."""
    e = load(spark, sf_dir, "events")
    c = load(spark, sf_dir, "customer")
    return (
        e.join(c.hint("merge"), e.user_id == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_value"),
        )
    )


@query(
    "q_merge_upsert",
    oracle="""
    WITH upd AS (
        SELECT o_orderkey, floor(o_totalprice * 110) / 100 AS new_price
        FROM orders WHERE o_orderkey % 97 = 0
    ),
    del AS (
        SELECT o_orderkey FROM orders WHERE o_orderkey % 101 = 0
    ),
    ins AS (
        SELECT o_orderkey + 100000000 AS o_orderkey, 'N' AS o_orderstatus,
               o_totalprice
        FROM orders WHERE o_orderkey % 103 = 0
    ),
    merged AS (
        SELECT t.o_orderkey, t.o_orderstatus,
               coalesce(u.new_price, t.o_totalprice) AS o_totalprice
        FROM orders t
        LEFT JOIN upd u USING (o_orderkey)
        WHERE t.o_orderkey NOT IN (SELECT o_orderkey FROM del)
        UNION ALL
        SELECT o_orderkey, o_orderstatus, o_totalprice FROM ins
    )
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM merged
    GROUP BY o_orderstatus
    """,
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE / CDC-apply semantics on plain parquet tables: a change
    set (updates: price uplift on keys %97; deletes: keys %101;
    inserts: new keys from %103) applied to the orders target —
    update = left join + coalesce, delete = anti join, insert =
    union — then per-status totals to prove all three verbs landed.

    Scale: this is exactly how table-format-less MERGE runs at 100 TB:
    one shuffle of target and changes on the merge key (or zero
    shuffles if both sides are bucketed by it — see
    test_bucketed_join_has_no_shuffle); the change set is typically
    <<target, so Spark broadcasts it and the target never moves. With
    a transactional table format (Delta/Iceberg) the same plan gains
    file-level pruning + ACID swap, but the join shape is identical.
    """
    t = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderstatus", "o_totalprice")
    upd = t.filter(F.col("o_orderkey") % 97 == 0).select(
        "o_orderkey", (F.floor(F.col("o_totalprice") * 110) / 100).alias("new_price")
    )
    dele = t.filter(F.col("o_orderkey") % 101 == 0).select("o_orderkey")
    ins = t.filter(F.col("o_orderkey") % 103 == 0).select(
        (F.col("o_orderkey") + 100_000_000).alias("o_orderkey"),
        F.lit("N").alias("o_orderstatus"),
        F.col("o_totalprice"),
    )
    merged = (
        t.join(F.broadcast(dele), "o_orderkey", "left_anti")
        .join(F.broadcast(upd), "o_orderkey", "left")
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.coalesce("new_price", "o_totalprice").alias("o_totalprice"),
        )
        .unionByName(ins)
    )
    return merged.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total"),
    )


@query(
    "q_scd2_apply",
    oracle="""
    WITH dim AS (
        SELECT c_custkey, c_mktsegment, round(c_acctbal, 2) AS c_acctbal,
               TIMESTAMP '1995-01-01' AS valid_from,
               CAST(NULL AS TIMESTAMP) AS valid_to
        FROM customer
    ),
    chg AS (
        SELECT c_custkey, floor(c_acctbal * 110) / 100 AS new_acctbal,
               TIMESTAMP '1997-06-01' AS eff_ts
        FROM customer WHERE c_custkey % 10 = 3
    ),
    closed AS (
        SELECT d.c_custkey, d.c_mktsegment, d.c_acctbal,
               d.valid_from, c.eff_ts AS valid_to
        FROM dim d JOIN chg c USING (c_custkey)
    ),
    untouched AS (
        SELECT d.* FROM dim d
        WHERE d.c_custkey NOT IN (SELECT c_custkey FROM chg)
    ),
    fresh AS (
        SELECT d.c_custkey, d.c_mktsegment, c.new_acctbal AS c_acctbal,
               c.eff_ts AS valid_from, CAST(NULL AS TIMESTAMP) AS valid_to
        FROM dim d JOIN chg c USING (c_custkey)
    )
    SELECT * FROM untouched
    UNION ALL SELECT * FROM closed
    UNION ALL SELECT * FROM fresh
    """,
)
def q_scd2_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2: apply a change batch to a
    versioned dimension. Matched current rows are CLOSED (valid_to :=
    change timestamp) and a NEW open version is inserted; unmatched
    rows pass through — history is never rewritten, only appended.

    Scale: the change batch is <<dimension, so both the close join and
    the anti join broadcast the changes and the dimension never
    shuffles — the SCD2 apply costs one scan of the dim regardless of
    dim size. The close+fresh branches share one join result; only
    the union fans it out."""
    eff = F.lit("1997-06-01").cast("timestamp")
    dim = load(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_mktsegment",
        F.round("c_acctbal", 2).alias("c_acctbal"),
        F.lit("1995-01-01").cast("timestamp").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    chg = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") % 10 == 3)
        .select(
            "c_custkey",
            (F.floor(F.col("c_acctbal") * 110) / 100).alias("new_acctbal"),
            eff.alias("eff_ts"),
        )
    )
    matched = dim.join(F.broadcast(chg), "c_custkey")
    closed = matched.select(
        "c_custkey", "c_mktsegment", "c_acctbal", "valid_from",
        F.col("eff_ts").alias("valid_to"),
    )
    fresh = matched.select(
        "c_custkey", "c_mktsegment",
        F.col("new_acctbal").alias("c_acctbal"),
        F.col("eff_ts").alias("valid_from"),
        F.lit(None).cast("timestamp").alias("valid_to"),
    )
    untouched = dim.join(F.broadcast(chg.select("c_custkey")), "c_custkey", "left_anti")
    return untouched.unionByName(closed).unionByName(fresh)


@query(
    "q_join_interval_overlap",
    oracle="""
    WITH spans AS (
        SELECT user_id, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
               min(epoch_us(CAST(date_trunc('microsecond', ts) AS TIMESTAMP))) AS s_lo,
               max(epoch_us(CAST(date_trunc('microsecond', ts) AS TIMESTAMP))) AS s_hi
        FROM events GROUP BY user_id, day
    ),
    incidents AS (
        SELECT event_id AS inc_id,
               epoch_us(CAST(date_trunc('microsecond', ts) AS TIMESTAMP)) AS i_ts
        FROM events WHERE event_type = 'error' AND event_id % 20 = 0
    ),
    hits AS (
        SELECT s.user_id, s.day, count(DISTINCT i.inc_id) AS n
        FROM spans s JOIN incidents i
          ON i.i_ts >= s.s_lo - 1800000000 AND i.i_ts <= s.s_hi + 1800000000
        GROUP BY s.user_id, s.day
    )
    SELECT sp.user_id, sp.day,
           CAST(coalesce(h.n, 0) AS BIGINT) AS n_incidents
    FROM spans sp LEFT JOIN hits h
      ON sp.user_id = h.user_id AND sp.day = h.day
    """,
)
def q_join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UN-KEYED interval-overlap join, made scale-safe by time-bin
    bucketing: per-(user, day) activity spans [first event, last event]
    against paged incidents (a 5% sample of error events, each an
    instant ± 30 min of overlap tolerance) — how many incidents fell
    within each activity span, zero included.

    Without a shared key, overlap is a band condition and the naive
    plan is a cartesian (the oracle literally runs one — viable only
    at oracle scale). The scale plan EQUI-fies it: each interval
    (widened by the tolerance) explodes to the hour bins it covers,
    each incident INSTANT maps to exactly one bin, the join runs on
    the bin id (shuffle- and bucket-alignable), the exact containment
    predicate filters within the bin, and DISTINCT collapses dupes
    from intervals spanning several bins. Cost is O(intervals x
    bins-per-interval + per-bin products), never |A| x |B|; bin width
    trades fan-out against per-bin density — the same knob as
    q_join_salted's salt count. Point-vs-interval (rather than
    interval-vs-interval) keeps the small side's fan-out at exactly 1
    bin per row — the asymmetric form every point-in-polygon /
    point-in-window join uses."""
    us = F.unix_micros("ts")
    HOUR = 3_600_000_000
    TOL = 1_800_000_000  # ± 30 min
    e = load(spark, sf_dir, "events")
    spans = e.groupBy(
        "user_id", F.to_date("ts").alias("day")
    ).agg(F.min(us).alias("s_lo"), F.max(us).alias("s_hi"))
    incidents = e.filter(
        (F.col("event_type") == "error") & (F.col("event_id") % 20 == 0)
    ).select(F.col("event_id").alias("inc_id"), us.alias("i_ts"))
    s_bins = spans.withColumn(
        "bin",
        F.explode(
            F.sequence(
                F.floor((F.col("s_lo") - TOL) / HOUR),
                F.floor((F.col("s_hi") + TOL) / HOUR),
            )
        ),
    )
    i_bins = incidents.withColumn("bin", F.floor(F.col("i_ts") / HOUR))
    hits = (
        s_bins.join(
            i_bins,
            (s_bins.bin == i_bins.bin)
            & (i_bins.i_ts >= s_bins.s_lo - TOL)
            & (i_bins.i_ts <= s_bins.s_hi + TOL),
        )
        .select("user_id", "day", "inc_id")
        .distinct()
        .groupBy("user_id", "day")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return spans.join(hits, ["user_id", "day"], "left").select(
        "user_id",
        "day",
        F.coalesce("n", F.lit(0)).cast("bigint").alias("n_incidents"),
    )


@query(
    "q_join_theta_banded",
    oracle="""
    SELECT s.s_suppkey, c.c_custkey,
           round(s.s_acctbal, 2) AS s_acctbal,
           round(c.c_acctbal, 2) AS c_acctbal
    FROM supplier s
    JOIN customer c
      ON c.c_acctbal > s.s_acctbal AND c.c_acctbal < s.s_acctbal + 500
    """,
)
def q_join_theta_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same band predicate as q_join_theta — customer balance in
    (supplier balance, supplier balance + 500) — but as a bucketed
    EQUI join instead of the broadcast nested loop.

    q_join_theta's BNLJ is fine while one side broadcasts; when BOTH
    sides are large (the 100 TB case) a nested loop is O(|S|·|C|).
    Banding fixes the complexity class the same way the time-range
    join does (banded_range_count above): bucket each balance into
    bins the width of the band (500), expand the supplier side to
    (bin, bin+1) — a customer in (s, s+500) lies in s's bin or the
    next — and equi-join on the bin before applying the exact band
    predicate. Candidates shrink from all pairs to adjacent-bin
    pairs, the join shuffles hash-partitioned on the bin key, and no
    side needs to fit in memory. Same rows out, plan-asserted NLJ-free
    (tests/test_plans.py)."""
    s = load(spark, sf_dir, "supplier").select(
        "s_suppkey",
        "s_acctbal",
        F.explode(
            F.array(
                F.floor(F.col("s_acctbal") / 500).cast("long"),
                F.floor(F.col("s_acctbal") / 500).cast("long") + 1,
            )
        ).alias("bin"),
    )
    c = load(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_acctbal",
        F.floor(F.col("c_acctbal") / 500).cast("long").alias("bin"),
    )
    return (
        s.join(c, "bin")
        .filter(
            (F.col("c_acctbal") > F.col("s_acctbal"))
            & (F.col("c_acctbal") < F.col("s_acctbal") + 500)
        )
        .select(
            "s_suppkey",
            "c_custkey",
            F.round("s_acctbal", 2).alias("s_acctbal"),
            F.round("c_acctbal", 2).alias("c_acctbal"),
        )
    )


_LATERAL_SQL = """
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c,
    LATERAL (
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_custkey = c.c_custkey
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 2
    ) t
"""


@query("q_join_lateral", oracle=_LATERAL_SQL)
def q_join_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery: each customer's top-2 orders by
    price, phrased as the per-row subquery a SQL-first user writes —
    identical text runs on both engines. Complements q_topk_per_group
    (the window formulation of the same task).

    Scale note: Catalyst DECORRELATES the lateral — the plan is a join
    + per-key limit (window/rank shape), never a per-customer subquery
    execution; the correlated ORDER BY ... LIMIT becomes a bounded
    per-group top-k after one shuffle on the join key, so the lateral
    surface costs the same as the window formulation at 100 TB."""
    from distributed_causal_stream_processing_spark.io import register_views

    register_views(spark, sf_dir, tables=("customer", "orders"))
    return spark.sql(_LATERAL_SQL)


@query(
    "q_join_pointintime",
    oracle="""
    WITH dim AS (
        SELECT c_custkey, c_mktsegment, round(c_acctbal, 2) AS c_acctbal,
               TIMESTAMP '1995-01-01' AS valid_from,
               CAST(NULL AS TIMESTAMP) AS valid_to
        FROM customer
    ),
    chg AS (
        SELECT c_custkey, floor(c_acctbal * 110) / 100 AS new_acctbal,
               TIMESTAMP '1997-06-01' AS eff_ts
        FROM customer WHERE c_custkey % 10 = 3
    ),
    versions AS (
        SELECT d.c_custkey, d.c_acctbal, d.valid_from, c.eff_ts AS valid_to
        FROM dim d JOIN chg c USING (c_custkey)
        UNION ALL
        SELECT d.c_custkey, d.c_acctbal, d.valid_from, d.valid_to
        FROM dim d WHERE d.c_custkey NOT IN (SELECT c_custkey FROM chg)
        UNION ALL
        SELECT d.c_custkey, c.new_acctbal, c.eff_ts, CAST(NULL AS TIMESTAMP)
        FROM dim d JOIN chg c USING (c_custkey)
    )
    SELECT o.o_orderkey, o.o_custkey, o.o_orderdate,
           v.c_acctbal AS acctbal_at_order, v.valid_from AS version_from
    FROM orders o
    JOIN versions v
      ON v.c_custkey = o.o_custkey
     AND o.o_orderdate >= v.valid_from
     AND (v.valid_to IS NULL OR o.o_orderdate < v.valid_to)
    """,
)
def q_join_pointintime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal-table) join: each order picks the SCD2
    dimension version in effect AT its order date — interval
    containment on (valid_from, valid_to], the semantics a versioned
    feature store / audit-correct report needs. Distinct from
    q_join_asof: as-of picks the nearest prior EVENT; point-in-time
    picks the unique covering VERSION, and every fact row matches
    exactly one version by the SCD2 no-overlap invariant
    (tests/test_parity.py::test_scd2_apply_invariants).

    Composes the registered q_scd2_apply output as the version table.
    Scale: the join is EQUI on the dimension key with the interval
    containment as a post-filter over the ≤2 matching versions per
    key — never a range enumeration; the version table broadcasts at
    dim scale (versions grow with change count, not fact count)."""
    versions = q_scd2_apply(spark, sf_dir).select(
        "c_custkey", "c_acctbal", "valid_from", "valid_to"
    )
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    return (
        o.join(F.broadcast(versions), o["o_custkey"] == versions["c_custkey"])
        .filter(
            (F.col("o_orderdate") >= F.col("valid_from"))
            & (F.col("valid_to").isNull() | (F.col("o_orderdate") < F.col("valid_to")))
        )
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderdate",
            F.col("c_acctbal").alias("acctbal_at_order"),
            F.col("valid_from").alias("version_from"),
        )
    )


@query(
    "q_join_asof_nearest",
    oracle="""
    WITH merged AS (
        SELECT o_custkey AS user_id, o_orderdate AS ts, 0 AS kind,
               o_orderkey, o_orderdate AS o_ts, NULL::BIGINT AS event_id
        FROM orders
        UNION ALL
        SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, 1 AS kind,
               NULL::BIGINT AS o_orderkey, NULL::TIMESTAMP AS o_ts, event_id
        FROM events
    ),
    filled AS (
        SELECT user_id, ts, kind, event_id,
               last_value(o_orderkey IGNORE NULLS) OVER wb AS bwd_key,
               last_value(o_ts IGNORE NULLS) OVER wb AS bwd_ts,
               first_value(o_orderkey IGNORE NULLS) OVER wf AS fwd_key,
               first_value(o_ts IGNORE NULLS) OVER wf AS fwd_ts
        FROM merged
        WINDOW wb AS (PARTITION BY user_id
                      ORDER BY ts, kind, coalesce(o_orderkey, event_id)
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wf AS (PARTITION BY user_id
                      ORDER BY ts, kind, coalesce(o_orderkey, event_id)
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_id, user_id, ts,
           CASE WHEN fwd_key IS NULL THEN bwd_key
                WHEN bwd_key IS NULL THEN fwd_key
                WHEN epoch_us(ts) - epoch_us(bwd_ts)
                     <= epoch_us(fwd_ts) - epoch_us(ts) THEN bwd_key
                ELSE fwd_key END AS nearest_orderkey,
           CASE WHEN bwd_key IS NULL AND fwd_key IS NULL THEN NULL
                WHEN fwd_key IS NULL THEN 'b'
                WHEN bwd_key IS NULL THEN 'f'
                WHEN epoch_us(ts) - epoch_us(bwd_ts)
                     <= epoch_us(fwd_ts) - epoch_us(ts) THEN 'b'
                ELSE 'f' END AS direction
    FROM filled WHERE kind = 1
    """,
)
def q_join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-direction as-of: each event matched to the order with
    the SMALLEST absolute time distance, searching both directions —
    the sensor-fusion/alignment variant of q_join_asof's backward-only
    rule. Equal distance resolves backward ('b'); within one date,
    backward carries the highest orderkey and forward the lowest (the
    frame-direction artifact, deterministic in both engines).

    Same 100 TB shape as asof_join: ONE union, one shuffle on the key,
    one sort serving both directed IGNORE-NULLS fills (wb/wf share the
    window ordering, so Spark plans a single Window operator pass) —
    never a per-event candidate join."""
    e = load(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("us"), "ts", "event_id"
    )
    o = load(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        # o_orderdate is TIMESTAMP_NTZ in the fixture; unix_micros wants TIMESTAMP
        F.unix_micros(F.col("o_orderdate").cast("timestamp")).alias("o_us"),
        "o_orderkey",
    )
    return asof_join_nearest(
        e, o, key="user_id", left_ts="us", right_ts="o_us",
        right_val="o_orderkey", out_col="nearest_orderkey",
    ).select("event_id", "user_id", "ts", "nearest_orderkey", "direction")


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_val: str,
    out_col: str = "nearest_val",
) -> DataFrame:
    """Nearest ``right_val`` by absolute NUMERIC time distance per key,
    searching both directions (generic sibling of ``asof_join``; cast
    timestamps to epoch numbers before calling). Equal distance
    resolves backward; a right row at exactly the left timestamp is
    backward. Ties within one timestamp: backward carries the largest
    ``right_val``, forward the smallest (frame-direction artifact,
    deterministic). Adds ``out_col`` and a ``direction`` ('b'/'f',
    NULL when no right row exists for the key) to the left columns.

    Same 100 TB shape as asof_join: one union, one shuffle on the key,
    one sort serving both directed IGNORE-NULLS fills — never a
    per-left-row candidate join."""
    from pyspark.sql import Window as W

    lcols = [c for c in left.columns if c != key]
    # NULL-valued right rows are dropped up front: the value fill skips
    # them (ignorenulls) but the timestamp fill would not, so a NULL-val
    # row could supply the distance for a value taken from a DIFFERENT
    # row — mixing the two corrupts the nearest decision
    r2 = right.filter(F.col(right_val).isNotNull()).select(
        key,
        F.col(right_ts).cast("long").alias("__ts"),
        F.lit(0).alias("__kind"),
        F.col(right_val).alias("__val"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
    )
    l2 = left.select(
        key,
        F.col(left_ts).cast("long").alias("__ts"),
        F.lit(1).alias("__kind"),
        F.lit(None).cast(right.schema[right_val].dataType).alias("__val"),
        *lcols,
    )
    order_cols = [F.col("__ts"), F.col("__kind"), F.col("__val")]
    wb = (
        W.partitionBy(key)
        .orderBy(*order_cols)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wf = (
        W.partitionBy(key)
        .orderBy(*order_cols)
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    rts = F.when(F.col("__kind") == 0, F.col("__ts"))
    filled = (
        r2.unionByName(l2)
        .select(
            key,
            "__ts",
            "__kind",
            *lcols,
            F.last("__val", ignorenulls=True).over(wb).alias("__bwd_v"),
            F.last(rts, ignorenulls=True).over(wb).alias("__bwd_ts"),
            F.first("__val", ignorenulls=True).over(wf).alias("__fwd_v"),
            F.first(rts, ignorenulls=True).over(wf).alias("__fwd_ts"),
        )
        .filter(F.col("__kind") == 1)
    )
    take_bwd = F.col("__fwd_v").isNull() | (
        F.col("__bwd_v").isNotNull()
        & ((F.col("__ts") - F.col("__bwd_ts")) <= (F.col("__fwd_ts") - F.col("__ts")))
    )
    has_any = F.col("__bwd_v").isNotNull() | F.col("__fwd_v").isNotNull()
    return filled.select(
        key,
        *lcols,
        F.when(take_bwd, F.col("__bwd_v")).otherwise(F.col("__fwd_v")).alias(out_col),
        F.when(~has_any, F.lit(None).cast("string"))
        .when(take_bwd, F.lit("b"))
        .otherwise(F.lit("f"))
        .alias("direction"),
    )
