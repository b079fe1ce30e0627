"""Recursive-query surface (Spark 4 ``WITH RECURSIVE``).

Spark 4.1 executes recursive CTEs iteratively — each step is one more
Catalyst-planned join against the previous frontier, unioned until the
frontier is empty (bounded by ``spark.sql.cteRecursionLevelLimit``,
default 100). That makes linked-structure traversal expressible as
declarative SQL instead of a driver-side loop, and it is the natural
home for the engine's core concept: walking a *happened-before chain*
of events.

Scale notes: the recursion below is LINEAR (the recursive member joins
the frontier against a precomputed next-pointer table on an equi key),
so each iteration is one shuffle-or-broadcast hash join whose frontier
only shrinks; total work is O(sum of chain lengths) = O(n) rows across
all iterations, and the iteration count is the MAX chain depth (11 at
sf0.1, bounded by the gap parameter), not n. The next-pointer table
itself is one window pass over the per-key sort — the same single
shuffle every gaps-and-islands query in this repo pays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from distributed_causal_stream_processing_spark.io import load
from distributed_causal_stream_processing_spark.plans.registry import query

# Chain-link gap: successive same-user events at most 4h apart form a
# happened-before chain. Deliberately equal to q_sessionize's gap so
# the two formulations cross-check: distinct chain roots here ==
# session rows there (asserted in tests/test_parity.py's invariants).
GAP_US = 4 * 3600 * 1_000_000


@query(
    "q_causal_chains",
    oracle=f"""
    WITH RECURSIVE
    ev AS (
        SELECT user_id, event_id,
               epoch_us(CAST(date_trunc('microsecond', ts) AS TIMESTAMP)) AS us
        FROM events
    ),
    linked AS (
        SELECT user_id, event_id, us,
               lag(us)        OVER w AS prev_us,
               lead(event_id) OVER w AS next_id,
               lead(us)       OVER w AS next_us
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
    ),
    chain (user_id, event_id, root_id, depth, us, next_id, next_us) AS (
        SELECT user_id, event_id, event_id, 0, us, next_id, next_us
        FROM linked
        WHERE prev_us IS NULL OR us - prev_us > {GAP_US}
        UNION ALL
        SELECT l.user_id, l.event_id, c.root_id, c.depth + 1,
               l.us, l.next_id, l.next_us
        FROM chain c
        JOIN linked l ON l.user_id = c.user_id AND l.event_id = c.next_id
        WHERE c.next_us - c.us <= {GAP_US}
    )
    SELECT user_id, event_id, root_id, CAST(depth AS BIGINT) AS depth
    FROM chain
    """,
)
def q_causal_chains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Happened-before chain traversal via ``WITH RECURSIVE``: label
    every event with the root event of its causal chain (successive
    same-user events ≤4h apart) and its depth within the chain.

    The linked-list walk the reference's causal merge performs
    imperatively [RECON], expressed declaratively: a window pass builds
    per-event next pointers, chain roots anchor the recursion (no
    predecessor within the gap), and each recursive step follows one
    pointer — a pure equi join, so no step is quadratic and the
    recursion depth equals the longest chain (7 at sf0.01, 11 at
    sf0.1). Gaps-and-islands (q_sessionize) computes the same
    partition in two window passes; the recursive form additionally
    yields root attribution and depth, and exercises Spark 4's
    recursive-CTE surface end-to-end against DuckDB's.
    """
    # Spark caps recursive CTEs at spark.sql.cteRecursionLevelLimit
    # (default 100) and THROWS past it, while the DuckDB oracle
    # recurses to fixpoint unbounded — a >100-deep chain (hourly events
    # for ~4 days within the gap) would fail the whole query (review
    # find, round 9). Raise the ceiling far above any plausible chain;
    # the shrinking-frontier recursion terminates at the longest chain
    # regardless, so the limit is a backstop, not a cost.
    spark.conf.set("spark.sql.cteRecursionLevelLimit", "100000")
    load(spark, sf_dir, "events").createOrReplaceTempView("events")
    return spark.sql(causal_chains_sql(GAP_US))


def causal_chains_sql(gap_us: int) -> str:
    """The Spark recursive-CTE text over a registered ``events`` view —
    exposed so the hypothesis property suite can run the identical
    query over generated event sets (tests/test_properties.py)."""
    return f"""
        WITH RECURSIVE
        ev AS (
            SELECT user_id, event_id, unix_micros(ts) AS us FROM events
        ),
        linked AS (
            SELECT user_id, event_id, us,
                   lag(us)        OVER w AS prev_us,
                   lead(event_id) OVER w AS next_id,
                   lead(us)       OVER w AS next_us
            FROM ev
            WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id)
        ),
        chain (user_id, event_id, root_id, depth, us, next_id, next_us) AS (
            SELECT user_id, event_id, event_id, 0, us, next_id, next_us
            FROM linked
            WHERE prev_us IS NULL OR us - prev_us > {gap_us}
            UNION ALL
            SELECT l.user_id, l.event_id, c.root_id, c.depth + 1,
                   l.us, l.next_id, l.next_us
            FROM chain c
            JOIN linked l ON l.user_id = c.user_id AND l.event_id = c.next_id
            WHERE c.next_us - c.us <= {gap_us}
        )
        SELECT user_id, event_id, root_id, CAST(depth AS BIGINT) AS depth
        FROM chain
        """
