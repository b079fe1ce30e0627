"""Shared benchmarking primitives for bench.py and the tools/ harness.

One definition of "warm the session" and "time a query" so the bench,
the regression tripwire's re-measurement, and the scaling smoke always
measure the same thing — three hand-rolled copies drifted once
(code-review find, round 7).
"""

from __future__ import annotations

import time


def warm_session(spark, queries, sf_dir: str) -> None:
    """The bench warm-up sequence: JVM + file cache via the flagship,
    the Python-worker pool via a tiny mapInPandas pass, and the ICU
    collation load Spark 4 pays on first upper/lower use."""
    try:
        queries["q_agg_group"](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    except Exception:  # noqa: BLE001 — warmup is best-effort
        pass
    spark.range(64).mapInPandas(lambda it: it, "id long").write.format("noop").mode(
        "overwrite"
    ).save()
    spark.sql("SELECT upper('x'), lower('X')").collect()


def time_query_noop(queries, name: str, spark, sf_dir: str, runs: int = 1):
    """Wall time to build + fully materialize one registered query
    through the noop sink; MIN over ``runs`` executions, or None if the
    query is unknown/raises (callers decide how to report)."""
    if name not in queries:
        return None
    best = None
    for _ in range(runs):
        t0 = time.perf_counter()
        try:
            queries[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:  # noqa: BLE001
            return None
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    return best
