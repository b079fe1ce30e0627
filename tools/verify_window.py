#!/usr/bin/env python
"""Preflight for the driver's correctness gate: run the FIRST N
registry entries (the ~50-query window the driver actually grades)
through the Spark-vs-DuckDB compare at sf0.01 and print one line per
query. Run this before a round ends whenever CONTRACT_ORDER changed —
it is the fast answer to "will every graded id have a green row",
without waiting for the full parametrized pytest suite.

    python tools/verify_window.py [N] [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

    import duckdb
    from pyspark.sql import SparkSession

    from distributed_causal_stream_processing_spark.plans.registry import (
        REGISTRY,
        _load_all,
    )
    from tests.parity import compare, register_duck_views

    _load_all()
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .appName("verify-window")
        .getOrCreate()
    )
    con = duckdb.connect()
    register_duck_views(con, sf_dir)

    window = list(REGISTRY.values())[:n]
    n_pass = n_rows_only = 0
    failures: list[str] = []
    for spec in window:
        t0 = time.time()
        try:
            df = spec.fn(spark, sf_dir)
            if spec.oracle is None:
                rows = df.count()
                assert rows >= 0
                n_rows_only += 1
                status = f"rows-only ({rows} rows)"
            else:
                compare(df, con, spec.oracle)
                n_pass += 1
                status = "value-hash OK"
        except Exception as exc:  # noqa: BLE001 — report, don't abort
            failures.append(spec.name)
            status = f"FAIL: {type(exc).__name__}: {exc}"[:140]
        print(f"{spec.name:32s} {time.time() - t0:6.1f}s  {status}")

    print(
        f"\nwindow={len(window)} value-hash={n_pass} rows-only={n_rows_only} "
        f"failed={len(failures)} {failures if failures else ''}"
    )
    spark.stop()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
