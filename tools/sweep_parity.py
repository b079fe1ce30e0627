#!/usr/bin/env python
"""Full-registry Spark-vs-DuckDB parity sweep at an arbitrary scale
factor — the instrument that caught four sf0.1-only rounding ties in
round 8 (q_udf_scalar, q_merge_upsert, q_scd2_apply,
q_join_pointintime: SURVEY §7.4's half-grid class, which is
SCALE-DEPENDENT and so invisible to the driver's sf0.01 gate).

Run it whenever float rounding changes or a new fixture generation
lands:

    python tools/sweep_parity.py [sf_dir]      # default sf0.1

Oracles in HEAVY_ORACLE are iterative/fixpoint unrolls that take
minutes-to-hours in single-threaded DuckDB at sf0.1; their Spark side
still runs (rows-only) and their value parity is covered at sf0.01 by
the driver gate and at sf0.001 by the tie-prone pytest gates.
"""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

HEAVY_ORACLE = {
    "q_dedup_lsh_groups",
    "q_graph_pagerank",
    "q_graph_components",
    "q_pipeline_dedup_best",
}


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

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
        .appName("sweep-parity")
        .getOrCreate()
    )
    con = duckdb.connect()
    register_duck_views(con, sf_dir)
    n_ok = n_rows = 0
    fails: list[str] = []
    for name, spec in REGISTRY.items():
        t0 = time.time()
        try:
            df = spec.fn(spark, sf_dir)
            if spec.oracle is None or name in HEAVY_ORACLE:
                assert df.count() >= 0
                n_rows += 1
                status = "rows-only"
            else:
                compare(df, con, spec.oracle)
                n_ok += 1
                status = "value-hash OK"
        except Exception as exc:  # noqa: BLE001 — report, don't abort
            fails.append(name)
            status = f"FAIL {type(exc).__name__}: {exc}"[:200]
        print(f"{name:36s} {time.time() - t0:5.1f}s {status}", flush=True)
    print(
        f"\n{sf_dir}: value-hash={n_ok} rows-only={n_rows} "
        f"failed={len(fails)} {fails if fails else ''}"
    )
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main())
