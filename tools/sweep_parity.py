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
Membership is MEASURED, not assumed: round 15 timed all four original
members at sf0.1 — the two graph unrolls finished in seconds
(pagerank 5.9 s: a fixed 3-iteration unroll; components 2.2 s: its
recursive reach runs on the l_partkey<200 bounded subgraph) and moved
to the normal value-hash path, while the two UNBOUNDED min-label
closures (lsh_groups, pipeline_dedup_best) were killed at 15+ min and
stay heavy. Re-time before adding or keeping a member.

    python tools/sweep_parity.py --heavy3

closes the remaining gap (VERDICT r08 item 7): it builds the uniform
3×-rows replica of sf0.01 (scale_bench's key-remapped construction, a
scale the unrolls still finish at) and VALUE-compares exactly the
HEAVY_ORACLE set there — a recorded value-hash match per heavy query
at 3× the driver gate's scale, where round 8 proved rounding ties
hide. Results land in PARITY_HEAVY.json.
"""

from __future__ import annotations

import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

HEAVY_ORACLE = {
    "q_dedup_lsh_groups",
    "q_pipeline_dedup_best",
}


def heavy3() -> int:
    """Value parity for the HEAVY_ORACLE set at 3× the driver gate's
    scale (a uniform key-remapped replica of sf0.01 — big enough that
    scale-dependent rounding ties can surface, small enough that the
    iterative DuckDB unrolls finish)."""
    import json
    import shutil
    import tempfile
    import time as _t

    import duckdb
    from pyspark.sql import SparkSession

    from distributed_causal_stream_processing_spark.plans.registry import (
        REGISTRY,
        _load_all,
    )
    from tests.parity import compare, register_duck_views
    from tools.scale_bench import _scale3

    _load_all()
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .appName("sweep-parity-heavy3")
        .getOrCreate()
    )
    out_dir = tempfile.mkdtemp(prefix="sf001x3_")
    results: dict[str, dict] = {}
    fails: list[str] = []
    try:
        _scale3(spark, out_dir, base_sf="/root/testdata/sf0.01")
        con = duckdb.connect()
        register_duck_views(con, out_dir)
        for name in sorted(HEAVY_ORACLE):
            spec = REGISTRY[name]
            t0 = _t.time()
            try:
                df = spec.fn(spark, out_dir)
                # compare() collects the DataFrame and returns its row
                # count — a separate df.count() would execute the
                # multi-superstep plan a second time
                n = compare(df, con, spec.oracle)
                results[name] = {
                    "scale": "sf0.01 x3",
                    "rows": n,
                    "value_match": True,
                    "sec": round(_t.time() - t0, 1),
                }
                status = f"value-hash OK ({n} rows)"
            except Exception as exc:  # noqa: BLE001 — report, don't abort
                fails.append(name)
                results[name] = {
                    "scale": "sf0.01 x3",
                    "value_match": False,
                    "err": f"{type(exc).__name__}: {exc}"[:300],
                }
                status = f"FAIL {type(exc).__name__}: {exc}"[:200]
            print(f"{name:36s} {_t.time() - t0:6.1f}s {status}", flush=True)
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)
        spark.stop()
    with open(os.path.join(ROOT, "PARITY_HEAVY.json"), "w") as f:
        json.dump(
            {
                "_comment": (
                    "Value parity of the HEAVY_ORACLE queries (rows-only in "
                    "the sf0.1 sweep — their DuckDB unrolls take minutes-to-"
                    "hours there) at 3x the driver gate's sf0.01 scale. "
                    "Regenerate with: python tools/sweep_parity.py --heavy3"
                ),
                "queries": results,
            },
            f,
            indent=1,
            sort_keys=True,
        )
    print(f"\nwrote PARITY_HEAVY.json: {len(results) - len(fails)}/{len(results)} "
          f"value-match {fails if fails else ''}")
    return 1 if fails else 0


def main() -> int:
    if "--heavy3" in sys.argv[1:]:
        return heavy3()
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
