"""Query registry — the single source of truth for SURVEY.md §2.

Every operator the engine claims is registered here as a named query:
a callable ``(spark, sf_dir) -> DataFrame`` plus (for SQL-expressible
ops) the equivalent DuckDB oracle SQL. ``__spark_entry__.py`` exposes
this registry to the driver; the local pytest parity harness iterates
it too, so "registered" == "tested".

Oracle-parity rules (SURVEY §7.4) every query follows:
- round float aggregates/similarities identically on both sides;
- alias every computed column identically, lowercase;
- tie-break top-k / window ordering with a unique key;
- ``events.ts`` is µs-granular on both sides (io.load() normalizes the
  physical layout, which has varied across fixture generations).
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL, or None → driver does rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query under ``name`` with an optional DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query id {name!r}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


# The 62 SURVEY.md §2 contract ids, in the exact order they must occupy the
# head of the registry (and therefore of ``queries()``): the driver grades the
# FIRST entries of ``queries()`` in insertion order, so the whole contract must
# sit at the front, ahead of every extra query.
#
# Ordering policy (VERDICT.md round 3 item 6, round 4 item 1 — rotation):
# the driver grades exactly the first 50 entries, and 62 §2 ids exist, so
# 12-19 sit outside the window each round. Rotate so the window covers the
# ids with the LEAST driver signal. Round 15 (VERDICT r14 items 1+2+4):
# - positions 0-19: streaming/scalar/LLM/UDF block kept in (fresh green
#   r14; q_cond/cast/array_funcs and the UDF quartet stay because the
#   four parked slots were taken by the even-longer-streak P1 fill);
# - positions 20-25: the six P0 relational ids — never leave the window;
# - position 26: q_topk (P1 fill kept in);
# - positions 27-42: the 16 ids parked during r14 rotated back IN
#   (q_filter_like, q_join_left/full/semi/anti/multiway/cross,
#   q_agg_having/distinct, q_win_frame_rows/analytic,
#   q_set_union_all/union_distinct, q_str/date/math_funcs) — last
#   driver-green r13; VERDICT r14 item 1 requires fresh r15 rows;
# - positions 43-49 of queries(): lent to WINDOW_PROMOTED (see below) —
#   7 slots this round: 4 never-graded heavies (VERDICT r14 item 2)
#   + the first 3 text/LLM north-star extras (item 4);
# - positions 43-61 of this tuple (→ 50-68 of queries()): rotated OUT —
#   the 15-id block fresh-green r14 (q_map_funcs, q_json_funcs,
#   q_join_broadcast/theta/range/asof, q_agg_rollup/cube/grouping_sets/
#   collect/approx_distinct, q_win_frame_range/dist,
#   q_set_intersect/except) plus q_filter_compound, q_win_rank,
#   q_agg_stats, q_sort_multi (green r01-r14 UNBROKEN — the strongest
#   signals in the repo, parked least-signal-first to lend the extra
#   promotion slots), all pytest-parity-gated every session;
# - after that: extras (TPC-H composites, graph, ANN variants, ...)
#   in module insertion order.
#
# Driver-green history per id lives in COVERAGE.md — update it whenever
# this tuple changes.
CONTRACT_ORDER = (
    # -- streaming / scalar families / LLM-pipeline / UDFs ---------------
    "q_causal_seq",          # P0 — the reference's core concept
    "q_stream_tumbling",     # P0
    "q_stream_sliding",
    "q_stream_session",
    "q_stream_dedup",
    "q_stream_stateful_agg",
    "q_stream_join_enrich",
    "q_cond_funcs",
    "q_cast_types",
    "q_array_funcs",
    "q_dedup_exact",
    "q_text_wordcount",
    "q_text_stats",
    "q_sim_cosine_topk",
    "q_sim_knn_label",
    "q_minhash_lsh",
    "q_udf_scalar",
    "q_udf_pandas",
    "q_udaf_pandas",
    "q_udtf",
    # -- P0 relational core ---------------------------------------------
    "q_scan_project",        # P0
    "q_scan_filter",         # P0
    "q_project_expr",        # P0
    "q_join_inner",          # P0
    "q_agg_global",          # P0
    "q_agg_group",           # P0 flagship
    # -- window fill: P1 id kept in -------------------------------------
    "q_topk",
    # -- rotated IN: parked during r14 (last driver-green r13), need
    #    fresh r15 rows (VERDICT r14 item 1) ----------------------------
    "q_filter_like",
    "q_join_left",
    "q_join_full",
    "q_join_semi",
    "q_join_anti",
    "q_join_multiway",
    "q_join_cross",
    "q_agg_having",
    "q_agg_distinct",
    "q_win_frame_rows",
    "q_win_analytic",
    "q_set_union_all",
    "q_set_union_distinct",
    "q_str_funcs",
    "q_date_funcs",
    "q_math_funcs",
    # -- rotated OUT: fresh green in r14, pytest-gated locally ----------
    # (the 15-id block banked fresh r14 rows; q_filter_compound /
    # q_win_rank / q_agg_stats / q_sort_multi — green r01-r14 unbroken,
    # the strongest signals in the repo — lend their slots to the seven
    # extra promotions, none of which has ever been driver-graded;
    # least-signal-first.)
    "q_map_funcs",
    "q_json_funcs",
    "q_join_broadcast",
    "q_join_theta",
    "q_join_range",
    "q_join_asof",
    "q_agg_rollup",
    "q_agg_cube",
    "q_agg_grouping_sets",
    "q_agg_collect",
    "q_agg_approx_distinct",
    "q_win_frame_range",
    "q_win_dist",
    "q_set_intersect",
    "q_set_except",
    "q_filter_compound",
    "q_win_rank",
    "q_agg_stats",
    "q_sort_multi",
)

# Extra (non-§2) ids promoted INTO the driver's ~50-slot graded window
# for the current round, each lent a slot by a fresh-green contract id
# sliding past the window edge. Round 15 (VERDICT r14 items 2+4):
# wave 2 of never-driver-graded heavies — q_udf_cogroup (the suite's
# slowest query, the deliberate Python-boundary instrument),
# q_causal_chains (recursive-CTE traversal with a streaming twin),
# q_tpch_q9 (the most expensive TPC-H composite, 3× ratio 1.42),
# q_multimodal_decode (real BMP decode over mapInPandas Arrow
# batches) — plus the first three text/LLM north-star extras ever
# driver-graded: q_text_decontaminate, q_text_pii_redact,
# q_pack_sequences (BASELINE.json:6 surface; none of the 23 text
# operators had a driver row before this round). The r14 promotions
# (q_graph_pagerank, q_graph_components, q_dedup_lsh_groups,
# q_retrieval_rrf) banked green r14 rows and rotate back to the
# pytest-only pool.
WINDOW_PROMOTED = (
    "q_udf_cogroup",
    "q_causal_chains",
    "q_tpch_q9",
    "q_multimodal_decode",
    "q_text_decontaminate",
    "q_text_pii_redact",
    "q_pack_sequences",
)
_PROMOTE_AT = 43  # insert position: last graded slot(s) of the window

# Modules whose import populates REGISTRY. Order roughly follows SURVEY §2.
_QUERY_MODULES = (
    "distributed_causal_stream_processing_spark.operators.scans",
    "distributed_causal_stream_processing_spark.operators.projections",
    "distributed_causal_stream_processing_spark.operators.joins",
    "distributed_causal_stream_processing_spark.operators.aggregates",
    "distributed_causal_stream_processing_spark.operators.windows",
    "distributed_causal_stream_processing_spark.operators.sorts",
    "distributed_causal_stream_processing_spark.operators.sets",
    "distributed_causal_stream_processing_spark.operators.reshape",
    "distributed_causal_stream_processing_spark.functions.scalars",
    "distributed_causal_stream_processing_spark.functions.udfs",
    "distributed_causal_stream_processing_spark.streaming.batch_views",
    "distributed_causal_stream_processing_spark.operators.dedup",
    "distributed_causal_stream_processing_spark.operators.text",
    "distributed_causal_stream_processing_spark.operators.retrieval",
    "distributed_causal_stream_processing_spark.operators.similarity",
    "distributed_causal_stream_processing_spark.operators.multimodal",
    "distributed_causal_stream_processing_spark.operators.tpch",
    "distributed_causal_stream_processing_spark.operators.graph",
    "distributed_causal_stream_processing_spark.operators.recursion",
)

_loaded = False


def _load_all() -> None:
    global _loaded
    if _loaded:
        return
    for mod in _QUERY_MODULES:
        importlib.import_module(mod)
    # Rebuild the registry dict so the 62 §2 contract ids occupy the head in
    # CONTRACT_ORDER, extras after in module insertion order (dicts preserve
    # insertion order; queries()/oracle_sql() expose exactly this ordering).
    head = (
        list(CONTRACT_ORDER[:_PROMOTE_AT])
        + list(WINDOW_PROMOTED)
        + list(CONTRACT_ORDER[_PROMOTE_AT:])
    )
    missing = [n for n in head if n not in REGISTRY]
    if missing:
        raise RuntimeError(f"contract ids not registered: {missing}")
    ordered = {n: REGISTRY[n] for n in head}
    ordered.update((n, s) for n, s in REGISTRY.items() if n not in ordered)
    REGISTRY.clear()
    REGISTRY.update(ordered)
    _loaded = True


def all_queries() -> dict[str, QueryFn]:
    _load_all()
    return {name: spec.fn for name, spec in REGISTRY.items()}


def all_oracle_sql() -> dict[str, str]:
    _load_all()
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle is not None}
