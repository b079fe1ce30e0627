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
# ids with the LEAST driver signal. Round 16 (VERDICT r15 item 1 — close
# the grading gap on the optimization rewrites):
# - positions 0-19: streaming/scalar/LLM/UDF block kept in (fresh green
#   r15);
# - positions 20-25: the six P0 relational ids — never leave the window;
# - position 26: q_agg_approx_distinct — its output schema changed in
#   the inherited `de21d61` (exact_parts + approx_within_5pct so it
#   could gain a DuckDB oracle) and the id left the window the same
#   round, so NO driver row has ever graded the new schema (VERDICT r15
#   "What's wrong" item 3). Takes the slot of q_topk, the longest
#   unbroken non-P0 streak in the repo (green r01-r15) — parked
#   least-signal-first;
# - positions 27-42: the 16 ids rotated in during r15 kept IN (fresh
#   r15 green — rotating them straight back out would leave this
#   round's 7 promotions without fresh-signal lenders next round);
# - positions 43-49 of queries(): lent to WINDOW_PROMOTED (see below) —
#   the r15/r16 OPTIMIZATION REWRITES, none of which has a driver row
#   on its current code: q_graph_pagerank / q_graph_components /
#   q_dedup_semantic_clusters (rewritten r15 after banking green r14
#   rows) + q_sample_diverse_coverage / q_sample_diverse_kcenter /
#   q_dedup_lsh_groups / q_pipeline_dedup_best (rewritten THIS round);
# - positions 43-61 of this tuple (→ 50-68 of queries()): rotated OUT —
#   the r14-green 15-id block minus approx_distinct, plus q_topk and
#   the four r01-r14-unbroken P1s (q_filter_compound, q_win_rank,
#   q_agg_stats, q_sort_multi), all pytest-parity-gated every session;
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
    # -- window fill: re-oracled id needing its FIRST row on the new
    #    schema (VERDICT r15 item 1) ------------------------------------
    "q_agg_approx_distinct",
    # -- kept IN: fresh r15 green --------------------------------------
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
    # -- rotated OUT: fresh green in r14/r15, pytest-gated locally ------
    # (the r14-green block and q_topk + q_filter_compound / q_win_rank /
    # q_agg_stats / q_sort_multi — green r01-r15 unbroken, the strongest
    # signals in the repo — lend their slots to the seven rewritten
    # promotions; least-signal-first.)
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
    "q_topk",
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
# sliding past the window edge. Round 16 (VERDICT r15 item 1 + this
# round's rewrites): every optimization-rewritten query whose current
# code has never been driver-graded — q_graph_pagerank,
# q_graph_components, q_dedup_semantic_clusters (rewritten in r15's
# `db72e78`/`22f9e17` AFTER banking green r14 rows, then outside the
# r15 window), plus the four rewritten THIS round:
# q_sample_diverse_coverage / q_sample_diverse_kcenter (incremental
# running-dmin selection), q_dedup_lsh_groups / q_pipeline_dedup_best
# (star-edge contraction + fused components loop). The r15 promotions
# (q_udf_cogroup, q_causal_chains, q_tpch_q9, q_multimodal_decode,
# q_text_decontaminate, q_text_pii_redact, q_pack_sequences) banked
# green r15 rows and rotate back to the pytest-only pool —
# q_causal_chains runs SQL token-identical to its r15-graded form (r16
# only moved the builder into causal_chains_frame for the test seam).
WINDOW_PROMOTED = (
    "q_graph_pagerank",
    "q_graph_components",
    "q_dedup_semantic_clusters",
    "q_sample_diverse_coverage",
    "q_sample_diverse_kcenter",
    "q_dedup_lsh_groups",
    "q_pipeline_dedup_best",
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
