"""Spark-vs-DuckDB parity for every registered query, at the driver's
correctness scale factor (sf0.01)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_CORRECT
from tests.parity import compare, register_duck_views


def _registry():
    from distributed_causal_stream_processing_spark import REGISTRY, all_queries

    all_queries()  # force module loading
    return REGISTRY


@pytest.fixture(scope="session")
def duck_views(duck):
    register_duck_views(duck, SF_CORRECT)
    return duck


@pytest.fixture(scope="session")
def duck_sf0001():
    import duckdb

    con = duckdb.connect()
    register_duck_views(con, "/root/testdata/sf0.001")
    yield con
    con.close()


@pytest.fixture(scope="session")
def duck_sf01():
    import duckdb

    con = duckdb.connect()
    register_duck_views(con, "/root/testdata/sf0.1")
    yield con
    con.close()


def pytest_generate_tests(metafunc):
    if "query_name" in metafunc.fixturenames:
        metafunc.parametrize("query_name", sorted(_registry()))


def test_query_parity(query_name, spark, duck_views):
    spec = _registry()[query_name]
    df = spec.fn(spark, SF_CORRECT)
    if spec.oracle is None:
        assert len(df.take(1)) >= 0  # rows-only smoke: executes cleanly
    else:
        compare(df, duck_views, spec.oracle)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    rows = e.entry(spark).collect()
    assert len(rows) > 0
    assert e.queries().keys() >= {"q_agg_group", "q_causal_seq", "q_stream_tumbling"}
    missing = set(e.oracle_sql()) - set(e.queries())
    assert not missing


def test_approx_distinct_within_5pct(spark):
    """The HLL++ sketch is bounded within 5% of the exact count per
    group — the error contract SURVEY §2.4 declares. Since r15 the
    query is self-evaluating (the bound is its own output column and
    the oracle value-hash-checks it, exceeding §2.4's rows-only
    allowance); this pin additionally asserts the sketch runs at
    exactly the rsd SURVEY pins (0.02): a silently changed rsd would
    shift the accuracy/size trade without failing the 5% gate."""
    df = _registry()["q_agg_approx_distinct"].fn(spark, SF_CORRECT)
    # rsd is the second argument of the aggregate in the optimized plan
    import re

    plan = df._jdf.queryExecution().optimizedPlan().toString()
    assert re.search(r"approx_count_distinct\(l_partkey#\d+L?, 0\.02", plan), plan
    rows = df.collect()
    assert rows
    for r in rows:
        assert r.exact_parts > 0
        assert r.approx_within_5pct, f"{r.l_returnflag}: sketch out of 5% bound"


def test_scd2_apply_invariants(spark):
    """Dimension-history invariants the value-hash can't state directly:
    exactly one OPEN version per key, closed versions end exactly where
    the change became effective, and version intervals never overlap."""
    rows = _registry()["q_scd2_apply"].fn(spark, SF_CORRECT).collect()
    by_key: dict[int, list] = {}
    for r in rows:
        by_key.setdefault(r.c_custkey, []).append(r)
    assert by_key
    for key, versions in by_key.items():
        opens = [v for v in versions if v.valid_to is None]
        assert len(opens) == 1, f"key {key}: {len(opens)} open versions"
        closed = sorted(
            (v for v in versions if v.valid_to is not None),
            key=lambda v: v.valid_from,
        )
        # intervals chain without overlap, ending at the open version
        for a, b in zip(closed, closed[1:] + opens):
            assert a.valid_to <= b.valid_from, f"key {key}: overlapping versions"


def test_pack_sequences_invariants(spark):
    """Packing invariants the per-doc value-hash can't state directly:
    no pack exceeds capacity unless it holds a single oversized doc,
    pack ids are contiguous from 1 per language, and packs cover
    doc_id-contiguous runs (greedy order preserved)."""
    from distributed_causal_stream_processing_spark.operators.text import PACK_CAPACITY

    rows = _registry()["q_pack_sequences"].fn(spark, SF_CORRECT).collect()
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r)
    assert by_lang
    for lang, docs in by_lang.items():
        docs.sort(key=lambda r: r.doc_id)
        packs: dict[int, list] = {}
        for r in docs:
            packs.setdefault(r.pack_id, []).append(r)
        assert sorted(packs) == list(range(1, len(packs) + 1)), f"{lang}: pack ids not contiguous"
        # greedy order: pack_id is non-decreasing in doc_id order
        ids = [r.pack_id for r in docs]
        assert ids == sorted(ids), f"{lang}: packs not doc_id-contiguous"
        for pid, members in packs.items():
            total = sum(r.n_tok for r in members)
            assert total <= PACK_CAPACITY or len(members) == 1, (
                f"{lang} pack {pid}: {total} tokens across {len(members)} docs"
            )


def test_approx_percentile_within_1pct(spark):
    """GK-sketch percentiles stay within 1% relative error of the exact
    per-group percentile values — the query is self-evaluating (r15),
    so the bound is its own output column and the exact values must be
    real data members (non-null, positive prices)."""
    rows = _registry()["q_agg_approx_percentile"].fn(spark, SF_CORRECT).collect()
    assert rows
    for r in rows:
        assert r.exact_p50 is not None and r.exact_p50 > 0
        assert r.exact_p95 is not None and r.exact_p95 >= r.exact_p50
        assert r.p50_within_1pct, f"{r.l_returnflag}: p50 sketch out of bound"
        assert r.p95_within_1pct, f"{r.l_returnflag}: p95 sketch out of bound"


def test_hll_merge_within_5pct(spark):
    """The merged (hll_union) all-time estimate and a sampled per-month
    estimate must each land within 5% of the exact distinct count —
    the merge must not degrade the sketch beyond its error bound."""
    from pyspark.sql import functions as F

    from distributed_causal_stream_processing_spark.io import load
    from distributed_causal_stream_processing_spark.operators.aggregates import (
        q_agg_hll_merge,
    )
    from tests.conftest import SF_SMOKE

    rows = q_agg_hll_merge(spark, SF_SMOKE).collect()
    got = {r.bucket: r for r in rows}
    assert "ALL" in got and len(got) > 1
    # every bucket's verdict column must hold (query is self-evaluating
    # since r15 — the 5% bound is part of its output contract)
    for r in rows:
        assert r.est_within_5pct, f"{r.bucket}: HLL estimate out of 5% bound"
    # the exact counts must match an independent recomputation (the
    # verdict column is only as good as the exact side it compares to)
    o = load(spark, SF_SMOKE, "orders")
    exact_all = o.select(F.countDistinct("o_custkey")).first()[0]
    assert got["ALL"].n_customers_exact == exact_all
    month = next(b for b in sorted(got) if b != "ALL")
    exact_m = (
        o.filter(F.date_format(F.date_trunc("month", "o_orderdate"), "yyyy-MM") == month)
        .select(F.countDistinct("o_custkey"))
        .first()[0]
    )
    assert got[month].n_customers_exact == exact_m


def test_causal_chains_match_sessionize(spark):
    """The recursive happened-before walk and the gaps-and-islands
    sessionizer use the same 4h gap, so they must agree on the chain
    partition: distinct chain roots == session count, and each chain's
    (root, size, depth-contiguity) matches a session. Depths within a
    chain are 0..len-1 exactly once each."""
    chains = _registry()["q_causal_chains"].fn(spark, SF_CORRECT).collect()
    n_sessions = _registry()["q_sessionize"].fn(spark, SF_CORRECT).count()
    by_root: dict[int, list] = {}
    for r in chains:
        by_root.setdefault(r.root_id, []).append(r.depth)
    assert len(by_root) == n_sessions
    for root, depths in by_root.items():
        assert sorted(depths) == list(range(len(depths))), f"chain {root}"


def test_cogroup_asof_handles_clickers_without_purchases(spark, tmp_path):
    """Regression (code-review find): a user with clicks but NO
    purchases reaches the cogrouped kernel with an EMPTY right frame —
    any gather from it (even inside np.where's eagerly evaluated
    branch) raised IndexError. All fixtures coincidentally lack such a
    user, so this synthetic case pins the guard."""
    import datetime

    from distributed_causal_stream_processing_spark.functions.udfs import (
        q_udf_cogroup,
    )

    # user 7777 clicks twice, never purchases; user 8888 is normal
    rows = [
        (1, "2024-01-01 10:00:00", 7777, "click", 1.0, "{}"),
        (2, "2024-01-01 11:00:00", 7777, "click", 1.0, "{}"),
        (3, "2024-01-01 09:00:00", 8888, "purchase", 5.0, "{}"),
        (4, "2024-01-01 10:30:00", 8888, "click", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        [
            (e, datetime.datetime.fromisoformat(t), u, ty, v, p)
            for e, t, u, ty, v, p in rows
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    d = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    got = {r.c_id: r.last_purchase_id for r in q_udf_cogroup(spark, d).collect()}
    assert got == {1: None, 2: None, 4: 3}


def test_causal_audit_detects_inversions_and_concurrency(spark, tmp_path):
    """The fixtures' event_ids are perfectly time-ordered per user, so
    q_causal_audit's inversion/concurrency columns are all zero there
    (the oracle still checks them) — this synthetic log makes every
    metric fire: one concurrent pair, one inverted assignment 90s
    displaced, one clean user."""
    import datetime as dt

    from distributed_causal_stream_processing_spark.streaming.batch_views import (
        q_causal_audit,
    )

    base = dt.datetime(2024, 1, 1, 12, 0, 0)

    def ev(eid, user, sec):
        return (eid, base + dt.timedelta(seconds=sec), user, "click", 1.0, "{}")

    rows = [
        # user 1: ids 1,2 concurrent (equal ts); id 4 assigned AFTER id 3
        # but happened 90s EARLIER -> one inversion, displacement 90s
        ev(1, 1, 0),
        ev(2, 1, 0),
        ev(3, 1, 100),
        ev(4, 1, 10),
        # user 2: clean, strictly ordered
        ev(5, 2, 0),
        ev(6, 2, 60),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    d = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    got = {r.user_id: r.asDict() for r in q_causal_audit(spark, d).collect()}
    u1, u2 = got[1], got[2]
    assert u1["n_events"] == 4 and u1["n_concurrent"] == 1
    assert u1["n_inversions"] == 1 and u1["max_inversion_us"] == 90_000_000
    assert u1["max_gap_us"] == 90_000_000  # causal order: 0,0,10,100
    assert u2["n_inversions"] == 0 and u2["n_concurrent"] == 0
    assert u2["max_inversion_us"] is None


@pytest.mark.parametrize(
    "tie_query",
    [
        "q_text_quality",
        "q_text_quality_retention",
        "q_pipeline_dedup_best",
        "q_pipeline_training_data",
        "q_agg_mad_outliers",
        # round 7: the power iteration moved driver-side (numpy sum
        # order != JVM agg order before the 6 dp rounding) — pinned at
        # the second scale for the same tie-sensitivity reason.
        "q_embed_pca_power",
        "q_embed_abtt",
        # round 12 (VERDICT r11 item 8): the rows new in r11 join the
        # second-scale sweep — round-half ties are SCALE-DEPENDENT
        # (round 6's lesson), and these were referenced from one scale
        # only. The serving row (new this round) joins for the same
        # reason.
        "q_sample_diverse_kcenter",
        "q_sample_diverse_coverage",
        "q_sim_ivfadc_trained_probe_sweep",
        "q_sim_ivfadc_serving",
        "q_sim_ivfadc_serving_clustered",
        # round 12: the new floored-float rows sweep both scales from
        # day one — BM25 ranks ON the floored score (a rounding-
        # boundary tie would reorder), and the z-order instrument's
        # avg_files is a floored dyadic ratio (the exact class round 6
        # bit on).
        "q_text_bm25",
        "q_layout_zorder",
        # the fusion ranks on raw cosine doubles before flooring (the
        # q_sim_knn_label exposure class) — sweep both scales
        "q_retrieval_rrf",
        # round 13: the rows new this round join from day one —
        # q_index_serve_during_ingest ranks on floored BM25 (the
        # q_text_bm25 class); q_causal_deps is integer-exact but its
        # dep-edge derivation (last-prior-click windows) deserves the
        # second value domain
        "q_causal_deps",
        "q_index_serve_during_ingest",
    ],
)
def test_tie_prone_queries_parity_at_sf0001(tie_query, spark, duck_sf0001):
    """Round-6 regression pin: these five diverged at sf0.001 (only!)
    because their value domains land EXACTLY on the rounding half-grid
    there — dyadic token ratios like 0.72925, even-count cent medians
    like 52724.245 — where Spark HALF_UPs and DuckDB rints. All now
    quantize by floor-scaling (text.py floor4); this second-scale gate
    keeps any future round() from reintroducing the tie."""
    spec = _registry()[tie_query]
    compare(spec.fn(spark, "/root/testdata/sf0.001"), duck_sf0001, spec.oracle)


@pytest.mark.parametrize(
    "tie_query",
    [
        # round 8: the raw charge product lands exactly on a half-cent
        # boundary for some sf0.1 rows (and only there) — now
        # floor-scaled; this pin keeps round(x, 2) from coming back.
        "q_udf_scalar",
        # round 8: `round(x * 1.1, 2)` manufactures 3-dp half-grid
        # ties (2dp × 1.1 = exact 3dp, SURVEY §7.4's dyadic-uplift
        # warning) that only materialize in sf0.1's value domain — all
        # three now use floor-scaled uplifts and a decimal-exact total.
        "q_merge_upsert",
        "q_scd2_apply",
        "q_join_pointintime",
    ],
)
def test_tie_prone_queries_parity_at_sf01(tie_query, spark, duck_sf01):
    """Ties are SCALE-DEPENDENT (SURVEY §7.4): a query green at
    sf0.001 and sf0.01 can still sit on the half-grid at sf0.1, so
    the tie gate needs a row at the bench scale too. Queries listed
    here stay cheap at sf0.1 (tight key filters) so the gate adds
    seconds, not minutes."""
    spec = _registry()[tie_query]
    compare(spec.fn(spark, "/root/testdata/sf0.1"), duck_sf01, spec.oracle)
