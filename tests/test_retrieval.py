"""Retrieval / sketch / layout family tests (round 12): BM25 +
inverted index plan shapes, count-min's one-sided error, the bloom
pre-screen's no-false-negative guarantee (non-vacuous — the fixture
has no cross-split exact dups, so a synthetic frame provides one),
and the Z-order layout instrument's pruning story.

Value parity vs DuckDB for all five queries runs in the registry-wide
sweep (tests/test_parity.py); these tests pin the properties and plan
shapes parity can't see.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_CORRECT, SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


# ---------------------------------------------------------------------------
# bloom pre-screen


def _docs_frame(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bloom_no_false_negative_on_real_duplicate(spark):
    """A batch document whose text EXACTLY matches a corpus document
    must come back (bloom_maybe=True, exact_dup=True) — the filter
    cannot miss a present key. The fixture corpus has no cross-split
    duplicates, so this synthetic frame makes the guarantee
    non-vacuous; bloom_violations() is the auditable form."""
    from distributed_causal_stream_processing_spark.operators.dedup import (
        bloom_prescreen,
        bloom_violations,
    )

    corpus = [(i, f"corpus text number {i} quite unique") for i in range(12)]
    batch = [
        (12, "corpus text number 3 quite unique"),  # exact dup of doc 3
        (13, "a genuinely new document"),
        (14, "another genuinely new document"),
        (15, "yet another new document"),  # max=15 -> cut=12
    ]
    rows = bloom_prescreen(_docs_frame(spark, corpus + batch)).collect()
    got = {r.doc_id: r for r in rows}
    assert set(got) == {12, 13, 14, 15}
    assert got[12].bloom_maybe and got[12].exact_dup
    assert bloom_violations(rows) == {}


def test_bloom_violations_detector_fires(spark):
    """Mutation check (the k-center/seed-exclusion guard pattern): a
    corrupted result — exact_dup without bloom_maybe, i.e. a false
    negative — must be flagged, or the clean assertion above proves
    nothing."""
    from types import SimpleNamespace

    from distributed_causal_stream_processing_spark.operators.dedup import (
        bloom_violations,
    )

    bad = [SimpleNamespace(doc_id=7, bloom_maybe=False, exact_dup=True)]
    assert bloom_violations(bad) == {"false_negative": [7]}


def test_bloom_fixture_rows_hold_guarantee_and_fp_accounting(spark):
    """On the real fixture: every row satisfies bloom_maybe >=
    exact_dup, and with zero true dups any bloom_maybe rows are false
    positives — the measured price of BLOOM_M bits (nonzero here, so
    the query demonstrably answers from the filter, not from the
    exact-hash join)."""
    from distributed_causal_stream_processing_spark.plans.registry import (
        all_queries,
    )

    from distributed_causal_stream_processing_spark.operators.dedup import (
        bloom_violations,
    )

    rows = all_queries()["q_dedup_bloom"](spark, SF_SMOKE).collect()
    assert rows, "batch must be non-empty"
    assert bloom_violations(rows) == {}
    n_fp = sum(1 for r in rows if r.bloom_maybe and not r.exact_dup)
    assert n_fp >= 1  # 4096-bit filter over ~400 keys: FPs exist by design


def test_bloom_bits_side_is_broadcast_and_no_python(spark):
    """The position-set ('the filter') must be the BROADCAST side of
    the probe join — it is BLOOM_M-bounded model state; the batch side
    streams. And the whole plan stays JVM-side (md5-slice arithmetic,
    no Python eval)."""
    from distributed_causal_stream_processing_spark.plans.registry import (
        all_queries,
    )

    df = all_queries()["q_dedup_bloom"](spark, SF_SMOKE)
    df.collect()
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    for py_op in ("ArrowEvalPython", "MapInPandas", "BatchEvalPython"):
        assert py_op not in plan


# ---------------------------------------------------------------------------
# count-min


def test_countmin_one_sided_error(spark):
    """Every estimate must be >= the exact count (count-min never
    undercounts: each of a token's counters saw at least all of that
    token's occurrences)."""
    from distributed_causal_stream_processing_spark.plans.registry import (
        all_queries,
    )

    rows = all_queries()["q_text_countmin"](spark, SF_SMOKE).collect()
    assert len(rows) == 20
    assert all(r.cm_est >= r.n for r in rows)
    assert all(r.overest == r.cm_est - r.n for r in rows)


def test_countmin_narrow_sketch_shows_collisions(duck):
    """Degradation check: the construction must actually be a sketch.
    At width 512 this fixture's ~40-token vocabulary rarely collides
    (overest 0); shrink the width to 8 via the same bucket-SQL helper
    and collisions MUST appear (40 tokens into 8 buckets pigeonholes
    >=2 tokens somewhere on every row) — proving the estimate comes
    from shared counters, not a hidden exact count."""
    from distributed_causal_stream_processing_spark.operators import retrieval as R

    w = 8
    pos = "\n UNION ALL ".join(
        f"SELECT {d} AS d, {R._cm_bucket_sql(d, width=w)} AS bucket FROM h"
        for d in range(R.CM_DEPTH)
    )
    tpos = "\n UNION ALL ".join(
        f"SELECT tok, n, {d} AS d, {R._cm_bucket_sql(d, width=w)} AS bucket FROM th"
        for d in range(R.CM_DEPTH)
    )
    q = f"""
    WITH w AS (SELECT unnest(string_split(lower(text), ' ')) AS tok
               FROM read_parquet('{SF_SMOKE}/documents.parquet')),
    h AS (SELECT md5(tok) AS h FROM w),
    pos AS ({pos}),
    sketch AS (SELECT d, bucket, count(*) AS c FROM pos GROUP BY d, bucket),
    top AS (SELECT tok, count(*) AS n FROM w GROUP BY tok ORDER BY n DESC, tok LIMIT 20),
    th AS (SELECT tok, n, md5(tok) AS h FROM top),
    tpos AS ({tpos})
    SELECT t.tok, t.n, min(s.c) AS cm_est
    FROM tpos t JOIN sketch s ON t.d = s.d AND t.bucket = s.bucket
    GROUP BY t.tok, t.n
    """
    rows = duck.sql(q).fetchall()
    assert all(est >= n for _, n, est in rows)  # still one-sided
    assert any(est > n for _, n, est in rows)  # and visibly colliding


# ---------------------------------------------------------------------------
# BM25 / inverted index plan shapes


def test_bm25_stats_broadcast_topk_bounded_no_python(spark):
    """The model state (idf + corpus scalars) must broadcast into the
    score join, top-k must run as TakeOrderedAndProject (never a
    global sort), and no Python eval anywhere."""
    from distributed_causal_stream_processing_spark.plans.registry import (
        all_queries,
    )

    df = all_queries()["q_text_bm25"](spark, SF_SMOKE)
    df.collect()
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan
    for py_op in ("ArrowEvalPython", "MapInPandas", "BatchEvalPython"):
        assert py_op not in plan


def test_inverted_index_no_window(spark):
    """The top posting must come from min(struct(-tf, doc_id)) inside
    the vocabulary rollup — a Window over the postings (the oracle's
    formulation) would sort corpus-sized data per token."""
    from distributed_causal_stream_processing_spark.plans.registry import (
        all_queries,
    )

    df = all_queries()["q_text_inverted_index"](spark, SF_SMOKE)
    df.collect()
    assert "Window" not in _plan(df)


def test_bm25_rank_consistent_with_score_order(spark):
    """rnk must be the dense 1..k enumeration of (bm25 desc, doc_id
    asc) — the tie-broken contract both engines rank by."""
    from distributed_causal_stream_processing_spark.plans.registry import (
        all_queries,
    )

    rows = all_queries()["q_text_bm25"](spark, SF_CORRECT).collect()
    assert [r.rnk for r in rows] == list(range(1, len(rows) + 1))
    ordered = sorted(rows, key=lambda r: (-r.bm25, r.doc_id))
    assert [r.doc_id for r in ordered] == [r.doc_id for r in rows]


# ---------------------------------------------------------------------------
# Z-order layout


def test_zorder_pruning_story(spark):
    """The measured claim: a user-sorted (linear) layout serves user
    probes from 1 file but hour probes from ~every file; Z-order
    bounds BOTH dimensions at 2^(bits/2)=4 files (each z-file fixes
    the high interleaved bits of both dims)."""
    from distributed_causal_stream_processing_spark.plans.registry import (
        all_queries,
    )

    rows = all_queries()["q_layout_zorder"](spark, SF_CORRECT).collect()
    got = {(r.layout, r.dim): r for r in rows}
    assert set(got) == {("linear", "user"), ("linear", "hour"),
                        ("zorder", "user"), ("zorder", "hour")}
    assert got[("linear", "user")].max_files == 1
    assert got[("linear", "hour")].avg_files > 8
    for dim in ("user", "hour"):
        assert got[("zorder", dim)].max_files <= 4
        assert got[("zorder", dim)].avg_files <= 4
    # the tradeoff is real: zorder gives up the linear layout's perfect
    # user clustering to buy bounded hour pruning
    assert got[("zorder", "user")].avg_files > got[("linear", "user")].avg_files
    assert got[("zorder", "hour")].avg_files < got[("linear", "hour")].avg_files


def test_zorder_interleave_is_morton(spark):
    """Spot-check the bit interleave: ub=0b1010, hb=0b0101 must give
    z = 0b10011001 + ... (ub on odd bits, hb on even) — computed
    directly from the shared SQL against literals."""
    from distributed_causal_stream_processing_spark.operators.reshape import (
        _zorder_sql,
    )

    df = spark.createDataFrame(
        [(0b1010, 0b0101), (15, 15), (0, 0), (1, 0), (0, 1)], "ub int, hb int"
    ).select("ub", "hb", F.expr(_zorder_sql()).alias("z"))
    got = {(r.ub, r.hb): r.z for r in df.collect()}

    def morton(a, b):
        z = 0
        for i in range(4):
            z |= ((a >> i) & 1) << (2 * i + 1)
            z |= ((b >> i) & 1) << (2 * i)
        return z

    for (a, b), z in got.items():
        assert z == morton(a, b), (a, b, z)


# ---------------------------------------------------------------------------
# conv() fast path


def test_conv_hex_parse_bit_identical_to_shared_arithmetic(spark):
    """hex_u32_spark_sql (conv-based, Spark-only, 2.9x faster) must be
    bit-identical to the cross-engine instr-arithmetic form on every
    32-bit slice of real corpus digests — the new pipelines' Spark
    sides run conv while their DuckDB oracles run the arithmetic, so
    this equality IS the parity argument."""
    from distributed_causal_stream_processing_spark.functions.hashing import (
        hex_u32_spark_sql,
        hex_u32_sql,
    )
    from distributed_causal_stream_processing_spark.io import load

    h = (
        load(spark, SF_SMOKE, "documents")
        .select(F.explode(F.split(F.lower("text"), " ")).alias("tok"))
        .select(F.expr("md5(tok)").alias("h"))
    )
    checks = [
        (
            F.expr(hex_u32_sql(f"substring(h, {1 + 8 * d}, 8)")) 
            != F.expr(hex_u32_spark_sql(f"substring(h, {1 + 8 * d}, 8)"))
        )
        for d in range(4)
    ]
    import functools
    import operator

    mismatches = h.filter(functools.reduce(operator.or_, checks)).count()
    assert mismatches == 0


def test_zorder_layout_prunes_real_files(spark, tmp_path):
    """The instrument's claim made PHYSICAL: write events under both
    layouts (one parquet file per simulated file, the partition dir as
    the file), derive the per-file span stats from the written data
    (what a Delta/Iceberg stats file stores), and run the same hour
    point-probe against both. The z-ordered layout must (a) answer
    from <= 4 of the files with the probe pushed as a PartitionFilter,
    (b) read strictly fewer files than the user-sorted layout, and
    (c) return exactly the rows a full scan returns."""
    import os

    from distributed_causal_stream_processing_spark.io import load
    from distributed_causal_stream_processing_spark.operators.reshape import (
        ZO_FILES,
        _zorder_sql,
    )

    e = (
        load(spark, SF_SMOKE, "events")
        .select(
            "event_id",
            F.expr("user_id % 16").alias("ub"),
            F.expr("hour(ts) % 16").alias("hb"),
        )
        .withColumn("z", F.expr(_zorder_sql()))
    )
    paths = {}
    for layout, fcol in (
        ("zorder", F.expr(f"CAST(floor(z / {ZO_FILES}) AS BIGINT)")),
        ("linear", F.col("ub").cast("bigint")),
    ):
        p = str(tmp_path / layout)
        (
            e.withColumn("f", fcol)
            .repartition(F.col("f"))  # one file per dir, like compaction
            .write.partitionBy("f")
            .parquet(p)
        )
        paths[layout] = p

    probe_h = 5

    def scan_num_files(df):
        df.collect()
        leaves = df._jdf.queryExecution().executedPlan().collectLeaves()
        return int(leaves.apply(0).metrics().apply("numFiles").value())

    n_files, results = {}, {}
    for layout, p in paths.items():
        t = spark.read.parquet(p)
        # the "stats file": per-file hour spans, collected once —
        # file-count-bounded driver state, exactly what a lakehouse
        # planner consults before listing data files
        spans = {
            r.f: (r.hmin, r.hmax)
            for r in t.groupBy("f")
            .agg(F.min("hb").alias("hmin"), F.max("hb").alias("hmax"))
            .collect()
        }
        keep = sorted(f for f, (lo, hi) in spans.items() if lo <= probe_h <= hi)
        pruned = t.filter(F.col("f").isin(keep)).filter(F.col("hb") == probe_h)
        plan = pruned._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan
        n_files[layout] = scan_num_files(pruned)
        results[layout] = sorted(r.event_id for r in pruned.collect())

    full = sorted(
        r.event_id
        for r in spark.read.parquet(paths["zorder"])
        .filter(F.col("hb") == probe_h)
        .collect()
    )
    assert results["zorder"] == full and results["linear"] == full
    assert n_files["zorder"] <= 4  # the 2^(bits/2) bound the docstring claims
    assert n_files["zorder"] < n_files["linear"]


def test_rrf_scores_consistent_with_ranks(spark):
    """Every fused row's score must equal the RRF formula applied to
    its OWN emitted ranks (floored at 1e-6), scores must be
    non-increasing in output rank, and the output rank must be the
    dense 1..k enumeration — the self-consistency a fusion layer can
    silently lose when a list's rank column drifts from the score
    column."""
    import math

    from distributed_causal_stream_processing_spark.operators.retrieval import (
        RRF_K,
        RRF_TOPK,
    )
    from distributed_causal_stream_processing_spark.plans.registry import (
        all_queries,
    )

    rows = all_queries()["q_retrieval_rrf"](spark, SF_CORRECT).collect()
    assert [r.rnk for r in rows] == list(range(1, RRF_TOPK + 1))
    prev = float("inf")
    for r in rows:
        expect = (1.0 / (RRF_K + r.lrank) if r.lrank is not None else 0.0) + (
            1.0 / (RRF_K + r.vrank) if r.vrank is not None else 0.0
        )
        assert abs(math.floor(expect * 1e6) / 1e6 - r.rrf_score) < 1e-12, r
        assert r.rrf_score <= prev + 1e-12
        prev = r.rrf_score
    # both retrieval systems actually contribute to the fused page
    assert any(r.lrank is not None for r in rows)
    assert any(r.vrank is not None for r in rows)
