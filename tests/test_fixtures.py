"""Fixture-contract guard.

Round 3 was wrecked because the driver regenerated the parquet
fixtures with a different physical type for ``events.ts`` and nothing
in the suite asserted the schemas the engine assumes. These tests read
the actual parquet footers (pyarrow, no Spark needed) and compare them
to the documented contract (FIXTURES.md), so a fixture regeneration
turns into one loudly-named red test instead of a 23-query wreck.

``events.ts`` is deliberately allowed to be EITHER int64(ns-as-long)
or timestamp[us]/[ns] — ``io.load()`` normalizes both (io.py) — but
any third layout fails here first.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF_DIR = "/root/testdata/sf0.001"

# column -> acceptable pyarrow types, per FIXTURES.md. Timestamps accept
# any unit (the generator has shifted ms/us/ns between rounds); the
# *name set and logical family* are the contract, io.load() owns unit
# normalization.
_TS = {pa.timestamp(u) for u in ("s", "ms", "us", "ns")} | {
    pa.timestamp(u, tz="UTC") for u in ("s", "ms", "us", "ns")
} | {pa.int64()}  # int64: the ns-as-long era layout

EXPECTED = {
    "region": {"r_regionkey": {pa.int32()}, "r_name": {pa.string()}},
    "nation": {
        "n_nationkey": {pa.int32()},
        "n_name": {pa.string()},
        "n_regionkey": {pa.int32()},
    },
    "customer": {
        "c_custkey": {pa.int64()},
        "c_name": {pa.string()},
        "c_nationkey": {pa.int32()},
        "c_acctbal": {pa.float64()},
        "c_mktsegment": {pa.string()},
    },
    "supplier": {
        "s_suppkey": {pa.int64()},
        "s_name": {pa.string()},
        "s_nationkey": {pa.int32()},
        "s_acctbal": {pa.float64()},
    },
    "part": {
        "p_partkey": {pa.int64()},
        "p_name": {pa.string()},
        "p_brand": {pa.string()},
        "p_type": {pa.string()},
        "p_size": {pa.int32()},
        "p_retailprice": {pa.float64()},
    },
    "orders": {
        "o_orderkey": {pa.int64()},
        "o_custkey": {pa.int64()},
        "o_orderstatus": {pa.string()},
        "o_totalprice": {pa.float64()},
        "o_orderdate": _TS,
        "o_orderpriority": {pa.string()},
    },
    "lineitem": {
        "l_orderkey": {pa.int64()},
        "l_partkey": {pa.int64()},
        "l_suppkey": {pa.int64()},
        "l_linenumber": {pa.int32()},
        "l_quantity": {pa.float64()},
        "l_extendedprice": {pa.float64()},
        "l_discount": {pa.float64()},
        "l_tax": {pa.float64()},
        "l_returnflag": {pa.string()},
        "l_linestatus": {pa.string()},
        "l_shipdate": _TS,
    },
    "events": {
        "event_id": {pa.int64()},
        "ts": _TS,
        "user_id": {pa.int64()},
        "event_type": {pa.string()},
        "value": {pa.float64()},
        "props": {pa.string()},
    },
    "documents": {
        "doc_id": {pa.int64()},
        "text": {pa.string()},
        "lang": {pa.string()},
        "source": {pa.string()},
        "n_chars": {pa.int64()},
    },
    "embeddings": {
        "vec_id": {pa.int64()},
        "embedding": {pa.list_(pa.float32()), pa.list_(pa.float64())},
        "label": {pa.int32()},
    },
}


@pytest.mark.parametrize("table", sorted(EXPECTED))
def test_fixture_footer_matches_contract(table):
    path = os.path.join(SF_DIR, f"{table}.parquet")
    assert os.path.exists(path), f"fixture {path} missing"
    schema = pq.read_schema(path)
    expected = EXPECTED[table]
    assert set(schema.names) == set(expected), (
        f"{table}: column set drifted — footer {sorted(schema.names)} "
        f"vs contract {sorted(expected)}. Update FIXTURES.md + io.py."
    )
    for col, allowed in expected.items():
        actual = schema.field(col).type
        # list<> equality in pyarrow is sensitive to the inner field
        # NAME ("item" vs "element" varies by writer) — compare the
        # value type structurally instead.
        if pa.types.is_list(actual):
            assert any(
                pa.types.is_list(t) and actual.value_type == t.value_type
                for t in allowed
            ), f"{table}.{col}: footer type {actual} not in allowed {allowed}"
            continue
        assert actual in allowed, (
            f"{table}.{col}: footer type {actual} not in allowed "
            f"{sorted(map(str, allowed))}. The driver regenerated the "
            f"fixtures with a new layout — update io.load() / FIXTURES.md."
        )


def test_events_load_normalizes_ts_to_timestamp(spark):
    """io.load() must deliver ts as session-TZ TimestampType no matter
    which physical layout the fixture generation used."""
    from pyspark.sql.types import TimestampType

    from distributed_causal_stream_processing_spark.io import load

    df = load(spark, SF_DIR, "events")
    assert isinstance(df.schema["ts"].dataType, TimestampType), (
        f"load() returned ts as {df.schema['ts'].dataType}; the engine "
        "contract is TimestampType (see io.py docstring)"
    )
    # and the values are sane (the fixture domain is Jan 2024)
    row = df.selectExpr("min(ts) AS lo", "max(ts) AS hi").collect()[0]
    assert row.lo.year == 2024 and row.hi.year == 2024


def test_load_cache_returns_equivalent_dataframe(spark):
    """The per-session lazy-DataFrame cache (io._DF_CACHE) must be a
    pure memoization: same schema, same rows, and a cache hit (no new
    plan resolution) on the second call for the same (session, dir,
    table)."""
    from distributed_causal_stream_processing_spark import io

    io._DF_CACHE.clear()
    df1 = io.load(spark, SF_DIR, "orders")
    assert any(k[2] == "orders" for k in io._DF_CACHE)
    df2 = io.load(spark, SF_DIR, "orders")
    assert df2 is df1  # cache hit returns the same lazy plan object
    assert df1.schema == df2.schema
    # events goes through the ts-normalization branch and must cache too
    e1 = io.load(spark, SF_DIR, "events")
    assert io.load(spark, SF_DIR, "events") is e1
    # different sf_dir is a different cache entry, not a stale hit
    other = io.load(spark, "/root/testdata/sf0.01", "orders")
    assert other is not df1
    assert other.count() > df1.count()
