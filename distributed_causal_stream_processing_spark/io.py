"""Fixture I/O: parquet loaders + temp-view registration.

Schemas are fixed and explicit (FIXTURES.md); we still read with
``spark.read.parquet`` (the footer IS the schema — no inference risk)
so predicate pushdown / column pruning stay on the vectorized reader.

At 100 TB these tables would be partitioned directories (e.g. lineitem
partitioned by ship-month, events by event-date); the loaders take a
directory per table so that layout drops in without code changes —
Catalyst then gets partition pruning on top of row-group pruning.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# Lazy-DataFrame cache: building `spark.read.parquet(path)` costs a
# driver round-trip + file listing + footer schema read (~100 ms) every
# time, and a 143-query bench calls load() several hundred times on the
# same ten read-only fixture tables. DataFrames are immutable lazy
# plans, so reusing one per (session, dir, table) is semantically
# identical and drops that overhead — the same reason a production job
# resolves a catalog table once, not per expression. Keyed by
# applicationId so a stopped/rebuilt session can't serve stale handles,
# and by the fixture's (mtime, size) fingerprint so a regenerated-in-place
# parquet file (the driver rewrites fixtures between rounds) invalidates
# the cached plan instead of serving its stale resolved schema.
_DF_CACHE: dict[tuple, DataFrame] = {}


def _fingerprint(path: str) -> tuple:
    """Cheap change-detection for a fixture file/dir: (mtime_ns, size).

    For a directory (partitioned layout), stat the directory itself —
    file add/remove bumps its mtime; in-place part rewrites are covered
    by the driver always rewriting the whole fixture.
    """
    try:
        st = os.stat(path)
        return (st.st_mtime_ns, st.st_size)
    except OSError:
        return (None, None)


def invalidate_cache() -> None:
    """Drop all cached fixture DataFrames (call after rewriting fixtures)."""
    _DF_CACHE.clear()


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table as a DataFrame.

    ``events.ts`` has shipped in two physical layouts across fixture
    generations: parquet INT64 TIMESTAMP(NANOS) (which Spark 4 refuses
    by default — PARQUET_TYPE_ILLEGAL — so we read it via the
    nanos-as-long escape hatch and rebuild a µs TimestampType), and
    plain ``timestamp[us]`` (arriving as TIMESTAMP_NTZ when the footer
    has no UTC-adjustment flag). Rather than assume either, sniff the
    loaded schema and normalize: the contract is that ``ts`` is always
    a session-TZ ``TimestampType`` (session TZ is UTC) downstream.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    try:
        app_id = spark.sparkContext.applicationId
    except Exception:  # session stopped / remote-only — skip caching
        app_id = None
    key = (app_id, sf_dir, name, _fingerprint(table_path(sf_dir, name)))
    if app_id is not None and key in _DF_CACHE:
        return _DF_CACHE[key]
    df = _load_uncached(spark, sf_dir, name)
    if app_id is not None:
        _DF_CACHE[key] = df
    return df


def _load_uncached(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        from pyspark.sql import functions as F
        from pyspark.sql.types import LongType, TimestampNTZType, TimestampType

        df = spark.read.parquet(table_path(sf_dir, name))
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            # legacy nanos-as-long layout; data is µs-granular so DIV
            # 1000 is exact
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        if isinstance(ts_type, TimestampNTZType):
            return df.withColumn("ts", F.col("ts").cast(TimestampType()))
        return df
    return spark.read.parquet(table_path(sf_dir, name))


def register_views(spark: SparkSession, sf_dir: str, tables=TABLES) -> None:
    """Register fixture tables as temp views so SQL-form queries run.

    Skips tables whose parquet file is absent (some SF dirs may only
    carry the star schema).
    """
    for name in tables:
        path = table_path(sf_dir, name)
        if os.path.exists(path):
            load(spark, sf_dir, name).createOrReplaceTempView(name)


def read_json_robust(spark: SparkSession, path: str, schema: str):
    """Read newline-JSON with corrupt-line quarantine: returns
    (good, corrupt) DataFrames. Malformed lines don't fail the job
    (100 TB of scraped input always contains garbage) and aren't
    silently dropped either — they land whole in ``_corrupt_record``
    for a quarantine sink, while well-formed rows parse against the
    explicit schema (never inference; inference re-scans and drifts).
    """
    from pyspark.sql import functions as F

    raw = (
        spark.read.schema(schema + ", _corrupt_record STRING")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
        # PERMISSIVE parsing is lazy per-column; cache so the good/bad
        # split below reads one consistent parse
        .cache()
    )
    good = raw.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    corrupt = raw.filter(F.col("_corrupt_record").isNotNull()).select(
        "_corrupt_record"
    )
    return good, corrupt
