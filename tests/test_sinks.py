"""Layout-sink contract: the written dataset must actually have the
three properties the 100 TB story claims — partition directories,
bounded file sizes, and within-file sort order — verified against the
files on disk, not just the writer options."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


def test_write_partitioned_sorted_layout(spark, tmp_path):
    from distributed_causal_stream_processing_spark.io import load
    from distributed_causal_stream_processing_spark.sinks import (
        read_partitioned,
        write_partitioned_sorted,
    )

    docs = load(spark, SF_SMOKE, "documents")
    out = str(tmp_path / "shards")
    write_partitioned_sorted(
        docs, out, partition_by=["lang"], sort_by=["doc_id"], max_records_per_file=20
    )

    # (a) partition directories exist and cover every lang value
    langs = {r.lang for r in docs.select("lang").distinct().collect()}
    dirs = {
        os.path.basename(d).split("=", 1)[1]
        for d in glob.glob(os.path.join(out, "lang=*"))
    }
    assert dirs == langs

    # (b) every file holds at most max_records_per_file rows
    files = glob.glob(os.path.join(out, "lang=*", "*.parquet"))
    assert files
    for f in files:
        n = spark.read.parquet(f).count()
        assert n <= 20, f"{f}: {n} rows"

    # (c) rows are sorted by doc_id within each file
    for f in files:
        ids = [r.doc_id for r in spark.read.parquet(f).select("doc_id").collect()]
        assert ids == sorted(ids), f"{f} not sorted"

    # (d) nothing lost or duplicated, partition column round-trips
    back = read_partitioned(spark, out)
    assert sorted(
        map(tuple, back.select("doc_id", "lang").collect())
    ) == sorted(map(tuple, docs.select("doc_id", "lang").collect()))

    # (e) an equality predicate on the partition column prunes at scan
    pruned = back.filter(F.col("lang") == sorted(langs)[0])
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "lang" in plan.split("PartitionFilters:")[1].splitlines()[0]


def test_compact_files(spark, tmp_path):
    """50-file fragmentation → the computed file count, lossless, with
    every output file close to the target size."""
    from distributed_causal_stream_processing_spark.io import load
    from distributed_causal_stream_processing_spark.sinks import compact_files

    docs = load(spark, SF_SMOKE, "documents")
    frag = str(tmp_path / "fragmented")
    docs.repartition(50).write.mode("overwrite").parquet(frag)
    assert len(glob.glob(os.path.join(frag, "part-*.parquet"))) == 50

    out = str(tmp_path / "compacted")
    n_files = compact_files(spark, frag, out, records_per_file=200)
    files = glob.glob(os.path.join(out, "part-*.parquet"))
    assert len(files) == n_files == -(-docs.count() // 200)

    back = spark.read.parquet(out)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, docs.collect()))
    for f in files:  # round-robin → near-even sizes
        n = spark.read.parquet(f).count()
        assert n <= 200 + 50, f"{f}: {n} rows"
