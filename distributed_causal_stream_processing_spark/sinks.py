"""Dataset-layout sinks: how query results become well-laid-out files.

At 100 TB the write side matters as much as the plan: training jobs and
downstream scans want (a) partition directories they can prune, (b)
files bounded in size so a single task never owns a 50 GB shard, and
(c) rows sorted within each file so range predicates skip row groups
via parquet min/max stats. ``write_partitioned_sorted`` produces
exactly that layout with plain DataFrameWriter machinery — no custom
commit protocol, so it composes with whatever cluster committer
(S3A magic committer, etc.) the deployment uses.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned_sorted(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str],
    sort_by: Sequence[str],
    max_records_per_file: int | None = None,
    fmt: str = "parquet",
) -> None:
    """Write ``df`` as a partition-pruned, within-file-sorted dataset.

    - ``partition_by`` columns become directory partitions
      (``lang=en/...``) — scans with equality predicates on them prune
      at the listing level, before any file is opened.
    - Rows are repartitioned BY the partition columns first so each
      output partition is written by few tasks (no small-file
      explosion: without this, every task holding any row of a
      partition emits its own file into it).
    - ``sort_by`` orders rows *within* each task's file(s); parquet
      min/max row-group stats then skip for range predicates.
    - ``max_records_per_file`` caps file size via the writer option of
      the same name (rolls to a new file, order preserved).
    """
    out = df.repartition(*[F.col(c) for c in partition_by]).sortWithinPartitions(
        *partition_by, *sort_by
    )
    writer = out.write.mode("overwrite").format(fmt)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.partitionBy(*partition_by).save(path)


def read_partitioned(spark: SparkSession, path: str, fmt: str = "parquet") -> DataFrame:
    """Read a dataset written by ``write_partitioned_sorted`` (partition
    columns come back from directory names)."""
    return spark.read.format(fmt).load(path)


def compact_files(
    spark: SparkSession,
    src: str,
    dst: str,
    records_per_file: int,
    fmt: str = "parquet",
) -> int:
    """Compact a small-file-fragmented dataset into ``ceil(n / records_per_file)``
    evenly-sized files at ``dst``; returns the output file count.

    The 100 TB housekeeping job: streaming appends and fine-grained
    ingest leave thousands of KB-sized files whose per-file open/footer
    cost dominates scans. One round-robin repartition to the target
    count rewrites them; writing to a NEW directory keeps the operation
    crash-safe (readers never see a half-compacted dataset — swap the
    location after success, as a table format's commit would)."""
    df = spark.read.format(fmt).load(src)
    n_files = max(1, -(-df.count() // records_per_file))  # ceil
    df.repartition(n_files).write.mode("overwrite").format(fmt).save(dst)
    return n_files
