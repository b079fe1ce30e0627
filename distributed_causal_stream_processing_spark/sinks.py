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


def zorder_key(cols: Sequence[str], bits: int = 16) -> F.Column:
    """Morton (Z-order) interleave of N non-negative integer columns
    into one sortable key, built entirely from JVM bit expressions
    (shiftright / and / or — codegen'd, no Python).

    Each input is first RANK-NORMALIZED by the caller to [0, 2^bits)
    (use ntile or a min-max rescale); this function only interleaves:
    bit b of column i lands at position b*N + i of the key.
    """
    n = len(cols)
    key = F.lit(0).cast("long")
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(F.col(c).cast("long"), b).bitwiseAND(F.lit(1))
            key = key.bitwiseOR(
                F.shiftleft(bit, b * n + i)
            )
    return key


def write_zordered(
    df: DataFrame,
    path: str,
    zorder_by: Sequence[str],
    bits: int = 10,
    max_records_per_file: int | None = None,
) -> None:
    """Write ``df`` Z-ORDERED on ``zorder_by``: rows are globally
    range-sorted by the Morton interleave of the (rank-normalized)
    z-columns, so parquet row-group min/max stats stay selective for
    predicates on EVERY z-column — not just the leading sort key.

    Linear sort by (a, b) packs a's values tightly per row group but
    scatters b across its full range in every group, so b-only
    predicates prune nothing. The space-filling curve keeps each row
    group a small hyper-rectangle in (a, b, ...) space; a predicate on
    any single dimension then skips most groups (proven with scan
    metrics in tests/test_sinks.py). This is the layout knob behind
    OPTIMIZE ZORDER in lakehouse table formats, reproduced with plain
    expressions + repartitionByRange — no table format required.

    Rank normalization is equi-depth APPROX-QUANTILE bucketING:
    one aggregation pass computes 2^bits - 1 percentile_approx
    boundaries for every numeric z-column at once (constant-size
    driver result), and each row's code is the count of boundaries
    below its value — distribution-robust (skew cannot collapse the
    curve, matching percent_rank's behavior) with NO global sort
    window anywhere, so the write path scales to TB inputs. The
    boundary comparison is a literal-array filter — codegen'd JVM
    expressions, O(2^bits) comparisons per row, a write-time-only
    cost. Non-numeric z-columns (no percentile_approx support) fall
    back to the percent_rank window — acceptable for small dimension
    keys, documented single-task for large ones.
    """
    from pyspark.sql import Window as W
    from pyspark.sql.types import NumericType

    nb = (1 << bits) - 1  # boundary count; codes land in [0, nb]
    numeric = [
        c
        for c in zorder_by
        if isinstance(df.schema[c].dataType, NumericType)
    ]
    bounds: dict[str, list] = {}
    if numeric:
        probs = F.array(*[F.lit((i + 1) / (nb + 1)) for i in range(nb)])
        row = df.agg(
            *[
                F.percentile_approx(F.col(c).cast("double"), probs).alias(c)
                for c in numeric
            ]
        ).head()
        # percentile_approx returns NULL for an empty input or an
        # all-null column (ADVICE r08: list(None) raised TypeError and
        # failed the whole write); such a column has no distribution to
        # bucket, so skip it — its z-code degrades to the constant 0
        # below and the write proceeds
        bounds = {c: list(row[c]) for c in numeric if row[c] is not None}
    norm = df
    zcols = []
    for c in zorder_by:
        nc = f"__z_{c}"
        if c in numeric and c not in bounds:
            code = F.lit(0)  # empty/all-null column: constant code
        elif c in bounds:
            barr = F.array(*[F.lit(float(b)) for b in bounds[c]])
            code = F.size(
                F.filter(barr, lambda b: b < F.col(c).cast("double"))
            )
        else:
            code = (
                F.percent_rank().over(W.orderBy(F.col(c))) * ((1 << bits) - 1)
            )
        norm = norm.withColumn(nc, code.cast("long"))
        zcols.append(nc)
    keyed = norm.withColumn("__zkey", zorder_key(zcols, bits))
    out = (
        keyed.repartitionByRange(F.col("__zkey"))
        .sortWithinPartitions("__zkey")
        .drop("__zkey", *zcols)
    )
    writer = out.write.mode("overwrite")
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.parquet(path)
