"""Multimodal-column operators: opaque binary payloads + typed metadata
(brief requirement; no image/audio libs in this container, so the
decode kernel is STUBBED — the Spark-side plumbing is real).

Pattern for 100 TB of media:
- media lives in an opaque ``binary`` column next to typed metadata
  (media_type, n_bytes, width/height/duration) so pruning/filtering
  happens on cheap metadata columns without touching payload bytes;
- decode / resize / frame-sample run as Arrow-batched ``mapInPandas``
  kernels — per-partition, streaming batches, no driver involvement;
- the fixture has no binary media, so ``as_media_table`` derives a
  deterministic payload from documents.text (utf-8 bytes). The decode
  stub (`_decode_stub`) replaces a real codec (PIL/ffmpeg) with a
  deterministic fake; swap `DECODERS` entries when codecs exist.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from distributed_causal_stream_processing_spark.io import load
from distributed_causal_stream_processing_spark.plans.registry import query

MEDIA_TYPES = ("image", "audio", "video")


def as_media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → (doc_id, media_type, payload binary, meta struct)."""
    d = load(spark, sf_dir, "documents")
    payload = F.encode("text", "UTF-8")
    return d.select(
        "doc_id",
        F.element_at(
            F.array(*[F.lit(t) for t in MEDIA_TYPES]),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("media_type"),
        payload.alias("payload"),
        F.struct(
            F.length(payload).alias("n_bytes"),
            (F.col("doc_id") % 640 + 64).cast("int").alias("width"),
            (F.col("doc_id") % 480 + 48).cast("int").alias("height"),
        ).alias("meta"),
    )


@query(
    "q_multimodal_meta",
    oracle="""
    SELECT CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                           ELSE 'video' END AS media_type,
           CAST(count(*) AS BIGINT) AS n_items,
           CAST(sum(strlen(text)) AS BIGINT) AS total_bytes,
           CAST(max(doc_id % 640 + 64) AS INTEGER) AS max_width
    FROM documents
    GROUP BY 1
    """,
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-only aggregation over the media table — payload bytes
    are never read (column pruning drops the binary column)."""
    m = as_media_table(spark, sf_dir)
    return m.groupBy("media_type").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum("meta.n_bytes").cast("bigint").alias("total_bytes"),
        F.max("meta.width").alias("max_width"),
    )


FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.IntegerType()),
        T.StructField("feat_mean", T.DoubleType()),
        T.StructField("feat_dim", T.IntegerType()),
    ]
)


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    mapInPandas streams Arrow record batches through the Python worker
    — the payload column transfers zero-copy-ish, per partition, and
    the 100 TB scan parallelizes over file splits like any other scan.

    Everything worker-side is nested so cloudpickle ships it by value
    (workers don't need this package importable).
    """

    def decode_stub(payload: bytes, media_type: str) -> list[float]:
        # STUB decoder. A real deployment decodes image/audio/video
        # here (PIL / torchaudio / ffmpeg — not in this container) and
        # returns a feature vector. The stub derives a deterministic
        # fake from raw bytes so the pipeline is testable end-to-end.
        dim = {"image": 8, "audio": 4, "video": 6}[media_type]
        return [float(payload[i % len(payload)]) for i in range(dim)]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                decode_stub(p, m)
                for p, m in zip(pdf["payload"], pdf["media_type"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "feat_mean": [sum(f) / len(f) for f in feats],
                    "feat_dim": [len(f) for f in feats],
                }
            )

    return media.mapInPandas(kernel, FEATURE_SCHEMA)


@query(
    "q_multimodal_features",
    # The stub decoder is deterministic byte arithmetic over utf-8 text
    # (documents.text is pure ASCII — verified octet_length == strlen —
    # so DuckDB character indexing == Spark byte indexing), which makes
    # the full feature output value-checkable, not just rows-only. The
    # mean is a single IEEE division of an exact small-integer sum, so
    # both engines produce bit-identical doubles without rounding.
    oracle="""
    SELECT doc_id,
           CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                ELSE 'video' END AS media_type,
           CAST(strlen(text) AS INTEGER) AS n_bytes,
           list_avg([ascii(text[CAST(i % strlen(text) AS INTEGER) + 1])
                     for i in range(CASE doc_id % 3 WHEN 0 THEN 8
                                    WHEN 1 THEN 4 ELSE 6 END)]) AS feat_mean,
           CAST(CASE doc_id % 3 WHEN 0 THEN 8 WHEN 1 THEN 4 ELSE 6 END
                AS INTEGER) AS feat_dim
    FROM documents
    """,
)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over binary media via mapInPandas (stubbed
    decode; real Spark plumbing: schema, batching, partitioning)."""
    return extract_features(as_media_table(spark, sf_dir))


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("out_width", T.IntegerType()),
        T.StructField("out_height", T.IntegerType()),
        T.StructField("resized", T.BinaryType()),
    ]
)


def resize_images(media: DataFrame, target_w: int = 64, target_h: int = 48) -> DataFrame:
    """Resize kernel for image rows: metadata-filtered BEFORE the Python
    boundary (only `image` rows cross; audio/video never pay the Arrow
    transfer), then an Arrow-batched mapInPandas pass rewrites payloads.

    The resample itself is STUBBED (no PIL in this container): a real
    deployment decodes, resamples to (target_w, target_h), re-encodes;
    the stub emits a deterministic byte slice with the same output
    contract (binary payload + new dims) so schema/partitioning/batch
    plumbing is testable end-to-end.
    """
    images = media.filter(F.col("media_type") == "image")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n_out = target_w * target_h // 64  # stand-in for re-encoded size
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "out_width": target_w,
                    "out_height": target_h,
                    "resized": [
                        bytes(p[i % len(p)] for i in range(n_out)) for p in pdf["payload"]
                    ],
                }
            )

    return images.mapInPandas(kernel, RESIZE_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_no", T.IntegerType()),
        T.StructField("frame_offset", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """Frame sampling for video rows: one input row fans out to
    n_frames output rows (a flatMap through mapInPandas — the iterator
    contract allows output cardinality != input cardinality).

    STUBBED decode: real ffmpeg would seek to n uniformly-spaced
    timestamps; the stub slices n uniformly-spaced byte windows, which
    preserves exactly the plumbing that matters on a cluster — fan-out
    ratio, per-batch memory (frames stream out batch by batch, the
    whole video never materializes), and a binary output column.
    """
    videos = media.filter(F.col("media_type") == "video")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, offs, frames = [], [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                step = max(len(p) // n_frames, 1)
                for k in range(n_frames):
                    off = (k * step) % len(p)
                    ids.append(doc_id)
                    nos.append(k)
                    offs.append(off)
                    frames.append(bytes(p[off : off + 16]))
            yield pd.DataFrame(
                {"doc_id": ids, "frame_no": nos, "frame_offset": offs, "frame": frames}
            )

    return videos.mapInPandas(kernel, FRAME_SCHEMA)


@query(
    "q_multimodal_frames",
    oracle="""
    SELECT doc_id, CAST(frame_no AS INTEGER) AS frame_no
    FROM (SELECT doc_id FROM documents WHERE doc_id % 3 = 2),
         (SELECT unnest(range(4)) AS frame_no)
    """,
)
def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sample fan-out: every video row yields exactly 4 frame
    rows. The (doc_id, frame_no) spine is oracle-checked (the stubbed
    frame bytes themselves are Spark-only, so they stay out of the
    projection)."""
    frames = sample_frames(as_media_table(spark, sf_dir), n_frames=4)
    return frames.select("doc_id", "frame_no")


@query(
    "q_multimodal_dedup",
    oracle="""
    SELECT doc_id, payload_hash, n_copies
    FROM (
        SELECT doc_id, md5(text) AS payload_hash,
               CAST(count(*) OVER (PARTITION BY md5(text)) AS BIGINT)
                   AS n_copies,
               row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id)
                   AS rn
        FROM documents
    )
    WHERE rn = 1
    ORDER BY doc_id
    """,
)
def q_multimodal_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact media dedup: hash the opaque BINARY payload, keep the
    lowest-id representative per hash, report the copy count — the
    multimodal member of the dedup ladder (operators/dedup.py). At
    100 TB the shuffle carries only (hash, doc_id, n_bytes): payload
    bytes never move, because the hash is computed in the scan stage
    next to the data. The fixture payload is documents.text as utf-8
    (as_media_table), so DuckDB's md5(text) is byte-identical to
    Spark's md5(binary) and the whole dedup value-checks."""
    from pyspark.sql import Window as W

    media = as_media_table(spark, sf_dir)
    win = W.partitionBy("payload_hash")
    return (
        media.select("doc_id", F.md5("payload").alias("payload_hash"))
        .withColumn(
            "n_copies", F.count(F.lit(1)).over(win).cast("bigint")
        )
        .withColumn(
            "rn",
            F.row_number().over(win.orderBy("doc_id")),
        )
        .filter(F.col("rn") == 1)
        .select("doc_id", "payload_hash", "n_copies")
        .orderBy("doc_id")
    )
