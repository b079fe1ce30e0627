"""Multimodal plumbing + parquet sink round-trip (SURVEY §2.1 sink row)."""

from __future__ import annotations

from tests.conftest import SF_SMOKE


def test_media_table_schema(spark):
    from distributed_causal_stream_processing_spark.operators.multimodal import (
        as_media_table,
    )

    m = as_media_table(spark, SF_SMOKE)
    assert dict(m.dtypes)["payload"] == "binary"
    row = m.head()
    assert row.media_type in ("image", "audio", "video")
    assert row.meta.n_bytes == len(row.payload)


def test_feature_extraction_deterministic(spark):
    from distributed_causal_stream_processing_spark.operators.multimodal import (
        as_media_table,
        extract_features,
    )

    m = as_media_table(spark, SF_SMOKE)
    f1 = {r.doc_id: (r.feat_mean, r.feat_dim) for r in extract_features(m).collect()}
    f2 = {r.doc_id: (r.feat_mean, r.feat_dim) for r in extract_features(m).collect()}
    assert f1 == f2 and len(f1) == m.count()
    dims = {r.media_type: r.feat_dim for r in extract_features(m).collect()}
    assert dims == {"image": 8, "audio": 4, "video": 6}


def test_resize_images_contract(spark):
    """Resize kernel: only image rows cross the Python boundary, output
    carries the target dims and a non-empty binary payload."""
    from distributed_causal_stream_processing_spark.operators.multimodal import (
        as_media_table,
        resize_images,
    )

    m = as_media_table(spark, SF_SMOKE)
    out = resize_images(m, target_w=32, target_h=16).collect()
    n_images = m.filter("media_type = 'image'").count()
    assert len(out) == n_images > 0
    for r in out:
        assert (r.out_width, r.out_height) == (32, 16)
        assert isinstance(r.resized, (bytes, bytearray)) and len(r.resized) == 32 * 16 // 64


def test_sample_frames_fanout(spark):
    """Frame sampler: each video row fans out to exactly n_frames rows,
    deterministically, with bounded frame payloads."""
    from distributed_causal_stream_processing_spark.operators.multimodal import (
        as_media_table,
        sample_frames,
    )

    m = as_media_table(spark, SF_SMOKE)
    frames = sample_frames(m, n_frames=3).collect()
    n_videos = m.filter("media_type = 'video'").count()
    assert len(frames) == 3 * n_videos > 0
    per_doc: dict[int, list[int]] = {}
    for r in frames:
        per_doc.setdefault(r.doc_id, []).append(r.frame_no)
        assert 0 < len(r.frame) <= 16
    assert all(sorted(v) == [0, 1, 2] for v in per_doc.values())


def test_parquet_sink_roundtrip(spark, tmp_path):
    """§2.1 parquet sink: write a result table, read it back unchanged."""
    from distributed_causal_stream_processing_spark import all_queries

    out = str(tmp_path / "q1_out")
    df = all_queries()["q_agg_group"](spark, SF_SMOKE)
    df.write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
    # nullability legitimately flips through parquet; names+types must hold
    assert back.dtypes == df.dtypes


def test_orc_csv_json_sink_roundtrip(spark, tmp_path):
    """§2.1 sink matrix beyond parquet: the same result table survives
    ORC (columnar, predicate-pushdown-capable like parquet), CSV, and
    newline-JSON round-trips. CSV/JSON read back with the writer's
    schema (never inference — inference re-scans and drifts types)."""
    from distributed_causal_stream_processing_spark import all_queries

    df = all_queries()["q_agg_group"](spark, SF_SMOKE)
    want = sorted(map(tuple, df.collect()))
    schema = df.schema

    orc_out = str(tmp_path / "orc_out")
    df.write.mode("overwrite").orc(orc_out)
    back = spark.read.orc(orc_out)
    assert sorted(map(tuple, back.collect())) == want
    assert back.dtypes == df.dtypes

    csv_out = str(tmp_path / "csv_out")
    df.write.mode("overwrite").option("header", True).csv(csv_out)
    back = spark.read.schema(schema).option("header", True).csv(csv_out)
    assert sorted(map(tuple, back.collect())) == want

    json_out = str(tmp_path / "json_out")
    df.write.mode("overwrite").json(json_out)
    back = spark.read.schema(schema).json(json_out)
    assert sorted(map(tuple, back.collect())) == want


def test_encoded_media_headers_validate_independently(spark):
    """The generated payloads must be REAL containers: re-parse a PNG
    and a WAV with fresh stdlib struct code (independent of the
    decode kernel), including the PNG CRC the encoder computed with
    Spark's crc32."""
    import binascii
    import struct

    from distributed_causal_stream_processing_spark.operators.multimodal import (
        as_encoded_media_table,
    )

    rows = {
        r.doc_id: bytes(r.payload)
        for r in as_encoded_media_table(spark, SF_SMOKE)
        .filter("doc_id IN (2, 3)")
        .collect()
    }
    png, wav = rows[2], rows[3]
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    assert png[12:16] == b"IHDR"
    assert binascii.crc32(png[12:29]) == struct.unpack(">I", png[29:33])[0]
    assert struct.unpack(">II", png[16:24]) == (2 % 640 + 64, 2 % 480 + 48)
    assert wav[:4] == b"RIFF" and wav[8:12] == b"WAVE" and wav[12:16] == b"fmt "
    fmt_len, audio_fmt, ch, rate = struct.unpack("<IHHI", wav[16:28])
    assert (fmt_len, audio_fmt, ch) == (16, 1, 3 % 2 + 1)
    assert rate == 8000 + (3 % 8) * 4000
    assert wav[36:40] == b"data"
    assert struct.unpack("<I", wav[40:44])[0] == len(wav) - 44


def test_decode_headers_rejects_corrupt_payloads(spark):
    """Corrupt magic or a wrong CRC must fail loudly, not yield nulls."""
    import pytest as _pytest

    from distributed_causal_stream_processing_spark.operators.multimodal import (
        decode_headers,
    )

    bad = spark.createDataFrame(
        [(1, bytearray(b"NOTAPNGORWAVE___" * 4))], "doc_id long, payload binary"
    )
    with _pytest.raises(Exception, match="unknown container"):
        decode_headers(bad).collect()

    # valid PNG signature but zeroed CRC
    hdr = (
        b"\x89PNG\r\n\x1a\n"
        + b"\x00\x00\x00\x0dIHDR"
        + b"\x00\x00\x00\x40\x00\x00\x00\x30\x08\x06\x00\x00\x00"
        + b"\x00\x00\x00\x00"
    )
    badcrc = spark.createDataFrame(
        [(1, bytearray(hdr))], "doc_id long, payload binary"
    )
    with _pytest.raises(Exception, match="CRC mismatch"):
        decode_headers(badcrc).collect()


def test_resized_bmp_is_itself_a_decodable_bmp(spark):
    """The resize kernel's output binary is a genuine BMP: feeding the
    resized payloads back through the same kernel succeeds and halves
    the dimensions again — and the re-decoded pixel values match the
    generative formula at stride 2 (proving re-encode wrote real
    pixels, not a byte slice)."""
    from pyspark.sql import functions as F

    from distributed_causal_stream_processing_spark.operators.multimodal import (
        as_raw_media_table,
        resize_bmp,
    )

    once = resize_bmp(as_raw_media_table(spark, SF_SMOKE)).limit(20)
    again = resize_bmp(
        once.select(
            "doc_id", F.lit("bmp").alias("container"), F.col("resized").alias("payload")
        )
    )
    rows = {r.doc_id: r for r in again.collect()}
    assert rows
    for r in once.collect():
        twice = rows[r.doc_id]
        assert twice.out_width == (r.out_width + 1) // 2
        assert twice.out_height == (r.out_height + 1) // 2
        # second decimation samples logical (4x, 4y) of the original
        want = sum(
            (r.doc_id + 7 * (4 * x) + 13 * (4 * y)) % 256
            for x in range(twice.out_width)
            for y in range(twice.out_height)
        )
        assert twice.checksum == want


def test_pcm_frames_cover_all_samples_exactly_once(spark):
    """The 4 frame windows of each WAV partition the decoded sample
    array: lengths sum to n and sums add up to the full-array sum from
    the generative formula."""
    from distributed_causal_stream_processing_spark.operators.multimodal import (
        as_raw_media_table,
        sample_pcm_frames,
    )

    frames = sample_pcm_frames(as_raw_media_table(spark, SF_SMOKE)).collect()
    per: dict[int, list] = {}
    for r in frames:
        per.setdefault(r.doc_id, []).append(r)
    assert per
    for doc_id, rs in per.items():
        n = doc_id % 200 + 50
        assert sum(r.n_samples for r in rs) == n
        want = sum((5 * doc_id + 17 * i) % 32768 for i in range(n))
        assert sum(r.sample_sum for r in rs) == want
