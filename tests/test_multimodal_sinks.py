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
