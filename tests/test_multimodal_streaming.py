"""M5d: multimodal plumbing + streaming twins."""

import pytest
from pyspark.sql import functions as F

from toy_vector_db_spark.operators import multimodal, relational


def test_feature_extract_matches_jvm_metadata(spark, documents):
    """The Python (mapInPandas) path and the JVM metadata path must agree on
    byte length — proves the Arrow plumbing round-trips the binary column."""
    feats = multimodal.feature_summary(documents).select("doc_id", "n_bytes")
    meta = multimodal.payload_metadata(documents).select(
        "doc_id", F.col("n_bytes").alias("n_bytes_jvm")
    )
    diff = feats.join(meta, "doc_id").where(
        F.col("n_bytes") != F.col("n_bytes_jvm")
    )
    assert diff.count() == 0


def test_real_decoder_is_stubbed():
    with pytest.raises(NotImplementedError):
        multimodal._decode_payload(b"\x00", "image/png")


def test_feature_schema(spark, documents):
    feats = multimodal.extract_features(documents)
    assert feats.schema.simpleString() == "struct<doc_id:bigint,features:array<float>>"
    row = feats.orderBy("doc_id").first()
    assert len(row.features) == multimodal.FEATURE_DIM


def test_streaming_tumbling_equals_batch(spark, sf_dir):
    from toy_vector_db_spark.registry import table
    from toy_vector_db_spark.streaming import windows

    got = windows.streaming_tumbling_counts(spark, sf_dir)
    want = relational.tumbling_window_batch(table(spark, sf_dir, "events"), 60)
    g = sorted(map(tuple, got.collect()))
    w = sorted(map(tuple, want.collect()))
    assert g == w


def test_streaming_sessions_equal_batch(spark, sf_dir):
    from toy_vector_db_spark.registry import table
    from toy_vector_db_spark.streaming import windows

    got = windows.streaming_session_windows(spark, sf_dir)
    want = relational.sessionize(table(spark, sf_dir, "events"))
    g = sorted(map(tuple, got.collect()))
    w = sorted(map(tuple, want.collect()))
    assert g == w
