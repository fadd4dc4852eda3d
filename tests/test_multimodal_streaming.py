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


def test_library_codecs_still_stubbed():
    """Mimes that need real imaging libs keep the documented swap point."""
    with pytest.raises(NotImplementedError):
        multimodal._decode_payload(b"\x00", "image/png")


def test_raw_codec_decodes_for_real():
    """The RAW_MIME codec round-trips: header parse, magic check, pixel
    reshape — a real decode through the single swap-point function."""
    import numpy as np

    w, h, c = 3, 2, 1
    pixels = bytes(range(w * h * c))
    payload = (
        multimodal.RAW_MAGIC
        + w.to_bytes(2, "big")
        + h.to_bytes(2, "big")
        + bytes([c])
        + pixels
    )
    img = multimodal._decode_payload(payload, multimodal.RAW_MIME)
    assert img.shape == (h, w, c)
    assert img.dtype == np.uint8
    assert bytes(img.reshape(-1)) == pixels
    with pytest.raises(ValueError):
        multimodal._decode_payload(b"XXXX" + payload[4:], multimodal.RAW_MIME)


def test_decode_image_stats_roundtrip(spark, documents):
    """JVM-framed payloads decode back to the source bytes: px_sum equals
    the byte sum of the text, height*IMG_W == n_pixels, and the empty doc
    (if any) yields a 0-pixel image."""
    stats = multimodal.decode_image_stats(documents)
    src = documents.select(
        "doc_id",
        F.aggregate(
            F.transform(
                F.split(F.col("text"), ""),
                lambda ch: F.coalesce(F.ascii(ch), F.lit(0)),
            ),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ).alias("byte_sum"),
    )
    joined = stats.join(src, "doc_id")
    bad = joined.where(
        (F.col("px_sum") != F.col("byte_sum"))
        | (F.col("n_pixels") != F.col("height") * multimodal.IMG_W)
    )
    assert bad.count() == 0


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
