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


def test_resize_nearest_neighbor_kernel():
    """The resize gather is the standard nearest-neighbor mapping, checked
    on hand-computable grids through the same code path the operator runs:
    a constant image resizes to the constant (sum = 64·v, max = v) whether
    down- or up-sampled, and a single-bright-pixel image keeps its max only
    when the mapping selects that source pixel."""
    import numpy as np

    from toy_vector_db_spark.operators.multimodal import (
        OUT_H,
        OUT_W,
        _nn_resize as nn_resize,
    )

    # downsample: constant 16x16 → constant 8x8
    const = np.full((16, 16, 1), 7, dtype=np.uint8)
    r = nn_resize(const)
    assert r.shape == (OUT_H, OUT_W, 1)
    assert int(r.sum()) == OUT_H * OUT_W * 7 and int(r.max()) == 7
    # upsample: constant 2x16 → rows replicate, still constant
    small = np.full((2, 16, 1), 9, dtype=np.uint8)
    r = nn_resize(small)
    assert int(r.sum()) == OUT_H * OUT_W * 9
    # selection: bright pixel at (0, 0) is always sampled (i=j=0 maps to
    # source (0, 0)); bright pixel at an odd column of a 16-wide image is
    # never sampled (cols = 0,2,4,... for w=16, OUT_W=8)
    img = np.zeros((16, 16, 1), dtype=np.uint8)
    img[0, 0, 0] = 255
    assert int(nn_resize(img).max()) == 255
    img = np.zeros((16, 16, 1), dtype=np.uint8)
    img[0, 1, 0] = 255
    assert int(nn_resize(img).max()) == 0


def test_resize_stats_bounds(spark, documents):
    """Operator-level invariants at fixture scale: fixed output shape,
    px_max ≤ 255, px_sum ≤ 64·255, and px_max never exceeds the source
    image's max byte (resize samples, never invents pixels)."""
    stats = multimodal.resize_image_stats(documents)
    decode = multimodal.decode_image_stats(documents).select(
        "doc_id", F.col("px_max").alias("src_max")
    )
    bad = (
        stats.join(decode, "doc_id")
        .where(
            (F.col("out_h") != multimodal.OUT_H)
            | (F.col("out_w") != multimodal.OUT_W)
            | (F.col("px_max") > F.col("src_max"))
            | (F.col("px_sum") > multimodal.OUT_H * multimodal.OUT_W * 255)
            | (F.col("px_sum") < 0)
        )
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
