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


def test_unimplemented_mimes_keep_the_swap_point():
    """RAW/PNG/JPEG/WAV are all real now; a mime with no in-container
    implementation still raises at the single swap-point function."""
    with pytest.raises(NotImplementedError):
        multimodal._decode_payload(b"\x00\x00\x00\x18ftyp", "video/mp4")


def test_jpeg_payload_frame_only_empty_docs_stay_raw(spark, documents):
    """with_jpeg_payload mirrors the PNG framing contract: every
    non-empty document becomes a real JPEG (SOI magic), the RAW fallback
    is taken only by empty docs."""
    p = multimodal.with_jpeg_payload(documents)
    rows = p.collect()
    empty_ids = {
        r.doc_id
        for r in documents.where(F.length("text") == 0).select("doc_id").collect()
    }
    for r in rows:
        if r.doc_id in empty_ids:
            assert r.mime == multimodal.RAW_MIME
        else:
            assert r.mime == multimodal.JPEG_MIME
            assert bytes(r.payload[:2]) == b"\xff\xd8"


def test_jpeg_stats_within_tol_everywhere(spark, documents):
    """The corpus-wide tolerance verdict the driver hashes: every doc's
    JPEG round-trip lands within JPEG_TOL of the source pixels."""
    rows = multimodal.decode_jpeg_stats(documents).collect()
    assert rows and all(r.within_tol for r in rows)


def test_png_codec_roundtrips_all_filters():
    """The from-scratch PNG codec (stdlib zlib only): lossless round-trip
    across shapes, deterministic bytes, all FIVE public scanline filters
    present in any ≥5-row stream (the encoder cycles them by row, so the
    decoder's Sub/Up/Average/Paeth unfilters are all load-bearing), and
    loud failure on CRC corruption, bad signature, truncated IDAT."""
    import zlib

    import numpy as np

    rng = np.random.default_rng(7)
    for h, w in [(1, 1), (1, 16), (7, 16), (16, 1), (40, 16), (200, 16)]:
        img = rng.integers(0, 256, size=(h, w, 1), dtype=np.uint8)
        png = multimodal._encode_png(img)
        assert png[:8] == multimodal._PNG_SIG
        dec = multimodal._decode_payload(png, multimodal.PNG_MIME)
        assert dec.shape == img.shape and (dec == img).all(), (h, w)
    img = rng.integers(0, 256, size=(10, 16, 1), dtype=np.uint8)
    png = multimodal._encode_png(img)
    assert png == multimodal._encode_png(img)  # deterministic
    # every filter type appears in the filtered stream
    pos, idat = 8, b""
    while pos < len(png):
        n = int.from_bytes(png[pos:pos + 4], "big")
        if png[pos + 4:pos + 8] == b"IDAT":
            idat += png[pos + 8:pos + 8 + n]
        pos += 12 + n
    lines = zlib.decompress(idat)
    assert {lines[r * 17] for r in range(10)} == {0, 1, 2, 3, 4}
    corrupt = bytearray(png)
    corrupt[40] ^= 0xFF
    with pytest.raises(ValueError):
        multimodal._decode_png(bytes(corrupt))
    with pytest.raises(ValueError):
        multimodal._decode_png(b"not a png at all")
    with pytest.raises(ValueError):
        # drop IEND + truncate the inflated size check's input
        multimodal._decode_png(
            png[:8]
            + png[8:33]  # IHDR chunk only
        )


def test_png_payload_frame_only_empty_docs_stay_raw(spark, documents):
    """with_png_payload re-frames every non-empty document as a PNG; the
    RAW fallback (PNG has no 0-height form) is taken ONLY by empty docs,
    so the codec path can't silently decay to the raw framing."""
    p = multimodal.with_png_payload(documents)
    raw_ids = [
        r.doc_id for r in p.where(F.col("mime") == multimodal.RAW_MIME).collect()
    ]
    empty_ids = [
        r.doc_id
        for r in documents.where(F.length("text") == 0).select("doc_id").collect()
    ]
    assert sorted(raw_ids) == sorted(empty_ids)


def test_png_stats_equal_raw_stats(spark, documents):
    """PNG is lossless: the decoded-PNG stats frame is row-identical to
    the raw-decode stats frame (they share one oracle)."""
    a = multimodal.decode_image_stats(documents).orderBy("doc_id").collect()
    b = multimodal.decode_png_stats(documents).orderBy("doc_id").collect()
    assert a == b


def test_png_rgb_codec_roundtrips_all_filters():
    """Color type 2 (round 14): lossless RGB round-trip across shapes,
    deterministic bytes, IHDR color byte 2, and all FIVE scanline
    filters present in any ≥5-row stream — with the bpp=3 byte offset
    load-bearing (a gradient image makes Sub/Paeth predictions differ
    between offset 1 and offset 3, so an offset bug cannot round-trip).
    Corruption stays loud on the color path too."""
    import zlib

    import numpy as np

    rng = np.random.default_rng(11)
    for h, w in [(1, 1), (1, 16), (7, 16), (16, 1), (40, 16), (200, 16)]:
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        png = multimodal._encode_png(img)
        assert png[:8] == multimodal._PNG_SIG
        assert png[8 + 8 + 9] == 2  # IHDR color type (8 sig + len/type + 9)
        dec = multimodal._decode_payload(png, multimodal.PNG_MIME)
        assert dec.shape == img.shape and (dec == img).all(), (h, w)
    # a channel-wise gradient: adjacent BYTES differ from adjacent PIXELS,
    # so a decoder unfiltering at offset 1 instead of bpp=3 corrupts rows
    grad = (
        np.arange(10 * 16 * 3, dtype=np.int64).reshape(10, 16, 3) * 7 % 256
    ).astype(np.uint8)
    png = multimodal._encode_png(grad)
    assert png == multimodal._encode_png(grad)  # deterministic
    assert (multimodal._decode_png(png) == grad).all()
    pos, idat = 8, b""
    while pos < len(png):
        n = int.from_bytes(png[pos:pos + 4], "big")
        if png[pos + 4:pos + 8] == b"IDAT":
            idat += png[pos + 8:pos + 8 + n]
        pos += 12 + n
    lines = zlib.decompress(idat)
    rowlen = 16 * 3 + 1
    assert {lines[r * rowlen] for r in range(10)} == {0, 1, 2, 3, 4}
    corrupt = bytearray(png)
    corrupt[40] ^= 0xFF
    with pytest.raises(ValueError):
        multimodal._decode_png(bytes(corrupt))


def test_png_rgb_stats_exact_on_synthetic_docs(spark):
    """Exact per-channel byte math on controlled text: byte i (1-based)
    is channel (i−1)%3; zero padding to the 48-byte stride contributes 0
    to sums and never wins a max. Empty docs decode to the 0-pixel image
    with all-zero stats."""
    docs = spark.createDataFrame(
        [(1, "abcde"), (2, "")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in multimodal.decode_png_rgb_stats(docs).collect()}
    a, b, c, d, e = (ord(ch) for ch in "abcde")
    r1 = rows[1]
    assert (r1.height, r1.width, r1.n_pixels) == (1, 16, 48)
    assert (r1.r_sum, r1.g_sum, r1.b_sum) == (a + d, b + e, c)
    assert (r1.r_max, r1.g_max, r1.b_max) == (d, e, c)
    r2 = rows[2]
    assert (r2.height, r2.n_pixels, r2.r_sum, r2.b_max) == (0, 0, 0, 0)


def test_audio_features_on_synthetic_signal(spark):
    """Mean-crossing math on controlled signals (the ASCII corpus only
    drives a narrow byte range, so the kernel is pinned on synthetic
    inputs): a strict alternation crosses its mean at every step, a
    constant signal never does, and energy/peak/range are plain sums."""
    docs = spark.createDataFrame(
        [(1, "aAaAaAaA"), (2, "mmmm"), (3, "")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in multimodal.audio_features(docs).collect()}
    # 'a'=97, 'A'=65 alternating: mean 81, above-flag flips every sample
    assert rows[1].mean_crossings == 7
    assert rows[1].energy == 4 * 97 * 97 + 4 * 65 * 65
    assert rows[1].peak == 97 and rows[1].dyn_range == 32
    assert rows[2].mean_crossings == 0 and rows[2].dyn_range == 0
    assert rows[3].n_samples == 0 and rows[3].energy == 0


def test_scene_cuts_on_synthetic_frames(spark):
    """Frame L1 distances on controlled payloads: two identical frames →
    no cut; an 'a'*16 frame followed by 'z'*16 differs by 16·25 = 400 >
    SCENE_THRESHOLD → one cut; sub-frame docs have no pair."""
    docs = spark.createDataFrame(
        [(1, "a" * 32), (2, "a" * 16 + "z" * 16), (3, "abc"), (4, "")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in multimodal.scene_cuts(docs).collect()}
    assert (rows[1].n_cuts, rows[1].max_diff) == (0, 0)
    assert (rows[2].n_cuts, rows[2].max_diff) == (1, 16 * 25)
    assert (rows[3].n_frames, rows[3].n_cuts) == (1, 0)
    assert (rows[4].n_frames, rows[4].n_cuts) == (0, 0)


def test_wav_codec_roundtrip_and_strictness():
    """stdlib-wave container round-trip, incl. the empty payload; a
    non-8-bit/mono layout is rejected loudly."""
    import io
    import wave

    import numpy as np

    for data in [b"", b"hello world", bytes(range(256)) * 3]:
        samples, rate = multimodal._decode_wav(multimodal._encode_wav(data))
        assert rate == multimodal.WAV_RATE and samples.tobytes() == data
        assert samples.dtype == np.uint8
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(2)
        wf.setsampwidth(2)
        wf.setframerate(44100)
        wf.writeframes(b"\x00\x00\x00\x00")
    with pytest.raises(ValueError):
        multimodal._decode_wav(buf.getvalue())


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
