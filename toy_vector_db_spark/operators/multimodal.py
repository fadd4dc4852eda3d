"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Training-data pipelines carry image/audio/video as binary columns with
metadata; the Spark-side contract is (a) binary stays opaque to Catalyst,
(b) decode/feature-extraction runs as Arrow-batched Python over
``mapInPandas``, (c) metadata extraction that doesn't need decoding stays
in codegen'd JVM expressions.

The harness container ships no image/audio libraries, so decode for REAL
codecs (JPEG/PNG/WAV/...) is out of reach — but ``_decode_payload`` is no
longer a pure stub: it implements one trivial deterministic codec, the
header-framed raw-gray format below (``RAW_MIME``), so the mapInPandas
decode hook runs for real end-to-end (header parse → pixel buffer →
image-shaped ndarray → integer stats, oracle-checked). Library-backed
mimes still raise NotImplementedError at the same single swap point.

The fixture corpus has no binary table, so payloads are derived
deterministically from documents.text (utf-8 encode) — both engines
compute the same bytes, keeping the metadata operator oracle-checkable.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from toy_vector_db_spark.functions.rounding import rnd

FEATURE_DIM = 8


def with_payload(docs: DataFrame) -> DataFrame:
    """Derive a binary payload column (+ mime tag) from the text fixture."""
    return docs.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("text/plain").alias("mime"),
    )


def payload_metadata(docs: DataFrame) -> DataFrame:
    """Metadata that needs no decode: byte length, sha256, head byte —
    pure JVM expressions over the binary column."""
    p = with_payload(docs)
    return p.select(
        "doc_id",
        "mime",
        F.length("payload").alias("n_bytes"),
        F.sha2("payload", 256).alias("sha256"),
        F.ascii(F.substring(F.col("payload").cast("string"), 1, 1)).alias("head_byte"),
    )


# Toy raw-image codec: 9-byte header (4-byte magic "RAWI", 2-byte
# big-endian width, 2-byte big-endian height, 1-byte channels) followed by
# exactly width*height*channels uint8 pixels, row-major. No libraries
# needed, fully deterministic — the smallest format that still exercises a
# real decode: magic check, dimension parse, buffer reshape.
RAW_MAGIC = b"RAWI"
RAW_MIME = "image/x-raw"
IMG_W = 16  # fixed row width when framing text bytes as a gray image


def _decode_payload(payload: bytes, mime: str) -> np.ndarray:
    """The decode hook (image/audio/video → pixel/sample array).

    ``image/x-raw`` decodes for real (header-framed raw gray/RGB, above).
    Library-backed codecs are unavailable in this container; production
    swaps in PIL/libav HERE — one function, same (payload, mime) → ndarray
    contract."""
    if mime == RAW_MIME:
        if payload[:4] != RAW_MAGIC:
            raise ValueError(f"bad raw-image magic: {payload[:4]!r}")
        w = int.from_bytes(payload[4:6], "big")
        h = int.from_bytes(payload[6:8], "big")
        c = payload[8]
        # loud on corruption: a truncated/overflowed header (e.g. height
        # past the 2-byte field) must not silently decode a pixel prefix
        if len(payload) - 9 != w * h * c:
            raise ValueError(
                f"raw-image payload length {len(payload) - 9} != "
                f"header dims {w}x{h}x{c}"
            )
        pixels = np.frombuffer(payload, dtype=np.uint8, count=w * h * c, offset=9)
        return pixels.reshape(h, w, c)
    raise NotImplementedError(
        f"decoding {mime!r} requires imaging/audio libraries not present "
        "in this environment; production swaps this one function"
    )


def with_image_payload(docs: DataFrame) -> DataFrame:
    """Frame each document's bytes as a RAW_MIME image payload: header
    (magic, width=IMG_W, height=ceil(len/IMG_W), channels=1) + the text
    bytes zero-padded to height*IMG_W pixels. Pure JVM expressions — the
    binary column is assembled in codegen (concat of unhex'd header fields
    and the NUL-padded encode), no Python until the decode kernel.
    Char-length == byte-length by the ASCII fixture invariant documented
    at FRAME_SAMPLE_SQL."""
    h = F.ceil(F.length("text") / F.lit(float(IMG_W))).cast("int")
    header = F.concat(
        F.lit(RAW_MAGIC),
        F.unhex(F.lpad(F.conv(F.lit(IMG_W).cast("string"), 10, 16), 4, "0")),
        F.unhex(F.lpad(F.conv(h.cast("string"), 10, 16), 4, "0")),
        F.unhex(F.lit("01")),
    )
    pixels = F.expr(
        f"encode(rpad(text, cast(ceil(length(text) / {IMG_W}.0) AS INT)"
        f" * {IMG_W}, chr(0)), 'UTF-8')"
    )
    return docs.select(
        "doc_id",
        F.concat(header, pixels).alias("payload"),
        F.lit(RAW_MIME).alias("mime"),
    )


def decode_image_stats(docs: DataFrame) -> DataFrame:
    """Decode the RAW_MIME payloads FOR REAL (magic check, header parse,
    buffer reshape via ``_decode_payload``) and emit exact-integer image
    stats — height, n_pixels, pixel sum/max. Arrow-batched mapInPandas,
    one pass, no shuffle; every output is an integer ≤ 2^40 so the DuckDB
    oracle (byte math over the source text) hashes exactly."""
    p = with_image_payload(docs)

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "height": [], "width": [],
                   "n_pixels": [], "px_sum": [], "px_max": []}
            for doc_id, payload, mime in zip(
                pdf["doc_id"], pdf["payload"], pdf["mime"]
            ):
                img = _decode_payload(bytes(payload), mime)
                h, w, _c = img.shape
                out["doc_id"].append(doc_id)
                out["height"].append(h)
                out["width"].append(w)
                out["n_pixels"].append(img.size)
                out["px_sum"].append(int(img.sum()) if img.size else 0)
                out["px_max"].append(int(img.max()) if img.size else 0)
            yield pd.DataFrame(out)

    return p.mapInPandas(
        _stats,
        schema="doc_id long, height long, width long, n_pixels long, "
        "px_sum long, px_max long",
    )


# Exact-integer oracle for decode_image_stats: the decoded pixels ARE the
# text bytes zero-padded to height*IMG_W (padding adds 0 to the sum and
# never wins the max; the empty doc decodes to a 0-pixel image → coalesce).
# ASCII invariant as for FRAME_SAMPLE_SQL: ascii codes == payload bytes.
DECODE_IMAGE_SQL = f"""
SELECT doc_id,
       CAST(ceil(length(text) / {IMG_W}.0) AS BIGINT) AS height,
       CAST({IMG_W} AS BIGINT) AS width,
       CAST(ceil(length(text) / {IMG_W}.0) * {IMG_W} AS BIGINT) AS n_pixels,
       CAST(coalesce(list_sum(list_transform(range(1, length(text) + 1),
             i -> ascii(substring(text, i, 1)))), 0) AS BIGINT) AS px_sum,
       CAST(coalesce(list_max(list_transform(range(1, length(text) + 1),
             i -> ascii(substring(text, i, 1)))), 0) AS BIGINT) AS px_max
FROM documents
"""


OUT_H = 8  # fixed resize target (model-input shape in a real pipeline)
OUT_W = 8


def _nn_resize(img: np.ndarray) -> np.ndarray:
    """Nearest-neighbor gather to the fixed OUT_H×OUT_W grid: output
    (i, j) reads source (⌊i·h/OUT_H⌋, ⌊j·w/OUT_W⌋). The unit-testable
    kernel resize_image_stats runs per row (tests import THIS function,
    so a mapping typo can't hide behind a test-local copy)."""
    h, w, _c = img.shape
    rows = (np.arange(OUT_H) * h) // OUT_H
    cols = (np.arange(OUT_W) * w) // OUT_W
    return img[rows][:, cols]


def resize_image_stats(docs: DataFrame) -> DataFrame:
    """Nearest-neighbor resize of the decoded RAW_MIME images to a fixed
    OUT_H×OUT_W model-input grid — the resize verb of the multimodal
    pipeline (decode → RESIZE → feature-extract), and like the decode key
    it runs FOR REAL: ``_decode_payload`` parses/reshapes the pixel
    buffer, then a numpy fancy-index gather picks source pixel
    (⌊i·h/OUT_H⌋, ⌊j·w/OUT_W⌋) for each output (i, j) — the standard
    nearest-neighbor mapping, handling both down- and up-sampling (rows
    replicate when h < OUT_H). Arrow-batched mapInPandas, one pass, no
    shuffle; at 100 TB this is a per-row kernel over the binary column
    with a fixed 64-pixel output — cost is one decode + 64 gathers per
    payload regardless of knobs. Emits exact-integer stats of the
    resized grid (sum ≤ 64·255, max ≤ 255) so the DuckDB byte-math
    oracle (RESIZE_SQL) hashes exactly; the zero-pixel image (empty doc)
    resizes to all-zeros by definition."""
    p = with_image_payload(docs)

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "src_h": [], "out_h": [], "out_w": [],
                   "px_sum": [], "px_max": []}
            for doc_id, payload, mime in zip(
                pdf["doc_id"], pdf["payload"], pdf["mime"]
            ):
                img = _decode_payload(bytes(payload), mime)
                h, w, _c = img.shape
                if img.size == 0:
                    px_sum, px_max = 0, 0
                else:
                    resized = _nn_resize(img)
                    px_sum = int(resized.sum())
                    px_max = int(resized.max())
                out["doc_id"].append(doc_id)
                out["src_h"].append(h)
                out["out_h"].append(OUT_H)
                out["out_w"].append(OUT_W)
                out["px_sum"].append(px_sum)
                out["px_max"].append(px_max)
            yield pd.DataFrame(out)

    return p.mapInPandas(
        _resize,
        schema="doc_id long, src_h long, out_h long, out_w long, "
        "px_sum long, px_max long",
    )


# Exact-integer oracle for resize_image_stats: output pixel (i, j) of the
# nearest-neighbor resize is source pixel (i·h//OUT_H, j·IMG_W//OUT_W),
# whose value is the text byte at row·IMG_W+col when that position is
# inside the text and 0 in the zero-padding (and the h=0 empty image
# yields position col+1 > length 0 → 0 everywhere, matching the
# all-zeros resize). ASCII invariant as for FRAME_SAMPLE_SQL.
_RESIZE_PX = (
    f"CASE WHEN (((idx // {OUT_W}) * h) // {OUT_H}) * {IMG_W}"
    f" + ((idx % {OUT_W}) * {IMG_W}) // {OUT_W} + 1 <= length(text)"
    f" THEN ascii(substring(text,"
    f" CAST((((idx // {OUT_W}) * h) // {OUT_H}) * {IMG_W}"
    f" + ((idx % {OUT_W}) * {IMG_W}) // {OUT_W} + 1 AS INT), 1))"
    f" ELSE 0 END"
)
RESIZE_SQL = f"""
SELECT doc_id,
       h AS src_h,
       CAST({OUT_H} AS BIGINT) AS out_h,
       CAST({OUT_W} AS BIGINT) AS out_w,
       CAST(list_sum(list_transform(range(0, {OUT_H * OUT_W}),
             idx -> {_RESIZE_PX})) AS BIGINT) AS px_sum,
       CAST(list_max(list_transform(range(0, {OUT_H * OUT_W}),
             idx -> {_RESIZE_PX})) AS BIGINT) AS px_max
FROM (SELECT doc_id, text,
             CAST(ceil(length(text) / {IMG_W}.0) AS BIGINT) AS h
      FROM documents)
"""


def _fake_features(payload: bytes) -> np.ndarray:
    """Deterministic stand-in feature extractor: byte-histogram moments.
    Stable across runs/partitions — lets the distributed plumbing be tested
    end-to-end without decode libs."""
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.float64)
    if arr.size == 0:
        return np.zeros(FEATURE_DIM, dtype=np.float32)
    feats = np.array(
        [
            arr.size,
            arr.mean(),
            arr.std(),
            arr.min(),
            arr.max(),
            np.median(arr),
            float((arr < 64).mean()),
            float((arr >= 96).mean()),
        ],
        dtype=np.float64,
    )
    return feats.astype(np.float32)


def extract_features(docs: DataFrame, use_real_decoder: bool = False) -> DataFrame:
    """Arrow-batched feature extraction over the binary column via
    mapInPandas — the scale path for any per-payload Python: one pass, no
    shuffle, batch-vectorized, output schema fixed (id + array<float>)."""
    p = with_payload(docs)

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload, mime in zip(pdf["payload"], pdf["mime"]):
                if use_real_decoder:
                    decoded = _decode_payload(bytes(payload), mime)
                    feats.append(decoded.astype(np.float32)[:FEATURE_DIM])
                else:
                    feats.append(_fake_features(bytes(payload)))
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "features": [f.tolist() for f in feats]}
            )

    return p.mapInPandas(_extract, schema="doc_id long, features array<float>")


FRAME_BYTES = 16
FRAME_STRIDE = 4  # sample every 4th frame
_P31 = 2_147_483_647


def frame_sample(docs: DataFrame) -> DataFrame:
    """Frame sampling over a 'video' payload: treat the binary as a stream
    of FRAME_BYTES-sized frames, keep every FRAME_STRIDE-th frame, emit
    frame counts + a checksum of the sampled bytes. Runs as Arrow-batched
    mapInPandas (the real decode/resize hook sits where the checksum is
    computed — resize is decode-dependent and stubbed with it). The byte
    math is deterministic, so the operator is SQL-oracle-checkable."""
    p = with_payload(docs)

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "n_frames": [], "n_sampled": [], "checksum": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                n_frames = (len(b) + FRAME_BYTES - 1) // FRAME_BYTES
                acc = 0
                n_sampled = 0
                for f in range(0, n_frames, FRAME_STRIDE):
                    frame = b[f * FRAME_BYTES:(f + 1) * FRAME_BYTES]
                    acc = (acc + sum(frame)) % _P31
                    n_sampled += 1
                out["doc_id"].append(doc_id)
                out["n_frames"].append(n_frames)
                out["n_sampled"].append(n_sampled)
                out["checksum"].append(acc)
            yield pd.DataFrame(out)

    return p.mapInPandas(
        _sample,
        schema="doc_id long, n_frames long, n_sampled long, checksum long",
    )


# NOTE: char-based (ascii()/length) vs the operator's byte-based sum — valid
# because the documents fixture is ASCII-only (verified: octet_length==length
# for every row at sf0.001/0.01/0.1). Non-ASCII corpora would need a byte-
# level oracle. The CAST(... AS BIGINT) is load-bearing: DuckDB's list_sum
# returns HUGEINT, which fetchdf() materializes as float64 and breaks the
# driver's type-sensitive value hash even when every value matches.
FRAME_SAMPLE_SQL = f"""
SELECT doc_id,
       CAST(ceil(length(text) / {FRAME_BYTES}.0) AS BIGINT) AS n_frames,
       CAST(ceil(ceil(length(text) / {FRAME_BYTES}.0) / {FRAME_STRIDE}.0) AS BIGINT)
         AS n_sampled,
       CAST(list_sum(list_transform(range(1, length(text) + 1),
         i -> CASE WHEN (((i - 1) // {FRAME_BYTES}) % {FRAME_STRIDE}) = 0
                   THEN ascii(substring(text, i, 1)) ELSE 0 END)) % {_P31}
         AS BIGINT) AS checksum
FROM documents
"""


def feature_summary(docs: DataFrame) -> DataFrame:
    """Project the EXACT-integer features (size, min, max byte) out of the
    extracted feature vector — exercises the full pipeline (binary → Python
    batch → array column → JVM projection) while staying driver-oracle-able:
    these values are integers ≤ 2^24, exactly representable in the float32
    feature slots, so no float-rounding divergence is possible. The float
    moments (mean/std/median) are covered by the tolerance-based twin test
    (tests/test_multimodal_streaming.py), not the exact-hash oracle."""
    feats = extract_features(docs)
    return feats.select(
        "doc_id",
        F.element_at("features", 1).cast("long").alias("n_bytes"),
        F.element_at("features", 4).cast("long").alias("min_byte"),
        F.element_at("features", 5).cast("long").alias("max_byte"),
    )


# Exact-integer oracle for feature_summary (see its docstring). ASCII-only
# fixture invariant as for FRAME_SAMPLE_SQL: ascii codes == payload bytes.
# COALESCE guards the empty-text row (list_min/list_max of [] is NULL;
# _fake_features returns zeros).
FEATURE_EXTRACT_SQL = """
SELECT doc_id,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       CAST(coalesce(list_min(list_transform(range(1, length(text) + 1),
             i -> ascii(substring(text, i, 1)))), 0) AS BIGINT) AS min_byte,
       CAST(coalesce(list_max(list_transform(range(1, length(text) + 1),
             i -> ascii(substring(text, i, 1)))), 0) AS BIGINT) AS max_byte
FROM documents
"""
