"""Semantic properties of the model-inference quality filter (oracle
hash parity runs in tests/test_registry_oracles.py at three SFs)."""

from pyspark.sql import functions as F

from toy_vector_db_spark.operators import inference


def test_model_inference_monotone_and_threshold(spark):
    rows = [
        # high quality: long-ish, all-distinct tokens, stopwords, no digits
        (0, "the quick brown fox jumps over a lazy dog of value and table"),
        # degenerate: one token repeated, no stopwords
        (1, "spam spam spam spam spam spam"),
        # digit-heavy
        (2, "1234567890 1234567890 1234567890"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in inference.model_quality_inference(docs).collect()
    }
    assert len(out) == 3
    # monotonicity of the stub model: clean text above degenerate & digity
    assert out[0]["model_score"] > out[1]["model_score"]
    assert out[0]["model_score"] > out[2]["model_score"]
    # keep flag consistent with the (rounded) score vs threshold, away
    # from the rounding boundary
    for r in out.values():
        if r["model_score"] > inference.KEEP_THRESHOLD + 1e-6:
            assert r["keep"]
        elif r["model_score"] < inference.KEEP_THRESHOLD - 1e-6:
            assert not r["keep"]


def test_model_inference_batch_sizes(spark):
    # the kernel must be batch-shape agnostic (many small partitions)
    docs = spark.createDataFrame(
        [(i, f"tok{i} value table row data {i}") for i in range(100)],
        "doc_id long, text string",
    ).repartition(16)
    out = inference.model_quality_inference(docs)
    assert out.count() == 100
    assert out.select("doc_id").distinct().count() == 100
