"""Stateful streaming (applyInPandasWithState) vs batch equivalence, plus
the incremental Index.insert_many path."""

from pyspark.sql import functions as F

from toy_vector_db_spark.operators.knn import ExactKNNIndex
from toy_vector_db_spark.registry import table
from toy_vector_db_spark.streaming import windows


def test_stateful_user_stats_equal_batch(spark, sf_dir):
    got = windows.streaming_stateful_user_stats(spark, sf_dir)
    want = (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n_events"),
             F.round(F.sum("value"), 4).alias("total_value"))
    )
    g = sorted(map(tuple, got.collect()))
    w = sorted(map(tuple, want.collect()))
    assert g == w


def test_incremental_insert_then_search(spark, embeddings):
    """Index trait semantics (src/index.rs:4-10): insert_many twice ≡ one
    batch load; search sees all inserted points."""
    half1 = embeddings.where(F.col("vec_id") % 2 == 0)
    half2 = embeddings.where(F.col("vec_id") % 2 == 1)
    idx = ExactKNNIndex().insert_many(half1).insert_many(half2)
    q = embeddings.orderBy("vec_id").first().embedding
    top = idx.search(q, 5).collect()
    full = ExactKNNIndex().insert_many(embeddings).search(q, 5).collect()
    assert [r.vec_id for r in top] == [r.vec_id for r in full]
    assert top[0].vec_id == 0 and abs(top[0].dist) < 1e-9  # self is nearest
