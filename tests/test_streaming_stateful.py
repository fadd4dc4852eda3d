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


def test_late_data_key_actually_drops_rows(spark, sf_dir):
    """streaming_late_data_counts must EXERCISE the watermark drop — a
    configuration where nothing is late would make its oracle a
    vacuous tumbling count. Assert the kept-row total is strictly
    below the corpus size, and that batches 0-1's rows are never
    dropped (the watermark in force during them predates all data)."""
    from pyspark.sql import functions as F

    from toy_vector_db_spark import registry

    out = registry.queries()["streaming_late_data_counts"](spark, sf_dir)
    kept = out.agg(F.sum("n")).collect()[0][0]
    total = registry.table(spark, sf_dir, "events").count()
    on_time = (
        registry.table(spark, sf_dir, "events")
        .where(F.col("event_id") % 4 <= 1)
        .count()
    )
    assert kept < total, "no row was dropped — the key tests nothing"
    assert kept >= on_time, "an on-time (batch 0/1) row was dropped"
