"""Edge cases: degenerate inputs the fixtures never produce but a real
deployment will (empty base, k > n, single-point graphs), plus
hypothesis-driven properties of the split arithmetic."""

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from toy_vector_db_spark.operators import hnsw, knn
from toy_vector_db_spark.operators.hnsw import HNSWIndex, LocalHNSW
from toy_vector_db_spark.sources.ndjson import split_count


def test_knn_k_larger_than_base(spark, embeddings):
    base = embeddings.where(F.col("vec_id") < 3)
    q = embeddings.orderBy("vec_id").first().embedding
    rows = knn.knn_exact_single(base, q, 100).collect()
    assert len(rows) == 3  # k > n returns all of n, no error


def test_knn_empty_base(spark, embeddings):
    base = embeddings.where(F.col("vec_id") < 0)
    q = embeddings.orderBy("vec_id").first().embedding
    assert knn.knn_exact_single(base, q, 5).collect() == []


def test_batch_knn_empty_sides(spark, embeddings):
    """The pair_scores kernel path must survive degenerate sides: an
    empty BASE yields zero batches (empty result), and an empty QUERY
    set short-circuits before the kernel (an empty closure array would
    break the (nq, d) slicing)."""
    qs = embeddings.limit(2).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    empty_base = embeddings.where(F.col("vec_id") < 0)
    assert knn.knn_exact_batch(empty_base, qs, 5).collect() == []
    empty_qs = qs.where(F.col("query_id") < 0)
    assert knn.knn_exact_batch(embeddings, empty_qs, 5).collect() == []
    assert knn.argmin_dist(embeddings, empty_qs).collect() == []


def test_local_hnsw_single_point():
    import numpy as np

    idx = LocalHNSW(np.ones((1, 4)))
    idx.build([hnsw.deterministic_level(0)])
    res = idx.search(np.ones(4), ef=10)
    assert [i for _, i in res] == [0]


def test_hnsw_index_protocol(spark, embeddings):
    qs = embeddings.where(F.col("vec_id") >= 495).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    idx = HNSWIndex(num_partitions=4).insert_many(
        embeddings.where(F.col("vec_id") < 250)
    ).insert_many(
        embeddings.where((F.col("vec_id") >= 250) & (F.col("vec_id") < 495))
    )
    res = idx.search(qs, 5)
    per_q = res.groupBy("query_id").count().collect()
    assert all(r["count"] == 5 for r in per_q)
    assert res.agg(F.max("vec_id")).first()[0] < 495  # only inserted points


@given(n=st.integers(0, 10**9), ratio=st.floats(0.0, 1.0))
@settings(max_examples=200, deadline=None)
def test_split_count_properties(n, ratio):
    cut = split_count(n, ratio)
    assert 0 <= cut <= n
    # round-half-away: within 1/2 of the exact product
    assert abs(cut - n * ratio) <= 0.5


@given(st.integers(0, 2**62))
@settings(max_examples=200, deadline=None)
def test_deterministic_level_bounds(vid):
    lvl = hnsw.deterministic_level(vid)
    assert 0 <= lvl <= hnsw.L - 1
    assert hnsw.deterministic_level(vid) == lvl  # pure function
