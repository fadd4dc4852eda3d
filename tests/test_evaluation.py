"""X1-X3 semantics on hand-built result sets (src/evaluation.rs:3-15)."""

import pytest

from toy_vector_db_spark.operators import evaluation


@pytest.fixture(scope="module")
def result_sets(spark):
    # query 1: retrieved ∩ relevant = {10, 11}; query 2: disjoint
    retrieved = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (2, 20), (2, 21)], "query_id long, vec_id long"
    )
    relevant = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 99), (1, 98), (2, 30), (2, 31)],
        "query_id long, vec_id long",
    )
    return retrieved, relevant


def test_intersection_count(result_sets):
    retrieved, relevant = result_sets
    got = {
        r.query_id: r.n_common
        for r in evaluation.intersection_count(retrieved, relevant).collect()
    }
    assert got == {1: 2, 2: 0}  # empty intersection is 0, not absent


def test_recall_precision(result_sets):
    retrieved, relevant = result_sets
    rec = {r.query_id: r.recall for r in
           evaluation.evaluate_recall(retrieved, relevant).collect()}
    prec = {r.query_id: r.precision for r in
            evaluation.evaluate_precision(retrieved, relevant).collect()}
    assert rec == {1: 0.5, 2: 0.0}  # 2/4, 0/2
    assert prec == {1: pytest.approx(2 / 3, abs=1e-6), 2: 0.0}  # 2/3, 0/2


def test_intersection_universe_comes_from_first_arg(spark):
    """Round-8 review: hnsw_recall_gate derives its query universe from
    intersection_count's FIRST argument, which must therefore be the
    EXACT side — a retrieval run that emits zero rows for a query has
    to count as 0 hits for that query, not vanish from the denominator
    (the gate-can't-see-starved-queries hole)."""
    from pyspark.sql import functions as F

    from toy_vector_db_spark.operators import evaluation

    exact = spark.createDataFrame(
        [(1, 10), (1, 11), (2, 20), (2, 21)], "query_id long, vec_id long"
    )
    ann = spark.createDataFrame(
        [(1, 10), (1, 11)], "query_id long, vec_id long"
    )
    inter = evaluation.intersection_count(exact, ann)
    rows = {r["query_id"]: r["n_common"] for r in inter.collect()}
    assert rows == {1: 2, 2: 0}  # query 2 present with 0, not absent
    agg = inter.agg(
        F.sum("n_common").alias("hits"), F.count("*").alias("nq")
    ).first()
    assert (agg["hits"], agg["nq"]) == (2, 2)
