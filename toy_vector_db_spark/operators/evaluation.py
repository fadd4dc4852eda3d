"""Retrieval evaluation operators: intersection / recall@k / precision@k.

Reference parity (SURVEY.md §2.5):
  X1 intersection_count  /root/reference/src/evaluation.rs:3-5
  X2 evaluate_recall     /root/reference/src/evaluation.rs:7-10
  X3 evaluate_precision  /root/reference/src/evaluation.rs:12-15

The reference's intersection is an O(n·m) nested-loop membership test using
Point equality (= vector equality, src/point.rs:12-16). Spark-first: result
sets carry the surrogate id, so intersection is a hash semi-join on
(query_id, id) and the metrics are one aggregate over it — fully shuffled
by query_id, map-side partial counts, no driver loops. At 100 TB of result
pairs this is a plain co-partitioned join+agg; both inputs are already
hash-partitioned by query_id when they come out of the top-k window, so AQE
can reuse the partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from toy_vector_db_spark.functions.rounding import rnd

ROUND = 6


def intersection_count(
    a: DataFrame,
    b: DataFrame,
    query_col: str = "query_id",
    id_col: str = "vec_id",
) -> DataFrame:
    """|A ∩ B| per query (reference X1). Queries with an empty intersection
    are kept with n_common = 0 (the reference returns 0, not absence)."""
    inter = (
        a.select(query_col, id_col)
        .join(b.select(query_col, id_col), [query_col, id_col])
        .groupBy(query_col)
        .agg(F.count("*").alias("n_common"))
    )
    qs = a.select(query_col).distinct()
    return qs.join(inter, query_col, "left").select(
        query_col,
        F.coalesce(F.col("n_common"), F.lit(0)).cast("long").alias("n_common"),
    )


def evaluate_recall(
    retrieved: DataFrame,
    relevant: DataFrame,
    query_col: str = "query_id",
    id_col: str = "vec_id",
) -> DataFrame:
    """|retrieved ∩ relevant| / |relevant| per query (reference X2)."""
    inter = intersection_count(retrieved, relevant, query_col, id_col)
    rel_n = relevant.groupBy(query_col).agg(F.count("*").alias("n_rel"))
    return inter.join(rel_n, query_col).select(
        query_col,
        rnd(F.col("n_common") / F.col("n_rel"), ROUND).alias("recall"),
    )


def evaluate_precision(
    retrieved: DataFrame,
    relevant: DataFrame,
    query_col: str = "query_id",
    id_col: str = "vec_id",
) -> DataFrame:
    """|retrieved ∩ relevant| / |retrieved| per query (reference X3)."""
    inter = intersection_count(retrieved, relevant, query_col, id_col)
    ret_n = retrieved.groupBy(query_col).agg(F.count("*").alias("n_ret"))
    return inter.join(ret_n, query_col).select(
        query_col,
        rnd(F.col("n_common") / F.col("n_ret"), ROUND).alias("precision"),
    )
