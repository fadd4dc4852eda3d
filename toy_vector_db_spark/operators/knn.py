"""Exact (brute-force) K-nearest-neighbor operators.

Reference parity (SURVEY.md §2.3):
  E1-E2 ExactKNNIndex state/insert  /root/reference/src/exact_knn.rs:8-25
  E3    search (exact top-k)        /root/reference/src/exact_knn.rs:27-38
  H1    get_nearest_element         /root/reference/src/hnsw.rs:65-76
  H2    get_furthest_element        /root/reference/src/hnsw.rs:78-89

The reference computes distance(query, p) for EVERY point, full-sorts, and
truncates to k — O(n log n) single-threaded. Spark-first translation:

* single query → ``withColumn(dist).orderBy(dist, id).limit(k)``. Catalyst
  rewrites sort+limit into ``TakeOrderedAndProject`` (per-partition bounded
  heaps + driver merge of k·P rows) — strictly better than the reference's
  full sort, and embarrassingly parallel: at 100 TB this is one narrow scan
  stage reading ONLY the embedding+id columns (column pruning) with no
  shuffle at all.

* query batch → broadcast the (small) query set against the (huge) base:
  ``base.crossJoin(broadcast(queries))`` plans a BroadcastNestedLoopJoin —
  the base never shuffles; each task scores its partition of the base
  against all queries, then a single shuffle on query_id does the per-query
  top-k (window row_number ≤ k). Ties broken by id in both engine and
  oracle (SURVEY §7 risk #4).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from toy_vector_db_spark.functions import vector as V


def _py_magnitude(vec) -> float:
    """Sequential-fold L2 norm in Python doubles — bit-identical to the
    engine's aggregate() fold (same op order, same IEEE arithmetic), so a
    driver-side precomputed query magnitude can be inlined as a literal
    without any float drift vs the oracle."""
    acc = 0.0
    for x in vec:
        acc += float(x) * float(x)
    return math.sqrt(acc)


def with_distance(
    df: DataFrame,
    query_vec,
    vec_col: str = "embedding",
    dist_col: str = "dist",
) -> DataFrame:
    """Project the engine distance (clamped cosine, src/vector.rs:31-33) from
    every row's vector to a literal query vector.

    Perf: the query magnitude is a CONSTANT, but Catalyst does not fold
    aggregate() over literal arrays, so the naive V.distance() would
    recompute it per row — precompute it driver-side (bit-identically) and
    inline as a literal. Row magnitudes are computed once per row.
    """
    q = F.lit(query_vec).cast("array<double>")
    q_mag = F.lit(_py_magnitude(query_vec))
    v = F.col(vec_col)
    sim = F.greatest(F.lit(0.0), V.dot(v, q) / (V.magnitude(v) * q_mag))
    return df.withColumn(dist_col, F.lit(1.0) - sim)


def knn_exact_single(
    base: DataFrame,
    query_vec,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k for one query vector (src/exact_knn.rs:27-38).

    Plans as scan → codegen'd distance expression → TakeOrderedAndProject(k).
    """
    return (
        with_distance(base, query_vec, vec_col)
        .orderBy(F.col("dist").asc(), F.col(id_col).asc())
        .limit(k)
        .select(id_col, "dist")
    )


def knn_exact_batch(
    base: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact top-k per query for a batch of queries.

    ``queries`` must have (query_id_col, query_vec_col). The query side is
    broadcast (it is the small side by construction — a query workload, not
    the corpus), so the base table never moves; the only shuffle is the
    per-query top-k on query_id.
    """
    # magnitudes are per-row constants of each side: compute each ONCE
    # before the crossJoin instead of 3 aggregates per (row × query) pair.
    # Same float ops in the same order → bit-identical to the naive form.
    base_m = base.withColumn("_v_mag", V.magnitude(F.col(vec_col)))
    q_m = queries.withColumn("_q_mag", V.magnitude(F.col(query_vec_col)))
    sim = F.greatest(
        F.lit(0.0),
        V.dot(F.col(vec_col), F.col(query_vec_col))
        / (F.col("_v_mag") * F.col("_q_mag")),
    )
    scored = base_m.crossJoin(F.broadcast(q_m)).withColumn(
        "dist", F.lit(1.0) - sim
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("dist").asc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, "dist", "rank")
    )


def _scored_product(
    base: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    query_id_col: str,
    query_vec_col: str,
) -> DataFrame:
    """base × broadcast(queries) with the clamped-cosine distance, side
    magnitudes computed once per row/query (see knn_exact_batch)."""
    base_m = base.withColumn("_v_mag", V.magnitude(F.col(vec_col)))
    q_m = queries.withColumn("_q_mag", V.magnitude(F.col(query_vec_col)))
    sim = F.greatest(
        F.lit(0.0),
        V.dot(F.col(vec_col), F.col(query_vec_col))
        / (F.col("_v_mag") * F.col("_q_mag")),
    )
    return base_m.crossJoin(F.broadcast(q_m)).withColumn(
        "dist", F.lit(1.0) - sim
    )


def argmin_dist(
    base: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Nearest element per query (reference H1, src/hnsw.rs:65-76) as a
    ``min_by`` aggregate — no window needed, map-side partial aggregation.
    Magnitudes factored out per side before the cross join (the
    knn_exact_batch idiom: one aggregate per row+query instead of three per
    pair; identical float ops in identical order, so oracle-bit-identical)."""
    scored = _scored_product(
        base, queries, id_col, vec_col, query_id_col, query_vec_col
    )
    return scored.groupBy(query_id_col).agg(
        F.min_by(F.struct(F.col(id_col), F.col("dist")), F.struct("dist", id_col))
        .getField(id_col)
        .alias("nearest_id"),
        F.min("dist").alias("min_dist"),
    )


def argmax_dist(
    base: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Furthest element per query (reference H2, src/hnsw.rs:78-89)."""
    scored = _scored_product(
        base, queries, id_col, vec_col, query_id_col, query_vec_col
    )
    return scored.groupBy(query_id_col).agg(
        F.max_by(
            F.struct(F.col(id_col), F.col("dist")),
            F.struct(F.col("dist"), (-F.col(id_col)).alias("neg")),
        )
        .getField(id_col)
        .alias("furthest_id"),
        F.max("dist").alias("max_dist"),
    )


class ExactKNNIndex:
    """Thin ``Index``-protocol wrapper mirroring the reference trait
    (/root/reference/src/index.rs:4-10, src/exact_knn.rs:8-39): the "index"
    is just the cached base DataFrame; ``insert_many`` ≈ union, ``search`` ≈
    the top-k query above."""

    def __init__(self, id_col: str = "vec_id", vec_col: str = "embedding"):
        self.df: DataFrame | None = None
        self.id_col = id_col
        self.vec_col = vec_col

    def insert_many(self, df: DataFrame) -> "ExactKNNIndex":
        self.df = df if self.df is None else self.df.unionByName(df)
        return self

    def search(self, query_vec, k: int) -> DataFrame:
        assert self.df is not None, "index is empty"
        return knn_exact_single(self.df, query_vec, k, self.id_col, self.vec_col)
