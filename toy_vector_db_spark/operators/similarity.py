"""Similarity-search operators: brute-force baseline + scale paths.

The brute-force cosine top-k baseline lives in operators/knn.py
(knn_exact_single / knn_exact_batch). This module adds the 100 TB paths:

  ivf_assign / knn_ivf   IVF-style coarse quantization: every vector is
                         assigned to its nearest of C centroids; a query
                         probes only the nprobe nearest cells. Entirely
                         DataFrame ops (and therefore DuckDB-oracle-able):
                         the "index" is just a centroid_id column — at
                         scale it becomes the table's partition key, so
                         probing = partition pruning.
  lsh_hyperplane_buckets Random-hyperplane LSH for cosine: sign-bit
                         signature over H hyperplanes → integer bucket.
                         Candidates = bucket equality (used by the dedup
                         embedding path at scale).

Determinism: centroids/hyperplanes are the first C (resp. H) base vectors —
a deterministic, data-derived choice both engines compute identically. A
production deployment would swap in k-means centroids (MLlib) and Gaussian
hyperplanes; the operator shape — assign, probe, rerank — is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from toy_vector_db_spark.functions.rounding import rnd

from toy_vector_db_spark.functions import vector as V

ROUND = 6
N_CENTROIDS = 16
N_PROBE = 4
N_HYPERPLANES = 12


def centroids_df(base: DataFrame, n: int = N_CENTROIDS,
                 id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """First n base vectors as centroids (deterministic stand-in for
    k-means; same rows in the oracle via vec_id < n)."""
    return base.where(F.col(id_col) < n).select(
        F.col(id_col).alias("centroid_id"), F.col(vec_col).alias("centroid_vec")
    )


def ivf_assign(base: DataFrame, cents: DataFrame,
               id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Assign every vector to its nearest centroid (clamped cosine).
    Broadcast the tiny centroid table; argmin via min-of-struct aggregate
    with (d, centroid_id) lexicographic tiebreak — identical selection to a
    row_number window, but the partial aggregation combines map-side, so
    the exchange carries one row per vector instead of one per
    vector×centroid (round-1 fix: the window shuffled base×C rows)."""
    scored = base.crossJoin(F.broadcast(cents)).withColumn(
        "d", V.distance(F.col(vec_col), F.col("centroid_vec"))
    )
    best = scored.groupBy(id_col).agg(
        F.min(F.struct(F.col("d"), F.col("centroid_id"))).alias("m")
    )
    return best.select(
        id_col,
        F.col("m.centroid_id").alias("centroid_id"),
        rnd(F.col("m.d"), ROUND).alias("dist"),
    )


def knn_ivf(
    base: DataFrame,
    queries: DataFrame,
    k: int,
    nprobe: int = N_PROBE,
    n_centroids: int = N_CENTROIDS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """IVF search: probe the nprobe nearest cells per query, exact top-k
    within the probed cells. Two broadcast joins + one shuffle for the
    final per-query top-k; at scale the cell join is partition pruning."""
    cents = centroids_df(base, n_centroids, id_col, vec_col)
    assign = ivf_assign(base, cents, id_col, vec_col).select(id_col, "centroid_id")

    q_scored = queries.crossJoin(F.broadcast(cents)).withColumn(
        "qd", V.distance(F.col(query_vec_col), F.col("centroid_vec"))
    )
    wq = Window.partitionBy(query_id_col).orderBy(F.col("qd").asc(),
                                                  F.col("centroid_id").asc())
    probes = (
        q_scored.withColumn("rn", F.row_number().over(wq))
        .where(F.col("rn") <= nprobe)
        .select(query_id_col, query_vec_col, "centroid_id")
    )

    cell_vectors = base.join(assign, id_col).select(
        id_col, vec_col, "centroid_id"
    )
    cand = cell_vectors.join(F.broadcast(probes), "centroid_id").withColumn(
        "dist", V.distance(F.col(vec_col), F.col(query_vec_col))
    )
    w = Window.partitionBy(query_id_col).orderBy(F.col("dist").asc(),
                                                 F.col(id_col).asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col,
                rnd("dist", ROUND).alias("dist"), "rank")
    )


def lsh_hyperplane_buckets(
    base: DataFrame,
    n_planes: int = N_HYPERPLANES,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sign-bit LSH signature for cosine similarity: bit_j = [dot(v, h_j) > 0]
    with h_j = the j-th base vector; bucket = Σ bit_j·2^j.

    The H planes are collapsed into ONE array-of-structs row and broadcast,
    so the whole bucket is a single per-row ``aggregate`` over that array —
    no explode, no groupBy: the only movement is the one-row broadcast
    (round-1 fix: the groupBy-sum shuffled base×H rows)."""
    planes = base.where(F.col(id_col) < n_planes).select(
        F.col(id_col).alias("plane_id"), F.col(vec_col).alias("plane_vec")
    )
    planes_row = planes.agg(
        F.array_sort(
            F.collect_list(F.struct("plane_id", "plane_vec"))
        ).alias("planes")
    )

    def _bucket(acc, p):
        # 2^plane_id via pow: shiftleft takes only a literal shift amount;
        # double pow is exact far beyond H=12
        return acc + F.when(
            V.dot(F.col(vec_col), p["plane_vec"]) > 0,
            F.pow(F.lit(2.0), p["plane_id"]).cast("long"),
        ).otherwise(F.lit(0).cast("long"))

    return (
        base.crossJoin(F.broadcast(planes_row))
        .select(
            id_col,
            F.aggregate(
                "planes", F.lit(0).cast("long"), _bucket
            ).alias("bucket"),
        )
    )
