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


# -- Product Quantization (PQ) ----------------------------------------------

PQ_M = 4  # subspaces
PQ_K = 16  # centroids per subspace


def _normalize(v) -> "F.Column":
    """v / ‖v‖ as an expression — after this, squared euclidean is
    2 − 2·cos: rank-equivalent to cosine distance, which is what makes
    euclidean PQ-ADC a valid index for the engine's cosine metric.

    The magnitude rides in via array_repeat, which evaluates its argument
    ONCE per row — a `transform(v, x / mag)` lambda would re-evaluate the
    whole magnitude fold for every element (interpreted HOFs get no
    subexpression elimination)."""
    mag = F.sqrt(
        F.aggregate(
            F.zip_with(v, v, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + F.coalesce(x, F.lit(0.0)),
        )
    )
    return F.zip_with(
        v, F.array_repeat(mag, F.size(v)), lambda x, m: x / m
    )


def _py_normalize(vec: list[float]) -> list[float]:
    """Driver-side twin of _normalize: sequential-fold magnitude (the
    _py_magnitude op order) then elementwise divide — bit-identical."""
    import math

    acc = 0.0
    for x in vec:
        acc += x * x
    mag = math.sqrt(acc)
    return [x / mag for x in vec]


def _pq_codebook(base: DataFrame, id_col: str, vec_col: str) -> list[list[float]]:
    """The K codebook vectors (first K base rows — the deterministic
    stand-in for per-subspace k-means, like centroids_df), collected
    driver-side and NORMALIZED: K×D doubles, a few KB, inlined as literals
    so the per-row argmin is pure codegen with zero joins."""
    rows = (
        base.where(F.col(id_col) < PQ_K)
        .orderBy(id_col)
        .select(F.col(vec_col).cast("array<double>"))
        .collect()
    )
    return [_py_normalize(list(r[0])) for r in rows]


def _sq_dist(a, b) -> "F.Column":
    """Squared euclidean as a left fold — same op order as the engine's
    euclidean_distance (minus the sqrt), so DuckDB's list_sum matches."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + F.coalesce(x, F.lit(0.0)),
    )


# (appId, plan hash) → persisted normalized-vector frame. Normalization is
# referenced by EVERY argmin struct entry, and Spark's CollapseProject would
# re-inline the subtree into all 64 uses (higher-order functions evaluate
# interpreted, outside codegen subexpression elimination) — materializing
# the normalized column once turns ~260k interpreted ops/row into ~1k.
_NV_CACHE: dict[tuple, DataFrame] = {}


def _normalized_base(base: DataFrame, id_col: str, vec_col: str) -> DataFrame:
    key = (
        base.sparkSession.sparkContext.applicationId,
        base.semanticHash(),
        id_col,
        vec_col,
    )
    if key not in _NV_CACHE:
        par = base.sparkSession.sparkContext.defaultParallelism
        v = F.col(vec_col).cast("array<double>")
        mag = F.sqrt(
            F.aggregate(
                F.zip_with(v, v, lambda x, y: x * y),
                F.lit(0.0),
                lambda acc, x: acc + F.coalesce(x, F.lit(0.0)),
            )
        )
        # two materialization steps: magnitude computed ONCE per row (a
        # transform lambda referencing the mag subtree would re-evaluate
        # it per ELEMENT — interpreted HOFs get no codegen subexpression
        # elimination), then the division over the materialized magnitude.
        # repartition spreads the fixture's single input split first.
        with_mag = (
            base.repartition(par, id_col)
            .select(id_col, v.alias("_vd"), mag.alias("_m"))
            .persist()
        )
        with_mag.count()
        nb = with_mag.select(
            id_col,
            F.transform("_vd", lambda x: x / F.col("_m")).alias("_nv"),
        ).persist()
        nb.count()
        with_mag.unpersist()
        _NV_CACHE[key] = nb
    return _NV_CACHE[key]


_CODES_CACHE: dict[tuple, DataFrame] = {}


def pq_codes(
    base: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization codes: split each vector into PQ_M subspaces
    and store the id of the nearest sub-codeword per subspace — D floats
    compress to M small ints (here 64×4B → 4×1B: 64×). The per-subspace
    argmin is an array_min over (distance², k) structs against literal
    sub-centroids — per-row expressions over the materialized normalized
    vector, no join, no shuffle. The codes frame persists per session:
    it IS the index artifact (a parquet index table at 100 TB), and every
    ADC search scans it."""
    key = (
        base.sparkSession.sparkContext.applicationId,
        base.semanticHash(),
        id_col,
        vec_col,
    )
    if key in _CODES_CACHE:
        return _CODES_CACHE[key]
    cents = _pq_codebook(base, id_col, vec_col)
    d = len(cents[0])
    sub = d // PQ_M
    nb = _normalized_base(base, id_col, vec_col)
    cols = [F.col(id_col)]
    for m in range(PQ_M):
        v_m = F.slice(F.col("_nv"), m * sub + 1, sub)
        cands = F.array(*[
            F.struct(
                _sq_dist(v_m, F.lit(cents[k][m * sub: (m + 1) * sub])).alias("d"),
                F.lit(k).alias("k"),
            )
            for k in range(PQ_K)
        ])
        cols.append(F.array_min(cands).getField("k").cast("int").alias(f"c{m}"))
    codes = nb.select(*cols).persist()
    codes.count()
    _CODES_CACHE[key] = codes
    return codes


def knn_pq_adc(
    base: DataFrame,
    queries: DataFrame,
    k: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes: approx dist²(q, v) =
    Σ_m dist²(sub_m(q), codeword[code_m(v)]). The base side is only its
    codes (M bytes/vector — the compressed corpus is what scans at 100 TB);
    codewords are literals, queries broadcast, one shuffle for the
    per-query top-k. Recall is bounded by quantization error — the trade
    PQ makes for a 64× smaller scan."""
    cents = _pq_codebook(base, id_col, vec_col)
    d = len(cents[0])
    sub = d // PQ_M
    codes = pq_codes(base, id_col, vec_col)
    # Classic ADC lookup tables, built on the QUERY side before the
    # broadcast: per query and subspace, the 16 codeword distances land in
    # an array column (the exchange materializes its child, so this runs
    # once per query row). The |codes|×|queries| hot loop then does M
    # array lookups per row instead of M interpreted 16-element folds —
    # ~50× less per-candidate work, same values bit-for-bit.
    nqv = _normalize(F.col(query_vec_col).cast("array<double>"))
    lut_cols = []
    for m in range(PQ_M):
        q_m = F.slice(nqv, m * sub + 1, sub)
        lut_cols.append(
            F.array(*[
                _sq_dist(q_m, F.lit(cents[kk][m * sub: (m + 1) * sub]))
                for kk in range(PQ_K)
            ]).alias(f"_lut{m}")
        )
    q_n = queries.select(query_id_col, *lut_cols)

    approx = F.lit(0.0)
    for m in range(PQ_M):
        approx = approx + F.element_at(
            F.col(f"_lut{m}"), F.col(f"c{m}") + 1
        )

    cand = codes.crossJoin(F.broadcast(q_n)).withColumn("ad2", approx)
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("ad2").asc(), F.col(id_col).asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(
            query_id_col, id_col, rnd("ad2", ROUND).alias("approx_dist2"), "rank"
        )
    )


def knn_pq_rerank(
    base: DataFrame,
    queries: DataFrame,
    k: int,
    rerank_r: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """The standard PQ serving pipeline: ADC over the compressed codes
    prunes the corpus to R = 8k candidates per query, then EXACT cosine
    re-ranks only the survivors. At 100 TB the full-precision vectors are
    fetched for R rows per query instead of scanned — the scan touches
    M bytes/vector. Recall here matches knn_ivf's on this fixture (~0.46
    at R=80: the synthetic clusters overlap; both indexes hit the same
    data-limited ceiling, gated in tests)."""
    if rerank_r is None:
        rerank_r = 8 * k
    cand = knn_pq_adc(
        base, queries, rerank_r, id_col, vec_col, query_id_col, query_vec_col
    ).select(query_id_col, id_col)
    qv = queries.select(
        F.col(query_id_col).alias("_qid"), query_vec_col
    )
    scored = (
        cand.join(base.select(id_col, vec_col), id_col)
        .join(F.broadcast(qv), F.col(query_id_col) == F.col("_qid"))
        .withColumn("dist", V.distance(F.col(vec_col), F.col(query_vec_col)))
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("dist").asc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(query_id_col, id_col, rnd("dist", ROUND).alias("dist"), "rank")
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
