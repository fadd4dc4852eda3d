"""IVF-routed HNSW: recall bounded by routing, exact within probed cells."""

from pyspark.sql import functions as F

from toy_vector_db_spark.operators import evaluation, hnsw, knn, similarity
from toy_vector_db_spark.sources.ndjson import split_count


def _split(embeddings):
    n = embeddings.count()
    cut = split_count(n, 0.95)
    base = embeddings.where(F.col("vec_id") < cut)
    qs = embeddings.where(F.col("vec_id") >= cut).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return base, qs


def test_routed_recall_floor(spark, embeddings):
    base, qs = _split(embeddings)
    exact = knn.knn_exact_batch(base, qs, 10)
    routed = hnsw.knn_hnsw_routed(base, qs, 10)
    rec = evaluation.evaluate_recall(routed, exact).agg(F.avg("recall")).first()[0]
    # routing bound (same as knn_ivf at the shared default nprobe=6,
    # round-5 knob): probe recall ~0.70 × near-exact in-cell graph search
    assert rec >= 0.55, f"routed recall@10 = {rec}"


def test_routed_prebuilt_bit_identical_to_fused(spark, embeddings):
    """The prebuilt per-cell graph (routed_index → reconstruct) must search
    exactly like the fused build-per-call path: same cells, same graphs,
    same beams — row-for-row identical output including distances."""
    base, qs = _split(embeddings)
    fused = hnsw.knn_hnsw_routed(base, qs, 10)
    cells, edges, cents = hnsw.routed_index(base)
    pre = hnsw.knn_hnsw_routed_prebuilt(cells, edges, cents, qs, 10)
    f = sorted(map(tuple, fused.collect()))
    p = sorted(map(tuple, pre.collect()))
    assert f == p


def test_routed_matches_ivf_bound(spark, embeddings):
    """With ef ≥ cell size the in-cell graph search is exhaustive, so the
    routed HNSW must return exactly what exact-search-within-probed-cells
    (knn_ivf) returns — isolates routing from graph quality."""
    base, qs = _split(embeddings)
    routed = hnsw.knn_hnsw_routed(base, qs, 10, ef=500)
    # both sides on the TRAINED quantizer (the routed path trains since
    # round 3) so this isolates graph quality, not centroid choice
    cents = similarity.cached_trained_centroids(base)
    ivf = similarity.knn_ivf(base, qs, 10, cents=cents)
    r = {(x.query_id, x.vec_id) for x in routed.collect()}
    v = {(x.query_id, x.vec_id) for x in ivf.collect()}
    assert r == v
