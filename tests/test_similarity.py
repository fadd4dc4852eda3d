"""IVF search quality: probing 4/16 cells must retain high recall vs exact
(clustered fixtures route most true neighbors into probed cells)."""

from pyspark.sql import functions as F

from toy_vector_db_spark.operators import evaluation, knn, similarity
from toy_vector_db_spark.sources.ndjson import split_count


def test_ivf_recall_vs_exact(spark, embeddings):
    n = embeddings.count()
    cut = split_count(n, 0.95)
    base = embeddings.where(F.col("vec_id") < cut)
    qs = embeddings.where(F.col("vec_id") >= cut).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = knn.knn_exact_batch(base, qs, 10)
    # partial probing (6/16 cells ≈ 37.5% of the base scanned): recall is
    # data-limited on these heavily-overlapping synthetic clusters. The
    # TRAINED quantizer (round-3) lifted the first-K-rows stand-in's
    # ceiling (0.46 → 0.55 at sf0.001 at nprobe=4); widening the probe to
    # nprobe=6 (round-5, measured) lifts it to 0.70 — extra k-means
    # iterations were measured flat, so probe width is the recall lever.
    cents = similarity.cached_trained_centroids(base)
    ivf = similarity.knn_ivf(base, qs, 10, cents=cents)
    rec = evaluation.evaluate_recall(ivf, exact).agg(F.avg("recall")).first()[0]
    small = base.count() <= 1000
    # measured 0.70 at sf0.001, 0.65 at sf0.1 (round-5 knobs)
    assert rec >= (0.65 if small else 0.55), f"IVF mean recall@10 = {rec}"
    # the trained quantizer must not be WORSE than the stand-in at the
    # same nprobe — the point of training (round-2 verdict item 3)
    standin = similarity.knn_ivf(base, qs, 10)
    rec_standin = (
        evaluation.evaluate_recall(standin, exact).agg(F.avg("recall")).first()[0]
    )
    assert rec >= rec_standin - 1e-9, f"trained {rec} < stand-in {rec_standin}"
    # probing ALL cells must recover exact search exactly — the structural
    # correctness property of IVF
    full = similarity.knn_ivf(
        base, qs, 10, nprobe=similarity.N_CENTROIDS, cents=cents
    )
    rec_full = evaluation.evaluate_recall(full, exact).agg(F.avg("recall")).first()[0]
    assert rec_full == 1.0, f"full-probe recall = {rec_full}"


def test_pq_codes_shape_and_adc_quality(spark, embeddings):
    n = embeddings.count()
    cut = split_count(n, 0.95)
    base = embeddings.where(F.col("vec_id") < cut)
    qs = embeddings.where(F.col("vec_id") >= cut).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    codes = similarity.pq_codes(base).collect()
    assert len(codes) == base.count()
    for r in codes:
        for m in range(similarity.PQ_M):
            assert 0 <= r[f"c{m}"] < similarity.PQ_K
    # recall floors are measured per fixture scale: the rerank budget
    # R = 16k is a fixed serving knob, so the scanned FRACTION (and with
    # it recall) shrinks as the base grows. TRAINED sub-codebooks
    # (round-3) lifted the measured recalls from (adc 0.13, rerank 0.46)
    # to (0.21, 0.60) at sf0.001; widening the rerank budget 8k → 16k
    # (round-5, measured) lifts rerank to 0.81 at sf0.001 — floors raised
    # accordingly, still with slack for fixture regeneration.
    small = base.count() <= 1000
    # rerank measured 0.81 at sf0.001, 0.46 at sf0.1 (R=16k, round 5)
    adc_floor, rr_floor = (0.15, 0.75) if small else (0.06, 0.38)
    exact = knn.knn_exact_batch(base, qs, 10)
    adc = similarity.knn_pq_adc(base, qs, 10)
    rec = evaluation.evaluate_recall(adc, exact).agg(F.avg("recall")).first()[0]
    assert rec >= adc_floor, f"PQ-ADC mean recall@10 = {rec}"
    rr = similarity.knn_pq_rerank(base, qs, 10)
    rec_rr = evaluation.evaluate_recall(rr, exact).agg(F.avg("recall")).first()[0]
    assert rec_rr >= rr_floor, f"PQ rerank mean recall@10 = {rec_rr}"


def test_ivfpq_equivalence_and_recall(spark, embeddings):
    """knn_ivfpq structural properties: (a) probing ALL cells makes the
    cell filter a no-op, so the result must be IDENTICAL to the flat
    knn_pq_rerank pipeline (same codes, same LUTs, same rerank); (b) at
    the default nprobe its recall can't beat the flat scan (it reads a
    subset of the codes) but must stay within the probed-cell miss rate
    of it — gated as >= the IVF probe recall floor times the rerank
    quality observed above."""
    from pyspark.sql import functions as F

    n = embeddings.count()
    cut = split_count(n, 0.95)
    base = embeddings.where(F.col("vec_id") < cut)
    qs = embeddings.where(F.col("vec_id") >= cut).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    flat = similarity.knn_pq_rerank(base, qs, 10)
    full = similarity.knn_ivfpq(
        base, qs, 10, nprobe=similarity.N_CENTROIDS
    )
    assert full.exceptAll(flat).count() == 0, "full-probe IVF-PQ ⊄ flat"
    assert flat.exceptAll(full).count() == 0, "flat ⊄ full-probe IVF-PQ"

    exact = knn.knn_exact_batch(base, qs, 10)
    ivfpq = similarity.knn_ivfpq(base, qs, 10)
    rec = evaluation.evaluate_recall(ivfpq, exact).agg(F.avg("recall")).first()[0]
    small = base.count() <= 1000
    # nprobe=6 + R=16k (round-5 knobs): measured 0.71 at sf0.001,
    # 0.44 at sf0.1
    floor = 0.6 if small else 0.35
    assert rec >= floor, f"IVF-PQ mean recall@10 = {rec}"


def test_pq_codes_arrow_kernel_equals_fold_form(spark, embeddings):
    """pq_codes builds with a numpy mapInArrow kernel; the interpreted
    Catalyst fold form (array_min over (sq_dist, k) structs — the shape
    the DuckDB oracle mirrors) must produce the SAME codes bit-for-bit:
    np.cumsum is the same sequential left fold, np.argmin the same
    first-min tie-break."""
    from pyspark.sql import functions as FF

    n = embeddings.count()
    cut = split_count(n, 0.95)
    base = embeddings.where(F.col("vec_id") < cut)
    books = similarity.trained_pq_codebooks(base)
    sub = len(books[0][0])
    # Catalyst fold-form normalization (the shape the oracle mirrors):
    # magnitude fold materialized as an aliased column, then elementwise
    # divide — the reference the kernel's in-pass normalization must match
    v = FF.col("embedding").cast("array<double>")
    mag = FF.sqrt(
        FF.aggregate(
            FF.zip_with(v, v, lambda x, y: x * y),
            FF.lit(0.0),
            lambda acc, x: acc + FF.coalesce(x, FF.lit(0.0)),
        )
    )
    nb = base.select(
        "vec_id", v.alias("_vd"), mag.alias("_m")
    ).select(
        "vec_id",
        FF.transform("_vd", lambda x: x / FF.col("_m")).alias("_nv"),
    )
    cols = [FF.col("vec_id")]
    for m in range(similarity.PQ_M):
        v_m = FF.slice(FF.col("_nv"), m * sub + 1, sub)
        cands = FF.array(*[
            FF.struct(
                similarity._sq_dist(v_m, FF.lit(books[m][k])).alias("d"),
                FF.lit(k).alias("k"),
            )
            for k in range(similarity.PQ_K)
        ])
        cols.append(FF.array_min(cands).getField("k").cast("int").alias(f"c{m}"))
    fold = {
        r["vec_id"]: tuple(r[f"c{m}"] for m in range(similarity.PQ_M))
        for r in nb.select(*cols).collect()
    }
    kernel = {
        r["vec_id"]: tuple(r[f"c{m}"] for m in range(similarity.PQ_M))
        for r in similarity.pq_codes(base).collect()
    }
    assert fold == kernel


def test_lsh_bucket_range(spark, embeddings):
    buckets = similarity.lsh_hyperplane_buckets(embeddings).collect()
    assert all(0 <= r.bucket < 2**similarity.N_HYPERPLANES for r in buckets)
    # hyperplane rows themselves land in a bucket too
    assert len(buckets) == embeddings.count()


def test_ivfpq_partitioned_search_prunes_and_matches(spark, embeddings):
    """The on-disk cell-partitioned codes table must (a) produce results
    identical to the in-memory knn_ivfpq and (b) be scanned with dynamic
    partition pruning — the probe join's broadcast side prunes the cell
    directories, the physical mechanism behind 'probe = partition
    pruning' at 100 TB."""
    from pyspark.sql import functions as F

    n = embeddings.count()
    cut = split_count(n, 0.95)
    base = embeddings.where(F.col("vec_id") < cut)
    qs = embeddings.where(F.col("vec_id") >= cut).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    written = similarity.written_codes_cells(base)
    on_disk = similarity.knn_ivfpq(base, qs, 10, codes_cells=written)
    in_mem = similarity.knn_ivfpq(base, qs, 10)
    assert on_disk.exceptAll(in_mem).count() == 0
    assert in_mem.exceptAll(on_disk).count() == 0
    plan = on_disk._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower(), (
        "expected dynamic partition pruning on the cell-partitioned scan"
    )
