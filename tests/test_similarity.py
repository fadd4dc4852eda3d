"""IVF search quality: probing N_PROBE (=8 since round 6) of 16 cells must
retain high recall vs exact (clustered fixtures route most true neighbors
into probed cells)."""

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
    # partial probing (8/16 cells since round 6): recall is data-limited
    # on these heavily-overlapping synthetic clusters. The TRAINED
    # quantizer (round-3) lifted the first-K-rows stand-in's ceiling
    # (0.46 → 0.55 at sf0.001 at nprobe=4); nprobe=6 (round 5) → 0.70;
    # nprobe=8 (round 6 — the coarse-probe miss rate was the IVF-PQ cap)
    # measures 0.804 at sf0.001 and 0.774 at sf0.1. Extra k-means
    # iterations were measured flat, so probe width is the recall lever.
    cents = similarity.cached_trained_centroids(base)
    ivf = similarity.knn_ivf(
        base, qs, 10, cents=cents,
        cell_vectors=similarity.cached_cell_vectors(base),
    )
    rec = evaluation.evaluate_recall(ivf, exact).agg(F.avg("recall")).first()[0]
    small = base.count() <= 1000
    # measured 0.804 at sf0.001, 0.774 at sf0.1 (round-6 knobs)
    assert rec >= (0.75 if small else 0.70), f"IVF mean recall@10 = {rec}"
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
    # Recall floors per fixture scale. Round-6 (verdict r5 item 2): the
    # fixed rerank budget R=16k meant the reranked FRACTION shrank as the
    # base grew (rerank 0.81 at sf0.001 but 0.46 at sf0.1). Fixed by
    # (a) codebook resolution PQ_M 4→8, PQ_K 16→64 — the ADC ranking
    # itself is now good enough that the top-R candidates keep the true
    # neighbors at 4× the base — and (b) the scale-aware budget
    # R = max(16k, ⌈n_base/10⌉). Measured round 6: adc 0.332 / 0.278,
    # rerank 0.976 / 0.909 (sf0.001 / sf0.1) — the sf0.1 floors now sit
    # ABOVE the old sf0.001 measurements; slack left for fixture
    # regeneration.
    small = base.count() <= 1000
    adc_floor, rr_floor = (0.25, 0.92) if small else (0.22, 0.85)
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
    # nprobe=8 + M8/K64 codebooks + scale-aware R (round-6 knobs):
    # measured 0.804 at sf0.001, 0.748 at sf0.1 (the cap is the coarse
    # probe miss rate — knn_ivf measures 0.804/0.774 at the same nprobe)
    floor = 0.75 if small else 0.70
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


def test_bq_rerank_recall(spark, embeddings):
    """Binary quantization (round 6): the Hamming-prune + exact-rerank
    pipeline must retain high recall despite the weak raw sign-bit
    ranking. Round 8 gave BQ its own 2× rerank floor (BQ_RERANK_MULT=32
    — the 8 B/vector scan affords it): measured 0.854 at sf0.1 at
    constant cost (0.699 at the shared floor); raw Hamming-only top-10
    sits at ~0.2-0.3, so the rerank budget is what carries the family.
    Codes must round-trip to 2×32 sign bits."""
    n = embeddings.count()
    cut = split_count(n, 0.95)
    base = embeddings.where(F.col("vec_id") < cut)
    qs = embeddings.where(F.col("vec_id") >= cut).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    codes = {r["vec_id"]: (r["b_hi"], r["b_lo"])
             for r in similarity.bq_codes(base).collect()}
    raw = {r["vec_id"]: r["embedding"]
           for r in base.select("vec_id", "embedding").collect()}
    for vid, (hi, lo) in list(codes.items())[:50]:
        v = raw[vid]
        want_hi = int("".join("1" if x > 0 else "0" for x in v[:32]), 2)
        want_lo = int("".join("1" if x > 0 else "0" for x in v[32:]), 2)
        assert (hi, lo) == (want_hi, want_lo)
    exact = knn.knn_exact_batch(base, qs, 10)
    bq = similarity.knn_bq_rerank(base, qs, 10)
    rec = evaluation.evaluate_recall(bq, exact).agg(F.avg("recall")).first()[0]
    small = base.count() <= 1000
    assert rec >= (0.90 if small else 0.80), f"BQ rerank recall@10 = {rec}"


def test_ann_recall_at_10x_scale(spark):
    """Round-6 scale evidence for the ANN serving knobs: a generated
    corpus at 10× the sf0.1 base (19,000 base vectors, 100 queries; 10
    Gaussian clusters with heavy overlap, σ=2.5 — harder separation than
    σ=1.5 where everything is trivially 0.999). Two things the fixtures
    can never show:
      * quantizer training runs on a PROPER subsample — 19k rows exceed
        TRAIN_SAMPLE=4096 for the first time, so the bounded-sample
        training path is exercised for real;
      * the scale-aware rerank budget engages its fraction term
        (R = ⌈19000/10⌉ = 1900 ≫ the 160 floor).
    Measured: IVF 0.950, PQ-rerank 0.988, IVF-PQ 0.947 — the round-6
    knobs HOLD at 10× (the round-5 fixed-R setup decayed to 0.46 at a
    mere 4×). ~80 s on local[32]; the cost is the exact baseline."""
    import numpy as np

    rng = np.random.default_rng(42)
    n, d, kc, sigma = 20000, 64, 10, 2.5
    centers = rng.normal(0, 1, (kc, d))
    lab = rng.integers(0, kc, n)
    X = centers[lab] + rng.normal(0, sigma, (n, d))
    rows = [(i, [float(x) for x in X[i]]) for i in range(n)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cut = 19000
    base = emb.where(F.col("vec_id") < cut)
    qs = emb.where(
        (F.col("vec_id") >= cut) & (F.col("vec_id") < cut + 100)
    ).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = knn.knn_exact_batch(base, qs, 10).persist()
    exact.count()

    def rec(df):
        return evaluation.evaluate_recall(df, exact).agg(
            F.avg("recall")
        ).first()[0]

    assert similarity._rerank_budget(base, 10) == 1900  # fraction term active
    cents = similarity.cached_trained_centroids(base)
    ivf = rec(similarity.knn_ivf(
        base, qs, 10, cents=cents,
        cell_vectors=similarity.cached_cell_vectors(base),
    ))
    assert ivf >= 0.90, f"IVF recall@10 at 10x = {ivf}"
    rr = rec(similarity.knn_pq_rerank(base, qs, 10))
    assert rr >= 0.95, f"PQ-rerank recall@10 at 10x = {rr}"
    ivfpq = rec(similarity.knn_ivfpq(base, qs, 10))
    assert ivfpq >= 0.90, f"IVF-PQ recall@10 at 10x = {ivfpq}"
    # round 8: the third family at 10x under its shipped budget
    # (R = max(320, 1900) — fraction term active): measured 0.913. The
    # capped-budget regime beyond ~164k vectors remains BQ's documented
    # open question (no resolution lever), SCALE.md.
    bq = rec(similarity.knn_bq_rerank(base, qs, 10))
    assert bq >= 0.85, f"BQ-rerank recall@10 at 10x = {bq}"
    # round 8: the FOURTH family at 10x — shipped budget measures 1.0,
    # and the constant-cost stress (fixed R=160, the capped-budget
    # regime's analogue) ALSO measures 1.0: SQ is the bounded-cost
    # configuration with recall headroom that BQ structurally lacks
    sq = rec(similarity.knn_sq_rerank(base, qs, 10))
    assert sq >= 0.98, f"SQ-rerank recall@10 at 10x = {sq}"
    # round 9: the 2-bit BQ option at 10x under the SHARED budget — the
    # recall-at-cost claim (scripts/bq2_study.py) must hold off-fixture
    bq2 = rec(similarity.knn_bq2_rerank(base, qs, 10))
    assert bq2 >= 0.95, f"BQ2-rerank recall@10 at 10x = {bq2}"
    sq_fixed = rec(similarity.knn_sq_rerank(base, qs, 10, rerank_r=160))
    assert sq_fixed >= 0.98, f"SQ-rerank fixed-R recall@10 at 10x = {sq_fixed}"
    # the IVF×SQ composition at 10×: near-exact ADC within probed cells
    # means recall tracks the coarse-probe hit rate (the IVF gate above),
    # not the IVF-PQ floor
    ivfsq = rec(similarity.knn_ivfsq(base, qs, 10))
    assert ivfsq >= 0.90, f"IVF-SQ recall@10 at 10x = {ivfsq}"


def test_ivfpq_upsert_equals_frozen_rebuild(spark, embeddings):
    """The incremental-ingest contract (round 6): an index built as
    initial-build + micro-batch upsert under FROZEN quantizers must be
    row-identical to an index encoded from scratch over the full corpus
    under the SAME frozen quantizers — and search over it must return
    identical neighbors. This is what makes batch ingest deterministic
    (and oracle-able) without any retrain/rewrite."""
    n = embeddings.count()
    cut = split_count(n, 0.95)
    base = embeddings.where(F.col("vec_id") < cut)
    qs = embeddings.where(F.col("vec_id") >= cut).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    init_cut = split_count(cut, 0.75)
    initial = base.where(F.col("vec_id") < init_cut)
    batch = base.where(F.col("vec_id") >= init_cut)
    cc, cents, books = similarity.ivfpq_upsert(initial, batch)

    # from-scratch encode of the FULL corpus under the same frozen books
    rebuild = similarity.encode_codes(base, books).join(
        similarity.ivf_assign(base, cents).select("vec_id", "centroid_id"),
        "vec_id",
    ).select(*cc.columns)
    assert cc.exceptAll(rebuild).count() == 0
    assert rebuild.exceptAll(cc).count() == 0

    up = similarity.knn_ivfpq(
        base, qs, 10, codes_cells=cc, cents=cents, books=books
    )
    scratch = similarity.knn_ivfpq(
        base, qs, 10, codes_cells=rebuild, cents=cents, books=books
    )
    assert up.exceptAll(scratch).count() == 0
    assert scratch.exceptAll(up).count() == 0


def test_ivfpq_delete_tombstones(spark, embeddings):
    """Tombstone delete semantics: deleted ids never appear in results,
    every query still gets a FULL k (back-filled by next-nearest
    survivors), and un-deleted result rows keep their exact distances
    (deletion only removes candidates, never rescores)."""
    n = embeddings.count()
    cut = split_count(n, 0.95)
    base = embeddings.where(F.col("vec_id") < cut)
    qs = embeddings.where(F.col("vec_id") >= cut).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    cc = similarity.cached_codes_cells(base)
    mod = 17
    tomb = base.select("vec_id").where(F.col("vec_id") % mod == 0)
    live = cc.join(F.broadcast(tomb), "vec_id", "left_anti")
    res = similarity.knn_ivfpq(base, qs, 10, codes_cells=live).collect()
    assert all(r["vec_id"] % mod != 0 for r in res)
    from collections import Counter

    per_q = Counter(r["query_id"] for r in res)
    assert all(c == 10 for c in per_q.values())  # full k back-filled
    # un-deleted rows keep identical distances vs the undeleted index
    full = {
        (r["query_id"], r["vec_id"]): r["dist"]
        for r in similarity.knn_ivfpq(base, qs, 10).collect()
    }
    for r in res:
        key = (r["query_id"], r["vec_id"])
        if key in full:
            assert r["dist"] == full[key]


def test_streaming_ingest_equals_batch_upsert(spark, sf_dir):
    """The streaming micro-batch ingest (readStream → foreachBatch →
    append) must produce a cell-keyed codes table ROW-IDENTICAL to the
    batch upsert under the same frozen quantizers — batch boundaries
    only partition the work (per-row assign/encode is deterministic), so
    the continuous-ingest path inherits the batch path's oracle."""
    from toy_vector_db_spark import registry as R
    from toy_vector_db_spark.streaming import ingest

    base, _qs = R._split(spark, sf_dir)
    n = R._emb_count(spark, sf_dir)
    cut = split_count(n, R.SPLIT_RATIO)
    init_cut = split_count(cut, R.UPSERT_RATIO)
    initial = base.where(F.col("vec_id") < init_cut)
    batch = base.where(F.col("vec_id") >= init_cut)
    cc_batch, cents, books = similarity.ivfpq_upsert(initial, batch)
    streamed = ingest.stream_ingest_codes(
        spark, sf_dir, init_cut, cut, cents, books
    )
    cc_stream = similarity.cached_codes_cells(initial).unionByName(
        streamed.select(*cc_batch.columns)
    )
    assert cc_stream.exceptAll(cc_batch).count() == 0
    assert cc_batch.exceptAll(cc_stream).count() == 0


def test_streaming_sq_ingest_equals_batch_upsert(spark, sf_dir):
    """The SQ8 streaming twin (round 8): draining the arriving slice
    through readStream → foreachBatch under the frozen bounds must
    produce a code set ROW-IDENTICAL to the batch sq_upsert — per-row
    encode means batch boundaries only partition the work, so the
    continuous path inherits sq_upsert_search's oracle."""
    from toy_vector_db_spark import registry as R
    from toy_vector_db_spark.streaming import ingest

    base, _qs = R._split(spark, sf_dir)
    n = R._emb_count(spark, sf_dir)
    cut = split_count(n, R.SPLIT_RATIO)
    init_cut = split_count(cut, R.UPSERT_RATIO)
    initial = base.where(F.col("vec_id") < init_cut)
    batch = base.where(F.col("vec_id") >= init_cut)
    codes_batch, bounds = similarity.sq_upsert(initial, batch)
    streamed = ingest.stream_ingest_sq_codes(
        spark, sf_dir, init_cut, cut, bounds
    )
    codes_stream = similarity.sq_code_array(initial, bounds).unionByName(
        streamed.select(*codes_batch.columns)
    )
    assert codes_stream.exceptAll(codes_batch).count() == 0
    assert codes_batch.exceptAll(codes_stream).count() == 0


def test_adc_lut_kernel_equals_fold_form(spark, embeddings):
    """_adc_lut_frame (round 6) computes the ADC lookup tables in an Arrow
    kernel; the Catalyst fold form — aggregate over zip_with squared diffs
    on the normalized query slices, the shape the DuckDB oracle evaluates —
    must produce the SAME doubles bit-for-bit (np.cumsum is the same
    sequential left fold; normalization the same magnitude fold)."""
    from pyspark.sql import functions as FF

    n = embeddings.count()
    cut = split_count(n, 0.95)
    base = embeddings.where(F.col("vec_id") < cut)
    qs = embeddings.where(F.col("vec_id") >= cut).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    books = similarity.trained_pq_codebooks(base)
    sub = len(books[0][0])
    kernel = {
        r["query_id"]: tuple(
            tuple(r[f"_lut{m}"]) for m in range(similarity.PQ_M)
        )
        for r in similarity._adc_lut_frame(qs, books).collect()
    }
    v = FF.col("query_vec").cast("array<double>")
    mag = FF.sqrt(
        FF.aggregate(
            FF.zip_with(v, v, lambda x, y: x * y),
            FF.lit(0.0),
            lambda acc, x: acc + FF.coalesce(x, FF.lit(0.0)),
        )
    )
    nq = qs.select("query_id", v.alias("_qv"), mag.alias("_m")).select(
        "query_id",
        FF.transform("_qv", lambda x: x / FF.col("_m")).alias("_nqv"),
    )
    cols = [FF.col("query_id")]
    for m in range(similarity.PQ_M):
        qsl = FF.slice(FF.col("_nqv"), m * sub + 1, sub)
        cols.append(
            FF.array(*[
                similarity._sq_dist(qsl, FF.lit(books[m][kk]))
                for kk in range(similarity.PQ_K)
            ]).alias(f"_lut{m}")
        )
    fold = {
        r["query_id"]: tuple(
            tuple(r[f"_lut{m}"]) for m in range(similarity.PQ_M)
        )
        for r in nq.select(*cols).collect()
    }
    assert fold == kernel


def test_ivf_probes_zero_shuffle_plan(spark, embeddings):
    """Round-6 serving fix (verdict item 7): the per-query cell routing is
    a map-side array_sort projection over the broadcast centroid row — the
    probe frame's plan must contain NO shuffle exchange and NO window."""
    n = embeddings.count()
    cut = split_count(n, 0.95)
    base = embeddings.where(F.col("vec_id") < cut)
    qs = embeddings.where(F.col("vec_id") >= cut).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    cents = similarity.cached_trained_centroids(base)
    probes = similarity._ivf_probes(qs, cents, similarity.N_PROBE)
    plan = probes._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    # the only allowed exchange is the 16-row centroid collect_list agg
    # feeding the broadcast (SinglePartition) — nothing query-side may
    # hash-shuffle
    assert "Exchange hashpartitioning" not in plan, plan


def test_lsh_bucket_range(spark, embeddings):
    buckets = similarity.lsh_hyperplane_buckets(embeddings).collect()
    assert all(0 <= r.bucket < 2**similarity.N_HYPERPLANES for r in buckets)
    # hyperplane rows themselves land in a bucket too
    assert len(buckets) == embeddings.count()


def test_ivfpq_partitioned_search_prunes_and_matches(spark, embeddings):
    """The on-disk cell-partitioned codes table must (a) produce results
    identical to the in-memory knn_ivfpq and (b) be scanned with
    PARTITION PRUNING on centroid_id — the physical mechanism behind
    'probe = partition pruning' at 100 TB. Round 10: with bounded
    batches the probe set is collected driver-side before the scan
    (the _pq_pair_adc routing), so the pruning is STATIC
    (PartitionFilters at planning time) — strictly earlier than the
    dynamic pruning the old probe-join plan produced at runtime; the
    oversized-batch probe-join plan keeps DPP. Accept either, reject a
    full unpruned scan."""
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
    static_pruned = (
        "partitionfilters: [centroid_id" in plan.lower()
        or "partitionfilters: [isnotnull(centroid_id" in plan.lower()
    )
    assert static_pruned or "dynamicpruning" in plan.lower(), (
        "expected partition pruning (static INSET or dynamic) on the "
        "cell-partitioned scan"
    )


def test_rerank_budget_cap(spark, embeddings):
    """Round 7 (verdict r6 item 3): the fraction term of the rerank
    budget is CAPPED at RERANK_CAP — uncapped it re-scored 10% of the
    corpus per query at any scale, a linear serving cost no deployment
    ships. The cap must be inactive at fixture scale (no result drift)
    and binding at simulated production scale."""
    key = (
        spark.sparkContext.applicationId,
        embeddings.semanticHash(),
        "vec_id",
    )
    old = similarity._COUNT_CACHE.get(key)
    try:
        # simulated billion-vector corpus: budget = the constant cap
        similarity._COUNT_CACHE[key] = 10**9
        assert similarity._rerank_budget(embeddings, 10) == similarity.RERANK_CAP
        # fixture-scale corpus: cap inactive, uncapped formula unchanged
        similarity._COUNT_CACHE[key] = 1900
        assert similarity._rerank_budget(embeddings, 10) == max(
            similarity.RERANK_MULT * 10, 190
        )
    finally:
        if old is None:
            similarity._COUNT_CACHE.pop(key, None)
        else:
            similarity._COUNT_CACHE[key] = old


def test_fixed_rerank_budget_recall(spark, embeddings, monkeypatch):
    """The CONSTANT-cost serving configuration (fraction term off,
    R = RERANK_MULT·k = 160) must hold the deployment recall bar — the
    measured numbers behind SCALE.md's rerank-budget table: at sf0.1
    PQ-rerank 0.877 (floor 0.85) and IVF-PQ 0.736 (floor 0.70); at
    sf0.001 R=160 already dominates the fraction term so the shipped
    floors apply unchanged. This is the gate that proves the headline
    recalls do not rest on the un-shippable linear budget."""
    monkeypatch.setattr(similarity, "RERANK_DEN", 10**12)
    n = embeddings.count()
    cut = split_count(n, 0.95)
    base = embeddings.where(F.col("vec_id") < cut)
    qs = embeddings.where(F.col("vec_id") >= cut).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    assert similarity._rerank_budget(base, 10) == similarity.RERANK_MULT * 10
    exact = knn.knn_exact_batch(base, qs, 10)
    small = base.count() <= 1000
    rr = similarity.knn_pq_rerank(base, qs, 10)
    rec_rr = evaluation.evaluate_recall(rr, exact).agg(F.avg("recall")).first()[0]
    assert rec_rr >= (0.92 if small else 0.85), f"fixed-R PQ rerank = {rec_rr}"
    ivfpq = similarity.knn_ivfpq(base, qs, 10)
    rec_pq = evaluation.evaluate_recall(ivfpq, exact).agg(F.avg("recall")).first()[0]
    assert rec_pq >= (0.75 if small else 0.70), f"fixed-R IVF-PQ = {rec_pq}"
    # round 8: BQ's fixed floor is 2× the shared one (BQ_RERANK_MULT=32,
    # R=320 at k=10) — measured 0.854 at sf0.1, clearing ≥0.70 with
    # margin at constant cost (scripts/bq_recall_study.py)
    bq = similarity.knn_bq_rerank(base, qs, 10)
    rec_bq = evaluation.evaluate_recall(bq, exact).agg(F.avg("recall")).first()[0]
    assert rec_bq >= (0.90 if small else 0.80), f"fixed-R BQ rerank = {rec_bq}"


def test_ivfpq_filtered_recall_and_predicate(spark, embeddings):
    """Filtered ANN (round 7): every returned neighbor must satisfy the
    query's label predicate (pre-filter semantics — candidates are
    restricted BEFORE the ADC top-R cut, so the rerank budget is spent
    on qualifying rows only), and recall vs the filtered-EXACT top-k
    must hold the family's bar."""
    from pyspark.sql import Window

    n = embeddings.count()
    cut = split_count(n, 0.95)
    base = embeddings.where(F.col("vec_id") < cut)
    qs = embeddings.where(F.col("vec_id") >= cut).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
        F.col("label").alias("qlabel"),
    )
    # round 8: label-aware probe selection via the per-label cell-hit
    # histogram (replaces the round-7 global inverse-selectivity
    # widening — at the unfiltered nprobe=8 with label-blind probing the
    # filtered recall had measured 0.632)
    bvec = base.select("vec_id", "embedding")
    labels = base.select("vec_id", "label")
    res = similarity.knn_ivfpq(
        bvec,
        qs.select("query_id", "query_vec"),
        10,
        labels=labels,
        query_labels=qs.select("query_id", "qlabel"),
        label_hist=similarity.label_cell_hist(bvec, labels),
    )
    # predicate holds on every output row
    joined = (
        res.join(base.select("vec_id", "label"), "vec_id")
        .join(qs.select("query_id", "qlabel"), "query_id")
    )
    assert joined.where(F.col("label") != F.col("qlabel")).count() == 0
    assert res.count() > 0
    # filtered-exact ground truth: per-query top-k over the label-matched
    # corpus slice (the knn_exact_filtered semantic, batch form)
    scored = knn._scored_product(
        base.select("vec_id", "embedding", "label"),
        qs,
        "vec_id", "embedding", "query_id", "query_vec",
    ).where(F.col("label") == F.col("qlabel"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist").asc(), F.col("vec_id").asc()
    )
    exact = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 10)
        .select("query_id", "vec_id", "dist", "rank")
    )
    rec = (
        evaluation.evaluate_recall(res, exact).agg(F.avg("recall")).first()[0]
    )
    # measured 1.0 at sf0.001 with the widened probe (0.632 without)
    small = base.count() <= 1000
    assert rec >= (0.95 if small else 0.85), f"filtered IVF-PQ recall = {rec}"


def test_filtered_kernel_postfilter_bit_identity(
    spark, embeddings, monkeypatch
):
    """Round 12 (verdict r11 item 2): the IDSelector label predicate
    moved INSIDE the pair kernels (label attached to the codes frame,
    per-query qlabels in the closure) so the per-partition emission
    bound engages on filtered paths too. Every filtered family must be
    BIT-IDENTICAL between the in-kernel form (default) and the Catalyst
    post-filter form — forced here via the oversized-batch guard
    (QUERY_BATCH_MAX=0 routes every caller onto the distributed
    post-filter plan, whose parity with the kernels is long-pinned)."""
    n = embeddings.count()
    cut = split_count(n, 0.95)
    base = embeddings.where(F.col("vec_id") < cut)
    qs_all = embeddings.where(F.col("vec_id") >= cut)
    qs = qs_all.select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    bvec = base.select("vec_id", "embedding")
    labels = base.select("vec_id", "label")
    qlabels = qs_all.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("qlabel")
    )
    kw = dict(labels=labels, query_labels=qlabels)
    calls = {
        "ivfpq": lambda: similarity.knn_ivfpq(bvec, qs, 10, **kw),
        "ivfsq": lambda: similarity.knn_ivfsq(bvec, qs, 10, **kw),
        "sq": lambda: similarity.knn_sq_rerank(bvec, qs, 10, **kw),
        "bq2": lambda: similarity.knn_bq2_rerank(bvec, qs, 10, **kw),
        "ivfbq2": lambda: similarity.knn_ivfbq2(bvec, qs, 10, **kw),
    }
    in_kernel = {
        name: sorted(map(tuple, fn().collect()))
        for name, fn in calls.items()
    }
    monkeypatch.setattr(knn, "QUERY_BATCH_MAX", 0)
    for name, fn in calls.items():
        post = sorted(map(tuple, fn().collect()))
        assert post == in_kernel[name], f"{name}: kernel ≠ post-filter"
        assert len(post) > 0, name


def test_ivfpq_filter_composes_with_tombstones(spark, embeddings):
    """The filtered-ANN predicate and the tombstone anti-join are both
    row predicates on the same compressed scan — the docstrings claim
    they compose; this proves it: label filter × tombstone delete in one
    search equals the filtered-exact top-k over the live label-matched
    slice (full probe ⇒ the probe trade is out of the picture and the
    equality is exact, the knn_ivfpq ≡ knn_pq_rerank gating pattern)."""
    from pyspark.sql import Window

    n = embeddings.count()
    cut = split_count(n, 0.95)
    base = embeddings.where(F.col("vec_id") < cut)
    qs = embeddings.where(F.col("vec_id") >= cut).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
        F.col("label").alias("qlabel"),
    )
    tombstones = base.select("vec_id").where(F.col("vec_id") % 17 == 0)
    cc = similarity.cached_codes_cells(base.select("vec_id", "embedding"))
    live_codes = cc.join(F.broadcast(tombstones), "vec_id", "left_anti")
    res = similarity.knn_ivfpq(
        base.select("vec_id", "embedding"),
        qs.select("query_id", "query_vec"),
        10,
        nprobe=similarity.N_CENTROIDS,  # full probe: exactness gate
        codes_cells=live_codes,
        labels=base.select("vec_id", "label"),
        query_labels=qs.select("query_id", "qlabel"),
    )
    live = base.where(F.col("vec_id") % 17 != 0)
    scored = knn._scored_product(
        live.select("vec_id", "embedding", "label"),
        qs,
        "vec_id", "embedding", "query_id", "query_vec",
    ).where(F.col("label") == F.col("qlabel"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist").asc(), F.col("vec_id").asc()
    )
    exact = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 10)
        .select("query_id", "vec_id", "rank")
    )
    got = res.select("query_id", "vec_id", "rank")
    assert got.exceptAll(exact).count() == 0
    assert exact.exceptAll(got).count() == 0


def test_filtered_label_probes_few_cells_when_correlated(spark):
    """Round-8 'done' criterion for label-aware probing (verdict r7 item
    6): on a corpus where labels correlate with the vector distribution
    (the common case — category-skewed corpora cluster by category), a
    filtered query must probe FAR fewer cells than C while holding the
    filtered-exact recall bar. The round-7 global widening probed
    min(C, nprobe·n_labels) = all C cells here; the histogram rule
    probes only the cells that hold the query's label, in distance
    order, until the rerank budget of label rows is covered."""
    import numpy as np
    from pyspark.sql import Window

    rng = np.random.default_rng(7)
    n, d, kc, sigma = 8000, 64, 8, 1.5
    centers = rng.normal(0, 1, (kc, d))
    lab = rng.integers(0, kc, n)
    X = centers[lab] + rng.normal(0, sigma, (n, d))
    rows = [
        (i, int(lab[i]), [float(x) for x in X[i]]) for i in range(n)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<float>"
    )
    cut = n - 50
    base = emb.where(F.col("vec_id") < cut)
    qs = emb.where(F.col("vec_id") >= cut).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
        F.col("label").alias("qlabel"),
    )
    bvec = base.select("vec_id", "embedding")
    labels = base.select("vec_id", "label")
    hist = similarity.label_cell_hist(bvec, labels)
    cents = similarity.cached_trained_centroids(bvec)
    r_target = similarity._rerank_budget(bvec, 10)
    probes = similarity._ivf_probes_labeled(
        qs.select("query_id", "query_vec"), cents,
        qs.select("query_id", "qlabel"), hist,
        similarity.N_PROBE, r_target,
    )
    per_q = probes.groupBy("query_id").count()
    avg_cells = per_q.agg(F.avg("count")).first()[0]
    max_cells = per_q.agg(F.max("count")).first()[0]
    C = similarity.N_CENTROIDS
    # probed cells ≪ C: the whole point of the histogram — the widening
    # rule would have probed all C cells for every query here
    assert max_cells < C, f"max probed cells {max_cells} not < C={C}"
    assert avg_cells <= C * 0.75, f"avg probed cells {avg_cells} vs C={C}"
    res = similarity.knn_ivfpq(
        bvec, qs.select("query_id", "query_vec"), 10,
        labels=labels,
        query_labels=qs.select("query_id", "qlabel"),
        label_hist=hist,
    )
    joined = (
        res.join(base.select("vec_id", "label"), "vec_id")
        .join(qs.select("query_id", "qlabel"), "query_id")
    )
    assert joined.where(F.col("label") != F.col("qlabel")).count() == 0
    scored = knn._scored_product(
        base.select("vec_id", "embedding", "label"), qs,
        "vec_id", "embedding", "query_id", "query_vec",
    ).where(F.col("label") == F.col("qlabel"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist").asc(), F.col("vec_id").asc()
    )
    exact = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 10)
        .select("query_id", "vec_id", "dist", "rank")
    )
    rec = (
        evaluation.evaluate_recall(res, exact).agg(F.avg("recall")).first()[0]
    )
    assert rec >= 0.85, f"correlated filtered recall = {rec}"


def test_filtered_unseen_label_returns_no_rows(spark, embeddings):
    """Label-aware probing edge case: a query whose label exists in NO
    base row has no cells to probe — the result must be EMPTY for that
    query (matching filtered-exact semantics: an equality filter with no
    matching rows has no top-k), not an error and not unfiltered
    fallback rows."""
    n = embeddings.count()
    cut = split_count(n, 0.95)
    base = embeddings.where(F.col("vec_id") < cut)
    bvec = base.select("vec_id", "embedding")
    labels = base.select("vec_id", "label")
    qs = embeddings.where(F.col("vec_id") >= cut).limit(3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
        F.lit(10**6).alias("qlabel"),  # label unseen in base
    )
    res = similarity.knn_ivfpq(
        bvec, qs.select("query_id", "query_vec"), 10,
        labels=labels,
        query_labels=qs.select("query_id", "qlabel"),
        label_hist=similarity.label_cell_hist(bvec, labels),
    )
    assert res.count() == 0


def test_ivfpq_filter_param_contract(spark, embeddings):
    """Review finding (round 8): label_hist without the row-level filter
    would return predicate-violating rows (probing restricts CELLS, the
    labels join restricts ROWS) — the combination is a typed error, as
    is passing only one of labels/query_labels."""
    import pytest

    base = embeddings.limit(50)
    bvec = base.select("vec_id", "embedding")
    labels = base.select("vec_id", "label")
    qs = base.limit(3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
        F.col("label").alias("qlabel"),
    )
    hist = similarity.label_cell_hist(bvec, labels)
    with pytest.raises(ValueError, match="label_hist requires"):
        similarity.knn_ivfpq(
            bvec, qs.select("query_id", "query_vec"), 5, label_hist=hist
        )
    with pytest.raises(ValueError, match="passed together"):
        similarity.knn_ivfpq(
            bvec, qs.select("query_id", "query_vec"), 5, labels=labels
        )


def test_bq_filtered_predicate_and_recall(spark, embeddings):
    """Filtered BQ (round 8 — the third family's IDSelector): every
    returned row satisfies the query's label predicate (equality applied
    BEFORE the Hamming top-R cut), and recall vs filtered-exact holds a
    high bar — BQ scans the whole corpus, so with the deeper budget
    R ≥ the label subset at fixture scale the filtered search is a full
    rerank of the qualifying rows (measured 1.0 at sf0.001 AND sf0.1)."""
    from pyspark.sql import Window

    n = embeddings.count()
    cut = split_count(n, 0.95)
    base = embeddings.where(F.col("vec_id") < cut)
    qs = embeddings.where(F.col("vec_id") >= cut).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
        F.col("label").alias("qlabel"),
    )
    res = similarity.knn_bq_rerank(
        base.select("vec_id", "embedding"),
        qs.select("query_id", "query_vec"), 10,
        labels=base.select("vec_id", "label"),
        query_labels=qs.select("query_id", "qlabel"),
    )
    joined = (
        res.join(base.select("vec_id", "label"), "vec_id")
        .join(qs.select("query_id", "qlabel"), "query_id")
    )
    assert joined.count() == res.count()
    assert joined.where(F.col("label") != F.col("qlabel")).count() == 0
    scored = knn._scored_product(
        base.select("vec_id", "embedding", "label"), qs,
        "vec_id", "embedding", "query_id", "query_vec",
    ).where(F.col("label") == F.col("qlabel"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist").asc(), F.col("vec_id").asc()
    )
    exact = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 10)
        .select("query_id", "vec_id", "dist", "rank")
    )
    rec = (
        evaluation.evaluate_recall(res, exact).agg(F.avg("recall")).first()[0]
    )
    small = base.count() <= 1000
    assert rec >= (0.95 if small else 0.90), f"filtered BQ recall = {rec}"


def test_sq_codes_match_python_recompute(spark, embeddings):
    """SQ8 codes (round 8, fourth family) recomputed row-by-row in pure
    Python with the engine's exact double op order (sequential-fold
    normalize, subtract/scale/floor/clamp) must match BIT-EXACTLY for
    every row — the same determinism contract the DuckDB oracle checks,
    proven against an independent third implementation. Also pins the
    range invariant (0..255) and that bounds are per-dim min/max of the
    normalized corpus."""
    import math

    cut = split_count(embeddings.count(), 0.95)
    base = embeddings.where(F.col("vec_id") < cut)
    raw = {r["vec_id"]: list(r["embedding"])
           for r in base.select("vec_id", "embedding").collect()}

    def norm(v):
        acc = 0.0
        for x in v:
            acc += float(x) * float(x)
        m = math.sqrt(acc)
        return [float(x) / m for x in v]

    nvs = {i: norm(v) for i, v in raw.items()}
    dims = len(next(iter(nvs.values())))
    mins = [min(nv[d] for nv in nvs.values()) for d in range(dims)]
    maxs = [max(nv[d] for nv in nvs.values()) for d in range(dims)]

    def code(x, mn, mx):
        if mx == mn:
            return 0
        return int(min(255.0, max(0.0, math.floor((x - mn) * 255.0 / (mx - mn)))))

    got = {}
    for r in similarity.sq_codes(base).collect():
        got.setdefault(r["vec_id"], {})[r["dim"]] = r["code"]
    assert set(got) == set(raw)
    for vid, nv in nvs.items():
        want = [code(nv[d], mins[d], maxs[d]) for d in range(dims)]
        have = [got[vid][d] for d in range(dims)]
        assert have == want, f"vec {vid}: codes diverge from recompute"
        assert all(0 <= c <= 255 for c in have)


def test_sq_rerank_recall(spark, embeddings):
    """SQ8 serving: 8-bit-per-dim ADC ranks so well that the SHARED
    rerank floor gives recall ≈ 1.0 (measured 1.0 at sf0.001, sf0.1 AND
    the 10× fixture under the shipped budget), and even the degenerate
    R=k prune — pure ADC, zero rerank slack — holds ≥0.95 (measured
    0.982 sf0.1 / 0.981 at 10×). This is the family-level answer to
    BQ's missing resolution knob: SQ's 64 B/vector scan buys a
    constant-cost configuration with recall headroom."""
    n = embeddings.count()
    cut = split_count(n, 0.95)
    base = embeddings.where(F.col("vec_id") < cut)
    qs = embeddings.where(F.col("vec_id") >= cut).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = knn.knn_exact_batch(base, qs, 10)
    sq = similarity.knn_sq_rerank(base, qs, 10)
    rec = evaluation.evaluate_recall(sq, exact).agg(F.avg("recall")).first()[0]
    assert rec >= 0.98, f"SQ rerank recall@10 = {rec}"
    adc_only = similarity.knn_sq_rerank(base, qs, 10, rerank_r=10)
    rec_adc = (
        evaluation.evaluate_recall(adc_only, exact).agg(F.avg("recall")).first()[0]
    )
    assert rec_adc >= 0.95, f"SQ ADC-only recall@10 = {rec_adc}"


def test_sq_filtered_predicate_and_recall(spark, embeddings):
    """Filtered SQ (the fourth family's IDSelector): every returned row
    satisfies the query's label predicate (equality applied BEFORE the
    ADC top-R cut), and recall vs filtered-exact stays at the family's
    ≈1.0 bar — SQ scans the whole corpus, so the filter just re-targets
    the R budget onto qualifying rows."""
    from pyspark.sql import Window

    n = embeddings.count()
    cut = split_count(n, 0.95)
    base = embeddings.where(F.col("vec_id") < cut)
    qs = embeddings.where(F.col("vec_id") >= cut).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
        F.col("label").alias("qlabel"),
    )
    res = similarity.knn_sq_rerank(
        base.select("vec_id", "embedding"),
        qs.select("query_id", "query_vec"), 10,
        labels=base.select("vec_id", "label"),
        query_labels=qs.select("query_id", "qlabel"),
    )
    joined = (
        res.join(base.select("vec_id", "label"), "vec_id")
        .join(qs.select("query_id", "qlabel"), "query_id")
    )
    assert joined.count() == res.count()
    assert joined.where(F.col("label") != F.col("qlabel")).count() == 0
    scored = knn._scored_product(
        base.select("vec_id", "embedding", "label"), qs,
        "vec_id", "embedding", "query_id", "query_vec",
    ).where(F.col("label") == F.col("qlabel"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist").asc(), F.col("vec_id").asc()
    )
    exact = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 10)
        .select("query_id", "vec_id", "dist", "rank")
    )
    rec = (
        evaluation.evaluate_recall(res, exact).agg(F.avg("recall")).first()[0]
    )
    small = base.count() <= 1000
    assert rec >= (0.95 if small else 0.90), f"filtered SQ recall = {rec}"


def test_sq_upsert_equals_frozen_rebuild(spark, embeddings):
    """SQ lifecycle (round 8): frozen-bounds append must be ROW-IDENTICAL
    to encoding the full corpus under the same frozen bounds — the
    per-row-expression argument that makes sq_upsert_search's oracle
    (min/max scan bounded to the initial slice) valid. Also pins the
    saturation contract: batch values outside the frozen range clamp to
    0/255, never error or overflow the byte range."""
    cut = split_count(embeddings.count(), 0.95)
    base = embeddings.where(F.col("vec_id") < cut).select(
        "vec_id", "embedding"
    )
    init_cut = split_count(cut, 0.75)
    initial = base.where(F.col("vec_id") < init_cut)
    batch = base.where(F.col("vec_id") >= init_cut)
    codes, bounds = similarity.sq_upsert(initial, batch)
    rebuild = similarity.sq_code_array(base, bounds)
    got = sorted(
        (r["vec_id"], list(r["codes"])) for r in codes.collect()
    )
    want = sorted(
        (r["vec_id"], list(r["codes"])) for r in rebuild.collect()
    )
    assert got == want
    assert all(0 <= c <= 255 for _, cs in got for c in cs)
    # the frozen bounds really are the initial slice's, not the union's:
    # at least one batch dimension must saturate or the test is vacuous
    # on a fixture where the batch extends the range
    full_bounds = similarity.sq_bounds(base).first()
    init_bounds = bounds.first()
    assert list(init_bounds["mins"]) != list(full_bounds["mins"]) or list(
        init_bounds["maxs"]
    ) != list(full_bounds["maxs"])


def test_sq_delete_excludes_tombstones_and_equals_compaction(
    spark, embeddings
):
    """SQ lifecycle (round 8): tombstone delete never returns a deleted
    id, and the anti-joined code set serves results IDENTICAL to a
    compacted artifact (codes re-encoded from the live rows under the
    unchanged bounds) — per-row encode makes compaction a rewrite, not
    a recompute, so the third CRUD leg is proven rather than shipped as
    a separate key."""
    cut = split_count(embeddings.count(), 0.95)
    base = embeddings.where(F.col("vec_id") < cut).select(
        "vec_id", "embedding"
    )
    qs = embeddings.where(F.col("vec_id") >= cut).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    bounds = similarity.cached_sq_bounds(base)
    codes = similarity.sq_code_array(base, bounds)
    tombstones = base.select("vec_id").where(F.col("vec_id") % 17 == 0)
    live = codes.join(F.broadcast(tombstones), "vec_id", "left_anti")
    res = similarity.knn_sq_rerank(base, qs, 10, bounds=bounds, codes=live)
    rows = res.collect()
    assert rows and all(r["vec_id"] % 17 != 0 for r in rows)
    # compaction equivalence: same bounds, codes rebuilt from live rows
    live_base = base.join(F.broadcast(tombstones), "vec_id", "left_anti")
    compacted = similarity.sq_code_array(live_base, bounds)
    res_c = similarity.knn_sq_rerank(
        base, qs, 10, bounds=bounds, codes=compacted
    )
    a = sorted(tuple(r) for r in rows)
    b = sorted(tuple(r) for r in res_c.collect())
    assert a == b


def test_ivfsq_full_probe_equals_sq_rerank(spark, embeddings):
    """IVF-SQ (round 8): at nprobe = C every cell is probed, so the
    composition must return EXACTLY the flat SQ pipeline's results —
    the knn_ivfpq ≡ knn_pq_rerank gating argument applied to the
    fourth family's composition."""
    cut = split_count(embeddings.count(), 0.95)
    base = embeddings.where(F.col("vec_id") < cut).select(
        "vec_id", "embedding"
    )
    qs = embeddings.where(F.col("vec_id") >= cut).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    flat = similarity.knn_sq_rerank(base, qs, 10).collect()
    full = similarity.knn_ivfsq(
        base, qs, 10, nprobe=similarity.N_CENTROIDS
    ).collect()
    assert sorted(map(tuple, flat)) == sorted(map(tuple, full))


def test_ivfsq_recall(spark, embeddings):
    """IVF-SQ partial probe: SQ's ADC is near-exact within probed cells,
    so recall is bounded by the coarse-probe miss rate alone — the same
    floor knn_ivf carries (measured 0.804 sf0.001 / 0.774 sf0.1; IVF-PQ
    sits lower because PQ's ADC adds rank error, SQ's does not)."""
    cut = split_count(embeddings.count(), 0.95)
    base = embeddings.where(F.col("vec_id") < cut).select(
        "vec_id", "embedding"
    )
    qs = embeddings.where(F.col("vec_id") >= cut).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    exact = knn.knn_exact_batch(base, qs, 10)
    ivfsq = similarity.knn_ivfsq(base, qs, 10)
    rec = (
        evaluation.evaluate_recall(ivfsq, exact)
        .agg(F.avg("recall")).first()[0]
    )
    small = base.count() <= 1000
    assert rec >= (0.75 if small else 0.70), f"IVF-SQ recall@10 = {rec}"


def test_ivfsq_upsert_equals_frozen_rebuild(spark, embeddings):
    """IVF-SQ lifecycle (round 8): frozen-quantizer append (coarse
    centroids AND bounds frozen on the initial slice) must be
    ROW-IDENTICAL to assigning + encoding the full corpus under the
    same frozen pair — the per-row argument that validates the upsert
    oracle's doubly-bounded training."""
    cut = split_count(embeddings.count(), 0.95)
    base = embeddings.where(F.col("vec_id") < cut).select(
        "vec_id", "embedding"
    )
    init_cut = split_count(cut, 0.75)
    initial = base.where(F.col("vec_id") < init_cut)
    batch = base.where(F.col("vec_id") >= init_cut)
    sq_cells, cents, bounds = similarity.ivfsq_upsert(initial, batch)
    rebuild = similarity.sq_code_array(base, bounds).join(
        similarity.ivf_assign(base, cents).select("vec_id", "centroid_id"),
        "vec_id",
    )
    got = sorted(
        (r["vec_id"], r["centroid_id"], list(r["codes"]))
        for r in sq_cells.collect()
    )
    want = sorted(
        (r["vec_id"], r["centroid_id"], list(r["codes"]))
        for r in rebuild.collect()
    )
    assert got == want


def test_ivfsq_delete_excludes_tombstones_and_equals_compaction(
    spark, embeddings
):
    """IVF-SQ lifecycle (round 8): tombstone delete never returns a
    deleted id, and the anti-joined cell-keyed code set serves results
    identical to a compacted artifact (re-encoded + re-assigned live
    rows under the unchanged frozen pair)."""
    cut = split_count(embeddings.count(), 0.95)
    base = embeddings.where(F.col("vec_id") < cut).select(
        "vec_id", "embedding"
    )
    qs = embeddings.where(F.col("vec_id") >= cut).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    cents = similarity.cached_trained_centroids(base)
    bounds = similarity.cached_sq_bounds(base)
    cells = similarity.cached_sq_cells(base)
    tombstones = base.select("vec_id").where(F.col("vec_id") % 17 == 0)
    live = cells.join(F.broadcast(tombstones), "vec_id", "left_anti")
    res = similarity.knn_ivfsq(
        base, qs, 10, cents=cents, bounds=bounds, sq_cells=live
    )
    rows = res.collect()
    assert rows and all(r["vec_id"] % 17 != 0 for r in rows)
    live_base = base.join(F.broadcast(tombstones), "vec_id", "left_anti")
    compacted = similarity.sq_code_array(live_base, bounds).join(
        similarity.ivf_assign(live_base, cents).select(
            "vec_id", "centroid_id"
        ),
        "vec_id",
    )
    res_c = similarity.knn_ivfsq(
        base, qs, 10, cents=cents, bounds=bounds, sq_cells=compacted
    )
    a = sorted(tuple(r) for r in rows)
    b = sorted(tuple(r) for r in res_c.collect())
    assert a == b


def test_ivfsq_filtered_predicate_and_recall(spark, embeddings):
    """Filtered IVF-SQ (round 8): every returned row satisfies the
    query's label predicate (equality before the ADC top-R cut,
    histogram-guided probes), and recall vs filtered-exact holds the
    family bar — the same shared coarse quantizer and histogram serve
    both compositions."""
    from pyspark.sql import Window

    n = embeddings.count()
    cut = split_count(n, 0.95)
    base = embeddings.where(F.col("vec_id") < cut)
    qs = embeddings.where(F.col("vec_id") >= cut).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
        F.col("label").alias("qlabel"),
    )
    bvec = base.select("vec_id", "embedding")
    labels = base.select("vec_id", "label")
    res = similarity.knn_ivfsq(
        bvec,
        qs.select("query_id", "query_vec"), 10,
        labels=labels,
        query_labels=qs.select("query_id", "qlabel"),
        label_hist=similarity.cached_label_cell_hist(bvec, labels),
    )
    joined = (
        res.join(labels, "vec_id")
        .join(qs.select("query_id", "qlabel"), "query_id")
    )
    assert joined.count() == res.count()
    assert joined.where(F.col("label") != F.col("qlabel")).count() == 0
    scored = knn._scored_product(
        base.select("vec_id", "embedding", "label"), qs,
        "vec_id", "embedding", "query_id", "query_vec",
    ).where(F.col("label") == F.col("qlabel"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist").asc(), F.col("vec_id").asc()
    )
    exact = (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 10)
        .select("query_id", "vec_id", "dist", "rank")
    )
    rec = (
        evaluation.evaluate_recall(res, exact).agg(F.avg("recall")).first()[0]
    )
    small = base.count() <= 1000
    assert rec >= (0.90 if small else 0.85), f"filtered IVF-SQ recall = {rec}"


def test_labeled_probe_rule_covers_budget_or_all_cells(spark, embeddings):
    """Core invariant of the histogram probe rule: for every query,
    either the probed cells' cumulative label count reaches the rerank
    budget, or EVERY cell containing the label was probed (plus the
    nprobe floor always holds) — the property that makes the cumsum
    cut safe regardless of how the label mass is distributed."""
    n = embeddings.count()
    cut = split_count(n, 0.95)
    base = embeddings.where(F.col("vec_id") < cut)
    bvec = base.select("vec_id", "embedding")
    labels = base.select("vec_id", "label")
    qs = embeddings.where(F.col("vec_id") >= cut).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
        F.col("label").alias("qlabel"),
    )
    hist = similarity.label_cell_hist(bvec, labels)
    r_target = similarity._rerank_budget(bvec, 10)
    probes = similarity._ivf_probes_labeled(
        qs.select("query_id", "query_vec"),
        similarity.cached_trained_centroids(bvec),
        qs.select("query_id", "qlabel"), hist,
        similarity.N_PROBE, r_target,
    )
    got = (
        probes.join(qs.select("query_id", "qlabel"), "query_id")
        .join(hist, (F.col("qlabel") == F.col("label"))
              & (probes["centroid_id"] == hist["centroid_id"]))
        .groupBy("query_id")
        .agg(F.sum("cnt").alias("covered"), F.count("*").alias("ncells"))
    )
    lbl_totals = hist.groupBy("label").agg(
        F.sum("cnt").alias("total"), F.count("*").alias("allcells")
    )
    chk = got.join(qs.select("query_id", "qlabel"), "query_id").join(
        lbl_totals, F.col("qlabel") == F.col("label")
    )
    bad = chk.where(
        ~(
            (F.col("covered") >= F.lit(r_target))
            | (F.col("ncells") == F.col("allcells"))
        )
    )
    assert bad.count() == 0, bad.limit(5).collect()


def test_trained_centroids_cap_beyond_fixture_scale(spark):
    """The upsert oracles AND `vec_id < TRAIN_SAMPLE` into their
    train_pred because the engine trains on ids < TRAIN_SAMPLE within
    whatever base frame it is handed — but no fixture exceeds the cap,
    so the contract is pinned here synthetically: above-cap rows must
    not influence training (training on the full frame == training on
    the explicitly capped slice, bit-identical centroids)."""
    from pyspark.sql import functions as F

    from toy_vector_db_spark.operators import similarity

    n = similarity.TRAIN_SAMPLE + 1904  # past the cap, cheap to build
    rows = [
        (i, [float((i * 7 + j * 3) % 13) for j in range(4)])
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    full = similarity.trained_centroids(df).orderBy("centroid_id").collect()
    capped = (
        similarity.trained_centroids(
            df.where(F.col("vec_id") < similarity.TRAIN_SAMPLE)
        )
        .orderBy("centroid_id")
        .collect()
    )
    assert [r.asDict() for r in full] == [r.asDict() for r in capped]


def test_ivfbq_full_probe_equals_bq_rerank(spark, embeddings):
    """IVF-BQ (round 8): at nprobe = C every cell is probed, so the
    composition must return EXACTLY the flat BQ pipeline's results —
    the same gating argument as the PQ and SQ compositions, closing
    the IVF×{PQ, SQ, BQ} matrix."""
    cut = split_count(embeddings.count(), 0.95)
    base = embeddings.where(F.col("vec_id") < cut).select(
        "vec_id", "embedding"
    )
    qs = embeddings.where(F.col("vec_id") >= cut).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    flat = similarity.knn_bq_rerank(base, qs, 10).collect()
    full = similarity.knn_ivfbq(
        base, qs, 10, nprobe=similarity.N_CENTROIDS
    ).collect()
    assert sorted(map(tuple, flat)) == sorted(map(tuple, full))


def test_ivfbq_recall(spark, embeddings):
    """IVF-BQ partial probe: recall compounds the coarse-probe miss rate
    with BQ's weak Hamming ranking WITHIN probed cells, so the floor
    sits below the SQ composition's but must still clear the family's
    deployment bar at BQ's deeper rerank budget."""
    cut = split_count(embeddings.count(), 0.95)
    base = embeddings.where(F.col("vec_id") < cut).select(
        "vec_id", "embedding"
    )
    qs = embeddings.where(F.col("vec_id") >= cut).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    exact = knn.knn_exact_batch(base, qs, 10)
    ivfbq = similarity.knn_ivfbq(base, qs, 10)
    rec = (
        evaluation.evaluate_recall(ivfbq, exact)
        .agg(F.avg("recall")).first()[0]
    )
    small = base.count() <= 1000
    assert rec >= (0.70 if small else 0.65), f"IVF-BQ recall@10 = {rec}"


def test_ivfbq2_full_probe_equals_bq2_rerank(spark, embeddings):
    """IVF-BQ2 (round 9): at nprobe = C every cell is probed, so the
    fourth composition column must return EXACTLY the flat BQ2
    pipeline's results — the matrix gating argument, now on all four
    fine quantizers."""
    cut = split_count(embeddings.count(), 0.95)
    base = embeddings.where(F.col("vec_id") < cut).select(
        "vec_id", "embedding"
    )
    qs = embeddings.where(F.col("vec_id") >= cut).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    flat = similarity.knn_bq2_rerank(base, qs, 10).collect()
    full = similarity.knn_ivfbq2(
        base, qs, 10, nprobe=similarity.N_CENTROIDS
    ).collect()
    assert sorted(map(tuple, flat)) == sorted(map(tuple, full))


def test_ivfbq2_recall(spark, embeddings):
    """IVF-BQ2 partial probe at the SHARED budget: the 2-bit code's
    near-SQ in-cell ranking means the probe miss rate dominates — the
    floor matches the SQ composition's family bar, NOT BQ's deepened
    one."""
    cut = split_count(embeddings.count(), 0.95)
    base = embeddings.where(F.col("vec_id") < cut).select(
        "vec_id", "embedding"
    )
    qs = embeddings.where(F.col("vec_id") >= cut).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    exact = knn.knn_exact_batch(base, qs, 10)
    ivfbq2 = similarity.knn_ivfbq2(base, qs, 10)
    rec = (
        evaluation.evaluate_recall(ivfbq2, exact)
        .agg(F.avg("recall")).first()[0]
    )
    assert rec >= 0.70, f"IVF-BQ2 recall@10 = {rec}"


def _adc_splits(embeddings):
    cut = split_count(embeddings.count(), 0.95)
    base = embeddings.where(F.col("vec_id") < cut).select(
        "vec_id", "embedding"
    )
    qs = embeddings.where(F.col("vec_id") >= cut).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    return base, qs


def _window_topr(cand, score_col, r):
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col(score_col).asc(), F.col("vec_id").asc()
    )
    return sorted(
        map(
            tuple,
            cand.withColumn("rr", F.row_number().over(w))
            .where(F.col("rr") <= r)
            .select("query_id", "vec_id", score_col, "rr")
            .collect(),
        )
    )


def test_pq_adc_emit_topk_bounded_emission_is_lossless(spark, embeddings):
    """Round 11 (verdict r10 item 1): _pq_pair_adc(emit_topk=R) keeps
    each query's per-batch top-R under the window's exact
    (ad2 asc, id asc) order — a provable superset of the global top-R
    with identical ad2 doubles. Stress MULTI-BATCH (base repartitioned
    to 16) and assert both losslessness and the emission bound
    batches x queries x R."""
    base, qs = _adc_splits(embeddings)
    books = similarity.trained_pq_codebooks(base)
    codes = similarity.pq_codes(base).repartition(16)
    r = 12
    full = similarity._pq_pair_adc(codes, qs, books)
    capped = similarity._pq_pair_adc(codes, qs, books, emit_topk=r)
    assert _window_topr(capped, "ad2", r) == _window_topr(full, "ad2", r)
    n_q = qs.count()
    emitted = capped.count()
    assert emitted <= 16 * n_q * r
    assert emitted < base.count() * n_q, "cap did not reduce emission"


def test_pq_adc_emit_topk_routed_matches_unrouted_window(spark, embeddings):
    """Routed + capped: knn_ivfpq's kernel path (cells_by_query AND
    emit_topk) must equal the uncapped routed emission under the same
    final window."""
    base, qs = _adc_splits(embeddings)
    books = similarity.trained_pq_codebooks(base)
    cents = similarity.cached_trained_centroids(base)
    cc = similarity.cached_codes_cells(base)
    probes = similarity._ivf_probes(qs, cents, similarity.N_PROBE)
    routing: dict[int, list] = {}
    for row in probes.select("query_id", "centroid_id").collect():
        routing.setdefault(int(row["query_id"]), []).append(
            int(row["centroid_id"])
        )
    probed = sorted({c for cs in routing.values() for c in cs})
    src = cc.where(F.col("centroid_id").isin(probed)).repartition(16)
    r = 12
    capped = similarity._pq_pair_adc(
        src, qs, books, cells_by_query=routing, emit_topk=r
    )
    full = similarity._pq_pair_adc(src, qs, books, cells_by_query=routing)
    assert _window_topr(capped, "ad2", r) == _window_topr(full, "ad2", r)
    assert capped.count() <= full.count()


def test_sq_adc_emit_topk_bounded_emission_is_lossless(spark, embeddings):
    """Round 11 (verdict r10 item 1): _sq_pair_adc(emit_topk=R), plain
    and cell-routed, is lossless under the downstream (ad2, id) window
    and bounded per batch."""
    base, qs = _adc_splits(embeddings)
    bounds = similarity.cached_sq_bounds(base)
    codes = similarity.sq_code_array(base, bounds)
    deq = codes.crossJoin(F.broadcast(bounds)).select(
        "vec_id",
        similarity._sq_deq(
            F.col("codes"), F.col("mins"), F.col("maxs")
        ).alias("deq"),
    ).repartition(16)
    nq = qs.select(
        "query_id",
        similarity._normalize(
            similarity._as_double("query_vec")
        ).alias("qnv"),
    )
    r = 12
    full = similarity._sq_pair_adc(deq, nq)
    capped = similarity._sq_pair_adc(deq, nq, emit_topk=r)
    assert _window_topr(capped, "ad2", r) == _window_topr(full, "ad2", r)
    n_q = qs.count()
    emitted = capped.count()
    assert emitted <= 16 * n_q * r
    assert emitted < base.count() * n_q, "cap did not reduce emission"

    # routed mode: the knn_ivfsq kernel path
    cents = similarity.cached_trained_centroids(base)
    sq_cells = similarity.cached_sq_cells(base)
    deqc = sq_cells.crossJoin(F.broadcast(bounds)).select(
        "vec_id",
        "centroid_id",
        similarity._sq_deq(
            F.col("codes"), F.col("mins"), F.col("maxs")
        ).alias("deq"),
    ).repartition(16)
    probes = similarity._ivf_probes(qs, cents, similarity.N_PROBE)
    routing: dict[int, list] = {}
    for row in probes.select("query_id", "centroid_id").collect():
        routing.setdefault(int(row["query_id"]), []).append(
            int(row["centroid_id"])
        )
    capped_r = similarity._sq_pair_adc(
        deqc, nq, cells_by_query=routing, emit_topk=r
    )
    full_r = similarity._sq_pair_adc(deqc, nq, cells_by_query=routing)
    assert _window_topr(capped_r, "ad2", r) == _window_topr(full_r, "ad2", r)
    assert capped_r.count() <= full_r.count()


def test_filtered_rare_label_spends_budget_on_matches(spark, embeddings):
    """Selective-filter correctness (round 12-13): the IDSelector label
    predicate applies BEFORE the top-R cut (in-kernel row mask on
    bounded batches, join-fused equality on the distributed fallback),
    so for a label that is RARE in every cell the whole rerank budget
    lands on qualifying rows — the result must contain only matching
    rows and must not be empty (a post-filter of an unfiltered top-R
    would starve exactly this case)."""
    base, qs = _adc_splits(embeddings)
    # rare label: 1 of every 37 rows; queries all ask for it
    labels = base.select(
        "vec_id",
        F.when(F.col("vec_id") % 37 == 0, F.lit("rare"))
        .otherwise(F.lit("common"))
        .alias("label"),
    )
    qlabels = qs.select("query_id", F.lit("rare").alias("qlabel"))
    got = similarity.knn_ivfpq(
        base, qs, 5, labels=labels, query_labels=qlabels
    )
    joined = got.join(labels, "vec_id").where(F.col("label") != "rare")
    assert joined.count() == 0, "filtered result leaked non-matching rows"
    assert got.count() > 0


def test_adc_emission_is_per_partition_exact(spark, embeddings):
    """Round 11: the emission bound accumulates across a partition's
    Arrow batches (knn._TopRAcc), so the emitted set is EXACTLY each
    query's per-partition top-R — Σ_p min(rows_p, R) rows per query,
    independent of Arrow batch boundaries. The per-batch form could
    never bind at the real rerank budget (R=16384 > the 10k Arrow batch
    cap); this pins the per-partition semantics with a small R and a
    2-partition base, where the exact count is computable."""
    base, qs = _adc_splits(embeddings)
    books = similarity.trained_pq_codebooks(base)
    codes = similarity.pq_codes(base).repartition(2)
    n_rows = codes.count()
    n_q = qs.count()
    r = 7
    capped = similarity._pq_pair_adc(codes, qs, books, emit_topk=r)
    # 2 partitions, each larger than r → exactly 2·r rows per query
    assert capped.count() == 2 * r * n_q
    # and still lossless under the downstream window
    full = similarity._pq_pair_adc(codes, qs, books)
    assert _window_topr(capped, "ad2", r) == _window_topr(full, "ad2", r)
    assert n_rows > 2 * r  # the bound actually binds
