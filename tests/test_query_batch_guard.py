"""QUERY_BATCH_MAX guard (round 7, verdict r6 item 4).

The Arrow pair kernel ships the query batch to the driver and into task
closures — sane only for a bounded serving batch. These tests pin the
guard: an oversized query frame must produce the pure-Catalyst fallback
plan (no driver collect, no Arrow kernel node, no broadcast of the
oversized side), and the fallback must be value-identical to the kernel
on the fixture workloads (so driver hashes cannot move).
"""

import pytest
from pyspark.sql import functions as F

from toy_vector_db_spark.operators import knn, similarity
from toy_vector_db_spark.plans import explain
from toy_vector_db_spark.sources.ndjson import split_count


def _splits(spark, embeddings):
    n = embeddings.count()
    cut = split_count(n, 0.75)
    base = embeddings.where(F.col("vec_id") < cut)
    qs = (
        embeddings.where(F.col("vec_id") >= cut)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("query_vec"),
        )
        .limit(25)
    )
    return base, qs


def _oversized_queries(spark, embeddings, nrows):
    """A query frame that is structurally valid but larger than any
    serving batch — spark.range with a literal vector, built lazily, so
    constructing the PLAN is cheap; the guard only ever runs a count on
    it."""
    vec = [
        float(x)
        for x in embeddings.where(F.col("vec_id") == 0)
        .select("embedding")
        .first()[0]
    ]
    return spark.range(nrows).select(
        F.col("id").alias("query_id"),
        F.lit(vec).cast("array<double>").alias("query_vec"),
    )


def test_oversized_batch_gets_catalyst_plan_no_collect(spark, embeddings):
    base, _ = _splits(spark, embeddings)
    big = _oversized_queries(spark, embeddings, knn.QUERY_BATCH_MAX + 1)
    before = dict(knn._QUERY_BATCH_CACHE)
    out = knn.pair_scores(base, big)
    plan = explain.formatted_plan(out)
    # pure-Catalyst fallback: no Arrow kernel node in the plan
    assert "PythonMapInArrow" not in plan and "MapInArrow" not in plan
    # the oversized frame was never collected to the driver
    assert dict(knn._QUERY_BATCH_CACHE) == before
    # and the oversized (right/query) side is never the broadcast side —
    # with the hint dropped, Spark is free to broadcast the SMALL base
    # side instead (BuildLeft at fixture scale: correct), but must not
    # ship the big frame to every executor
    bnlj = [
        line for line in plan.splitlines()
        if "BroadcastNestedLoopJoin" in line
    ]
    assert all("BuildRight" not in line for line in bnlj), plan


def test_oversized_batch_knn_ivf_probe_join_plan(spark, embeddings):
    base, _ = _splits(spark, embeddings)
    big = _oversized_queries(spark, embeddings, knn.QUERY_BATCH_MAX + 1)
    cents = similarity.cached_trained_centroids(base)
    out = similarity.knn_ivf(
        base,
        big,
        10,
        cents=cents,
        assign=similarity.cached_trained_assign(base),
        cell_vectors=similarity.cached_cell_vectors(base),
    )
    plan = explain.formatted_plan(out)
    assert "PythonMapInArrow" not in plan and "MapInArrow" not in plan
    # the probe-join fallback scores via a real join on centroid_id
    assert "centroid_id" in plan


def test_fallback_values_match_kernel(spark, embeddings, monkeypatch):
    """Force the fallback on the normal 25-query fixture batch and assert
    bit-identical output vs the kernel path — the driver-hash invariance
    argument for the guard."""
    base, qs = _splits(spark, embeddings)
    kernel = knn.knn_exact_batch(base, qs, 10).collect()
    monkeypatch.setattr(knn, "QUERY_BATCH_MAX", 1)
    knn._QUERY_COUNT_CACHE.clear()
    fallback = knn.knn_exact_batch(base, qs, 10).collect()
    assert sorted(map(tuple, kernel)) == sorted(map(tuple, fallback))
    knn._QUERY_COUNT_CACHE.clear()


def test_fallback_values_match_kernel_ivf(spark, embeddings, monkeypatch):
    base, qs = _splits(spark, embeddings)
    cents = similarity.cached_trained_centroids(base)
    assign = similarity.cached_trained_assign(base)
    cv = similarity.cached_cell_vectors(base)
    kernel = similarity.knn_ivf(
        base, qs, 10, cents=cents, assign=assign, cell_vectors=cv
    ).collect()
    monkeypatch.setattr(knn, "QUERY_BATCH_MAX", 1)
    knn._QUERY_COUNT_CACHE.clear()
    fallback = similarity.knn_ivf(
        base, qs, 10, cents=cents, assign=assign, cell_vectors=cv
    ).collect()
    assert sorted(map(tuple, kernel)) == sorted(map(tuple, fallback))
    knn._QUERY_COUNT_CACHE.clear()


def test_fallback_values_match_kernel_dual_metric(spark, embeddings,
                                                  monkeypatch):
    base, qs = _splits(spark, embeddings)
    kernel = knn.pair_scores(base, qs, dual_metric=True).collect()
    monkeypatch.setattr(knn, "QUERY_BATCH_MAX", 1)
    knn._QUERY_COUNT_CACHE.clear()
    fallback = knn.pair_scores(base, qs, dual_metric=True).collect()
    assert sorted(map(tuple, kernel)) == sorted(map(tuple, fallback))
    knn._QUERY_COUNT_CACHE.clear()


def test_oversized_with_cells_routing_raises(spark, embeddings):
    base, _ = _splits(spark, embeddings)
    big = _oversized_queries(spark, embeddings, knn.QUERY_BATCH_MAX + 1)
    with pytest.raises(ValueError, match="bounded query batch"):
        knn.pair_scores(base, big, cells_by_query={0: [0]})


def test_query_batch_count_is_limit_bounded(spark):
    """Round-7 advice item 4: the guard count is limit(MAX+1)-bounded —
    exact for frames at or under QUERY_BATCH_MAX, capped at MAX+1 above
    it (the guard only compares against MAX, so a frame just over the
    threshold must not pay a full extra scan)."""
    small = spark.range(37).select(F.col("id").alias("query_id"))
    assert knn.query_batch_count(small) == 37
    big = spark.range(knn.QUERY_BATCH_MAX + 500_000).select(
        F.col("id").alias("query_id")
    )
    c = knn.query_batch_count(big)
    assert c == knn.QUERY_BATCH_MAX + 1  # capped, still > MAX


def test_count_guard_recounts_when_staging_dir_grows(spark, tmp_path):
    """Round 10 (verdict r9 item 5): the guard's cached count must go
    stale-proof. A serving process re-reading a GROWING staging dir gets
    a fresh plan whose semantic hash can equal the first read's — the
    relation hashes by path, not file list — so the cache key now
    includes an input-file snapshot and the guard re-counts after the
    directory grows."""
    staging = str(tmp_path / "staging")
    spark.range(10).select(F.col("id").alias("query_id")).write.parquet(
        staging
    )
    first = spark.read.parquet(staging).select("query_id")
    assert knn.query_batch_count(first) == 10
    # the staging dir grows between calls (a new micro-batch lands)
    spark.range(100, 125).select(
        F.col("id").alias("query_id")
    ).write.mode("append").parquet(staging)
    second = spark.read.parquet(staging).select("query_id")
    # the hazard precondition this test exists for: when the two plans
    # hash identically, only the file snapshot can distinguish them
    if first.semanticHash() == second.semanticHash():
        assert knn._input_snapshot(first) != knn._input_snapshot(second)
    assert knn.query_batch_count(second) == 35, (
        "guard served the stale pre-growth count"
    )


def test_collected_batch_cache_recollects_when_staging_dir_grows(
    spark, tmp_path
):
    """Same staleness fix for the collected-batch cache: a grown staging
    dir must re-collect, or the kernel would serve the OLD query rows."""
    staging = str(tmp_path / "staging_vec")
    spark.range(5).select(
        F.col("id").alias("query_id"),
        F.array(F.lit(1.0), F.lit(2.0)).alias("query_vec"),
    ).write.parquet(staging)
    first = spark.read.parquet(staging)
    got1 = knn._collected_queries(first, "query_id", "query_vec")
    assert len(got1) == 5
    spark.range(100, 103).select(
        F.col("id").alias("query_id"),
        F.array(F.lit(3.0), F.lit(4.0)).alias("query_vec"),
    ).write.mode("append").parquet(staging)
    second = spark.read.parquet(staging)
    got2 = knn._collected_queries(second, "query_id", "query_vec")
    assert len(got2) == 8, "cache served the stale pre-growth batch"


def test_fallback_values_match_kernel_sq_adc(spark, embeddings, monkeypatch):
    """The SQ ADC kernel's oversized-batch fallback (round 8): force the
    pure-Catalyst crossJoin form on the fixture batch and assert
    bit-identical knn_sq_rerank output vs the kernel path."""
    from toy_vector_db_spark.operators import similarity

    base, qs = _splits(spark, embeddings)
    base = base.select("vec_id", "embedding")
    kernel = similarity.knn_sq_rerank(base, qs, 10).collect()
    monkeypatch.setattr(knn, "QUERY_BATCH_MAX", 1)
    knn._QUERY_COUNT_CACHE.clear()
    fallback = similarity.knn_sq_rerank(base, qs, 10).collect()
    assert sorted(map(tuple, kernel)) == sorted(map(tuple, fallback))
    knn._QUERY_COUNT_CACHE.clear()


def test_fallback_values_match_kernel_pq_adc(spark, embeddings, monkeypatch):
    """Round 10 (verdict r9 item 6): knn_pq_adc's bounded-batch path is
    the base-side _pq_pair_adc kernel (queries + LUTs in the closure);
    the oversized fallback is the broadcast-LUT crossJoin plan. Force
    the fallback on the fixture batch and assert bit-identical output —
    the driver-hash invariance argument."""
    from toy_vector_db_spark.operators import similarity

    base, qs = _splits(spark, embeddings)
    base = base.select("vec_id", "embedding")
    kernel = similarity.knn_pq_adc(base, qs, 10).collect()
    monkeypatch.setattr(knn, "QUERY_BATCH_MAX", 1)
    knn._QUERY_COUNT_CACHE.clear()
    fallback = similarity.knn_pq_adc(base, qs, 10).collect()
    assert sorted(map(tuple, kernel)) == sorted(map(tuple, fallback))
    knn._QUERY_COUNT_CACHE.clear()


def test_fallback_values_match_kernel_ivfpq(spark, embeddings, monkeypatch):
    """knn_ivfpq's bounded-batch path (kernel ADC with driver-collected
    probe routing) vs its oversized broadcast-LUT plan: bit-identical,
    including the filtered variant's label predicate applied on the
    kernel's pair output."""
    from toy_vector_db_spark.operators import similarity

    base, qs = _splits(spark, embeddings)
    base = base.select("vec_id", "embedding")
    kernel = similarity.knn_ivfpq(base, qs, 10).collect()
    monkeypatch.setattr(knn, "QUERY_BATCH_MAX", 1)
    knn._QUERY_COUNT_CACHE.clear()
    fallback = similarity.knn_ivfpq(base, qs, 10).collect()
    assert sorted(map(tuple, kernel)) == sorted(map(tuple, fallback))
    knn._QUERY_COUNT_CACHE.clear()


def test_fallback_values_match_kernel_ivfsq(spark, embeddings, monkeypatch):
    """knn_ivfsq's oversized-batch fallback (probe-join + inline ADC,
    round 8): force it on the fixture batch and assert bit-identical
    output vs the kernel-routed path — completing the per-family
    fallback parity convention."""
    from toy_vector_db_spark.operators import similarity

    base, qs = _splits(spark, embeddings)
    base = base.select("vec_id", "embedding")
    kernel = similarity.knn_ivfsq(base, qs, 10).collect()
    monkeypatch.setattr(knn, "QUERY_BATCH_MAX", 1)
    knn._QUERY_COUNT_CACHE.clear()
    fallback = similarity.knn_ivfsq(base, qs, 10).collect()
    assert sorted(map(tuple, kernel)) == sorted(map(tuple, fallback))
    knn._QUERY_COUNT_CACHE.clear()


def test_count_guard_recounts_on_in_place_rewrite(spark, tmp_path):
    """Round 11 (advice r10): the residual staleness hazard after the
    growing-dir fix — an in-place rewrite that PRESERVES filenames
    (compaction, an overwrite that reuses part-file names). Paths alone
    can't distinguish the two states; the fingerprint now includes each
    file's size and mtime, so the guard and the collected-batch cache
    must both refresh."""
    import os
    import shutil

    staging = str(tmp_path / "staging_rw")
    spark.range(10).select(
        F.col("id").alias("query_id"),
        F.array(F.lit(1.0), F.lit(2.0)).alias("query_vec"),
    ).coalesce(1).write.parquet(staging)
    first = spark.read.parquet(staging)
    assert knn.query_batch_count(first) == 10
    assert len(knn._collected_queries(first, "query_id", "query_vec")) == 10

    # rewrite IN PLACE with the same filenames: build the replacement
    # elsewhere, then copy the new bytes over the old part files
    alt = str(tmp_path / "staging_rw_alt")
    spark.range(100, 125).select(
        F.col("id").alias("query_id"),
        F.array(F.lit(3.0), F.lit(4.0)).alias("query_vec"),
    ).coalesce(1).write.parquet(alt)
    old_parts = sorted(
        f for f in os.listdir(staging) if f.endswith(".parquet")
    )
    new_parts = sorted(f for f in os.listdir(alt) if f.endswith(".parquet"))
    assert len(old_parts) == len(new_parts) == 1
    shutil.copyfile(
        os.path.join(alt, new_parts[0]), os.path.join(staging, old_parts[0])
    )
    # drop the local-FS checksum sidecars: a real compaction job writes
    # fresh .crc files; stale ones would fail the read before the cache
    # is even consulted
    for f in os.listdir(staging):
        if f.endswith(".crc"):
            os.remove(os.path.join(staging, f))

    second = spark.read.parquet(staging)
    # NOTE the snapshot is computed at GUARD time, so both frames now
    # stat the same post-rewrite bytes — what distinguishes the states
    # is the key STORED at the pre-rewrite count vs the key computed
    # here; the behavioral asserts below are the actual contract
    assert knn.query_batch_count(second) == 25, (
        "guard served the stale pre-rewrite count"
    )
    got = knn._collected_queries(second, "query_id", "query_vec")
    assert len(got) == 25 and got[0][1] == [3.0, 4.0], (
        "cache served the stale pre-rewrite batch"
    )
