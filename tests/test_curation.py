"""Semantic properties of the curation / corpus-shaping operators —
invariants the value-hash oracles can't express directly."""

import math

from pyspark.sql import functions as F

from toy_vector_db_spark.operators import chunking, curation
from toy_vector_db_spark.registry import table


def test_chunks_cover_and_overlap(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    sample = docs.orderBy("doc_id").limit(5)
    chunks = {
        (r.doc_id, r.chunk_idx): r.chunk_text
        for r in chunking.chunk_documents(sample).collect()
    }
    for row in sample.collect():
        toks = row.text.split(" ")
        idxs = sorted(i for (d, i) in chunks if d == row.doc_id)
        assert idxs == list(range(len(idxs)))
        # chunk i starts at i*stride; consecutive chunks overlap by
        # chunk_tokens - stride tokens; union covers the doc
        covered = []
        for i in idxs:
            start = i * chunking.CHUNK_STRIDE
            want = toks[start:start + chunking.CHUNK_TOKENS]
            assert chunks[(row.doc_id, i)].split(" ") == want
            covered.extend(range(start, min(start + chunking.CHUNK_TOKENS,
                                            len(toks))))
        assert set(covered) == set(range(len(toks)))


def test_stratified_filter_quota(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    kept = curation.stratified_quality_filter(docs)
    per_src = {r.source: r.n for r in
               kept.groupBy("source").agg(F.count("*").alias("n")).collect()}
    totals = {r.source: r.n for r in
              docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert set(per_src) == set(totals)
    for s, n in totals.items():
        assert per_src[s] == math.ceil(0.25 * n), (s, per_src[s], n)


def test_mixture_sample_audit(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    audit = {r.source: r for r in
             curation.source_mixture_sample(docs).collect()}
    n_min = min(r.n_docs for r in audit.values())
    for s, r in audit.items():
        assert 0 <= r.n_sampled <= r.n_docs
        # the smallest source keeps everything (rate exactly 1.0)
        if r.n_docs == n_min:
            assert r.rate == 1.0 and r.n_sampled == r.n_docs
        # larger sources are downsampled in expectation; allow generous
        # binomial slack around rate*n
        exp = r.rate * r.n_docs
        assert abs(r.n_sampled - exp) <= max(6 * math.sqrt(exp), 6.0), (s, r)


def test_token_packing_batches_are_contiguous(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    out = chunking.token_batch_packing(docs).collect()
    # every batch within a source holds >= 1 doc and batch ids are dense
    by_src = {}
    for r in out:
        by_src.setdefault(r.source, []).append(r)
    for s, rows in by_src.items():
        ids = sorted(r.batch_id for r in rows)
        assert ids == list(range(len(ids))), s
        assert all(r.n_docs >= 1 for r in rows)


def test_pii_scrub_complete(spark, sf_dir):
    docs = table(spark, sf_dir, "documents")
    res = chunking.pii_scrub(docs).collect()
    assert all(r.n_remaining == 0 for r in res)
    injected = [r for r in res if r.doc_id < chunking.PII_SLICE]
    assert injected and all(r.n_redactions >= 1 for r in injected)


def test_training_shard_assign_properties(spark, documents):
    """Shards partition the corpus; positions are contiguous 0..n-1 per
    shard; the permutation is deterministic and uncorrelated with doc_id
    order (the md5 key, not the id, drives it)."""
    from toy_vector_db_spark.operators import curation

    out = curation.training_shard_assign(documents).collect()
    assert len(out) == documents.count()
    by_shard = {}
    for r in out:
        assert 0 <= r["shard"] < curation.N_TRAIN_SHARDS
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    for shard, poss in by_shard.items():
        assert sorted(poss) == list(range(len(poss))), shard
    # deterministic across invocations
    again = curation.training_shard_assign(documents).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    # not the identity order: within some shard, doc_ids at consecutive
    # positions are not monotonically increasing (md5 scrambles)
    first = [r["doc_id"] for r in sorted(out, key=lambda r: (r["shard"], r["pos"]))
             if r["shard"] == 0]
    assert first != sorted(first)


def test_vocab_topk_consistency(spark, documents):
    """tf >= df per token (a doc contributes at least one occurrence),
    ranks follow (tf desc, token asc), and tf totals match the corpus
    token count."""
    from pyspark.sql import functions as F

    from toy_vector_db_spark.operators import textstats

    rows = textstats.vocab_topk(documents).collect()
    assert all(r["tf"] >= r["df"] >= 1 for r in rows)
    ordered = sorted(rows, key=lambda r: (-r["tf"], r["token"]))
    assert [r["rank"] for r in ordered] == list(range(1, len(rows) + 1))
    if len(rows) < textstats.VOCAB_TOP_V:
        # whole vocabulary fits: tf must sum to the corpus token count
        total = documents.select(
            F.sum(F.size(F.split(F.lower("text"), " "))).alias("n")
        ).first()["n"]
        assert sum(r["tf"] for r in rows) == total


def test_hybrid_rrf_formula_and_order(spark, documents, embeddings):
    """Every fused score equals 1/(C+lex)+1/(C+sem) with absent ranks
    contributing 0, and the output is ordered by that score."""
    from pyspark.sql import functions as F

    from toy_vector_db_spark.operators import curation
    from toy_vector_db_spark.sources.ndjson import split_count

    n = embeddings.count()
    cut = split_count(n, 0.95)
    qid = cut + min(29, n - cut - 1)  # the registry's query-offset clamp
    qvec = embeddings.where(F.col("vec_id") == qid).first()["embedding"]
    base = embeddings.where(F.col("vec_id") < cut)
    rows = curation.hybrid_rrf_topk(documents, base, qvec).collect()
    assert 0 < len(rows) <= curation.HYBRID_K
    C = curation.RRF_C
    scores = []
    for r in rows:
        want = (1.0 / (C + r["lex_rank"]) if r["lex_rank"] else 0.0) + (
            1.0 / (C + r["sem_rank"]) if r["sem_rank"] else 0.0
        )
        assert abs(r["rrf"] - want) < 1e-6, r
        scores.append(want)
    assert scores == sorted(scores, reverse=True)
