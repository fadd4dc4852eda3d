"""Hypothesis property tests for the round-5 pipeline operators: each
operator is checked against an independent pure-Python reference
implementation over randomly generated corpora — an oracle the DuckDB SQL
twins can't provide (they share the operator's algebra; these don't)."""

import hashlib
from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

from toy_vector_db_spark.operators import curation, dedup, textstats

# small alphabet → guaranteed span/token collisions across docs
_WORD = st.sampled_from(["a", "b", "c", "dd", "ee"])
_DOC = st.lists(_WORD, min_size=1, max_size=12).map(" ".join)
_CORPUS = st.lists(_DOC, min_size=1, max_size=8)


def _ref_span_dedup(texts, w):
    spans = []  # (doc_id, pos, span) in global first-occurrence order
    for doc_id, text in enumerate(texts):
        toks = text.split(" ")
        n_spans = -(-len(toks) // w)
        for pos in range(n_spans):
            spans.append((doc_id, pos, " ".join(toks[pos * w:(pos + 1) * w])))
    seen = set()
    kept = {}
    for doc_id, pos, span in spans:  # doc_id-then-pos order == first wins
        if span not in seen:
            seen.add(span)
            kept.setdefault(doc_id, []).append((pos, span))
    out = {}
    for doc_id, text in enumerate(texts):
        toks = text.split(" ")
        n_spans = -(-len(toks) // w)
        k = kept.get(doc_id, [])
        out[doc_id] = (
            " ".join(s for _, s in sorted(k)),
            n_spans,
            n_spans - len(k),
        )
    return out


@settings(max_examples=10, deadline=None)
@given(_CORPUS)
def test_span_dedup_matches_reference(spark, texts):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_spans"], r["n_dropped"])
        for r in dedup.span_dedup_scrub(docs).collect()
    }
    assert got == _ref_span_dedup(texts, dedup.SPAN_W)


@settings(max_examples=10, deadline=None)
@given(_CORPUS)
def test_vocab_topk_matches_reference(spark, texts):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["token"]: (r["tf"], r["df"])
        for r in textstats.vocab_topk(docs).collect()
    }
    tf = Counter()
    df = Counter()
    for t in texts:
        toks = t.lower().split(" ")
        tf.update(toks)
        df.update(set(toks))
    want = {tok: (tf[tok], df[tok]) for tok in tf}
    # the tiny alphabet keeps the whole vocab under VOCAB_TOP_V
    assert len(want) <= textstats.VOCAB_TOP_V
    assert got == want


def _ref_md5_int(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:12], 16)


@settings(max_examples=10, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=10**9),
                min_size=1, max_size=30, unique=True))
def test_training_shard_matches_reference(spark, ids):
    docs = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {
        r["doc_id"]: (r["shard"], r["pos"])
        for r in curation.training_shard_assign(docs).collect()
    }
    keyed = sorted(
        (( _ref_md5_int(str(i)) % curation.N_TRAIN_SHARDS,
           _ref_md5_int(str(i)), i) for i in ids)
    )
    want = {}
    counts = Counter()
    for shard, _key, i in keyed:  # sorted by (shard, key, id)
        want[i] = (shard, counts[shard])
        counts[shard] += 1
    assert got == want
