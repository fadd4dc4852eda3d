"""Semantic properties of the decontamination + repetition operators
(oracle hash parity is covered by tests/test_registry_oracles.py)."""

from pyspark.sql import functions as F

from toy_vector_db_spark.operators import decontam


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_decontaminate_flags_planted_copy(spark):
    eval_text = "alpha beta gamma delta epsilon zeta"
    rows = [
        (0, eval_text),                      # eval set (doc_id < 2)
        (1, "one two three four five six"),
        (2, eval_text),                      # exact copy → contaminated
        (3, "seven eight nine ten eleven"),  # disjoint → clean
        (4, "x y alpha beta gamma z"),       # one shared 3-gram
    ]
    out = {
        r["doc_id"]: r
        for r in decontam.decontaminate_ngram(
            _docs(spark, rows), eval_max_id=2
        ).collect()
    }
    assert set(out) == {2, 3, 4}  # eval docs excluded from the output
    assert out[2]["contaminated"] and out[2]["shared_ngrams"] == 4  # 6 toks → 4 3-grams
    assert not out[3]["contaminated"] and out[3]["shared_ngrams"] == 0
    assert out[4]["contaminated"] and out[4]["shared_ngrams"] == 1


def test_decontaminate_explicit_eval_frame(spark):
    """Passing an explicit eval DataFrame must agree with the id-prefix
    default (same docs), and exclude exactly the eval ids via anti-join."""
    rows = [
        (0, "alpha beta gamma delta"),
        (1, "one two three four"),
        (2, "alpha beta gamma five"),
        (3, "six seven eight nine"),
    ]
    docs = _docs(spark, rows)
    by_prefix = decontam.decontaminate_ngram(docs, eval_max_id=2)
    explicit = decontam.decontaminate_ngram(
        docs, eval_docs=docs.where(F.col("doc_id") < 2)
    )
    a = sorted(map(tuple, by_prefix.collect()))
    b = sorted(map(tuple, explicit.collect()))
    assert a == b


def test_repetition_stats_extremes(spark):
    rows = [
        (0, "spam spam spam spam"),          # fully degenerate
        (1, "a b c d"),                      # fully distinct
    ]
    out = {
        r["doc_id"]: r
        for r in decontam.doc_repetition_stats(_docs(spark, rows)).collect()
    }
    assert out[0]["n_tokens"] == 4
    assert out[0]["dup_token_frac"] == 0.75   # 4 toks, 1 distinct
    assert abs(out[0]["dup_ngram_frac"] - 2 / 3) < 1e-6  # 3 bigrams, 1 distinct
    assert out[0]["top_token_frac"] == 1.0
    assert out[1]["dup_token_frac"] == 0.0
    assert out[1]["dup_ngram_frac"] == 0.0
    assert out[1]["top_token_frac"] == 0.25


def test_embedding_decontamination_ground_truth(spark, embeddings):
    """The injected eval copies are the ground truth: exactly the
    EVAL_EMB_SLICE source rows flag as contaminated (sim 1.0 to their
    own copy), everything else stays below tau on these clusters."""
    from pyspark.sql import functions as F

    from toy_vector_db_spark.operators import decontam

    out = decontam.decontaminate_embedding(embeddings)
    flagged = {
        r["vec_id"]: r for r in out.where("contaminated").collect()
    }
    assert set(flagged) == set(range(decontam.EVAL_EMB_SLICE))
    for vid, r in flagged.items():
        assert r["closest_eval_id"] == vid + decontam.EVAL_EMB_ID_SHIFT
        assert abs(r["max_sim"] - 1.0) < 1e-9
    # an explicit eval frame works too (foreign vectors: shifted copies
    # of OTHER rows flag those rows instead)
    ev = embeddings.where(F.col("vec_id").between(30, 34)).select(
        (F.col("vec_id") + 500_000).alias("eval_id"),
        F.col("embedding").alias("ev_emb"),
    )
    out2 = decontam.decontaminate_embedding(embeddings, eval_emb=ev)
    flagged2 = {r["vec_id"] for r in out2.where("contaminated").collect()}
    assert flagged2 == set(range(30, 35))


def test_contamination_report_directionality(spark):
    """Per-eval accounting on a hand-built corpus: an eval item that
    leaks into two docs reports n_hit_docs=2; one sharing nothing
    reports zeros; distinct gram counting collapses repeats."""
    from pyspark.sql import functions as F

    from toy_vector_db_spark.operators import decontam

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta"),
            (2, "zeta alpha beta gamma"),
            (3, "completely different words here"),
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [
            (100, "alpha beta gamma"),           # in docs 1 and 2
            (200, "nothing shared anywhere at"), # clean
        ],
        "doc_id long, text string",
    )
    out = {
        r["eval_id"]: r
        for r in decontam.contamination_report(docs, eval_docs=ev).collect()
    }
    assert out[100]["n_hit_docs"] == 2
    assert out[100]["n_shared_grams"] == 1  # the single 3-gram
    assert out[100]["compromised"]
    assert out[200]["n_hit_docs"] == 0
    assert out[200]["n_shared_grams"] == 0
    assert not out[200]["compromised"]
