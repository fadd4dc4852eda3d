"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All pure Catalyst column expressions over `documents` — per-row, zero
shuffle before the (optional) aggregation, fully DuckDB-oracle-able. At
100 TB these run inside whole-stage codegen over a column-pruned scan of
(doc_id, text).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from toy_vector_db_spark.functions.rounding import rnd

ROUND = 6
P31 = 2_147_483_647

# tiny per-language marker wordlists for the n-gram/stopword heuristic —
# deliberately small and inlined identically into the oracle SQL
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "value", "table", "row"],
    "fr": ["le", "la", "de", "et", "un", "une", "est", "les"],
    "es": ["el", "la", "de", "y", "un", "una", "es", "los"],
    "de": ["der", "die", "das", "und", "ein", "ist", "nicht", "mit"],
}

STOPWORDS = LANG_MARKERS["en"]


def _toks(text: Column) -> Column:
    return F.split(F.lower(text), " ")


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language marker-hit counts (array_intersect with distinct toks).
    Counting DISTINCT marker hits keeps the oracle expression identical."""
    toks = F.array_distinct(_toks(text))
    return {
        lang: F.size(
            F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))
        )
        for lang, words in LANG_MARKERS.items()
    }


def lang_id(docs: DataFrame) -> DataFrame:
    """Predicted language = argmax marker-hit count, 'und' (undetermined)
    when no list scores > 0; ties broken by language name order."""
    scores = lang_scores(F.col("text"))
    best_score = F.greatest(*scores.values())
    pred = F.lit("und")
    # iterate in reverse-sorted order so earlier names win ties
    for lang in sorted(scores, reverse=True):
        pred = F.when(
            (scores[lang] > 0) & (scores[lang] == best_score), F.lit(lang)
        ).otherwise(pred)
    return docs.select(
        "doc_id",
        pred.alias("pred_lang"),
        best_score.cast("int").alias("marker_hits"),
    )


def quality_score_col(text: Column) -> Column:
    """The UNROUNDED composite quality score as a column expression —
    exposed separately so rank/threshold operators can order by the raw
    value (cross-engine ordering must never use rounded values)."""
    toks = _toks(text)
    n_tok = F.size(toks)
    n_char = F.length(text)
    stop_ratio = (
        F.size(F.array_intersect(F.array_distinct(toks),
                                 F.array(*[F.lit(w) for w in STOPWORDS])))
        / F.size(F.array_distinct(toks))
    )
    digit_ratio = F.length(F.regexp_replace(text, "[^0-9]", "")) / n_char
    uniq_ratio = F.size(F.array_distinct(toks)) / n_tok
    return (
        F.lit(0.4) * F.least(n_tok / F.lit(50.0), F.lit(1.0))
        + F.lit(0.3) * uniq_ratio
        + F.lit(0.2) * (F.lit(1.0) - digit_ratio)
        + F.lit(0.1) * stop_ratio
    )


def quality_features(docs: DataFrame) -> DataFrame:
    """Per-doc quality features + composite score:
    length, token count, mean token length, stopword ratio, digit ratio,
    unique-token ratio."""
    text = F.col("text")
    toks = _toks(text)
    n_tok = F.size(toks)
    n_char = F.length(text)
    mean_tok_len = (n_char - (n_tok - 1)) / n_tok  # chars net of separators
    stop_ratio = (
        F.size(F.array_intersect(F.array_distinct(toks),
                                 F.array(*[F.lit(w) for w in STOPWORDS])))
        / F.size(F.array_distinct(toks))
    )
    digit_ratio = (
        F.length(F.regexp_replace(text, "[^0-9]", "")) / n_char
    )
    uniq_ratio = F.size(F.array_distinct(toks)) / n_tok
    score = quality_score_col(text)
    return docs.select(
        "doc_id",
        n_char.alias("n_chars"),
        n_tok.cast("int").alias("n_tokens"),
        rnd(mean_tok_len, ROUND).alias("mean_tok_len"),
        rnd(stop_ratio, ROUND).alias("stop_ratio"),
        rnd(uniq_ratio, ROUND).alias("uniq_ratio"),
        rnd(score, ROUND).alias("quality_score"),
    )


def token_stats(docs: DataFrame) -> DataFrame:
    """Token counting two ways: whitespace split vs alnum-run regex (the
    BPE-ish lower bound), plus distinct counts."""
    from toy_vector_db_spark.functions import text as TXT

    return docs.select(
        "doc_id",
        TXT.whitespace_token_count(F.col("text")).cast("int").alias("ws_tokens"),
        TXT.token_count(F.col("text")).cast("int").alias("re_tokens"),
        F.size(F.array_distinct(_toks(F.col("text")))).cast("int").alias("uniq_tokens"),
    )


N_HASH_BUCKETS = 8


def hash_features(docs: DataFrame) -> DataFrame:
    """Hashing-trick featurizer: token counts hashed into N buckets — the
    text→vector bridge (featurize, then feed the ANN operators). Per-row
    Catalyst expressions: one md5 per token, N filtered counts. Emitted as
    N scalar columns (cross-engine hash-stable)."""
    from toy_vector_db_spark.operators.dedup import md5_int

    toks = _toks(F.col("text"))
    # the bucket array is STAGED as an aliased projection: inlined, the
    # per-token md5 pass would be copied into each of the N filtered
    # counts (interpreted HOFs get no subexpression elimination) and run
    # N× per row — the shingle_hashes hoist, same reasoning
    staged = docs.select(
        "doc_id",
        F.transform(toks, lambda t: md5_int(t) % N_HASH_BUCKETS).alias(
            "_buckets"
        ),
    )
    cols = [
        F.size(F.filter(F.col("_buckets"), lambda b: b == F.lit(i))).alias(
            f"h{i}"
        )
        for i in range(N_HASH_BUCKETS)
    ]
    return staged.select("doc_id", *cols)


def fingerprint(docs: DataFrame) -> DataFrame:
    """Deterministic document fingerprint: polynomial rolling hash over the
    character stream, acc = (acc·31 + ascii(c)) mod 2³¹−1 — the classic
    Rabin–Karp shape, expressed as a higher-order fold (per-row, codegen)."""
    text = F.col("text")
    # split-to-chars is O(n) per row; the earlier substring(text, i, 1)
    # form was O(n²) — each substring seeks from the string start, which
    # dominated this operator's bench time at ~300-char docs. Same ascii
    # stream, same fold, same oracle hash (empty text: [""] → [0] → 0,
    # identical to the descending-sequence quirk of the old form).
    chars = F.transform(F.split(text, ""), lambda c: F.ascii(c))
    fp = F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 31 + x) % P31,
    )
    return docs.select("doc_id", fp.alias("fingerprint"))


VOCAB_TOP_V = 100


def vocab_topk(docs: DataFrame, v: int = VOCAB_TOP_V) -> DataFrame:
    """Corpus-level token vocabulary — the tokenizer-training precursor:
    total term frequency and document frequency per token, top ``v`` by
    frequency (token asc on ties), ranked. Tokens follow the corpus
    convention (_toks: lowercase, split on space).

    Scale shape: explode → groupBy(token, doc_id) — MAP-SIDE COMBINED, so
    a billion-occurrence stopword ships one row per (token, doc) per map
    partition — then groupBy(token) folds the per-doc rows into (tf, df)
    in a second combinable aggregate. The top-v is a TakeOrdered over the
    |vocab|-sized aggregate output, not a full sort. Two shuffles, both
    pre-combined; no window over the raw token stream."""
    per_doc = (
        docs.select(
            "doc_id", F.explode(_toks(F.col("text"))).alias("token")
        )
        .groupBy("token", "doc_id")
        .agg(F.count("*").alias("n"))
    )
    vocab = per_doc.groupBy("token").agg(
        F.sum("n").alias("tf"), F.count("*").alias("df")
    )
    return (
        vocab.orderBy(F.col("tf").desc(), F.col("token").asc())
        .limit(v)
        .select(
            "token", "tf", "df",
            F.row_number()
            .over(
                Window.orderBy(F.col("tf").desc(), F.col("token").asc())
            )
            .alias("rank"),
        )
    )


def vocab_topk_sql(v: int = VOCAB_TOP_V) -> str:
    """DuckDB oracle twin of vocab_topk."""
    return f"""
    WITH per_doc AS (
      SELECT token, doc_id, count(*) AS n
      FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS token
            FROM documents)
      GROUP BY token, doc_id),
    vocab AS (
      SELECT token, CAST(sum(n) AS BIGINT) AS tf,
             CAST(count(*) AS BIGINT) AS df
      FROM per_doc GROUP BY token)
    SELECT token, tf, df,
           CAST(row_number() OVER (ORDER BY tf DESC, token ASC) AS INT)
             AS rank
    FROM vocab
    ORDER BY tf DESC, token ASC
    LIMIT {v}
    """
