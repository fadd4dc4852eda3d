"""Benchmark decontamination + intra-document repetition filters.

Two training-corpus hygiene operators every LLM data pipeline runs before
training (no reference counterpart — SURVEY §2.7 extension surface, same
family as dedup/curation):

  decontaminate_ngram   flag training documents that share any word
                        n-gram with a held-out evaluation set — the
                        standard "benchmark contamination" check run
                        before training on web-scale corpora.
  doc_repetition_stats  per-document repetition features (duplicate
                        token / duplicate n-gram / most-common-token
                        fractions) — the Gopher-style repetition filters
                        used to drop degenerate boilerplate docs.

Scale design: the eval set is small BY NATURE (benchmarks are thousands
of rows, the corpus is billions), so its distinct n-grams broadcast as a
hash relation and the corpus side is explode → broadcast-hash-join probe
→ map-side-combined count: the eval hash is built once per task and the
probe is codegen. (The zero-shuffle alternative — eval grams as one
array row, per-row array_intersect — rebuilds the eval hash per corpus
row inside an interpreted expression; measured 10× slower.) Repetition
stats are pure per-row Catalyst expressions: zero shuffle, scan-bound.
For an eval set too big to broadcast, the same plan degrades gracefully:
the broadcast join becomes a shuffle hash join on the gram key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from toy_vector_db_spark.functions.rounding import rnd
from toy_vector_db_spark.operators.dedup import word_shingles

ROUND = 6

# eval set = the deterministic doc_id prefix (a stand-in for a benchmark
# table; the operator takes any eval DataFrame)
EVAL_MAX_ID = 50
NGRAM_K = 3

# eval_fixture parameters: every (mod,residue)-th doc, id shifted OUT of
# the corpus id space, text truncated to its first tokens (benchmark
# prompts are short) — a held-out frame that is NOT a doc_id subset of
# the corpus, so the broadcast-hash probe is proven against foreign data
EVAL_FIXTURE_MOD = 7
EVAL_FIXTURE_RESIDUE = 3
EVAL_FIXTURE_ID_SHIFT = 10_000_000  # >> any fixture corpus (sibling idiom: dedup.DUP_OFFSET)
EVAL_FIXTURE_TOKENS = 12


def decontaminate_ngram(
    docs: DataFrame,
    eval_docs: DataFrame | None = None,
    eval_max_id: int = EVAL_MAX_ID,
    k: int = NGRAM_K,
) -> DataFrame:
    """Per training doc: how many distinct word k-grams it shares with the
    eval set, and the contamination flag (≥ 1 shared n-gram). Training
    docs = everything not in the eval set.

    Corpus side: explode distinct doc shingles → probe the broadcast
    eval-gram hash → count per doc (map-side combined). Plan pinned in
    tests/test_plans.py."""
    if eval_docs is None:
        eval_docs = docs.where(F.col("doc_id") < eval_max_id)
        train = docs.where(F.col("doc_id") >= eval_max_id)
    else:
        train = docs.join(
            eval_docs.select("doc_id"), "doc_id", "left_anti"
        )
    # eval grams as a TABLE probed through a broadcast hash join: the
    # hash relation is built once per task and the probe is codegen. The
    # tempting zero-shuffle alternative — collapse eval grams into one
    # array row and array_intersect per corpus row — rebuilds a hash of
    # the whole eval set PER ROW inside an interpreted expression;
    # measured 10× slower at sf0.1 and worse at scale. Doc shingles are
    # already distinct, so the post-join count is the distinct-shared
    # count; the count aggregate combines map-side, so the only exchange
    # carries one row per (doc, partial count).
    eval_grams = (
        eval_docs.select(
            F.explode(word_shingles("text", k)).alias("g")
        )
        .distinct()
    )
    hits = (
        train.select(
            "doc_id", F.explode(word_shingles("text", k)).alias("g")
        )
        .join(F.broadcast(eval_grams), "g")
        .groupBy("doc_id")
        .agg(F.count("*").alias("shared_ngrams"))
    )
    return (
        train.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("shared_ngrams"), F.lit(0))
            .cast("int")
            .alias("shared_ngrams"),
            (F.coalesce(F.col("shared_ngrams"), F.lit(0)) >= 1).alias(
                "contaminated"
            ),
        )
    )


def eval_fixture(docs: DataFrame) -> DataFrame:
    """Deterministic held-out evaluation frame derived from (but disjoint
    in id space with) the corpus: every EVAL_FIXTURE_MOD-th doc, doc_id
    shifted by EVAL_FIXTURE_ID_SHIFT, text cut to its first
    EVAL_FIXTURE_TOKENS tokens. Because no eval doc_id exists in the
    corpus, the anti-join keeps ALL corpus docs as training docs and the
    contamination counts come purely from the gram probe — the shape of a
    real benchmark table (foreign ids, short prompts, genuine n-gram
    overlap with the training text)."""
    return docs.where(
        F.col("doc_id") % EVAL_FIXTURE_MOD == EVAL_FIXTURE_RESIDUE
    ).select(
        (F.col("doc_id") + EVAL_FIXTURE_ID_SHIFT).alias("doc_id"),
        F.array_join(
            F.slice(F.split(F.col("text"), " "), 1, EVAL_FIXTURE_TOKENS), " "
        ).alias("text"),
    )


def contamination_report(
    docs: DataFrame,
    eval_docs: DataFrame | None = None,
    k: int = NGRAM_K,
) -> DataFrame:
    """The REVERSE view of decontaminate_ngram — per EVAL item instead of
    per training doc: how many distinct training docs share at least one
    word k-gram with it, how many distinct grams leaked, and the
    compromised flag. This is the report a decontamination run actually
    acts on (drop or re-split the compromised benchmark items); the
    per-corpus-doc view feeds the corpus filter instead.

    Same size asymmetry, same plan shape: the benchmark-sized
    (eval_id, gram) pairs broadcast, the corpus side explodes its
    already-distinct shingles once through the codegen hash probe, and
    the per-eval distinct counts aggregate with map-side partials. The
    only exchange carries one row per (eval_id, partial) — never the
    corpus."""
    if eval_docs is None:
        eval_docs = eval_fixture(docs)
    train = docs.join(eval_docs.select("doc_id"), "doc_id", "left_anti")
    ev_grams = eval_docs.select(
        F.col("doc_id").alias("eval_id"),
        F.explode(word_shingles("text", k)).alias("g"),
    )
    hits = (
        train.select(
            "doc_id", F.explode(word_shingles("text", k)).alias("g")
        )
        .join(F.broadcast(ev_grams), "g")
        .groupBy("eval_id")
        .agg(
            F.countDistinct("doc_id").alias("n_hit_docs"),
            F.countDistinct("g").alias("n_shared_grams"),
        )
    )
    return (
        eval_docs.select(F.col("doc_id").alias("eval_id"))
        .join(hits, "eval_id", "left")
        .select(
            "eval_id",
            F.coalesce("n_hit_docs", F.lit(0)).alias("n_hit_docs"),
            F.coalesce("n_shared_grams", F.lit(0)).alias("n_shared_grams"),
            (F.coalesce("n_hit_docs", F.lit(0)) >= 1).alias("compromised"),
        )
    )


def _grams_sql(k: int, distinct: bool = True) -> str:
    """The DuckDB word-k-gram list over a ``toks`` column — the single
    source of the shingle construction every oracle in this module uses
    (distinct=True mirrors word_shingles; repetition stats keep
    multiplicity). A divergent copy here would silently split the
    Spark/oracle parity this module exists to keep."""
    body = (
        f"list_transform(range(1, len(toks) - {k - 2}), i -> "
        + " || ' ' || ".join(f"toks[i+{j}]" for j in range(k))
        + ")"
    )
    return f"list_distinct({body})" if distinct else body


def contamination_report_sql(k: int = NGRAM_K) -> str:
    """Oracle for contamination_report(docs) (eval = the held-out
    fixture): per eval item, the distinct corpus docs and distinct grams
    it leaks into, via explicit per-pair list_intersect."""
    grams = _grams_sql(k)
    return f"""
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS toks
                 FROM documents),
    sh AS (SELECT doc_id,
                  CASE WHEN len(toks) >= {k} THEN {grams}
                       ELSE [] END AS shingles
           FROM tok),
    evtok AS (SELECT doc_id + {EVAL_FIXTURE_ID_SHIFT} AS eval_id,
                     toks[1:{EVAL_FIXTURE_TOKENS}] AS toks
              FROM tok
              WHERE doc_id % {EVAL_FIXTURE_MOD} = {EVAL_FIXTURE_RESIDUE}),
    evsh AS (SELECT eval_id,
                    CASE WHEN len(toks) >= {k} THEN {grams}
                         ELSE [] END AS shingles
             FROM evtok),
    pairs AS (
      SELECT e.eval_id,
             list_intersect(s.shingles, e.shingles) AS shared
      FROM evsh e, sh s)
    SELECT eval_id,
           CAST(sum(CASE WHEN len(shared) > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_hit_docs,
           CAST(coalesce(len(list_distinct(flatten(list(shared)))), 0)
             AS BIGINT) AS n_shared_grams,
           sum(CASE WHEN len(shared) > 0 THEN 1 ELSE 0 END) >= 1
             AS compromised
    FROM pairs GROUP BY eval_id
    """


def doc_repetition_stats(docs: DataFrame, k: int = 2) -> DataFrame:
    """Gopher-style per-doc repetition features over the raw whitespace
    split of ``text`` (F.split(text, ' ') — NOT textstats._toks, which
    lowercases first; the oracle uses the same un-lowered split, advice
    r4):

      dup_token_frac   (n_tokens − n_distinct_tokens) / n_tokens
      dup_ngram_frac   same over word k-grams (k=2), counted WITH
                       multiplicity — boilerplate loops repeat n-grams
      top_token_frac   occurrences of the most frequent token / n_tokens

    All pure per-row Catalyst (split / transform / array_distinct /
    fold): zero shuffle, scan-bound, oracle-matched expression for
    expression in DuckDB list functions.

    The token and k-gram arrays are materialized as ALIASED projections
    before the stats reference them: inlined, every reference would copy
    the interpreted transform subtree (the gram array alone is referenced
    four times → 4× the build cost per row, measured). k-grams index with
    element_at (O(1) per element) rather than per-position slice+concat_ws."""
    staged = docs.select(
        "doc_id", F.split(F.col("text"), " ").alias("_toks")
    )
    tk = F.col("_toks")
    nt = F.size(tk)
    idx = F.sequence(F.lit(1), nt - (k - 1))
    gram_expr = F.when(
        nt >= k,
        F.transform(
            idx,
            lambda i: F.concat_ws(
                " ", F.array(*[F.element_at(tk, i + j) for j in range(k)])
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    staged = staged.select("doc_id", "_toks", gram_expr.alias("_grams"))
    toks = F.col("_toks")
    n = F.size(toks)
    grams = F.col("_grams")
    ng = F.size(grams)
    # most-frequent-token count via a single fold over the SORTED tokens
    # tracking (prev, current run, best run) — O(n log n) per row. The
    # direct form (per distinct token, count matches in the full list) is
    # O(distinct·n) interpreted comparisons per row — measured ~10× slower
    # at sf0.1's ~300-token docs. Same integer, same oracle.
    run = F.aggregate(
        F.array_sort(toks),
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1)
            .otherwise(F.lit(1))
            .alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
    )
    top_cnt = run["best"]
    return staged.select(
        "doc_id",
        n.alias("n_tokens"),
        rnd((n - F.size(F.array_distinct(toks))) / n, ROUND).alias(
            "dup_token_frac"
        ),
        rnd(
            F.when(ng > 0, (ng - F.size(F.array_distinct(grams))) / ng)
            .otherwise(F.lit(0.0)),
            ROUND,
        ).alias("dup_ngram_frac"),
        rnd(top_cnt / n, ROUND).alias("top_token_frac"),
    )


# -- DuckDB oracle SQL (same expressions over the same tokenization) --------

def decontaminate_sql(
    eval_max_id: int = EVAL_MAX_ID, k: int = NGRAM_K
) -> str:
    grams = _grams_sql(k)
    return f"""
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS toks
                 FROM documents),
    sh AS (SELECT doc_id,
                  CASE WHEN len(toks) >= {k} THEN {grams}
                       ELSE [] END AS shingles
           FROM tok),
    ev AS (SELECT coalesce(list_distinct(flatten(list(shingles))),
                           []::VARCHAR[]) AS g
           FROM sh WHERE doc_id < {eval_max_id})
    SELECT s.doc_id,
           coalesce(len(list_intersect(s.shingles, ev.g)), 0) AS shared_ngrams,
           coalesce(len(list_intersect(s.shingles, ev.g)), 0) >= 1 AS contaminated
    FROM sh s, ev WHERE s.doc_id >= {eval_max_id}
    """
    # ^ the ev coalesce guards the empty-eval-partition edge: without it a
    # NULL gram list would make shared_ngrams NULL while the Spark side
    # returns 0/false (latent oracle divergence, advice r4)


def decontaminate_fixture_sql(k: int = NGRAM_K) -> str:
    """Oracle for decontaminate_ngram(docs, eval_docs=eval_fixture(docs)):
    the eval grams come from the truncated, id-shifted fixture frame, and
    — because the shifted ids never collide with corpus ids — every corpus
    doc is a training doc."""
    grams = _grams_sql(k)
    return f"""
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS toks
                 FROM documents),
    sh AS (SELECT doc_id,
                  CASE WHEN len(toks) >= {k} THEN {grams}
                       ELSE [] END AS shingles
           FROM tok),
    evtok AS (SELECT toks[1:{EVAL_FIXTURE_TOKENS}] AS toks
              FROM tok WHERE doc_id % {EVAL_FIXTURE_MOD} = {EVAL_FIXTURE_RESIDUE}),
    evsh AS (SELECT CASE WHEN len(toks) >= {k} THEN {grams}
                         ELSE [] END AS shingles
             FROM evtok),
    ev AS (SELECT coalesce(list_distinct(flatten(list(shingles))),
                           []::VARCHAR[]) AS g
           FROM evsh)
    SELECT s.doc_id,
           coalesce(len(list_intersect(s.shingles, ev.g)), 0) AS shared_ngrams,
           coalesce(len(list_intersect(s.shingles, ev.g)), 0) >= 1 AS contaminated
    FROM sh s, ev
    """


def repetition_sql(k: int = 2) -> str:
    grams = _grams_sql(k, distinct=False)
    return f"""
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS toks
                 FROM documents),
    g AS (SELECT doc_id, toks,
                 CASE WHEN len(toks) >= {k} THEN {grams}
                      ELSE [] END AS grams
          FROM tok)
    SELECT doc_id,
           len(toks) AS n_tokens,
           round((len(toks) - len(list_distinct(toks))) * 1.0 / len(toks),
                 {ROUND}) AS dup_token_frac,
           round(CASE WHEN len(grams) > 0
                      THEN (len(grams) - len(list_distinct(grams))) * 1.0
                           / len(grams)
                      ELSE 0.0 END, {ROUND}) AS dup_ngram_frac,
           round(list_max(list_transform(list_distinct(toks),
                     t -> len(list_filter(toks, x -> x = t)))) * 1.0
                 / len(toks), {ROUND}) AS top_token_frac
    FROM g
    """


# -- embedding-space decontamination -----------------------------------------

# eval-embedding stand-in: copies of the first EVAL_EMB_SLICE base vectors
# with ids shifted out of the corpus id space — the injected-twin idiom the
# dedup family uses, so the query doubles as its own ground truth (those
# rows MUST flag at sim 1.0; the synthetic clusters top out near 0.48
# against everything else, measured at sf0.001).
EVAL_EMB_SLICE = 25
EVAL_EMB_ID_SHIFT = 1_000_000
EMB_TAU = 0.9


def decontaminate_embedding(
    base: DataFrame,
    eval_emb: DataFrame | None = None,
    tau: float = EMB_TAU,
) -> DataFrame:
    """Embedding-space decontamination — the second standard benchmark-
    contamination check (n-gram overlap catches verbatim leakage; nearest-
    eval-embedding similarity catches paraphrased leakage): for every
    training vector, the maximum clamped-cosine similarity to ANY eval
    embedding, the closest eval id, and the contamination flag
    (max_sim ≥ tau on the UNROUNDED value, both engines).

    Scale shape (the decontaminate_ngram asymmetry, embedding-space):
    the eval set is benchmark-sized, so it BROADCASTS; the corpus side is
    a broadcast nested-loop scan with per-side hoisted magnitudes (the
    ivf_assign idiom — the corpus magnitude folds once per row, not once
    per eval pair) feeding a max-of-struct aggregate that combines
    MAP-SIDE: the exchange carries one row per corpus vector, never the
    |corpus|×|eval| product. Zero shuffle beyond that single combinable
    aggregate."""
    from toy_vector_db_spark.functions import vector as V

    if eval_emb is None:
        eval_emb = base.where(F.col("vec_id") < EVAL_EMB_SLICE).select(
            (F.col("vec_id") + EVAL_EMB_ID_SHIFT).alias("eval_id"),
            F.col("embedding").alias("ev_emb"),
        )
    b = base.withColumn("_b_mag", V.magnitude("embedding"))
    e = eval_emb.withColumn("_e_mag", V.magnitude("ev_emb"))
    sim = F.greatest(
        F.lit(0.0),
        V.dot("embedding", "ev_emb")
        / (F.col("_b_mag") * F.col("_e_mag")),
    )
    scored = b.crossJoin(F.broadcast(e)).select(
        "vec_id", sim.alias("s"), "eval_id"
    )
    agg = scored.groupBy("vec_id").agg(
        F.max(F.struct(F.col("s"), F.col("eval_id"))).alias("m")
    )
    return agg.select(
        "vec_id",
        F.col("m.eval_id").alias("closest_eval_id"),
        rnd(F.col("m.s"), ROUND).alias("max_sim"),
        (F.col("m.s") >= F.lit(tau)).alias("contaminated"),
    )


def decontaminate_embedding_sql(
    base_cte: str = "base", tau: float = EMB_TAU
) -> str:
    """DuckDB oracle twin: same broadcast-shaped cross product, same
    max-of-(sim, eval_id) struct order (lexicographic in both engines;
    sims are bit-identical by the V1-V5 fold parity, so the argmax id
    can never diverge)."""
    from toy_vector_db_spark.functions import vector as V

    sim = (
        f"greatest(0.0, {V.sql_dot('b.embedding', 'e.ev_emb')}"
        f" / ({V.sql_magnitude('b.embedding')}"
        f" * {V.sql_magnitude('e.ev_emb')}))"
    )
    return f"""
    ev AS (SELECT vec_id + {EVAL_EMB_ID_SHIFT} AS eval_id,
                  embedding AS ev_emb
           FROM {base_cte} WHERE vec_id < {EVAL_EMB_SLICE}),
    scored AS (
      SELECT b.vec_id, {sim} AS s, e.eval_id
      FROM {base_cte} b, ev e),
    agg AS (
      SELECT vec_id, max(struct_pack(s := s, e := eval_id)) AS m
      FROM scored GROUP BY vec_id)
    SELECT vec_id, (m).e AS closest_eval_id,
           round((m).s, {ROUND}) AS max_sim,
           (m).s >= {tau} AS contaminated
    FROM agg
    """
