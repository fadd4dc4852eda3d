"""Corpus-shaping operators: chunking, PII redaction, token-budget packing.

The steps between a raw corpus and a training batch: split documents into
overlapping context-window chunks, scrub PII-shaped spans, and pack
documents into token-budgeted batches. All pure Catalyst plans:

  chunk_documents     per-row sequence + slice + posexplode — the only
                      row-count growth is the chunks themselves
  pii_scrub           regexp count + replace; the fixture corpus has no
                      natural PII, so (like the dedup twins) deterministic
                      synthetic emails are injected first and must be
                      fully scrubbed — the query doubles as its own check
  token_batch_packing window cumsum over a deterministic doc order;
                      batch id = floor(tokens-before / budget) — contiguous
                      packing where a document may straddle a boundary
                      (greedy no-split packing needs sequential state; at
                      scale this floor form is the shuffle-free choice and
                      the boundary difference is one doc per batch edge)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

CHUNK_TOKENS = 32
CHUNK_STRIDE = 24  # 8-token overlap
PII_SLICE = 50  # doc_id < 50 get an injected email
BATCH_BUDGET = 512  # tokens per training batch


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = CHUNK_TOKENS,
    stride: int = CHUNK_STRIDE,
) -> DataFrame:
    """Overlapping token-window chunks per document: starts at
    1, 1+stride, ... while ≤ n_tokens; each chunk is ``chunk_tokens`` long
    (shorter at the tail). Emits (doc_id, chunk_idx, n_chunk_tokens,
    chunk_text)."""
    toks = F.split(F.col("text"), " ")
    starts = F.sequence(F.lit(1), F.greatest(F.size(toks), F.lit(1)),
                        F.lit(stride))
    chunks = F.transform(
        starts, lambda s: F.concat_ws(" ", F.slice(toks, s, chunk_tokens))
    )
    exploded = docs.select(
        "doc_id", F.posexplode(chunks).alias("chunk_idx", "chunk_text")
    )
    return exploded.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.size(F.split(F.col("chunk_text"), " ")).cast("int")
        .alias("n_chunk_tokens"),
        "chunk_text",
    )


# scalar range() returns a LIST in DuckDB; parallel unnests zip in
# lock-step, which gives (chunk_idx, len, text) rows without a lateral
# (range-the-table-function rejects correlated arguments)
CHUNK_SQL = f"""
WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
c AS (SELECT doc_id, toks,
             range(0, (greatest(len(toks), 1) - 1) // {CHUNK_STRIDE} + 1)
               AS idxs
      FROM t),
l AS (SELECT doc_id, idxs,
             list_transform(idxs,
               i -> len(toks[1 + i * {CHUNK_STRIDE}:
                            least(i * {CHUNK_STRIDE} + {CHUNK_TOKENS},
                                  len(toks))])) AS lens,
             list_transform(idxs,
               i -> array_to_string(
                      toks[1 + i * {CHUNK_STRIDE}:
                           least(i * {CHUNK_STRIDE} + {CHUNK_TOKENS},
                                 len(toks))], ' ')) AS chunks
      FROM c)
SELECT doc_id,
       CAST(unnest(idxs) AS INT) AS chunk_idx,
       CAST(unnest(lens) AS INT) AS n_chunk_tokens,
       unnest(chunks) AS chunk_text
FROM l
"""


_EMAIL_RE = "[a-z0-9]+@[a-z]+\\.[a-z]+"


def pii_scrub(docs: DataFrame) -> DataFrame:
    """Inject a deterministic synthetic email into the first PII_SLICE docs
    (the fixture has no natural PII), then redact every email-shaped span.
    Output counts prove complete removal; at scale this is the same
    per-row regexp pass over any column set."""
    text = F.when(
        F.col("doc_id") < PII_SLICE,
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com now"),
        ),
    ).otherwise(F.col("text"))
    with_pii = docs.select("doc_id", text.alias("text"))
    # idx=0 → whole-match extraction (Spark defaults to capture group 1)
    n_found = F.size(F.regexp_extract_all("text", F.lit(_EMAIL_RE), 0))
    scrubbed = F.regexp_replace("text", _EMAIL_RE, "[REDACTED]")
    return with_pii.select(
        "doc_id",
        n_found.cast("int").alias("n_redactions"),
        F.length(scrubbed).alias("scrubbed_len"),
        F.size(F.regexp_extract_all(scrubbed, F.lit(_EMAIL_RE), 0))
        .cast("int").alias("n_remaining"),
    )


PII_SCRUB_SQL = f"""
WITH with_pii AS (
  SELECT doc_id,
         CASE WHEN doc_id < {PII_SLICE}
              THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                   || '@example.com now'
              ELSE text END AS text
  FROM documents)
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '{_EMAIL_RE}')) AS INT)
         AS n_redactions,
       length(regexp_replace(text, '{_EMAIL_RE}', '[REDACTED]', 'g'))
         AS scrubbed_len,
       CAST(len(regexp_extract_all(
              regexp_replace(text, '{_EMAIL_RE}', '[REDACTED]', 'g'),
              '{_EMAIL_RE}')) AS INT) AS n_remaining
FROM with_pii
"""


def token_batch_packing(
    docs: DataFrame, budget: int = BATCH_BUDGET
) -> DataFrame:
    """Pack documents into token-budgeted batches WITHIN each source, in
    deterministic doc_id order: batch id = floor(tokens-before / budget).
    The window partitions on the source key, so packing parallelizes per
    stratum (a single global ordered window would be a one-task sort at
    scale — per-group packing is how batch construction actually shards).
    Emits per-(source, batch) document and token counts."""
    n_tok = F.size(F.split(F.col("text"), " "))
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    sized = docs.select("doc_id", "source", n_tok.alias("n_tok"))
    batched = sized.withColumn(
        "batch_id",
        F.floor(
            F.coalesce(F.sum("n_tok").over(w), F.lit(0)) / budget
        ).cast("long"),
    )
    return (
        batched.groupBy("source", "batch_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("total_tokens"),
        )
    )


TOKEN_PACKING_SQL = f"""
WITH sized AS (
  SELECT doc_id, source, len(string_split(text, ' ')) AS n_tok
  FROM documents),
batched AS (
  SELECT doc_id, source, n_tok,
         CAST(floor(coalesce(sum(n_tok) OVER (PARTITION BY source
                             ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING), 0) / {BATCH_BUDGET})
              AS BIGINT) AS batch_id
  FROM sized)
SELECT source, batch_id, count(*) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS total_tokens
FROM batched GROUP BY source, batch_id
"""
