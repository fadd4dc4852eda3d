"""Batched model-inference plumbing: a model-scored quality filter.

The production LLM-data stage this models: a trained quality classifier
(fastText / logistic / small transformer) scores every document and the
pipeline keeps the high scorers. The Spark-native shape is the point:

  features  pure Catalyst expressions over the scan (JVM, codegen,
            zero shuffle) — the same feature family textstats.quality
            exposes;
  inference an Arrow-batched ``mapInPandas`` kernel receiving ONLY the
            feature columns (the wide text never crosses the Python
            boundary). The kernel is the single swap point: replace the
            linear stub with `session.run(...)` / `model.predict(batch)`
            and nothing else changes — schema contract, batching,
            partitioning, downstream filter are identical.

The stub model is a LINEAR scorer with fixed literal weights, evaluated
left-to-right in float64 — deliberately transcendental-free so the
DuckDB oracle reproduces it bit-for-bit (exp/sigmoid would hit libm
implementation differences across engines; a monotone linear score
ranks and thresholds identically). At 100 TB this stage is scan-bound:
no shuffle, no driver involvement, model weights broadcast implicitly
in the closure.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from toy_vector_db_spark.functions.rounding import rnd
from toy_vector_db_spark.operators.textstats import STOPWORDS, _toks

ROUND = 6

# fixed "trained" weights of the stub quality model — literal constants
# shared verbatim with the SQL oracle
W_LEN = 0.9
W_UNIQ = 1.7
W_STOP = 2.3
W_DIGIT = -3.1
BIAS = -1.25
# ~median of the stub score on the fixture corpus → a meaningful
# keep/drop split (the real knob a production filter tunes on held-out
# labels)
KEEP_THRESHOLD = 0.7


def model_quality_inference(docs: DataFrame) -> DataFrame:
    """(doc_id, model_score, keep) for every document: linear quality
    model over four Catalyst-computed features, scored in an Arrow-batched
    mapInPandas kernel, thresholded for the keep/drop decision."""
    import pandas as pd

    text = F.col("text")
    toks = _toks(text)
    n_tok = F.size(toks)
    dtoks = F.size(F.array_distinct(toks))
    stop_ratio = (
        F.size(F.array_intersect(F.array_distinct(toks),
                                 F.array(*[F.lit(w) for w in STOPWORDS])))
        / dtoks
    )
    feats = docs.select(
        "doc_id",
        F.least(n_tok / F.lit(50.0), F.lit(1.0)).alias("len_norm"),
        (dtoks / n_tok).alias("uniq_ratio"),
        (F.length(F.regexp_replace(text, "[^0-9]", "")) / F.length(text))
        .alias("digit_ratio"),
        stop_ratio.alias("stop_ratio"),
    )

    def _infer(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            # THE MODEL SLOT — swap for fastText / ONNX / torch batch
            # inference here. Elementwise float64, explicit left-to-right
            # association so the SQL oracle's same-order arithmetic is
            # bit-identical.
            s = (
                (
                    (
                        W_LEN * pdf["len_norm"].to_numpy()
                        + W_UNIQ * pdf["uniq_ratio"].to_numpy()
                    )
                    + W_STOP * pdf["stop_ratio"].to_numpy()
                )
                + W_DIGIT * pdf["digit_ratio"].to_numpy()
            ) + BIAS
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "model_score": s,
                    "keep": s >= KEEP_THRESHOLD,
                }
            )

    scored = feats.mapInPandas(
        _infer, schema="doc_id long, model_score double, keep boolean"
    )
    return scored.select(
        "doc_id", rnd("model_score", ROUND).alias("model_score"), "keep"
    )


def model_quality_sql() -> str:
    """DuckDB twin: identical features, identical left-to-right linear
    arithmetic (no transcendentals → bit-equal across engines)."""
    toks = "string_split(lower(text), ' ')"
    dtoks = f"list_distinct({toks})"
    stop_list = "[" + ",".join(f"'{w}'" for w in STOPWORDS) + "]"
    return f"""
    WITH f AS (
      SELECT doc_id,
             least(len({toks}) / 50.0, 1.0) AS len_norm,
             len({dtoks}) * 1.0 / len({toks}) AS uniq_ratio,
             length(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0
               / length(text) AS digit_ratio,
             len(list_intersect({dtoks}, {stop_list})) * 1.0
               / len({dtoks}) AS stop_ratio
      FROM documents),
    s AS (
      SELECT doc_id,
             ((({W_LEN} * len_norm + {W_UNIQ} * uniq_ratio)
               + {W_STOP} * stop_ratio)
              + {W_DIGIT} * digit_ratio) + {BIAS} AS score
      FROM f)
    SELECT doc_id,
           round(score, {ROUND}) AS model_score,
           score >= {KEEP_THRESHOLD} AS keep
    FROM s
    """
