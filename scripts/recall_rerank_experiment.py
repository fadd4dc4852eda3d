#!/usr/bin/env python
"""Constant-cost rerank configuration study (round 7, verdict r6 item 3).

The shipped rerank budget R = max(RERANK_MULT*k, ceil(n/RERANK_DEN))
re-scores a constant FRACTION of the corpus per query — which holds
recall flat with scale but costs O(n) per query, a budget no 100 TB
deployment ships. The deployment configuration caps R at a constant and
leans on codebook resolution (PQ_K) instead. This script measures, at
sf0.1 (the largest fixture), recall@10 of the three compressed serving
families under:

  * the shipped scale-aware budget (R = 190 at the 0.95-split n = 1900);
  * a fixed budget R = RERANK_MULT*k = 160 (the fraction term off);
  * shrinking fixed budgets (R = 80 / 40 / 20) that emulate the reranked
    FRACTION a constant-R deployment has at ever larger corpora
    (R = 40 over n = 1900 is the same 2.1% a 160k-vector corpus gets
    from R = 16k*... — the decay trend is what transfers, not the n);
  * each of those crossed with PQ_K 64 (shipped) vs 256 (the codebook-
    resolution lever the deployment turns instead of R).

Usage: python scripts/recall_rerank_experiment.py [sf_dir]
Prints one JSON line per (config, family) and a markdown table at the
end (pasted into SCALE.md).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from toy_vector_db_spark import caches  # noqa: E402
from toy_vector_db_spark.operators import (  # noqa: E402
    evaluation,
    knn,
    similarity,
)
from toy_vector_db_spark.session import get_spark  # noqa: E402
from toy_vector_db_spark.sources.ndjson import split_count  # noqa: E402

K = 10
NO_FRACTION = 10**12  # RERANK_DEN value that disables the fraction term


def recall(run, truth) -> float:
    return round(
        evaluation.evaluate_recall(run, truth).agg(F.avg("recall")).first()[0],
        3,
    )


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("rerank-study")
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").cache()
    n = emb.count()
    cut = split_count(n, 0.95)
    base = emb.where(F.col("vec_id") < cut)
    qs = emb.where(F.col("vec_id") >= cut).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    exact = knn.knn_exact_batch(base, qs, K).cache()
    exact.count()

    configs = [
        # (label, RERANK_MULT, RERANK_DEN, PQ_K)
        ("shipped (R=max(160, n/10))", 16, 10, 64),
        ("fixed R=160", 16, NO_FRACTION, 64),
        ("fixed R=160, PQ_K=256", 16, NO_FRACTION, 256),
        ("fixed R=80", 8, NO_FRACTION, 64),
        ("fixed R=80, PQ_K=256", 8, NO_FRACTION, 256),
        ("fixed R=40", 4, NO_FRACTION, 64),
        ("fixed R=40, PQ_K=256", 4, NO_FRACTION, 256),
        ("fixed R=20", 2, NO_FRACTION, 64),
        ("fixed R=20, PQ_K=256", 2, NO_FRACTION, 256),
    ]
    baseline = caches.snapshot()
    defaults = (similarity.RERANK_MULT, similarity.RERANK_DEN, similarity.PQ_K)
    rows = []
    for label, mult, den, pq_k in configs:
        caches.restore(baseline)
        similarity.RERANK_MULT, similarity.RERANK_DEN = mult, den
        similarity.PQ_K = pq_k
        budget = similarity._rerank_budget(base, K)
        res = {
            "config": label,
            "R": budget,
            "frac_pct": round(100.0 * budget / cut, 1),
            "PQ_K": pq_k,
            "pq_rerank": recall(similarity.knn_pq_rerank(base, qs, K), exact),
            "ivfpq": recall(similarity.knn_ivfpq(base, qs, K), exact),
            "bq_rerank": recall(similarity.knn_bq_rerank(base, qs, K), exact),
        }
        rows.append(res)
        print(json.dumps(res), flush=True)
    similarity.RERANK_MULT, similarity.RERANK_DEN, similarity.PQ_K = defaults
    caches.restore(baseline)

    print("\n| config | R | % of base | PQ-rerank | IVF-PQ | BQ-rerank |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['config']} | {r['R']} | {r['frac_pct']}% "
            f"| {r['pq_rerank']} | {r['ivfpq']} | {r['bq_rerank']} |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
