#!/usr/bin/env python
"""BQ constant-cost recall study (round 8, verdict r7 item 2).

Round 7 measured BQ-rerank at the shared fixed budget R=160 at 0.699
recall@10 — a hair under the ≥0.70 deployment floor — and, unlike PQ,
sign-bit codes have no codebook-resolution knob to buy it back. But BQ
has a lever the other families don't: its candidate scan is 8 B/vector
(16× smaller than PQ's 48-bit codes + LUT work), so at EQUAL scan cost
BQ can afford a DEEPER exact rerank. This script measures recall@10 at
sf0.1 for fixed per-query budgets R ∈ {160, 320, 640, 1280} — all
constant w.r.t. corpus size, so all are 100 TB-deployable — to find the
smallest fixed R that clears the 0.70 floor with margin.

Usage: python scripts/bq_recall_study.py [sf_dir] [cpus]
Prints one JSON line per config and a markdown table (for SCALE.md).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from toy_vector_db_spark.operators import (  # noqa: E402
    evaluation,
    knn,
    similarity,
)
from toy_vector_db_spark.session import get_spark  # noqa: E402
from toy_vector_db_spark.sources.ndjson import split_count  # noqa: E402

K = 10


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = get_spark("bq-study", cpus=cpus)
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

    rows = []
    for r_fixed in (160, 320, 640, 1280):
        res = similarity.knn_bq_rerank(base, qs, K, rerank_r=r_fixed)
        rec = round(
            evaluation.evaluate_recall(res, exact)
            .agg(F.avg("recall"))
            .first()[0],
            3,
        )
        row = {
            "config": f"BQ fixed R={r_fixed}",
            "R": r_fixed,
            "frac_pct": round(100.0 * r_fixed / cut, 1),
            "bq_rerank": rec,
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    print("\n| config | R | % of base at sf0.1 | BQ-rerank recall@10 |")
    print("|---|---|---|---|")
    for r in rows:
        print(
            f"| {r['config']} | {r['R']} | {r['frac_pct']}% "
            f"| {r['bq_rerank']} |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
