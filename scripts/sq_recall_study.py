#!/usr/bin/env python
"""SQ8 recall study (round 8 — the fourth index family's measurement).

Quantifies the scalar-quantization serving pipeline at sf0.1 and at the
10x generated fixture (19k base / 100 queries, 10 Gaussian clusters,
sigma=2.5 — the same corpus as tests/test_similarity.py's 10x gate):

  * shipped budget (shared scale-aware capped rerank floor),
  * ADC-only, R=k — zero rerank slack, the prune's raw quality,
  * fixed R=160 — the constant-cost stress configuration (the capped
    regime's analogue, where BQ measures 0.617 with no recovery knob).

Measured (recorded in SCALE.md): shipped 1.0 / 1.0, ADC-only 0.982 /
0.981, fixed R=160 at 10x 1.0 — SQ is the constant-cost configuration
with recall headroom, at a 64 B/vector (8x compressed) scan.

Usage: python scripts/sq_recall_study.py [sf_dir] [cpus]
Prints one JSON line per config.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from toy_vector_db_spark.operators import (  # noqa: E402
    evaluation,
    knn,
    similarity,
)
from toy_vector_db_spark.sources.ndjson import split_count  # noqa: E402


def study(spark, fixture, base, qs):
    """One persisted exact baseline per fixture (the dominant cost —
    it is independent of rerank_r), reused across all three configs."""
    exact = knn.knn_exact_batch(base, qs, 10).persist()
    exact.count()
    for label, r in (
        ("shipped", None),
        ("adc_only_R=k", 10),
        ("fixed_R=160", 160),
    ):
        sq = similarity.knn_sq_rerank(base, qs, 10, rerank_r=r)
        rec = (
            evaluation.evaluate_recall(sq, exact)
            .agg(F.avg("recall")).first()[0]
        )
        print(json.dumps({
            "fixture": fixture, "config": label, "recall_at_10": rec,
        }))
    exact.unpersist()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    cpus = sys.argv[2] if len(sys.argv) > 2 else "32"
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    n = emb.count()
    cut = split_count(n, 0.95)
    base = emb.where(F.col("vec_id") < cut).select("vec_id", "embedding")
    qs = emb.where(F.col("vec_id") >= cut).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    study(spark, sf_dir, base, qs)

    # the 10x generated corpus (seed-pinned, identical to the 10x gate)
    rng = np.random.default_rng(42)
    nn, d, kc, sigma = 20000, 64, 10, 2.5
    centers = rng.normal(0, 1, (kc, d))
    lab = rng.integers(0, kc, nn)
    X = centers[lab] + rng.normal(0, sigma, (nn, d))
    rows = [(i, [float(x) for x in X[i]]) for i in range(nn)]
    emb10 = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    b10 = emb10.where(F.col("vec_id") < 19000)
    q10 = emb10.where(
        (F.col("vec_id") >= 19000) & (F.col("vec_id") < 19100)
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    study(spark, "10x_generated", b10, q10)


if __name__ == "__main__":
    main()
