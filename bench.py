#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is timed action-to-completion (collect of the final, already
small, result set — top-k / aggregate outputs), so the measured cost is the
distributed plan, not driver-side materialization of bulk data.

Build keys (index/quantizer construction that populates a session cache)
are timed ONCE, on first touch — a repeat would measure the cache hit.
Every other key reports the MEDIAN of 3 runs (round-6 bench hygiene,
verdict r5 item 8: n=1/min-of-2 let ±25% shared-box noise drive
round-over-round conclusions; a median resists one bad run in either
direction). The first run still pays any plan-analysis cost; nothing is
cached between runs for these keys beyond what a long-lived engine
session would legitimately reuse. Per-key run counts are reported in
"runs" so the driver log shows which numbers are medians and which are
one-shot builds.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from toy_vector_db_spark import registry  # noqa: E402
from toy_vector_db_spark.session import get_spark  # noqa: E402

# Headline set: the flagship reference query plus the heaviest implemented
# operators. Extended as the registry grows.
HEADLINE = [
    # reference-parity core. hnsw_build runs BEFORE knn_hnsw: build is
    # timed once, then searches reuse the session-cached index — the same
    # build/search measurement split as the reference (src/main.rs:20-43).
    "knn_exact_single",
    "knn_exact_batch",
    "hnsw_build",
    "knn_hnsw",
    "vec_magnitude",
    "vec_cosine_dist",
    "eval_recall",
    # scale extensions. ivf_train / pq_train run BEFORE their consumers:
    # quantizer training is timed once (build/search split), then
    # assignment/search keys reuse the session-cached trained tables.
    "ivf_train",
    "knn_ivf",
    "pq_train",
    "pq_codes",
    "knn_pq_rerank",
    "knn_bq_rerank",
    "ivfpq_build",
    "knn_ivfpq",
    "ivfpq_partitioned_search",
    "ivfpq_upsert_search",
    "hnsw_routed_build",
    "knn_hnsw_routed",
    "dedup_minhash_lsh",
    "dup_clusters",
    "span_dedup_scrub",
    "simhash_signatures",
    "ngram_jaccard_topk",
    "bm25_topk",
    "hybrid_rrf_topk",
    "hybrid_rrf_ivfpq",
    "tpch_q1_pricing_summary",
    "revenue_by_nation",
    "sessionize_events",
    "streaming_tumbling_counts",
    "text_quality",
    "doc_fingerprint",
    "decontaminate_ngram",
    "doc_repetition_stats",
    "model_quality_inference",
]


# The r1 headline set (minus the since-trimmed tumbling_window_hourly):
# summed separately so round-over-round totals compare like-for-like even
# as the headline list grows with new operators.
R1_COMPARABLE = [
    "knn_exact_single", "knn_exact_batch", "hnsw_build", "knn_hnsw",
    "vec_magnitude", "vec_cosine_dist", "eval_recall", "knn_ivf",
    "knn_hnsw_routed", "dedup_minhash_lsh", "simhash_signatures",
    "ngram_jaccard_topk", "tpch_q1_pricing_summary", "revenue_by_nation",
    "sessionize_events", "text_quality", "doc_fingerprint",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("tvdb-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # untimed warmup: JVM/codegen spin-up, the parquet reader, the shuffle
    # machinery, and the Python/Arrow worker pool are per-process fixed
    # costs, not query costs — pay them before the clock starts.
    # Every fixture table's footer/scan path is touched (round 6): the
    # one-shot build keys previously absorbed the first scan of whichever
    # table they happened to read first (dedup_minhash_lsh's r5 "+1.2 s
    # regression" was exactly this — documents.parquet cold-scan variance,
    # not the operator; isolated re-runs measured 5.6 s first-touch /
    # 0.30 s steady-state with no code change).
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for t in registry.TABLES:
        # registry.table handles the events nanosecond-timestamp variant
        registry.table(spark, sf_dir, t).limit(1).collect()
    spark.range(100).groupBy((F.col("id") % 4).alias("g")).count().collect()
    (
        spark.range(64)
        .groupBy((F.col("id") % 2).alias("g"))
        .applyInPandas(lambda p: p, schema="id long")
        .count()
    )

    qmap = registry.queries()
    if "--all" in sys.argv:
        # regression guard for queries outside the headline set (and outside
        # the driver's correctness window): bench EVERY registered query so
        # a slowdown in an unbenched operator can't hide between rounds
        names = list(qmap)
    else:
        names = [n for n in HEADLINE if n in qmap]
    # first call builds + caches a session artifact; a second timed run
    # would measure the cache hit instead of the build
    # (dedup_minhash_lsh builds the session pair cache that dup_clusters
    # then legitimately reuses — the pair graph is the dedup pipeline's
    # shared build artifact; eval_recall materializes the two retrieval
    # runs that all three evaluation metrics score, so it is timed once
    # with that materialization included)
    build_keys = {
        "hnsw_build", "ivf_train", "pq_train", "pq_codes", "ivfpq_build",
        "hnsw_routed_build", "dedup_minhash_lsh", "eval_recall",
    }
    import statistics

    timings: dict[str, float] = {}
    timings_min: dict[str, float] = {}
    run_counts: dict[str, int] = {}
    for name in names:
        runs = 1 if name in build_keys else 3
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            df = qmap[name](spark, sf_dir)
            # force full execution; result sets are small by construction
            df.collect()
            samples.append(time.perf_counter() - t0)
        timings[name] = round(statistics.median(samples), 3)
        # min-of-N rides along for like-for-like comparison with the
        # min-of-2 numbers of rounds ≤5 (a median is systematically above
        # a min; without this, the estimator change itself would read as
        # a uniform ~1.2× "regression" in round-over-round deltas)
        timings_min[name] = round(min(samples), 3)
        run_counts[name] = runs

    total = round(sum(timings.values()), 3)
    r1_total = round(
        sum(t for n, t in timings.items() if n in R1_COMPARABLE), 3
    )
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_min": timings_min,
                "runs": run_counts,
                "r1_comparable_total": r1_total,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
