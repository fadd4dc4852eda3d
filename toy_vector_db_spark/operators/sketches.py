"""Sketch-based approximate aggregation: the 100 TB answer to DISTINCT and
exact percentiles, whose shuffle/state cost grows with cardinality.

  sketch_event_stats   per event_type: HLL++ approximate distinct users
                       (rsd 2%) + approximate p50/p95 of value — constant
                       state per group regardless of cardinality, fully
                       mergeable map-side (the whole point of a sketch at
                       scale: no exact-distinct re-shuffle, no full sort).

No exact-value oracle is possible: Spark's HLL++/KLL-style sketches and
DuckDB's differ by design, so the driver records a rows-only check and the
REAL gate is the local tolerance test (tests/test_sketches.py) asserting
each approximation lands within its documented error bound of the exact
answer computed by the same engine. Determinism: results are identical
run-to-run on the same data; the HLL distinct estimate is additionally
invariant under repartitioning (commutative/associative merges), while
percentile_approx's summary compression is merge-order-sensitive — its
value is stable per partitioning, not across partitionings."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from toy_vector_db_spark.functions.rounding import rnd

ROUND = 4
RSD = 0.02  # HLL++ target relative standard deviation
PCT_ACC = 10000  # approx_percentile accuracy parameter


def sketch_event_stats(events: DataFrame) -> DataFrame:
    return (
        events.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.approx_count_distinct("user_id", RSD).alias("approx_users"),
            rnd(
                F.percentile_approx("value", 0.5, PCT_ACC), ROUND
            ).alias("approx_p50"),
            rnd(
                F.percentile_approx("value", 0.95, PCT_ACC), ROUND
            ).alias("approx_p95"),
        )
        .select("event_type", "n", "approx_users", "approx_p50", "approx_p95")
    )


def sketch_event_stats_exact(events: DataFrame) -> DataFrame:
    """The sketch path's EXACT-aggregate twin (round-6 verdict item 4):
    the same grouping and row shape as ``sketch_event_stats`` with the
    approximations replaced by exact count-distinct and exact interpolated
    percentiles (Spark ``percentile`` ≡ DuckDB ``quantile_cont``, the
    already-driver-proven pair from order_price_percentiles). Fully
    DuckDB-oracle-able, so the sketch pipeline's row shape, grouping, and
    the inputs its estimates are judged against are driver-HASHED —
    the error-bound tests in tests/test_sketches.py then only have to
    cover the estimates themselves. At 100 TB this twin is what the
    sketch REPLACES (exact distinct re-shuffles per-user state; exact
    percentiles sort full groups) — it exists as the small-data oracle
    and accuracy reference, not a serving path."""
    p = F.expr("percentile(value, array(0.5, 0.95))")
    return (
        events.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("user_id").alias("exact_users"),
            rnd(p.getItem(0), ROUND).alias("exact_p50"),
            rnd(p.getItem(1), ROUND).alias("exact_p95"),
        )
        .select("event_type", "n", "exact_users", "exact_p50", "exact_p95")
    )
