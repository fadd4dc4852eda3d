"""Sinks: partitioned parquet write + read-back round trip.

The reference has no persistence at all (SURVEY §2.7); this is the
extension demonstrating the engine's sink path. At 100 TB the same
operator writes to object storage partitioned by a pruning-friendly key
(here: order month) so downstream readers get partition pruning for free;
`maxRecordsPerFile` / AQE coalescing control file sizes.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from toy_vector_db_spark.functions.rounding import rnd
from toy_vector_db_spark.sources.fixtures import FIXTURE_DIR


def csv_roundtrip(
    df: DataFrame, spark: SparkSession, name: str
) -> DataFrame:
    """CSV sink + schema-preserving read-back (header on, explicit schema on
    re-read — never inferSchema in production)."""
    out = os.path.join(FIXTURE_DIR, "sink_out", name)
    df.write.mode("overwrite").option("header", "true").csv(out)
    back = spark.read.schema(df.schema).option("header", "true").csv(out)
    return back.select(*[f.name for f in df.schema.fields])


def parquet_roundtrip(
    df: DataFrame,
    spark: SparkSession,
    name: str,
    partition_by: str | None = None,
) -> DataFrame:
    """Write df as (optionally partitioned) parquet under the repo fixture
    dir and read it back. Returns the read-back frame — proves the sink
    preserves schema and values (oracle = the upstream query's SQL)."""
    out = os.path.join(FIXTURE_DIR, "sink_out", name)
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(partition_by)
    writer.parquet(out)
    back = spark.read.parquet(out)
    # partitionBy turns the partition column into a directory key read back
    # as string; restore original column types/order by selecting in the
    # upstream schema's order with casts
    return back.select(
        *[back[f.name].cast(f.dataType).alias(f.name) for f in df.schema.fields]
    )


def bucketed_revenue_by_priority(
    lineitem: DataFrame,
    orders: DataFrame,
    spark: SparkSession,
    tag: str,
    buckets: int = 8,
) -> DataFrame:
    """Bucketed-sink + shuffle-free co-located join.

    Writes both fact tables bucketed (and sorted) on the join key, then
    joins the read-back tables. Because both sides expose
    HashPartitioning(orderkey, B) straight from the scan, the sort-merge
    join needs NO exchange on either side — the only shuffle in the whole
    query is the final 5-row aggregate (pinned by tests/test_plans.py).
    The remaining per-side Sorts are partition-LOCAL (no data movement,
    input already bucket-local and file-sorted); Spark ≥3.0 only consumes
    the sortBy metadata under
    ``spark.sql.legacy.bucketedTableScan.outputOrdering=true``.

    At 100 TB this is the storage-layout lever: bucketing lineitem and
    orders on orderkey at ingest removes the dominant shuffle from every
    downstream join on that key, forever. The projection written here is
    deliberately narrow (join key + measures) the way a real silver table
    would be; ``buckets`` would scale with data volume (e.g. 4096 buckets
    of ~25 GB each) — co-location only needs the two bucket counts equal
    or integer multiples.
    """
    safe = re.sub(r"[^A-Za-z0-9_]", "_", tag)
    li_name, ord_name = f"lineitem_bkt_{safe}", f"orders_bkt_{safe}"
    base = os.path.join(FIXTURE_DIR, "sink_out", "bucketed", safe)
    # repartition on the bucket key before writing → exactly ONE file per
    # bucket. With multiple files per bucket Spark must re-sort at read
    # time (per-file sort ≠ per-bucket sort) and the sortBy metadata is
    # useless; with one file the join is exchange-free AND sort-free.
    (
        lineitem.select("l_orderkey", "l_extendedprice", "l_discount")
        .repartition(buckets, "l_orderkey")
        .write.mode("overwrite")
        .format("parquet")
        .bucketBy(buckets, "l_orderkey")
        .sortBy("l_orderkey")
        .option("path", os.path.join(base, li_name))
        .saveAsTable(li_name)
    )
    (
        orders.select("o_orderkey", "o_orderpriority")
        .repartition(buckets, "o_orderkey")
        .write.mode("overwrite")
        .format("parquet")
        .bucketBy(buckets, "o_orderkey")
        .sortBy("o_orderkey")
        .option("path", os.path.join(base, ord_name))
        .saveAsTable(ord_name)
    )
    li = spark.table(li_name)
    od = spark.table(ord_name)
    # force sort-merge: a broadcast would also be shuffle-free here but
    # hides the co-location property this operator exists to demonstrate
    joined = li.hint("merge").join(od, li["l_orderkey"] == od["o_orderkey"])
    # revenue rounded to WHOLE units, not 4 decimals: this is the largest
    # money sum in the suite (~6e9 at sf0.1 over ~10^5 doubles), where
    # engine-dependent partial-sum order drifts the unrounded value by
    # ~1e-4 — far beyond a 4-decimal rounding step. Whole-unit rounding
    # keeps the cross-engine comparison stable at any tested scale.
    return joined.groupBy("o_orderpriority").agg(
        rnd(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 0
        ).alias("revenue"),
        F.count("*").alias("n_items"),
    )
