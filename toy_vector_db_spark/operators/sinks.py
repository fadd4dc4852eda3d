"""Sinks: partitioned parquet write + read-back round trip.

The reference has no persistence at all (SURVEY §2.7); this is the
extension demonstrating the engine's sink path. At 100 TB the same
operator writes to object storage partitioned by a pruning-friendly key
(here: order month) so downstream readers get partition pruning for free;
`maxRecordsPerFile` / AQE coalescing control file sizes.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

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
