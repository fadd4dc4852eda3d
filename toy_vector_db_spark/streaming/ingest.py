"""Structured-Streaming ingest into the IVF-PQ vector index.

The batch upsert (operators/similarity.ivfpq_upsert) proves the frozen-
quantizer append contract; this module drives the SAME contract through
the streaming engine: arriving vectors flow readStream → foreachBatch,
each micro-batch is assigned + encoded under the frozen quantizers and
APPENDED as parquet into the index sink directory — the continuous-
ingest shape of a production vector pipeline (source swaps to
Kafka/queue, sink to the cell-partitioned index table, checkpointing
makes it exactly-once). Because per-row assignment/encoding is
deterministic and batch boundaries only partition the work, the drained
index is row-identical to the batch upsert — so search over it shares
ivfpq_upsert_search's DuckDB oracle (asserted by the driver and in
tests).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession

from toy_vector_db_spark.sources.fixtures import FIXTURE_DIR


N_STREAM_FILES = 4  # staged source files → ≥4 real micro-batches


def _stream_embeddings_dir(spark: SparkSession, sf_dir: str) -> str:
    """Stage the (read-only) embeddings table into a directory the
    streaming file source can watch (the windows._stream_input_dir
    idiom) — split into N_STREAM_FILES range-partitioned files so the
    maxFilesPerTrigger=1 drain runs MULTIPLE genuine micro-batches (a
    single-file stage would collapse the 'stream' into one batch and
    prove nothing about batch-boundary independence)."""
    tag = os.path.basename(os.path.normpath(sf_dir))
    d = os.path.join(FIXTURE_DIR, "stream_embeddings", tag)
    marker = os.path.join(d, "_STAGED")
    src = os.path.join(sf_dir, "embeddings.parquet")
    if not os.path.exists(marker) or os.path.getmtime(marker) < os.path.getmtime(src):
        if os.path.exists(d):
            shutil.rmtree(d)
        (
            spark.read.parquet(src)
            .repartitionByRange(N_STREAM_FILES, "vec_id")
            .write.mode("overwrite")
            .parquet(d)
        )
        with open(marker, "w") as fh:
            fh.write("staged")
    return d


# (appId, sf_dir, lo, hi) → sink dir of an already-drained ingest: the
# stream is drained once per session; reruns read the written artifact —
# exactly how a long-lived ingest pipeline's consumers behave.
_INGEST_CACHE: dict[tuple, str] = {}


def stream_ingest_codes(
    spark: SparkSession,
    sf_dir: str,
    lo: int,
    hi: int,
    cents: DataFrame,
    books: list,
) -> DataFrame:
    """Drain the arriving vector slice (lo ≤ vec_id < hi) through the
    streaming engine into the index sink: per micro-batch, assign cells
    under the frozen ``cents``, encode codes under the frozen ``books``
    (both vectorized kernels — operators/similarity), and append the
    cell-keyed code rows as parquet. Returns the ingested codes⋈cells
    frame read back from the sink."""
    from toy_vector_db_spark.operators import similarity

    key = (spark.sparkContext.applicationId, sf_dir, lo, hi)
    if key not in _INGEST_CACHE:
        tag = os.path.basename(os.path.normpath(sf_dir))
        sink = os.path.join(
            FIXTURE_DIR, "sink_out", "stream_ingest", tag, f"{lo}_{hi}"
        )
        if os.path.exists(sink):
            shutil.rmtree(sink)
        os.makedirs(sink, exist_ok=True)

        src_dir = _stream_embeddings_dir(spark, sf_dir)
        schema = spark.read.parquet(src_dir).schema
        arriving = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
            .where(f"vec_id >= {lo} AND vec_id < {hi}")
        )

        def _process(batch_df: DataFrame, _batch_id: int) -> None:
            if batch_df.isEmpty():
                return
            codes = similarity.encode_codes(batch_df, books)
            assign = similarity.ivf_assign(batch_df, cents).select(
                "vec_id", "centroid_id"
            )
            codes.join(assign, "vec_id").write.mode("append").parquet(sink)

        q = (
            arriving.writeStream.foreachBatch(_process)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        _INGEST_CACHE[key] = sink
    return spark.read.parquet(_INGEST_CACHE[key])


def stream_ingest_sq_codes(
    spark: SparkSession,
    sf_dir: str,
    lo: int,
    hi: int,
    bounds: DataFrame,
) -> DataFrame:
    """CONTINUOUS ingest into the SQ8 index (round 8): the streaming
    twin of ``similarity.sq_upsert``, exactly as ``stream_ingest_codes``
    twins ``ivfpq_upsert`` — the fourth family completes the streaming
    trio. The arriving slice (lo ≤ vec_id < hi) drains readStream →
    foreachBatch; each micro-batch is encoded against the FROZEN
    broadcast ``bounds`` row (a pure per-row Catalyst expression — the
    cheapest ingest of any family: no assignment, no codebook lookup,
    no graph surgery) and appended as parquet to the index sink.
    Per-row encode makes the drained code set row-identical to the
    batch upsert regardless of batch boundaries, so search over it
    shares sq_upsert_search's DuckDB oracle exactly. Returns the
    ingested (vec_id, codes) frame read back from the sink."""
    from toy_vector_db_spark.operators import similarity

    key = (spark.sparkContext.applicationId, sf_dir, lo, hi, "sq")
    if key not in _INGEST_CACHE:
        tag = os.path.basename(os.path.normpath(sf_dir))
        sink = os.path.join(
            FIXTURE_DIR, "sink_out", "stream_sq", tag, f"{lo}_{hi}"
        )
        if os.path.exists(sink):
            shutil.rmtree(sink)
        os.makedirs(sink, exist_ok=True)

        src_dir = _stream_embeddings_dir(spark, sf_dir)
        schema = spark.read.parquet(src_dir).schema
        arriving = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
            .where(f"vec_id >= {lo} AND vec_id < {hi}")
        )

        def _process(batch_df: DataFrame, _batch_id: int) -> None:
            if batch_df.isEmpty():
                return
            batch = batch_df.select("vec_id", "embedding")
            similarity.sq_code_array(batch, bounds).write.mode(
                "append"
            ).parquet(sink)

        q = (
            arriving.writeStream.foreachBatch(_process)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        _INGEST_CACHE[key] = sink
    return spark.read.parquet(_INGEST_CACHE[key])


def stream_ingest_bq2_codes(
    spark: SparkSession,
    sf_dir: str,
    lo: int,
    hi: int,
    bounds: DataFrame,
) -> DataFrame:
    """CONTINUOUS ingest into the BQ2 index (round 9): the streaming
    twin of ``similarity.bq2_upsert`` — same drain shape as
    ``stream_ingest_sq_codes`` (readStream → foreachBatch, each
    micro-batch encoded against the FROZEN broadcast |nv|-max bounds
    row — a pure per-row Catalyst expression — and appended as parquet
    to the index sink). Per-row encode makes the drained code set
    row-identical to the batch upsert regardless of batch boundaries,
    so search over it shares bq2_upsert_search's DuckDB oracle
    exactly."""
    from toy_vector_db_spark.operators import similarity

    key = (spark.sparkContext.applicationId, sf_dir, lo, hi, "bq2")
    if key not in _INGEST_CACHE:
        tag = os.path.basename(os.path.normpath(sf_dir))
        sink = os.path.join(
            FIXTURE_DIR, "sink_out", "stream_bq2", tag, f"{lo}_{hi}"
        )
        if os.path.exists(sink):
            shutil.rmtree(sink)
        os.makedirs(sink, exist_ok=True)

        src_dir = _stream_embeddings_dir(spark, sf_dir)
        schema = spark.read.parquet(src_dir).schema
        arriving = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
            .where(f"vec_id >= {lo} AND vec_id < {hi}")
        )

        def _process(batch_df: DataFrame, _batch_id: int) -> None:
            if batch_df.isEmpty():
                return
            batch = batch_df.select("vec_id", "embedding")
            similarity.bq2_code_array(batch, bounds).write.mode(
                "append"
            ).parquet(sink)

        q = (
            arriving.writeStream.foreachBatch(_process)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        _INGEST_CACHE[key] = sink
    return spark.read.parquet(_INGEST_CACHE[key])


def stream_ingest_hnsw(
    spark: SparkSession,
    sf_dir: str,
    lo: int,
    hi: int,
    num_partitions: int = 8,
):
    """CONTINUOUS ingest into the HNSW index (round 7): the streaming
    twin of ``hnsw_upsert``, exactly as ``stream_ingest_codes`` twins
    ``ivfpq_upsert``. The arriving slice (lo ≤ vec_id < hi) drains
    readStream → foreachBatch; each micro-batch runs the shard-append
    upsert against the CURRENT on-disk index state, and only the TOUCHED
    shard partitions of the edge table are rewritten (dynamic partition
    overwrite — the 100 TB shape: an index partition is rewritten only
    when its shard ingests), while the vector table appends.

    Determinism: hnsw_upsert is proven shard-equal to a from-scratch
    build of its union for BOTH its paths (append replay and interleaved
    fallback), so the drained graph is EDGE-IDENTICAL to the one-shot
    batch upsert and to a from-scratch build of the union REGARDLESS of
    the order micro-batches arrive in (asserted in
    tests/test_hnsw_lifecycle.py) — which is why search over it shares
    hnsw_upsert_search's oracle.

    Returns (parted, edges) read back from the sink — the same tuple
    shape every HNSW search entry point takes."""
    from pyspark.sql import functions as F

    from toy_vector_db_spark.operators import hnsw as H

    key = (
        spark.sparkContext.applicationId, sf_dir, lo, hi,
        "hnsw", num_partitions,
    )
    if key not in _INGEST_CACHE:
        tag = os.path.basename(os.path.normpath(sf_dir))
        sink = os.path.join(
            FIXTURE_DIR, "sink_out", "stream_hnsw", tag, f"{lo}_{hi}"
        )
        if os.path.exists(sink):
            shutil.rmtree(sink)
        pdir = os.path.join(sink, "parted")
        edir = os.path.join(sink, "edges")

        initial = spark.read.parquet(
            os.path.join(sf_dir, "embeddings.parquet")
        ).where(f"vec_id < {lo}")
        # the SAME session-cached initial index the batch upsert key uses
        parted0, edges0 = H.cached_index(
            initial, f"{sf_dir}#hnsw_upsert_init", num_partitions
        )
        parted0.select("vec_id", "embedding", "part").write.partitionBy(
            "part"
        ).parquet(pdir)
        edges0.write.partitionBy("part").parquet(edir)

        src_dir = _stream_embeddings_dir(spark, sf_dir)
        schema = spark.read.parquet(src_dir).schema
        arriving = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir)
            .where(f"vec_id >= {lo} AND vec_id < {hi}")
        )

        def _process(batch_df: DataFrame, _batch_id: int) -> None:
            if batch_df.isEmpty():
                return
            batch = batch_df.select("vec_id", "embedding")
            parted = spark.read.parquet(pdir)
            edges = spark.read.parquet(edir)
            _, e2 = H.hnsw_upsert(parted, edges, batch, num_partitions)
            touched = [
                int(r[0])
                for r in H._with_part(batch, num_partitions, "vec_id")
                .select("part").distinct().collect()
            ]
            # rewrite ONLY the touched shard partitions of the edge table
            (
                e2.where(F.col("part").isin(touched))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("part")
                .parquet(edir)
            )
            (
                H._with_part(batch, num_partitions, "vec_id")
                .write.mode("append").partitionBy("part").parquet(pdir)
            )

        q = (
            arriving.writeStream.foreachBatch(_process)
            .trigger(availableNow=True)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        _INGEST_CACHE[key] = sink
    sink = _INGEST_CACHE[key]
    return (
        spark.read.parquet(os.path.join(sink, "parted")),
        spark.read.parquet(os.path.join(sink, "edges")),
    )
