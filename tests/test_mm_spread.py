"""Payload-size-class rebalance (round 12, verdict r11 item 7).

The codec kernels' `_spread` exchange balances ROW COUNTS; a corpus
mixing mega payloads with thumbnails can stack several mega rows in one
task — the single-task skew the exchange exists to kill, re-created by
bytes. `_spread(size_col=...)` round-robins within log2 size classes so
a partition's byte excess over the mean is bounded by ONE max payload.
The adversarial corpus here defeats the count-round-robin
deterministically: one input partition with a mega doc at every P-th
position, so position-based round robin stacks ALL megas into one task.
"""

from pyspark.sql import functions as F

from toy_vector_db_spark.operators import multimodal as mm


def _max_part_bytes(df):
    per = (
        df.select(
            F.spark_partition_id().alias("pid"),
            F.length("payload").alias("b"),
        )
        .groupBy("pid")
        .agg(F.sum("b").alias("b"))
        .collect()
    )
    return max(r["b"] for r in per)


def test_size_class_spread_bounds_partition_bytes(spark):
    par = spark.sparkContext.defaultParallelism
    n_mega = par * 2 + 1  # wraps the round robin: ceil = 3 per task
    rows = [
        (i, ("mega doc " * 2000) if i < n_mega else "tiny doc")
        for i in range(par * 10)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string"
    ).coalesce(1)
    p = mm.with_image_payload(docs)

    sized = mm._spread(p, size_col="payload")
    # the GUARANTEE (deterministic, unlike the count round robin whose
    # byte stacking depends on row positions after the pre-repartition
    # sort): the mega class spreads one-per-task before wrapping, so no
    # partition holds more than ceil(n_mega / par) mega rows...
    mega_per_part = (
        sized.where(F.length("payload") > 10_000)
        .groupBy(F.spark_partition_id().alias("pid"))
        .count()
        .collect()
    )
    import math

    assert max(r["count"] for r in mega_per_part) == math.ceil(
        n_mega / par
    )
    assert len(mega_per_part) == par  # every task got mega work
    # ...hence partition bytes exceed the mean by at most ~one max
    # payload (the floor for any row-preserving balance)
    agg = p.agg(
        F.sum(F.length("payload")).alias("t"),
        F.max(F.length("payload")).alias("m"),
    ).first()
    assert _max_part_bytes(sized) <= agg["t"] / par + agg["m"]
    # row-wise kernels are partition-agnostic: values identical vs the
    # count spread
    a = sorted(map(tuple, mm._image_stats_over(sized).collect()))
    b = sorted(map(tuple, mm._image_stats_over(mm._spread(p)).collect()))
    assert a == b and len(a) == par * 10
