"""Ingestion operators: NDJSON scan and deterministic prefix split.

Reference parity (SURVEY.md §2.1):
  S1 read_ndjson     /root/reference/src/dataset.rs:8-17 — parse each line,
                     silently skip malformed lines, stop after `limit` lines
                     READ (take happens before parse: a bad line consumes
                     budget).
  S2 split_dataset   /root/reference/src/dataset.rs:19-23 — deterministic
                     PREFIX split at round(n*ratio); NOT a random split.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

POINT_SCHEMA = T.StructType(
    [
        # field renamed via serde in the reference (src/point.rs:8)
        T.StructField("body", T.StringType()),
        T.StructField("text-embedding-ada-002", T.ArrayType(T.FloatType())),
    ]
)


def read_ndjson(
    spark: SparkSession,
    path: str,
    limit: int | None = None,
    schema: T.StructType = POINT_SCHEMA,
) -> DataFrame:
    """NDJSON scan with reference semantics (src/dataset.rs:8-17).

    The reference applies ``take(limit)`` to raw LINES before parsing, so a
    malformed line inside the first `limit` lines consumes budget and is then
    dropped. Spark's ``read.json(...).limit(n)`` would limit post-parse, so we
    read as text, limit, then ``from_json`` and drop nulls — bit-faithful to
    take-before-parse. Malformed lines parse to NULL and are filtered
    (DROPMALFORMED semantics, src/dataset.rs:15).

    At scale: ``spark.read.text`` is a splittable line scan; ``from_json`` is
    a codegen'd JVM expression — the whole pipeline is one narrow stage.

    SINGLE-FILE PRECONDITION for ``limit``: an unordered LIMIT is the file
    prefix only when the scan's partitions enumerate in line order. For ONE
    file that holds (splits of a single file pack in byte-offset order, and
    GlobalLimit drains partitions in index order); across MANY files Spark
    packs splits by size, not path, so "first n lines" would be
    enumeration-dependent. The reference itself defines limit over a single
    file stream (src/dataset.rs:8-17) — multi-file + limit has no reference
    semantics to match, so we refuse it rather than silently diverge.
    """
    lines = spark.read.text(path)
    if limit is not None:
        n_files = lines.inputFiles()
        if len(n_files) > 1:
            raise ValueError(
                f"read_ndjson(limit=...) requires a single input file for "
                f"deterministic prefix semantics; {path!r} matched "
                f"{len(n_files)} files. Read without limit, or add an "
                f"explicit line-ordinal column to the data."
            )
        lines = lines.limit(limit)
    # PERMISSIVE (default): malformed JSON → NULL struct; missing/mistyped
    # fields → NULL fields. Both filtered below = serde's silent drop.
    parsed = lines.select(F.from_json(F.col("value"), schema).alias("p"))
    # from_json yields NULL for malformed rows; also reject rows where any
    # required field is missing (serde requires both fields to be present).
    out = parsed.where(
        F.col("p").isNotNull()
        & F.col("p.body").isNotNull()
        & F.col("p.`text-embedding-ada-002`").isNotNull()
    )
    return out.select(
        F.col("p.body").alias("body"),
        F.col("p.`text-embedding-ada-002`").alias("embedding"),
    )


def split_count(n: int, ratio: float) -> int:
    """round(n * ratio) with Rust round-half-away-from-zero semantics
    (src/dataset.rs:20)."""
    import math

    x = n * ratio
    return int(math.floor(x + 0.5))


def split_dataset(
    df: DataFrame, id_col: str, n: int, ratio: float
) -> tuple[DataFrame, DataFrame]:
    """Deterministic prefix split on an explicit id column
    (src/dataset.rs:19-23). The reference splits by POSITION; DataFrames are
    unordered, so we carry the ordered surrogate key (SURVEY §1.4).

    Returns (base, queries): base = first round(n*ratio) ids, queries = rest.
    Both are filters over the same scan — at scale these are partition-pruned
    predicate-pushdown scans, zero shuffle.
    """
    cut = split_count(n, ratio)
    c: Column = F.col(id_col)
    return df.where(c < cut), df.where(c >= cut)
