"""Query registry: every implemented operator exposed as a named query
(SURVEY.md §2 "query key" column), each with a DuckDB oracle SQL string
where the semantics are SQL-expressible.

Contract (driver harness, __spark_entry__.py):
  * queries()[name](spark, sf_dir) -> DataFrame
  * oracle_sql()[name] -> ANSI SQL over pre-registered DuckDB views of the
    same parquet tables; column names/aliases must match the Spark output
    exactly (compare sorts columns by name before hashing).

Float discipline: every computed float column is rounded to ROUND decimal
places in BOTH engines so order-of-summation drift can never flip the value
hash (SURVEY §7 risk register #1). Ordering/top-k membership always uses the
UNROUNDED value with an id tiebreak in both engines (risk #4).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from toy_vector_db_spark.functions.rounding import rnd

from toy_vector_db_spark.functions import text as TXT
from toy_vector_db_spark.functions import vector as V
from toy_vector_db_spark.operators import evaluation, hnsw, knn
from toy_vector_db_spark.session import configure
from toy_vector_db_spark.sources import fixtures
from toy_vector_db_spark.sources.ndjson import read_ndjson, split_count

SCAN_FIXTURE_PATH = fixtures.write_scan_fixture()

ROUND = 6
_R = 4  # rounding for relational/streaming money-ish aggregates
SPLIT_RATIO = 0.95  # reference: src/main.rs:66
QUERY_OFFSET = 29  # reference: query[29], src/main.rs:81
K = 10  # reference: src/main.rs:78

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # session timezone/AQE settings, whoever created the session
            configure(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        _QUERIES[name] = wrapped
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


# The driver's correctness gate checks the FIRST 50 entries of queries()
# (dict iteration order), so ordering is coverage policy, not cosmetics.
# Priority: SURVEY §2 reference-parity keys, then the LLM-data-pipeline
# families (dedup / similarity / text / multimodal), then streaming, then
# the ten highest-value relational extensions. Keys past the window remain
# fully oracle-tested locally (tests/test_registry_oracles.py covers every
# registered oracle) and run in `bench.py --all`.
_PRIORITY = [
    # ============ ROUND-14 ROTATION (verdict r13 items 2 and 6) ===========
    # IN (50):
    #   * the full _R14_ROTATION_QUEUE as written down last round and
    #     policy-tested (19 keys — the r10-stale cohort; verdict item
    #     2's Done asks for exactly these rows, after which the
    #     freshness policy tightens to r11).
    #   * mm_decode_png_rgb_stats (verdict item 5): NEW key this round —
    #     truecolor PNG through the from-scratch codec at RFC 2083
    #     color type 2, exact per-channel stats, stride-3 byte-math
    #     oracle. Windowed at birth per the Done criterion.
    #   * REWRITTEN-PATH REFRESHES (4): keys whose code changed THIS
    #     round — mm_decode_png_stats (the gray path now runs through
    #     the generalized bytewise-bpp filter code the color type
    #     shares), semdedup_prune (the assignment kernel gained the
    #     blocked-matmul argmin with the near-tie parity guard, verdict
    #     item 4), and one representative per filtered-serving family
    #     for the session-memoized qlabel map (advice r13):
    #     knn_hnsw_filtered (label-partitioned graph path) and
    #     knn_ivfpq_filtered (bounded quantizer-kernel path).
    #   * r11-STALE REFRESHES (26): the oldest remaining cohort — the
    #     ANN lifecycle/exhaustive/range keys, the streaming ingest +
    #     window twins, the decontamination family, span/embedding
    #     dedup, and mm_decode_image_stats. The 12 r11 keys left over
    #     (pure-Catalyst relational/text keys whose plans haven't
    #     changed since they last hashed green) form
    #     _R15_ROTATION_QUEUE.
    # OUT (every r13-window key except the 3 refreshes named above):
    # all have fresh r13 green rows and stay fully oracle-tested locally
    # at three SFs (tests/test_registry_oracles.py) and benched in
    # bench.py. After CORRECTNESS_r14 no registered key's last driver
    # row predates r11 (the enforcing policy test tightens to r11); the
    # next-oldest cohort (12 keys at r11) is _R15_ROTATION_QUEUE.
    # ======================================================================
    # -- the r10-stale queue (verdict item 2) --
    "bm25_topk", "chunk_documents", "curation_filter",
    "hnsw_routed_build", "ivf_assign", "lsh_buckets",
    "mm_feature_extract", "mm_frame_sample", "mm_payload_metadata",
    "pii_scrub", "simhash_near_pairs", "stratified_quality_filter",
    "streaming_session_windows", "streaming_stateful_user_stats",
    "streaming_tumbling_counts", "text_langid", "text_quality",
    "text_token_stats", "token_batch_packing",
    # -- new this round: truecolor PNG (verdict item 5) --
    "mm_decode_png_rgb_stats",
    # -- rewritten this round: shared PNG filter code, matmul assign,
    #    memoized qlabel map --
    "mm_decode_png_stats", "semdedup_prune",
    "knn_hnsw_filtered", "knn_ivfpq_filtered",
    # -- r11-stale: ANN lifecycle / exhaustive / range --
    "bq2_codes", "bq2_delete_search", "bq2_upsert_search",
    "hnsw_delete_search", "ivfpq_compact_search", "ivfpq_delete_search",
    "ivfpq_partitioned_search", "ivfpq_upsert_search",
    "knn_exact_filtered", "knn_hnsw_exhaustive", "knn_hnsw_routed",
    "knn_hnsw_routed_exhaustive", "knn_range_search",
    # -- r11-stale: hybrid retrieval + decontamination --
    "hybrid_rrf_topk", "contamination_report",
    "decontaminate_eval_fixture", "decontaminate_ngram",
    # -- r11-stale: dedup + embedding pipeline --
    "span_dedup_scrub", "embedding_near_dups_lsh", "doc_embedding_pool",
    "model_quality_inference",
    # -- r11-stale: streaming twins --
    "streaming_bq2_ingest", "streaming_dedup_counts",
    "streaming_sliding_counts", "streaming_vector_ingest",
    # -- r11-stale: multimodal raw decode --
    "mm_decode_image_stats",
]

# Round-15 rotation queue: the next-oldest cohort — every registered key
# whose last driver row is r11 after the round-14 window lands (the
# enforcing policy test pins this list against merged CORRECTNESS
# r01-r13 + the r14 window), all pure-Catalyst relational/text keys
# untouched by round-14 code changes.
_R15_ROTATION_QUEUE: list[str] = [
    "csv_sink_roundtrip", "customers_without_orders",
    "doc_repetition_stats", "events_json_stats",
    "order_price_percentiles", "order_priority_pivot",
    "running_total_by_supplier", "sketch_event_stats_exact",
    "source_mixture_sample", "top_customer_set_difference",
    "training_shard_assign", "vocab_topk",
]

# Bench-only serve twins: registered (bench.py resolves headline keys
# through the registry) but deliberately never windowed — their
# deterministic invariants are driver-hashed via serve_invariants, and
# their recall floors live in tests/test_serve_keys.py. The freshness
# policy test exempts exactly these four.
_SERVE_TWIN_EXEMPT: set[str] = {
    "hnsw_upsert_serve", "hnsw_delete_serve",
    "hnsw_routed_upsert_serve", "hnsw_routed_delete_serve",
}

def _ordered(d: dict) -> dict:
    head = {k: d[k] for k in _PRIORITY if k in d}
    tail = {k: v for k, v in d.items() if k not in head}
    return {**head, **tail}


def queries() -> dict[str, QueryFn]:
    return _ordered(_QUERIES)


def oracle_sql() -> dict[str, str]:
    from toy_vector_db_spark.functions.rounding import stabilize_sql_rounding

    # every oracle's round() goes through the cross-engine-stable floor
    # form (see functions/rounding.py) — single rewrite point
    return _ordered({k: stabilize_sql_rounding(v) for k, v in _ORACLES.items()})


# (appId, sf_dir, name, path snapshot) → the scan DataFrame. Round 14
# (guide §7.3 driver discipline): every registry query rebuilt its input
# scans per call, and each spark.read.parquet is a driver-side file
# listing + footer schema read — profiled at ~0.1 s of every key's
# construction. A long-lived engine session registers its tables once
# (this memo IS the catalog); the plan is an unresolved scan, so every
# collect still reads the parquet from disk — nothing about results or
# executed work is cached. Keyed on a stat snapshot of the backing path
# (size + mtime_ns, per part file for directories) so an in-place
# rewrite invalidates, the same staleness rule as knn._input_snapshot.
# A stable scan plan also makes semanticHash-keyed session caches
# hittable across calls by construction. Registered in
# caches._cache_dicts (bench hygiene).
_TABLE_CACHE: dict[tuple, DataFrame] = {}


def _path_snapshot(path: str):
    try:
        st = os.stat(path)
    except OSError:
        return ("missing",)
    if os.path.isdir(path):
        entries = []
        for de in sorted(os.scandir(path), key=lambda d: d.name):
            try:
                s = de.stat()
                entries.append((de.name, s.st_size, s.st_mtime_ns))
            except OSError:
                entries.append((de.name, -1, -1))
        return tuple(entries)
    return (st.st_size, st.st_mtime_ns)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    key = (
        spark.sparkContext.applicationId,
        sf_dir,
        name,
        _path_snapshot(f"{sf_dir}/{name}.parquet"),
    )
    if key not in _TABLE_CACHE:
        _TABLE_CACHE[key] = _read_table(spark, sf_dir, name)
    return _TABLE_CACHE[key]


def _read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.ts has shipped as BOTH a nanosecond parquet timestamp
        # (reads as long under nanosAsLong; truncate to micros exactly like
        # DuckDB's TIMESTAMP_NS → TIMESTAMP cast) and a plain microsecond
        # timestamp (reads as TIMESTAMP_NTZ; session TZ is UTC so the cast
        # to TimestampType is value-preserving). Normalize either to a
        # microsecond TimestampType column.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        from pyspark.sql import types as T

        if isinstance(df.schema["ts"].dataType, T.LongType):
            # integer division: float division would round-trip int64 nanos
            # through double and lose sub-microsecond bits
            return df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")



_N_CACHE: dict[str, int] = {}


def _emb_count(spark: SparkSession, sf_dir: str) -> int:
    """Row count of the (immutable) embeddings fixture, cached per sf_dir —
    saves one Spark job for every split-based query."""
    if sf_dir not in _N_CACHE:
        _N_CACHE[sf_dir] = table(spark, sf_dir, "embeddings").count()
    return _N_CACHE[sf_dir]


# ---------------------------------------------------------------------------
# §2.2 vector scalar functions (V1-V6) — per-row over `embeddings`, with the
# dot/cosine/euclidean pairs formed by the (vec_id, vec_id+1) self-join so the
# oracle is a plain equi-join.
# ---------------------------------------------------------------------------

def _pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    a = emb.select("vec_id", F.col("embedding").alias("va"))
    b = emb.select((F.col("vec_id") - 1).alias("vec_id"), F.col("embedding").alias("vb"))
    return a.join(b, "vec_id")


_PAIRS_SQL = (
    "FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1"
)


@register(
    "vec_magnitude",
    f"""
    SELECT vec_id, round({V.sql_magnitude('embedding')}, {ROUND}) AS mag
    FROM embeddings
    """,
)
def q_vec_magnitude(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id", rnd(V.magnitude("embedding"), ROUND).alias("mag")
    )


@register(
    "vec_dot",
    f"""
    SELECT a.vec_id AS vec_id,
           round({V.sql_dot('a.embedding', 'b.embedding')}, {ROUND}) AS dot
    {_PAIRS_SQL}
    """,
)
def q_vec_dot(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _pairs(spark, sf_dir).select(
        "vec_id", rnd(V.dot("va", "vb"), ROUND).alias("dot")
    )


@register(
    "vec_cosine_sim",
    f"""
    SELECT a.vec_id AS vec_id,
           round({V.sql_cosine_similarity('a.embedding', 'b.embedding')}, {ROUND}) AS sim
    {_PAIRS_SQL}
    """,
)
def q_vec_cosine_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _pairs(spark, sf_dir).select(
        "vec_id",
        rnd(V.cosine_similarity("va", "vb"), ROUND).alias("sim"),
    )


@register(
    "vec_cosine_dist",
    f"""
    SELECT a.vec_id AS vec_id,
           round({V.sql_cosine_distance('a.embedding', 'b.embedding')}, {ROUND}) AS dist
    {_PAIRS_SQL}
    """,
)
def q_vec_cosine_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _pairs(spark, sf_dir).select(
        "vec_id",
        rnd(V.cosine_distance("va", "vb"), ROUND).alias("dist"),
    )


@register(
    "vec_euclidean_dist",
    f"""
    SELECT a.vec_id AS vec_id,
           round({V.sql_euclidean_distance('a.embedding', 'b.embedding')}, {ROUND}) AS dist
    {_PAIRS_SQL}
    """,
)
def q_vec_euclidean_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _pairs(spark, sf_dir).select(
        "vec_id",
        rnd(V.euclidean_distance("va", "vb"), ROUND).alias("dist"),
    )


# ---------------------------------------------------------------------------
# §2.3 exact KNN
# ---------------------------------------------------------------------------

def _split_cut_sql() -> str:
    """round(0.95 * n) as a DuckDB scalar subquery (src/dataset.rs:20)."""
    return (
        f"CAST(round({SPLIT_RATIO} * (SELECT count(*) FROM embeddings)) AS BIGINT)"
    )


_KNN_SINGLE_SQL = f"""
WITH cut AS (
  SELECT c, least({QUERY_OFFSET}, (SELECT count(*) FROM embeddings) - c - 1) AS off
  FROM (SELECT {_split_cut_sql()} AS c)
),
q AS (SELECT embedding AS qv FROM embeddings, cut WHERE vec_id = c + off),
scored AS (
  SELECT b.vec_id AS vec_id,
         {V.sql_cosine_distance('b.embedding', 'q.qv')} AS d
  FROM embeddings b, q, cut WHERE b.vec_id < c
)
SELECT vec_id, round(d, {ROUND}) AS dist
FROM scored ORDER BY d ASC, vec_id ASC LIMIT {K}
"""


@register("knn_exact_single", _KNN_SINGLE_SQL)
def q_knn_exact_single(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship reference query: top-10 nearest neighbors (clamped cosine) of
    query point query[29] over the 95% prefix base set (src/main.rs:61-94).
    Plans as parquet scan → codegen distance → TakeOrderedAndProject(10)."""
    emb, qid, base = _query_point(spark, sf_dir)
    qvec = emb.where(F.col("vec_id") == qid).select("embedding").head()[0]
    res = knn.knn_exact_single(base, qvec, K)
    return res.select("vec_id", rnd("dist", ROUND).alias("dist"))


RANGE_THRESH = 0.75  # radius for the range-search key (measured: a few
# dozen in-cluster rows at every SF; nearest base distance to the
# boundary ≥ 1e-3, and both engines compute identical doubles anyway)

_KNN_RANGE_SQL = f"""
WITH cut AS (
  SELECT c, least({QUERY_OFFSET}, (SELECT count(*) FROM embeddings) - c - 1) AS off
  FROM (SELECT {_split_cut_sql()} AS c)
),
q AS (SELECT embedding AS qv FROM embeddings, cut WHERE vec_id = c + off),
scored AS (
  SELECT b.vec_id AS vec_id,
         {V.sql_cosine_distance('b.embedding', 'q.qv')} AS d
  FROM embeddings b, q, cut WHERE b.vec_id < c
)
SELECT vec_id, round(d, {ROUND}) AS dist
FROM scored WHERE d <= {RANGE_THRESH}
"""


@register("knn_range_search", _KNN_RANGE_SQL)
def q_knn_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE search (round 6) — the other half of the Faiss-style query
    API the reference lacks: ALL base vectors within a fixed distance
    radius of the query, not a fixed count. Result size is data-driven
    (the dedup/near-match shape: "everything closer than r"), the plan is
    a pure filter over the scored scan — no sort, no limit, no shuffle at
    all: strictly cheaper than top-k at 100 TB because the per-partition
    heaps and the driver merge disappear; the predicate evaluates inside
    the scan projection."""
    emb, qid, base = _query_point(spark, sf_dir)
    qvec = emb.where(F.col("vec_id") == qid).select("embedding").head()[0]
    scored = knn.with_distance(base, qvec)
    return scored.where(F.col("dist") <= RANGE_THRESH).select(
        "vec_id", rnd("dist", ROUND).alias("dist")
    )


_KNN_FILTERED_SQL = f"""
WITH cut AS (
  SELECT c, least({QUERY_OFFSET}, (SELECT count(*) FROM embeddings) - c - 1) AS off
  FROM (SELECT {_split_cut_sql()} AS c)
),
q AS (SELECT embedding AS qv, label AS qlabel
      FROM embeddings, cut WHERE vec_id = c + off),
scored AS (
  SELECT b.vec_id AS vec_id, b.label AS label,
         {V.sql_cosine_distance('b.embedding', 'q.qv')} AS d
  FROM embeddings b, q, cut WHERE b.vec_id < c AND b.label = q.qlabel
)
SELECT vec_id, CAST(label AS INT) AS label, round(d, {ROUND}) AS dist
FROM scored ORDER BY d ASC, vec_id ASC LIMIT {K}
"""


@register("knn_exact_filtered", _KNN_FILTERED_SQL)
def q_knn_exact_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-FILTERED vector search (round 6) — the filtered-ANN
    feature every production vector store exposes and the reference
    lacks: restrict the corpus to rows matching a metadata predicate
    (here: the query point's own label) BEFORE scanning, then run the
    standard exact top-k plan. The label equality is a plain pushed
    predicate — it reaches the parquet scan (PushedFilters), and on a
    label-partitioned 100 TB layout it is partition pruning, so
    pre-filtering strictly SHRINKS the scan (post-filtering an ANN
    result, by contrast, degrades recall at high filter selectivity —
    which is why pre-filter is the exact-search default)."""
    emb, qid, base = _query_point(spark, sf_dir)
    row = emb.where(F.col("vec_id") == qid).select("embedding", "label").head()
    qvec, qlabel = row[0], row[1]
    filtered = base.where(F.col("label") == qlabel)
    res = knn.knn_exact_single(filtered, qvec, K)
    # knn_exact_single projects (id, dist); re-attach the label column
    # via the filter constant — no join needed
    return res.select(
        "vec_id",
        F.lit(int(qlabel)).cast("int").alias("label"),
        rnd("dist", ROUND).alias("dist"),
    )


def _query_point(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, int, DataFrame]:
    """(embeddings, qid, base): the reference's query point — query[29]
    past the 95% split cut, clamped to the last query row for tiny SFs
    (src/main.rs:81) — and the base split. The ONE derivation of the
    flagship query point; four keys consume it, so clamp/ratio changes
    happen in one place (plus the SQL cut CTEs)."""
    emb = table(spark, sf_dir, "embeddings")
    n = _emb_count(spark, sf_dir)
    cut = split_count(n, SPLIT_RATIO)
    qid = cut + min(QUERY_OFFSET, n - cut - 1)
    return emb, qid, emb.where(F.col("vec_id") < cut)


def _split(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """(base, queries) prefix split of embeddings with query_id/query_vec
    naming on the query side."""
    emb = table(spark, sf_dir, "embeddings")
    cut = split_count(_emb_count(spark, sf_dir), SPLIT_RATIO)
    base = emb.where(F.col("vec_id") < cut)
    qs = emb.where(F.col("vec_id") >= cut).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    return base, qs


# Shared oracle CTEs: prefix split + per-query top-k under both metrics.
_SPLIT_CTE = f"""
cut AS (SELECT {_split_cut_sql()} AS c),
q AS (SELECT vec_id AS query_id, embedding AS qv
      FROM embeddings, cut WHERE vec_id >= c),
base AS (SELECT vec_id, embedding FROM embeddings, cut WHERE vec_id < c)
"""

_COS_SCORED = f"""
SELECT q.query_id, b.vec_id,
       {V.sql_cosine_distance('b.embedding', 'q.qv')} AS d
FROM base b, q
"""

def _topk_cte(scored: str, k: int = K) -> str:
    return f"""
SELECT query_id, vec_id, d,
       row_number() OVER (PARTITION BY query_id ORDER BY d ASC, vec_id ASC) AS rank
FROM ({scored}) QUALIFY rank <= {k}
"""


@register(
    "knn_exact_batch",
    f"""
    WITH {_SPLIT_CTE},
    ranked AS ({_topk_cte(_COS_SCORED)})
    SELECT query_id, vec_id, round(d, {ROUND}) AS dist, CAST(rank AS INT) AS rank
    FROM ranked
    """,
)
def q_knn_exact_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """E3 batch form: exact top-10 per query over the whole query split.
    Broadcast queries × scan base → window top-k (SURVEY §2.3)."""
    base, qs = _split(spark, sf_dir)
    res = knn.knn_exact_batch(base, qs, K)
    return res.select(
        "query_id", "vec_id", rnd("dist", ROUND).alias("dist"), "rank"
    )


@register(
    "argmin_dist",
    f"""
    WITH {_SPLIT_CTE},
    scored AS ({_COS_SCORED})
    SELECT query_id, vec_id AS nearest_id, round(d, {ROUND}) AS min_dist
    FROM (SELECT query_id, vec_id, d,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY d ASC, vec_id ASC) AS rn
          FROM scored)
    WHERE rn = 1
    """,
)
def q_argmin_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H1 get_nearest_element (src/hnsw.rs:65-76) as a min_by aggregate."""
    base, qs = _split(spark, sf_dir)
    res = knn.argmin_dist(base, qs)
    return res.select(
        "query_id", "nearest_id", rnd("min_dist", ROUND).alias("min_dist")
    )


@register(
    "argmax_dist",
    f"""
    WITH {_SPLIT_CTE},
    scored AS ({_COS_SCORED})
    SELECT query_id, vec_id AS furthest_id, round(d, {ROUND}) AS max_dist
    FROM (SELECT query_id, vec_id, d,
                 row_number() OVER (PARTITION BY query_id
                                    ORDER BY d DESC, vec_id ASC) AS rn
          FROM scored)
    WHERE rn = 1
    """,
)
def q_argmax_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H2 get_furthest_element (src/hnsw.rs:78-89) as a max_by aggregate."""
    base, qs = _split(spark, sf_dir)
    res = knn.argmax_dist(base, qs)
    return res.select(
        "query_id", "furthest_id", rnd("max_dist", ROUND).alias("max_dist")
    )


# ---------------------------------------------------------------------------
# §2.4 HNSW ANN index (H6/H10). Graph construction/search is data-dependent
# pointer chasing — not SQL-expressible, so these are rows-only checks for
# the driver; the REAL correctness gate is the reference's own metric,
# recall@10 ≥ 0.9 vs exact KNN, asserted in tests/test_hnsw.py (the pattern
# at src/main.rs:89-93).
# ---------------------------------------------------------------------------

HNSW_PARTITIONS = 8


@register("hnsw_build")
def q_hnsw_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H6 batch build; output per-layer graph invariants (node/edge counts,
    max out-degree ≤ M_max) — deterministic given hash-seeded levels. Builds
    THROUGH the session index cache, so subsequent searches (knn_hnsw, the
    flagship pipeline) reuse the persisted graph instead of rebuilding —
    build once / search many, the reference's own measurement split
    (src/main.rs:20-22 vs :41-43)."""
    base, _ = _split(spark, sf_dir)
    _, edges = hnsw.cached_index(base, sf_dir, HNSW_PARTITIONS)
    # ``pos`` enumerates each node's adjacency slots from 0, so the per-node
    # out-degree facts fold into ONE map-side-combinable groupBy(layer):
    # every emitting node has exactly one pos=0 row (n_nodes), and the
    # layer's max out-degree is max(pos)+1. The earlier groupBy(layer, src)
    # → groupBy(layer) form paid two shuffle rounds over the full edge list
    # for the same numbers.
    return (
        edges.groupBy("layer")
        .agg(
            F.sum(F.when(F.col("pos") == 0, 1).otherwise(0))
            .cast("long")
            .alias("n_nodes"),
            F.count("*").alias("n_edges"),
            (F.max("pos") + 1).cast("long").alias("max_out_degree"),
        )
        .orderBy("layer")
    )


@register("knn_hnsw")
def q_knn_hnsw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H10 ANN top-10 per query: per-shard beam search over the prebuilt
    (session-cached) graph + global exact rerank. Bit-identical to the fused
    build+search path (tests/test_hnsw.py pins the equality)."""
    base, qs = _split(spark, sf_dir)
    parted, edges = hnsw.cached_index(base, sf_dir, HNSW_PARTITIONS)
    return hnsw.knn_hnsw_prebuilt(parted, edges, qs, K)


RECALL_GATE = 0.9  # reference acceptance metric: src/main.rs:89-93


@register(
    "hnsw_recall_gate",
    f"""
    SELECT CAST({K} AS INT) AS k, CAST({hnsw.EF_SEARCH} AS INT) AS ef,
           TRUE AS passed
    """,
)
def q_hnsw_recall_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL serving configuration's driver row (round 8, verdict r7
    item 3): every other HNSW driver hash uses the exhaustive degenerate
    (ef=|base|), leaving the actual ef=100 beam config gated only by
    local pytest. This key computes the reference's own acceptance
    metric — mean recall@10 of the ef=EF_SEARCH beam search vs exact
    (src/main.rs:89-93) — IN-PLAN and emits the threshold boolean, which
    IS deterministic (hash-seeded levels → deterministic graph →
    deterministic beam → recall a fixed number). The comparison runs in
    INTEGER arithmetic (10·Σhits ≥ 9·k·n_queries, exact since every
    query has exactly k relevant rows) — a float avg's partial-
    aggregation order is partition-dependent, and an ulp flip at the
    threshold is precisely what a gate key can't afford. The oracle
    asserts the gate passes; a beam-search regression now turns a
    driver row red instead of only failing local tests. The whole
    computation is one DataFrame: beam candidates → exact top-k →
    per-query semi-join count → integer sum — no driver-side collect."""
    base, qs = _split(spark, sf_dir)
    parted, edges = hnsw.cached_index(base, sf_dir, HNSW_PARTITIONS)
    ann = hnsw.knn_hnsw_prebuilt(parted, edges, qs, K)
    exact = knn.knn_exact_batch(base, qs, K)
    # query universe from the EXACT side (first arg): a beam regression
    # that emits zero rows for some queries must count them as 0-recall,
    # not drop them from both numerator and denominator (n_common is
    # symmetric, so swapping sides only fixes whose queries define nq)
    inter = evaluation.intersection_count(exact, ann)
    gate_num = int(round(RECALL_GATE * 100))  # 0.9 → 90; ×100 so any
    # two-decimal gate stays exact in integers (×10 would banker's-round
    # 0.85 to 8, silently testing ≥0.80)
    return inter.agg(
        F.sum("n_common").alias("hits"), F.count("*").alias("nq")
    ).select(
        F.lit(K).cast("int").alias("k"),
        F.lit(hnsw.EF_SEARCH).cast("int").alias("ef"),
        (
            F.col("hits") * 100 >= F.lit(gate_num) * K * F.col("nq")
        ).alias("passed"),
    )


@register(
    "knn_hnsw_exhaustive",
    f"""
    WITH {_SPLIT_CTE},
    ranked AS ({_topk_cte(_COS_SCORED)})
    SELECT query_id, vec_id, round(d, {ROUND}) AS dist, CAST(rank AS INT) AS rank
    FROM ranked
    """,
)
def q_knn_hnsw_exhaustive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """H10 in a degenerate configuration that PROVABLY equals exact search
    (round-2 verdict item 5: give the HNSW kernel a driver-hashed row):
    ONE shard and beam width ef = |base| make search_layer exhaustive over
    the connected layer-0 graph, so the kernel's top-k IS the exact top-k
    — the same property test_local_hnsw_exactish_on_small_set pins
    locally. Oracle = knn_exact_batch's SQL. The kernel ranks by numpy
    float64 distances (ulp-close to, but not bit-equal with, the
    sequential-fold form), so the kernel emits a safety margin (emit=4k)
    and the final top-k MEMBERSHIP is decided by the Catalyst re-score
    with the engine's fold expression — a ulp-order swap at the k boundary
    can no longer change the emitted set (round-3 advice). The kernel also
    appends graph-unreachable points when ef >= n, so a pruned-away
    layer-0 component can't silently drop true neighbors. Round 5: runs
    over the session-cached PREBUILT 1-shard graph (bit-identical to the
    fused path, pinned in tests) — rebuilding the graph per invocation
    charged an EF_CONSTRUCTION=200 insert pass per call to what is a
    search-correctness gate."""
    base, qs = _split(spark, sf_dir)
    n_base = base.count()
    parted, edges = hnsw.cached_index(base, f"{sf_dir}#exhaustive", 1)
    # the search's k IS the margin (4K): the global window must keep the
    # full safety margin, not cut to K by kernel numpy ordering — the
    # re-score below makes the only K-cut, by the fold-form distance
    cand = hnsw.knn_hnsw_prebuilt(
        parted, edges, qs, 4 * K, ef=n_base, emit=4 * K
    )
    return _exact_rescore(base, qs, cand)


def _exact_rescore(base: DataFrame, qs: DataFrame, cand: DataFrame) -> DataFrame:
    """Re-score a candidate (query_id, vec_id) set with the engine's
    Catalyst fold-form distance and take the final top-K by it, so kernel
    numpy float64 ordering never decides boundary membership (round-3
    advice; shared by both exhaustive degenerate keys)."""
    qv = qs.select(F.col("query_id").alias("_qid"), "query_vec")
    scored = (
        cand.select("query_id", "vec_id")
        .join(base.select("vec_id", "embedding"), "vec_id")
        .join(F.broadcast(qv), F.col("query_id") == F.col("_qid"))
        .withColumn(
            "dist", V.distance("embedding", "query_vec")
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("dist").asc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= K)
        .select(
            "query_id", "vec_id", rnd("dist", ROUND).alias("dist"), "rank"
        )
    )


@register(
    "knn_hnsw_routed_exhaustive",
    f"""
    WITH {_SPLIT_CTE},
    ranked AS ({_topk_cte(_COS_SCORED)})
    SELECT query_id, vec_id, round(d, {ROUND}) AS dist, CAST(rank AS INT) AS rank
    FROM ranked
    """,
)
def q_knn_hnsw_routed_exhaustive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ROUTED per-cell path in a degenerate configuration that PROVABLY
    equals exact search (round-4 verdict item 5: hnsw_routed_build was the
    last machinery with no driver-hashed row). nprobe = all 16 trained
    cells means every query searches every cell, ef = |base| >= |cell|
    makes each per-cell beam exhaustive (with the unreachable-point guard),
    and the union of exhaustive per-cell top-k's contains the global top-k
    because the cells partition the base set. Exercises the full routed
    build: trained centroids, cell assignment, per-cell prebuilt edge
    lists, cogroup reconstruct + search, centroid routing. Oracle =
    knn_exact_batch's SQL; final membership decided by the Catalyst
    re-score exactly like knn_hnsw_exhaustive."""
    base, qs = _split(spark, sf_dir)
    n_base = base.count()
    cells, edges, cents = hnsw.cached_routed_index(base, sf_dir)
    n_cells = cents.count()
    # search k = the 4K margin so the global window keeps it (see
    # q_knn_hnsw_exhaustive); _exact_rescore makes the only K-cut
    cand = hnsw.knn_hnsw_routed_prebuilt(
        cells, edges, cents, qs, 4 * K,
        nprobe=n_cells, ef=n_base, emit=4 * K,
    )
    return _exact_rescore(base, qs, cand)


@register(
    "tpch_q3_shipping_priority",
    f"""
    SELECT o_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), {_R}) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15'
      AND l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY o_orderkey, o_orderdate
    ORDER BY sum(l_extendedprice * (1 - l_discount)) DESC, o_orderkey ASC
    LIMIT 10
    """,
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter broadcast into the fact join,
    grouped revenue, top-10 (TakeOrderedAndProject after the agg)."""
    from toy_vector_db_spark.operators import relational  # noqa: F401

    cust = table(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    rev = F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(rev.alias("_rev"))
        .orderBy(F.col("_rev").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select(
            "o_orderkey",
            rnd(F.col("_rev"), _R).alias("revenue"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
    )


@register(
    "tpch_q6_forecast_revenue",
    f"""
    SELECT round(sum(l_extendedprice * l_discount), {_R}) AS revenue,
           count(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure pushed-filter scan + global agg — the
    predicate-pushdown showcase (no shuffle but the 1-row agg)."""
    li = table(spark, sf_dir, "lineitem")
    f = li.where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return f.agg(
        rnd(F.sum(F.col("l_extendedprice") * F.col("l_discount")), _R).alias("revenue"),
        F.count("*").alias("n"),
    )


@register(
    "grouping_sets_sales",
    f"""
    SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
           coalesce(l_linestatus, 'ALL') AS l_linestatus,
           round(sum(l_quantity), {_R}) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """,
)
def q_grouping_sets_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (marginals only — neither rollup nor cube)."""
    li = table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("_gs_lineitem")
    return spark.sql(f"""
        SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
               coalesce(l_linestatus, 'ALL') AS l_linestatus,
               floor(sum(l_quantity) * {10**_R} + 0.5) / {10**_R} AS sum_qty
        FROM _gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """)


@register("event_value_tiers",
    f"""
    WITH tiers(tier, lo, hi) AS (
      VALUES ('low', 0.0, 10.0), ('mid', 10.0, 100.0), ('high', 100.0, 1e9)
    )
    SELECT t.tier, count(*) AS n, round(avg(e.value), {_R}) AS avg_value
    FROM events e JOIN tiers t ON e.value >= t.lo AND e.value < t.hi
    GROUP BY t.tier
    """,
)
def q_event_value_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: events matched to value tiers by interval containment.
    The theta-join is DERIVED AWAY before it exists: the interval bounds are
    static, so each row computes its tier key with a per-row CASE and the
    tiers dim joins back as a broadcast HASH join — the bucketized-equi-join
    rewrite that replaces a BroadcastNestedLoopJoin's per-row interval scan
    (row-at-a-time, no codegen) at any scale. Rows outside every interval
    get a null key and drop in the inner join, preserving exact range-join
    semantics (the oracle keeps the explicit interval join)."""
    ev = table(spark, sf_dir, "events")
    tiers = spark.createDataFrame(
        [("low", 0.0, 10.0), ("mid", 10.0, 100.0), ("high", 100.0, 1e9)],
        "tier string, lo double, hi double",
    )
    v = F.col("value")
    tier_key = (
        F.when((v >= 0.0) & (v < 10.0), F.lit("low"))
        .when((v >= 10.0) & (v < 100.0), F.lit("mid"))
        .when((v >= 100.0) & (v < 1e9), F.lit("high"))
    )
    joined = ev.withColumn("tier_key", tier_key).join(
        F.broadcast(tiers), F.col("tier_key") == F.col("tier")
    )
    return joined.groupBy("tier").agg(
        F.count("*").alias("n"), rnd(F.avg("value"), _R).alias("avg_value")
    )


@register(
    "distinct_counts",
    """
    SELECT count(DISTINCT l_partkey) AS n_parts,
           count(DISTINCT l_suppkey) AS n_supps,
           count(DISTINCT l_orderkey) AS n_orders,
           count(*) AS n_rows
    FROM lineitem
    """,
)
def q_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct aggregation (expand+two-phase in Spark). At 100 TB
    swap to approx_count_distinct (HLL) — same operator shape, one pass."""
    li = table(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_partkey").alias("n_parts"),
        F.countDistinct("l_suppkey").alias("n_supps"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.count("*").alias("n_rows"),
    )


@register(
    "orders_above_customer_avg",
    f"""
    SELECT o_orderkey, o_custkey,
           round(o_totalprice, {_R}) AS o_totalprice,
           round(cust_avg, {_R}) AS cust_avg
    FROM (SELECT o_orderkey, o_custkey, o_totalprice,
                 avg(o_totalprice) OVER (PARTITION BY o_custkey) AS cust_avg
          FROM orders)
    WHERE o_totalprice > 1.5 * cust_avg
    """,
)
def q_orders_above_customer_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-subquery pattern decorrelated as a window aggregate —
    one shuffle on the correlation key instead of a per-row subquery."""
    orders = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey")
    return (
        orders.withColumn("cust_avg", F.avg("o_totalprice").over(w))
        .where(F.col("o_totalprice") > 1.5 * F.col("cust_avg"))
        .select(
            "o_orderkey",
            "o_custkey",
            rnd(F.col("o_totalprice"), _R).alias("o_totalprice"),
            rnd(F.col("cust_avg"), _R).alias("cust_avg"),
        )
    )


@register(
    "unpivot_order_counts",
    """
    SELECT o_orderpriority, 'O' AS status, count(CASE WHEN o_orderstatus='O' THEN 1 END) AS n
    FROM orders GROUP BY o_orderpriority
    UNION ALL
    SELECT o_orderpriority, 'F' AS status, count(CASE WHEN o_orderstatus='F' THEN 1 END) AS n
    FROM orders GROUP BY o_orderpriority
    UNION ALL
    SELECT o_orderpriority, 'P' AS status, count(CASE WHEN o_orderstatus='P' THEN 1 END) AS n
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_unpivot_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt) of the pivoted counts via stack() — wide → long."""
    from toy_vector_db_spark.operators import relational

    wide = relational.order_priority_pivot(table(spark, sf_dir, "orders"))
    return wide.select(
        "o_orderpriority",
        F.expr("stack(3, 'O', n_o, 'F', n_f, 'P', n_p) AS (status, n)"),
    )


@register(
    "active_month_intersect",
    """
    SELECT strftime(o_orderdate, '%Y-%m') AS month FROM orders
    WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT strftime(o_orderdate, '%Y-%m') AS month FROM orders
    WHERE o_orderstatus = 'P'
    """,
)
def q_active_month_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT DISTINCT set op: months with both F and P orders."""
    orders = table(spark, sf_dir, "orders")
    month = F.date_format("o_orderdate", "yyyy-MM").alias("month")
    f = orders.where(F.col("o_orderstatus") == "F").select(month)
    p = orders.where(F.col("o_orderstatus") == "P").select(month)
    return f.intersect(p)


_SEMANTIC_SEARCH_SQL = f"""
WITH cut AS (
  SELECT c, least({QUERY_OFFSET}, (SELECT count(*) FROM embeddings) - c - 1) AS off
  FROM (SELECT {_split_cut_sql()} AS c)
),
q AS (SELECT embedding AS qv FROM embeddings, cut WHERE vec_id = c + off),
scored AS (
  SELECT b.vec_id AS vec_id,
         {V.sql_cosine_distance('b.embedding', 'q.qv')} AS d
  FROM embeddings b, q, cut WHERE b.vec_id < c
),
topk AS (
  SELECT vec_id, d, row_number() OVER (ORDER BY d ASC, vec_id ASC) AS rank
  FROM scored ORDER BY d ASC, vec_id ASC LIMIT {K}
)
SELECT t.rank, t.vec_id, round(t.d, {ROUND}) AS dist,
       split_part(doc.text, '.', 1) AS first_sentence
FROM topk t JOIN documents doc ON doc.doc_id = t.vec_id
"""


def _hybrid_rrf_sql() -> str:
    from toy_vector_db_spark.operators.curation import (
        BM25_TERMS,
        HYBRID_DEPTH,
        HYBRID_K,
        RRF_C,
        _bm25_sql_terms,
    )

    dfs, score = _bm25_sql_terms(BM25_TERMS)
    return f"""
    WITH dbase AS (
      SELECT doc_id, string_split(lower(text), ' ') AS toks,
             len(string_split(lower(text), ' ')) AS dl
      FROM documents),
    stats AS (
      SELECT count(*) * 1.0 AS n_docs, avg(dl) AS avgdl,
         {dfs}
      FROM dbase),
    lex AS (
      SELECT doc_id,
             CAST(row_number() OVER (ORDER BY s DESC, doc_id ASC) AS INT)
               AS lex_rank
      FROM (SELECT doc_id, {score} AS s FROM dbase, stats)
      ORDER BY s DESC, doc_id ASC LIMIT {HYBRID_DEPTH}),
    cut AS (
      SELECT c, least({QUERY_OFFSET},
                      (SELECT count(*) FROM embeddings) - c - 1) AS off
      FROM (SELECT {_split_cut_sql()} AS c)),
    q AS (SELECT embedding AS qv FROM embeddings, cut WHERE vec_id = c + off),
    sem AS (
      SELECT vec_id AS doc_id,
             CAST(row_number() OVER (ORDER BY d ASC, vec_id ASC) AS INT)
               AS sem_rank
      FROM (
        SELECT b.vec_id, {V.sql_cosine_distance('b.embedding', 'q.qv')} AS d
        FROM embeddings b, q, cut WHERE b.vec_id < c)
      ORDER BY d ASC, vec_id ASC LIMIT {HYBRID_DEPTH}),
    fused AS (
      SELECT coalesce(l.doc_id, s.doc_id) AS doc_id,
             coalesce(l.lex_rank, 0) AS lex_rank,
             coalesce(s.sem_rank, 0) AS sem_rank,
             coalesce(1.0 / ({RRF_C} + l.lex_rank), 0.0)
               + coalesce(1.0 / ({RRF_C} + s.sem_rank), 0.0) AS r
      FROM lex l FULL OUTER JOIN sem s ON l.doc_id = s.doc_id)
    SELECT doc_id, lex_rank, sem_rank, round(r, {ROUND}) AS rrf
    FROM fused
    ORDER BY r DESC, doc_id ASC LIMIT {HYBRID_K}
    """


@register("hybrid_rrf_topk")
def q_hybrid_rrf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval (round 5): BM25 lexical top-25 and exact-cosine
    vector top-25 (the semantic_search query point) fused by
    reciprocal-rank fusion — rrf = Σ 1/(60 + rank). Ranks are integers,
    so the fused score is engine-exact; each retriever keeps its own
    already-scaled plan and the fusion joins two 25-row frames."""
    from toy_vector_db_spark.operators import curation

    emb, qid, base = _query_point(spark, sf_dir)
    qvec = emb.where(F.col("vec_id") == qid).select("embedding").head()[0]
    return curation.hybrid_rrf_topk(
        table(spark, sf_dir, "documents"), base, qvec
    )


_ORACLES["hybrid_rrf_topk"] = _hybrid_rrf_sql()


def _hybrid_rrf_ivfpq_sql() -> str:
    """Oracle for the ANN-leg hybrid: the BM25 CTEs of _hybrid_rrf_sql
    with the exact-cosine `sem` leg replaced by the FULL knn_ivfpq oracle
    (nested-WITH subquery, k=HYBRID_DEPTH) over a single-query split —
    the two oracles compose exactly like the two operators do."""
    from toy_vector_db_spark import oracles_similarity as O
    from toy_vector_db_spark.operators.curation import (
        BM25_TERMS,
        HYBRID_DEPTH,
        HYBRID_K,
        RRF_C,
        _bm25_sql_terms,
    )
    from toy_vector_db_spark.operators.similarity import N_PROBE

    dfs, score = _bm25_sql_terms(BM25_TERMS)
    single_split = f"""
    cut AS (SELECT c, least({QUERY_OFFSET},
                            (SELECT count(*) FROM embeddings) - c - 1) AS off
            FROM (SELECT {_split_cut_sql()} AS c)),
    q AS (SELECT vec_id AS query_id, embedding AS qv
          FROM embeddings, cut WHERE vec_id = c + off),
    base AS (SELECT vec_id, embedding FROM embeddings, cut WHERE vec_id < c)
    """
    ann = O.knn_ivfpq_sql(
        single_split, HYBRID_DEPTH, N_PROBE, O.rerank_budget_sql(HYBRID_DEPTH)
    )
    return f"""
    WITH dbase AS (
      SELECT doc_id, string_split(lower(text), ' ') AS toks,
             len(string_split(lower(text), ' ')) AS dl
      FROM documents),
    stats AS (
      SELECT count(*) * 1.0 AS n_docs, avg(dl) AS avgdl,
         {dfs}
      FROM dbase),
    lex AS (
      SELECT doc_id,
             CAST(row_number() OVER (ORDER BY s DESC, doc_id ASC) AS INT)
               AS lex_rank
      FROM (SELECT doc_id, {score} AS s FROM dbase, stats)
      ORDER BY s DESC, doc_id ASC LIMIT {HYBRID_DEPTH}),
    sem AS (
      SELECT vec_id AS doc_id, rank AS sem_rank
      FROM ({ann}) ann_leg),
    fused AS (
      SELECT coalesce(l.doc_id, s.doc_id) AS doc_id,
             coalesce(l.lex_rank, 0) AS lex_rank,
             coalesce(s.sem_rank, 0) AS sem_rank,
             coalesce(1.0 / ({RRF_C} + l.lex_rank), 0.0)
               + coalesce(1.0 / ({RRF_C} + s.sem_rank), 0.0) AS r
      FROM lex l FULL OUTER JOIN sem s ON l.doc_id = s.doc_id)
    SELECT doc_id, lex_rank, sem_rank, round(r, {ROUND}) AS rrf
    FROM fused
    ORDER BY r DESC, doc_id ASC LIMIT {HYBRID_K}
    """


@register("hybrid_rrf_ivfpq")
def q_hybrid_rrf_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval with a real ANN leg (round 6): BM25 lexical
    top-25 fused (RRF) with the IVF-PQ index's top-25 for the flagship
    query point — the production RAG shape, retrieval stack composed
    end-to-end. Deterministic ANN ranks keep it fully oracle-able."""
    from toy_vector_db_spark.operators import curation

    emb, qid, base = _query_point(spark, sf_dir)
    q_one = emb.where(F.col("vec_id") == qid).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
    )
    return curation.hybrid_rrf_ivfpq(
        table(spark, sf_dir, "documents"), base, q_one
    )


_ORACLES["hybrid_rrf_ivfpq"] = _hybrid_rrf_ivfpq_sql()


@register("semantic_search", _SEMANTIC_SEARCH_SQL)
def q_semantic_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-user retrieval query: exact top-10 neighbors joined back to the
    documents table for display (first sentence — the reference's result
    formatting, src/main.rs:31-57). The top-k side is 10 rows, so the doc
    join is a broadcast of the RESULT against the documents scan."""
    emb, qid, base = _query_point(spark, sf_dir)
    qvec = emb.where(F.col("vec_id") == qid).select("embedding").head()[0]
    topk = knn.knn_exact_single(base, qvec, K).withColumn(
        "rank",
        F.row_number().over(Window.orderBy(F.col("dist").asc(), F.col("vec_id").asc())),
    )
    docs = table(spark, sf_dir, "documents")
    return (
        F.broadcast(topk)
        .join(docs, topk.vec_id == docs.doc_id)
        .select(
            "rank",
            "vec_id",
            rnd(F.col("dist"), ROUND).alias("dist"),
            TXT.first_sentence(F.col("text")).alias("first_sentence"),
        )
    )


@register(
    "salted_event_type_stats",
    f"""
    SELECT event_type, count(*) AS n,
           round(sum(value), {_R}) AS total_value
    FROM events GROUP BY event_type
    """,
)
def q_salted_event_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation ≡ direct groupBy (the oracle) — the
    explicit hot-key lever."""
    from toy_vector_db_spark.operators import relational

    return relational.salted_event_type_stats(table(spark, sf_dir, "events"))


@register("hnsw_routed_build")
def q_hnsw_routed_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build the IVF-routed per-cell graph THROUGH the session cache (the
    routed twin of hnsw_build) and emit PER-CELL invariants — the
    ivfpq_build pattern on the graph family (round 9, verdict r8 item 3:
    this was the only registered key with no driver CORRECTNESS row in
    r1-r8; its old per-layer output was rows-only by nature). The cell
    structure (centroid_id, n_vectors) is exactly the deterministic
    IVF assignment, which the DuckDB oracle reproduces with the shared
    k-means chain; the graph-side facts reduce to gate booleans that are
    provably TRUE for a correct build — out-degree ≤ M_MAX (LocalHNSW's
    hard cap) and emitting layer-0 nodes ≤ cell members (isolated nodes
    emit no edge rows, so ≤, not =) — and the oracle asserts them, so a
    routing or degree regression turns a driver hash row red."""
    base, _ = _split(spark, sf_dir)
    cells, edges, _cents = hnsw.cached_routed_index(base, sf_dir)
    counts = cells.groupBy(
        F.col("part").cast("bigint").alias("centroid_id")
    ).agg(F.count("*").alias("n_vectors"))
    # per-cell graph facts in ONE map-side-combinable fold over edges
    # (the pos-enumeration trick from q_hnsw_build, per part): max
    # out-degree = max(pos)+1; layer-0 emitting nodes = count of
    # (layer=0, pos=0) rows
    facts = edges.groupBy(
        F.col("part").cast("bigint").alias("centroid_id")
    ).agg(
        (F.max("pos") + 1).alias("max_deg"),
        F.sum(
            F.when((F.col("layer") == 0) & (F.col("pos") == 0), 1)
            .otherwise(0)
        ).alias("l0_nodes"),
    )
    return counts.join(facts, "centroid_id", "left").select(
        "centroid_id",
        "n_vectors",
        (F.coalesce(F.col("max_deg"), F.lit(0)) <= hnsw.M_MAX)
        .alias("degree_ok"),
        (F.coalesce(F.col("l0_nodes"), F.lit(0)) <= F.col("n_vectors"))
        .alias("nodes_ok"),
    )


@register("knn_hnsw_routed")
def q_knn_hnsw_routed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-routed per-cell HNSW (cogroup applyInPandas): the composed 100 TB
    search path — each query touches nprobe cells, graph search within.
    Searches the PREBUILT session-cached per-cell graph (build paid once,
    like hnsw_build/knn_hnsw); bit-identical to the fused build-per-call
    path (tests/test_hnsw_routed.py pins the equality).
    Rows-only; recall gate in tests."""
    base, qs = _split(spark, sf_dir)
    cells, edges, cents = hnsw.cached_routed_index(base, sf_dir)
    return hnsw.knn_hnsw_routed_prebuilt(cells, edges, cents, qs, K)


def flagship_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's full end-to-end pipeline (M3, src/main.rs:61-94):
    prefix-split → build exact + HNSW indexes over the base → search both
    with the reference query point (query[29], k=10) → score HNSW against
    exact with recall@10 / precision@10 (src/evaluation.rs:7-15).
    Returns one row: the pipeline's evaluation summary."""
    configure(spark)
    emb, qid, base = _query_point(spark, sf_dir)
    n = _emb_count(spark, sf_dir)
    cut = split_count(n, SPLIT_RATIO)
    q1 = emb.where(F.col("vec_id") == qid).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    exact = knn.knn_exact_batch(base, q1, K)
    parted, edges = hnsw.cached_index(base, sf_dir, HNSW_PARTITIONS)
    approx = hnsw.knn_hnsw_prebuilt(parted, edges, q1, K)
    rec = evaluation.evaluate_recall(approx, exact)
    prec = evaluation.evaluate_precision(approx, exact)
    return (
        rec.join(prec, "query_id")
        .select(
            "query_id",
            F.lit(int(cut)).alias("n_base"),
            F.lit(int(n - cut)).alias("n_query"),
            F.lit(K).alias("k"),
            "recall",
            "precision",
        )
    )


# ---------------------------------------------------------------------------
# §2.5 evaluation operators (X1-X3): score the euclidean top-k retriever
# against the cosine top-k retriever — two SQL-expressible result sets, so
# the whole evaluation pipeline is oracle-checkable end to end.
# ---------------------------------------------------------------------------

# The evaluation retriever scores euclidean via the polarization identity
# (one dot fold per pair — see _eval_frames); its oracle CTE mirrors that
# exact expression tree. The fold-based sql_euclidean_distance remains the
# V5 parity definition used by vec_euclidean_dist.
_EUC_SCORED_ALG = f"""
SELECT q.query_id, b.vec_id,
       {V.sql_euclidean_from_dot('b.embedding', 'q.qv')} AS d
FROM base b, q
"""

_EVAL_CTE = f"""
WITH {_SPLIT_CTE},
cos_topk AS ({_topk_cte(_COS_SCORED)}),
euc_topk AS ({_topk_cte(_EUC_SCORED_ALG)})
"""


# (appId, sf_dir) → persisted (relevant, retrieved) top-k frames: the two
# retrieval result sets all three evaluation keys score. An evaluation
# pipeline materializes its retrieval runs once and computes every metric
# over them — recomputing the base×queries product per metric key charged
# the same BNLJ three times.
_EVAL_CACHE: dict[tuple, tuple[DataFrame, DataFrame]] = {}


def _eval_frames(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """One cross-join pass scoring BOTH metrics, then BOTH top-k window
    ranks stacked in a single plan over the same query_id exchange: one
    base×queries BNLJ, one shuffle, two sorts. The union-of-topk frame is
    persisted LAZILY and the two metric inputs are cheap filters over it —
    the round-4 form persisted retrieved and relevant separately with eager
    counts, which ran the BNLJ twice (ReuseExchange dedupes subtrees within
    one physical plan, not across jobs) and charged both materializations
    to whichever eval key ran first. Distance expressions are unchanged
    (cosine = knn_exact_batch's cached-magnitude form), so values stay
    bit-identical to the oracle."""
    ck = (spark.sparkContext.applicationId, sf_dir)
    if ck in _EVAL_CACHE:
        return _EVAL_CACHE[ck]
    base, qs = _split(spark, sf_dir)
    from pyspark.sql import Window

    # ONE dot pass per pair, BOTH metrics derived from it — cosine as
    # dot/(|a||b|), euclidean via the polarization identity ||a-b|| =
    # sqrt(|a|² + |b|² − 2·dot) — evaluated in the vectorized pair_scores
    # kernel (round 6; previously an interpreted per-pair Catalyst fold,
    # the hot cost of this BNLJ). The kernel's arithmetic is op-for-op
    # the staged expression tree the oracle CTE mirrors
    # (V.sql_euclidean_from_dot), so hashes stay aligned; the kernel
    # already emits only ids + the two scalars, pruning the wide vectors
    # before the shuffle.
    scored = knn.pair_scores(base, qs, dual_metric=True)
    w_cos = Window.partitionBy("query_id").orderBy(
        F.col("cos_dist").asc(), F.col("vec_id").asc()
    )
    w_euc = Window.partitionBy("query_id").orderBy(
        F.col("euc_dist").asc(), F.col("vec_id").asc()
    )
    both = (
        scored.withColumn("rank_cos", F.row_number().over(w_cos))
        .withColumn("rank_euc", F.row_number().over(w_euc))
        .where((F.col("rank_cos") <= K) | (F.col("rank_euc") <= K))
        .persist()  # lazy: the first eval key's action materializes it once
    )
    relevant = both.where(F.col("rank_cos") <= K).select(
        "query_id",
        "vec_id",
        F.col("cos_dist").alias("dist"),
        F.col("rank_cos").alias("rank"),
    )
    retrieved = both.where(F.col("rank_euc") <= K).select(
        "query_id",
        "vec_id",
        F.col("euc_dist").alias("dist"),
        F.col("rank_euc").alias("rank"),
    )
    _EVAL_CACHE[ck] = (retrieved, relevant)
    return retrieved, relevant


@register(
    "result_intersection",
    f"""
    {_EVAL_CTE}
    SELECT e.query_id AS query_id, count(c.vec_id) AS n_common
    FROM euc_topk e
    LEFT JOIN cos_topk c ON c.query_id = e.query_id AND c.vec_id = e.vec_id
    GROUP BY e.query_id
    """,
)
def q_result_intersection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 |A ∩ B| per query (src/evaluation.rs:3-5) as a hash semi-join."""
    retrieved, relevant = _eval_frames(spark, sf_dir)
    return evaluation.intersection_count(retrieved, relevant)


@register(
    "eval_recall",
    f"""
    {_EVAL_CTE},
    inter AS (
      SELECT e.query_id, count(c.vec_id) AS n_common
      FROM euc_topk e
      LEFT JOIN cos_topk c ON c.query_id = e.query_id AND c.vec_id = e.vec_id
      GROUP BY e.query_id
    ),
    rel_n AS (SELECT query_id, count(*) AS n_rel FROM cos_topk GROUP BY query_id)
    SELECT i.query_id AS query_id,
           round(i.n_common / r.n_rel, {ROUND}) AS recall
    FROM inter i JOIN rel_n r ON i.query_id = r.query_id
    """,
)
def q_eval_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 recall@10 of the euclidean retriever vs the cosine oracle
    (src/evaluation.rs:7-10)."""
    retrieved, relevant = _eval_frames(spark, sf_dir)
    return evaluation.evaluate_recall(retrieved, relevant)


@register(
    "eval_precision",
    f"""
    {_EVAL_CTE},
    inter AS (
      SELECT e.query_id, count(c.vec_id) AS n_common
      FROM euc_topk e
      LEFT JOIN cos_topk c ON c.query_id = e.query_id AND c.vec_id = e.vec_id
      GROUP BY e.query_id
    ),
    ret_n AS (SELECT query_id, count(*) AS n_ret FROM euc_topk GROUP BY query_id)
    SELECT i.query_id AS query_id,
           round(i.n_common / r.n_ret, {ROUND}) AS precision
    FROM inter i JOIN ret_n r ON i.query_id = r.query_id
    """,
)
def q_eval_precision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X3 precision@10 (src/evaluation.rs:12-15)."""
    retrieved, relevant = _eval_frames(spark, sf_dir)
    return evaluation.evaluate_precision(retrieved, relevant)


# ---------------------------------------------------------------------------
# §2.1 scans, split, result formatting (S1-S3)
# ---------------------------------------------------------------------------

@register(
    "scan_ndjson",
    f"""
    SELECT body, len("text-embedding-ada-002") AS dim
    FROM read_json('{SCAN_FIXTURE_PATH}', format='newline_delimited',
                   columns={{'body': 'VARCHAR',
                            'text-embedding-ada-002': 'FLOAT[]'}},
                   ignore_errors=true)
    WHERE body IS NOT NULL AND "text-embedding-ada-002" IS NOT NULL
      -- duckdb coerces mistyped elements to NULL instead of erroring the
      -- line; serde (and Spark PERMISSIVE) drop the whole row
      AND len(list_filter("text-embedding-ada-002", x -> x IS NULL)) = 0
    """,
)
def q_scan_ndjson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1 NDJSON scan with silent malformed-line drop (src/dataset.rs:8-17).
    Output body + vector dimension (ints hash stably across engines)."""
    df = read_ndjson(spark, SCAN_FIXTURE_PATH)
    return df.select("body", F.size("embedding").alias("dim"))


@register(
    "split_dataset",
    f"""
    WITH cut AS (SELECT {_split_cut_sql()} AS c)
    SELECT vec_id,
           CASE WHEN vec_id < c THEN 'base' ELSE 'query' END AS part
    FROM embeddings, cut
    """,
)
def q_split_dataset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 deterministic prefix split at round(n*0.95) (src/dataset.rs:19-23)."""
    emb = table(spark, sf_dir, "embeddings")
    cut = split_count(_emb_count(spark, sf_dir), SPLIT_RATIO)
    return emb.select(
        "vec_id",
        F.when(F.col("vec_id") < cut, "base").otherwise("query").alias("part"),
    )


# ---------------------------------------------------------------------------
# Deduplication suite (training-data-pipeline extensions; operators/dedup.py)
# ---------------------------------------------------------------------------


@register("dedup_exact")
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by text hash over the dup-injected corpus: 50 groups of
    2 copies, rest singletons; keeper = min id."""
    from toy_vector_db_spark.operators import dedup

    corpus = dedup.with_injected_dups(
        table(spark, sf_dir, "documents"), perturb=False
    )
    return dedup.dedup_exact(corpus)


@register("dedup_minhash_lsh")
def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16) → 8×2 banded LSH candidates → exact Jaccard ≥ 0.4.
    Must recover the injected near-dup twins. Built through the session
    pair cache, which dup_clusters reuses (the pair graph is the dedup
    pipeline's shared build artifact)."""
    from toy_vector_db_spark.operators import dedup

    corpus = dedup.with_injected_dups(table(spark, sf_dir, "documents"))
    return dedup.cached_minhash_pairs(corpus)


@register("dup_clusters")
def q_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs resolved into clusters (iterative connected
    components) with one keeper per cluster — the keep/drop decision of a
    dedup pipeline. Oracle = recursive-CTE transitive closure."""
    from toy_vector_db_spark.operators import dedup

    corpus = dedup.with_injected_dups(table(spark, sf_dir, "documents"))
    return dedup.dup_clusters(corpus)


@register("simhash_signatures")
def q_simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc 32-bit SimHash (token-hash bit voting)."""
    from toy_vector_db_spark.operators import dedup

    return dedup.simhash_signatures(
        table(spark, sf_dir, "documents").select("doc_id", "text")
    )


@register("simhash_near_pairs")
def q_simhash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (byte-band candidates, hamming ≤ 6) over the
    dup-injected corpus."""
    from toy_vector_db_spark.operators import dedup

    corpus = dedup.with_injected_dups(table(spark, sf_dir, "documents"))
    return dedup.simhash_near_pairs(corpus)


@register("ngram_jaccard_topk")
def q_ngram_jaccard_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 most-similar doc pairs by exact char-4-gram Jaccard, blocked
    by source."""
    from toy_vector_db_spark.operators import dedup

    return dedup.ngram_jaccard_topk(table(spark, sf_dir, "documents"))


@register("embedding_near_dups")
def q_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 most-similar embedding pairs (clamped cosine) within label
    blocks."""
    from toy_vector_db_spark.operators import dedup

    return dedup.embedding_near_dups(table(spark, sf_dir, "embeddings"))


@register("embedding_near_dups_lsh")
def q_embedding_near_dups_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale variant: pair candidates blocked by the random-hyperplane LSH
    bucket (data-independent quantizer) instead of the supervised label."""
    from toy_vector_db_spark.operators import dedup

    return dedup.embedding_near_dups_lsh(table(spark, sf_dir, "embeddings"))


@register("span_dedup_scrub")
def q_span_dedup_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style corpus-level exact span dedup (round 5): every 3-word
    span appearing more than once in the corpus is kept only at its
    first occurrence (doc_id, position order) and documents are
    reassembled from the surviving spans — the sub-document granularity
    the doc-level dedup family can't reach. Map-side-combinable
    first-occurrence aggregate makes the boilerplate hot-key case scale
    (see operators/dedup.py:span_dedup_scrub)."""
    from toy_vector_db_spark.operators import dedup

    return dedup.span_dedup_scrub(table(spark, sf_dir, "documents"))


@register("semdedup_prune")
def q_semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (round 10; Abbas et al. 2023, arXiv:2303.09540) —
    semantic dedup for training corpora: cluster the embedding space
    with the trained coarse quantizer (the SAME deterministic k-means
    the IVF family serves from), pairwise cosine WITHIN clusters only,
    keep the most-atypical member of each epsilon-ball (order-free keep
    rule: pruned iff a same-cluster near-dup sits farther from the
    centroid, unrounded distances, id tiebreak). Emits the survivor set
    with cell + rounded centroid distance — fully DuckDB-oracled via
    the kmeans_chain CTEs. Pure Catalyst: broadcast 16-row centroids,
    map-side argmin, ONE shuffle on the cluster key for the self-join;
    pair volume is Σ|cell|², the quantity cluster count controls at
    100 TB (the paper's own scale design)."""
    from toy_vector_db_spark.operators import dedup, similarity

    emb = table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cents = similarity.cached_trained_centroids(emb)
    return dedup.semdedup_prune(emb, cents)


def _register_dedup_oracles() -> None:
    from toy_vector_db_spark import oracles_dedup as O
    from toy_vector_db_spark.operators.dedup import span_dedup_sql

    _ORACLES["semdedup_prune"] = O.semdedup_sql()
    _ORACLES["span_dedup_scrub"] = span_dedup_sql()
    _ORACLES["dedup_exact"] = O.dedup_exact_sql()
    _ORACLES["dedup_minhash_lsh"] = O.minhash_lsh_sql()
    _ORACLES["dup_clusters"] = O.dup_clusters_sql()
    _ORACLES["simhash_signatures"] = O.simhash_signatures_sql()
    _ORACLES["simhash_near_pairs"] = O.simhash_pairs_sql()
    _ORACLES["ngram_jaccard_topk"] = O.ngram_jaccard_sql()
    _ORACLES["embedding_near_dups"] = O.embedding_near_dup_sql()
    _ORACLES["embedding_near_dups_lsh"] = O.embedding_near_dup_lsh_sql()


_register_dedup_oracles()


# ---------------------------------------------------------------------------
# Similarity search (IVF / LSH scale paths; operators/similarity.py) and
# text analysis (operators/textstats.py)
# ---------------------------------------------------------------------------


@register("ivf_train")
def q_ivf_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the IVF coarse quantizer: deterministic Lloyd's k-means
    (3 iterations, first-K init, sequential id-ordered mean folds), emitted
    as (centroid_id, dim, val) scalar rows so the driver hash proves both
    engines train bit-identical floats. Runs THROUGH the session cache —
    bench times training once here, search keys reuse it (the same
    build/search split as hnsw_build, reference src/main.rs:18-23)."""
    from toy_vector_db_spark.operators import similarity

    base, _ = _split(spark, sf_dir)
    cents = similarity.cached_trained_centroids(base)
    # the IVF build is train + assign + the serving-side cell-partitioned
    # base table: warm both session caches here so the BUILD key pays for
    # them (bench build/search split), not the first search key to touch
    # them (cached_cell_vectors builds on cached_trained_assign)
    similarity.cached_cell_vectors(base)
    return cents.select(
        "centroid_id",
        F.posexplode("centroid_vec").alias("dim", "val"),
    )


@register("ivf_assign")
def q_ivf_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse quantization: nearest-centroid assignment for every base
    vector (broadcast TRAINED centroids, min-of-struct argmin)."""
    from toy_vector_db_spark.operators import similarity

    base, _ = _split(spark, sf_dir)
    cents = similarity.cached_trained_centroids(base)
    return similarity.ivf_assign(base, cents)


@register("knn_ivf")
def q_knn_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN search: probe N_PROBE of 16 cells per query, exact top-10
    within probed cells. Trained-quantizer cells; deterministic → fully
    oracle-checkable."""
    from toy_vector_db_spark.operators import similarity

    base, qs = _split(spark, sf_dir)
    cents = similarity.cached_trained_centroids(base)
    return similarity.knn_ivf(
        base, qs, K, cents=cents,
        cell_vectors=similarity.cached_cell_vectors(base),
    )


@register("pq_train")
def q_pq_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the per-subspace PQ codebooks (deterministic Lloyd's over
    normalized-vector slices, squared-euclidean metric), emitted as
    (m, k, dim, val) scalar rows — the PQ twin of ivf_train. Session-
    cached; pq_codes / ADC / rerank reuse the trained books."""
    from toy_vector_db_spark.operators import similarity

    base, _ = _split(spark, sf_dir)
    books = similarity.trained_pq_codebooks(base)
    rows = [
        (m, k, dim, float(val))
        for m, book in enumerate(books)
        for k, vec in enumerate(book)
        for dim, val in enumerate(vec)
    ]
    return spark.createDataFrame(
        rows, "m int, k int, dim int, val double"
    )


@register("pq_codes")
def q_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization codes over the base split: 64 floats → 8
    sub-codeword ids (48 bits — a 10.7× compressed scan); per-row
    TRAINED-codebook argmin."""
    from toy_vector_db_spark.operators import similarity

    base, _ = _split(spark, sf_dir)
    codes = similarity.pq_codes(base)
    # an IVF-PQ index build writes the codes PARTITIONED BY cell: warm the
    # session-cached codes⋈assign frame here so the BUILD key pays for it,
    # not the first knn_ivfpq search (bench build/search split)
    similarity.cached_codes_cells(base)
    return codes


@register("knn_pq_adc")
def q_knn_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ asymmetric-distance top-10 per query — the compressed-corpus ANN
    scan (codes + literal codebook; queries broadcast; one top-k shuffle)."""
    from toy_vector_db_spark.operators import similarity

    base, qs = _split(spark, sf_dir)
    return similarity.knn_pq_adc(base, qs, K)


@register("knn_pq_rerank")
def q_knn_pq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ serving pipeline: ADC prune to the scale-aware budget R =
    max(16k, ⌈n_base/10⌉) candidates, exact cosine re-rank of the
    survivors — full-precision vectors touched for R rows per query
    instead of the whole corpus."""
    from toy_vector_db_spark.operators import similarity

    base, qs = _split(spark, sf_dir)
    return similarity.knn_pq_rerank(base, qs, K)


@register("ivfpq_build")
def q_ivfpq_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ index build (round-5 bench hygiene): populate the session-
    cached cell-keyed compressed corpus — PQ codes joined to trained IVF
    cell assignments, the artifact a 100 TB build job writes partitioned
    by centroid_id — and emit its per-cell invariants (row count,
    per-subspace code sums) as a driver-hashable table. Benched as a
    build key so knn_ivfpq's number stops absorbing cache population."""
    from toy_vector_db_spark.operators import similarity

    base, _qs = _split(spark, sf_dir)
    cc = similarity.cached_codes_cells(base)
    # the on-disk partitioned artifact is part of the BUILD: write it here
    # so ivfpq_partitioned_search's first run measures search, not the
    # one-time parquet write (the same cache-population hygiene this key
    # exists for)
    similarity.written_codes_cells(base)
    return cc.groupBy("centroid_id").agg(
        F.count("*").alias("n_vectors"),
        *[
            F.sum(f"c{m}").alias(f"sum_c{m}")
            for m in range(similarity.PQ_M)
        ],
    )


@register("ivfpq_partitioned_search")
def q_ivfpq_partitioned_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """knn_ivfpq against the index artifact ON DISK (round 5): the codes
    table written as parquet partitioned by centroid_id, with the probe
    set pruning the scan so it physically skips unprobed cell
    directories — THE mechanism the 100 TB serving story rests on
    (storage-layout pruning, not an in-memory cache). Round 10: with a
    bounded query batch the probe set is collected before planning (the
    _pq_pair_adc routing), so the pruning is STATIC PartitionFilters —
    earlier than the dynamic pruning the probe-join plan produced at
    runtime, which the oversized-batch path retains. Same oracle as
    knn_ivfpq: identical results, only the physical source differs.
    Pruning presence is asserted on the executed plan in
    tests/test_similarity.py."""
    from toy_vector_db_spark.operators import similarity

    base, qs = _split(spark, sf_dir)
    written = similarity.written_codes_cells(base)
    return similarity.knn_ivfpq(base, qs, K, codes_cells=written)


UPSERT_RATIO = 0.75  # initial-corpus fraction for the upsert keys

CHUNKS_PER_DOC = 8  # chunk-group size for the pooling key


@register(
    "doc_embedding_pool",
    f"""
    WITH src AS (
      SELECT vec_id // {CHUNKS_PER_DOC} AS doc_id, vec_id,
             unnest(embedding::DOUBLE[]) AS val,
             unnest(range(0, len(embedding))) AS dim
      FROM embeddings)
    SELECT doc_id, CAST(dim AS INT) AS dim,
           list_reduce(list_prepend(0.0, list(val ORDER BY vec_id)),
                       (a, x) -> a + x) / count(*) AS val
    FROM src GROUP BY doc_id, dim
    """,
)
def q_doc_embedding_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk→document embedding pooling (round 6): groups of
    CHUNKS_PER_DOC consecutive vectors mean-pool elementwise into one
    document-level embedding — the aggregation step of every
    chunked-RAG / long-document pipeline (embed chunks, pool to a doc
    vector). Emitted as exploded (doc_id, dim, val) scalar rows (the
    ivf_train idiom — scalar rows drive the driver hash robustly).

    Determinism across engines: a plain AVG would sum doubles in
    partial-aggregation order; instead each (doc, dim) group collects
    its ≤CHUNKS_PER_DOC values WITH their chunk ids (collect_list
    partials merge map-side in any order), restores chunk order with
    array_sort, and folds sequentially — bit-identical to the DuckDB
    list_reduce over list(val ORDER BY vec_id), the same proven recipe
    as the k-means mean folds. Two map-side-combinable aggregates, no
    window; the explode fans each vector into dim rows but every
    downstream row is 3 scalars."""
    emb = table(spark, sf_dir, "embeddings")
    src = emb.select(
        F.expr(f"vec_id div {CHUNKS_PER_DOC}").alias("doc_id"),
        "vec_id",
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "dim", "val"
        ),
    )
    return (
        src.groupBy("doc_id", "dim")
        .agg(
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("vec_id", "val"))),
                    lambda s: s["val"],
                ),
                F.lit(0.0),
                lambda a, x: a + x,
            ).alias("s"),
            F.count("*").alias("nc"),
        )
        .select(
            "doc_id",
            F.col("dim").cast("int").alias("dim"),
            (F.col("s") / F.col("nc")).alias("val"),
        )
    )


@register("ivfpq_upsert_search")
def q_ivfpq_upsert_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ search over an INCREMENTALLY-INGESTED index (round 6): the
    quantizers train on the first 75% of the base and freeze; the last
    25% arrives as a micro-batch that is only assigned + encoded and
    unioned onto the existing cell-keyed artifact (appended partition
    files at 100 TB — nothing retrained or rewritten). Search runs the
    standard knn_ivfpq plan over the upserted index with the frozen
    quantizer triple. Fully deterministic → the oracle is knn_ivfpq's
    SQL with quantizer training bounded to the initial slice."""
    from toy_vector_db_spark.operators import similarity

    base, qs = _split(spark, sf_dir)
    n = _emb_count(spark, sf_dir)
    cut = split_count(n, SPLIT_RATIO)
    init_cut = split_count(cut, UPSERT_RATIO)
    initial = base.where(F.col("vec_id") < init_cut)
    batch = base.where(F.col("vec_id") >= init_cut)
    cc, cents, books = similarity.ivfpq_upsert(initial, batch)
    return similarity.knn_ivfpq(
        base, qs, K, codes_cells=cc, cents=cents, books=books
    )


DELETE_MOD = 17  # tombstone set for the delete key: vec_id % 17 == 0


@register("ivfpq_delete_search")
def q_ivfpq_delete_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELETE from the vector index via tombstones (round 6) — the third
    CRUD leg next to build and upsert, and how every production IVF
    store deletes (Faiss IDSelector / tombstone bitmaps): the deleted
    ids (here the deterministic set vec_id % 17 == 0) are anti-joined
    out of the cell-keyed codes BEFORE scoring, so deleted rows never
    produce candidates and their former neighbors are back-filled by the
    next-nearest survivors — no re-encode, no re-partition; a compaction
    rewrite is a separate offline operation. At 100 TB the tombstone
    set is a broadcast anti-join (or a bitmap pushed into the scan).
    The oracle applies the same exclusion predicate in the candidate
    CTE."""
    from toy_vector_db_spark.operators import similarity

    base, qs = _split(spark, sf_dir)
    cc = similarity.cached_codes_cells(base)
    tombstones = base.select("vec_id").where(
        F.col("vec_id") % DELETE_MOD == 0
    )
    live = cc.join(F.broadcast(tombstones), "vec_id", "left_anti")
    return similarity.knn_ivfpq(base, qs, K, codes_cells=live)


@register("ivfpq_compact_search")
def q_ivfpq_compact_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMPACTION after tombstone deletes (round 6): the live (un-deleted)
    codes are REWRITTEN to a fresh cell-partitioned parquet artifact and
    the tombstone set is retired — the offline maintenance job that keeps
    the anti-join/bitmap cost from accumulating forever. Search over the
    compacted on-disk index must equal tombstone search over the old
    artifact exactly, so this key shares ivfpq_delete_search's oracle.
    Created in round 6 as a window-overflow key; rotated into the driver
    window in round 7 (verdict r6 item 2)."""
    import hashlib
    import os

    from toy_vector_db_spark.operators import similarity
    from toy_vector_db_spark.sources.fixtures import FIXTURE_DIR

    base, qs = _split(spark, sf_dir)
    cc = similarity.cached_codes_cells(base)
    tombstones = base.select("vec_id").where(
        F.col("vec_id") % DELETE_MOD == 0
    )
    live = cc.join(F.broadcast(tombstones), "vec_id", "left_anti")
    # content-keyed path (the written_codes_cells idiom): identical
    # inputs overwrite with identical bytes instead of accumulating dirs.
    # The quantizer knobs are PART of the content key (round-8 fix:
    # unlike _WRITTEN_INDEX_CACHE, whose session-level cache rewrites on
    # every new appId, this marker-gated write PERSISTS across sessions
    # — a knob change like PQ_K 64→256 would otherwise silently serve
    # the stale artifact while the oracle computes with the new knobs)
    tag = hashlib.md5(
        repr((
            base.semanticHash(), DELETE_MOD,
            similarity.PQ_M, similarity.PQ_K, similarity.N_CENTROIDS,
            similarity.KMEANS_ITERS, similarity.TRAIN_SAMPLE,
        )).encode()
    ).hexdigest()[:12]
    path = os.path.join(FIXTURE_DIR, "sink_out", "ivfpq_compacted", tag)
    marker = os.path.join(path, "_SUCCESS")
    if not os.path.exists(marker):
        live.write.mode("overwrite").partitionBy("centroid_id").parquet(path)
    compacted = spark.read.parquet(path)
    return similarity.knn_ivfpq(base, qs, K, codes_cells=compacted)


@register("bq_codes")
def q_bq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-bit binary quantization codes over the base split: 64 float
    dims → 64 bits as two BIGINT halves — the training-free third index
    family (next to HNSW and trained PQ); the 'build' is a pure per-row
    expression. Created in round 6 as a window-overflow key; rotated into
    the driver window in round 7."""
    from toy_vector_db_spark.operators import similarity

    base, _ = _split(spark, sf_dir)
    return similarity.bq_codes(base)


@register("knn_bq_rerank")
def q_knn_bq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BQ serving pipeline: Hamming prune over the 8-byte sign-bit codes
    (bit_count(xor)) to BQ's deeper rerank floor (round 8: R ≥ 32k —
    2× the shared floor, affordable because the BQ scan is 8 B/vector;
    0.854 recall@10 at sf0.1 at constant cost vs 0.699 at the shared
    floor), exact cosine rerank. Recall is bought entirely by the rerank
    since raw sign-bit Hamming alone ranks poorly on uncentered data.
    Created in round 6 as a window-overflow key; rotated into the driver
    window in round 7; oracle mirrors the deeper floor via
    bq_rerank_budget_sql."""
    from toy_vector_db_spark.operators import similarity

    base, qs = _split(spark, sf_dir)
    return similarity.knn_bq_rerank(base, qs, K)


@register("knn_bq_filtered")
def q_knn_bq_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED ANN on the third family (round 8): label equality
    applied BEFORE the Hamming top-R cut, so BQ's deeper rerank budget
    lands entirely on qualifying rows — the IDSelector contract now
    holds on ALL THREE index families (IVF-PQ: histogram-guided probes
    + row filter; HNSW: label-partitioned graphs; BQ: row filter on the
    full-corpus 8 B/vector scan — no probe widening needed because
    there are no cells to miss). Oracle = the same filtered prune in
    SQL via knn_bq_rerank_sql's cand hooks."""
    from toy_vector_db_spark.operators import similarity

    emb = table(spark, sf_dir, "embeddings")
    cut = split_count(_emb_count(spark, sf_dir), SPLIT_RATIO)
    base = emb.where(F.col("vec_id") < cut)
    qs = emb.where(F.col("vec_id") >= cut).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
        F.col("label"),
    )
    return similarity.knn_bq_rerank(
        base.select("vec_id", "embedding"),
        qs.select("query_id", "query_vec"),
        K,
        labels=base.select("vec_id", "label"),
        query_labels=qs.select(
            "query_id", F.col("label").alias("qlabel")
        ),
    )


@register("bq2_codes")
def q_bq2_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-bit sign+magnitude binary quantization codes (round 9, verdict
    r8 item 8): per dim, a sign bit plus an |nv| > mx_d/2 magnitude bit
    — 16 B/vector, the measured recall-at-cost winner over 1-bit BQ
    (scripts/bq2_study.py: candidate recall 0.989 vs 0.699 at the shared
    R=160). Exploded (id, dim, code) scalar rows for driver hashing;
    bounds are exact max selections, so cross-engine parity is by
    construction (the sq_train argument)."""
    from toy_vector_db_spark.operators import similarity

    base, _ = _split(spark, sf_dir)
    return similarity.bq2_codes(base)


@register("knn_bq2_rerank")
def q_knn_bq2_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BQ2 serving pipeline (round 9): clamped-cosine candidate ranking
    against the 2-bit reconstructions via the exact pair kernel, top-R
    cut at the SHARED scale-aware budget (no BQ_RERANK_MULT deepening —
    the measured point of the 2-bit code: 1-bit needed 2× the rerank to
    clear the 0.70 floor; 2-bit clears 0.85+ at the shared floor), exact
    cosine rerank. Shipped as an option NEXT TO 1-bit BQ, which remains
    the minimal-footprint path."""
    from toy_vector_db_spark.operators import similarity

    base, qs = _split(spark, sf_dir)
    return similarity.knn_bq2_rerank(base, qs, K)


@register("knn_ivfbq2")
def q_knn_ivfbq2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-BQ2 (round 9 — the composition matrix's FOURTH column,
    IVF×{PQ, SQ, BQ, BQ2} over the ONE shared trained coarse
    quantizer): coarse probe gates the 2-bit reconstruction-cosine
    prune at the SHARED rerank budget (BQ2 needs no BQ-style deepening
    — scripts/bq2_study.py), exact rerank. 16 B/vector probed bytes —
    2× BQ's with near-SQ ranking quality. Candidates scored by the
    exact pair kernel routed per probed cell; DuckDB-oracled end to
    end."""
    from toy_vector_db_spark.operators import similarity

    base, qs = _split(spark, sf_dir)
    return similarity.knn_ivfbq2(base, qs, K)


@register("knn_ivfbq2_filtered")
def q_knn_ivfbq2_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED IVF-BQ2 (round 9): the knn_ivfpq_filtered machinery —
    label equality BEFORE the top-R cut (IDSelector) plus
    histogram-guided probe selection — over the 2-bit fine code. The
    SAME build-time histogram serves all four compositions: filtered
    search is a property of the shared partitioner, not the fine
    quantizer."""
    from toy_vector_db_spark.operators import similarity

    emb = table(spark, sf_dir, "embeddings")
    cut = split_count(_emb_count(spark, sf_dir), SPLIT_RATIO)
    base = emb.where(F.col("vec_id") < cut)
    qs = emb.where(F.col("vec_id") >= cut).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
        F.col("label"),
    )
    bvec = base.select("vec_id", "embedding")
    labels = base.select("vec_id", "label")
    return similarity.knn_ivfbq2(
        bvec,
        qs.select("query_id", "query_vec"),
        K,
        labels=labels,
        query_labels=qs.select(
            "query_id", F.col("label").alias("qlabel")
        ),
        label_hist=similarity.cached_label_cell_hist(bvec, labels),
    )


@register("bq2_upsert_search")
def q_bq2_upsert_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BQ2 search over an INCREMENTALLY-INGESTED index (round 9 — the
    lifecycle leg every other quantizer family carries): the per-dim
    |nv| max bounds freeze on the first 75% of the base; the last 25%
    arrives as a micro-batch that is only encoded against the broadcast
    bounds row and appended (similarity.bq2_upsert). Oracle:
    knn_bq2_rerank's SQL with the max scan bounded to the initial slice
    — valid because frozen-bounds append is a per-row expression,
    provably row-identical to a full re-encode."""
    from toy_vector_db_spark.operators import similarity

    base, qs = _split(spark, sf_dir)
    n = _emb_count(spark, sf_dir)
    cut = split_count(n, SPLIT_RATIO)
    init_cut = split_count(cut, UPSERT_RATIO)
    initial = base.where(F.col("vec_id") < init_cut)
    batch = base.where(F.col("vec_id") >= init_cut)
    codes, bounds = similarity.bq2_upsert(initial, batch)
    return similarity.knn_bq2_rerank(
        base, qs, K, bounds=bounds, codes=codes
    )


@register("bq2_delete_search")
def q_bq2_delete_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELETE from the BQ2 index via tombstones (round 9): the shared
    deterministic set vec_id % 17 == 0 anti-joins out of the code rows
    BEFORE the reconstruction-cosine scan — bounds not retrained,
    neighbors back-fill from next-nearest survivors (the sq_delete
    contract; compaction is definitionally identical for a per-row
    encode, proven for SQ in tests). Oracle: knn_bq2_rerank's SQL with
    the exclusion in the candidate CTE."""
    from toy_vector_db_spark.operators import similarity

    base, qs = _split(spark, sf_dir)
    bounds = similarity.cached_bq2_bounds(base)
    codes = similarity.bq2_code_array(base, bounds)
    tombstones = base.select("vec_id").where(
        F.col("vec_id") % DELETE_MOD == 0
    )
    live = codes.join(F.broadcast(tombstones), "vec_id", "left_anti")
    return similarity.knn_bq2_rerank(
        base, qs, K, bounds=bounds, codes=live
    )


@register("sq_train")
def q_sq_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 'training' (round 8, fourth index family): per-dimension
    min/max of the normalized base split, exploded to (dim, mn, mx)
    scalar rows for driver hashing (the pq_train idiom). The engine
    side is ONE map-side-combined agg pass — no explode (64× row
    blowup at 100 TB); the oracle unnests, which is fine at fixture
    scale. Bounds are exact selections, so cross-engine parity is by
    construction, stronger than the trained families' k-means parity."""
    from toy_vector_db_spark.operators import similarity

    base, _ = _split(spark, sf_dir)
    return similarity.sq_train(base)


@register("sq_codes")
def q_sq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 codes over the base split, exploded to (vec_id, dim, code)
    scalar rows: each normalized vector quantized per-dimension to
    0..255 against the broadcast bounds row — 64 B/vector on disk, an
    8× compressed scan with NO codebook training (the family between
    BQ's 8 B/weak ranking and PQ's 8 B/trained). Encode is a pure
    Catalyst expression: zero shuffle, zero Python."""
    from toy_vector_db_spark.operators import similarity

    base, _ = _split(spark, sf_dir)
    return similarity.sq_codes(base)


@register("knn_sq_rerank")
def q_knn_sq_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 serving pipeline (round 8): dequantized-midpoint ADC
    (squared euclidean on the normalized side ≡ cosine ranking) prunes
    to the SHARED scale-aware rerank floor — no BQ-style deepened
    budget needed because 8-bit-per-dim ADC ranks well — then exact
    cosine rerank. Measured recall@10 ≈ 1.0 at fixture scale and 0.999
    at sf0.1 under the capped budget (SCALE.md); the fourth index
    family's driver row."""
    from toy_vector_db_spark.operators import similarity

    base, qs = _split(spark, sf_dir)
    return similarity.knn_sq_rerank(base, qs, K)


@register("knn_sq_filtered")
def q_knn_sq_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED ANN on the fourth family: label equality applied BEFORE
    the ADC top-R cut (the IDSelector contract, same hook shape as
    knn_bq_filtered — scan-everything family, so no probe widening
    exists to need). With this, ALL FOUR index families serve filtered
    search: IVF-PQ (histogram-guided probes), HNSW (label-partitioned
    graphs), BQ and SQ (pre-cut row filters)."""
    from toy_vector_db_spark.operators import similarity

    emb = table(spark, sf_dir, "embeddings")
    cut = split_count(_emb_count(spark, sf_dir), SPLIT_RATIO)
    base = emb.where(F.col("vec_id") < cut)
    qs = emb.where(F.col("vec_id") >= cut).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
        F.col("label"),
    )
    return similarity.knn_sq_rerank(
        base.select("vec_id", "embedding"),
        qs.select("query_id", "query_vec"),
        K,
        labels=base.select("vec_id", "label"),
        query_labels=qs.select(
            "query_id", F.col("label").alias("qlabel")
        ),
    )


@register("knn_ivfsq")
def q_knn_ivfsq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-SQ (round 8 — the Faiss IndexIVFScalarQuantizer / IVF_SQ8
    shape): the same trained coarse quantizer as knn_ivfpq gates the
    SQ8 compressed scan — probe nprobe of 16 cells, dequantized-ADC
    only within probed cells (kernel-routed), exact rerank of the R
    survivors. Completes the quantizer composition matrix: IVF×PQ and
    IVF×SQ over one coarse quantizer, so a deployment picks the fine
    quantizer (PQ 8 B / SQ 64 B per vector) per recall need without
    retraining the partitioner. Gated ≡ knn_sq_rerank at full probe in
    tests; DuckDB-oracled end to end."""
    from toy_vector_db_spark.operators import similarity

    base, qs = _split(spark, sf_dir)
    return similarity.knn_ivfsq(base, qs, K)


@register("knn_ivfsq_filtered")
def q_knn_ivfsq_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED IVF-SQ (round 8): the knn_ivfpq_filtered machinery —
    label-equality applied BEFORE the ADC top-R cut (IDSelector) and
    histogram-guided probe selection (cells containing the query's
    label probed in distance order until the cumulative label count
    covers the rerank budget) — over the SQ fine quantizer. The SAME
    build-time histogram serves both compositions, because both probe
    the one shared coarse quantizer: filtered search is a property of
    the partitioner, not the fine quantizer."""
    from toy_vector_db_spark.operators import similarity

    emb = table(spark, sf_dir, "embeddings")
    cut = split_count(_emb_count(spark, sf_dir), SPLIT_RATIO)
    base = emb.where(F.col("vec_id") < cut)
    qs = emb.where(F.col("vec_id") >= cut).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
        F.col("label"),
    )
    bvec = base.select("vec_id", "embedding")
    labels = base.select("vec_id", "label")
    return similarity.knn_ivfsq(
        bvec,
        qs.select("query_id", "query_vec"),
        K,
        labels=labels,
        query_labels=qs.select(
            "query_id", F.col("label").alias("qlabel")
        ),
        label_hist=similarity.cached_label_cell_hist(bvec, labels),
    )


@register("knn_ivfbq")
def q_knn_ivfbq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-BQ (round 8 — completing the quantizer composition matrix:
    IVF×{PQ, SQ, BQ} over ONE trained coarse quantizer): the shared
    coarse probe gates the sign-bit Hamming prune, exact rerank at BQ's
    deeper constant-cost floor. Pure Catalyst end to end (bit_count is
    a JVM intrinsic — no Arrow kernel, no driver probe collection); the
    cell-keyed artifact is 8 B/vector, the cheapest probed bytes of the
    three compositions. Gated ≡ knn_bq_rerank at full probe in tests;
    DuckDB-oracled end to end."""
    from toy_vector_db_spark.operators import similarity

    base, qs = _split(spark, sf_dir)
    return similarity.knn_ivfbq(base, qs, K)


@register("knn_ivfbq_filtered")
def q_knn_ivfbq_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED IVF-BQ (round 8): the knn_ivfpq_filtered machinery —
    label equality BEFORE the Hamming top-R cut (IDSelector) plus
    histogram-guided probe selection — over the sign-bit fine code. The
    SAME build-time histogram serves all three compositions, because
    all three probe the one shared coarse quantizer: filtered search is
    a property of the partitioner, not the fine quantizer."""
    from toy_vector_db_spark.operators import similarity

    emb = table(spark, sf_dir, "embeddings")
    cut = split_count(_emb_count(spark, sf_dir), SPLIT_RATIO)
    base = emb.where(F.col("vec_id") < cut)
    qs = emb.where(F.col("vec_id") >= cut).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
        F.col("label"),
    )
    bvec = base.select("vec_id", "embedding")
    labels = base.select("vec_id", "label")
    return similarity.knn_ivfbq(
        bvec,
        qs.select("query_id", "query_vec"),
        K,
        labels=labels,
        query_labels=qs.select(
            "query_id", F.col("label").alias("qlabel")
        ),
        label_hist=similarity.cached_label_cell_hist(bvec, labels),
    )


@register("ivfsq_upsert_search")
def q_ivfsq_upsert_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-SQ search over an INCREMENTALLY-INGESTED index (round 8):
    both quantizer states — coarse centroids and per-dim bounds — train
    on the first 75% of the base and FREEZE; the last 25% arrives as a
    micro-batch that is only assigned + encoded and appended to the
    cell-keyed artifact. Search runs the standard knn_ivfsq plan over
    the upserted index with the frozen pair. Oracle: knn_ivfsq's SQL
    with the k-means training AND the min/max scan bounded to the
    initial slice (per-row assign/encode ⇒ upsert ≡ frozen rebuild,
    tested)."""
    from toy_vector_db_spark.operators import similarity

    base, qs = _split(spark, sf_dir)
    n = _emb_count(spark, sf_dir)
    cut = split_count(n, SPLIT_RATIO)
    init_cut = split_count(cut, UPSERT_RATIO)
    initial = base.where(F.col("vec_id") < init_cut)
    batch = base.where(F.col("vec_id") >= init_cut)
    sq_cells, cents, bounds = similarity.ivfsq_upsert(initial, batch)
    return similarity.knn_ivfsq(
        base, qs, K, cents=cents, bounds=bounds, sq_cells=sq_cells
    )


@register("ivfsq_delete_search")
def q_ivfsq_delete_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELETE from the IVF-SQ index via tombstones (round 8): the shared
    deterministic set vec_id % 17 == 0 is anti-joined out of the
    cell-keyed code rows BEFORE the probed ADC scan — neither quantizer
    retrains, neighbors back-fill from next-nearest survivors, and the
    filter composes with the probe partition pruning in one scan (the
    ivfpq_delete_search contract). Oracle: knn_ivfsq's SQL with the
    tombstone exclusion in the candidate CTE."""
    from toy_vector_db_spark.operators import similarity

    base, qs = _split(spark, sf_dir)
    cents = similarity.cached_trained_centroids(base)
    bounds = similarity.cached_sq_bounds(base)
    cells = similarity.cached_sq_cells(base)
    tombstones = base.select("vec_id").where(
        F.col("vec_id") % DELETE_MOD == 0
    )
    live = cells.join(F.broadcast(tombstones), "vec_id", "left_anti")
    return similarity.knn_ivfsq(
        base, qs, K, cents=cents, bounds=bounds, sq_cells=live
    )


@register("sq_upsert_search")
def q_sq_upsert_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQ8 search over an INCREMENTALLY-INGESTED index (round 8,
    completing the fourth family's lifecycle): the per-dim bounds train
    on the first 75% of the base and FREEZE; the last 25% arrives as a
    micro-batch that is only encoded against the broadcast bounds row
    and appended (appended partition files at 100 TB — the one-pass
    bounds scan never re-runs; out-of-range values saturate to 0/255
    by the encode clamp, deterministically on both engines). Search
    runs the standard knn_sq_rerank plan over the upserted artifact.
    Oracle: knn_sq_rerank's SQL with the min/max scan bounded to the
    initial slice — valid because frozen-bounds append is provably
    row-identical to a full re-encode (per-row expression, asserted in
    tests/test_similarity.py)."""
    from toy_vector_db_spark.operators import similarity

    base, qs = _split(spark, sf_dir)
    n = _emb_count(spark, sf_dir)
    cut = split_count(n, SPLIT_RATIO)
    init_cut = split_count(cut, UPSERT_RATIO)
    initial = base.where(F.col("vec_id") < init_cut)
    batch = base.where(F.col("vec_id") >= init_cut)
    codes, bounds = similarity.sq_upsert(initial, batch)
    return similarity.knn_sq_rerank(
        base, qs, K, bounds=bounds, codes=codes
    )


@register("sq_delete_search")
def q_sq_delete_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DELETE from the SQ8 index via tombstones (round 8): the deleted
    ids (the shared deterministic set vec_id % 17 == 0) are anti-joined
    out of the code rows BEFORE the ADC scan, so deleted rows never
    spend rerank budget and their former neighbors back-fill from the
    next-nearest survivors — the bounds are NOT retrained (the
    ivfpq_delete contract: corpus membership and quantizer state are
    independent axes). At 100 TB the tombstone set is a broadcast
    anti-join or a bitmap pushed into the scan; compaction (rewriting
    live codes) is definitionally identical because the encode is
    per-row — proven in tests rather than shipped as a third key.
    Oracle: knn_sq_rerank's SQL with the tombstone exclusion in the
    candidate CTE."""
    from toy_vector_db_spark.operators import similarity

    base, qs = _split(spark, sf_dir)
    bounds = similarity.cached_sq_bounds(base)
    codes = similarity.sq_code_array(base, bounds)
    tombstones = base.select("vec_id").where(
        F.col("vec_id") % DELETE_MOD == 0
    )
    live = codes.join(F.broadcast(tombstones), "vec_id", "left_anti")
    return similarity.knn_sq_rerank(base, qs, K, bounds=bounds, codes=live)


@register(
    "hnsw_upsert_search",
    f"""
    WITH {_SPLIT_CTE},
    ranked AS ({_topk_cte(_COS_SCORED)})
    SELECT query_id, vec_id, round(d, {ROUND}) AS dist, CAST(rank AS INT) AS rank
    FROM ranked
    """,
)
def q_hnsw_upsert_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HNSW search over an INCREMENTALLY-INGESTED graph (round 7, verdict
    r6 item 5 — the lifecycle leg the IVF-PQ family got in round 6): the
    first 75% of the base builds the sharded index; the last 25% arrives
    as a micro-batch through ``hnsw_upsert`` — frozen shard function, new
    ids hash to their shards, untouched shards' edge lists pass through,
    touched shards replay Algorithm 1 for just the new ids (proven
    edge-identical to a scratch rebuild in tests/test_hnsw_lifecycle.py).
    Driver hash via the exhaustive-degenerate trick (the
    knn_hnsw_exhaustive pattern): ef = |base| with the unreachable-point
    guard makes every per-shard beam exhaustive, so search over the
    upserted graph provably equals exact search over the union — oracle =
    knn_exact_batch's SQL; final top-K membership decided by the Catalyst
    re-score (kernel numpy ordering never cuts the boundary)."""
    base, qs = _split(spark, sf_dir)
    n = _emb_count(spark, sf_dir)
    cut = split_count(n, SPLIT_RATIO)
    init_cut = split_count(cut, UPSERT_RATIO)
    initial = base.where(F.col("vec_id") < init_cut)
    batch = base.where(F.col("vec_id") >= init_cut)
    parted0, edges0 = hnsw.cached_index(
        initial, f"{sf_dir}#hnsw_upsert_init", HNSW_PARTITIONS
    )
    parted, edges = hnsw.hnsw_upsert(
        parted0, edges0, batch, HNSW_PARTITIONS
    )
    n_base = base.count()
    cand = hnsw.knn_hnsw_prebuilt(
        parted, edges, qs, 4 * K, ef=n_base, emit=4 * K
    )
    return _exact_rescore(base, qs, cand)


_HNSW_DELETE_SCORED = f"""
SELECT q.query_id, b.vec_id,
       {V.sql_cosine_distance('b.embedding', 'q.qv')} AS d
FROM base b, q WHERE b.vec_id % {DELETE_MOD} != 0
"""


@register(
    "hnsw_delete_search",
    f"""
    WITH {_SPLIT_CTE},
    ranked AS ({_topk_cte(_HNSW_DELETE_SCORED)})
    SELECT query_id, vec_id, round(d, {ROUND}) AS dist, CAST(rank AS INT) AS rank
    FROM ranked
    """,
)
def q_hnsw_delete_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tombstone DELETE on the HNSW graph (round 7): deleted ids (the
    same deterministic vec_id % 17 set as ivfpq_delete_search) stay in
    the edge lists as routing waypoints — the graph is never rewritten —
    and are filtered after the per-shard beam emission, with the
    candidate cut widened by the TOTAL tombstone count so the true
    live top-k can't be starved (hnsw.knn_hnsw_deleted; round 8 widened
    the per-shard-max cut — advice item 1). Runs in the
    exhaustive-degenerate configuration over the SAME session-cached
    1-shard graph as knn_hnsw_exhaustive (a tombstone delete costs zero
    build work — that's the point), so the result provably equals exact
    search over the live set; oracle = the exact top-k SQL with the
    exclusion predicate in the scored CTE."""
    base, qs = _split(spark, sf_dir)
    n_base = base.count()
    parted, edges = hnsw.cached_index(base, f"{sf_dir}#exhaustive", 1)
    tombstones = base.select("vec_id").where(
        F.col("vec_id") % DELETE_MOD == 0
    )
    cand = hnsw.knn_hnsw_deleted(
        parted, edges, tombstones, qs, 4 * K, ef=n_base, emit=n_base
    )
    live_base = base.where(F.col("vec_id") % DELETE_MOD != 0)
    return _exact_rescore(live_base, qs, cand)


@register(
    "hnsw_compact_search",
    f"""
    WITH {_SPLIT_CTE},
    ranked AS ({_topk_cte(_HNSW_DELETE_SCORED)})
    SELECT query_id, vec_id, round(d, {ROUND}) AS dist, CAST(rank AS INT) AS rank
    FROM ranked
    """,
)
def q_hnsw_compact_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMPACTION after HNSW tombstone deletes (round 7) — the fourth
    lifecycle leg, completing build/upsert/delete/compact parity with
    the IVF-PQ family. Unlike IVF-PQ compaction (a pure rewrite of live
    code rows), an HNSW compaction RE-LINKS: the graph is rebuilt over
    the live rows only, so former tombstone waypoints disappear from the
    edge lists and the per-shard anti-join/emission-widening cost of the
    tombstone path is retired. Search over the compacted graph must
    equal tombstone search over the old graph — both provably exact in
    the degenerate configuration — so this key shares
    hnsw_delete_search's oracle (the exact top-k SQL with the exclusion
    predicate), exactly the ivfpq_compact_search pattern. Rotated into
    the 50-key driver window in round 8 (was round-7 overflow);
    oracle-tested locally at every SF by tests/test_registry_oracles.py."""
    base, qs = _split(spark, sf_dir)
    live = base.where(F.col("vec_id") % DELETE_MOD != 0)
    n_live = live.count()
    parted, edges = hnsw.cached_index(live, f"{sf_dir}#hnsw_compact", 1)
    cand = hnsw.knn_hnsw_prebuilt(
        parted, edges, qs, 4 * K, ef=n_live, emit=4 * K
    )
    return _exact_rescore(live, qs, cand)


@register(
    "streaming_hnsw_ingest",
    f"""
    WITH {_SPLIT_CTE},
    ranked AS ({_topk_cte(_COS_SCORED)})
    SELECT query_id, vec_id, round(d, {ROUND}) AS dist, CAST(rank AS INT) AS rank
    FROM ranked
    """,
)
def q_streaming_hnsw_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTINUOUS ingest into the HNSW index (round 7): the arriving 25%
    of the base drains readStream → foreachBatch; every micro-batch runs
    the shard-append upsert against the on-disk index state, rewriting
    ONLY the touched shard partitions of the edge table (dynamic
    partition overwrite) — the streaming twin of hnsw_upsert_search,
    exactly as streaming_vector_ingest twins ivfpq_upsert_search. The
    drained graph is edge-identical to the batch upsert and to a scratch
    build of the union (hnsw_upsert is proven shard-equal to scratch on
    both its paths, so micro-batch arrival order cannot matter), so the
    exhaustive-degenerate search shares hnsw_upsert_search's exact-KNN
    oracle. Rotated into the driver window in round 8 (was round-7
    overflow); oracle-tested locally at every SF."""
    from toy_vector_db_spark.streaming import ingest

    base, qs = _split(spark, sf_dir)
    n = _emb_count(spark, sf_dir)
    cut = split_count(n, SPLIT_RATIO)
    init_cut = split_count(cut, UPSERT_RATIO)
    parted, edges = ingest.stream_ingest_hnsw(
        spark, sf_dir, init_cut, cut, HNSW_PARTITIONS
    )
    n_base = base.count()
    cand = hnsw.knn_hnsw_prebuilt(
        parted, edges, qs, 4 * K, ef=n_base, emit=4 * K
    )
    return _exact_rescore(base, qs, cand)


@register(
    "hnsw_routed_upsert_search",
    f"""
    WITH {_SPLIT_CTE},
    ranked AS ({_topk_cte(_COS_SCORED)})
    SELECT query_id, vec_id, round(d, {ROUND}) AS dist, CAST(rank AS INT) AS rank
    FROM ranked
    """,
)
def q_hnsw_routed_upsert_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Micro-batch ingest into the ROUTED (cell-partitioned) graph index
    (round 8, verdict r7 item 7 — lifecycle parity for the third serving
    family): the first 75% of the base trains the centroids and builds
    the per-cell graphs; the last 25% arrives as a micro-batch through
    ``hnsw_routed_upsert`` — the FROZEN centroids are the shard
    function (the ivfpq_upsert frozen-quantizer contract on the graph
    family), so the batch routes to its cells and only TOUCHED cells
    replay Algorithm 1 / rebuild; untouched cells' edge lists pass
    through. Driver hash via the routed exhaustive degenerate
    (nprobe = all cells, ef = |base| — knn_hnsw_routed_exhaustive's
    argument: the cells partition the corpus, each per-cell beam is
    exhaustive, so the union contains the exact top-k regardless of
    which slice trained the centroids). Oracle = knn_exact_batch's SQL
    over the full base."""
    base, qs = _split(spark, sf_dir)
    n = _emb_count(spark, sf_dir)
    cut = split_count(n, SPLIT_RATIO)
    init_cut = split_count(cut, UPSERT_RATIO)
    initial = base.where(F.col("vec_id") < init_cut)
    batch = base.where(F.col("vec_id") >= init_cut)
    cells0, edges0, cents = hnsw.cached_routed_index(
        initial, f"{sf_dir}#routed_upsert_init"
    )
    cells, edges = hnsw.hnsw_routed_upsert(cells0, edges0, cents, batch)
    n_base = base.count()
    n_cells = cents.count()
    cand = hnsw.knn_hnsw_routed_prebuilt(
        cells, edges, cents, qs, 4 * K,
        nprobe=n_cells, ef=n_base, emit=4 * K,
    )
    return _exact_rescore(base, qs, cand)


@register(
    "hnsw_routed_delete_search",
    f"""
    WITH {_SPLIT_CTE},
    ranked AS ({_topk_cte(_HNSW_DELETE_SCORED)})
    SELECT query_id, vec_id, round(d, {ROUND}) AS dist, CAST(rank AS INT) AS rank
    FROM ranked
    """,
)
def q_hnsw_routed_delete_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tombstone DELETE on the routed graph index (round 8): the same
    deterministic vec_id % 17 tombstone set as every delete key, filtered
    AFTER per-cell beam emission with the candidate cut widened by the
    TOTAL tombstone count (hnsw.knn_hnsw_routed_deleted — the round-8
    multi-shard starvation fix applies across probed cells too). Runs
    over the SAME session-cached routed index as
    knn_hnsw_routed_exhaustive — a tombstone delete costs zero build
    work — in the exhaustive degenerate (nprobe = all cells,
    ef = |base|), so the result provably equals exact search over the
    live set; oracle = the exact top-k SQL with the exclusion predicate
    in the scored CTE (shared with hnsw_delete_search)."""
    base, qs = _split(spark, sf_dir)
    n_base = base.count()
    cells, edges, cents = hnsw.cached_routed_index(base, sf_dir)
    tombstones = base.select("vec_id").where(
        F.col("vec_id") % DELETE_MOD == 0
    )
    n_cells = cents.count()
    cand = hnsw.knn_hnsw_routed_deleted(
        cells, edges, cents, tombstones, qs, 4 * K,
        nprobe=n_cells, ef=n_base, emit=n_base,
    )
    live_base = base.where(F.col("vec_id") % DELETE_MOD != 0)
    return _exact_rescore(live_base, qs, cand)


@register(
    "hnsw_routed_compact_search",
    f"""
    WITH {_SPLIT_CTE},
    ranked AS ({_topk_cte(_HNSW_DELETE_SCORED)})
    SELECT query_id, vec_id, round(d, {ROUND}) AS dist, CAST(rank AS INT) AS rank
    FROM ranked
    """,
)
def q_hnsw_routed_compact_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COMPACTION on the routed index (round 8): per-cell graphs rebuilt
    over the live rows only, CENTROIDS FROZEN (compaction rewrites the
    index, it does not retrain the router — the IVF-PQ compact contract)
    and live rows keep their cell assignment, so the delete leg's
    tombstone waypoints and cut-widening cost are retired. Search over
    the compacted index must equal tombstone search over the old one —
    both provably exact in the routed exhaustive degenerate — so this
    key shares hnsw_routed_delete_search's oracle, the
    ivfpq_compact_search pattern on the third family. Completes
    build/upsert/delete/compact parity for all three index families."""
    base, qs = _split(spark, sf_dir)
    cells, edges, cents = hnsw.cached_routed_index(base, sf_dir)
    tombstones = base.select("vec_id").where(
        F.col("vec_id") % DELETE_MOD == 0
    )
    live_cells, live_edges = hnsw.cached_routed_compact(
        cells, tombstones, sf_dir
    )
    live_base = base.where(F.col("vec_id") % DELETE_MOD != 0)
    n_live = live_base.count()
    n_cells = cents.count()
    cand = hnsw.knn_hnsw_routed_prebuilt(
        live_cells, live_edges, cents, qs, 4 * K,
        nprobe=n_cells, ef=n_live, emit=4 * K,
    )
    return _exact_rescore(live_base, qs, cand)


# -- lifecycle SERVING keys (round 9, verdict r8 item 2) ---------------------
# The *_search lifecycle keys above run in the exhaustive degenerate
# (ef = |base|) so the driver can HASH them against an exact oracle — that
# is a correctness proof, and benching it inflated the recorded serving
# numbers ~2× (r8: hnsw_upsert_search 5.67 s of which most was the
# verification leg). These *_serve twins run the identical lifecycle state
# transition (same cached initial index, same ingest / tombstone path) but
# search at the REAL serving configuration (ef = EF_SEARCH, default
# nprobe), which is what bench.py now times. No oracle by nature
# (approximate results); quality/equivalence coverage stays where it
# belongs: hnsw_recall_gate drives the ef=100 config's driver row, the
# exhaustive *_search keys drive the lifecycle state's hash rows, and
# tests/test_serve_keys.py pins each serve key's recall floor locally.


@register("hnsw_upsert_serve")
def q_hnsw_upsert_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hnsw_upsert_search's SERVING twin: micro-batch ingest onto the
    session-cached initial graph (frozen shard function, touched shards
    replay Algorithm 1 — hnsw.hnsw_upsert), then the real ef=EF_SEARCH
    beam search. The timed cost is ingest + serve, never initial build
    (warm in the session cache) and never the exhaustive proof leg."""
    base, qs = _split(spark, sf_dir)
    n = _emb_count(spark, sf_dir)
    cut = split_count(n, SPLIT_RATIO)
    init_cut = split_count(cut, UPSERT_RATIO)
    initial = base.where(F.col("vec_id") < init_cut)
    batch = base.where(F.col("vec_id") >= init_cut)
    parted0, edges0 = hnsw.cached_index(
        initial, f"{sf_dir}#hnsw_upsert_init", HNSW_PARTITIONS
    )
    parted, edges = hnsw.hnsw_upsert(parted0, edges0, batch, HNSW_PARTITIONS)
    return hnsw.knn_hnsw_prebuilt(parted, edges, qs, K)


@register("hnsw_delete_serve")
def q_hnsw_delete_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hnsw_delete_search's SERVING twin: tombstone filter over the
    session-cached REAL 8-shard graph (the one knn_hnsw serves from) at
    ef=EF_SEARCH, with knn_hnsw_deleted's k+T cut/beam widening. A
    tombstone delete costs zero build work — the timed cost is the
    anti-join + widened search only."""
    base, qs = _split(spark, sf_dir)
    parted, edges = hnsw.cached_index(base, sf_dir, HNSW_PARTITIONS)
    tombstones = base.select("vec_id").where(
        F.col("vec_id") % DELETE_MOD == 0
    )
    return hnsw.knn_hnsw_deleted(parted, edges, tombstones, qs, K)


@register("hnsw_routed_upsert_serve")
def q_hnsw_routed_upsert_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hnsw_routed_upsert_search's SERVING twin: micro-batch ingest under
    the FROZEN centroids onto the session-cached initial per-cell graphs
    (touched cells rebuild — hnsw.hnsw_routed_upsert), then the real
    default-nprobe ef=EF_SEARCH routed search."""
    base, qs = _split(spark, sf_dir)
    n = _emb_count(spark, sf_dir)
    cut = split_count(n, SPLIT_RATIO)
    init_cut = split_count(cut, UPSERT_RATIO)
    initial = base.where(F.col("vec_id") < init_cut)
    batch = base.where(F.col("vec_id") >= init_cut)
    cells0, edges0, cents = hnsw.cached_routed_index(
        initial, f"{sf_dir}#routed_upsert_init"
    )
    cells, edges = hnsw.hnsw_routed_upsert(cells0, edges0, cents, batch)
    return hnsw.knn_hnsw_routed_prebuilt(cells, edges, cents, qs, K)


@register("hnsw_routed_delete_serve")
def q_hnsw_routed_delete_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hnsw_routed_delete_search's SERVING twin: tombstone filter over
    the session-cached routed index at the real default-nprobe
    ef=EF_SEARCH configuration (knn_hnsw_routed_deleted's k+T widening
    across probed cells)."""
    base, qs = _split(spark, sf_dir)
    cells, edges, cents = hnsw.cached_routed_index(base, sf_dir)
    tombstones = base.select("vec_id").where(
        F.col("vec_id") % DELETE_MOD == 0
    )
    return hnsw.knn_hnsw_routed_deleted(
        cells, edges, cents, tombstones, qs, K
    )


# One driver-hashable row per serve twin (round 10, verdict r9 item 8): the
# four *_serve keys are the benched serving path but approximate by nature,
# so they can never earn a driver hash row of their own. This single key
# folds each twin's deterministic invariants — exactly K rows per query,
# rank contiguity 1..K, no tombstone leakage, and mean recall@K vs the
# exact answer over the correct live universe at or above the family's
# documented floor (tests/test_serve_keys.py) — into one 4-row boolean
# table. All four facts are deterministic (hash-seeded levels → fixed
# graph → fixed beam → fixed recall per SF), so the oracle is the constant
# all-TRUE table and a serving regression turns a driver row red while
# burning ONE window slot, not four.

SERVE_FLOOR_PCT = {
    # integer percent floors, mirroring tests/test_serve_keys.py
    "hnsw_upsert_serve": 85,
    "hnsw_delete_serve": 85,
    "hnsw_routed_upsert_serve": 70,
    "hnsw_routed_delete_serve": 70,
}
_SERVE_TOMBSTONED = {"hnsw_delete_serve", "hnsw_routed_delete_serve"}


def _serve_invariant_row(
    spark: SparkSession, sf_dir: str, twin: str
) -> DataFrame:
    base, qs = _split(spark, sf_dir)
    ann = _QUERIES[twin](spark, sf_dir)
    tombstoned = twin in _SERVE_TOMBSTONED
    live = (
        base.where(F.col("vec_id") % DELETE_MOD != 0) if tombstoned else base
    )
    exact = knn.knn_exact_batch(live, qs, K)
    per_q = ann.groupBy("query_id").agg(
        F.count("*").alias("c"),
        F.min("rank").alias("rmin"),
        F.max("rank").alias("rmax"),
        F.countDistinct("rank").alias("rdist"),
        F.max(
            ((F.col("vec_id") % DELETE_MOD == 0) & F.lit(tombstoned)).cast(
                "int"
            )
        ).alias("tomb"),
    )
    shape = per_q.agg(
        F.bool_and(
            (F.col("c") == K)
            & (F.col("rmin") == 1)
            & (F.col("rmax") == K)
            & (F.col("rdist") == K)
        ).alias("shape_all"),
        F.count("*").alias("nq_ann"),
        F.max("tomb").alias("tomb_any"),
    )
    # integer-arithmetic gate, same discipline as hnsw_recall_gate: mean
    # recall ≥ floor ⇔ 100·Σhits ≥ floor_pct·K·nq (exact — every query has
    # exactly K relevant rows); a float avg's partial-agg order is
    # partition-dependent and an ulp flip at the threshold would flake
    hits = evaluation.intersection_count(exact, ann).agg(
        F.sum("n_common").alias("hits"), F.count("*").alias("nq")
    )
    return shape.crossJoin(hits).select(
        F.lit(twin).alias("twin"),
        (
            F.col("shape_all") & (F.col("nq_ann") == F.col("nq"))
        ).alias("shape_ok"),
        (F.col("tomb_any") == 0).alias("no_tombstones"),
        (
            F.col("hits") * 100
            >= F.lit(SERVE_FLOOR_PCT[twin]) * K * F.col("nq")
        ).alias("recall_floor_passed"),
    )


@register(
    "serve_invariants",
    """
    SELECT * FROM (VALUES
      ('hnsw_delete_serve',        TRUE, TRUE, TRUE),
      ('hnsw_routed_delete_serve', TRUE, TRUE, TRUE),
      ('hnsw_routed_upsert_serve', TRUE, TRUE, TRUE),
      ('hnsw_upsert_serve',        TRUE, TRUE, TRUE)
    ) AS t(twin, shape_ok, no_tombstones, recall_floor_passed)
    """,
)
def q_serve_invariants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver visibility for the serving configuration (see the block
    comment above): one boolean invariant row per *_serve twin, hashed
    against the constant all-TRUE oracle."""
    rows = [
        _serve_invariant_row(spark, sf_dir, t)
        for t in sorted(SERVE_FLOOR_PCT)
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


@register(
    "knn_hnsw_filtered",
    f"""
    WITH cut AS (SELECT {_split_cut_sql()} AS c),
    qf AS (SELECT vec_id AS query_id, embedding AS qv, label AS qlabel
           FROM embeddings, cut WHERE vec_id >= c),
    bf AS (SELECT vec_id, embedding, label
           FROM embeddings, cut WHERE vec_id < c),
    ranked AS (
      SELECT query_id, vec_id, d,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY d ASC, vec_id ASC) AS rank
      FROM (SELECT q.query_id, b.vec_id,
                   {V.sql_cosine_distance('b.embedding', 'q.qv')} AS d
            FROM bf b, qf q WHERE b.label = q.qlabel)
      QUALIFY rank <= {K})
    SELECT query_id, vec_id, round(d, {ROUND}) AS dist, CAST(rank AS INT) AS rank
    FROM ranked
    """,
)
def q_knn_hnsw_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED graph search (round 7): the HNSW answer to the filtered-
    ANN feature. A graph walk cannot pre-filter row-by-row (excluding
    nodes breaks connectivity — the reason knn_ivfpq_filtered's
    IDSelector shape doesn't transplant), so the index is PARTITIONED BY
    THE FILTER ATTRIBUTE instead: one graph per label
    (hnsw.labeled_index), and a query routes to exactly its label's
    graph — the routing IS the filter, results satisfy the predicate by
    construction, and per-query work is one n/|labels| graph, CHEAPER
    than unfiltered search. Bounded attribute cardinality is the
    documented contract (one graph per value); high-cardinality
    predicates belong to the IVF-PQ row-filter instead. Driver-hashed
    via the exhaustive degenerate (ef=|base| ≥ every label shard, with
    the unreachable-point guard): provably the filtered-exact batch
    top-k. Rotated into the driver window in round 8."""
    emb = table(spark, sf_dir, "embeddings")
    cut = split_count(_emb_count(spark, sf_dir), SPLIT_RATIO)
    base = emb.where(F.col("vec_id") < cut)
    qs = emb.where(F.col("vec_id") >= cut).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
        F.col("label").alias("qlabel"),
    )
    parted, edges = hnsw.cached_labeled_index(base, sf_dir)
    n_base = base.count()
    cand = hnsw.knn_hnsw_filtered(
        parted, edges, qs, 4 * K, ef=n_base, emit=4 * K
    )
    return _exact_rescore(
        base.select("vec_id", "embedding"),
        qs.select("query_id", "query_vec"),
        cand,
    )


@register("knn_ivfpq_filtered")
def q_knn_ivfpq_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILTERED ANN (round 7, verdict r6 item 6): label pre-filtering
    inside the IVF-PQ probe path — each query's candidates are
    restricted to code rows whose label equals the query's own label
    BEFORE the ADC top-R cut (the Faiss IDSelector shape), so the whole
    rerank budget is spent on rows satisfying the predicate.
    knn_exact_filtered does this for exact search; this key does it for
    the compressed 100 TB serving plan, where the label is an attribute
    column written with the codes and the filter composes with the
    tombstone anti-join of the delete leg.

    Probe selection (round 8, verdict r7 item 6 — replaces the round-7
    global widening nprobe_f = min(C, nprobe·n_labels), which saturated
    to a full probe at fixture scale): a per-label cell-hit HISTOGRAM —
    a build-time aggregate beside the centroids, n_labels·C metadata
    rows — restricts probe ranking to cells that actually contain the
    query's label, probed in centroid-distance order until the
    cumulative label-row count reaches the rerank budget (nprobe-cell
    floor). A selective label whose rows concentrate in few cells
    probes only those; a label spread thin probes wide automatically —
    the inverse-selectivity widening becomes the worst case, not the
    default. Recall vs filtered-exact is gated in
    tests/test_similarity.py (incl. a label-correlated 10× fixture
    asserting probed cells ≪ C); the oracle replays the identical
    histogram + cumsum probe rule and label-equality cand joins."""
    from toy_vector_db_spark.operators import similarity

    emb = table(spark, sf_dir, "embeddings")
    cut = split_count(_emb_count(spark, sf_dir), SPLIT_RATIO)
    base = emb.where(F.col("vec_id") < cut)
    qs = emb.where(F.col("vec_id") >= cut).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("query_vec"),
        F.col("label"),
    )
    bvec = base.select("vec_id", "embedding")
    labels = base.select("vec_id", "label")
    return similarity.knn_ivfpq(
        bvec,
        qs.select("query_id", "query_vec"),
        K,
        labels=labels,
        query_labels=qs.select(
            "query_id", F.col("label").alias("qlabel")
        ),
        label_hist=similarity.cached_label_cell_hist(bvec, labels),
    )


# Keys created in a round whose 50-slot driver window is already full are
# queued here (oracled, policy-tested by test_overflow_keys_are_oracled_and
# _queued) and rotate in next round. Round 8 rotated the round-7 trio
# (hnsw_compact_search, streaming_hnsw_ingest, knn_hnsw_filtered) in, and
# a late round-8 session rotated in the ten keys the same round had
# created after its first 14 rotations (the SQ8 lifecycle pair, the SQ
# streaming twin, the IVF-SQ/IVF-BQ composition keys and the IVF-SQ
# lifecycle, and mm_resize) — so the queue is EMPTY: every oracled key
# has ≥1 driver row in the merged r1-r8 record once CORRECTNESS_r08
# lands. Rotate-out picks and history live in the _PRIORITY comments;
# rotated-out keys stay fully oracle-tested locally
# (tests/test_registry_oracles.py covers every registered oracle).
# Round 10 created semdedup_prune (SemDeDup) and
# streaming_late_data_counts (watermark late-drop semantics) after that
# round's rotation budget was spent; BOTH HOLD ROUND-11 WINDOW SLOTS
# (first driver rows) — this queue is for keys created mid-round after
# the window is frozen, and is now empty. Stale-key refresh is tracked
# separately in the per-round rotation queue above (_R15_ROTATION_QUEUE).
# mm_decode_jpeg_rgb_stats / mm_decode_video_rgb_stats: born round 14
# AFTER the 50-key window froze (the color JPEG + color MJPEG-AVI
# stretch past verdict item 5's PNG Done); fully DuckDB-oracled and
# pytest-checked at three SFs, first driver rows due with the round-15
# rotation.
_POST_WINDOW_OVERFLOW: list[str] = [
    "mm_decode_jpeg_rgb_stats",
    "mm_decode_video_rgb_stats",
]


@register("streaming_vector_ingest")
def q_streaming_vector_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTINUOUS ingest into the vector index (round 6): the arriving
    25% of the base flows through readStream → foreachBatch; each
    micro-batch is assigned + encoded under the FROZEN quantizers and
    appended as parquet to the index sink — the streaming twin of
    ivfpq_upsert_search (Kafka source + checkpointed sink in
    production). Deterministic per-row encode/assign makes the drained
    index row-identical to the batch upsert, so search over it shares
    the upsert key's DuckDB oracle exactly."""
    from toy_vector_db_spark.operators import similarity
    from toy_vector_db_spark.streaming import ingest

    base, qs = _split(spark, sf_dir)
    n = _emb_count(spark, sf_dir)
    cut = split_count(n, SPLIT_RATIO)
    init_cut = split_count(cut, UPSERT_RATIO)
    initial = base.where(F.col("vec_id") < init_cut)
    cents = similarity.cached_trained_centroids(initial)
    books = similarity.trained_pq_codebooks(initial)
    existing = similarity.cached_codes_cells(initial)
    new_cells = ingest.stream_ingest_codes(
        spark, sf_dir, init_cut, cut, cents, books
    )
    cc = existing.unionByName(new_cells.select(*existing.columns))
    return similarity.knn_ivfpq(
        base, qs, K, codes_cells=cc, cents=cents, books=books
    )


@register("streaming_sq_ingest")
def q_streaming_sq_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTINUOUS ingest into the SQ8 index (round 8): the arriving 25%
    of the base flows through readStream → foreachBatch; each
    micro-batch is encoded against the FROZEN broadcast bounds row and
    appended as parquet to the index sink — the fourth family's
    streaming twin, completing the streaming-ingest trio (IVF-PQ, HNSW,
    SQ). Per-row encode makes the drained code set row-identical to the
    batch upsert regardless of batch boundaries, so search over it
    shares sq_upsert_search's DuckDB oracle exactly."""
    from toy_vector_db_spark.operators import similarity
    from toy_vector_db_spark.streaming import ingest

    base, qs = _split(spark, sf_dir)
    n = _emb_count(spark, sf_dir)
    cut = split_count(n, SPLIT_RATIO)
    init_cut = split_count(cut, UPSERT_RATIO)
    initial = base.where(F.col("vec_id") < init_cut)
    bounds = similarity.cached_sq_bounds(initial)
    existing = similarity.sq_code_array(initial, bounds)
    streamed = ingest.stream_ingest_sq_codes(
        spark, sf_dir, init_cut, cut, bounds
    )
    codes = existing.unionByName(streamed.select(*existing.columns))
    return similarity.knn_sq_rerank(
        base, qs, K, bounds=bounds, codes=codes
    )


@register("streaming_bq2_ingest")
def q_streaming_bq2_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTINUOUS ingest into the BQ2 index (round 9): the arriving 25%
    of the base flows through readStream → foreachBatch; each
    micro-batch is encoded against the FROZEN broadcast |nv|-max bounds
    row and appended as parquet to the index sink — the streaming
    quartet (IVF-PQ, HNSW, SQ, BQ2). Per-row encode makes the drained
    code set row-identical to the batch upsert regardless of batch
    boundaries, so search over it shares bq2_upsert_search's DuckDB
    oracle exactly."""
    from toy_vector_db_spark.operators import similarity
    from toy_vector_db_spark.streaming import ingest

    base, qs = _split(spark, sf_dir)
    n = _emb_count(spark, sf_dir)
    cut = split_count(n, SPLIT_RATIO)
    init_cut = split_count(cut, UPSERT_RATIO)
    initial = base.where(F.col("vec_id") < init_cut)
    bounds = similarity.cached_bq2_bounds(initial)
    existing = similarity.bq2_code_array(initial, bounds)
    streamed = ingest.stream_ingest_bq2_codes(
        spark, sf_dir, init_cut, cut, bounds
    )
    codes = existing.unionByName(streamed.select(*existing.columns))
    return similarity.knn_bq2_rerank(
        base, qs, K, bounds=bounds, codes=codes
    )


@register("knn_ivfpq")
def q_knn_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ (Faiss IVFADC shape): probe N_PROBE of 16 cells, ADC over PQ
    codes within probed cells only, exact rerank of the R survivors
    (scale-aware budget) — the composition of the coarse-quantizer
    partition pruning and the compressed-corpus scan, i.e. the canonical
    100 TB ANN serving plan."""
    from toy_vector_db_spark.operators import similarity

    base, qs = _split(spark, sf_dir)
    return similarity.knn_ivfpq(base, qs, K)


@register("lsh_buckets")
def q_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH bucket signature per base vector."""
    from toy_vector_db_spark.operators import similarity

    base, _ = _split(spark, sf_dir)
    return similarity.lsh_hyperplane_buckets(base)


@register("text_langid")
def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-wordlist language-ID heuristic with deterministic tie-breaks."""
    from toy_vector_db_spark.operators import textstats

    return textstats.lang_id(table(spark, sf_dir, "documents"))


@register("text_quality")
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc quality features + composite score."""
    from toy_vector_db_spark.operators import textstats

    return textstats.quality_features(table(spark, sf_dir, "documents"))


@register("text_token_stats")
def q_text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace vs regex token counts + distinct tokens."""
    from toy_vector_db_spark.operators import textstats

    return textstats.token_stats(table(spark, sf_dir, "documents"))


@register("doc_fingerprint")
def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rabin-Karp rolling-hash fingerprint per document (higher-order fold)."""
    from toy_vector_db_spark.operators import textstats

    return textstats.fingerprint(table(spark, sf_dir, "documents"))


@register(
    "curation_filter",
    f"""
    WITH q AS (
      SELECT doc_id, lang,
             0.4 * least(len(string_split(lower(text), ' ')) / 50.0, 1.0)
             + 0.3 * (len(list_distinct(string_split(lower(text), ' '))) * 1.0
                      / len(string_split(lower(text), ' ')))
             + 0.2 * (1.0 - length(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0
                      / length(text))
             + 0.1 * (len(list_intersect(list_distinct(string_split(lower(text), ' ')),
                          ['the','a','of','and','to','value','table','row'])) * 1.0
                      / len(list_distinct(string_split(lower(text), ' '))))
               AS score
      FROM documents)
    SELECT count(*) AS n_retained,
           coalesce(round(avg(score), {ROUND}), -1) AS avg_score,
           coalesce(round(avg({V.sql_magnitude('e.embedding')}), {ROUND}), -1) AS avg_mag
    FROM q JOIN embeddings e ON e.vec_id = q.doc_id
    WHERE q.score >= 0.7 AND q.lang = 'en'
    """,
)
def q_curation_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation pipeline: quality-score the corpus, keep
    high-quality English docs, join their embeddings (doc_id = vec_id) —
    the filter→featurize→select shape of a training-data run. At 100 TB
    the quality filter is pushed into the scan and the join key is the
    storage partition key."""
    from toy_vector_db_spark.operators import textstats

    docs = table(spark, sf_dir, "documents")
    # quality_features rounds its score; the filter needs the unrounded
    # value to match the oracle, so rebuild from the same expression pieces
    toks = F.split(F.lower(F.col("text")), " ")
    dtoks = F.array_distinct(toks)
    stop = F.array(*[F.lit(w) for w in textstats.STOPWORDS])
    score = (
        F.lit(0.4) * F.least(F.size(toks) / F.lit(50.0), F.lit(1.0))
        + F.lit(0.3) * (F.size(dtoks) / F.size(toks))
        + F.lit(0.2) * (F.lit(1.0) - F.length(F.regexp_replace(F.col("text"), "[^0-9]", "")) / F.length(F.col("text")))
        + F.lit(0.1) * (F.size(F.array_intersect(dtoks, stop)) / F.size(dtoks))
    )
    kept = docs.select("doc_id", "lang", score.alias("score")).where(
        (F.col("score") >= 0.7) & (F.col("lang") == "en")
    )
    emb = table(spark, sf_dir, "embeddings")
    joined = kept.join(emb, kept.doc_id == emb.vec_id)
    # -1 sentinel when nothing is retained: NULL→NaN breaks exact compares
    return joined.agg(
        F.count("*").alias("n_retained"),
        F.coalesce(rnd(F.avg("score"), ROUND), F.lit(-1.0)).alias("avg_score"),
        F.coalesce(
            rnd(F.avg(V.magnitude("embedding")), ROUND), F.lit(-1.0)
        ).alias("avg_mag"),
    )


@register("text_hash_features")
def q_text_hash_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick token-count features (text→vector bridge)."""
    from toy_vector_db_spark.operators import textstats

    return textstats.hash_features(table(spark, sf_dir, "documents"))


@register("decontaminate_ngram")
def q_decontaminate_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing any word
    3-gram with the held-out eval set (doc_id < 50). Corpus shingles
    explode into a broadcast-hash-join probe of the eval-gram set, then a
    map-side-combined per-doc count."""
    from toy_vector_db_spark.operators import decontam

    return decontam.decontaminate_ngram(table(spark, sf_dir, "documents"))


@register("decontaminate_eval_fixture")
def q_decontaminate_eval_fixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """decontaminate_ngram through its explicit eval-frame branch against
    a held-out fixture that is NOT a doc_id subset of the corpus (foreign
    ids, truncated prompt-length texts — decontam.eval_fixture). Proves
    the broadcast gram-hash probe on data the prefix stand-in can't reach
    (round-4 verdict item 6)."""
    from toy_vector_db_spark.operators import decontam

    docs = table(spark, sf_dir, "documents")
    return decontam.decontaminate_ngram(
        docs, eval_docs=decontam.eval_fixture(docs)
    )


@register("contamination_report")
def q_contamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-EVAL-item contamination report (round 5): for each
    held-out fixture item, the distinct corpus docs and distinct k-grams
    it leaks into, plus the compromised flag — the reverse view of
    decontaminate_ngram, and the one a decontamination run acts on
    (drop/re-split compromised benchmark items)."""
    from toy_vector_db_spark.operators import decontam

    return decontam.contamination_report(table(spark, sf_dir, "documents"))


@register("decontaminate_embedding")
def q_decontaminate_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space decontamination (round 5): per training vector,
    the max clamped-cosine similarity to any eval embedding + closest
    eval id + contamination flag — catches the paraphrased leakage the
    n-gram check can't. Eval set = injected copies of a corpus slice
    (the dedup ground-truth idiom): those rows must flag at sim 1.0, the
    synthetic clusters top out near 0.48 otherwise. Broadcast eval ×
    map-side-combined max-of-struct: one row per corpus vector crosses
    the exchange."""
    from toy_vector_db_spark.operators import decontam

    base, _ = _split(spark, sf_dir)
    return decontam.decontaminate_embedding(base)


@register("doc_repetition_stats")
def q_doc_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filters: duplicate-token / duplicate-bigram
    / most-common-token fractions per doc — pure per-row Catalyst, zero
    shuffle."""
    from toy_vector_db_spark.operators import decontam

    return decontam.doc_repetition_stats(table(spark, sf_dir, "documents"))


@register("model_quality_inference")
def q_model_quality_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-scored quality filter: Catalyst features → Arrow-batched
    mapInPandas inference kernel (the swap point for a real classifier) →
    keep/drop threshold. Linear stub model so the oracle is bit-exact."""
    from toy_vector_db_spark.operators import inference

    return inference.model_quality_inference(table(spark, sf_dir, "documents"))


def _register_decontam_oracles() -> None:
    from toy_vector_db_spark.operators import decontam, inference

    _ORACLES["decontaminate_ngram"] = decontam.decontaminate_sql()
    _ORACLES["decontaminate_eval_fixture"] = decontam.decontaminate_fixture_sql()
    _ORACLES["contamination_report"] = decontam.contamination_report_sql()
    _ORACLES["decontaminate_embedding"] = (
        f"WITH {_SPLIT_CTE},\n{decontam.decontaminate_embedding_sql()}"
    )
    _ORACLES["doc_repetition_stats"] = decontam.repetition_sql()
    _ORACLES["model_quality_inference"] = inference.model_quality_sql()


_register_decontam_oracles()


@register("chunk_documents")
def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping 32-token chunks (stride 24) per document — context-window
    preparation; per-row sequence+slice+posexplode."""
    from toy_vector_db_spark.operators import chunking

    return chunking.chunk_documents(table(spark, sf_dir, "documents"))


@register("pii_scrub")
def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Email-pattern redaction over a corpus with deterministically injected
    synthetic PII; output proves complete removal (n_remaining = 0)."""
    from toy_vector_db_spark.operators import chunking

    return chunking.pii_scrub(table(spark, sf_dir, "documents"))


@register("token_batch_packing")
def q_token_batch_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget batch packing within each source (512-token batches;
    per-stratum window cumsum)."""
    from toy_vector_db_spark.operators import chunking

    return chunking.token_batch_packing(table(spark, sf_dir, "documents"))


def _register_chunking_oracles() -> None:
    from toy_vector_db_spark.operators import chunking

    _ORACLES["chunk_documents"] = chunking.CHUNK_SQL
    _ORACLES["pii_scrub"] = chunking.PII_SCRUB_SQL
    _ORACLES["token_batch_packing"] = chunking.TOKEN_PACKING_SQL


_register_chunking_oracles()


@register("stratified_quality_filter")
def q_stratified_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep the top 25% by quality score WITHIN each source — per-stratum
    curation (one shuffle on the stratum key)."""
    from toy_vector_db_spark.operators import curation

    return curation.stratified_quality_filter(table(spark, sf_dir, "documents"))


@register("bm25_topk")
def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-25 documents for a fixed term bag; corpus stats
    (N, avgdl, df) reduce driver-side and inline as literals so idf's ln()
    is libm on both engines."""
    from toy_vector_db_spark.operators import curation

    return curation.bm25_topk(table(spark, sf_dir, "documents"))


@register("source_mixture_sample")
def q_source_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-flattened (α=0.5) mixture sampling across sources via
    deterministic hash thresholds; per-source audit output."""
    from toy_vector_db_spark.operators import curation

    return curation.source_mixture_sample(table(spark, sf_dir, "documents"))


@register("training_shard_assign")
def q_training_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training-order shuffle + sharding (round 5):
    md5-derived shuffle key, shard = key mod 8, in-shard position by key
    order — the reproducible permutation a trainer consumes, physically
    the repartition+sortWithinPartitions write plan."""
    from toy_vector_db_spark.operators import curation

    return curation.training_shard_assign(table(spark, sf_dir, "documents"))


@register("vocab_topk")
def q_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-level token vocabulary, top-100 by total frequency with
    document frequencies (round 5) — the tokenizer-training precursor;
    both aggregates map-side combined."""
    from toy_vector_db_spark.operators import textstats

    return textstats.vocab_topk(table(spark, sf_dir, "documents"))


def _register_curation_oracles() -> None:
    from toy_vector_db_spark.operators import curation, textstats

    _ORACLES["stratified_quality_filter"] = curation.STRATIFIED_FILTER_SQL
    _ORACLES["bm25_topk"] = curation.bm25_sql()
    _ORACLES["source_mixture_sample"] = curation.MIXTURE_SAMPLE_SQL
    _ORACLES["training_shard_assign"] = curation.training_shard_sql()
    _ORACLES["vocab_topk"] = textstats.vocab_topk_sql()


_register_curation_oracles()


def _register_similarity_oracles() -> None:
    from toy_vector_db_spark import oracles_similarity as O
    from toy_vector_db_spark.operators.similarity import (
        N_CENTROIDS,
        N_PROBE,
        TRAIN_SAMPLE,
    )

    _ORACLES["ivf_train"] = O.ivf_train_sql(_SPLIT_CTE)
    _ORACLES["ivf_assign"] = O.ivf_assign_sql(_SPLIT_CTE)
    _ORACLES["knn_ivf"] = O.knn_ivf_sql(_SPLIT_CTE, K)
    _ORACLES["pq_train"] = O.pq_train_sql(_SPLIT_CTE)
    _ORACLES["pq_codes"] = O.pq_codes_sql(_SPLIT_CTE)
    _ORACLES["knn_pq_adc"] = O.knn_pq_adc_sql(_SPLIT_CTE, K)
    # scale-aware rerank budget (round 6): the oracle computes the SAME
    # R = max(16k, ceildiv(n_base, 10)) via a count(*) scalar subquery
    _ORACLES["knn_pq_rerank"] = O.knn_pq_rerank_sql(
        _SPLIT_CTE, K, O.rerank_budget_sql(K)
    )
    _ORACLES["knn_ivfpq"] = O.knn_ivfpq_sql(
        _SPLIT_CTE, K, N_PROBE, O.rerank_budget_sql(K)
    )
    # the upsert key: identical serving SQL, quantizer training bounded
    # to the frozen initial slice (engine: split_count(cut, 0.75) —
    # round-half-away ≡ DuckDB round() for positive values) AND the
    # engine's TRAIN_SAMPLE cap, which applies WITHIN whatever base
    # frame the trainer sees (at fixtures the init cut is the tighter
    # bound; past ~5.5k rows the cap takes over — without it the two
    # k-means runs would train on different sets)
    _init_train_pred = (
        f"vec_id < (SELECT CAST(round({UPSERT_RATIO} * c) AS BIGINT)"
        f" FROM cut) AND vec_id < {TRAIN_SAMPLE}"
    )
    _ORACLES["ivfpq_upsert_search"] = O.knn_ivfpq_sql(
        _SPLIT_CTE, K, N_PROBE, O.rerank_budget_sql(K),
        train_pred=_init_train_pred,
    )
    # the streaming ingest drains to an index row-identical to the batch
    # upsert (deterministic per-row encode/assign; batch boundaries only
    # partition the work) — same oracle, strongest possible check for a
    # streaming path
    _ORACLES["streaming_vector_ingest"] = _ORACLES["ivfpq_upsert_search"]
    # tombstone delete: the same serving SQL with the deleted ids
    # excluded from the candidate codes
    _ORACLES["ivfpq_delete_search"] = O.knn_ivfpq_sql(
        _SPLIT_CTE, K, N_PROBE, O.rerank_budget_sql(K),
        cand_pred=f"co.vec_id % {DELETE_MOD} <> 0",
    )
    # compaction rewrites the live codes; search over the compacted
    # artifact is definitionally identical to tombstone search
    _ORACLES["ivfpq_compact_search"] = _ORACLES["ivfpq_delete_search"]
    # filtered ANN (round 7): the same serving SQL with label-attribute
    # joins in the cand CTE and the per-query label equality applied
    # before the ADC top-R cut — the engine's pre-filter, replayed
    _ORACLES["knn_ivfpq_filtered"] = O.knn_ivfpq_sql(
        _SPLIT_CTE
        + """,
    lbl AS (SELECT vec_id, label FROM embeddings, cut WHERE vec_id < c),
    qlbl AS (SELECT vec_id AS query_id, label AS qlabel
             FROM embeddings, cut WHERE vec_id >= c)""",
        K,
        # round 8: label-aware probe selection via the per-label
        # cell-hit histogram (see q_knn_ivfpq_filtered) — nprobe is the
        # cell FLOOR, label_probe_r the cumulative-count target
        N_PROBE,
        O.rerank_budget_sql(K),
        cand_pred="bl.label = ql.qlabel",
        extra_cand_joins=(
            "JOIN lbl bl ON bl.vec_id = co.vec_id\n"
            "      JOIN qlbl ql ON ql.query_id = p.query_id"
        ),
        label_probe_r=O.rerank_budget_sql(K),
    )
    _ORACLES["bq_codes"] = O.bq_codes_sql(_SPLIT_CTE)
    _ORACLES["knn_bq_rerank"] = O.knn_bq_rerank_sql(
        _SPLIT_CTE, K, O.bq_rerank_budget_sql(K)
    )
    _ORACLES["knn_bq_filtered"] = O.knn_bq_rerank_sql(
        _SPLIT_CTE
        + """,
    lbl AS (SELECT vec_id, label FROM embeddings, cut WHERE vec_id < c),
    qlbl AS (SELECT vec_id AS query_id, label AS qlabel
             FROM embeddings, cut WHERE vec_id >= c)""",
        K,
        O.bq_rerank_budget_sql(K),
        cand_pred="bl.label = ql.qlabel",
        extra_cand_joins=(
            "JOIN lbl bl ON bl.vec_id = co.vec_id\n"
            "      JOIN qlbl ql ON ql.query_id = qc.query_id"
        ),
    )
    # BQ2 (round 9, verdict r8 item 8): 2-bit codes + serving at the
    # SHARED rerank floor — knobs in oracle lockstep; lifecycle legs via
    # the knn_sq_rerank_sql-style hooks (frozen-bounds upsert, tombstone
    # delete)
    _ORACLES["bq2_codes"] = O.bq2_codes_sql(_SPLIT_CTE)
    _ORACLES["knn_bq2_rerank"] = O.knn_bq2_rerank_sql(
        _SPLIT_CTE, K, O.rerank_budget_sql(K)
    )
    _ORACLES["bq2_upsert_search"] = O.knn_bq2_rerank_sql(
        _SPLIT_CTE, K, O.rerank_budget_sql(K),
        bounds_pred=(
            f"vec_id < (SELECT CAST(round({UPSERT_RATIO} * c) AS BIGINT)"
            " FROM cut)"
        ),
    )
    _ORACLES["bq2_delete_search"] = O.knn_bq2_rerank_sql(
        _SPLIT_CTE, K, O.rerank_budget_sql(K),
        cand_pred=f"r.vec_id % {DELETE_MOD} <> 0",
    )
    # IVF-BQ2: the matrix's fourth column, at the SHARED budget
    _ORACLES["knn_ivfbq2"] = O.knn_ivfbq2_sql(
        _SPLIT_CTE, K, N_PROBE, O.rerank_budget_sql(K)
    )
    _ORACLES["knn_ivfbq2_filtered"] = O.knn_ivfbq2_sql(
        _SPLIT_CTE
        + """,
    lbl AS (SELECT vec_id, label FROM embeddings, cut WHERE vec_id < c),
    qlbl AS (SELECT vec_id AS query_id, label AS qlabel
             FROM embeddings, cut WHERE vec_id >= c)""",
        K,
        N_PROBE,
        O.rerank_budget_sql(K),
        cand_pred="bl.label = ql.qlabel",
        extra_cand_joins=(
            "JOIN lbl bl ON bl.vec_id = r.vec_id\n"
            "      JOIN qlbl ql ON ql.query_id = p.query_id"
        ),
        label_probe_r=O.rerank_budget_sql(K),
    )
    _ORACLES["sq_train"] = O.sq_train_sql(_SPLIT_CTE)
    _ORACLES["sq_codes"] = O.sq_codes_sql(_SPLIT_CTE)
    _ORACLES["knn_sq_rerank"] = O.knn_sq_rerank_sql(
        _SPLIT_CTE, K, O.rerank_budget_sql(K)
    )
    # SQ lifecycle (round 8): upsert = same serving SQL with the min/max
    # scan bounded to the frozen initial slice (frozen-bounds append is
    # row-identical to a full re-encode — per-row expression); delete =
    # the tombstone exclusion in the candidate CTE.
    _ORACLES["sq_upsert_search"] = O.knn_sq_rerank_sql(
        _SPLIT_CTE, K, O.rerank_budget_sql(K),
        bounds_pred=(
            f"vec_id < (SELECT CAST(round({UPSERT_RATIO} * c) AS BIGINT)"
            " FROM cut)"
        ),
    )
    _ORACLES["sq_delete_search"] = O.knn_sq_rerank_sql(
        _SPLIT_CTE, K, O.rerank_budget_sql(K),
        cand_pred=f"d.vec_id % {DELETE_MOD} <> 0",
    )
    # the streaming ingest drains to a code set row-identical to the
    # batch upsert (per-row encode under frozen bounds; batch boundaries
    # only partition the work) — same oracle, the strongest possible
    # check for a streaming path (the streaming_vector_ingest idiom)
    _ORACLES["streaming_sq_ingest"] = _ORACLES["sq_upsert_search"]
    # BQ2 streaming twin (round 9): same argument — per-row encode under
    # frozen bounds, drained set row-identical to the batch upsert
    _ORACLES["streaming_bq2_ingest"] = _ORACLES["bq2_upsert_search"]
    _ORACLES["knn_ivfsq"] = O.knn_ivfsq_sql(
        _SPLIT_CTE, K, N_PROBE, O.rerank_budget_sql(K)
    )
    # IVF-BQ: the same probe chain over the sign-bit code, at BQ's
    # deeper rerank budget (the knn_bq_rerank floor — the engine passes
    # the same max(MULT·k, budget) into the probed composition)
    _ORACLES["knn_ivfbq"] = O.knn_ivfbq_sql(
        _SPLIT_CTE, K, N_PROBE, O.bq_rerank_budget_sql(K)
    )
    _ORACLES["knn_ivfbq_filtered"] = O.knn_ivfbq_sql(
        _SPLIT_CTE
        + """,
    lbl AS (SELECT vec_id, label FROM embeddings, cut WHERE vec_id < c),
    qlbl AS (SELECT vec_id AS query_id, label AS qlabel
             FROM embeddings, cut WHERE vec_id >= c)""",
        K,
        N_PROBE,
        O.bq_rerank_budget_sql(K),
        cand_pred="bl.label = ql.qlabel",
        extra_cand_joins=(
            "JOIN lbl bl ON bl.vec_id = co.vec_id\n"
            "      JOIN qlbl ql ON ql.query_id = p.query_id"
        ),
        label_probe_r=O.bq_rerank_budget_sql(K),
    )
    _ORACLES["knn_ivfsq_filtered"] = O.knn_ivfsq_sql(
        _SPLIT_CTE
        + """,
    lbl AS (SELECT vec_id, label FROM embeddings, cut WHERE vec_id < c),
    qlbl AS (SELECT vec_id AS query_id, label AS qlabel
             FROM embeddings, cut WHERE vec_id >= c)""",
        K,
        N_PROBE,
        O.rerank_budget_sql(K),
        cand_pred="bl.label = ql.qlabel",
        extra_cand_joins=(
            "JOIN lbl bl ON bl.vec_id = d.vec_id\n"
            "      JOIN qlbl ql ON ql.query_id = p.query_id"
        ),
        label_probe_r=O.rerank_budget_sql(K),
    )
    # IVF-SQ lifecycle: upsert = BOTH quantizer states bounded to the
    # frozen initial slice; delete = the tombstone exclusion in the
    # candidate CTE (the per-family lifecycle-oracle pattern). The
    # k-means train_pred additionally carries the TRAIN_SAMPLE cap
    # (matching _init_train_pred above); the SQ min/max bounds scan has
    # NO cap on the engine side (cached_sq_bounds scans the full frame),
    # so bounds_pred stays the bare initial-slice predicate.
    _ivfsq_init_pred = (
        f"vec_id < (SELECT CAST(round({UPSERT_RATIO} * c) AS BIGINT)"
        " FROM cut)"
    )
    _ORACLES["ivfsq_upsert_search"] = O.knn_ivfsq_sql(
        _SPLIT_CTE, K, N_PROBE, O.rerank_budget_sql(K),
        train_pred=_init_train_pred,
        bounds_pred=_ivfsq_init_pred,
    )
    _ORACLES["ivfsq_delete_search"] = O.knn_ivfsq_sql(
        _SPLIT_CTE, K, N_PROBE, O.rerank_budget_sql(K),
        cand_pred=f"d.vec_id % {DELETE_MOD} <> 0",
    )
    _ORACLES["knn_sq_filtered"] = O.knn_sq_rerank_sql(
        _SPLIT_CTE
        + """,
    lbl AS (SELECT vec_id, label FROM embeddings, cut WHERE vec_id < c),
    qlbl AS (SELECT vec_id AS query_id, label AS qlabel
             FROM embeddings, cut WHERE vec_id >= c)""",
        K,
        O.rerank_budget_sql(K),
        cand_pred="bl.label = ql.qlabel",
        extra_cand_joins=(
            "JOIN lbl bl ON bl.vec_id = d.vec_id\n"
            "      JOIN qlbl ql ON ql.query_id = nq.query_id"
        ),
    )
    _ORACLES["ivfpq_build"] = O.ivfpq_build_sql(_SPLIT_CTE)
    # round 9 (verdict r8 item 3): the routed graph build's driver row —
    # cell structure via the shared deterministic-k-means chain, graph
    # facts as in-plan gate booleans the oracle asserts TRUE
    _ORACLES["hnsw_routed_build"] = O.hnsw_routed_build_sql(_SPLIT_CTE)
    # the partitioned-search key runs the SAME computation as knn_ivfpq
    # over the on-disk partitioned artifact — one oracle, two sources
    _ORACLES["ivfpq_partitioned_search"] = _ORACLES["knn_ivfpq"]
    _ORACLES["lsh_buckets"] = O.lsh_buckets_sql(_SPLIT_CTE)
    _ORACLES["text_langid"] = O.lang_id_sql()
    _ORACLES["text_quality"] = O.quality_sql()
    _ORACLES["text_token_stats"] = O.token_stats_sql()
    _ORACLES["doc_fingerprint"] = O.fingerprint_sql()
    _ORACLES["text_hash_features"] = O.hash_features_sql()


_register_similarity_oracles()


# ---------------------------------------------------------------------------
# Multimodal plumbing (operators/multimodal.py) and Structured Streaming
# (streaming/windows.py)
# ---------------------------------------------------------------------------


@register(
    "mm_payload_metadata",
    """
    SELECT doc_id, 'text/plain' AS mime,
           octet_length(encode(text)) AS n_bytes,
           sha256(text) AS sha256,
           ascii(substring(text, 1, 1)) AS head_byte
    FROM documents
    """,
)
def q_mm_payload_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata without decoding (length/sha256/head byte) —
    JVM expressions over the payload."""
    from toy_vector_db_spark.operators import multimodal

    return multimodal.payload_metadata(table(spark, sf_dir, "documents"))


@register("mm_feature_extract")
def q_mm_feature_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas feature extraction over binary payloads
    (decode step stubbed deterministically — see multimodal._decode_payload).
    Oracle compares the exact-integer feature slots (size/min/max byte);
    the float moments are twin-tested with tolerance in tests."""
    from toy_vector_db_spark.operators import multimodal

    return multimodal.feature_summary(table(spark, sf_dir, "documents"))


@register("mm_frame_sample")
def q_mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over binary payloads via mapInPandas (every 4th
    16-byte frame, checksummed)."""
    from toy_vector_db_spark.operators import multimodal

    return multimodal.frame_sample(table(spark, sf_dir, "documents"))


@register("mm_decode_image_stats")
def q_mm_decode_image_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL decode through the mapInPandas hook (round-5): documents are
    framed as header-prefixed raw-gray images JVM-side, then
    ``_decode_payload`` parses the header, reshapes the pixel buffer, and
    exact-integer image stats hash against the DuckDB byte-math oracle —
    the decode path is no longer a stub for the RAW_MIME codec."""
    from toy_vector_db_spark.operators import multimodal

    return multimodal.decode_image_stats(table(spark, sf_dir, "documents"))


@register("mm_resize")
def q_mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL nearest-neighbor resize of the decoded raw-gray images to the
    fixed 8×8 model-input grid (round 8 — the resize verb between decode
    and feature-extract): numpy fancy-index gather inside the same
    Arrow-batched mapInPandas hook as the decode key, exact-integer
    resized-grid stats hashed against the DuckDB byte-math oracle."""
    from toy_vector_db_spark.operators import multimodal

    return multimodal.resize_image_stats(table(spark, sf_dir, "documents"))


@register("mm_decode_png_stats")
def q_mm_decode_png_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A REAL standard codec through the decode hook (round 8): each
    document's raw-gray image is re-framed as a PNG (from-scratch
    stdlib-zlib encoder, filter type cycling through all five public
    scanline filters) and decoded by a from-scratch strict PNG decoder
    (signature, chunk CRCs, IHDR fields, inflate-length and filter-range
    checks). PNG is lossless, so the stats hash against the SAME DuckDB
    byte-math oracle as the raw path — a wrong unfilter cannot hide."""
    from toy_vector_db_spark.operators import multimodal

    return multimodal.decode_png_stats(table(spark, sf_dir, "documents"))


@register("mm_decode_png_rgb_stats")
def q_mm_decode_png_rgb_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUECOLOR PNG through the decode hook (round 14, verdict r13
    item 5 — real LLM data pipelines decode RGB, not just gray): each
    document's bytes frame as an (h, 16, 3) RGB image (byte i → channel
    (i−1)%3), round-trip through the from-scratch codec at RFC 2083
    color type 2 (bpp-offset scanline filters, row-cycled so all five
    color unfilters are load-bearing), and hash exact-integer
    PER-CHANNEL sums/maxes against the DuckDB stride-3 byte-math
    oracle — lossless, so a wrong 3-byte filter offset cannot hide."""
    from toy_vector_db_spark.operators import multimodal

    return multimodal.decode_png_rgb_stats(table(spark, sf_dir, "documents"))


@register("mm_decode_video_rgb_stats")
def q_mm_decode_video_rgb_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COLOR video through the container hook (round 14): documents as
    sequences of 8×16×3 RGB frames wrapped in a REAL RIFF/AVI with
    per-frame baseline YCbCr 4:2:0 JPEGs (strf bit count 24), strict
    header/geometry cross-checks, per-frame color decode. Hashes exact
    structure + the JPEG_COLOR_TOL verdict across frames and
    channels — image, audio, AND video all ride real containers in
    color where the format has one."""
    from toy_vector_db_spark.operators import multimodal

    return multimodal.decode_video_rgb_stats(table(spark, sf_dir, "documents"))


@register("mm_decode_jpeg_rgb_stats")
def q_mm_decode_jpeg_rgb_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COLOR JPEG through the decode hook (round 14, verdict r13 item
    5's second half): each document's bytes frame as an (h, 16, 3) RGB
    image and round-trip through the from-scratch baseline YCbCr 4:2:0
    pipeline — T.871 color transforms, 2×2-mean chroma subsampling, the
    Annex K chrominance tables (K.2 quant, K.4/K.6 Huffman), 16×16
    MCUs interleaving 4 Y blocks + Cb + Cr with per-component DC
    predictors. The driver hashes the exact structure (dims, MCU grid)
    plus the JPEG_COLOR_TOL fidelity verdict — a wrong chroma table,
    interleave, or inverse transform cannot hash-match."""
    from toy_vector_db_spark.operators import multimodal

    return multimodal.decode_jpeg_rgb_stats(table(spark, sf_dir, "documents"))


@register("mm_decode_wav_stats")
def q_mm_decode_wav_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A REAL audio container through the decode hook (round 8): text
    bytes framed as 8-bit PCM mono WAV via the stdlib wave encoder, then
    parsed back (layout-strict) for exact-integer sample stats — PCM is
    lossless, so the DuckDB byte-math oracle hashes exactly."""
    from toy_vector_db_spark.operators import multimodal

    return multimodal.decode_wav_stats(table(spark, sf_dir, "documents"))


@register("mm_decode_jpeg_stats")
def q_mm_decode_jpeg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Baseline JPEG from scratch (round 8): each document's raw-gray
    image round-trips through operators/jpegcodec.py — orthonormal DCT,
    Annex K quant + Huffman tables, byte stuffing, strict marker walk
    with in-file table rebuild. JPEG is lossy, so the key hashes the
    exact STRUCTURE (dims, MCU grid — SQL-derivable) plus the tolerance
    verdict max|decoded − source| ≤ JPEG_TOL; codec error bounds are
    pinned in tests/test_jpeg.py."""
    from toy_vector_db_spark.operators import multimodal

    return multimodal.decode_jpeg_stats(table(spark, sf_dir, "documents"))


@register("mm_decode_video_stats")
def q_mm_decode_video_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video container round-trip (round 8): text bytes framed as
    8x16 gray frames, wrapped as MJPEG-in-AVI (operators/avicodec.py —
    RIFF headers, per-frame baseline JPEG), strictly parsed and
    per-frame decoded back. Hashes the exact structure (frame count,
    geometry — cross-checked against the container's own header) plus
    the JPEG_TOL fidelity verdict."""
    from toy_vector_db_spark.operators import multimodal

    return multimodal.decode_video_stats(table(spark, sf_dir, "documents"))


@register("mm_audio_features")
def q_mm_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio signal features over the decoded WAV samples (round 8):
    energy, peak, dynamic range, and exact-rational mean-crossing count —
    the audio analogue of the image feature-extract verb, all integers so
    the byte-math oracle hashes verbatim."""
    from toy_vector_db_spark.operators import multimodal

    return multimodal.audio_features(table(spark, sf_dir, "documents"))


@register("mm_scene_cuts")
def q_mm_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-change detection over the frame stream (round 8): L1
    distance between consecutive zero-padded 16-byte frames, cut where
    it exceeds SCENE_THRESHOLD — the video curation verb after frame
    sampling; exact-integer frame math, oracled."""
    from toy_vector_db_spark.operators import multimodal

    return multimodal.scene_cuts(table(spark, sf_dir, "documents"))


def _register_mm_oracles() -> None:
    from toy_vector_db_spark.operators.multimodal import (
        AUDIO_FEATURES_SQL,
        DECODE_IMAGE_SQL,
        DECODE_JPEG_RGB_SQL,
        DECODE_JPEG_SQL,
        DECODE_VIDEO_RGB_SQL,
        DECODE_VIDEO_SQL,
        DECODE_WAV_SQL,
        FEATURE_EXTRACT_SQL,
        FRAME_SAMPLE_SQL,
        PNG_RGB_SQL,
        RESIZE_SQL,
        SCENE_CUTS_SQL,
    )

    _ORACLES["mm_decode_png_stats"] = DECODE_IMAGE_SQL
    _ORACLES["mm_decode_png_rgb_stats"] = PNG_RGB_SQL
    _ORACLES["mm_decode_jpeg_stats"] = DECODE_JPEG_SQL
    _ORACLES["mm_decode_jpeg_rgb_stats"] = DECODE_JPEG_RGB_SQL
    _ORACLES["mm_decode_wav_stats"] = DECODE_WAV_SQL
    _ORACLES["mm_decode_video_stats"] = DECODE_VIDEO_SQL
    _ORACLES["mm_decode_video_rgb_stats"] = DECODE_VIDEO_RGB_SQL
    _ORACLES["mm_audio_features"] = AUDIO_FEATURES_SQL
    _ORACLES["mm_scene_cuts"] = SCENE_CUTS_SQL
    _ORACLES["mm_frame_sample"] = FRAME_SAMPLE_SQL
    _ORACLES["mm_feature_extract"] = FEATURE_EXTRACT_SQL
    _ORACLES["mm_decode_image_stats"] = DECODE_IMAGE_SQL
    _ORACLES["mm_resize"] = RESIZE_SQL


_register_mm_oracles()


@register(
    "streaming_tumbling_counts",
    f"""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS win_start,
           event_type, count(*) AS n,
           round(sum(value), {_R}) AS total_value
    FROM events GROUP BY 1, 2
    """,
)
def q_streaming_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked tumbling windows THROUGH the streaming engine (file
    source → memory sink drain) — byte-identical to the batch twin, so the
    batch SQL is its oracle."""
    from toy_vector_db_spark.streaming import windows

    return windows.streaming_tumbling_counts(spark, sf_dir)


@register(
    "streaming_late_data_counts",
    f"""
    WITH ev AS (SELECT event_id, ts, value FROM events),
    m0 AS (SELECT max(ts) AS mx FROM ev WHERE event_id % 4 = 0),
    m01 AS (SELECT max(ts) AS mx FROM ev WHERE event_id % 4 <= 1),
    kept AS (
      SELECT ts, value FROM ev
      WHERE CASE
        WHEN event_id % 4 = 2 THEN
          date_trunc('hour', ts) + INTERVAL 1 HOUR
            > (SELECT mx FROM m0) - INTERVAL 211 HOUR
        WHEN event_id % 4 = 3 THEN
          date_trunc('hour', ts) + INTERVAL 1 HOUR
            > (SELECT mx FROM m01) - INTERVAL 211 HOUR
        ELSE TRUE END)
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS win_start,
           count(*) AS n,
           round(sum(value), {_R}) AS total_value
    FROM kept GROUP BY 1
    """,
)
def q_streaming_late_data_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATE-DATA / watermark-drop semantics (round 10): events replayed
    as four ordered micro-batches where batches 2-3 arrive after the
    watermark has advanced past most of their (old) event times; the
    stateful hourly aggregation drops exactly the rows whose window end
    is at or below the in-force watermark. Deterministic under the
    pinned batch order, so the drop rule is plain SQL: batch-2 rows
    survive iff window_end > max(ts | slice 0) − 211 h, batch-3 rows iff
    window_end > max(ts | slices 0-1) − 211 h (the late filter in batch
    N uses the watermark committed after batch N−2 — measured, see
    streaming/windows.py:streaming_late_data_counts). The single-batch
    streaming keys can never exercise this contract — their watermark
    never advances mid-stream."""
    from toy_vector_db_spark.streaming import windows

    return windows.streaming_late_data_counts(spark, sf_dir)


@register(
    "streaming_session_windows",
    f"""
    WITH flagged AS (
      SELECT user_id, value, ts, event_id,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w IS NULL
                    OR epoch_us(ts) - lag(epoch_us(ts)) OVER w
                       >= 30*60*1000000
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, value,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS seq
      FROM flagged
    ),
    per_sess AS (
      SELECT user_id, seq, count(*) AS n_events, sum(value) AS sv
      FROM sess GROUP BY user_id, seq
    )
    SELECT user_id, count(*) AS n_sessions,
           max(n_events) AS max_session_events,
           round(sum(sv), {_R}) AS total_value
    FROM per_sess GROUP BY user_id
    """,
)
def q_streaming_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session_window (30-min gap) per user through the streaming
    engine. Oracle = the lag/cumsum sessionizer with an END-EXCLUSIVE gap
    test (diff >= gap starts a new session), which is exactly
    session_window's semantics — unlike the batch `sessionize_events` twin,
    which splits only on strictly-greater gaps (see
    streaming/windows.py:143-151 for the boundary note)."""
    from toy_vector_db_spark.streaming import windows

    return windows.streaming_session_windows(spark, sf_dir)


# ---------------------------------------------------------------------------
# Relational extension suite (SURVEY §2.7) — joins, aggregation, windows,
# rollup, set ops, date/JSON functions, sessionization over the TPC-H-ish
# star schema and the events table.
# ---------------------------------------------------------------------------


@register(
    "tpch_q1_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), {_R}) AS sum_qty,
           round(sum(l_extendedprice), {_R}) AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), {_R}) AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), {_R}) AS sum_charge,
           round(avg(l_quantity), {_R}) AS avg_qty,
           round(avg(l_extendedprice), {_R}) AS avg_price,
           round(avg(l_discount), {_R}) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    from toy_vector_db_spark.operators import relational

    return relational.pricing_summary(table(spark, sf_dir, "lineitem"))


@register(
    "revenue_by_nation",
    f"""
    SELECT r_name, n_name,
           round(sum(l_extendedprice * (1 - l_discount)), {_R}) AS revenue,
           count(*) AS n_items
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from toy_vector_db_spark.operators import relational

    return relational.revenue_by_nation(
        table(spark, sf_dir, "lineitem"),
        table(spark, sf_dir, "orders"),
        table(spark, sf_dir, "customer"),
        table(spark, sf_dir, "nation"),
        table(spark, sf_dir, "region"),
    )


@register(
    "top_orders_per_customer",
    f"""
    SELECT o_custkey, o_orderkey, round(o_totalprice, {_R}) AS o_totalprice,
           CAST(rank AS INT) AS rank
    FROM (SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey ASC) AS rank
          FROM orders)
    WHERE rank <= 3
    """,
)
def q_top_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from toy_vector_db_spark.operators import relational

    return relational.top_orders_per_customer(table(spark, sf_dir, "orders"))


# sales_rollup / sales_cube are deliberately NOT registered: ROLLUP and CUBE
# are special cases of GROUPING SETS, represented in the driver window by
# `grouping_sets_sales`; the DataFrame implementations stay oracle-tested in
# tests/test_relational_extras.py so the 50-slot driver budget covers
# distinct operator families instead of three spellings of one.


@register(
    "customers_without_orders",
    """
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '2000-01-01')
    """,
)
def q_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from toy_vector_db_spark.operators import relational

    return relational.customers_without_orders(
        table(spark, sf_dir, "customer"), table(spark, sf_dir, "orders")
    )


# monthly_order_stats and active_customers_by_segment are NOT registered as
# standalone keys: the sink round-trip keys (`parquet_sink_roundtrip`,
# `csv_sink_roundtrip`) run the SAME relational functions upstream and use
# the SAME SQL as their oracles, so the driver already verifies both the
# DataFrame code and the SQL; standalone checks live in
# tests/test_relational_extras.py.


@register(
    "order_priority_pivot",
    """
    SELECT o_orderpriority,
           count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS n_o,
           count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS n_f,
           count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS n_p
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_order_priority_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    from toy_vector_db_spark.operators import relational

    return relational.order_priority_pivot(table(spark, sf_dir, "orders"))


@register(
    "top_customer_set_difference",
    """
    SELECT o_custkey FROM (
      SELECT o_custkey FROM orders GROUP BY o_custkey
      ORDER BY sum(o_totalprice) DESC, o_custkey ASC LIMIT 20)
    EXCEPT
    SELECT o_custkey FROM (
      SELECT o_custkey FROM orders GROUP BY o_custkey
      ORDER BY count(*) DESC, o_custkey ASC LIMIT 20)
    """,
)
def q_top_customer_set_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    from toy_vector_db_spark.operators import relational

    return relational.top_customer_set_difference(table(spark, sf_dir, "orders"))


@register(
    "sessionize_events",
    f"""
    WITH flagged AS (
      SELECT user_id, value, ts, event_id,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w IS NULL
                    OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 30*60*1000000
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sess AS (
      SELECT user_id, value,
             sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_seq
      FROM flagged
    ),
    per_sess AS (
      SELECT user_id, session_seq, count(*) AS n_events,
             round(sum(value), {_R}) AS session_value
      FROM sess GROUP BY user_id, session_seq
    )
    SELECT user_id, count(*) AS n_sessions,
           max(n_events) AS max_session_events,
           round(sum(session_value), {_R}) AS total_value
    FROM per_sess GROUP BY user_id
    """,
)
def q_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from toy_vector_db_spark.operators import relational

    return relational.sessionize(table(spark, sf_dir, "events"))


@register(
    "events_json_stats",
    f"""
    SELECT event_type, count(*) AS n,
           round(avg(k), {_R}) AS avg_k, min(k) AS min_k, max(k) AS max_k
    FROM (SELECT event_type,
                 CAST(json_extract_string(props, '$.k') AS INT) AS k
          FROM events)
    GROUP BY event_type
    """,
)
def q_events_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from toy_vector_db_spark.operators import relational

    return relational.events_json_stats(table(spark, sf_dir, "events"))


# tumbling_window_hourly is NOT registered: it shared its oracle with
# `streaming_tumbling_counts` (the streaming twin, which IS in the driver
# window); the batch implementation stays covered by the batch≡stream twin
# test (tests/test_multimodal_streaming.py) and
# tests/test_relational_extras.py.


@register(
    "running_total_by_supplier",
    f"""
    WITH run AS (
      SELECT l_suppkey,
             round(sum(l_quantity) OVER (PARTITION BY l_suppkey
                                   ORDER BY l_shipdate, l_orderkey, l_linenumber
                                   ROWS UNBOUNDED PRECEDING), {_R}) AS running_qty
      FROM lineitem)
    SELECT l_suppkey, max(running_qty) AS final_qty, count(*) AS n_items
    FROM run GROUP BY l_suppkey
    """,
)
def q_running_total_by_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from toy_vector_db_spark.operators import relational

    return relational.running_total_by_supplier(table(spark, sf_dir, "lineitem"))


@register(
    "asof_last_click",
    f"""
    WITH w AS (
      SELECT event_id, user_id, event_type, epoch_us(ts) AS ts_us,
             last_value(CASE WHEN event_type = 'click' THEN epoch_us(ts) END
                        IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS last_click_us
      FROM events)
    SELECT event_id, user_id, ts_us,
           coalesce(last_click_us, -1) AS last_click_us,
           coalesce(ts_us - last_click_us, -1) AS usecs_since_click
    FROM w WHERE event_type = 'purchase'
    """,
)
def q_asof_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join via last(ignorenulls) window: most recent click at-or-
    before each purchase per user."""
    from toy_vector_db_spark.operators import relational

    return relational.asof_last_click(table(spark, sf_dir, "events"))


@register(
    "order_price_percentiles",
    f"""
    SELECT o_orderpriority, count(*) AS n,
           round(quantile_cont(o_totalprice, 0.25), {_R}) AS p25,
           round(quantile_cont(o_totalprice, 0.50), {_R}) AS p50,
           round(quantile_cont(o_totalprice, 0.75), {_R}) AS p75
    FROM orders GROUP BY o_orderpriority
    """,
)
def q_order_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (percentile ≡ quantile_cont)."""
    from toy_vector_db_spark.operators import relational

    return relational.order_price_percentiles(table(spark, sf_dir, "orders"))


@register(
    "parquet_sink_roundtrip",
    f"""
    SELECT strftime(o_orderdate, '%Y-%m') AS month,
           count(*) AS n_orders,
           round(sum(o_totalprice), {_R}) AS total,
           round(avg(o_totalprice), {_R}) AS avg_price
    FROM orders GROUP BY 1
    """,
)
def q_parquet_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partitioned parquet sink + read-back: the monthly stats written
    partitioned by month and re-read must hash-match the direct query."""
    from toy_vector_db_spark.operators import relational, sinks

    monthly = relational.monthly_order_stats(table(spark, sf_dir, "orders"))
    tag = sf_dir.rstrip("/").split("/")[-1]
    return sinks.parquet_roundtrip(
        monthly, spark, f"monthly_{tag}", partition_by="month"
    )


@register(
    "bucketed_join_revenue",
    """
    SELECT o_orderpriority,
           round(sum(l_extendedprice * (1 - l_discount)), 0) AS revenue,
           count(*) AS n_items
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY o_orderpriority
    """,
)
def q_bucketed_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed-sink co-located join: both fact tables written bucketed on
    orderkey, then sort-merge-joined with NO exchange and NO sort (plan
    pinned in tests/test_plans.py). The storage-layout lever for repeated
    fact-fact joins at 100 TB."""
    from toy_vector_db_spark.operators import sinks

    tag = sf_dir.rstrip("/").split("/")[-1]
    return sinks.bucketed_revenue_by_priority(
        table(spark, sf_dir, "lineitem"),
        table(spark, sf_dir, "orders"),
        spark,
        tag,
    )


@register(
    "csv_sink_roundtrip",
    """
    SELECT c_mktsegment, count(*) AS n_active
    FROM customer
    WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY c_mktsegment
    """,
)
def q_csv_sink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV sink + read-back of the segment stats — text-format round trip
    must preserve values exactly (oracle = the upstream query's SQL)."""
    from toy_vector_db_spark.operators import relational, sinks

    seg = relational.customers_with_orders_semi(
        table(spark, sf_dir, "customer"), table(spark, sf_dir, "orders")
    )
    tag = sf_dir.rstrip("/").split("/")[-1]
    return sinks.csv_roundtrip(seg, spark, f"segments_csv_{tag}")


@register("sketch_event_stats")
def q_sketch_event_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate distinct + approximate percentiles per event_type
    — constant sketch state per group at any cardinality. Rows-only driver
    check (cross-engine sketches differ by design); accuracy-vs-exact gated
    in tests/test_sketches.py."""
    from toy_vector_db_spark.operators import sketches

    return sketches.sketch_event_stats(table(spark, sf_dir, "events"))


from toy_vector_db_spark.operators.sketches import ROUND as sketches_ROUND  # noqa: E402


@register(
    "sketch_event_stats_exact",
    f"""
    SELECT event_type, count(*) AS n,
           count(DISTINCT user_id) AS exact_users,
           round(quantile_cont(value, 0.50), {sketches_ROUND}) AS exact_p50,
           round(quantile_cont(value, 0.95), {sketches_ROUND}) AS exact_p95
    FROM events GROUP BY event_type
    """,
)
def q_sketch_event_stats_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sketch path's exact-aggregate twin (round-6 verdict item 4):
    same grouping/row shape as sketch_event_stats with exact
    count-distinct + exact interpolated percentiles — fully oracle-able,
    so the sketch family's grouping and reference inputs get a driver
    hash while the estimates keep their error-bound gates."""
    from toy_vector_db_spark.operators import sketches

    return sketches.sketch_event_stats_exact(table(spark, sf_dir, "events"))


def _sliding_oracle() -> str:
    from toy_vector_db_spark.streaming import windows

    return windows.sliding_counts_oracle_sql(_R)


@register("streaming_sliding_counts", _sliding_oracle())
def q_streaming_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding event-time windows through the streaming engine. The oracle
    SQL is GENERATED from the operator's own window constants
    (streaming/windows.py: SLIDING_MINUTES/SLIDING_SLIDE), so geometry
    changes cannot silently desynchronize the two (advice r2)."""
    from toy_vector_db_spark.streaming import windows

    return windows.streaming_sliding_counts(spark, sf_dir)


@register(
    "streaming_dedup_counts",
    """
    SELECT event_type, count(DISTINCT user_id) AS n_unique_users
    FROM events GROUP BY event_type
    """,
)
def q_streaming_dedup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup (dropDuplicatesWithinWatermark) on
    (user_id, event_type); one-shot drain ≡ batch COUNT(DISTINCT)."""
    from toy_vector_db_spark.streaming import windows

    return windows.streaming_dedup_counts(spark, sf_dir)


@register(
    "streaming_stateful_user_stats",
    f"""
    SELECT user_id, count(*) AS n_events,
           round(sum(value), {_R}) AS total_value
    FROM events GROUP BY user_id
    """,
)
def q_streaming_stateful_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming (applyInPandasWithState): per-user running
    totals. The update-mode sink holds one emission per (user, batch); the
    LAST emission (max n_events — counts only grow) is the final state and
    equals the batch group-by, which IS the oracle (round-2 verdict item 4:
    this key was rows-only; its batch twin is plain SQL)."""
    from toy_vector_db_spark.streaming import windows

    res = windows.streaming_stateful_user_stats(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        res.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("user_id", "n_events", "total_value")
    )


@register(
    "first_sentence",
    """
    SELECT doc_id, split_part(text, '.', 1) AS first_sentence
    FROM documents
    """,
)
def q_first_sentence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3 result formatting: truncate body at the first '.'
    (src/main.rs:36-39, :52)."""
    docs = table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", TXT.first_sentence(F.col("text")).alias("first_sentence")
    )
