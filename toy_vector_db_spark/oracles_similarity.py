"""DuckDB oracle SQL for similarity-search and text-analysis operators.
Constants imported from the operator modules so the two sides can't drift."""

from __future__ import annotations

from toy_vector_db_spark.functions import vector as V
from toy_vector_db_spark.operators.similarity import (
    N_CENTROIDS,
    N_HYPERPLANES,
    N_PROBE,
    ROUND,
)
from toy_vector_db_spark.operators.textstats import (
    LANG_MARKERS,
    P31,
    STOPWORDS,
)

_TROUND = 6


def _cents_cte(base_cte: str = "base") -> str:
    return (
        f"cents AS (SELECT vec_id AS centroid_id, embedding AS centroid_vec "
        f"FROM {base_cte} WHERE vec_id < {N_CENTROIDS})"
    )


def kmeans_chain(
    prefix: str,
    n: int,
    iters: int,
    train_sql: str,
    metric_sql,
) -> str:
    """Unrolled deterministic Lloyd's k-means as CTEs, ending in
    ``{prefix}cents(centroid_id, centroid_vec)`` — the SQL twin of the
    engine's trained quantizers, bit-identical (asserted in
    tests/test_similarity.py at every SF):

    * assign: row_number over (metric, centroid_id) — the same total
      order as the engine's min-of-struct argmin;
    * update: per-(cell, dim) mean via ``list_reduce`` over member values
      ordered by vec_id — an explicitly SEQUENTIAL left fold seeded with a
      prepended 0.0, matching the engine's ``aggregate`` over
      ``sort_array(collect_list(...))`` add-for-add;
    * empty cells keep the previous centroid via LEFT JOIN + coalesce.

    ``train_sql`` must yield (vec_id, v DOUBLE[]); ``metric_sql`` is a
    (a, b) -> SQL-string callable (cosine for IVF, squared euclidean for
    PQ sub-codebooks).

    Every chain CTE is ``AS MATERIALIZED`` (round 8): each ``c{it}`` is
    referenced twice (by the next assign AND the empty-cell LEFT JOIN),
    so DuckDB's default inlining re-evaluates prefixes of the chain —
    at PQ_K=256 the un-materialized pq_train oracle measured 13.0 s at
    sf0.01 vs 2.98 s materialized (and materialization also beats the
    old PQ_K=64 un-materialized cost of 4.96 s). Values are unchanged —
    materialization is an evaluation strategy, not a semantic hint."""
    p = prefix
    d = metric_sql("t.v", "c.centroid_vec")
    ctes = [
        f"{p}train AS MATERIALIZED ({train_sql})",
        f"{p}c0 AS MATERIALIZED (SELECT vec_id AS centroid_id,"
        f" v AS centroid_vec FROM {p}train WHERE vec_id < {n})",
    ]
    for it in range(iters):
        prev, cur = f"{p}c{it}", f"{p}c{it + 1}"
        ctes.append(f"""{p}a{it} AS MATERIALIZED (
      SELECT vec_id, v, centroid_id FROM (
        SELECT t.vec_id, t.v, c.centroid_id,
               row_number() OVER (PARTITION BY t.vec_id
                                  ORDER BY {d} ASC, c.centroid_id ASC) AS rn
        FROM {p}train t, {prev} c) WHERE rn = 1)""")
        ctes.append(f"""{p}m{it} AS MATERIALIZED (
      SELECT centroid_id, list(s ORDER BY dim) AS mean_vec FROM (
        SELECT centroid_id, dim,
               list_reduce(list_prepend(0.0, list(val ORDER BY vec_id)),
                           (acc, x) -> acc + x) / count(*) AS s
        FROM (SELECT centroid_id, vec_id, unnest(v) AS val,
                     unnest(range(1, len(v) + 1)) AS dim FROM {p}a{it})
        GROUP BY centroid_id, dim)
      GROUP BY centroid_id)""")
        ctes.append(f"""{cur} AS MATERIALIZED (
      SELECT p.centroid_id, coalesce(m.mean_vec, p.centroid_vec) AS centroid_vec
      FROM {prev} p LEFT JOIN {p}m{it} m USING (centroid_id))""")
    ctes.append(
        f"{p}cents AS (SELECT centroid_id, centroid_vec FROM {p}c{iters})"
    )
    return ",\n    ".join(ctes)


def kmeans_ctes(
    n: int, iters: int, train_bound: int, base_cte: str = "base"
) -> str:
    """IVF instantiation: cosine metric over raw embeddings, final CTE
    named ``cents`` (kmeans_chain with an empty prefix)."""
    train_sql = (
        f"SELECT vec_id, embedding::DOUBLE[] AS v"
        f" FROM {base_cte} WHERE vec_id < {train_bound}"
    )
    return kmeans_chain("", n, iters, train_sql, V.sql_cosine_distance)


def _trained_cents_cte(base_cte: str = "base") -> str:
    from toy_vector_db_spark.operators.similarity import (
        KMEANS_ITERS,
        TRAIN_SAMPLE,
    )

    return kmeans_ctes(N_CENTROIDS, KMEANS_ITERS, TRAIN_SAMPLE, base_cte)


def ivf_train_sql(split_cte: str) -> str:
    """Trained centroids, exploded to (centroid_id, dim, val) scalar rows —
    the driver-hashable proof that both engines train the same floats."""
    return f"""
    WITH {split_cte},
    {_trained_cents_cte()}
    SELECT centroid_id, CAST(dim AS INT) AS dim, val
    FROM (SELECT centroid_id, unnest(centroid_vec) AS val,
                 unnest(range(0, len(centroid_vec))) AS dim
          FROM cents)
    """


def ivf_assign_sql(split_cte: str) -> str:
    d = V.sql_cosine_distance("b.embedding", "c.centroid_vec")
    return f"""
    WITH {split_cte},
    {_trained_cents_cte()},
    scored AS (
      SELECT b.vec_id, c.centroid_id, {d} AS d
      FROM base b, cents c),
    ranked AS (
      SELECT vec_id, centroid_id, d,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY d ASC, centroid_id ASC) AS rn
      FROM scored)
    SELECT vec_id, centroid_id, round(d, {ROUND}) AS dist
    FROM ranked WHERE rn = 1
    """


def knn_ivf_sql(split_cte: str, k: int) -> str:
    d_bc = V.sql_cosine_distance("b.embedding", "c.centroid_vec")
    d_qc = V.sql_cosine_distance("q.qv", "c.centroid_vec")
    d_bq = V.sql_cosine_distance("cv.embedding", "p.qv")
    return f"""
    WITH {split_cte},
    {_trained_cents_cte()},
    assign AS (
      SELECT vec_id, centroid_id FROM (
        SELECT b.vec_id, c.centroid_id,
               row_number() OVER (PARTITION BY b.vec_id
                                  ORDER BY {d_bc} ASC, c.centroid_id ASC) AS rn
        FROM base b, cents c)
      WHERE rn = 1),
    probes AS (
      SELECT query_id, qv, centroid_id FROM (
        SELECT q.query_id, q.qv, c.centroid_id,
               row_number() OVER (PARTITION BY q.query_id
                                  ORDER BY {d_qc} ASC, c.centroid_id ASC) AS rn
        FROM q, cents c)
      WHERE rn <= {N_PROBE}),
    cand AS (
      SELECT p.query_id, cv.vec_id, {d_bq} AS d
      FROM base cv
      JOIN assign a ON a.vec_id = cv.vec_id
      JOIN probes p ON p.centroid_id = a.centroid_id),
    ranked AS (
      SELECT query_id, vec_id, d,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY d ASC, vec_id ASC) AS rank
      FROM cand)
    SELECT query_id, vec_id, round(d, {ROUND}) AS dist, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= {k}
    """


def _sq_dist_sql(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(list_zip({a}, {b}),"
        f" p -> (p[1] - p[2]) * (p[1] - p[2])))"
    )


def _pq_layout() -> tuple[int, int, int, int]:
    from toy_vector_db_spark.operators.similarity import PQ_K, PQ_M

    dim = 64  # fixture embedding dim (verified constant across SFs)
    return PQ_M, PQ_K, dim, dim // PQ_M


def _norm_sql(v: str) -> str:
    """v/‖v‖ — mirrors similarity._normalize (list_dot_product ≡ the
    engine's sequential fold, established by the V1-V5 oracles)."""
    return (
        f"list_transform(({v})::DOUBLE[],"
        f" x -> x / sqrt(list_dot_product(({v})::DOUBLE[], ({v})::DOUBLE[])))"
    )


def _pq_books_ctes(train_pred: str | None = None) -> str:
    """Per-subspace trained PQ codebooks: PQ_M independent k-means chains
    over SLICES of the normalized vectors (squared-euclidean metric —
    normalize-then-euclid ≡ cosine), joined into one
    ``cents(k, s0..s{M-1})`` table. SQL twin of
    similarity.trained_pq_codebooks. ``train_pred`` overrides the
    training-set bound (default the TRAIN_SAMPLE cap) — the upsert keys
    bound training to the INITIAL corpus slice (frozen quantizers)."""
    from toy_vector_db_spark.operators.similarity import (
        KMEANS_ITERS,
        TRAIN_SAMPLE,
    )

    if train_pred is None:
        train_pred = f"vec_id < {TRAIN_SAMPLE}"
    m_, k_, _, sub = _pq_layout()
    chains = []
    for m in range(m_):
        train_sql = (
            f"SELECT vec_id, (nv)[{m * sub + 1}:{(m + 1) * sub}] AS v"
            f" FROM nb WHERE {train_pred}"
        )
        chains.append(
            kmeans_chain(f"pq{m}_", k_, KMEANS_ITERS, train_sql, _sq_dist_sql)
        )
    joins = " ".join(
        f"JOIN pq{m}_cents b{m} ON b{m}.centroid_id = b0.centroid_id"
        for m in range(1, m_)
    )
    # MATERIALIZED: the ADC queries join this CTE PQ_M times (x0..x{M-1});
    # without the hint DuckDB re-evaluates the entire upstream k-means
    # chain per reference (measured 81 s → 3.6 s at sf0.01, K=64)
    cents = (
        f"cents AS MATERIALIZED (SELECT b0.centroid_id AS k, b0.centroid_vec AS s0, "
        + ", ".join(f"b{m}.centroid_vec AS s{m}" for m in range(1, m_))
        + f" FROM pq0_cents b0 {joins})"
        if m_ > 1
        else "cents AS MATERIALIZED (SELECT centroid_id AS k, centroid_vec AS s0 FROM pq0_cents)"
    )
    return ",\n    ".join(chains + [cents])


def _pq_common_ctes(split_cte: str, train_pred: str | None = None) -> str:
    m_, _, _, sub = _pq_layout()
    d_cols = ",\n             ".join(
        _sq_dist_sql(
            f"(b.nv)[{m * sub + 1}:{(m + 1) * sub}]",
            f"c.s{m}",
        )
        + f" AS d{m}"
        for m in range(m_)
    )
    code_cols = ",\n           ".join(
        f"CAST(min(struct_pack(d := d{m}, k := k))['k'] AS INT) AS c{m}"
        for m in range(m_)
    )
    return f"""
    {split_cte},
    nb AS MATERIALIZED (SELECT vec_id, {_norm_sql('embedding')} AS nv FROM base),
    {_pq_books_ctes(train_pred)},
    scored AS (
      SELECT b.vec_id, c.k,
             {d_cols}
      FROM nb b, cents c),
    codes AS MATERIALIZED (SELECT vec_id, {code_cols}
              FROM scored GROUP BY vec_id)
    """


def pq_train_sql(split_cte: str) -> str:
    """Trained per-subspace PQ codebooks, exploded to (m, k, dim, val)
    scalar rows — the driver-hashable training-parity proof for PQ."""
    m_ = _pq_layout()[0]
    unions = " UNION ALL ".join(
        f"SELECT {m} AS m, centroid_id AS k, unnest(centroid_vec) AS val,"
        f" unnest(range(0, len(centroid_vec))) AS dim FROM pq{m}_cents"
        for m in range(m_)
    )
    return f"""
    WITH {split_cte},
    nb AS (SELECT vec_id, {_norm_sql('embedding')} AS nv FROM base),
    {_pq_books_ctes()}
    SELECT CAST(m AS INT) AS m, CAST(k AS INT) AS k,
           CAST(dim AS INT) AS dim, val
    FROM ({unions})
    """


def pq_codes_sql(split_cte: str) -> str:
    m_ = _pq_layout()[0]
    cols = ", ".join(f"c{m}" for m in range(m_))
    return f"""
    WITH {_pq_common_ctes(split_cte)}
    SELECT vec_id, {cols} FROM codes
    """


def knn_pq_adc_sql(split_cte: str, k: int) -> str:
    m_, _, _, sub = _pq_layout()
    joins = "\n      ".join(
        f"JOIN cents x{m} ON x{m}.k = co.c{m}" for m in range(m_)
    )
    adc = " + ".join(
        _sq_dist_sql(
            f"(nq.nv)[{m * sub + 1}:{(m + 1) * sub}]",
            f"x{m}.s{m}",
        )
        for m in range(m_)
    )
    return f"""
    WITH {_pq_common_ctes(split_cte)},
    nq AS (SELECT query_id, {_norm_sql('qv')} AS nv FROM q),
    cand AS (
      SELECT nq.query_id, co.vec_id, {adc} AS ad2
      FROM codes co
      {joins}, nq),
    ranked AS (
      SELECT query_id, vec_id, ad2,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY ad2 ASC, vec_id ASC) AS rank
      FROM cand)
    SELECT query_id, vec_id, round(ad2, {ROUND}) AS approx_dist2,
           CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= {k}
    """


def rerank_budget_sql(k: int, base_cte: str = "base") -> str:
    """SQL twin of similarity._rerank_budget: R = max(RERANK_MULT·k,
    min(ceildiv(n_base, RERANK_DEN), RERANK_CAP)) with the count as a
    scalar subquery and integer ceil-division — bit-exact cross-engine
    (no float ceil; LEAST/GREATEST mirror Python's min/max on ints)."""
    from toy_vector_db_spark.operators.similarity import (
        RERANK_CAP,
        RERANK_DEN,
        RERANK_MULT,
    )

    return (
        f"greatest({RERANK_MULT * k}, least((SELECT (count(*) + "
        f"{RERANK_DEN - 1}) // {RERANK_DEN} FROM {base_cte}), "
        f"{RERANK_CAP}))"
    )


def bq_rerank_budget_sql(k: int, base_cte: str = "base") -> str:
    """SQL twin of knn_bq_rerank's deeper floor (round 8): R_bq =
    max(BQ_RERANK_MULT·k, shared scale-aware budget). BQ's 8 B/vector
    Hamming scan affords a 2× rerank at equal total cost — the lever
    that clears its ≥0.70 recall floor (0.854 measured at sf0.1)."""
    from toy_vector_db_spark.operators.similarity import BQ_RERANK_MULT

    return (
        f"greatest({BQ_RERANK_MULT * k}, {rerank_budget_sql(k, base_cte)})"
    )


def knn_pq_rerank_sql(split_cte: str, k: int, rerank_r: int | str) -> str:
    m_, _, _, sub = _pq_layout()
    joins = "\n      ".join(
        f"JOIN cents x{m} ON x{m}.k = co.c{m}" for m in range(m_)
    )
    adc = " + ".join(
        _sq_dist_sql(
            f"(nq.nv)[{m * sub + 1}:{(m + 1) * sub}]",
            f"x{m}.s{m}",
        )
        for m in range(m_)
    )
    d_exact = V.sql_cosine_distance("b.embedding", "q.qv")
    return f"""
    WITH {_pq_common_ctes(split_cte)},
    nq AS (SELECT query_id, {_norm_sql('qv')} AS nv FROM q),
    cand AS (
      SELECT nq.query_id, co.vec_id, {adc} AS ad2
      FROM codes co
      {joins}, nq),
    pruned AS (
      SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY ad2 ASC, vec_id ASC) AS rr
        FROM cand)
      WHERE rr <= {rerank_r}),
    rescored AS (
      SELECT p.query_id, p.vec_id, {d_exact} AS d
      FROM pruned p
      JOIN base b ON b.vec_id = p.vec_id
      JOIN q ON q.query_id = p.query_id),
    ranked AS (
      SELECT query_id, vec_id, d,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY d ASC, vec_id ASC) AS rank
      FROM rescored)
    SELECT query_id, vec_id, round(d, {ROUND}) AS dist, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= {k}
    """


def ivfpq_build_sql(split_cte: str) -> str:
    """Per-cell invariants of the IVF-PQ build artifact (the cell-keyed
    compressed corpus knn_ivfpq scans): row count and per-subspace code
    sums for every IVF cell — a deterministic, driver-hashable proof that
    both engines write the same codes into the same cells. SQL twin of
    registry q_ivfpq_build over similarity.cached_codes_cells."""
    from toy_vector_db_spark.operators.similarity import (
        KMEANS_ITERS,
        TRAIN_SAMPLE,
    )

    m_ = _pq_layout()[0]
    ivf_train = (
        f"SELECT vec_id, embedding::DOUBLE[] AS v"
        f" FROM base WHERE vec_id < {TRAIN_SAMPLE}"
    )
    ivf_chain = kmeans_chain(
        "ivf_", N_CENTROIDS, KMEANS_ITERS, ivf_train, V.sql_cosine_distance
    )
    d_bc = V.sql_cosine_distance("b.embedding", "c.centroid_vec")
    sums = ",\n           ".join(
        f"CAST(sum(co.c{m}) AS BIGINT) AS sum_c{m}" for m in range(m_)
    )
    return f"""
    WITH {_pq_common_ctes(split_cte)},
    {ivf_chain},
    assign AS (
      SELECT vec_id, centroid_id FROM (
        SELECT b.vec_id, c.centroid_id,
               row_number() OVER (PARTITION BY b.vec_id
                                  ORDER BY {d_bc} ASC, c.centroid_id ASC) AS rn
        FROM base b, ivf_cents c)
      WHERE rn = 1)
    SELECT a.centroid_id, count(*) AS n_vectors,
           {sums}
    FROM codes co JOIN assign a USING (vec_id)
    GROUP BY a.centroid_id
    """


def hnsw_routed_build_sql(split_cte: str) -> str:
    """Per-cell invariants of the ROUTED graph index build (round 9,
    verdict r8 item 3 — the ivfpq_build pattern on the graph family):
    the routed index shards the corpus by the SAME deterministic-k-means
    IVF assignment the compressed families use, so the cell structure
    (centroid_id, member count) is fully SQL-expressible; the graph-side
    facts (out-degree ≤ M_max, emitting layer-0 nodes ≤ members) are
    NOT, so the Spark side reduces them to per-cell gate booleans that
    are provably TRUE for a correct build and this oracle asserts them.
    A routed-build regression — wrong cell routing, a cell dropped, a
    degree-bound violation — now turns a driver hash row red."""
    from toy_vector_db_spark.operators.similarity import (
        KMEANS_ITERS,
        TRAIN_SAMPLE,
    )

    ivf_train = (
        f"SELECT vec_id, embedding::DOUBLE[] AS v"
        f" FROM base WHERE vec_id < {TRAIN_SAMPLE}"
    )
    ivf_chain = kmeans_chain(
        "ivf_", N_CENTROIDS, KMEANS_ITERS, ivf_train, V.sql_cosine_distance
    )
    d_bc = V.sql_cosine_distance("b.embedding", "c.centroid_vec")
    return f"""
    WITH {split_cte},
    {ivf_chain},
    assign AS (
      SELECT vec_id, centroid_id FROM (
        SELECT b.vec_id, c.centroid_id,
               row_number() OVER (PARTITION BY b.vec_id
                                  ORDER BY {d_bc} ASC, c.centroid_id ASC) AS rn
        FROM base b, ivf_cents c)
      WHERE rn = 1)
    SELECT centroid_id, count(*) AS n_vectors,
           TRUE AS degree_ok, TRUE AS nodes_ok
    FROM assign
    GROUP BY centroid_id
    """


def _ivf_probes_ctes(
    cents_name: str,
    nprobe: int | str,
    label_probe_r: int | str | None,
) -> str:
    """The shared probe-selection CTE block for every IVF-gated oracle
    (knn_ivfpq_sql, knn_ivfsq_sql — one histogram, one probe rule, any
    fine code), parameterized by the coarse-centroid CTE name so it
    coexists with whatever other ``cents`` CTEs the caller declares.
    Plain mode: nprobe nearest cells per query. ``label_probe_r`` mode:
    the SQL twin of similarity._ivf_probes_labeled — a per-label
    cell-hit histogram over the assignment, cells ranked by centroid
    distance WITHIN the query's label, probed until the cumulative
    label-row count reaches the budget (nprobe-cell floor); requires
    lbl/qlbl CTEs and an ``assign`` CTE in scope."""
    d_qc = V.sql_cosine_distance("q.qv", "c.centroid_vec")
    if label_probe_r is None:
        return f"""probes AS (
      SELECT query_id, centroid_id FROM (
        SELECT q.query_id, c.centroid_id,
               row_number() OVER (PARTITION BY q.query_id
                                  ORDER BY {d_qc} ASC, c.centroid_id ASC) AS rn
        FROM q, {cents_name} c)
      WHERE rn <= {nprobe})"""
    order = f"{d_qc} ASC, c.centroid_id ASC"
    return f"""lhist AS MATERIALIZED (
      SELECT l.label, a.centroid_id, count(*) AS cnt
      FROM assign a JOIN lbl l ON l.vec_id = a.vec_id
      GROUP BY l.label, a.centroid_id),
    probes AS (
      SELECT query_id, centroid_id FROM (
        SELECT q.query_id, c.centroid_id,
               row_number() OVER (PARTITION BY q.query_id
                                  ORDER BY {order}) AS rn,
               coalesce(sum(h.cnt) OVER (PARTITION BY q.query_id
                                  ORDER BY {order}
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND 1 PRECEDING), 0) AS cumprev
        FROM q
        JOIN qlbl ql ON ql.query_id = q.query_id
        JOIN lhist h ON h.label = ql.qlabel
        JOIN {cents_name} c ON c.centroid_id = h.centroid_id)
      WHERE rn <= {nprobe} OR cumprev < {label_probe_r})"""


def knn_ivfpq_sql(
    split_cte: str,
    k: int,
    nprobe: int | str,
    rerank_r: int | str,
    train_pred: str | None = None,
    cand_pred: str | None = None,
    extra_cand_joins: str = "",
    label_probe_r: int | str | None = None,
) -> str:
    """IVF-PQ serving plan: coarse-cell probe (cosine, trained centroids)
    → ADC over PQ codes WITHIN probed cells only → exact rerank of the R
    survivors. SQL twin of similarity.knn_ivfpq; the coarse k-means chain
    is prefixed ``ivf_`` to coexist with the PQ codebook ``cents`` CTE.
    ``train_pred`` bounds BOTH quantizers' training sets (upsert keys:
    the initial slice — frozen quantizers; default: TRAIN_SAMPLE cap).
    ``cand_pred`` filters the candidate code rows (delete key: the
    tombstone exclusion — rows deleted from the index never score).
    ``extra_cand_joins`` adds joins to the cand CTE so ``cand_pred`` can
    reference attribute tables (filtered key: base/query labels).
    ``label_probe_r`` (round 8): when set, probe selection itself is
    label-aware — the SQL twin of similarity._ivf_probes_labeled: a
    per-label cell-hit histogram from the assignment, cells ranked by
    centroid distance WITHIN the query's label, probed until the
    cumulative label-row count reaches the rerank budget (nprobe-cell
    floor). Requires lbl/qlbl CTEs in ``split_cte``."""
    from toy_vector_db_spark.operators.similarity import (
        KMEANS_ITERS,
        TRAIN_SAMPLE,
    )

    if train_pred is None:
        train_pred = f"vec_id < {TRAIN_SAMPLE}"
    cand_where = cand_pred if cand_pred is not None else "TRUE"
    m_, _, _, sub = _pq_layout()
    ivf_train = (
        f"SELECT vec_id, embedding::DOUBLE[] AS v"
        f" FROM base WHERE {train_pred}"
    )
    ivf_chain = kmeans_chain(
        "ivf_", N_CENTROIDS, KMEANS_ITERS, ivf_train, V.sql_cosine_distance
    )
    d_bc = V.sql_cosine_distance("b.embedding", "c.centroid_vec")
    d_exact = V.sql_cosine_distance("b.embedding", "q.qv")
    joins = "\n      ".join(
        f"JOIN cents x{m} ON x{m}.k = co.c{m}" for m in range(m_)
    )
    adc = " + ".join(
        _sq_dist_sql(
            f"(nq.nv)[{m * sub + 1}:{(m + 1) * sub}]",
            f"x{m}.s{m}",
        )
        for m in range(m_)
    )
    probes_cte = _ivf_probes_ctes("ivf_cents", nprobe, label_probe_r)
    return f"""
    WITH {_pq_common_ctes(split_cte, train_pred)},
    {ivf_chain},
    assign AS MATERIALIZED (
      SELECT vec_id, centroid_id FROM (
        SELECT b.vec_id, c.centroid_id,
               row_number() OVER (PARTITION BY b.vec_id
                                  ORDER BY {d_bc} ASC, c.centroid_id ASC) AS rn
        FROM base b, ivf_cents c)
      WHERE rn = 1),
    {probes_cte},
    nq AS (SELECT query_id, {_norm_sql('qv')} AS nv FROM q),
    cand AS (
      SELECT p.query_id, co.vec_id, {adc} AS ad2
      FROM codes co
      JOIN assign a ON a.vec_id = co.vec_id
      JOIN probes p ON p.centroid_id = a.centroid_id
      JOIN nq ON nq.query_id = p.query_id
      {joins}
      {extra_cand_joins}
      WHERE {cand_where}),
    pruned AS (
      SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY ad2 ASC, vec_id ASC) AS rr
        FROM cand)
      WHERE rr <= {rerank_r}),
    rescored AS (
      SELECT p.query_id, p.vec_id, {d_exact} AS d
      FROM pruned p
      JOIN base b ON b.vec_id = p.vec_id
      JOIN q ON q.query_id = p.query_id),
    ranked AS (
      SELECT query_id, vec_id, d,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY d ASC, vec_id ASC) AS rank
      FROM rescored)
    SELECT query_id, vec_id, round(d, {ROUND}) AS dist, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= {k}
    """


def _bq_pack_sql(v: str, start: int) -> str:
    """SQL twin of similarity._bq_pack: sign bits of BQ_HALF dims from
    1-based ``start`` packed MSB-first into a BIGINT via the same left
    fold (DuckDB list slicing is 1-based inclusive)."""
    from toy_vector_db_spark.operators.similarity import BQ_HALF

    return (
        f"list_reduce(list_prepend(0::BIGINT,"
        f" list_transform(({v})[{start}:{start + BQ_HALF - 1}],"
        f" x -> CASE WHEN x > 0 THEN 1 ELSE 0 END)),"
        f" (a, x) -> a * 2 + x)"
    )


def bq_codes_sql(split_cte: str) -> str:
    from toy_vector_db_spark.operators.similarity import BQ_HALF

    return f"""
    WITH {split_cte}
    SELECT vec_id,
           {_bq_pack_sql('embedding', 1)} AS b_hi,
           {_bq_pack_sql('embedding', BQ_HALF + 1)} AS b_lo
    FROM base
    """


def knn_bq_rerank_sql(
    split_cte: str,
    k: int,
    rerank_r: int | str,
    cand_pred: str | None = None,
    extra_cand_joins: str = "",
) -> str:
    """BQ serving oracle: Hamming prune over the packed sign bits
    (bit_count(xor) per half) to R candidates, exact cosine rerank —
    the SQL twin of similarity.knn_bq_rerank. ``cand_pred`` +
    ``extra_cand_joins`` mirror knn_ivfpq_sql's hooks (round 8: the
    filtered key's label-equality joins, applied before the top-R
    cut)."""
    from toy_vector_db_spark.operators.similarity import BQ_HALF

    cand_where = cand_pred if cand_pred is not None else "TRUE"
    d_exact = V.sql_cosine_distance("b.embedding", "q.qv")
    return f"""
    WITH {split_cte},
    codes AS (
      SELECT vec_id,
             {_bq_pack_sql('embedding', 1)} AS b_hi,
             {_bq_pack_sql('embedding', BQ_HALF + 1)} AS b_lo
      FROM base),
    qcodes AS (
      SELECT query_id,
             {_bq_pack_sql('qv', 1)} AS q_hi,
             {_bq_pack_sql('qv', BQ_HALF + 1)} AS q_lo
      FROM q),
    cand AS (
      SELECT qc.query_id, co.vec_id,
             bit_count(xor(co.b_hi, qc.q_hi))
               + bit_count(xor(co.b_lo, qc.q_lo)) AS h
      FROM codes co, qcodes qc
      {extra_cand_joins}
      WHERE {cand_where}),
    pruned AS (
      SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY h ASC, vec_id ASC) AS rr
        FROM cand)
      WHERE rr <= {rerank_r}),
    rescored AS (
      SELECT p.query_id, p.vec_id, {d_exact} AS d
      FROM pruned p
      JOIN base b ON b.vec_id = p.vec_id
      JOIN q ON q.query_id = p.query_id),
    ranked AS (
      SELECT query_id, vec_id, d,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY d ASC, vec_id ASC) AS rank
      FROM rescored)
    SELECT query_id, vec_id, round(d, {ROUND}) AS dist, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= {k}
    """


def _sq_common_ctes(split_cte: str, bounds_pred: str = "TRUE") -> str:
    """Shared SQ8 CTEs: normalized base, per-dim bounds (exact min/max
    selections — bit-identical cross-engine by construction), and the
    one-row bounds list — SQL twin of similarity.sq_bounds. The unnest
    route is fine HERE (oracle at fixture scale); the engine side
    deliberately avoids it (64× row blowup at 100 TB) via 128
    partial-agg expressions. ``bounds_pred`` restricts the min/max scan
    (upsert key: the frozen initial slice — the SQL twin of
    similarity.sq_upsert's frozen-bounds contract); codes are always
    computed over the full base under those bounds, which is exactly
    what frozen-bounds append produces (per-row encode)."""
    from toy_vector_db_spark.operators.similarity import SQ_LEVELS

    return f"""{split_cte},
    nb AS (SELECT vec_id, {_norm_sql('embedding')} AS nv FROM base),
    sqdim AS (SELECT vec_id, unnest(nv) AS x,
                     generate_subscripts(nv, 1) AS dim
              FROM nb WHERE {bounds_pred}),
    sqb AS (SELECT dim, min(x) AS mn, max(x) AS mx
            FROM sqdim GROUP BY dim),
    sqbounds AS (SELECT list(mn ORDER BY dim) AS mins,
                        list(mx ORDER BY dim) AS maxs
                 FROM sqb),
    sqcodes AS (
      SELECT vec_id,
             list_transform(list_zip(nv, mins, maxs),
               p -> CASE WHEN p[3] = p[2] THEN 0
                         ELSE CAST(least({SQ_LEVELS}.0, greatest(0.0,
                              floor((p[1] - p[2]) * {SQ_LEVELS}.0
                                    / (p[3] - p[2])))) AS INT) END
             ) AS codes
      FROM nb, sqbounds)"""


def _bq2_common_ctes(split_cte: str, bounds_pred: str = "TRUE") -> str:
    """Shared BQ2 CTEs (round 9): normalized base, per-dim |nv| max
    (exact selection — bit-identical cross-engine), 2-bit sign+magnitude
    codes, and the per-code reconstruction — SQL twins of
    similarity.bq2_bounds / bq2_code_array / _bq2_recon, op for op
    (sign·(level·mx), level ∈ {BQ2_LO, BQ2_HI}). ``bounds_pred``
    restricts the max scan (the upsert key's frozen initial slice —
    similarity.bq2_upsert's contract); codes are always computed over
    the full base under those bounds, which is exactly what
    frozen-bounds append produces (per-row encode)."""
    from toy_vector_db_spark.operators.similarity import BQ2_HI, BQ2_LO

    return f"""{split_cte},
    nb AS (SELECT vec_id, {_norm_sql('embedding')} AS nv FROM base),
    b2dim AS (SELECT vec_id, unnest(nv) AS x,
                     generate_subscripts(nv, 1) AS dim
              FROM nb WHERE {bounds_pred}),
    b2b AS (SELECT dim, max(abs(x)) AS mx FROM b2dim GROUP BY dim),
    b2bounds AS (SELECT list(mx ORDER BY dim) AS mx FROM b2b),
    b2codes AS (
      SELECT vec_id,
             list_transform(list_zip(nv, mx),
               p -> CAST((CASE WHEN p[1] > 0 THEN 2 ELSE 0 END
                        + CASE WHEN abs(p[1]) > p[2] / 2 THEN 1 ELSE 0 END)
                    AS INT)) AS codes
      FROM nb, b2bounds),
    b2recon AS (
      SELECT c.vec_id,
             list_transform(list_zip(c.codes, b.mx),
               p -> (CASE WHEN p[1] >= 2 THEN 1.0 ELSE -1.0 END)
                    * ((CASE WHEN p[1] % 2 = 1 THEN {BQ2_HI}
                             ELSE {BQ2_LO} END) * p[2])) AS recon
      FROM b2codes c, b2bounds b)"""


def bq2_codes_sql(split_cte: str) -> str:
    """Exploded 2-bit codes (vec_id, dim, code) — SQL twin of
    similarity.bq2_codes (0-based dim to match posexplode)."""
    return f"""
    WITH {_bq2_common_ctes(split_cte)}
    SELECT vec_id,
           CAST(generate_subscripts(codes, 1) - 1 AS INT) AS dim,
           unnest(codes) AS code
    FROM b2codes
    """


def knn_bq2_rerank_sql(
    split_cte: str,
    k: int,
    rerank_r: int | str,
    cand_pred: str | None = None,
    bounds_pred: str = "TRUE",
) -> str:
    """BQ2 serving oracle: clamped-cosine candidate scores between each
    code's reconstruction and the raw query, top-R prune at the SHARED
    budget, exact cosine rerank — the SQL twin of
    similarity.knn_bq2_rerank. ``cand_pred`` is the delete key's
    tombstone exclusion (deleted code rows never become candidates);
    ``bounds_pred`` bounds the max scan (upsert key: the frozen initial
    slice) — the knn_sq_rerank_sql lifecycle hooks."""
    cand_where = cand_pred if cand_pred is not None else "TRUE"
    d_code = V.sql_cosine_distance("r.recon", "q.qv")
    d_exact = V.sql_cosine_distance("b.embedding", "q.qv")
    return f"""
    WITH {_bq2_common_ctes(split_cte, bounds_pred)},
    cand AS (
      SELECT q.query_id, r.vec_id, {d_code} AS cd
      FROM b2recon r, q
      WHERE {cand_where}),
    pruned AS (
      SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cd ASC, vec_id ASC) AS rr
        FROM cand)
      WHERE rr <= {rerank_r}),
    rescored AS (
      SELECT p.query_id, p.vec_id, {d_exact} AS d
      FROM pruned p
      JOIN base b ON b.vec_id = p.vec_id
      JOIN q ON q.query_id = p.query_id),
    ranked AS (
      SELECT query_id, vec_id, d,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY d ASC, vec_id ASC) AS rank
      FROM rescored)
    SELECT query_id, vec_id, round(d, {ROUND}) AS dist, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= {k}
    """


def knn_ivfbq2_sql(
    split_cte: str,
    k: int,
    nprobe: int,
    rerank_r: int | str,
    cand_pred: str | None = None,
    extra_cand_joins: str = "",
    label_probe_r: int | str | None = None,
) -> str:
    """IVF-BQ2 serving oracle (round 9 — the matrix's fourth column):
    the knn_ivf probe chain (trained coarse centroids → nearest-cell
    assignment → nprobe probes per query) gating the BQ2
    reconstruction-cosine prune of knn_bq2_rerank_sql, then the shared
    top-R prune and exact rerank. Filtered hooks are knn_ivfsq_sql's,
    identically shaped."""
    d_bc = V.sql_cosine_distance("b.embedding", "c.centroid_vec")
    d_code = V.sql_cosine_distance("r.recon", "q.qv")
    d_exact = V.sql_cosine_distance("b.embedding", "q.qv")
    cand_where = cand_pred if cand_pred is not None else "TRUE"
    probes_cte = _ivf_probes_ctes("cents", nprobe, label_probe_r)
    return f"""
    WITH {_bq2_common_ctes(split_cte)},
    {_trained_cents_cte()},
    assign AS MATERIALIZED (
      SELECT vec_id, centroid_id FROM (
        SELECT b.vec_id, c.centroid_id,
               row_number() OVER (PARTITION BY b.vec_id
                                  ORDER BY {d_bc} ASC, c.centroid_id ASC) AS rn
        FROM base b, cents c)
      WHERE rn = 1),
    {probes_cte},
    cand AS (
      SELECT p.query_id, r.vec_id, {d_code} AS cd
      FROM b2recon r
      JOIN assign a ON a.vec_id = r.vec_id
      JOIN probes p ON p.centroid_id = a.centroid_id
      JOIN q ON q.query_id = p.query_id
      {extra_cand_joins}
      WHERE {cand_where}),
    pruned AS (
      SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cd ASC, vec_id ASC) AS rr
        FROM cand)
      WHERE rr <= {rerank_r}),
    rescored AS (
      SELECT p.query_id, p.vec_id, {d_exact} AS d
      FROM pruned p
      JOIN base b ON b.vec_id = p.vec_id
      JOIN q ON q.query_id = p.query_id),
    ranked AS (
      SELECT query_id, vec_id, d,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY d ASC, vec_id ASC) AS rank
      FROM rescored)
    SELECT query_id, vec_id, round(d, {ROUND}) AS dist, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= {k}
    """


def sq_train_sql(split_cte: str) -> str:
    """Exploded per-dim bounds (dim, mn, mx) — SQL twin of
    similarity.sq_train (0-based dim to match posexplode)."""
    return f"""
    WITH {_sq_common_ctes(split_cte)}
    SELECT CAST(dim - 1 AS INT) AS dim, mn, mx FROM sqb
    """


def sq_codes_sql(split_cte: str) -> str:
    """Exploded 8-bit codes (vec_id, dim, code) — SQL twin of
    similarity.sq_codes; clamped IEEE-double arithmetic in the exact
    engine op order (subtract, multiply by 255.0, divide, floor, clamp,
    one final int cast)."""
    return f"""
    WITH {_sq_common_ctes(split_cte)}
    SELECT vec_id,
           CAST(generate_subscripts(codes, 1) - 1 AS INT) AS dim,
           unnest(codes) AS code
    FROM sqcodes
    """


def knn_sq_rerank_sql(
    split_cte: str,
    k: int,
    rerank_r: int | str,
    cand_pred: str | None = None,
    extra_cand_joins: str = "",
    bounds_pred: str = "TRUE",
) -> str:
    """SQ8 serving oracle: dequantize each code array to the bin
    midpoint, squared-euclidean ADC against the normalized query, top-R
    prune, exact cosine rerank — the SQL twin of
    similarity.knn_sq_rerank. ``cand_pred`` + ``extra_cand_joins``
    mirror knn_bq_rerank_sql's filtered-search hooks (label-equality
    joins applied before the top-R cut); ``cand_pred`` is also the
    delete key's tombstone exclusion (deleted code rows never become
    candidates). ``bounds_pred`` bounds the min/max training scan
    (upsert key: the frozen initial slice)."""
    from toy_vector_db_spark.operators.similarity import SQ_LEVELS

    cand_where = cand_pred if cand_pred is not None else "TRUE"
    d_exact = V.sql_cosine_distance("b.embedding", "q.qv")
    return f"""
    WITH {_sq_common_ctes(split_cte, bounds_pred)},
    deq AS (
      SELECT vec_id,
             list_transform(list_zip(codes, mins, maxs),
               p -> p[2] + (CAST(p[1] AS DOUBLE) + 0.5)
                           * (p[3] - p[2]) / {SQ_LEVELS}.0) AS dq
      FROM sqcodes, sqbounds),
    nq AS (SELECT query_id, {_norm_sql('qv')} AS qnv FROM q),
    cand AS (
      SELECT nq.query_id, d.vec_id,
             {_sq_dist_sql('d.dq', 'nq.qnv')} AS ad2
      FROM deq d, nq
      {extra_cand_joins}
      WHERE {cand_where}),
    pruned AS (
      SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY ad2 ASC, vec_id ASC) AS rr
        FROM cand)
      WHERE rr <= {rerank_r}),
    rescored AS (
      SELECT p.query_id, p.vec_id, {d_exact} AS d
      FROM pruned p
      JOIN base b ON b.vec_id = p.vec_id
      JOIN q ON q.query_id = p.query_id),
    ranked AS (
      SELECT query_id, vec_id, d,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY d ASC, vec_id ASC) AS rank
      FROM rescored)
    SELECT query_id, vec_id, round(d, {ROUND}) AS dist, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= {k}
    """


def knn_ivfsq_sql(
    split_cte: str,
    k: int,
    nprobe: int,
    rerank_r: int | str,
    cand_pred: str | None = None,
    extra_cand_joins: str = "",
    label_probe_r: int | str | None = None,
    train_pred: str | None = None,
    bounds_pred: str = "TRUE",
) -> str:
    """IVF-SQ serving oracle (round 8 — the IndexIVFScalarQuantizer
    composition): the knn_ivf probe chain (trained coarse centroids →
    nearest-cell assignment → nprobe probes per query) gating the SQ8
    dequantized-ADC scan of knn_sq_rerank_sql — candidates exist only
    where a code row's cell is probed by the query — then the shared
    top-R prune and exact cosine rerank. The filtered-search hooks
    (``cand_pred``/``extra_cand_joins``/``label_probe_r``) are
    knn_ivfpq_sql's, identically shaped: label-equality joins applied
    before the top-R cut, and histogram-guided probe selection via the
    per-label cell-hit cumsum rule (requires lbl/qlbl CTEs in
    ``split_cte``). The lifecycle hooks are the per-family pair:
    ``train_pred`` bounds the coarse k-means training set and
    ``bounds_pred`` the SQ min/max scan (upsert key: both frozen to the
    initial slice); ``cand_pred`` doubles as the delete key's tombstone
    exclusion."""
    from toy_vector_db_spark.operators.similarity import (
        KMEANS_ITERS,
        SQ_LEVELS,
    )

    d_bc = V.sql_cosine_distance("b.embedding", "c.centroid_vec")
    d_exact = V.sql_cosine_distance("b.embedding", "q.qv")
    cand_where = cand_pred if cand_pred is not None else "TRUE"
    probes_cte = _ivf_probes_ctes("cents", nprobe, label_probe_r)
    if train_pred is None:
        cents_cte = _trained_cents_cte()
    else:
        cents_cte = kmeans_chain(
            "",
            N_CENTROIDS,
            KMEANS_ITERS,
            (
                f"SELECT vec_id, embedding::DOUBLE[] AS v"
                f" FROM base WHERE {train_pred}"
            ),
            V.sql_cosine_distance,
        )
    return f"""
    WITH {_sq_common_ctes(split_cte, bounds_pred)},
    {cents_cte},
    assign AS MATERIALIZED (
      SELECT vec_id, centroid_id FROM (
        SELECT b.vec_id, c.centroid_id,
               row_number() OVER (PARTITION BY b.vec_id
                                  ORDER BY {d_bc} ASC, c.centroid_id ASC) AS rn
        FROM base b, cents c)
      WHERE rn = 1),
    {probes_cte},
    deq AS (
      SELECT vec_id,
             list_transform(list_zip(codes, mins, maxs),
               p -> p[2] + (CAST(p[1] AS DOUBLE) + 0.5)
                           * (p[3] - p[2]) / {SQ_LEVELS}.0) AS dq
      FROM sqcodes, sqbounds),
    nq AS (SELECT query_id, {_norm_sql('qv')} AS qnv FROM q),
    cand AS (
      SELECT p.query_id, d.vec_id,
             {_sq_dist_sql('d.dq', 'nq.qnv')} AS ad2
      FROM deq d
      JOIN assign a ON a.vec_id = d.vec_id
      JOIN probes p ON p.centroid_id = a.centroid_id
      JOIN nq ON nq.query_id = p.query_id
      {extra_cand_joins}
      WHERE {cand_where}),
    pruned AS (
      SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY ad2 ASC, vec_id ASC) AS rr
        FROM cand)
      WHERE rr <= {rerank_r}),
    rescored AS (
      SELECT p.query_id, p.vec_id, {d_exact} AS d
      FROM pruned p
      JOIN base b ON b.vec_id = p.vec_id
      JOIN q ON q.query_id = p.query_id),
    ranked AS (
      SELECT query_id, vec_id, d,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY d ASC, vec_id ASC) AS rank
      FROM rescored)
    SELECT query_id, vec_id, round(d, {ROUND}) AS dist, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= {k}
    """


def knn_ivfbq_sql(
    split_cte: str,
    k: int,
    nprobe: int,
    rerank_r: int | str,
    cand_pred: str | None = None,
    extra_cand_joins: str = "",
    label_probe_r: int | str | None = None,
) -> str:
    """IVF-BQ serving oracle (round 8 — completing the composition
    matrix): the knn_ivf probe chain gating knn_bq_rerank_sql's Hamming
    prune — candidates exist only where a code row's cell is probed by
    the query — then the shared exact-cosine rerank tail at BQ's deeper
    budget. Probe selection via the shared _ivf_probes_ctes block (plain
    nprobe or the per-label histogram cumsum rule); ``cand_pred`` /
    ``extra_cand_joins`` are the filtered key's label-equality hooks,
    applied before the top-R cut."""
    from toy_vector_db_spark.operators.similarity import BQ_HALF

    cand_where = cand_pred if cand_pred is not None else "TRUE"
    d_bc = V.sql_cosine_distance("b.embedding", "c.centroid_vec")
    d_exact = V.sql_cosine_distance("b.embedding", "q.qv")
    probes_cte = _ivf_probes_ctes("cents", nprobe, label_probe_r)
    return f"""
    WITH {split_cte},
    {_trained_cents_cte()},
    assign AS MATERIALIZED (
      SELECT vec_id, centroid_id FROM (
        SELECT b.vec_id, c.centroid_id,
               row_number() OVER (PARTITION BY b.vec_id
                                  ORDER BY {d_bc} ASC, c.centroid_id ASC) AS rn
        FROM base b, cents c)
      WHERE rn = 1),
    {probes_cte},
    codes AS (
      SELECT vec_id,
             {_bq_pack_sql('embedding', 1)} AS b_hi,
             {_bq_pack_sql('embedding', BQ_HALF + 1)} AS b_lo
      FROM base),
    qcodes AS (
      SELECT query_id,
             {_bq_pack_sql('qv', 1)} AS q_hi,
             {_bq_pack_sql('qv', BQ_HALF + 1)} AS q_lo
      FROM q),
    cand AS (
      SELECT p.query_id, co.vec_id,
             bit_count(xor(co.b_hi, qc.q_hi))
               + bit_count(xor(co.b_lo, qc.q_lo)) AS h
      FROM codes co
      JOIN assign a ON a.vec_id = co.vec_id
      JOIN probes p ON p.centroid_id = a.centroid_id
      JOIN qcodes qc ON qc.query_id = p.query_id
      {extra_cand_joins}
      WHERE {cand_where}),
    pruned AS (
      SELECT query_id, vec_id FROM (
        SELECT query_id, vec_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY h ASC, vec_id ASC) AS rr
        FROM cand)
      WHERE rr <= {rerank_r}),
    rescored AS (
      SELECT p.query_id, p.vec_id, {d_exact} AS d
      FROM pruned p
      JOIN base b ON b.vec_id = p.vec_id
      JOIN q ON q.query_id = p.query_id),
    ranked AS (
      SELECT query_id, vec_id, d,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY d ASC, vec_id ASC) AS rank
      FROM rescored)
    SELECT query_id, vec_id, round(d, {ROUND}) AS dist, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= {k}
    """


def lsh_buckets_sql(split_cte: str) -> str:
    dot = V.sql_dot("b.embedding", "p.plane_vec")
    return f"""
    WITH {split_cte},
    planes AS (SELECT vec_id AS plane_id, embedding AS plane_vec
               FROM base WHERE vec_id < {N_HYPERPLANES}),
    bits AS (
      SELECT b.vec_id, p.plane_id,
             CASE WHEN {dot} > 0 THEN 1 ELSE 0 END AS bit
      FROM base b, planes p)
    SELECT vec_id,
           CAST(sum(bit * CAST(power(2, plane_id) AS BIGINT)) AS BIGINT) AS bucket
    FROM bits GROUP BY vec_id
    """


# -- text analysis -----------------------------------------------------------

def _toks() -> str:
    return "list_distinct(string_split(lower(text), ' '))"


def _marker_list(words: list[str]) -> str:
    return "[" + ", ".join(f"'{w}'" for w in words) + "]"


def lang_id_sql() -> str:
    score_cols = ",\n           ".join(
        f"len(list_intersect({_toks()}, {_marker_list(ws)})) AS s_{lang}"
        for lang, ws in LANG_MARKERS.items()
    )
    best = "greatest(" + ", ".join(f"s_{lang}" for lang in LANG_MARKERS) + ")"
    # tie-break: alphabetically first language wins (matches the Spark
    # expression's outermost-when order)
    cases = "\n             ".join(
        f"WHEN s_{lang} > 0 AND s_{lang} = {best} THEN '{lang}'"
        for lang in sorted(LANG_MARKERS)
    )
    return f"""
    WITH scored AS (SELECT doc_id, {score_cols} FROM documents)
    SELECT doc_id,
           CASE {cases} ELSE 'und' END AS pred_lang,
           CAST({best} AS INT) AS marker_hits
    FROM scored
    """


def quality_sql() -> str:
    toks = "string_split(lower(text), ' ')"
    dtoks = f"list_distinct({toks})"
    stop = (
        f"len(list_intersect({dtoks}, {_marker_list(STOPWORDS)})) * 1.0"
        f" / len({dtoks})"
    )
    return f"""
    WITH f AS (
      SELECT doc_id,
             length(text) AS n_chars,
             len({toks}) AS n_tok,
             {stop} AS stop_ratio,
             length(regexp_replace(text, '[^0-9]', '', 'g')) * 1.0
               / length(text) AS digit_ratio,
             len({dtoks}) * 1.0 / len({toks}) AS uniq_ratio
      FROM documents)
    SELECT doc_id,
           n_chars,
           CAST(n_tok AS INT) AS n_tokens,
           round((n_chars - (n_tok - 1)) * 1.0 / n_tok, {_TROUND}) AS mean_tok_len,
           round(stop_ratio, {_TROUND}) AS stop_ratio,
           round(uniq_ratio, {_TROUND}) AS uniq_ratio,
           round(0.4 * least(n_tok / 50.0, 1.0) + 0.3 * uniq_ratio
                 + 0.2 * (1.0 - digit_ratio) + 0.1 * stop_ratio,
                 {_TROUND}) AS quality_score
    FROM f
    """


def token_stats_sql() -> str:
    return f"""
    SELECT doc_id,
           CAST(len(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                                x -> x <> '')) AS INT) AS ws_tokens,
           CAST(len(list_filter(
                  string_split(trim(regexp_replace(lower(text),
                                                   '[^a-z0-9]+', ' ', 'g')), ' '),
                  x -> x <> '')) AS INT) AS re_tokens,
           CAST(len(list_distinct(string_split(lower(text), ' '))) AS INT)
             AS uniq_tokens
    FROM documents
    """


def hash_features_sql() -> str:
    from toy_vector_db_spark.operators.dedup import sql_md5_int
    from toy_vector_db_spark.operators.textstats import N_HASH_BUCKETS

    toks = "string_split(lower(text), ' ')"
    cols = ",\n           ".join(
        f"len(list_filter({toks}, t -> {sql_md5_int('t')} % {N_HASH_BUCKETS}"
        f" = {i})) AS h{i}"
        for i in range(N_HASH_BUCKETS)
    )
    return f"SELECT doc_id, {cols} FROM documents"


def fingerprint_sql() -> str:
    chars = "list_transform(range(1, length(text) + 1), i -> ascii(substring(text, i, 1)))"
    return f"""
    SELECT doc_id,
           list_reduce(list_prepend(CAST(0 AS BIGINT), {chars}),
                       (acc, x) -> (acc * 31 + x) % {P31}) AS fingerprint
    FROM documents
    """
