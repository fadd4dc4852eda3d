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


def ivf_assign_sql(split_cte: str) -> str:
    d = V.sql_cosine_distance("b.embedding", "c.centroid_vec")
    return f"""
    WITH {split_cte},
    {_cents_cte()},
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
    {_cents_cte()},
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


def _pq_common_ctes(split_cte: str) -> str:
    m_, k_, _, sub = _pq_layout()
    d_cols = ",\n             ".join(
        _sq_dist_sql(
            f"(b.nv)[{m * sub + 1}:{(m + 1) * sub}]",
            f"(c.cv)[{m * sub + 1}:{(m + 1) * sub}]",
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
    cents AS (SELECT vec_id AS k, {_norm_sql('embedding')} AS cv
              FROM base WHERE vec_id < {k_}),
    nb AS (SELECT vec_id, {_norm_sql('embedding')} AS nv FROM base),
    scored AS (
      SELECT b.vec_id, c.k,
             {d_cols}
      FROM nb b, cents c),
    codes AS (SELECT vec_id, {code_cols}
              FROM scored GROUP BY vec_id)
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
            f"(x{m}.cv)[{m * sub + 1}:{(m + 1) * sub}]",
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


def knn_pq_rerank_sql(split_cte: str, k: int, rerank_r: int) -> str:
    m_, _, _, sub = _pq_layout()
    joins = "\n      ".join(
        f"JOIN cents x{m} ON x{m}.k = co.c{m}" for m in range(m_)
    )
    adc = " + ".join(
        _sq_dist_sql(
            f"(nq.nv)[{m * sub + 1}:{(m + 1) * sub}]",
            f"(x{m}.cv)[{m * sub + 1}:{(m + 1) * sub}]",
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
