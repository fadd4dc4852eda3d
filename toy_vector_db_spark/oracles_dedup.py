"""DuckDB oracle SQL generators for the dedup suite (operators/dedup.py).

Kept in one module so the constants (permutation coefficients, band layout,
thresholds) are imported from the SAME source the Spark operators use — the
two sides cannot drift."""

from __future__ import annotations

from toy_vector_db_spark.operators.dedup import (
    BANDS,
    DUP_OFFSET,
    DUP_SLICE,
    LSH_BUCKET_CAP,
    NUM_PERM,
    P31,
    PERM_A,
    PERM_B,
    PERTURB_SUFFIX,
    ROUND,
    ROWS_PER_BAND,
    SIMHASH_BITS,
    SQL_INJECTED_CORPUS,
    SQL_INJECTED_CORPUS_EXACT,
    sql_md5_int,
)

# word shingles k=3 from a toks list column (duckdb range() is end-exclusive)
_SHINGLES = (
    "list_distinct(list_transform(range(1, len(toks) - 1),"
    " i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))"
)

_JACCARD = (
    "len(list_intersect(sa.shingles, sb.shingles)) * 1.0"
    " / len(list_distinct(list_concat(sa.shingles, sb.shingles)))"
)


def dedup_exact_sql() -> str:
    return f"""
    WITH corpus AS ({SQL_INJECTED_CORPUS_EXACT})
    SELECT md5(text) AS text_hash, min(doc_id) AS keeper_id,
           count(*) AS n_copies
    FROM corpus GROUP BY md5(text)
    """


def _minhash_pair_ctes(
    threshold: float, bucket_cap: int = LSH_BUCKET_CAP
) -> str:
    """WITH-body computing `vpairs` = the verified MinHash-LSH near-dup
    pairs — shared by the pairs oracle and the cluster oracle.
    ``bucket_cap`` mirrors the operator's parameter (advice r12: the
    registered keys use the default, but a parity run against a
    non-default operator cap must thread the SAME cap here or the
    engines silently diverge on any over-cap bucket)."""
    perms = ",\n           ".join(
        f"list_min(list_transform(hs, h -> ({a} * h + {b}) % {P31})) AS m{i}"
        for i, (a, b) in enumerate(zip(PERM_A, PERM_B))
    )
    band_selects = "\n      UNION ALL\n      ".join(
        "SELECT doc_id, {bi} AS band, {sig} AS bsig FROM sig".format(
            bi=bi,
            sig=" || '_' || ".join(
                f"m{bi * ROWS_PER_BAND + r}" for r in range(ROWS_PER_BAND)
            ),
        )
        for bi in range(BANDS)
    )
    return f"""
    corpus AS ({SQL_INJECTED_CORPUS}),
    tok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM corpus),
    sh AS (SELECT doc_id, {_SHINGLES} AS shingles FROM tok),
    hashes AS (SELECT doc_id,
                      list_transform(shingles, s -> {sql_md5_int('s')} % {P31}) AS hs
               FROM sh),
    sig AS (SELECT doc_id, {perms} FROM hashes),
    bands_all AS ({band_selects}),
    -- mega-bucket skew guard, mirroring operators/dedup.py bucket_cap
    bands AS (SELECT doc_id, band, bsig FROM (
                SELECT doc_id, band, bsig,
                       count(*) OVER (PARTITION BY band, bsig) AS bn
                FROM bands_all)
              WHERE bn <= {bucket_cap}),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM bands a JOIN bands b
               ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id),
    vpairs AS (SELECT c.doc_a, c.doc_b, round({_JACCARD}, {ROUND}) AS jaccard
               FROM cand c
               JOIN sh sa ON sa.doc_id = c.doc_a
               JOIN sh sb ON sb.doc_id = c.doc_b
               WHERE round({_JACCARD}, {ROUND}) >= {threshold})
    """


def minhash_lsh_sql(
    threshold: float = 0.4, bucket_cap: int = LSH_BUCKET_CAP
) -> str:
    return f"""
    WITH {_minhash_pair_ctes(threshold, bucket_cap)}
    SELECT doc_a, doc_b, jaccard FROM vpairs
    """


def dup_clusters_sql(threshold: float = 0.4) -> str:
    """Connected components of the verified-pair graph as a recursive CTE:
    `reach` enumerates every label reachable from a node along edges;
    min(reachable) = the component-min cluster id. Mirrors the Spark
    min-label-propagation fixpoint exactly."""
    return f"""
    WITH RECURSIVE {_minhash_pair_ctes(threshold)},
    edges AS (SELECT doc_a AS src, doc_b AS dst FROM vpairs
              UNION ALL
              SELECT doc_b AS src, doc_a AS dst FROM vpairs),
    reach(node, lbl) AS (
      SELECT doc_id, doc_id FROM corpus
      UNION
      SELECT e.src, r.lbl FROM edges e JOIN reach r ON r.node = e.dst
    )
    SELECT node AS doc_id, min(lbl) AS cluster_id,
           (node = min(lbl)) AS is_keeper
    FROM reach GROUP BY node
    """


def _simhash_cte(corpus_sql: str) -> str:
    votes = ",\n           ".join(
        f"sum((((h >> {b}) & 1) * 2 - 1)) AS s{b}" for b in range(SIMHASH_BITS)
    )
    sig = " + ".join(
        f"(CASE WHEN s{b} > 0 THEN {1 << b} ELSE 0 END)"
        for b in range(SIMHASH_BITS)
    )
    return f"""
    corpus AS ({corpus_sql}),
    tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM corpus),
    th AS (SELECT doc_id, {sql_md5_int('tok')} AS h FROM tok),
    votes AS (SELECT doc_id, {votes} FROM th GROUP BY doc_id),
    sigs AS (SELECT doc_id, CAST({sig} AS BIGINT) AS simhash FROM votes)
    """


def simhash_signatures_sql() -> str:
    return f"""
    WITH {_simhash_cte('SELECT doc_id, text FROM documents')}
    SELECT doc_id, simhash FROM sigs
    """


def simhash_pairs_sql(max_hamming: int = 6) -> str:
    byte_selects = "\n      UNION ALL\n      ".join(
        f"SELECT doc_id, simhash, {i} AS byte_idx,"
        f" (simhash >> {i * 8}) & 255 AS byte_val FROM sigs"
        for i in range(4)
    )
    return f"""
    WITH {_simhash_cte(SQL_INJECTED_CORPUS)},
    bands AS ({byte_selects}),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                    a.simhash AS sig_a, b.simhash AS sig_b
             FROM bands a JOIN bands b
               ON a.byte_idx = b.byte_idx AND a.byte_val = b.byte_val
                  AND a.doc_id < b.doc_id)
    SELECT doc_a, doc_b, CAST(bit_count(xor(sig_a, sig_b)) AS INT) AS hamming
    FROM cand WHERE bit_count(xor(sig_a, sig_b)) <= {max_hamming}
    """


def ngram_jaccard_sql(n: int = 4, k: int = 20) -> str:
    grams = (
        f"list_distinct(list_transform(range(1, length(text) - {n - 2}),"
        f" i -> substring(text, i, {n})))"
    )
    jac = (
        "len(list_intersect(a.grams, b.grams)) * 1.0"
        " / len(list_distinct(list_concat(a.grams, b.grams)))"
    )
    return f"""
    WITH g AS (SELECT doc_id, source || '|' || lang AS blk, {grams} AS grams
               FROM documents)
    SELECT doc_a, doc_b, round(j, {ROUND}) AS jaccard
    FROM (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, {jac} AS j
          FROM g a JOIN g b ON a.blk = b.blk AND a.doc_id < b.doc_id)
    ORDER BY j DESC, doc_a ASC, doc_b ASC
    LIMIT {k}
    """


def embedding_near_dup_lsh_sql(k: int = 20) -> str:
    from toy_vector_db_spark.functions import vector as V
    from toy_vector_db_spark.operators.similarity import N_HYPERPLANES

    dot = V.sql_dot("b.embedding", "p.plane_vec")
    sim = V.sql_cosine_similarity("x.embedding", "y.embedding")
    return f"""
    WITH planes AS (SELECT vec_id AS plane_id, embedding AS plane_vec
                    FROM embeddings WHERE vec_id < {N_HYPERPLANES}),
    bits AS (SELECT b.vec_id, p.plane_id,
                    CASE WHEN {dot} > 0 THEN 1 ELSE 0 END AS bit
             FROM embeddings b, planes p),
    buckets AS (SELECT vec_id,
                       CAST(sum(bit * CAST(power(2, plane_id) AS BIGINT))
                            AS BIGINT) AS bucket
                FROM bits GROUP BY vec_id),
    e AS (SELECT emb.vec_id, emb.embedding, bu.bucket
          FROM embeddings emb JOIN buckets bu USING (vec_id))
    SELECT vec_a, vec_b, round(s, {ROUND}) AS cos_sim
    FROM (SELECT x.vec_id AS vec_a, y.vec_id AS vec_b, {sim} AS s
          FROM e x JOIN e y ON x.bucket = y.bucket AND x.vec_id < y.vec_id)
    ORDER BY s DESC, vec_a ASC, vec_b ASC
    LIMIT {k}
    """


def embedding_near_dup_sql(k: int = 20) -> str:
    from toy_vector_db_spark.functions import vector as V

    sim = V.sql_cosine_similarity("a.embedding", "b.embedding")
    return f"""
    SELECT vec_a, vec_b, round(s, {ROUND}) AS cos_sim
    FROM (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, {sim} AS s
          FROM embeddings a JOIN embeddings b
            ON a.label = b.label AND a.vec_id < b.vec_id)
    ORDER BY s DESC, vec_a ASC, vec_b ASC
    LIMIT {k}
    """


def semdedup_sql() -> str:
    """SemDeDup oracle: the kmeans_chain trained centroids (bit-identical
    to the engine's cached_trained_centroids over the FULL embeddings
    table), row_number argmin assignment with the UNROUNDED distance,
    within-cluster EXISTS prune at SEM_EPS, survivors emitted with the
    rounded centroid distance — every comparison (eps threshold,
    farther-from-centroid keep rule, id tiebreak) on unrounded values
    that are IEEE-identical across engines."""
    from toy_vector_db_spark.functions import vector as V
    from toy_vector_db_spark.operators.dedup import SEM_EPS
    from toy_vector_db_spark.operators.similarity import (
        KMEANS_ITERS,
        N_CENTROIDS,
        TRAIN_SAMPLE,
    )
    from toy_vector_db_spark.oracles_similarity import kmeans_ctes

    d_bc = V.sql_cosine_distance("b.embedding", "c.centroid_vec")
    sim_xy = V.sql_cosine_similarity("x.embedding", "y.embedding")
    return f"""
    WITH base AS (SELECT vec_id, embedding FROM embeddings),
    {kmeans_ctes(N_CENTROIDS, KMEANS_ITERS, TRAIN_SAMPLE, "base")},
    scored AS MATERIALIZED (
      SELECT b.vec_id, c.centroid_id, {d_bc} AS d
      FROM base b, cents c),
    asg AS MATERIALIZED (
      SELECT vec_id, centroid_id, d FROM (
        SELECT vec_id, centroid_id, d,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY d ASC, centroid_id ASC) AS rn
        FROM scored) WHERE rn = 1),
    e AS MATERIALIZED (
      SELECT a.vec_id, a.centroid_id, a.d, b.embedding
      FROM asg a JOIN base b USING (vec_id)),
    pruned AS (
      SELECT DISTINCT y.vec_id
      FROM e x JOIN e y
        ON x.centroid_id = y.centroid_id AND x.vec_id <> y.vec_id
      WHERE {sim_xy} > {SEM_EPS}
        AND (x.d > y.d OR (x.d = y.d AND x.vec_id < y.vec_id)))
    SELECT vec_id, centroid_id, round(d, {ROUND}) AS cent_dist
    FROM e WHERE vec_id NOT IN (SELECT vec_id FROM pruned)
    """
