"""Trained-quantizer edge cases the fixtures never exercise.

The fixture embeddings never empty a k-means cell, so the empty-cell
fallback (keep the previous centroid) would be dead code on BOTH engines —
a divergence there would survive every oracle row. This crafts data that
forces the path and asserts Spark ≡ DuckDB bit-for-bit.
"""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from toy_vector_db_spark import oracles_similarity as O
from toy_vector_db_spark.operators import dedup, similarity


def test_kmeans_empty_cell_keeps_previous_centroid(spark):
    # ids 0 and 1 are IDENTICAL, and both seed a centroid: every point ties
    # on distance to c0/c1 and the (d, centroid_id) order sends all of them
    # to centroid 0 — centroid 1 owns nothing from iteration 1 on and must
    # keep its init vector through the coalesce fallback in both engines.
    rows = [
        (0, [1.0, 0.0]),
        (1, [1.0, 0.0]),
        (2, [0.9, 0.1]),
        (3, [0.8, 0.2]),
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    got = {
        int(r["centroid_id"]): [float(x) for x in r["centroid_vec"]]
        for r in similarity.trained_centroids(df, n=2, iters=2).collect()
    }

    con = duckdb.connect()
    con.register(
        "base_pd", pd.DataFrame({"vec_id": [r[0] for r in rows],
                                 "embedding": [r[1] for r in rows]})
    )
    con.sql("CREATE VIEW base AS SELECT * FROM base_pd")
    ctes = O.kmeans_ctes(2, 2, similarity.TRAIN_SAMPLE)
    want = {
        int(cid): [float(x) for x in vec]
        for cid, vec in con.sql(
            f"WITH {ctes} SELECT centroid_id, centroid_vec FROM cents"
        ).fetchall()
    }
    assert got == want
    # centroid 1 survived untouched; centroid 0 is the 4-point mean
    assert want[1] == [1.0, 0.0]
    assert len(want[0]) == 2 and want[0] != [1.0, 0.0]


def test_simhash_overlong_docs_fall_back_not_fail(spark):
    """SWAR byte counters hold 255 tokens max; longer docs take the
    16-bit-spaced fallback fold (round-3 advice: degrade, don't fail) and
    must produce the SAME signature the byte path would. A doc repeated 3x
    scales every bit-vote count and the token total by 3, which preserves
    every 2*cnt > t comparison, so sig(text*3) == sig(text) — the repeat
    crosses the 255-token boundary, exercising both branches."""
    words = [f"w{i % 37}" for i in range(100)]
    short = " ".join(words)  # 100 tokens -> byte-spaced path
    long = " ".join(words * 3)  # 300 tokens -> 16-bit fallback path
    df = spark.createDataFrame(
        [(1, short), (2, long)], "doc_id bigint, text string"
    )
    sigs = {r["doc_id"]: r["simhash"]
            for r in dedup.simhash_signatures(df).collect()}
    assert sigs[1] == sigs[2]
    # 16-bit counters bound at 65535 tokens; beyond that still raises
    over = spark.createDataFrame(
        [(1, " ".join(["tok"] * 65536))], "doc_id bigint, text string"
    )
    with pytest.raises(Exception, match="65535 tokens"):
        dedup.simhash_signatures(over).collect()
