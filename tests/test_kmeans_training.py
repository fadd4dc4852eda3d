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


def test_simhash_rejects_overlong_docs(spark):
    """SWAR byte counters hold 255 tokens max; longer docs must raise the
    documented error, never overflow into a silently-wrong signature."""
    ok = spark.createDataFrame(
        [(1, " ".join(["tok"] * 255))], "doc_id bigint, text string"
    )
    assert dedup.simhash_signatures(ok).count() == 1
    over = spark.createDataFrame(
        [(1, " ".join(["tok"] * 256))], "doc_id bigint, text string"
    )
    with pytest.raises(Exception, match="255 tokens"):
        dedup.simhash_signatures(over).collect()
