#!/usr/bin/env python
"""Decompose hnsw_routed_upsert_serve's wall (round 11, verdict r10
item 4): the bench key chains (a) the session-cached INITIAL routed
index (warm — never in the timed window), (b) the frozen-centroid
micro-batch ingest (one validation aggregation over the batch +
touched-cell graph replay/rebuild in the cogroup kernel), and (c) the
real-config routed serve (nprobe=N_PROBE, ef=EF_SEARCH). The upsert
returns LAZY frames, so in the bench key the ingest cost is paid inside
the serve job; this script splits them by materializing the ingested
index first, then timing the serve over the persisted artifact —
min-of-2 after a warmup pass, the bench discipline.

Usage: python scripts/routed_upsert_decomposition.py [sf_dir]
Prints one JSON line for SCALE.md.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from toy_vector_db_spark.operators import hnsw  # noqa: E402
from toy_vector_db_spark.registry import (  # noqa: E402
    K,
    SPLIT_RATIO,
    UPSERT_RATIO,
    _emb_count,
    _split,
)
from toy_vector_db_spark.session import get_spark  # noqa: E402
from toy_vector_db_spark.sources.ndjson import split_count  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("tvdb-routed-upsert-decomp")
    spark.sparkContext.setLogLevel("ERROR")
    base, qs = _split(spark, sf_dir)
    n = _emb_count(spark, sf_dir)
    cut = split_count(n, SPLIT_RATIO)
    init_cut = split_count(cut, UPSERT_RATIO)
    initial = base.where(F.col("vec_id") < init_cut)
    batch = base.where(F.col("vec_id") >= init_cut)
    # warm the session-cached initial index, exactly like the bench
    # warmup pass does before the key's timed samples
    cells0, edges0, cents = hnsw.cached_routed_index(
        initial, f"{sf_dir}#routed_upsert_init"
    )

    def timed(fn, runs=2):
        walls = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn()
            walls.append(round(time.perf_counter() - t0, 3))
        return min(walls), walls

    # fused (the bench key's exact shape): lazy ingest inside the serve
    def fused():
        cells, edges = hnsw.hnsw_routed_upsert(cells0, edges0, cents, batch)
        hnsw.knn_hnsw_routed_prebuilt(cells, edges, cents, qs, K).collect()

    fused()  # warmup
    fused_min, fused_all = timed(fused)

    # split: materialize the ingest, then serve over the persisted index
    def ingest():
        cells, edges = hnsw.hnsw_routed_upsert(cells0, edges0, cents, batch)
        cells = cells.persist()
        edges = edges.persist()
        edges.count()
        cells.count()
        return cells, edges

    c1, e1 = ingest()  # warmup artifacts also used for serve warmup
    hnsw.knn_hnsw_routed_prebuilt(c1, e1, cents, qs, K).collect()

    def ingest_only():
        c, e = ingest()
        c.unpersist()
        e.unpersist()

    ingest_min, ingest_all = timed(ingest_only)

    serve_min, serve_all = timed(
        lambda: hnsw.knn_hnsw_routed_prebuilt(
            c1, e1, cents, qs, K
        ).collect()
    )
    print(json.dumps({
        "key": "hnsw_routed_upsert_serve",
        "sf_dir": sf_dir,
        "fused_min": fused_min, "fused_all": fused_all,
        "ingest_min": ingest_min, "ingest_all": ingest_all,
        "serve_min": serve_min, "serve_all": serve_all,
        "n_initial": int(init_cut), "n_batch": int(cut - init_cut),
        "nprobe": hnsw.similarity_nprobe(), "ef": hnsw.EF_SEARCH, "k": K,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
