#!/usr/bin/env python
"""Construct-vs-exec decomposition for headline keys (round 15, guide §1).

For each selected key, on a WARM session (bench.py-style warmup: every
selected key runs once untimed first so session caches its consumers
legitimately reuse are populated), measure per sample:

  * construct: qmap[name](spark, sf_dir) — driver-side DataFrame
    construction (py4j expression building + any bounded driver jobs the
    constructor runs);
  * exec: .collect() of the constructed frame — the distributed plan.

Build keys get their owned cache entries evicted per sample exactly like
bench.py, so their numbers decompose the same work the bench times.

Usage: python scripts/construct_exec_split.py key1,key2,... [--profile KEY]
       --profile also cProfiles one construction of KEY and prints the
       top cumulative entries.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from toy_vector_db_spark import caches, registry  # noqa: E402
from toy_vector_db_spark.session import get_spark  # noqa: E402

import bench  # noqa: E402


def main() -> None:
    keys = [s for s in sys.argv[1].split(",") if s]
    prof_key = None
    if "--profile" in sys.argv:
        prof_key = sys.argv[sys.argv.index("--profile") + 1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "2g")
    spark = get_spark("tvdb-construct-exec")
    spark.sparkContext.setLogLevel("ERROR")
    qmap = registry.queries()
    unknown = sorted(set(keys) - set(qmap))
    if unknown:
        raise SystemExit(f"unknown keys {unknown}")
    names = [n for n in bench.HEADLINE if n in set(keys)] + [
        n for n in qmap if n in set(keys) and n not in bench.HEADLINE
    ]
    # session warmup (bench.py shape)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for t in registry.TABLES:
        registry.table(spark, sf_dir, t).limit(1).collect()
    owned: dict[str, list] = {}
    for n in names:
        pre = caches.snapshot()
        qmap[n](spark, sf_dir).collect()
        if n in bench.BUILD_KEYS:
            owned[n] = caches.added_since(pre)
    rows = []
    for n in names:
        cons, execs = [], []
        for _ in range(3):
            if n in bench.BUILD_KEYS:
                caches.drop(owned.get(n, []))
            t0 = time.perf_counter()
            df = qmap[n](spark, sf_dir)
            t1 = time.perf_counter()
            df.collect()
            t2 = time.perf_counter()
            cons.append(t1 - t0)
            execs.append(t2 - t1)
        rows.append(
            (n, statistics.median(cons), min(cons),
             statistics.median(execs), min(execs))
        )
    print(f"{'key':32s} {'con_med':>8s} {'con_min':>8s} "
          f"{'exe_med':>8s} {'exe_min':>8s}")
    for n, cm, cn, em, en in rows:
        print(f"{n:32s} {cm:8.3f} {cn:8.3f} {em:8.3f} {en:8.3f}")
    if prof_key:
        import cProfile
        import pstats

        if prof_key in bench.BUILD_KEYS:
            caches.drop(owned.get(prof_key, []))
        pr = cProfile.Profile()
        pr.enable()
        qmap[prof_key](spark, sf_dir)
        pr.disable()
        pstats.Stats(pr).sort_stats("cumulative").print_stats(35)


if __name__ == "__main__":
    main()
