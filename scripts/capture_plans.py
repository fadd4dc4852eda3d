#!/usr/bin/env python
"""Capture `.explain("formatted")` for registry queries into plan files.

Usage:
    python scripts/capture_plans.py OUT_DIR SUFFIX [key1,key2,...]

Writes OUT_DIR/<key>_<SUFFIX>.txt for every selected key (default: the
bench headline set, in headline order so build keys populate the session
caches their consumers' plans read from). The optimization-round judge
checks plan claims (Exchange counts, join strategies, PushedFilters,
Python eval nodes) against these files, so they are captured from the
same query constructors the bench times, on the same fixture data.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from toy_vector_db_spark import registry  # noqa: E402
from toy_vector_db_spark.session import get_spark  # noqa: E402


def explain_formatted(df) -> str:
    # the same JVM helper DataFrame.explain() prints through, captured
    # as a string instead of stdout
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    out_dir = sys.argv[1]
    suffix = sys.argv[2]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("tvdb-plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    qmap = registry.queries()
    if len(sys.argv) > 3:
        names = [k for k in sys.argv[3].split(",") if k]
        unknown = sorted(set(names) - set(qmap))
        if unknown:
            raise SystemExit(f"unknown keys {unknown}")
    else:
        import bench

        names = bench.resolve_names([], qmap)
    for name in names:
        try:
            df = qmap[name](spark, sf_dir)
            text = explain_formatted(df)
            with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as f:
                f.write(text)
            print(f"{name}: ok ({len(text)} B)")
        except Exception as exc:  # keep going; report at the end
            print(f"{name}: ERROR {exc}")
    spark.stop()


if __name__ == "__main__":
    main()
