"""Local replica of the driver's correctness gate: run a registry query on
Spark and its oracle SQL on DuckDB over the same parquet tables; compare
row count, column names, and order-insensitive values."""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from toy_vector_db_spark.functions.rounding import stabilize_sql_rounding
from toy_vector_db_spark.registry import TABLES


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def assert_oracle_match(spark_df, sql: str, sf_dir: str, rel: float = 0.0):
    got = _canon(spark_df.toPandas())
    con = duck_con(sf_dir)  # keep alive until fetch completes
    # every oracle's round() goes through the cross-engine-stable floor
    # form here too: registry.oracle_sql() already rewrites its own SQL,
    # but ad-hoc test oracles (tests/test_relational_extras.py) run
    # through this gate directly — without the rewrite, DuckDB's native
    # round() diverges from the engine's rnd() on exact decimal halves
    # (the twice-hit divergence class rounding.py documents). Idempotent:
    # the floor form contains no round() calls.
    want = _canon(con.sql(stabilize_sql_rounding(sql)).fetchdf())
    con.close()
    assert list(got.columns) == list(want.columns), (
        f"schema mismatch: spark={list(got.columns)} oracle={list(want.columns)}"
    )
    assert len(got) == len(want), f"row count: spark={len(got)} oracle={len(want)}"
    for col in got.columns:
        # The driver's value hash is type-sensitive: an int64 Spark column vs
        # a float64 oracle column fails even when every value matches (hit in
        # round 1: DuckDB HUGEINT -> fetchdf float64). Mirror that here by
        # requiring both sides to share a dtype kind (int-like vs float-like).
        gk, wk = got[col].dtype.kind, want[col].dtype.kind
        num = {"i", "u", "f"}
        if gk in num or wk in num:
            g_int = gk in {"i", "u"}
            w_int = wk in {"i", "u"}
            assert g_int == w_int, (
                f"dtype kind mismatch on {col}: spark={got[col].dtype} "
                f"oracle={want[col].dtype} — driver hash would reject this"
            )
        g, w = got[col].tolist(), want[col].tolist()
        for i, (a, b) in enumerate(zip(g, w)):
            if isinstance(a, float) or isinstance(b, float):
                af, bf = float(a), float(b)
                if math.isnan(af) and math.isnan(bf):
                    continue
                ok = af == bf if rel == 0.0 else math.isclose(af, bf, rel_tol=rel, abs_tol=rel)
                assert ok, f"{col}[{i}]: spark={a!r} oracle={b!r}"
            else:
                assert a == b, f"{col}[{i}]: spark={a!r} oracle={b!r}"
