"""Deterministic NDJSON fixture for S1 scan semantics (SURVEY §2.1).

The driver's parquet tables can't exercise DROPMALFORMED, so we materialize
a small NDJSON file (valid rows derived arithmetically from a seed, plus
hand-written malformed lines) under the repo. Written at import time of the
registry so it exists before either engine (Spark query or DuckDB oracle)
reads it.
"""

from __future__ import annotations

import json
import os

FIXTURE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), ".fixtures")
SCAN_FIXTURE = os.path.join(FIXTURE_DIR, "scan_fixture.ndjson")

N_VALID = 20
DIM = 4

MALFORMED = [
    '{not json at all',                                    # syntax error
    '{"body": "missing the vector field"}',                # missing field
    '{"text-embedding-ada-002": [0.5, 0.5]}',              # missing body
    '{"body": "bad vector", "text-embedding-ada-002": ["a", "b"]}',  # type
]


def _valid_line(i: int) -> str:
    vec = [round((i * 7 + j * 3) % 10 / 10.0, 1) + 0.1 for j in range(DIM)]
    return json.dumps(
        {"body": f"Sentence one of doc {i}. Sentence two.",
         "text-embedding-ada-002": vec}
    )


def write_scan_fixture() -> str:
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    lines = []
    for i in range(N_VALID):
        lines.append(_valid_line(i))
        # interleave a malformed line after every 5th valid one
        if i % 5 == 4:
            lines.append(MALFORMED[(i // 5) % len(MALFORMED)])
    content = "\n".join(lines) + "\n"
    # idempotent write (registry import happens in every process)
    if not (os.path.exists(SCAN_FIXTURE)
            and open(SCAN_FIXTURE).read() == content):
        with open(SCAN_FIXTURE, "w") as f:
            f.write(content)
    return SCAN_FIXTURE
