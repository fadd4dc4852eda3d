"""S1/S2 semantics tests (SURVEY §2.1): take-before-parse limit, silent
malformed drop, prefix split determinism."""

import pytest

from toy_vector_db_spark.sources import fixtures
from toy_vector_db_spark.sources.ndjson import read_ndjson, split_count, split_dataset


@pytest.fixture(scope="module")
def scan_path():
    return fixtures.write_scan_fixture()


def test_malformed_lines_dropped(spark, scan_path):
    df = read_ndjson(spark, scan_path)
    rows = df.collect()
    # all malformed lines silently dropped (src/dataset.rs:15)
    assert len(rows) == fixtures.N_VALID
    assert all(r.body.startswith("Sentence one") for r in rows)
    assert all(len(r.embedding) == fixtures.DIM for r in rows)


def test_take_before_parse_limit(spark, scan_path):
    # fixture layout: 5 valid, 1 malformed, 5 valid, 1 malformed, ...
    # limit=7 reads lines 0-6 = 6 valid + 1 malformed -> 6 rows survive.
    # (the bad line consumes budget, as in the reference's take(limit))
    df = read_ndjson(spark, scan_path, limit=7)
    assert df.count() == 6


def test_split_count_rust_round():
    # round half away from zero, like Rust's f32::round (src/dataset.rs:20)
    assert split_count(1000, 0.95) == 950
    assert split_count(10, 0.25) == 3  # 2.5 rounds away from zero -> 3
    assert split_count(500, 0.95) == 475


def test_prefix_split(embeddings):
    n = embeddings.count()
    base, query = split_dataset(embeddings, "vec_id", n, 0.95)
    cut = split_count(n, 0.95)
    assert base.count() == cut
    assert query.count() == n - cut
    assert base.agg({"vec_id": "max"}).first()[0] == cut - 1
    assert query.agg({"vec_id": "min"}).first()[0] == cut
