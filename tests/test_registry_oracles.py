"""Run EVERY registered query against its DuckDB oracle at the small scale
factor — the local replica of the driver's t2 correctness gate. Any query
added to the registry with an oracle is automatically covered here."""

import pytest

from toy_vector_db_spark import registry
from tests.oracle_utils import assert_oracle_match

_WITH_ORACLE = sorted(registry.oracle_sql().keys())


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_oracle_match(spark, sf_dir, name):
    df = registry.queries()[name](spark, sf_dir)
    assert_oracle_match(df, registry.oracle_sql()[name], sf_dir)


def test_every_query_runs(spark, sf_dir):
    for name, fn in registry.queries().items():
        df = fn(spark, sf_dir)
        assert df.count() >= 0, name


def test_driver_window_covers_priority_keys():
    """The driver's correctness gate checks the first 50 entries of
    queries(); every SURVEY §2 parity key and every LLM-pipeline/streaming
    key must land inside that window (round-1 lesson: first_sentence was
    registered last and shipped unverified)."""
    names = list(registry.queries())
    window = set(names[:50])
    missing_from_registry = [k for k in registry._PRIORITY if k not in names]
    assert not missing_from_registry, missing_from_registry
    out_of_window = [k for k in registry._PRIORITY if k not in window]
    assert not out_of_window, out_of_window
    # ordering is exactly priority-first
    assert names[: len(registry._PRIORITY)] == registry._PRIORITY


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(e.queries()).issuperset(set(e.oracle_sql()))


def test_overflow_keys_are_oracled_and_queued():
    """The documented overflow queue (_POST_WINDOW_OVERFLOW): every
    queued key must be registered WITH an oracle (they are driver-grade,
    just waiting for a window slot) and must genuinely sit outside the
    50-key window (otherwise the queue note in COVERAGE.md lies)."""
    names = list(registry.queries())
    window = set(names[:50])
    oracles = registry.oracle_sql()
    for k in registry._POST_WINDOW_OVERFLOW:
        assert k in names, k
        assert k in oracles, k
        assert k not in window, k


def test_r11_rotation_queue_is_complete_and_consistent():
    """Rotation-debt policy (verdict r9 item 4): _R11_ROTATION_QUEUE must
    hold every registered key whose last driver-green row predates r8 and
    that is not already refreshed by the round-10 window, so that rotating
    the queue in at round 11 leaves no key's last driver row older than
    r8. The last-green map is pinned from merged CORRECTNESS_r01-r09
    (committed artifacts, stable)."""
    import glob
    import json
    import re

    hist: dict[str, int] = {}
    files = sorted(glob.glob("CORRECTNESS_r0*.json"))
    if not files:  # running from a checkout without driver artifacts
        import pytest

        pytest.skip("no CORRECTNESS artifacts")
    for f in files:
        rnd_n = int(re.search(r"r(\d+)", f).group(1))
        for k, v in json.load(open(f)).items():
            if v.get("hash_match") or v.get("err") == "no_oracle":
                hist[k] = max(hist.get(k, 0), rnd_n)
    names = list(registry.queries())
    window = set(names[:50])
    stale = {
        k for k, r in hist.items() if r < 8 and k in names and k not in window
    }
    queued = set(registry._R11_ROTATION_QUEUE)
    assert stale == queued, (
        f"missing from queue: {sorted(stale - queued)}; "
        f"queued but not stale: {sorted(queued - stale)}"
    )
    # queue keys must remain registered and out-of-window until r11
    assert not queued & window
