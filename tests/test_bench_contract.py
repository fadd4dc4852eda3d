"""Bench-harness contract tests (round 7, verdict r6 item 1).

Round 6's official bench record was damaged two ways: the single JSON
output line outgrew the driver's 2 kB tail capture ("parsed": null), and
the one-shot build-key policy let a single noisy sample become the
round's hnsw_build number. These tests pin the fixes: the cache
snapshot/restore machinery that makes build keys re-runnable, and the
compact trailing summary line.
"""

import ast
import json
import pathlib
import re

from toy_vector_db_spark import caches

REPO = pathlib.Path(__file__).resolve().parent.parent
PKG = REPO / "toy_vector_db_spark"


def test_every_session_cache_is_registered():
    """Grep the package for module-level _*_CACHE / _CACHE dicts and
    assert each is in caches._cache_dicts() — a new session cache that
    bench.py doesn't roll back silently turns a build-key repeat back
    into a dict-hit measurement."""
    pattern = re.compile(r"^(_[A-Z0-9_]*CACHE)\s*[:=]", re.M)
    found: set[tuple[str, str]] = set()
    for py in PKG.rglob("*.py"):
        rel = py.relative_to(PKG).as_posix()[:-3].replace("/", ".")
        for m in pattern.finditer(py.read_text()):
            found.add((f"toy_vector_db_spark.{rel}", m.group(1)))
    import importlib

    dict_ids = {id(d) for d in caches._cache_dicts()}
    missing = []
    for mod_name, var in sorted(found):
        mod = importlib.import_module(mod_name)
        obj = getattr(mod, var)
        if isinstance(obj, dict) and id(obj) not in dict_ids:
            missing.append(f"{mod_name}.{var}")
    assert not missing, f"session caches not in caches._cache_dicts(): {missing}"


def test_snapshot_restore_drops_only_new_entries():
    d = caches._cache_dicts()[0]
    sentinel_old = ("__test_old__",)
    d[sentinel_old] = [1]
    snap = caches.snapshot()
    sentinel_new = ("__test_new__",)
    d[sentinel_new] = [2]
    dropped = caches.restore(snap)
    assert dropped == 1
    assert sentinel_old in d and sentinel_new not in d
    del d[sentinel_old]


def test_added_since_and_drop_track_build_key_ownership():
    """Round 9 (verdict r8 item 1): the warmup pass records which cache
    entries each build key's run CREATED, and the timed loop evicts
    exactly those before every sample — upstream artifacts stay warm.
    added_since must report only post-snapshot entries; drop must evict
    them (idempotently) and leave everything else."""
    d = caches._cache_dicts()[0]
    upstream = ("__test_upstream__",)
    d[upstream] = [0]
    snap = caches.snapshot()
    mine = ("__test_mine__",)
    d[mine] = [1]
    added = caches.added_since(snap)
    assert (d, mine) in [(dd, k) for dd, k in added]
    assert all(k != upstream for _, k in added)
    assert caches.drop(added) == 1
    assert mine not in d and upstream in d
    assert caches.drop(added) == 0  # second evict is a no-op
    del d[upstream]


def test_bench_warmup_runs_every_headline_key_untimed():
    """The r8 driver record (ivfpq_upsert_search 10.39 s vs 2.67 s
    steady state) was cold-cache bleed the harness itself produced;
    bench.py must now warm every headline key before the clock starts.
    Statically pin: a warmup loop over `names` that collects each query
    and records build-key ownership BEFORE the timed loop."""
    src = (REPO / "bench.py").read_text()
    assert "owned" in src and "added_since" in src and "caches.drop" in src
    warm = src.index("owned: dict")
    timed = src.index("timings: dict")
    assert warm < timed, "warmup pass must precede the timed loop"


def test_bench_emits_trailing_summary_line():
    """bench.py must end its output with a compact summary JSON line
    (≤2 kB with totals) — statically check the source keeps the
    second-print structure and the size guard."""
    src = (REPO / "bench.py").read_text()
    assert src.count('"headline_queries_total"') >= 2, (
        "bench.py must print the full record AND a trailing summary line"
    )
    assert "SUMMARY_BUDGET = 2000" in src, "summary size guard missing"
    ast.parse(src)  # stays valid python
    # build keys must run more than once now
    assert "runs = 3" in src and "runs = 1" not in src


def test_summary_lines_carry_queries_even_past_budget():
    """Round 8 (verdict r7 item 8): the LAST parseable bench line must
    carry totals AND per-query numbers no matter how the headline set
    grows. Round 11 (verdict r10 item 6): BOTH estimators ride in the
    SAME line as "key": [median, min] pairs — the separate min summary
    of round 10 pushed the combined tail past the driver's 2 kB capture
    and the min record's head was clipped. Pinned at the current
    headline count (single line) and +10/+40/+200 growth (split)."""
    import bench

    # current set: must stay a single line (driver parses exactly one)
    fake_now = {name: 99.99 for name in bench.HEADLINE}
    fake_min = {name: 88.88 for name in bench.HEADLINE}
    lines = bench.summary_lines(fake_now, fake_min, 9999.999, 9999.999, 0.1)
    assert len(lines) == 1 and len(lines[0]) <= bench.SUMMARY_BUDGET
    parsed = json.loads(lines[0])
    assert parsed["value"] == 9999.999
    assert parsed["qfmt"] == "[median,min]"
    assert all(v == [99.99, 88.88] for v in parsed["queries"].values())
    assert set(parsed["queries"]) == set(bench.HEADLINE)

    # current + 10, + 40, and + 200 future keys: per-query pairs must
    # SURVIVE, split or not, with EVERY line within budget and the LAST
    # line carrying totals + a non-empty queries dict. +200 would break
    # a naive half-by-count split, pinning the size-based chunking.
    forced_split = False
    for extra in (10, 40, 200):
        grown = dict(fake_now)
        grown_min = dict(fake_min)
        for i in range(extra):
            grown[f"future_operator_with_long_name_{i:03d}"] = 99.99
            grown_min[f"future_operator_with_long_name_{i:03d}"] = 88.88
        lines = bench.summary_lines(grown, grown_min, 9999.999, 9999.999, 0.1)
        assert all(len(ln) <= bench.SUMMARY_BUDGET for ln in lines), (
            f"+{extra}: line over budget: {max(map(len, lines))}B"
        )
        last = json.loads(lines[-1])
        assert last["metric"] == "headline_queries_total"
        assert last["value"] == 9999.999 and last["queries"]
        union = {}
        for ln in lines:
            union.update(json.loads(ln)["queries"])
        assert set(union) == set(grown), f"+{extra}: split dropped keys"
        assert all(v == [99.99, 88.88] for v in union.values())
        forced_split |= len(lines) > 1
    assert forced_split, "no growth case exercised the split branch"


def test_bench_interleaves_sample_passes():
    """Round 10 (verdict r9 item 2): the timed samples must run as
    interleaved full sweeps (pass loop OUTSIDE the key loop) so a
    transient contention window cannot own all three samples of one key
    — the r9 driver medians for dedup_minhash_lsh (7.33 s vs 2.14 s
    steady state) and ivfpq_partitioned_search (8.95 s vs 4.07 s) were
    exactly that failure. Statically pin the loop nesting."""
    src = (REPO / "bench.py").read_text()
    pass_loop = src.index("for _pass in range(runs):")
    key_loop = src.index("for name in names:", pass_loop)
    append = src.index("samples[name].append", key_loop)
    assert pass_loop < key_loop < append


def test_bench_warns_when_build_key_owns_nothing():
    """Advisor (round 9): a build key whose warmup created no cache
    entries would have every timed sample measure a dict hit. bench.py
    must detect that, warn on stderr, and flag the key in the record."""
    src = (REPO / "bench.py").read_text()
    assert "suspect_builds" in src and "suspect_build_keys" in src
    warn = src.index("owned no cache entries")
    timed = src.index("for _pass in range(runs):")
    assert warn < timed, "ownership check must precede the timed loop"


def test_resolve_names_keys_flag_reuses_eviction_machinery():
    """Round 14 (verdict r13 item 3): `--keys a,b,c` benches exactly
    those keys through the SAME warmup/ownership/eviction machinery —
    resolve_names is the single selection point feeding main()'s loops,
    and the timed loop's build-key branch tests membership in the
    module-level BUILD_KEYS by name, so a subset containing a build key
    still evicts its owned entries before every sample."""
    import pytest

    import bench

    qmap = {n: None for n in bench.HEADLINE}
    qmap["post_window_extra"] = None
    # subset re-orders HEADLINE-first (build before consumer), then
    # registry order for non-headline keys
    names = bench.resolve_names(
        ["bench.py", "--keys", "knn_hnsw,post_window_extra,hnsw_build"],
        qmap,
    )
    assert names == ["hnsw_build", "knn_hnsw", "post_window_extra"]
    # a typo must fail loudly, not bench an empty set
    with pytest.raises(SystemExit):
        bench.resolve_names(["bench.py", "--keys", "no_such_key"], qmap)
    with pytest.raises(SystemExit):
        bench.resolve_names(["bench.py", "--keys"], qmap)
    # default and --all unchanged
    assert bench.resolve_names(["bench.py"], qmap) == [
        n for n in bench.HEADLINE if n in qmap
    ]
    assert bench.resolve_names(["bench.py", "--all"], qmap) == list(qmap)
    # the subset path and the headline path share the eviction branch:
    # main() binds build_keys to the module constant and branches on it
    # inside the (mode-agnostic) timed loop
    src = (REPO / "bench.py").read_text()
    assert "build_keys = BUILD_KEYS" in src
    assert "resolve_names(sys.argv, qmap)" in src
    assert src.count("resolve_names(sys.argv") == 1, (
        "exactly one selection point must feed the bench loops"
    )
    assert "hnsw_build" in bench.BUILD_KEYS


def test_load_gate_blocks_until_quiet_and_flags_contamination(monkeypatch):
    """Round 14 (verdict r13 item 1): bench refuses to start the timed
    work on a loaded machine — it polls /proc/loadavg (bounded) until
    la1 < LOAD_GATE_LA1, and if the deadline expires it proceeds with an
    explicit contaminated flag instead of publishing a silently noisy
    record."""
    import bench

    # quiet machine: passes instantly, no contamination
    monkeypatch.setattr(bench, "_read_la1", lambda: 0.2)
    rec = bench.wait_for_quiet_machine()
    assert rec == {
        "threshold": bench.LOAD_GATE_LA1,
        "waited_sec": 0.0,
        "la1_at_gate": 0.2,
        "contaminated": False,
    }
    # loaded machine + expired deadline: proceeds, flagged
    monkeypatch.setattr(bench, "_read_la1", lambda: 9.9)
    monkeypatch.setattr(bench, "LOAD_GATE_DEADLINE_SEC", 0.2)
    rec = bench.wait_for_quiet_machine()
    assert rec["contaminated"] is True and rec["la1_at_gate"] == 9.9
    assert rec["waited_sec"] > 0
    # unreadable loadavg: no signal is not a reason to refuse to bench
    monkeypatch.setattr(bench, "_read_la1", lambda: None)
    rec = bench.wait_for_quiet_machine()
    assert rec["contaminated"] is False and rec["la1_at_gate"] is None
    # the gate runs BEFORE the Spark session in main (ambient signal)
    src = (REPO / "bench.py").read_text()
    assert src.index("gate = wait_for_quiet_machine()") < src.index(
        "get_spark("
    )
    # and the flag reaches the parsed summary tail
    fake = {name: 99.99 for name in bench.HEADLINE}
    fake_min = {name: 88.88 for name in bench.HEADLINE}
    load = {
        "loadavg_ambient": [9.9, 9.0, 8.0],
        "busy_cpu_frac": 0.9,
        "load_gate": {"contaminated": True},
    }
    lines = bench.summary_lines(
        fake, fake_min, 9999.999, 9999.999, 0.1, load
    )
    blob = "\n".join(lines) + "\n"
    assert len(blob.encode()) <= 2048
    assert json.loads(lines[-1])["contaminated"] is True


def test_summary_fits_driver_tail_at_current_headline_count():
    """Round 11 (verdict r10 item 6): the WHOLE summary — every line
    that must survive in the driver's 2 kB tail capture — has to fit in
    2048 bytes at the current headline count, or the head gets clipped
    exactly like BENCH_r10's min record. Chunking only protects the
    LAST line; full both-estimator coverage needs the total to fit."""
    import bench

    fake = {name: 99.99 for name in bench.HEADLINE}
    fake_min = {name: 88.88 for name in bench.HEADLINE}
    lines = bench.summary_lines(fake, fake_min, 9999.999, 9999.999, 0.1)
    blob = "\n".join(lines) + "\n"
    assert len(blob.encode()) <= 2048, (
        f"summary is {len(blob)}B — outgrows the 2 kB driver tail; "
        "shorten the encoding or trim the headline set"
    )
    # and there is no separate min summary left to race the budget
    src = (REPO / "bench.py").read_text()
    assert "min_summary_lines" not in src
