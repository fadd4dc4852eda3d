"""Lifecycle SERVING keys (round 9, verdict r8 item 2).

bench.py now times the ``*_serve`` twins — micro-batch ingest / tombstone
filter + the REAL ef=EF_SEARCH configuration — instead of the exhaustive
``*_search`` proof keys (ef=|base|), whose verification leg inflated the
r8 serving numbers ~2×. The correctness of the lifecycle STATE is pinned
elsewhere (the exhaustive keys' driver hash rows; the ≡-rebuild proofs in
test_hnsw_lifecycle.py / test_hnsw_routed.py); what these tests pin is
the serving quality and shape of the serve keys themselves:

- exactly K rows per query, rank 1..K, distances ascending;
- recall@K vs exact over the correct live/upserted universe at or above
  the family's documented floor (deterministic: hash-seeded levels make
  the graph, hence the beam, hence recall, a fixed number per SF).
"""

from pyspark.sql import functions as F

from toy_vector_db_spark import registry
from toy_vector_db_spark.operators import evaluation, knn
from toy_vector_db_spark.registry import DELETE_MOD, K, _split

FLAT_FLOOR = 0.85  # SCALE.md flat-graph serving floor
ROUTED_FLOOR = 0.70  # routed/compressed families' documented floor


def _shape_ok(df):
    rows = df.collect()
    per_q = {}
    for r in rows:
        per_q.setdefault(r["query_id"], []).append(r)
    for q, rs in per_q.items():
        assert len(rs) == K, f"query {q}: {len(rs)} rows"
        rs = sorted(rs, key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, K + 1))
        dists = [r["dist"] for r in rs]
        assert dists == sorted(dists), f"query {q}: dist not ascending"
    return per_q


def _mean_recall(spark, ann, live_base, qs):
    exact = knn.knn_exact_batch(live_base, qs, K)
    rec = evaluation.evaluate_recall(ann, exact)
    return rec.agg(F.avg("recall")).collect()[0][0]


def test_hnsw_upsert_serve_quality(spark, sf_dir):
    ann = registry.queries()["hnsw_upsert_serve"](spark, sf_dir)
    _shape_ok(ann)
    base, qs = _split(spark, sf_dir)
    r = _mean_recall(spark, ann, base, qs)
    assert r >= FLAT_FLOOR, f"upsert serve recall {r}"


def test_hnsw_delete_serve_quality(spark, sf_dir):
    ann = registry.queries()["hnsw_delete_serve"](spark, sf_dir)
    per_q = _shape_ok(ann)
    # no tombstone may appear in served results
    for rs in per_q.values():
        assert all(r["vec_id"] % DELETE_MOD != 0 for r in rs)
    base, qs = _split(spark, sf_dir)
    live = base.where(F.col("vec_id") % DELETE_MOD != 0)
    r = _mean_recall(spark, ann, live, qs)
    assert r >= FLAT_FLOOR, f"delete serve recall {r}"


def test_hnsw_routed_upsert_serve_quality(spark, sf_dir):
    ann = registry.queries()["hnsw_routed_upsert_serve"](spark, sf_dir)
    _shape_ok(ann)
    base, qs = _split(spark, sf_dir)
    r = _mean_recall(spark, ann, base, qs)
    assert r >= ROUTED_FLOOR, f"routed upsert serve recall {r}"


def test_hnsw_routed_delete_serve_quality(spark, sf_dir):
    ann = registry.queries()["hnsw_routed_delete_serve"](spark, sf_dir)
    per_q = _shape_ok(ann)
    for rs in per_q.values():
        assert all(r["vec_id"] % DELETE_MOD != 0 for r in rs)
    base, qs = _split(spark, sf_dir)
    live = base.where(F.col("vec_id") % DELETE_MOD != 0)
    r = _mean_recall(spark, ann, live, qs)
    assert r >= ROUTED_FLOOR, f"routed delete serve recall {r}"


def test_serve_keys_are_out_of_the_driver_window():
    """The serve keys are approximate (no oracle by nature) — they must
    never occupy one of the 50 driver-checked slots; the exhaustive
    *_search proof keys keep those, and since round 10 the single
    oracled `serve_invariants` key hashes each twin's deterministic
    invariants (shape, tombstone exclusion, recall floor) in ONE slot
    (registry.q_serve_invariants, verdict r9 item 8)."""
    names = list(registry.queries())
    window = set(names[:50])
    for k in (
        "hnsw_upsert_serve", "hnsw_delete_serve",
        "hnsw_routed_upsert_serve", "hnsw_routed_delete_serve",
    ):
        assert k in names and k not in window
