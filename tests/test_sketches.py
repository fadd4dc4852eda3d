"""Sketch accuracy gates: approximations must land within their documented
error bounds of the exact answers (the oracle an approximate op CAN have)."""

from pyspark.sql import functions as F

from toy_vector_db_spark.operators import sketches
from toy_vector_db_spark.registry import table


def test_sketch_event_stats_within_bounds(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    approx = {r.event_type: r for r in sketches.sketch_event_stats(ev).collect()}
    exact = {
        r.event_type: r
        for r in ev.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("users"),
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.expr("percentile(value, 0.95)").alias("p95"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for et, a in approx.items():
        e = exact[et]
        # HLL++ rsd 2% → allow 4 sigma
        assert abs(a.approx_users - e.users) <= max(4 * 0.02 * e.users, 2.0), et
        # percentile_approx with accuracy 10000 is near-exact at fixture
        # sizes; allow a 5% relative band around the exact quantile
        for ap, ex in ((a.approx_p50, e.p50), (a.approx_p95, e.p95)):
            assert abs(ap - ex) <= 0.05 * max(abs(ex), 1.0), (et, ap, ex)


def test_sketch_deterministic(spark, sf_dir):
    ev = table(spark, sf_dir, "events")
    df = sketches.sketch_event_stats(ev)
    # same plan, same data → identical results run-to-run
    assert sorted(map(tuple, df.collect())) == sorted(map(tuple, df.collect()))
    # HLL merges are commutative/associative: the distinct estimate is
    # invariant under repartitioning. (percentile_approx is NOT — its
    # summary compression is merge-order-sensitive, which is why only the
    # HLL column is compared across partitionings.)
    a = {r.event_type: r.approx_users for r in df.collect()}
    b = {
        r.event_type: r.approx_users
        for r in sketches.sketch_event_stats(
            ev.repartition(7, "event_id")
        ).collect()
    }
    assert a == b
