"""Relational extension operators over the TPC-H-ish star schema + events.

No reference counterpart (SURVEY §2.7 — the reference has no SQL, joins,
aggregation, windows, or date functions); these are the north-star
extensions mandated by the harness, designed Spark-first for scale:

* dimension tables (region/nation/supplier) are BROADCAST — no shuffle of
  the fact table for star joins;
* aggregations are expressed so map-side partial aggregation applies
  (sum/count/avg — all algebraic);
* window top-k per group uses row_number over a single hash shuffle on the
  group key;
* sessionization is the lag/gap/cumsum idiom — two windows over one
  shuffle on (user_id), no Python;
* JSON extraction uses get_json_object (codegen'd JVM path).

Each function takes already-loaded DataFrames so it can be pointed at any
scale's tables; the registry binds them to the fixture directory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from toy_vector_db_spark.functions.rounding import rnd

ROUND = 4


def pricing_summary(lineitem: DataFrame, cutoff: str = "2000-12-01") -> DataFrame:
    """TPC-H Q1 shape: big filtered scan + groupBy(2) + 8 algebraic aggs.
    At 100 TB: one scan stage with partial aggs, tiny shuffle (6 groups)."""
    li = lineitem.where(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp"))
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            rnd(F.sum("l_quantity"), ROUND).alias("sum_qty"),
            rnd(F.sum("l_extendedprice"), ROUND).alias("sum_base_price"),
            rnd(F.sum(disc_price), ROUND).alias("sum_disc_price"),
            rnd(F.sum(charge), ROUND).alias("sum_charge"),
            rnd(F.avg("l_quantity"), ROUND).alias("avg_qty"),
            rnd(F.avg("l_extendedprice"), ROUND).alias("avg_price"),
            rnd(F.avg("l_discount"), ROUND).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def revenue_by_nation(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
) -> DataFrame:
    """TPC-H Q5 shape: fact-fact join on orderkey, then broadcast dims.
    The only big shuffle is lineitem⋈orders; nation/region/customer-keyed
    hops stay broadcast."""
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(rnd(F.sum(rev), ROUND).alias("revenue"),
             F.count("*").alias("n_items"))
    )


def top_orders_per_customer(orders: DataFrame, k: int = 3) -> DataFrame:
    """Top-k per group: window row_number over one shuffle on the group key."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("o_custkey", "o_orderkey",
                rnd("o_totalprice", ROUND).alias("o_totalprice"), "rank")
    )


def sales_rollup(lineitem: DataFrame) -> DataFrame:
    """ROLLUP aggregation; grouping keys coalesced to 'ALL' so the output
    carries no NULL grouping cells (cross-engine hash-stable)."""
    return (
        lineitem.rollup("l_returnflag", "l_linestatus")
        .agg(rnd(F.sum("l_quantity"), ROUND).alias("sum_qty"),
             F.count("*").alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("l_returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("l_linestatus"),
            "sum_qty",
            "n",
        )
    )


def customers_without_orders(
    customer: DataFrame, orders: DataFrame, since: str = "2000-01-01"
) -> DataFrame:
    """Anti join (NOT EXISTS): customers with no orders since a date. The
    orders side is filtered (predicate pushdown) and reduced to distinct
    keys first so the anti-join input is minimal."""
    recent = (
        orders.where(F.col("o_orderdate") >= F.lit(since).cast("timestamp"))
        .select("o_custkey")
        .distinct()
    )
    return customer.join(
        recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


def customers_with_orders_semi(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Semi join (EXISTS) companion — per-segment counts of active customers."""
    active = customer.join(
        orders, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    )
    return active.groupBy("c_mktsegment").agg(F.count("*").alias("n_active"))


def monthly_order_stats(orders: DataFrame) -> DataFrame:
    """Date functions + aggregation; month emitted as a string so timestamp
    semantics can't differ across engines."""
    month = F.date_format("o_orderdate", "yyyy-MM").alias("month")
    return (
        orders.groupBy(month)
        .agg(
            F.count("*").alias("n_orders"),
            rnd(F.sum("o_totalprice"), ROUND).alias("total"),
            rnd(F.avg("o_totalprice"), ROUND).alias("avg_price"),
        )
    )


def order_priority_pivot(orders: DataFrame) -> DataFrame:
    """Pivot expressed as conditional aggregation (portable across engines;
    same plan Spark's .pivot() produces after its distinct-values scan)."""
    aggs = [
        F.count(F.when(F.col("o_orderstatus") == s, 1)).alias(f"n_{s.lower()}")
        for s in ("O", "F", "P")
    ]
    return orders.groupBy("o_orderpriority").agg(*aggs)


def top_customer_set_difference(orders: DataFrame, k: int = 20) -> DataFrame:
    """Set operation over two ranked derivations: top-k customers by total
    spend EXCEPT top-k by order count. (The uniform synthetic data makes
    categorical set differences empty; ranked sets differ at every scale.)"""
    by_spend = (
        orders.groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("v"))
        .orderBy(F.col("v").desc(), F.col("o_custkey").asc())
        .limit(k)
        .select("o_custkey")
    )
    by_count = (
        orders.groupBy("o_custkey")
        .agg(F.count("*").alias("v"))
        .orderBy(F.col("v").desc(), F.col("o_custkey").asc())
        .limit(k)
        .select("o_custkey")
    )
    return by_spend.exceptAll(by_count)


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Sessionization: lag → gap flag → cumulative sum = session id, per
    user. Two windows, one shuffle on user_id. Batch twin of the streaming
    session_window operator (streaming/windows.py)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond precision: a cast to long would floor to seconds and
    # disagree with the oracle's epoch_us at gap boundaries
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    is_new = F.when(gap.isNull() | (gap > gap_minutes * 60 * 1_000_000), 1).otherwise(0)
    sess = (
        events.withColumn("new_sess", is_new)
        .withColumn("session_seq", F.sum("new_sess").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    )
    return (
        sess.groupBy("user_id", "session_seq")
        .agg(F.count("*").alias("n_events"),
             rnd(F.sum("value"), ROUND).alias("session_value"))
        .groupBy("user_id")
        .agg(F.count("*").alias("n_sessions"),
             F.max("n_events").alias("max_session_events"),
             rnd(F.sum("session_value"), ROUND).alias("total_value"))
    )


def asof_last_click(events: DataFrame) -> DataFrame:
    """As-of join expressed as a window (Spark has no native as-of): for
    every purchase event, the most recent click at-or-before it by the same
    user. One shuffle on user_id; ROWS frame (not RANGE) so tie handling is
    deterministic under the (ts, event_id) ordering. The merge_asof-style
    applyInPandas variant is the fallback for non-windowable semantics."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    click_us = F.when(
        F.col("event_type") == "click", F.unix_micros(F.col("ts"))
    )
    with_last = events.withColumn(
        "last_click_us", F.last(click_us, ignorenulls=True).over(w)
    )
    # gap emitted as INTEGER microseconds: a seconds-float would hit the
    # round(double) divergence between engines (Spark rounds the decimal
    # rendering HALF_UP, DuckDB rounds the binary double). Purchases with no
    # prior click get a -1 sentinel instead of NULL: NULL floats become NaN
    # in arrow/pandas and NaN != NaN breaks exact cross-engine compares.
    return with_last.where(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts")).alias("ts_us"),
        F.coalesce(F.col("last_click_us"), F.lit(-1)).alias("last_click_us"),
        F.coalesce(
            F.unix_micros(F.col("ts")) - F.col("last_click_us"), F.lit(-1)
        ).alias("usecs_since_click"),
    )


def sales_cube(lineitem: DataFrame) -> DataFrame:
    """CUBE aggregation (all 4 grouping combinations), grouping cells
    coalesced to 'ALL'."""
    return (
        lineitem.cube("l_returnflag", "l_linestatus")
        .agg(rnd(F.sum("l_extendedprice"), ROUND).alias("sum_price"),
             F.count("*").alias("n"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("l_returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("l_linestatus"),
            "sum_price",
            "n",
        )
    )


def order_price_percentiles(orders: DataFrame) -> DataFrame:
    """Exact interpolated percentiles per priority class (Spark
    `percentile` ≡ DuckDB `quantile_cont`). At 100 TB swap to
    percentile_approx (t-digest) — same operator shape, bounded memory."""
    p = F.expr("percentile(o_totalprice, array(0.25, 0.5, 0.75))")
    return orders.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        rnd(p.getItem(0), ROUND).alias("p25"),
        rnd(p.getItem(1), ROUND).alias("p50"),
        rnd(p.getItem(2), ROUND).alias("p75"),
    )


def salted_event_type_stats(events: DataFrame, n_salt: int = 8) -> DataFrame:
    """Skew-resistant aggregation: the two-phase salt pattern. Phase 1
    aggregates on (key, salt) — spreading a hot key over n_salt reducers —
    phase 2 merges the partials. Results are identical to the direct
    groupBy (its SQL is the oracle); only the shuffle layout changes. This
    is the explicit skew lever for 100 TB hot-key distributions; AQE skew
    handling covers joins, salting covers aggregations with pathological
    key frequencies."""
    salted = events.withColumn(
        "_salt", F.pmod(F.xxhash64("event_id"), F.lit(n_salt))
    )
    partial = salted.groupBy("event_type", "_salt").agg(
        F.count("*").alias("pn"), F.sum("value").alias("pv")
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").alias("n"),
        rnd(F.sum("pv"), ROUND).alias("total_value"),
    )


def events_json_stats(events: DataFrame) -> DataFrame:
    """JSON scalar extraction (get_json_object, codegen'd) + aggregation."""
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        events.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            rnd(F.avg("k"), ROUND).alias("avg_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


def tumbling_window_batch(events: DataFrame, minutes: int = 60) -> DataFrame:
    """Tumbling event-time windows in batch (F.window) — same semantics the
    streaming twin produces, emitted as string bounds for stability."""
    win = F.window("ts", f"{minutes} minutes")
    return (
        events.groupBy(win, "event_type")
        .agg(F.count("*").alias("n"),
             rnd(F.sum("value"), ROUND).alias("total_value"))
        .select(
            F.date_format("window.start", "yyyy-MM-dd HH:mm").alias("win_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def running_total_by_supplier(lineitem: DataFrame) -> DataFrame:
    """Running window aggregate (unbounded-preceding cumsum) + rank —
    classic analytic pattern; one shuffle on l_suppkey."""
    w = Window.partitionBy("l_suppkey").orderBy("l_shipdate", "l_orderkey",
                                                "l_linenumber")
    run = F.sum("l_quantity").over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        lineitem.withColumn("running_qty", rnd(run, ROUND))
        .groupBy("l_suppkey")
        .agg(F.max("running_qty").alias("final_qty"),
             F.count("*").alias("n_items"))
    )
