"""Oracle checks for relational operators deliberately kept OUT of the
driver's 50-slot correctness window (see registry._PRIORITY): rollup/cube
(represented in-window by grouping_sets_sales), the batch tumbling window
(twin of streaming_tumbling_counts), and the two queries whose SQL already
serves as the oracle of an in-window sink round-trip key. Trimming them
from the registry must not trim their correctness coverage."""

from toy_vector_db_spark.operators import relational
from toy_vector_db_spark.registry import table
from tests.oracle_utils import assert_oracle_match

_R = 4


def test_sales_rollup(spark, sf_dir):
    df = relational.sales_rollup(table(spark, sf_dir, "lineitem"))
    assert_oracle_match(
        df,
        f"""
        SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
               coalesce(l_linestatus, 'ALL') AS l_linestatus,
               round(sum(l_quantity), {_R}) AS sum_qty,
               count(*) AS n
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
        """,
        sf_dir,
    )


def test_sales_cube(spark, sf_dir):
    df = relational.sales_cube(table(spark, sf_dir, "lineitem"))
    assert_oracle_match(
        df,
        f"""
        SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
               coalesce(l_linestatus, 'ALL') AS l_linestatus,
               round(sum(l_extendedprice), {_R}) AS sum_price,
               count(*) AS n
        FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        """,
        sf_dir,
    )


def test_tumbling_window_batch(spark, sf_dir):
    df = relational.tumbling_window_batch(table(spark, sf_dir, "events"), 60)
    assert_oracle_match(
        df,
        f"""
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M') AS win_start,
               event_type, count(*) AS n,
               round(sum(value), {_R}) AS total_value
        FROM events GROUP BY 1, 2
        """,
        sf_dir,
    )


def test_monthly_order_stats(spark, sf_dir):
    df = relational.monthly_order_stats(table(spark, sf_dir, "orders"))
    assert_oracle_match(
        df,
        f"""
        SELECT strftime(o_orderdate, '%Y-%m') AS month,
               count(*) AS n_orders,
               round(sum(o_totalprice), {_R}) AS total,
               round(avg(o_totalprice), {_R}) AS avg_price
        FROM orders GROUP BY 1
        """,
        sf_dir,
    )


def test_customers_with_orders_semi(spark, sf_dir):
    df = relational.customers_with_orders_semi(
        table(spark, sf_dir, "customer"), table(spark, sf_dir, "orders")
    )
    assert_oracle_match(
        df,
        """
        SELECT c_mktsegment, count(*) AS n_active
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY c_mktsegment
        """,
        sf_dir,
    )
