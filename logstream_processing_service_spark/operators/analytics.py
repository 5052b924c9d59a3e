"""General analytical queries over the TPC-H-ish star schema.

The reference pushes all heavy relational work to Postgres as SQL strings
(src/db/*.py); these transforms are the engine-side equivalents, shaped like
the classic warehouse queries so the sf0.1 bench exercises real join/agg
plans (broadcast vs shuffle, partial aggregation, top-k).

Float-determinism note: money sums are computed by casting each row's term
to DECIMAL before aggregating. Decimal addition is exact and
order-independent, so results are bit-identical regardless of partitioning —
both for the DuckDB oracle and across cluster sizes. Averages stay double
and are rounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_DEC = "decimal(18,2)"
_DEC_OUT = "decimal(38,2)"
# Product terms: price(2dp) * discount-factor(2dp) [* tax-factor(2dp)] have
# exactly 4 (resp. 6) true decimal digits, so casting the double at that scale
# is rounding-mode-independent (the true value is a grid point; the double's
# error is ~1e-10). Casting at scale 2 would NOT be safe: many products sit
# exactly on .xx5 and HALF_UP (Spark) vs the oracle's mode would diverge.
_DEC4, _DEC4_OUT = "decimal(18,4)", "decimal(38,4)"
_DEC6, _DEC6_OUT = "decimal(18,6)", "decimal(38,6)"


def _money(col) -> F.Column:
    return col.cast(_DEC)


def pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1-shaped pricing summary (hash agg + partial combine).

    Covers SURVEY A1/A8: group counts + mean/std style stats. Two grouping
    keys of tiny cardinality → shuffle volume is a handful of rows after
    map-side combine, independent of fact-table size.
    """
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_money(F.col("l_quantity"))).cast(_DEC_OUT).alias("sum_qty"),
            F.sum(_money(F.col("l_extendedprice"))).cast(_DEC_OUT).alias("sum_base_price"),
            F.sum(disc_price.cast(_DEC4)).cast(_DEC4_OUT).alias("sum_disc_price"),
            F.sum(charge.cast(_DEC6)).cast(_DEC6_OUT).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def top_revenue_orders(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame, segment: str = "BUILDING", k: int = 10
) -> DataFrame:
    """TPC-H Q3-shaped: filtered 3-way join + agg + top-k.

    Scale shape: customer (filtered on segment) is the small side →
    broadcast into orders; orders→lineitem is the one real shuffle join on
    o_orderkey; top-k is TakeOrdered, never a total sort.
    """
    revenue = F.sum(
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC4)
    ).cast(_DEC4_OUT)
    return (
        lineitem.join(
            orders.join(
                F.broadcast(customer.filter(F.col("c_mktsegment") == segment)),
                orders["o_custkey"] == F.col("c_custkey"),
            ).select("o_orderkey", "o_orderdate", "o_orderpriority"),
            lineitem["l_orderkey"] == F.col("o_orderkey"),
        )
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(revenue.alias("revenue"))
        .orderBy(F.desc("revenue"), F.col("o_orderkey"))
        .limit(k)
    )


def revenue_by_nation(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    region_name: str = "ASIA",
) -> DataFrame:
    """TPC-H Q5-shaped: 5-way star join rolled up to nation revenue.

    Scale shape: region/nation/customer are dimensions → all broadcast; the
    only shuffle is lineitem→orders on the order key, then a tiny final agg.
    On a 1000-executor cluster the fact table is read exactly once and never
    re-partitioned except for that single equi-join.
    """
    dims = (
        customer.join(
            F.broadcast(
                nation.join(
                    F.broadcast(region.filter(F.col("r_name") == region_name)),
                    nation["n_regionkey"] == F.col("r_regionkey"),
                ).select("n_nationkey", "n_name")
            ),
            customer["c_nationkey"] == F.col("n_nationkey"),
        )
        .select("c_custkey", "n_name")
    )
    joined = (
        lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(dims), orders["o_custkey"] == dims["c_custkey"])
    )
    return (
        joined.groupBy("n_name")
        .agg(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC4))
            .cast(_DEC4_OUT)
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.desc("revenue"), F.col("n_name"))
    )


def customers_without_orders(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Anti-join (the ON CONFLICT DO NOTHING shape, SURVEY S6/J2).

    Scale: the distinct custkey set of orders is aggregated first (map-side
    combine), then the join runs; AQE converts to broadcast when small.
    """
    return (
        customer.join(orders.select("o_custkey").distinct(),
                      customer["c_custkey"] == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_nationkey")
        .orderBy("c_custkey")
    )


def priority_order_counts(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q4-shaped EXISTS semi-join (incident-dedup shape, SURVEY J2)."""
    committed = lineitem.select("l_orderkey").distinct()
    return (
        orders.join(committed, orders["o_orderkey"] == F.col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def first_order_per_customer(orders: DataFrame) -> DataFrame:
    """Earliest order per customer (W1/W6 ranking shape on a real table)."""
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .orderBy("o_custkey")
    )


def customer_order_stats(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Per-customer order stats incl. customers with zero orders (outer join)."""
    agg = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(_money(F.col("o_totalprice"))).cast(_DEC_OUT).alias("total_spent"),
    )
    return (
        customer.join(agg, customer["c_custkey"] == agg["o_custkey"], "left")
        .select(
            "c_custkey",
            "c_mktsegment",
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce(F.col("total_spent"), F.lit(0).cast(_DEC_OUT)).alias("total_spent"),
        )
        .orderBy("c_custkey")
    )
