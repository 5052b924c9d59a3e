"""General analytical queries over the TPC-H-ish star schema.

The reference pushes all heavy relational work to Postgres as SQL strings
(src/db/*.py); these transforms are the engine-side equivalents, shaped like
the classic warehouse queries so the sf0.1 bench exercises real join/agg
plans (broadcast vs shuffle, partial aggregation, top-k).

Float-determinism note: money sums are computed by casting each row's term
to DECIMAL before aggregating. Decimal addition is exact and
order-independent, so results are bit-identical regardless of partitioning —
both for the DuckDB oracle and across cluster sizes.

Output-representation note: final columns are always DOUBLE (never DECIMAL).
The exact decimal aggregate is cast to double at the very end — both Spark
(BigDecimal.doubleValue) and DuckDB produce the correctly-rounded nearest
double from the same decimal, so the bits are identical, and a double
round-trips identically through every fetch path (collect, Arrow, pandas).
DECIMAL outputs do not: pandas turns DuckDB DECIMALs into float64 while
Spark returns Decimal objects, and any trailing zero ("204.00" vs 204.0)
breaks a string-level comparison. Averages are sum_decimal→double / count
(IEEE division of identical operands — deterministic), never a double
avg() whose partial-sum order varies with partitioning.
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
            F.sum(_money(F.col("l_quantity"))).cast("double").alias("sum_qty"),
            F.sum(_money(F.col("l_extendedprice"))).cast("double").alias("sum_base_price"),
            F.sum(disc_price.cast(_DEC4)).cast("double").alias("sum_disc_price"),
            F.sum(charge.cast(_DEC6)).cast("double").alias("sum_charge"),
            (F.sum(_money(F.col("l_quantity"))).cast("double") / F.count(F.lit(1)))
            .alias("avg_qty"),
            (F.sum(_money(F.col("l_extendedprice"))).cast("double") / F.count(F.lit(1)))
            .alias("avg_price"),
            (F.sum(_money(F.col("l_discount"))).cast("double") / F.count(F.lit(1)))
            .alias("avg_disc"),
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
    ).cast("double")
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
            .cast("double")
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


def promo_revenue(
    lineitem: DataFrame,
    part: DataFrame,
    start: str = "1997-09-01",
    end: str = "1997-10-01",
) -> DataFrame:
    """TPC-H Q14-shaped conditional aggregation: promo revenue share.

    Shape: month-sliced fact scan (shipdate predicate pushed to parquet
    row groups) → broadcast join to the part dim → single global agg with a
    CASE-guarded numerator. Both sums are decimal-exact, so the final
    double ratio is bit-stable under any partitioning.
    """
    disc = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC4)
    joined = lineitem.filter(
        (F.col("l_shipdate") >= F.lit(start).cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit(end).cast("timestamp_ntz"))
    ).join(
        F.broadcast(part.select("p_partkey", "p_type")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    promo = F.sum(
        F.when(F.col("p_type").like("PROMO%"), disc).otherwise(F.lit(0).cast(_DEC4))
    ).cast("double")
    total = F.sum(disc).cast("double")
    return joined.agg(
        (F.lit(100.0) * promo / total).alias("promo_pct"),
        promo.alias("promo_revenue"),
        total.alias("total_revenue"),
    )


def large_volume_customers(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    qty_threshold: float = 200.0,
    k: int = 100,
) -> DataFrame:
    """TPC-H Q18-shaped HAVING-on-join: customers with bulk orders.

    Shape: the fact table is pre-aggregated to order grain FIRST (map-side
    combine shrinks the shuffle to one row per order), the threshold filter
    then drops ~99% of groups before the join with orders; customer is a
    broadcast dim. At 100 TB the only big exchange is the l_orderkey agg,
    which AQE coalesces after the filter.
    """
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(_money(F.col("l_quantity"))).alias("_sum_qty_dec"))
        .filter(F.col("_sum_qty_dec") > F.lit(qty_threshold).cast(_DEC))
        .withColumn("sum_qty", F.col("_sum_qty_dec").cast("double"))
    )
    return (
        orders.join(big, orders["o_orderkey"] == big["l_orderkey"])
        .join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .select("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice", "sum_qty")
        .orderBy(F.desc("o_totalprice"), F.col("o_orderkey"))
        .limit(k)
    )


def national_market_share(
    nation: DataFrame,
    supplier: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation_name: str = "NATION_3",
) -> DataFrame:
    """TPC-H Q8-shaped market share: a nation's supply share per order year.

    Shape: supplier⋈nation is a 100-row broadcast; the one shuffle joins
    lineitem to orders on the order key; the conditional-sum ratio is
    computed per year in a final tiny agg. Decimal numerator/denominator
    keep the share deterministic.
    """
    supp = supplier.join(
        F.broadcast(nation),
        supplier["s_nationkey"] == nation["n_nationkey"],
    ).select("s_suppkey", "n_name")
    disc = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC4)
    joined = (
        lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            disc.alias("volume"),
            F.col("n_name"),
        )
    )
    national = F.sum(
        F.when(F.col("n_name") == nation_name, F.col("volume")).otherwise(
            F.lit(0).cast(_DEC4)
        )
    ).cast(_DEC4_OUT)
    total = F.sum(F.col("volume")).cast(_DEC4_OUT)
    return (
        joined.groupBy("o_year")
        .agg(
            F.round(national.cast("double") / total.cast("double"), 6).alias("mkt_share")
        )
        .orderBy("o_year")
    )


def part_value_share(lineitem: DataFrame, fraction: float = 0.0005) -> DataFrame:
    """TPC-H Q11-shaped scalar-subquery HAVING: parts above a global
    revenue-share threshold.

    Shape: one agg to part grain, then the grand total is a 1-row broadcast
    cross join (NOT a driver collect — the threshold comparison happens
    executor-side, so the plan is a single reusable exchange at any scale).
    """
    disc = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC4)
    per_part = lineitem.groupBy("l_partkey").agg(
        F.sum(disc).alias("_pv_dec")
    )
    total = per_part.agg(
        F.sum("_pv_dec").cast("double").alias("_total")
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("_pv_dec").cast("double") > F.col("_total") * fraction)
        .select("l_partkey", F.col("_pv_dec").cast("double").alias("part_value"))
        .orderBy(F.desc("part_value"), F.col("l_partkey"))
    )


def idle_rich_customers(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """TPC-H Q22-shaped: above-average-balance customers with no orders,
    rolled up per nation.

    Shape: the global positive-balance average is a 1-row broadcast; the
    threshold compare is rewritten multiplication-side (bal*n > total) so
    no decimal division ever happens — exact on both engines. The anti-join
    against orders' distinct custkeys is the S6 dedup shape at dim scale.
    """
    pos = customer.filter(F.col("c_acctbal") > 0).agg(
        F.sum(_money(F.col("c_acctbal"))).alias("_total"),
        F.count(F.lit(1)).alias("_n"),
    )
    idle = customer.join(
        orders.select("o_custkey").distinct(),
        customer["c_custkey"] == F.col("o_custkey"),
        "left_anti",
    )
    return (
        idle.crossJoin(F.broadcast(pos))
        .filter(_money(F.col("c_acctbal")) * F.col("_n") > F.col("_total"))
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(_money(F.col("c_acctbal"))).cast("double").alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


def brand_priciest_part(part: DataFrame) -> DataFrame:
    """Arg-max per group via ``max_by`` over a struct sort key.

    One hash agg, no window, no second shuffle: ``max_by(name,
    (price, name))`` resolves price ties deterministically by name, which
    is what the oracle's ROW_NUMBER twin also does. This is the scalable
    replacement for rank-then-filter when only the top row per group is
    wanted.
    """
    return (
        part.groupBy("p_brand")
        .agg(
            F.expr("max_by(p_name, struct(p_retailprice, p_name))").alias("top_part"),
            F.max("p_retailprice").alias("top_price"),
        )
        .orderBy("p_brand")
    )


def cheapest_supplier_per_part(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q2-shaped correlated min-subquery, decorrelated to ONE agg.

    'The supplier offering each part at its lowest unit price' (smallest
    suppkey breaks price ties, so exactly one row per part). The two-level
    formulation (per-(part,supplier) min, then per-part min) collapses:
    the per-part argmin over raw rows ordered by (unit_price, suppkey) is
    identical to the argmin over per-supplier minima, so a single
    ``min_by`` aggregation keyed on l_partkey computes it with ONE
    exchange and full map-side partial aggregation — no window sort, no
    self-join, no final orderBy (the driver hash is order-insensitive).
    """
    unit = F.col("l_extendedprice") / F.col("l_quantity")
    return lineitem.groupBy("l_partkey").agg(
        F.expr(
            "min_by(l_suppkey, struct(l_extendedprice / l_quantity, l_suppkey))"
        ).alias("l_suppkey"),
        F.round(F.min(unit), 6).alias("best_unit_price"),
    )


def single_failed_supplier_orders(lineitem: DataFrame, k: int = 20) -> DataFrame:
    """TPC-H Q21-shaped EXISTS / NOT-EXISTS double correlation, decorrelated
    to counts.

    'Suppliers whose lineitems were the ONLY returned ones in a
    multi-supplier order' (returnflag 'R' standing in for the late-receipt
    predicate). EXISTS(another supplier) ∧ NOT EXISTS(another failed
    supplier) is rewritten as per-order counts (n_supp > 1 ∧ n_failed = 1)
    computed as WINDOW aggregates over l_orderkey on the per-(order,
    supplier) frame — no second groupBy, no self-join, no duplicate scan
    of the aggregate. Plan: one exchange for the (order, supplier) agg,
    one for the order-keyed window, one tiny final supplier count; the
    top-k is TakeOrdered (never a total sort).
    """
    per = lineitem.groupBy("l_orderkey", "l_suppkey").agg(
        F.max(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).alias("failed")
    )
    w = Window.partitionBy("l_orderkey")
    return (
        per.withColumn("n_supp", F.count(F.lit(1)).over(w))
        .withColumn("n_failed", F.sum("failed").over(w))
        .filter((F.col("failed") == 1) & (F.col("n_supp") > 1) & (F.col("n_failed") == 1))
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), F.col("l_suppkey"))
        .limit(k)
    )


def grouping_sets_volume(events: DataFrame) -> DataFrame:
    """GROUPING SETS ((event_type), (hour)): two independent rollups in one
    pass over the fact table (partial agg per set, a single exchange) —
    completes the rollup/cube family from SURVEY §2.5's note.
    """
    return (
        events.select(
            F.col("event_type"), F.hour("ts").alias("hr"), F.col("value")
        )
        .groupingSets(
            [[F.col("event_type")], [F.col("hr")]],
            F.col("event_type"),
            F.col("hr"),
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(_money(F.col("value"))).cast("double").alias("sum_value"),
        )
    )


def customer_order_stats(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """Per-customer order stats incl. customers with zero orders (outer join)."""
    agg = orders.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(_money(F.col("o_totalprice"))).cast("double").alias("total_spent"),
    )
    return (
        customer.join(agg, customer["c_custkey"] == agg["o_custkey"], "left")
        .select(
            "c_custkey",
            "c_mktsegment",
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce(F.col("total_spent"), F.lit(0.0)).alias("total_spent"),
        )
        .orderBy("c_custkey")
    )


def top_quarter_suppliers(
    lineitem: DataFrame, start: str = "1996-01-01", end: str = "1996-04-01"
) -> DataFrame:
    """TPC-H Q15-shaped: supplier(s) with the maximum quarterly revenue.

    The SQL form is a view + a correlated MAX scalar subquery; decorrelated
    here as one grouped aggregation reused by BOTH consumers (the 1-row max
    and the final filter) — Catalyst plans the agg once and broadcasts the
    single-row max side, so the fact table is scanned exactly once per
    branch with no second shuffle. Ties keep every tied supplier, exactly
    as the SQL returns.
    """
    rev = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit(start).cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit(end).cast("timestamp_ntz"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC4))
            .cast("double")
            .alias("total_revenue")
        )
    )
    best = rev.agg(F.max("total_revenue").alias("_best"))
    return (
        rev.crossJoin(F.broadcast(best))
        .filter(F.col("total_revenue") == F.col("_best"))
        .select("l_suppkey", "total_revenue")
        .orderBy("l_suppkey")
    )


def small_quantity_part_revenue(
    lineitem: DataFrame, part: DataFrame, brand: str = "Brand#1", inv_factor: int = 5
) -> DataFrame:
    """TPC-H Q17-shaped: average yearly revenue lost if small orders (below
    1/``inv_factor`` × that part's average quantity) were not filled.

    The correlated AVG subquery is decorrelated into a per-part aggregate
    joined back to the fact rows. Both the aggregate and the probe key on
    l_partkey, and the brand-filtered part dimension is broadcast, so the
    plan is: one shuffle on l_partkey (shared by agg + join via AQE), one
    broadcast — no correlated re-execution per row, which is the difference
    between O(N) and O(N·parts) at 100 TB.

    The threshold compare ``qty < avg/inv_factor`` is evaluated as
    ``qty · n · inv_factor < sum(qty)``: quantities are integer-valued, so
    every term is exact in doubles and the predicate is bit-identical in
    any engine and under ANY partitioning/summation order — a double
    ``avg()`` would be last-ulp order-dependent at the boundary.
    """
    parts = part.filter(F.col("p_brand") == brand).select("p_partkey")
    li = lineitem.join(
        F.broadcast(parts), lineitem["l_partkey"] == F.col("p_partkey")
    ).select("l_partkey", "l_quantity", "l_extendedprice")
    qstats = li.groupBy(F.col("l_partkey").alias("_pk")).agg(
        F.sum("l_quantity").alias("_sum_qty"),
        F.count(F.lit(1)).alias("_n"),
    )
    return (
        li.join(qstats, li["l_partkey"] == F.col("_pk"))
        .filter(
            F.col("l_quantity") * F.col("_n") * F.lit(inv_factor)
            < F.col("_sum_qty")
        )
        .agg(
            F.round(
                F.sum(_money(F.col("l_extendedprice"))).cast(_DEC_OUT)
                / F.lit(7.0),
                4,
            ).alias("avg_yearly")
        )
    )


def nation_trade_volume(
    nation: DataFrame,
    supplier: DataFrame,
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation_a: str = "NATION_1",
    nation_b: str = "NATION_2",
) -> DataFrame:
    """TPC-H Q7-shaped bilateral trade: revenue shipped between two nations
    per ship year, both directions kept separate.

    Plan: nation is broadcast into BOTH dimension arms; supplier⋈nation is a
    ~100-row broadcast into the fact; customer⋈nation shuffles orders on
    o_custkey once (customer is NOT broadcastable at 100 TB); the fact then
    joins orders on the order key. Exactly two big exchanges — custkey and
    orderkey — each unavoidable for the respective equi-join.
    """
    n = nation.filter(F.col("n_name").isin(nation_a, nation_b))
    supp = supplier.join(
        F.broadcast(n.select(F.col("n_nationkey").alias("sn_key"),
                             F.col("n_name").alias("supp_nation"))),
        supplier["s_nationkey"] == F.col("sn_key"),
    ).select("s_suppkey", "supp_nation")
    cust = customer.join(
        F.broadcast(n.select(F.col("n_nationkey").alias("cn_key"),
                             F.col("n_name").alias("cust_nation"))),
        customer["c_nationkey"] == F.col("cn_key"),
    ).select("c_custkey", "cust_nation")
    ords = orders.join(cust, orders["o_custkey"] == cust["c_custkey"]).select(
        "o_orderkey", "cust_nation"
    )
    disc = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC4)
    return (
        lineitem.join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(F.sum(disc).cast("double").alias("revenue"))
    )


def returned_item_customers(
    nation: DataFrame,
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    start: str = "1997-10-01",
    end: str = "1998-01-01",
    k: int = 20,
) -> DataFrame:
    """TPC-H Q10-shaped: customers who returned the most revenue in a
    quarter (returnflag 'R'), with their nation.

    Plan: the quarter slice of orders joins the fact on the order key (the
    one big exchange); the per-customer aggregate keys on the join output;
    customer and nation attach AFTER aggregation — a broadcast of the
    1-row-per-customer aggregate side... no: the aggregate is per custkey,
    so the dimension join runs on the already-tiny aggregate, never on the
    fact. Top-k is TakeOrdered.
    """
    ords = orders.filter(
        (F.col("o_orderdate") >= F.lit(start).cast("timestamp_ntz"))
        & (F.col("o_orderdate") < F.lit(end).cast("timestamp_ntz"))
    ).select("o_orderkey", "o_custkey")
    disc = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC4)
    per_cust = (
        lineitem.filter(F.col("l_returnflag") == "R")
        .join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(F.sum(disc).cast("double").alias("revenue"))
    )
    return (
        per_cust.join(F.broadcast(customer), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "c_name", "c_acctbal", "n_name", "revenue")
        .orderBy(F.desc("revenue"), F.col("c_custkey"))
        .limit(k)
    )


def linestatus_priority_split(
    orders: DataFrame, lineitem: DataFrame, year: int = 1997
) -> DataFrame:
    """TPC-H Q12-shaped two-way conditional count: per line status, how many
    shipped lineitems belong to high-priority vs low-priority orders (the
    schema has no shipmode column; linestatus is the stand-in dimension).

    Plan: one fact-side year filter pushed to the parquet scan, one shuffle
    join to orders on the order key, one tiny agg. The CASE counts are
    BIGINT on both engines.
    """
    li = lineitem.filter(F.year("l_shipdate") == year)
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_priority_count"),
            F.sum(F.when(hi, 0).otherwise(1)).alias("low_priority_count"),
        )
        .orderBy("l_linestatus")
    )


def customer_order_distribution(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """TPC-H Q13-shaped double aggregation: the distribution of per-customer
    order counts (how many customers placed 0, 1, 2, … orders).

    Plan: left join customer→orders keyed on custkey (the one fact-scale
    exchange), per-customer count, then a second tiny agg over at most
    |distinct counts| groups. Customers with no orders land in the c_count=0
    bucket via the left join, exactly like the SQL twin.
    """
    counts = (
        customer.join(
            orders.select("o_custkey"),
            customer["c_custkey"] == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_custkey").alias("c_count"))
    )
    return (
        counts.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def part_supplier_counts(
    part: DataFrame,
    supplier: DataFrame,
    lineitem: DataFrame,
    exclude_brand: str = "Brand#3",
    exclude_type_prefix: str = "MEDIUM",
) -> DataFrame:
    """TPC-H Q16-shaped: distinct supplier count per (brand, type, size),
    excluding one brand, one type family, and suppliers in deficit
    (negative account balance — the schema has no comment/complaints
    column).

    Plan: the part dimension filter is broadcast into the fact's
    (partkey, suppkey) projection; the deficit-supplier exclusion is a
    broadcast ANTI join (tiny set); count_distinct shuffles once on the
    group key with partial distinct aggregation map-side.
    """
    parts = part.filter(
        (F.col("p_brand") != exclude_brand)
        & ~F.col("p_type").startswith(exclude_type_prefix)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    deficit = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    pairs = (
        lineitem.select("l_partkey", "l_suppkey")
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .join(
            F.broadcast(deficit),
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
    )
    return (
        pairs.groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


def bracketed_discount_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q19-shaped OR-of-ANDs predicate revenue: three (brand, size
    bracket, quantity bracket) arms OR-ed together (the schema has no
    container column; p_size brackets stand in).

    Plan: one broadcast join part→lineitem, then the disjunctive predicate
    evaluates INSIDE the join's generated code — Catalyst pushes the
    brand/size conjuncts common to all arms into the part scan, and the
    whole thing is a single fact pass with no shuffle before the 1-row agg.
    """
    j = lineitem.join(
        F.broadcast(part.select("p_partkey", "p_brand", "p_size")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    q = F.col("l_quantity")
    arm1 = (F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 10) & q.between(1, 11)
    arm2 = (F.col("p_brand") == "Brand#2") & F.col("p_size").between(1, 20) & q.between(10, 20)
    arm3 = (F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 30) & q.between(20, 30)
    disc = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(_DEC4)
    return j.filter(arm1 | arm2 | arm3).agg(
        F.sum(disc).cast("double").alias("revenue")
    )


def heavy_shippers_of_part_family(
    nation: DataFrame,
    supplier: DataFrame,
    part: DataFrame,
    lineitem: DataFrame,
    name_prefix: str = "red",
    year: int = 1997,
    qty_factor: float = 50.0,
) -> DataFrame:
    """TPC-H Q20-shaped nested-IN chain: suppliers who shipped more than
    ``qty_factor`` units of any part in a name family during one year
    (the schema has no partsupp/availqty; the shipped-quantity aggregate
    replaces the stock threshold).

    Plan: part-family filter broadcasts into the year-sliced fact; ONE
    aggregate keyed (suppkey, partkey) with the HAVING threshold; the
    distinct supplier set of survivors is tiny → broadcast SEMI join into
    the supplier dimension, nation broadcast after. The fact is scanned
    once; no correlated re-execution.
    """
    fam = part.filter(F.col("p_name").startswith(name_prefix)).select("p_partkey")
    shipped = (
        lineitem.filter(F.year("l_shipdate") == year)
        .join(F.broadcast(fam), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast(_DEC)).alias("_qty"))
        .filter(F.col("_qty") > F.lit(qty_factor).cast(_DEC))
        .select("l_suppkey")
        .distinct()
    )
    return (
        supplier.join(
            F.broadcast(shipped),
            supplier["s_suppkey"] == F.col("l_suppkey"),
            "left_semi",
        )
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Column-level data-profiling report (the Deequ/Great-Expectations
    primitive an analytics engine owes its users): per column — row/null
    counts, exact distinct cardinality, and type-appropriate min/max
    (numerics as DOUBLE, strings as-is, timestamps as epoch micros so the
    output is engine-portable; no double→string formatting anywhere).

    Scale shape: ONE aggregate computes every metric for every column in
    a single scan; the k exact count_distincts expand the shuffle k-fold
    (Spark's expand operator) — at 100 TB swap ``F.count_distinct`` for
    ``approx_count_distinct``/HLL registry (one pass, no expand) and keep
    the rest unchanged. The per-column unpivot is a stack over ONE row.
    """
    fields = [
        f for f in df.schema.fields if columns is None or f.name in columns
    ]
    aggs: list = [F.count(F.lit(1)).alias("_rows")]
    for f in fields:
        c, t = f.name, f.dataType.typeName()
        aggs.append(F.sum(F.col(c).isNull().cast("bigint")).alias(f"{c}__nulls"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"{c}__distinct"))
        if t in ("long", "integer", "double", "float", "short", "decimal"):
            aggs.append(F.min(c).cast("double").alias(f"{c}__min_num"))
            aggs.append(F.max(c).cast("double").alias(f"{c}__max_num"))
        elif t in ("timestamp", "timestamp_ntz"):
            aggs.append(
                F.unix_micros(F.min(c).cast("timestamp")).alias(f"{c}__min_num")
            )
            aggs.append(
                F.unix_micros(F.max(c).cast("timestamp")).alias(f"{c}__max_num")
            )
        else:
            aggs.append(F.lit(None).cast("double").alias(f"{c}__min_num"))
            aggs.append(F.lit(None).cast("double").alias(f"{c}__max_num"))
        if t == "string":
            aggs.append(F.min(c).alias(f"{c}__min_str"))
            aggs.append(F.max(c).alias(f"{c}__max_str"))
        else:
            aggs.append(F.lit(None).cast("string").alias(f"{c}__min_str"))
            aggs.append(F.lit(None).cast("string").alias(f"{c}__max_str"))
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{f.name}', {f.name}__nulls, {f.name}__distinct, "
        f"CAST({f.name}__min_num AS DOUBLE), CAST({f.name}__max_num AS DOUBLE), "
        f"{f.name}__min_str, {f.name}__max_str"
        for f in fields
    )
    return one.select(
        F.col("_rows").alias("n_rows"),
        F.expr(
            f"stack({len(fields)}, {stack_args}) AS "
            "(col_name, n_nulls, n_distinct, min_num, max_num, min_str, max_str)"
        ),
    ).select(
        "col_name", "n_rows", "n_nulls", "n_distinct",
        "min_num", "max_num", "min_str", "max_str",
    ).orderBy("col_name")


def json_shred_profile(df: DataFrame, json_col: str = "props") -> DataFrame:
    """Schema-inferring profile of a JSON string column (the F9 family
    generalized): one row per TOP-LEVEL KEY with presence, null rate,
    inferred-type histogram (int / float / bool / string / object /
    array), distinct scalar cardinality, and numeric min/max/avg — the
    report that tells a pipeline author what columns to shred a
    semi-structured payload into (reference src/db/log_ops.py stores
    ``parsed_data`` as an opaque TEXT blob; this is the first step of
    promoting it to real columns).

    Scale shape: ``from_json`` to ``map<string,string>`` then ONE
    explode — key discovery, value extraction, and type inference all
    ride the same projection, no driver-side key collection, no dynamic
    plan. The single exchange carries |keys| map-side-combined partial
    rows. Type inference classifies the extracted value TEXT with the
    same rules in both engines (a JSON string "123" is indistinguishable
    from the number 123 after extraction — the documented ambiguity of
    text-grain shredding; keys whose values mix quoted and unquoted
    numerics land in the numeric bucket on both sides, identically).
    Distinct counts canonicalize numerics through %.17g so "1.50" and
    "1.5" collapse; objects/arrays are excluded (their serialization is
    formatting-dependent). Exact count_distinct — swap for HLL at 100 TB
    exactly as profile_table prescribes.
    """
    kv = df.select(
        F.explode(F.from_json(F.col(json_col), "map<string,string>")).alias(
            "key", "val"
        )
    )
    is_bool = F.col("val").isin("true", "false")
    is_int = F.col("val").rlike(r"^-?\d+$")
    is_float = (
        ~is_int
        & ~is_bool
        & F.col("val").rlike(r"^-?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$")
    )
    is_obj = F.col("val").startswith("{")
    is_arr = F.col("val").startswith("[")
    num = F.when(is_int | is_float, F.col("val").cast("double"))
    present = F.col("val").isNotNull()
    is_str = present & ~is_bool & ~is_int & ~is_float & ~is_obj & ~is_arr
    canon = (
        F.when(num.isNotNull(), F.format_string("%.17g", num))
        .when(is_bool | is_str, F.col("val"))
    )
    per_key = kv.groupBy("key").agg(
        F.count(F.lit(1)).alias("n_present"),
        F.sum((~present).cast("bigint")).alias("n_null"),
        # when/otherwise (not a bare cast): predicates are NULL for NULL
        # values, and an all-null key must profile as 0, not NULL
        F.sum(F.when(is_int, 1).otherwise(0)).alias("n_int"),
        F.sum(F.when(is_float, 1).otherwise(0)).alias("n_float"),
        F.sum(F.when(is_bool, 1).otherwise(0)).alias("n_bool"),
        F.sum(F.when(is_str, 1).otherwise(0)).alias("n_string"),
        F.sum(F.when(is_obj, 1).otherwise(0)).alias("n_object"),
        F.sum(F.when(is_arr, 1).otherwise(0)).alias("n_array"),
        F.count_distinct(canon).alias("n_distinct_scalar"),
        F.min(num).alias("min_num"),
        F.max(num).alias("max_num"),
        # avg at 6-dp parse precision, fully order- AND engine-exact:
        # round the double to the 6-dp grid (residual error ~1e-16 <<
        # half a grid step, so the decimal cast snaps to the exact grid
        # point), sum EXACTLY in decimal, and do the final mean rounding
        # in INTEGER micro-units — a bare double avg() flips the 6th
        # digit with partial-sum order, and even decimal-sum + round(
        # double) differs between engines on exact .5 boundaries because
        # Spark's round() rounds the SHORTEST DECIMAL REPR of the double
        # (BigDecimal.valueOf) while DuckDB rounds the exact binary value
        # (both failure modes caught by the hypothesis fuzzer)
        F.sum(F.round(num, 6).cast("decimal(38,6)")).alias("_sum6"),
        F.count(num).alias("_n_num"),
    )
    total = df.agg(F.count(F.lit(1)).alias("_total"))
    return (
        per_key.crossJoin(F.broadcast(total))
        .select(
            "key",
            "n_present",
            F.round(F.col("n_present") / F.col("_total"), 6).alias(
                "presence_frac"
            ),
            "n_null", "n_int", "n_float", "n_bool", "n_string",
            "n_object", "n_array", "n_distinct_scalar",
            "min_num", "max_num",
            # round-half-away in exact integer micro-units:
            # sign * ((2|s| + n) div (2n)); micro-sum fits a long for
            # |sum| < ~9e12 (profile-grade contract)
            F.when(
                F.col("_n_num") > 0,
                F.expr(
                    "cast((case when _sum6 < 0 then -1 else 1 end) * "
                    "((2 * cast(abs(_sum6) * 1000000 as bigint) + _n_num)"
                    " div (2 * _n_num)) as double) / 1000000.0"
                ),
            ).alias("avg_num"),
        )
        .orderBy("key")
    )


def json_shred_profile_oracle_sql(table: str = "events", json_col: str = "props") -> str:
    """DuckDB mirror: json_keys + dynamic json_extract for (key, value)
    — this build ships json_keys but not the json_each table function —
    with the value normalized to the SAME text Spark's
    map<string,string> extraction yields (strings unquoted, other
    scalars raw, objects/arrays compact-serialized by both engines),
    then identical classification rules."""
    return f"""
    WITH kv0 AS (
        SELECT unnest(json_keys({json_col})) AS key, {json_col} AS j
        FROM {table}
    ),
    kv AS (
        SELECT key,
               CASE WHEN json_type(json_extract(j, '$.' || key)) = 'VARCHAR'
                        THEN json_extract_string(j, '$.' || key)
                    WHEN json_type(json_extract(j, '$.' || key)) IS NULL
                        THEN NULL
                    ELSE CAST(json_extract(j, '$.' || key) AS VARCHAR)
               END AS val
        FROM kv0
    ),
    cls AS (
        SELECT key, val,
               regexp_matches(val, '^-?\\d+$') AS is_int,
               val IN ('true', 'false') AS is_bool,
               (NOT regexp_matches(val, '^-?\\d+$'))
                   AND val NOT IN ('true', 'false')
                   AND regexp_matches(
                       val, '^-?(\\d+\\.?\\d*|\\.\\d+)([eE][+-]?\\d+)?$')
                   AS is_float,
               starts_with(val, '{{') AS is_obj,
               starts_with(val, '[') AS is_arr
        FROM kv
    ),
    typed AS (
        SELECT key, val, is_int, is_bool, is_float, is_obj, is_arr,
               CASE WHEN is_int OR is_float
                    THEN CAST(val AS DOUBLE) END AS num,
               (val IS NOT NULL AND NOT is_bool AND NOT is_int
                AND NOT is_float AND NOT is_obj AND NOT is_arr) AS is_str
        FROM cls
    ),
    tot AS (SELECT count(*) AS n FROM {table})
    SELECT key,
           CAST(count(*) AS BIGINT) AS n_present,
           round(count(*) / (SELECT CAST(n AS DOUBLE) FROM tot), 6)
               AS presence_frac,
           CAST(sum(CASE WHEN val IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_null,
           CAST(sum(CASE WHEN is_int THEN 1 ELSE 0 END) AS BIGINT) AS n_int,
           CAST(sum(CASE WHEN is_float THEN 1 ELSE 0 END) AS BIGINT)
               AS n_float,
           CAST(sum(CASE WHEN is_bool THEN 1 ELSE 0 END) AS BIGINT)
               AS n_bool,
           CAST(sum(CASE WHEN is_str THEN 1 ELSE 0 END) AS BIGINT)
               AS n_string,
           CAST(sum(CASE WHEN is_obj THEN 1 ELSE 0 END) AS BIGINT)
               AS n_object,
           CAST(sum(CASE WHEN is_arr THEN 1 ELSE 0 END) AS BIGINT)
               AS n_array,
           CAST(count(DISTINCT CASE
                WHEN num IS NOT NULL THEN printf('%.17g', num)
                WHEN is_bool OR is_str THEN val END) AS BIGINT)
               AS n_distinct_scalar,
           min(num) AS min_num,
           max(num) AS max_num,
           CASE WHEN count(num) > 0 THEN
               CAST((CASE WHEN sum(CAST(round(num, 6) AS DECIMAL(38, 6))) < 0
                          THEN -1 ELSE 1 END)
                    * ((2 * CAST(abs(sum(CAST(round(num, 6)
                              AS DECIMAL(38, 6)))) * 1000000 AS BIGINT)
                        + count(num)) // (2 * count(num))) AS DOUBLE)
               / 1000000.0
           END AS avg_num
    FROM typed GROUP BY key ORDER BY key
    """


def vocab_growth_report(documents: DataFrame) -> DataFrame:
    """Per-source lexical profile: token/type counts, type-token ratio,
    and hapax fraction (share of types seen exactly once — the Heaps'-law
    tail a tokenizer vocabulary decision needs). Two-level aggregation:
    (source, word) counts reduce map-side, then one tiny source-grain agg;
    the doc counts ride a separate skinny agg joined at source grain.
    """
    from ..functions import text as T

    words = documents.select(
        "source", F.explode(T.words(F.col("text"))).alias("word")
    )
    types = (
        words.groupBy("source", "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_types"),
            F.sum("cnt").alias("n_tokens"),
            F.sum((F.col("cnt") == 1).cast("bigint")).alias("n_hapax"),
        )
    )
    docs = documents.groupBy("source").agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        types.join(docs, "source")
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "n_types",
            "n_hapax",
            F.round(F.col("n_types") / F.col("n_tokens").cast("double"), 6).alias(
                "type_token_ratio"
            ),
            F.round(F.col("n_hapax") / F.col("n_types").cast("double"), 6).alias(
                "hapax_frac"
            ),
        )
        .orderBy("source")
    )


def drift_report(events: DataFrame, bins: int = 10) -> DataFrame:
    """Distribution-drift monitoring (the data-quality gate a production
    ingest pipeline runs before trusting a new slice): split the stream
    at the midpoint of its time range into REFERENCE and CURRENT halves
    and report, per event_type —

    - PSI (population stability index) of ``value`` over ``bins``
      equal-width bins fitted on the reference half (Laplace-smoothed so
      empty bins stay finite; >0.2 is the conventional act threshold),
    - the exact two-sample KS statistic (max ECDF gap),
    - the mean shift.

    Scale shape: the split boundary and reference bin edges come from ONE
    global min/max aggregate (broadcast back); PSI is two grouped counts
    and a KB-sized per-(type, bin) join — no sorts. The exact KS needs
    per-type order statistics (a per-type window sort): fine for
    enum-sized key sets like event_type; for high-cardinality groups at
    100 TB swap the ECDFs for KLL-sketch quantiles (operators/sketches
    registry) and take the max gap over the sketch grid — the PSI
    numbers need no such swap.
    """
    b = events.select(
        F.col("event_type"),
        F.col("value").cast("double").alias("v"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
    )
    bounds = b.agg(
        F.min("us").alias("lo_us"),
        F.max("us").alias("hi_us"),
        F.min("v").alias("lo_v"),
        F.max("v").alias("hi_v"),
    )
    # integer midpoint: exact and engine-portable
    sliced = b.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        "v",
        (F.col("us") <= (F.col("lo_us") + F.col("hi_us")) / F.lit(2))
        .cast("int")
        .alias("is_ref"),
        "lo_v",
        "hi_v",
    )
    # ref-fitted equal-width bins, clamped; width from the GLOBAL value
    # range so both halves bin identically (deterministic, portable).
    # Degenerate range (hi_v == lo_v, a constant column) would divide by
    # zero — Spark's non-ANSI cast would bin the NaN silently while the
    # DuckDB oracle errors on CAST(NaN AS INT); clamping the width keeps
    # (v - lo_v) / width = 0 → bin 0 identically in both engines.
    width = F.greatest(F.col("hi_v") - F.col("lo_v"), F.lit(1e-300)) / F.lit(
        float(bins)
    )
    raw_bin = F.floor((F.col("v") - F.col("lo_v")) / width).cast("int")
    binned = sliced.select(
        "event_type",
        "v",
        "is_ref",
        F.least(F.greatest(raw_bin, F.lit(0)), F.lit(bins - 1)).alias("bin"),
    )
    per_bin = binned.groupBy("event_type", "bin").agg(
        F.sum("is_ref").alias("n_ref_bin"),
        F.sum(F.lit(1) - F.col("is_ref")).alias("n_cur_bin"),
    )
    totals = binned.groupBy("event_type").agg(
        F.sum("is_ref").alias("n_ref"),
        F.sum(F.lit(1) - F.col("is_ref")).alias("n_cur"),
        # decimal sums (order-independent), double division — never a
        # double avg() whose partial order varies with partitioning
        F.round(
            F.sum(F.when(F.col("is_ref") == 0, F.col("v")).cast(_DEC))
            .cast("double")
            / F.sum(F.lit(1) - F.col("is_ref"))
            - F.sum(F.when(F.col("is_ref") == 1, F.col("v")).cast(_DEC))
            .cast("double")
            / F.sum("is_ref"),
            6,
        ).alias("mean_shift"),
    )
    # Laplace smoothing: (n_bin + 0.5) / (n + 0.5 * bins) on both sides
    p_ref = (F.col("n_ref_bin") + F.lit(0.5)) / (
        F.col("n_ref") + F.lit(0.5 * bins)
    )
    p_cur = (F.col("n_cur_bin") + F.lit(0.5)) / (
        F.col("n_cur") + F.lit(0.5 * bins)
    )
    psi = per_bin.join(totals, "event_type").groupBy("event_type").agg(
        F.round(
            F.sum((p_cur - p_ref) * F.log(p_cur / p_ref)), 6
        ).alias("psi")
    )
    # exact KS: per-type ECDF gap over the pooled sorted values. Both
    # ECDFs jump only at observed values, and at a value present in BOTH
    # halves both jumps land at once — so accumulate the per-distinct-v
    # increments of each half FIRST and evaluate the gap once per
    # distinct v (a row-grain running sum ordered by (v, is_ref) would
    # read the gap mid-jump and overstate KS on cross-half ties; e.g.
    # ref={1,1}, cur={1,1} must give 0, not 1).
    per_v = binned.groupBy("event_type", "v").agg(
        F.sum("is_ref").alias("r_v"),
        F.sum(F.lit(1) - F.col("is_ref")).alias("c_v"),
    )
    w = Window.partitionBy("event_type").orderBy("v")
    ks = (
        per_v.join(totals.select("event_type", "n_ref", "n_cur"), "event_type")
        .withColumn(
            "gap",
            F.abs(
                F.sum("r_v").over(w).cast("double") / F.col("n_ref")
                - F.sum("c_v").over(w).cast("double") / F.col("n_cur")
            ),
        )
        .groupBy("event_type")
        .agg(F.round(F.max("gap"), 6).alias("ks_stat"))
    )
    return (
        totals.join(psi, "event_type")
        .join(ks, "event_type")
        .select(
            "event_type",
            F.col("n_ref").cast("bigint").alias("n_ref"),
            F.col("n_cur").cast("bigint").alias("n_cur"),
            "psi",
            "ks_stat",
            "mean_shift",
        )
        .orderBy("event_type")
    )


def constraint_report(
    tables: dict[str, DataFrame], rules: list[dict]
) -> DataFrame:
    """Data-contract validation (the Deequ/dbt-test primitive): evaluate a
    rule list against the warehouse and report one row per rule —
    (rule, n_checked, n_violations, passed). Rule kinds:

    - ``not_null``: {table, column}
    - ``unique``:   {table, columns} — duplicate-key rows beyond the
      first occurrence count as violations (n_rows − n_distinct)
    - ``range``:    {table, column, lo, hi} (inclusive; NULLs violate)
    - ``in_set``:   {table, column, values} (NULLs violate)
    - ``fk``:       {table, column, ref_table, ref_column} — child keys
      (including NULLs) with no parent

    Scale shape: every non-fk rule is ONE aggregate over its table
    (rules on the same table could be fused by the caller into a single
    pass — each stays separate here so the report's per-rule n_checked
    is explicit); fk rules are one anti-join each with the dim side
    broadcast by AQE. Nothing driver-side; the report is |rules| rows.
    """
    from functools import reduce

    outs = []
    for r in rules:
        t = tables[r["table"]]
        name = r.get(
            "name", f"{r['kind']}:{r['table']}.{r.get('column', r.get('columns'))}"
        )
        if r["kind"] == "not_null":
            agg = t.agg(
                F.count(F.lit(1)).alias("n_checked"),
                F.sum(F.col(r["column"]).isNull().cast("bigint")).alias(
                    "n_violations"
                ),
            )
        elif r["kind"] == "unique":
            cols = list(r["columns"])
            agg = t.agg(
                F.count(F.lit(1)).alias("n_checked"),
                (
                    F.count(F.lit(1))
                    - F.count_distinct(*[F.col(c) for c in cols])
                ).alias("n_violations"),
            )
        elif r["kind"] == "range":
            ok = F.col(r["column"]).between(F.lit(r["lo"]), F.lit(r["hi"]))
            agg = t.agg(
                F.count(F.lit(1)).alias("n_checked"),
                F.sum(
                    (~F.coalesce(ok, F.lit(False))).cast("bigint")
                ).alias("n_violations"),
            )
        elif r["kind"] == "in_set":
            ok = F.col(r["column"]).isin(*r["values"])
            agg = t.agg(
                F.count(F.lit(1)).alias("n_checked"),
                F.sum(
                    (~F.coalesce(ok, F.lit(False))).cast("bigint")
                ).alias("n_violations"),
            )
        elif r["kind"] == "fk":
            ref = tables[r["ref_table"]].select(
                F.col(r["ref_column"]).alias("_ref")
            ).distinct()
            orphans = t.join(
                ref, F.col(r["column"]) == F.col("_ref"), "left_anti"
            )
            agg = t.agg(F.count(F.lit(1)).alias("n_checked")).crossJoin(
                orphans.agg(F.count(F.lit(1)).alias("n_violations"))
            )
        else:
            raise ValueError(f"unknown rule kind {r['kind']!r}")
        outs.append(agg.select(F.lit(name).alias("rule"), "n_checked",
                               "n_violations"))
    report = reduce(lambda a, b: a.unionByName(b), outs)
    return report.select(
        "rule",
        F.col("n_checked").cast("bigint").alias("n_checked"),
        F.col("n_violations").cast("bigint").alias("n_violations"),
        (F.col("n_violations") == 0).alias("passed"),
    ).orderBy("rule")


def skew_report(
    df: DataFrame, key_col: str, top_n: int = 10
) -> DataFrame:
    """Join/agg-key skew diagnostics — the report an operator reads
    BEFORE sizing a shuffle at 100 TB: the ``top_n`` heaviest keys with
    their share of the table, the ratio to the mean key weight, and the
    salt factor ``relational.salted_join`` would need to flatten each
    one (ceil of that ratio: splitting a hot key into that many salted
    sub-keys brings its partition back to mean weight).

    Scale shape: ONE grouped count with map-side combine (the same
    exchange any aggregation on this key pays), a two-scalar broadcast
    (mean key weight), and a TakeOrdered top-N — no global sort, no
    second pass over data."""
    counts = df.groupBy(F.col(key_col).cast("string").alias("key")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    stats = counts.agg(
        (F.sum("cnt").cast("double") / F.count(F.lit(1))).alias("mean_cnt")
    )
    return (
        counts.crossJoin(F.broadcast(stats))
        .select(
            "key",
            F.col("cnt").cast("bigint").alias("cnt"),
            F.round(F.col("cnt") / F.col("mean_cnt"), 6).alias(
                "ratio_to_mean"
            ),
            F.ceil(F.col("cnt") / F.col("mean_cnt"))
            .cast("int")
            .alias("suggested_salt"),
        )
        .orderBy(F.desc("cnt"), "key")
        .limit(top_n)
    )


def _rank_median(df: DataFrame, key: str, col: str, out: str) -> DataFrame:
    """Per-``key`` exact median of ``col`` by RANK SELECTION: pick the
    middle one (odd n) or two (even n) order statistics and average them
    with one explicit (a + b) / 2.

    Why not percentile()/median(): Spark's percentile interpolates
    ``a + (b − a)·f`` while DuckDB's median computes ``(a + b) / 2`` —
    different float expression trees that can differ in the last ulp.
    Rank selection makes the chosen VALUES order-independent (ties give
    equal values), and a two-term IEEE sum is commutative, so the result
    is bit-identical across engines regardless of row order."""
    wv = Window.partitionBy(key).orderBy(col)
    wn = Window.partitionBy(key)
    t = df.select(
        key,
        col,
        F.row_number().over(wv).alias("_rn"),
        F.count(F.lit(1)).over(wn).alias("_n"),
    )
    lo = F.expr("CAST(floor((_n + 1) / 2.0) AS BIGINT)")
    hi = F.expr("CAST(floor((_n + 2) / 2.0) AS BIGINT)")
    picked = t.filter((F.col("_rn") == lo) | (F.col("_rn") == hi))
    return picked.groupBy(key).agg(
        (F.sum(col) / F.count(F.lit(1))).alias(out)
    )


def mad_anomaly(events: DataFrame, k: float = 3.0) -> DataFrame:
    """Robust per-type outlier census: flag values beyond
    ``k · 1.4826 · MAD`` of the median (1.4826 scales MAD to σ under
    normality) — the heavy-tail-safe twin of the z-score anomaly_flags
    (reference src/ml/volume_analyzer.py's std-based flags break when
    the tail IS the anomaly, the textbook argument for MAD).

    Both medians (of values, then of absolute deviations) use
    _rank_median, so every float on the flag path is bit-identical in
    the DuckDB oracle. Scale: two sort-windows at (type, value) grain
    plus broadcast-sized median joins — no driver compute, corpus
    scanned once into the rounded projection."""
    base = events.select(
        "event_type", F.round("value", 2).alias("v")
    )
    med = _rank_median(base, "event_type", "v", "med")
    dev = base.join(med, "event_type").select(
        "event_type", "v", "med", F.abs(F.col("v") - F.col("med")).alias("d")
    )
    mad = _rank_median(
        dev.select("event_type", "d"), "event_type", "d", "mad"
    )
    flagged = dev.join(mad, "event_type").select(
        "event_type",
        "med",
        "mad",
        (F.col("d") > F.lit(k) * F.lit(1.4826) * F.col("mad")).alias("is_out"),
    )
    return (
        flagged.groupBy("event_type", "med", "mad")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.col("is_out").cast("bigint")).alias("n_anomalies"),
        )
        .select(
            "event_type",
            "n_events",
            F.round("med", 6).alias("med"),
            F.round("mad", 6).alias("mad"),
            "n_anomalies",
        )
        .orderBy("event_type")
    )


def mad_anomaly_oracle_sql(k: float = 3.0) -> str:
    """DuckDB twin: identical rank-selected medians and flag expression."""
    return f"""
    WITH base AS (
        SELECT event_type, round(value, 2) AS v FROM events
    ),
    rv AS (
        SELECT event_type, v,
               row_number() OVER (PARTITION BY event_type ORDER BY v)
                   AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM base
    ),
    med AS (
        SELECT event_type, sum(v) / count(*) AS med
        FROM rv
        WHERE rn = CAST(floor((n + 1) / 2.0) AS BIGINT)
           OR rn = CAST(floor((n + 2) / 2.0) AS BIGINT)
        GROUP BY 1
    ),
    dev AS (
        SELECT base.event_type, v, med, abs(v - med) AS d
        FROM base JOIN med ON base.event_type = med.event_type
    ),
    rd AS (
        SELECT event_type, d,
               row_number() OVER (PARTITION BY event_type ORDER BY d)
                   AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM dev
    ),
    mad AS (
        SELECT event_type, sum(d) / count(*) AS mad
        FROM rd
        WHERE rn = CAST(floor((n + 1) / 2.0) AS BIGINT)
           OR rn = CAST(floor((n + 2) / 2.0) AS BIGINT)
        GROUP BY 1
    )
    SELECT dev.event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           round(dev.med, 6) AS med,
           round(mad.mad, 6) AS mad,
           CAST(sum(CASE WHEN dev.d > {k} * 1.4826 * mad.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_anomalies
    FROM dev JOIN mad ON dev.event_type = mad.event_type
    GROUP BY dev.event_type, dev.med, mad.mad
    ORDER BY dev.event_type
    """


def equidepth_bins(events: DataFrame, n_bins: int = 4) -> DataFrame:
    """Exact equi-depth (quantile) binning of ``value`` per event type —
    the ML feature-binning primitive (equal-population bins for WOE /
    calibration / histogram features). The naive form is a GLOBAL
    ``ntile`` window — one partition, one task, the canonical
    scale-killer; this computes the n_bins−1 cut points as exact
    rank-selected order statistics (the mad_anomaly machinery: the
    value at integer rank ⌈i·n/n_bins⌉ is well-defined under ties
    regardless of row_number permutation) and assigns bins by comparing
    against the broadcast-sized cut list — every stage stays keyed by
    event_type.

    Output: (event_type, bin, n, lo, hi, mean_v) — bin b holds values
    strictly above cut_b (ties at a cut land in the lower bin,
    identically on both engines).
    """
    base = events.select("event_type", F.round("value", 2).alias("v"))
    if n_bins <= 1:
        # single bin: no cuts to compute, every value lands in bin 0
        binned = base.select("event_type", "v", F.lit(0).alias("bin"))
    else:
        w = Window.partitionBy("event_type").orderBy("v")
        ranked = base.withColumn("rn", F.row_number().over(w)).withColumn(
            "n", F.count(F.lit(1)).over(Window.partitionBy("event_type"))
        )
        # ONE pass over the ranked table selects ALL n_bins−1 cut ranks:
        # explode the subset of cut ranks equal to this row's rn (the
        # explode keeps MULTIPLICITY — when n < n_bins several cut ranks
        # coincide on one row, and the duplicate cuts must each count in
        # the strictly-greater bin assignment, identically to the
        # oracle's UNION ALL). The previous form filtered `ranked` once
        # per cut rank, re-running the scan + per-type sort n_bins−1
        # times (ADVICE-r8).
        rank_arr = F.expr(
            f"transform(sequence(1, {n_bins - 1}),"
            f" i -> ((i * n) + {n_bins} - 1) div {n_bins})"
        )
        cuts = ranked.select(
            "event_type",
            F.col("v").alias("cut"),
            F.explode(
                F.filter(rank_arr, lambda r: r == F.col("rn"))
            ).alias("_r"),
        ).select("event_type", "cut")
        cut_list = cuts.groupBy("event_type").agg(
            F.array_sort(F.collect_list("cut")).alias("cuts")
        )
        binned = base.join(F.broadcast(cut_list), "event_type").select(
            "event_type",
            "v",
            F.size(
                F.filter(F.col("cuts"), lambda c: F.col("v") > c)
            ).alias("bin"),
        )
    return (
        binned.groupBy("event_type", "bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.min("v").alias("lo"),
            F.max("v").alias("hi"),
            F.round(F.avg("v"), 6).alias("mean_v"),
        )
        .orderBy("event_type", "bin")
    )


def equidepth_bins_oracle_sql(n_bins: int = 4) -> str:
    """DuckDB twin: identical integer-rank cut selection and
    strictly-greater bin assignment over the same rounded values.
    ``n_bins<=1`` mirrors the Spark fast path (no cuts, bin 0)."""
    if n_bins <= 1:
        return """
        SELECT event_type, CAST(0 AS INT) AS bin,
               CAST(count(*) AS BIGINT) AS n,
               min(round(value, 2)) AS lo, max(round(value, 2)) AS hi,
               round(avg(round(value, 2)), 6) AS mean_v
        FROM events
        GROUP BY 1
        ORDER BY 1
        """
    cut_ranks = " UNION ALL ".join(
        f"SELECT event_type, v AS cut FROM rv "
        f"WHERE rn = (({i} * n) + {n_bins} - 1) // {n_bins}"
        for i in range(1, n_bins)
    )
    return f"""
    WITH base AS (
        SELECT event_type, round(value, 2) AS v FROM events
    ),
    rv AS (
        SELECT event_type, v,
               row_number() OVER (PARTITION BY event_type ORDER BY v) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM base
    ),
    cuts AS ({cut_ranks}),
    binned AS (
        SELECT b.event_type, b.v,
               CAST((SELECT count(*) FROM cuts c
                     WHERE c.event_type = b.event_type AND b.v > c.cut)
                    AS INT) AS bin
        FROM base b
    )
    SELECT event_type, bin,
           CAST(count(*) AS BIGINT) AS n,
           min(v) AS lo, max(v) AS hi,
           round(avg(v), 6) AS mean_v
    FROM binned
    GROUP BY 1, 2
    ORDER BY 1, 2
    """


def rfm_segments(orders: DataFrame, customer: DataFrame) -> DataFrame:
    """RFM customer segmentation (Hughes 1994, the classic
    marketing-analytics primitive): per customer — Recency (last order
    date), Frequency (order count), Monetary (exact DECIMAL revenue
    sum) — each scored into within-NATION quintiles, composed into the
    3-digit RFM segment code (555 = best-everything).

    Quintiles are integer rank arithmetic, never a global ntile: rank r
    of n within the nation (metric asc, custkey tiebreak) scores
    q = (r−1)·5 div n + 1 — identical integer ops on both engines, and
    every window is KEYED by nation (the equidepth_bins discipline:
    the single-partition global sort never appears). Monetary sums cast
    through DECIMAL(18,2) so the aggregate is exact, then surface as
    DOUBLE (the engine-portability convention).

    Output: (c_custkey, nation, recency_us, frequency, monetary,
    r_score, f_score, m_score, segment).

    Scale: one customer-keyed aggregate over orders, one broadcast-sized
    join to customer, three windows sharing the SAME nation
    partitioning (one exchange serves all three sorts).
    """
    per_cust = orders.groupBy("o_custkey").agg(
        F.unix_micros(F.max("o_orderdate").cast("timestamp")).alias(
            "recency_us"
        ),
        F.count(F.lit(1)).cast("bigint").alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("monetary"),
    )
    base = per_cust.join(
        customer.select(
            F.col("c_custkey"), F.col("c_nationkey").alias("nation")
        ),
        per_cust["o_custkey"] == F.col("c_custkey"),
    ).select("c_custkey", "nation", "recency_us", "frequency", "monetary")
    n_w = Window.partitionBy("nation")

    def score(metric: str) -> "F.Column":
        w = Window.partitionBy("nation").orderBy(metric, "c_custkey")
        r = F.row_number().over(w)
        n = F.count(F.lit(1)).over(n_w)
        return ((r - F.lit(1)) * F.lit(5) / n).cast("bigint") + F.lit(1)

    scored = base.select(
        "c_custkey",
        "nation",
        "recency_us",
        "frequency",
        "monetary",
        score("recency_us").cast("int").alias("r_score"),
        score("frequency").cast("int").alias("f_score"),
        score("monetary").cast("int").alias("m_score"),
    )
    return scored.select(
        "*",
        (
            F.col("r_score") * 100 + F.col("f_score") * 10 + F.col("m_score")
        ).cast("int").alias("segment"),
    ).orderBy("c_custkey")


def rfm_segments_oracle_sql() -> str:
    """DuckDB twin: identical integer rank arithmetic; (r−1)·5 / n uses
    integer division on both engines (Spark's cast-to-bigint of the
    exact small integer ratio equals DuckDB's //)."""
    return """
    WITH per_cust AS (
        SELECT o_custkey,
               epoch_us(CAST(max(o_orderdate) AS TIMESTAMP)) AS recency_us,
               CAST(count(*) AS BIGINT) AS frequency,
               CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS monetary
        FROM orders GROUP BY 1
    ),
    base AS (
        SELECT c.c_custkey, c.c_nationkey AS nation,
               p.recency_us, p.frequency, p.monetary
        FROM per_cust p JOIN customer c ON p.o_custkey = c.c_custkey
    ),
    scored AS (
        SELECT c_custkey, nation, recency_us, frequency, monetary,
               CAST((row_number() OVER (PARTITION BY nation
                        ORDER BY recency_us, c_custkey) - 1) * 5
                    // count(*) OVER (PARTITION BY nation) + 1 AS INT)
                   AS r_score,
               CAST((row_number() OVER (PARTITION BY nation
                        ORDER BY frequency, c_custkey) - 1) * 5
                    // count(*) OVER (PARTITION BY nation) + 1 AS INT)
                   AS f_score,
               CAST((row_number() OVER (PARTITION BY nation
                        ORDER BY monetary, c_custkey) - 1) * 5
                    // count(*) OVER (PARTITION BY nation) + 1 AS INT)
                   AS m_score
        FROM base
    )
    SELECT *, CAST(r_score * 100 + f_score * 10 + m_score AS INT) AS segment
    FROM scored ORDER BY c_custkey
    """


def profile_diff_report(
    old: DataFrame, new: DataFrame, columns: list[str] | None = None
) -> DataFrame:
    """Data-quality DRIFT report between two snapshots of the same
    table (the Deequ AnalyzerContext-diff primitive): per column — the
    old/new row, null and distinct counts, the null-RATE delta, and the
    distinct-cardinality ratio. The check a pipeline runs between
    ingest batches to catch schema rot (nulls creeping in, an enum
    exploding, a column going constant) BEFORE a model trains on it.

    Output: (col_name, n_old, n_new, nulls_old, nulls_new,
    null_rate_delta, distinct_old, distinct_new, distinct_ratio) —
    rates divide exact BIGINTs in double, 6-dp rounded;
    distinct_ratio = new/old (NULL when old is 0).

    Scale: two profile_table passes (each ONE scan + the expand for
    exact distincts — swap approx_count_distinct at 100 TB per the
    profile_table card) joined on the column name — a |columns|-row
    join, nothing corpus-sized crosses.
    """
    po = profile_table(old, columns).select(
        "col_name",
        F.col("n_rows").alias("n_old"),
        F.col("n_nulls").alias("nulls_old"),
        F.col("n_distinct").alias("distinct_old"),
    )
    pn = profile_table(new, columns).select(
        "col_name",
        F.col("n_rows").alias("n_new"),
        F.col("n_nulls").alias("nulls_new"),
        F.col("n_distinct").alias("distinct_new"),
    )
    return (
        po.join(pn, "col_name")
        .select(
            "col_name",
            "n_old",
            "n_new",
            "nulls_old",
            "nulls_new",
            F.round(
                F.col("nulls_new").cast("double") / F.col("n_new")
                - F.col("nulls_old").cast("double") / F.col("n_old"),
                6,
            ).alias("null_rate_delta"),
            "distinct_old",
            "distinct_new",
            F.when(
                F.col("distinct_old") > 0,
                F.round(
                    F.col("distinct_new").cast("double")
                    / F.col("distinct_old"),
                    6,
                ),
            ).alias("distinct_ratio"),
        )
        .orderBy("col_name")
    )


def benford_deviation_report(events: DataFrame) -> DataFrame:
    """Benford first-significant-digit audit per event type (Newcomb
    1881 / Benford 1938; the Deequ-style numeric-forensics analyzer):
    naturally-generated positive amounts follow P(d) = log10(1 + 1/d);
    fabricated, truncated, or unit-capped values do not — a per-segment
    deviation table is the classic screen for synthetic or corrupted
    numeric feeds before they poison a training mix.

    Digit extraction is EXACT and engine-portable by design: ``value``
    carries 2 decimals, so cents = CAST(round(value·100) AS BIGINT) is
    an exact integer, and Benford's law is SCALE-INVARIANT (multiplying
    by 10^k never changes the leading significant digit), so the first
    character of the integer's decimal string IS the first significant
    digit of value. This deliberately avoids floor(v / 10^floor(log10 v))
    — near exact powers of ten that expression sits one libm ulp from
    the wrong digit, and Spark (JVM StrictMath) and DuckDB (C libm) do
    NOT promise bit-identical log10/pow.

    Output, (event_type × digit 1-9) spine (zeros kept — a MISSING
    digit is the strongest fabrication signal): (event_type, digit, n,
    observed_p, expected_p, abs_dev), 6-dp rounds.

    Scale: one corpus scan → (type, digit) count (map-side combine,
    ≤ 9·|types| groups), a broadcast 9-row digit spine, and the
    per-type total as a sum() OVER (PARTITION BY event_type) on the
    spine frame (the r10 window-analytic discipline — no totals join).
    """
    cents = F.round(F.col("value") * F.lit(100.0), 0).cast("bigint")
    base = events.filter(F.col("value") > 0).select(
        "event_type",
        F.substring(cents.cast("string"), 1, 1).cast("int").alias("digit"),
    )
    counts = base.groupBy("event_type", "digit").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    types = events.select("event_type").distinct()
    digits = F.explode(F.sequence(F.lit(1), F.lit(9))).alias("digit")
    spine = types.select("event_type", digits)
    joined = spine.join(counts, ["event_type", "digit"], "left").select(
        "event_type", "digit", F.coalesce("n", F.lit(0)).alias("n")
    )
    total = F.sum("n").over(Window.partitionBy("event_type"))
    expected = F.round(
        F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double")), 6
    )
    # The spine covers ALL event types but counts only value>0 rows, so a
    # type with no positive values has total = 0; guard the share to NULL
    # (not 0/0 -> NaN — NaN-vs-NULL is engine/version dependent, the same
    # divergence class forecast_backtest_report guards with NULLIF).
    observed = F.when(
        total > 0, F.round(F.col("n").cast("double") / total.cast("double"), 6)
    )
    return (
        joined.select(
            "event_type",
            "digit",
            F.col("n").cast("bigint").alias("n"),
            observed.alias("observed_p"),
            expected.alias("expected_p"),
        )
        .withColumn(
            "abs_dev",
            F.round(F.abs(F.col("observed_p") - F.col("expected_p")), 6),
        )
        .orderBy("event_type", "digit")
    )


def benford_oracle_sql() -> str:
    """DuckDB twin: the same exact cents-string digit, the same 9-row
    spine cross join, the same window total and 6-dp rounds."""
    return """
    WITH base AS (
        SELECT event_type,
               CAST(substr(CAST(CAST(round(value * 100.0, 0) AS BIGINT)
                    AS VARCHAR), 1, 1) AS INT) AS digit
        FROM events WHERE value > 0
    ),
    counts AS (
        SELECT event_type, digit, CAST(count(*) AS BIGINT) AS n
        FROM base GROUP BY 1, 2
    ),
    spine AS (
        SELECT t.event_type, CAST(d.d AS INT) AS digit
        FROM (SELECT DISTINCT event_type FROM events) t
        CROSS JOIN (SELECT unnest(generate_series(1, 9)) AS d) d
    ),
    j AS (
        SELECT s.event_type, s.digit, coalesce(c.n, 0) AS n
        FROM spine s LEFT JOIN counts c
          ON s.event_type = c.event_type AND s.digit = c.digit
    ),
    w AS (
        SELECT event_type, digit, CAST(n AS BIGINT) AS n,
               round(CAST(n AS DOUBLE) / CAST(NULLIF(sum(n) OVER (
                   PARTITION BY event_type), 0) AS DOUBLE), 6) AS observed_p,
               round(log10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6)
                   AS expected_p
        FROM j
    )
    SELECT event_type, digit, n, observed_p, expected_p,
           round(abs(observed_p - expected_p), 6) AS abs_dev
    FROM w
    ORDER BY event_type, digit
    """
