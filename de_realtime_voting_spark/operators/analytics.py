"""General analytics over the star schema (engine completeness).

TPC-H-style query shapes proving out the relational core: multi-agg
scans, multi-way joins, window functions, semi-joins, top-N.  Filters
are written directly against scan columns so Catalyst pushes them
into the parquet reader; dimension sides of joins are broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.columns import round_half_up as rnd


def q1_pricing_summary(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q1-shape: single wide scan, grouped multi-aggregate.
    Predicate on l_shipdate is pushed to the parquet scan."""
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        lineitem.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            rnd(F.sum("l_quantity"), 2).alias("sum_qty"),
            rnd(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            rnd(F.sum(disc_price), 4).alias("sum_disc_price"),
            rnd(F.sum(charge), 6).alias("sum_charge"),
            rnd(F.avg("l_quantity"), 4).alias("avg_qty"),
            rnd(F.avg("l_extendedprice"), 4).alias("avg_price"),
            rnd(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q3_shipping_priority(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame
) -> DataFrame:
    """Q3-shape: selective dim filter -> join -> agg -> top 10.
    Customer (filtered) broadcasts into orders; orders⋈lineitem is the
    only real shuffle."""
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.where(F.col("l_shipdate") > F.lit("1998-01-01"))
        .join(orders.where(F.col("o_orderdate") < F.lit("1998-01-01")),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(customer.where(F.col("c_mktsegment") == "BUILDING")),
              F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(rnd(F.sum(revenue), 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


def q5_regional_revenue(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
) -> DataFrame:
    """Q5-shape: 6-way join through the region hierarchy; the dim
    chain (region->nation->customer, supplier) broadcasts, the
    orders⋈lineitem fact join shuffles on orderkey."""
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    dims = (
        customer.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region.where(F.col("r_name") == "ASIA")),
              F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(dims), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            F.broadcast(supplier.withColumnRenamed("s_nationkey", "sn")),
            (F.col("l_suppkey") == F.col("s_suppkey")) & (F.col("sn") == F.col("c_nationkey")),
        )
        .groupBy("n_name")
        .agg(rnd(F.sum(revenue), 4).alias("revenue"))
    )


def top_brand_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Fact⋈dim agg + top-N; part dim broadcasts."""
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.join(F.broadcast(part.select("p_partkey", "p_brand")),
                      F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            rnd(F.sum(revenue), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.col("revenue").desc(), F.col("p_brand").asc())
        .limit(10)
    )


def customer_top_orders(orders: DataFrame) -> DataFrame:
    """Window-function top-3 orders per customer."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("order_rank", F.row_number().over(w))
        .where(F.col("order_rank") <= 3)
        .select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            rnd(F.col("o_totalprice"), 2).alias("totalprice"),
            F.col("order_rank"),
        )
    )


def order_priority_count(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Q4-shape EXISTS semi-join: orders having any heavy lineitem.
    left_semi avoids materializing the join -- one shuffle, no dup
    explosion."""
    heavy = lineitem.where(F.col("l_quantity") > 45).select("l_orderkey")
    return (
        orders.join(heavy, orders["o_orderkey"] == heavy["l_orderkey"], "left_semi")
        .groupBy(F.col("o_orderpriority").alias("order_priority"))
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def q7_nation_volume(
    nation: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
) -> DataFrame:
    """Q7-shape: cross-nation shipping volume (supplier nation x
    customer nation, different nations).  Both nation lookups
    broadcast; the fact join shuffles once on orderkey."""
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    n1 = nation.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
    )
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .where(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy("supp_nation", "cust_nation")
        .agg(
            rnd(F.sum(revenue), 4).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q10_returned_items(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame, nation: DataFrame
) -> DataFrame:
    """Q10-shape: top 20 customers by revenue lost to returns."""
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.where(F.col("l_returnflag") == "R")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            F.broadcast(customer.select("c_custkey", "c_name", "c_acctbal", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(F.broadcast(nation.select("n_nationkey", "n_name")),
              F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("cust_name"),
            F.col("n_name").alias("nation"),
        )
        .agg(rnd(F.sum(revenue), 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("custkey").asc())
        .limit(20)
    )


def supplier_nation_revenue(
    lineitem: DataFrame, supplier: DataFrame, nation: DataFrame
) -> DataFrame:
    """Revenue by supplier nation and ship year (TPC-H Q9's rollup
    shape without partsupp).  nation broadcasts; supplier joins on
    the shuffled suppkey -- a dim too large to pin at extreme SF, so
    AQE picks broadcast vs shuffle at runtime."""
    rev = (F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount"))).alias("rev")
    return (
        lineitem.select("l_suppkey", F.year("l_shipdate").alias("ship_year"), rev)
        .join(supplier.select("s_suppkey", "s_nationkey"),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation.select("n_nationkey", "n_name")),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), "ship_year")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            rnd(F.sum("rev"), 2).alias("revenue"),
        )
    )


def small_quantity_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q17 shape: revenue from orders far below a part's average
    order size.  The correlated scalar subquery (avg quantity per
    part) becomes a per-part aggregate joined back to the fact --
    one shuffle each side on partkey, partial aggs map-side."""
    per_part = lineitem.groupBy(F.col("l_partkey").alias("avg_partkey")).agg(
        (F.avg("l_quantity") * 0.5).alias("half_avg_qty")
    )
    brand = part.where(F.col("p_brand") == "Brand#19").select("p_partkey")
    return (
        lineitem.join(F.broadcast(brand), F.col("l_partkey") == F.col("p_partkey"))
        .join(per_part, F.col("l_partkey") == F.col("avg_partkey"))
        .where(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            rnd(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
        )
    )


def large_volume_orders(
    orders: DataFrame, lineitem: DataFrame, threshold: float = 300.0
) -> DataFrame:
    """TPC-H Q18 shape: orders whose total line quantity exceeds the
    threshold (GROUP BY + HAVING as a semi-join back to orders)."""
    big = (
        lineitem.groupBy(F.col("l_orderkey"))
        .agg(F.sum("l_quantity").alias("total_qty"))
        .where(F.col("total_qty") > threshold)
    )
    return (
        orders.join(big, orders["o_orderkey"] == big["l_orderkey"])
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderdate",
            rnd(F.col("o_totalprice"), 2).alias("total_price"),
            rnd(F.col("total_qty"), 2).alias("total_qty"),
        )
    )


def nation_acctbal(customer: DataFrame, nation: DataFrame) -> DataFrame:
    """Dim⋈dim rollup: customer balances per nation."""
    return (
        customer.join(F.broadcast(nation), customer["c_nationkey"] == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            rnd(F.sum("c_acctbal"), 2).alias("sum_acctbal"),
            rnd(F.avg("c_acctbal"), 4).alias("avg_acctbal"),
        )
    )


def q6_forecast_revenue(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q6 shape: pure scan-side filter + global agg.  Every
    predicate references a raw scan column, so all four reach the
    parquet reader as PushedFilters; no join, one partial+final agg."""
    return (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1998-01-01"))
            & (F.col("l_discount") >= 0.04)
            & (F.col("l_discount") <= 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            rnd(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q8_market_share(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    share_nation: str = "NATION_2",
    mkt_region: str = "ASIA",
) -> DataFrame:
    """TPC-H Q8 shape: share of one supplier-nation's revenue within a
    customer region, per order year.  Nation plays two roles (customer
    geography and supplier origin); both dim chains broadcast, the
    only shuffle is orders⋈lineitem + the final tiny year agg."""
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    cust_in_region = (
        customer.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(region.where(F.col("r_name") == mkt_region)),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("c_custkey")
    )
    supp_nation = (
        supplier.join(
            F.broadcast(nation.select(F.col("n_nationkey").alias("sn_key"),
                                      F.col("n_name").alias("supp_nation"))),
            F.col("s_nationkey") == F.col("sn_key"),
        )
        .select("s_suppkey", "supp_nation")
    )
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust_in_region), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            rnd(
                F.sum(F.when(F.col("supp_nation") == share_nation, rev).otherwise(0.0))
                / F.sum(rev),
                6,
            ).alias("mkt_share")
        )
    )


def q12_ship_lag_priority(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q12 shape adapted to the available columns: bucket line
    items by order->ship lag, count urgent vs other order priorities
    per bucket.  One fact-fact shuffle join, integer-only outputs."""
    lag = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    urgent = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.when(lag > 60, "late")
            .when(lag >= 0, "on_time")
            .otherwise("preshipped")
            .alias("ship_bucket")
        )
        .agg(
            F.sum(F.when(urgent, 1).otherwise(0)).alias("high_priority_count"),
            F.sum(F.when(urgent, 0).otherwise(1)).alias("low_priority_count"),
        )
    )


def q13_customer_distribution(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """TPC-H Q13 shape: LEFT OUTER join so zero-order customers are
    kept, per-customer order count, then the count-of-counts
    histogram.  Two shuffles (custkey, then tiny c_count agg)."""
    per_cust = (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
    )


def q14_promo_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q14 shape: promo revenue share over one month; part dim
    broadcasts, conditional agg keeps it a single pass."""
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit("1997-03-01"))
            & (F.col("l_shipdate") < F.lit("1997-04-01"))
        )
        .join(F.broadcast(part.select("p_partkey", "p_type")),
              F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            rnd(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                6,
            ).alias("promo_revenue_pct"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q15_top_supplier(supplier: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q15 shape: quarterly revenue per supplier, keep the
    max-revenue supplier(s).  The unbounded max window runs over the
    already-aggregated per-supplier rows (|suppliers| rows, trivially
    small next to the fact), so the single-partition exchange is
    safe at any corpus scale."""
    per_supp = (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-04-01"))
        )
        .groupBy("l_suppkey")
        .agg(
            rnd(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias(
                "total_revenue"
            )
        )
    )
    w = Window.partitionBy()
    return (
        per_supp.withColumn("max_rev", F.max("total_revenue").over(w))
        .where(F.col("total_revenue") == F.col("max_rev"))
        .join(F.broadcast(supplier), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_name").alias("supp_name"),
            "total_revenue",
        )
    )


def q16_part_supplier_counts(
    supplier: DataFrame, part: DataFrame, lineitem: DataFrame
) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part attribute
    triple, excluding one brand and suppliers with negative balances
    (the 'complaints' NOT IN as a broadcast anti-join)."""
    bad_supp = supplier.where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        lineitem.join(F.broadcast(bad_supp),
                      F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(
            F.broadcast(
                part.where(
                    (F.col("p_brand") != "Brand#1") & (F.col("p_size") <= 25)
                ).select("p_partkey", "p_brand", "p_type", "p_size")
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


def q19_disjunctive_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs predicate spanning both join sides.
    The part dim broadcasts; Catalyst keeps the disjunction as a
    post-join filter while still pushing the per-table conjuncts
    (quantity bound, size bound) into the scans."""
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = lineitem.join(
        F.broadcast(part.select("p_partkey", "p_brand", "p_size")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    disj = (
        (
            (F.col("p_brand") == "Brand#1")
            & (F.col("p_size").between(1, 15))
            & (F.col("l_quantity").between(1, 11))
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & (F.col("p_size").between(1, 25))
            & (F.col("l_quantity").between(10, 20))
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & (F.col("p_size").between(1, 35))
            & (F.col("l_quantity").between(20, 30))
        )
    )
    return joined.where(disj).agg(
        rnd(F.sum(rev), 4).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


def q22_idle_rich_customers(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """TPC-H Q22 shape: customers with above-average positive balance
    and no recent orders.  The scalar AVG subquery broadcasts as a
    one-row cross join; the no-recent-orders test is a left anti-join
    on the order keys (shuffle on custkey); the date predicate is
    pushed into the orders scan before the anti-join."""
    avg_bal = (
        customer.where(F.col("c_acctbal") > 0.0)
        .agg(F.avg("c_acctbal").alias("avg_bal"))
    )
    recent = orders.where(
        F.col("o_orderdate") >= F.lit("2000-01-01")
    ).select("o_custkey")
    return (
        customer.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy(F.col("c_nationkey").alias("cntry"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            rnd(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


def q2_min_cost_supplier(
    region: DataFrame,
    nation: DataFrame,
    supplier: DataFrame,
    part: DataFrame,
    lineitem: DataFrame,
) -> DataFrame:
    """TPC-H Q2 shape without a partsupp table: supply cost for a
    (part, supplier) pair is the MIN unit price the pair ever shipped
    at (an exact IEEE division under min -- no float-sum ordering
    hazard), suppliers restricted to one region, parts to one type +
    size floor; each part keeps only its min-cost regional offer
    (the correlated-MIN subquery joined back).

    The region->nation->supplier chain and the filtered part dim
    broadcast; the only big shuffle is the (partkey, suppkey) cost
    agg over the fact.  The post-filter offer set is tiny, so the
    min-cost join-back is broadcast too.
    """
    from ..constants import Q2_MIN_SIZE, Q2_PART_TYPE, Q2_REGION, Q2_TOP_N

    cost = lineitem.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("supplycost")
    )
    regional = (
        supplier.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(region.where(F.col("r_name") == Q2_REGION)),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    sized = part.where(
        (F.col("p_type") == Q2_PART_TYPE) & (F.col("p_size") >= Q2_MIN_SIZE)
    ).select("p_partkey", "p_name")
    offers = cost.join(
        F.broadcast(regional), F.col("l_suppkey") == F.col("s_suppkey")
    ).join(F.broadcast(sized), F.col("l_partkey") == F.col("p_partkey"))
    best = offers.groupBy(F.col("p_partkey").alias("bk")).agg(
        F.min("supplycost").alias("min_cost")
    )
    return (
        offers.join(
            F.broadcast(best),
            (F.col("p_partkey") == F.col("bk"))
            & (F.col("supplycost") == F.col("min_cost")),
        )
        .select(
            F.col("p_partkey").alias("partkey"),
            "p_name",
            F.col("s_suppkey").alias("suppkey"),
            "s_name",
            "n_name",
            rnd(F.col("s_acctbal"), 2).alias("acctbal"),
            rnd(F.col("supplycost"), 6).alias("supplycost"),
        )
        .orderBy(F.col("acctbal").desc(), F.col("suppkey").asc(), F.col("partkey").asc())
        .limit(Q2_TOP_N)
    )


def q9_product_profit(
    nation: DataFrame,
    supplier: DataFrame,
    part: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
) -> DataFrame:
    """TPC-H Q9 shape (product-type profit) without a partsupp table:
    supply cost for a (part, supplier) pair is the MIN unit price the
    pair ever shipped at (the Q2 derived-partsupp idiom -- min over an
    exact IEEE division, no float-sum hazard); profit per line is
    revenue minus supplycost x quantity, rolled up by SUPPLIER nation
    and order year for parts whose name contains Q9_NAME_TOKEN.  This
    completes the repo's TPC-H query-shape coverage (all 22 analogs).

    Scale shape: the name-filtered part dim broadcasts into BOTH the
    cost aggregation and the fact side, so only matching lines enter
    either shuffle; the cost agg shuffles on (partkey, suppkey) and
    its join back to the filtered fact reuses that same key; the
    orders join is the one orderkey fact-fact shuffle (the bucketed-
    join candidate); supplier->nation broadcasts; the final rollup is
    |nations| x |years| -- dim-sized.
    """
    from ..constants import Q9_NAME_TOKEN

    flt = F.broadcast(
        part.where(F.col("p_name").contains(Q9_NAME_TOKEN)).select("p_partkey")
    )
    cost = (
        lineitem.join(flt, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(
            F.col("l_partkey").alias("c_partkey"),
            F.col("l_suppkey").alias("c_suppkey"),
        )
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("supplycost"))
    )
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.col(
        "supplycost"
    ) * F.col("l_quantity")
    return (
        lineitem.join(flt, F.col("l_partkey") == F.col("p_partkey"))
        .join(
            cost,
            (F.col("l_partkey") == F.col("c_partkey"))
            & (F.col("l_suppkey") == F.col("c_suppkey")),
        )
        .join(
            orders.select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(rnd(F.sum(amount), 2).alias("profit"))
    )


def q11_important_stock(
    region: DataFrame, nation: DataFrame, supplier: DataFrame, lineitem: DataFrame
) -> DataFrame:
    """TPC-H Q11 shape: per-part shipped value across one region's
    suppliers, kept when above FRACTION of the regional grand total
    (the scalar-SUM HAVING subquery).

    The grand total re-aggregates the per-part sums (one pass over
    the fact, then a tiny second agg) and broadcasts as a one-row
    cross join.  Both compare sides are rounded to 4 places so the
    engines' float-sum orderings can't flip a part at the threshold.
    """
    from ..constants import Q11_FRACTION, Q11_REGION

    regional = (
        supplier.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            F.broadcast(region.where(F.col("r_name") == Q11_REGION)),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("s_suppkey")
    )
    per_part = (
        lineitem.join(F.broadcast(regional), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum("l_extendedprice").alias("value"))
    )
    total = per_part.agg(F.sum("value").alias("total"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(rnd(F.col("value"), 4) > rnd(F.lit(Q11_FRACTION) * F.col("total"), 4))
        .select(F.col("l_partkey").alias("partkey"), rnd(F.col("value"), 4).alias("value"))
    )


def q20_excess_suppliers(
    nation: DataFrame, supplier: DataFrame, part: DataFrame, lineitem: DataFrame
) -> DataFrame:
    """TPC-H Q20 shape: suppliers holding "excess" inventory -- pairs
    that shipped more than half their lifetime volume of a prefix-
    matched part inside one year.  The correlated half-sum compare is
    one grouped agg with a conditional sum; quantities are integer-
    valued so `2*qty_year > qty_total` is exact in both engines.

    The prefix-filtered part dim broadcasts ahead of the agg (column-
    pruned semi-join), then the qualifying pair set collapses to a
    per-supplier count joined to the broadcast supplier/nation dims.
    """
    from ..constants import Q20_NAME_PREFIX, Q20_YEAR_END, Q20_YEAR_START

    in_year = (F.col("l_shipdate") >= F.lit(Q20_YEAR_START)) & (
        F.col("l_shipdate") < F.lit(Q20_YEAR_END)
    )
    pairs = (
        lineitem.join(
            F.broadcast(
                part.where(F.col("p_name").startswith(Q20_NAME_PREFIX)).select(
                    "p_partkey"
                )
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum("l_quantity").alias("qty_total"),
            F.sum(F.when(in_year, F.col("l_quantity")).otherwise(0.0)).alias("qty_year"),
        )
        .where(F.col("qty_year") * 2 > F.col("qty_total"))
    )
    dims = supplier.join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_name", "n_name")
    return (
        pairs.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("n_excess_parts"))
        .join(F.broadcast(dims), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.col("l_suppkey").alias("suppkey"), "s_name", "n_name", "n_excess_parts"
        )
    )


def q21_waiting_suppliers(
    nation: DataFrame, supplier: DataFrame, orders: DataFrame, lineitem: DataFrame
) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late shipper in a
    finished multi-supplier order.  The classic EXISTS + NOT-EXISTS
    double self-join is rewritten as one per-order aggregate --
    distinct suppliers and distinct late suppliers per order -- so
    the fact is shuffled once on orderkey (the join on l_orderkey
    already co-partitions the groupBy) instead of three times.

    "Late" means shipping > Q21_LATE_DAYS after the order date (the
    q12 bucket boundary; the testdata has no commit/receipt dates).
    """
    from ..constants import Q21_LATE_DAYS, Q21_TOP_N

    lines = (
        lineitem.join(
            orders.where(F.col("o_orderstatus") == "F"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            "l_orderkey",
            "l_suppkey",
            (
                F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) > Q21_LATE_DAYS
            ).alias("is_late"),
        )
    )
    per_order = lines.groupBy(F.col("l_orderkey").alias("ok")).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias(
            "n_late_supp"
        ),
    )
    blamed = (
        lines.where(F.col("is_late"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
        .join(
            per_order.where((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)),
            F.col("l_orderkey") == F.col("ok"),
        )
        .groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
    dims = supplier.join(
        F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_name", "n_name")
    return (
        blamed.join(F.broadcast(dims), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(F.col("l_suppkey").alias("suppkey"), "s_name", "n_name", "numwait")
        .orderBy(F.col("numwait").desc(), F.col("suppkey").asc())
        .limit(Q21_TOP_N)
    )


def brand_price_trend(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Monthly average unit price per brand with a trailing 3-month
    moving average -- the sliding-frame window shape (ROWS BETWEEN)
    the TPC-H set doesn't otherwise exercise.

    Scale shape: the fact aggregates to (brand, month) first -- one
    shuffle with map-side partial agg; the moving-average window runs
    over the |brands| x |months| aggregate (dim-sized), partitioned
    by brand, never over fact rows.  The monthly average is rounded
    BEFORE the frame average so the 3-value frame sums identical
    inputs in both engines.
    """
    from pyspark.sql import Window

    from ..functions.columns import round_half_up as rnd

    monthly = (
        lineitem.join(
            F.broadcast(part.select("p_partkey", "p_brand")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.date_trunc("month", F.col("l_shipdate")).alias("ship_month"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            rnd(F.avg("l_extendedprice"), 4).alias("avg_price"),
        )
    )
    w = (
        Window.partitionBy("brand")
        .orderBy("ship_month")
        .rowsBetween(-2, Window.currentRow)
    )
    return monthly.select(
        "brand",
        "ship_month",
        "n_lines",
        "avg_price",
        rnd(F.avg("avg_price").over(w), 4).alias("avg_price_3mo"),
    )


def supplier_lead_time(
    lineitem: DataFrame, orders: DataFrame, supplier: DataFrame, nation: DataFrame
) -> DataFrame:
    """Order-to-ship lead time per supplier nation: day gaps between
    order date and each line's ship date -- the fulfillment-latency
    rollup (date-arithmetic shape over the fact-fact join).

    Scale shape: the one wide shuffle is lineitem join orders on
    orderkey (both facts, co-keyed -- the bucketed-table candidate);
    supplier and nation broadcast.  Day gaps are exact integers, so
    the average is one division over exact sums -- cross-engine
    deterministic.
    """
    lead = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    return (
        lineitem.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(
            orders.select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            rnd(F.avg(lead), 4).alias("avg_lead_days"),
            F.min(lead).cast("int").alias("min_lead_days"),
            F.max(lead).cast("int").alias("max_lead_days"),
        )
    )


def market_basket_pairs(lineitem: DataFrame, n_top: int = 20) -> DataFrame:
    """Market-basket affinity: the top part pairs co-occurring in the
    same order, with support and lift -- the association-rule shape
    (bought-together) over the order fact.

    Scale shape: baskets reduce to distinct (order, part) map-side;
    pair generation collects each order's part list in ONE orderkey
    shuffle and explodes pairs map-side (the _band_candidate_pairs
    idiom, r12 -- the former a x b self-join shuffled the item frame
    TWICE and sort-merge-joined it against itself for the identical
    pair set).  Expansion stays bounded by ORDER WIDTH (lines per
    order -- single digits), never corpus size, so candidate
    generation is linear in orders.  Support and lift stay in integer
    arithmetic until one double division -- bit-identical
    cross-engine.  Top-N compiles to TakeOrderedAndProject
    (per-partition partial top-N, no full sort).
    """
    items = lineitem.select("l_orderkey", "l_partkey").distinct()
    # scalar order count as a broadcast 1-row frame (the Q22/unigram
    # idiom) -- no driver-side action, plan stays lazy
    n_orders_df = items.select("l_orderkey").distinct().agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    part_counts = items.groupBy(F.col("l_partkey").alias("part")).agg(
        F.count(F.lit(1)).alias("n_part")
    )
    # one orderkey shuffle; pairs explode map-side from each order's
    # part list (each pair emitted once: part_a < part_b)
    baskets = items.groupBy("l_orderkey").agg(
        F.collect_list("l_partkey").alias("ps")
    )
    pair_counts = (
        baskets.select(F.explode("ps").alias("part_a"), "ps")
        .select(
            "part_a",
            F.explode(F.filter("ps", lambda v: v > F.col("part_a"))).alias(
                "part_b"
            ),
        )
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    na = part_counts.select(F.col("part").alias("part_a"), F.col("n_part").alias("n_a"))
    nb = part_counts.select(F.col("part").alias("part_b"), F.col("n_part").alias("n_b"))
    support = F.col("n_both") / F.col("n_orders")
    lift = (F.col("n_both") * F.col("n_orders")) / (F.col("n_a") * F.col("n_b"))
    return (
        pair_counts.join(na, "part_a")
        .join(nb, "part_b")
        .crossJoin(F.broadcast(n_orders_df))
        .select(
            "part_a",
            "part_b",
            "n_both",
            rnd(support, 6).alias("support"),
            rnd(lift, 6).alias("lift"),
        )
        .orderBy(F.col("n_both").desc(), F.col("part_a").asc(), F.col("part_b").asc())
        .limit(n_top)
    )


def supplier_concentration(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """Supply-chain concentration per part type: the Herfindahl index
    (sum of squared supplier shares of shipped quantity) plus supplier
    count -- the single-number fragility screen per category.

    Determinism: l_quantity is integer-valued, so per-supplier and
    per-type sums are EXACT doubles regardless of accumulation order;
    shares are one division each, and only the final sum of ~|suppliers|
    squared shares carries last-ulp order noise -- absorbed by
    rounding.  Scale shape: one (type, supplier) agg with map-side
    partial agg, then a |types|-row broadcast join back.
    """
    typed = lineitem.join(
        F.broadcast(part.select("p_partkey", "p_type")),
        F.col("l_partkey") == F.col("p_partkey"),
    )
    per_supp = typed.groupBy(
        F.col("p_type").alias("part_type"), F.col("l_suppkey").alias("supp")
    ).agg(F.sum("l_quantity").alias("qty_s"))
    totals = per_supp.groupBy("part_type").agg(
        F.sum("qty_s").alias("qty_total"),
        F.count(F.lit(1)).alias("n_suppliers"),
    )
    share = F.col("qty_s") / F.col("qty_total")
    return (
        per_supp.join(F.broadcast(totals), "part_type")
        .groupBy("part_type")
        .agg(
            F.max("n_suppliers").alias("n_suppliers"),
            rnd(F.sum(share * share), 6).alias("hhi"),
        )
    )


def referential_integrity_audit(
    events: DataFrame,
    customer: DataFrame,
    lineitem: DataFrame,
    orders: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
) -> DataFrame:
    """Foreign-key orphan audit across the star schema: for each fact
    -> dim edge, total fact rows and how many reference a missing dim
    key -- the data-quality gate a warehouse load runs before
    publishing.  (Engine completeness: profiling/validation surface.)

    Scale shape: each check is a LEFT ANTI join with the DIM side as
    the (broadcastable) build side, counted map-side -- no wide rows
    move.  Results union into one tiny report frame.
    """
    def check(name, fact, fk, dim, pk):
        total = fact.select(F.count(F.lit(1)).alias("n_rows"))
        orphans = (
            fact.join(dim.select(pk).distinct(), fact[fk] == F.col(pk), "left_anti")
            .select(F.count(F.lit(1)).alias("n_orphans"))
        )
        # empty fact -> 0/0 would raise under ANSI; an empty table is
        # trivially consistent, rate 0
        rate = F.when(
            F.col("n_rows") > 0, rnd(F.col("n_orphans") / F.col("n_rows"), 6)
        ).otherwise(F.lit(0.0))
        return (
            total.crossJoin(orphans)
            .select(
                F.lit(name).alias("fk_edge"),
                F.col("n_rows"),
                F.col("n_orphans"),
                rate.alias("orphan_rate"),
            )
        )

    checks = [
        check("events.user_id->customer", events, "user_id", customer, "c_custkey"),
        check("lineitem.l_orderkey->orders", lineitem, "l_orderkey", orders, "o_orderkey"),
        check("lineitem.l_partkey->part", lineitem, "l_partkey", part, "p_partkey"),
        check("lineitem.l_suppkey->supplier", lineitem, "l_suppkey", supplier, "s_suppkey"),
        check("orders.o_custkey->customer", orders, "o_custkey", customer, "c_custkey"),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out


def repeat_buyers_by_nation(
    orders: DataFrame, customer: DataFrame, nation: DataFrame
) -> DataFrame:
    """Customers active in BOTH 1997 and 1998 (INTERSECT set
    semantics -- the retention complement of Q22's idle-customer
    anti-join), rolled up per nation.

    Scale shape: each year's cohort reduces to distinct custkeys
    map-side before the intersect (which shuffles narrow keys only);
    dims broadcast; output is |nations| rows.
    """
    def year_cohort(y):
        return (
            orders.where(
                (F.col("o_orderdate") >= F.lit(f"{y}-01-01"))
                & (F.col("o_orderdate") < F.lit(f"{y + 1}-01-01"))
            )
            .select("o_custkey")
            .distinct()
        )

    both = year_cohort(1997).intersect(year_cohort(1998))
    return (
        both.join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count(F.lit(1)).alias("n_repeat_buyers"))
    )


def customer_spend_deciles(
    orders: DataFrame, customer: DataFrame, nation: DataFrame
) -> DataFrame:
    """Within-nation customer spend deciles: percent_rank over each
    customer's lifetime order total, bucketed into deciles with
    per-bucket spend stats -- the relative-standing segmentation
    (percent_rank's exact (rank-1)/(n-1) integer ratio makes the
    decile cut deterministic cross-engine, unlike value-based
    quantile cuts).  The ordering key is the per-customer total
    ROUNDED to cents: o_totalprice is a parquet double, so the raw
    float sum depends on accumulation order (partition-partial agg
    here vs sequential in an oracle); rounding to 2dp before the
    window makes the rank key engine-exact.

    Scale shape: the per-customer total is one shuffle with map-side
    partial agg; the rank window runs over the per-customer AGGREGATE
    partitioned by nation (|customers| rows, spread across nations),
    never over the order fact; the decile rollup is a dim-sized agg.
    At extreme |customers| (10^9+) the largest per-nation window task
    is |customers|/|nations| rows; if that ever dominates a profile,
    swap in the distributed bucket-offset rank machinery from
    voter_value_quartiles (voting.py) -- same decile semantics, no
    single-partition window.
    """
    from pyspark.sql import Window

    spend = (
        orders.groupBy("o_custkey")
        .agg(rnd(F.sum("o_totalprice"), 2).alias("total_spend"))
        .join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
    )
    w = Window.partitionBy("n_name").orderBy(
        F.col("total_spend").asc(), F.col("o_custkey").asc()
    )
    pr = F.percent_rank().over(w)
    decile = F.least(F.lit(9), F.floor(pr * 10)).cast("int")
    return (
        spend.select(
            F.col("n_name").alias("nation"), "total_spend", decile.alias("decile")
        )
        .groupBy("nation", "decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            rnd(F.min("total_spend"), 2).alias("min_spend"),
            rnd(F.max("total_spend"), 2).alias("max_spend"),
        )
    )


def order_fill_rate(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Order fill audit per priority: share of orders whose EVERY
    line shipped within 30 days of the order date -- the universal
    quantifier (bool_and / ALL) aggregation shape, which EXISTS
    semi-joins can't express without double negation.

    Scale shape: the fact-fact join shuffles once on orderkey (the
    bucketed-join candidate); per-order bool_and collapses map-side
    like any partial agg; the priority rollup is dim-sized.  The day
    comparison is exact integer arithmetic.
    """
    on_time = F.datediff(F.col("l_shipdate"), F.col("o_orderdate")) <= 30
    per_order = (
        lineitem.select("l_orderkey", "l_shipdate")
        .join(
            orders.select("o_orderkey", "o_orderdate", "o_orderpriority"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(F.bool_and(on_time).alias("fully_on_time"))
    )
    filled = F.sum(F.col("fully_on_time").cast("int"))
    return per_order.groupBy(F.col("o_orderpriority").alias("order_priority")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        filled.cast("bigint").alias("n_fully_on_time"),
        rnd(filled / F.count(F.lit(1)), 6).alias("fill_rate"),
    )
