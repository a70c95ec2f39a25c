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
