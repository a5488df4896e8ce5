"""Derived "sales" relations over the TPC-H-ish testdata.

These rebuild the reference's four derived relations (SURVEY.md §1.2)
from the flat star schema (FIXTURES.md §B):

- ``sale_lines``  — the post-``$unwind`` line-item view (one row per item
  of a sale): orders ⋈ lineitem ⋈ part.
- ``sales_daily`` — date × product grain (ref `crear_df`, dashboard.py:54-106).
- ``tickets``     — one row per sale with customer/store attributes and a
  re-assembled ``items`` array (ref `dfc`, dashboard.py:459-497).
- ``sales_nested``— the document shape itself (items as array<struct>),
  used by the array-operator family (SURVEY.md §2.3).

Scale notes: ``part`` (and ``customer``/``nation``) are dimension tables —
explicitly broadcast so the fact-side join never shuffles lineitem by
partkey. The only unavoidable shuffle is lineitem⇄orders on orderkey
(both fact-sized); at cluster scale that pair should be co-bucketed by
orderkey, which removes it entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from ..functions.datetime_utils import sale_date
from ..functions.money import dsum


def sale_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per line item with sale + product context.

    Columns: sale_id, sale_ts, custkey, status, priority, product, brand,
    quantity (double), revenue (= l_extendedprice), price (unit price),
    linenumber.
    """
    lineitem = table(spark, sf_dir, "lineitem")
    orders = table(spark, sf_dir, "orders")
    part = table(spark, sf_dir, "part")
    return (
        lineitem
        .join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .join(orders, lineitem.l_orderkey == orders.o_orderkey)
        .select(
            F.col("o_orderkey").alias("sale_id"),
            F.col("o_orderdate").alias("sale_ts"),
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("priority"),
            F.col("p_name").alias("product"),
            F.col("p_brand").alias("brand"),
            F.col("l_quantity").alias("quantity"),
            F.col("l_extendedprice").alias("revenue"),
            (F.col("l_extendedprice") / F.col("l_quantity")).alias("price"),
            F.col("l_linenumber").alias("linenumber"),
        )
    )


def sales_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date × product → total_quantity, total_revenue (ref G1, the core query).

    Groups on the native DATE and formats the 'yyyy-MM-dd' string AFTER
    aggregation: the hash-agg compares 4-byte date keys instead of
    strings and the formatter runs once per group, not once per line —
    same rows, measurably cheaper (OPTIMIZATION_r12.md §date-keys; the
    UTC session makes cast-then-format identical to format-then-group).
    """
    return (
        sale_lines(spark, sf_dir)
        .groupBy(F.col("sale_ts").cast("date").alias("d"), F.col("product"))
        .agg(dsum("quantity", "total_quantity"), dsum("revenue", "total_revenue"))
        .select(
            sale_date("d").alias("date"), "product",
            "total_quantity", "total_revenue",
        )
    )


def tickets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per sale: totals + customer/store attributes + items array.

    Mirrors ref `dfc` (dashboard.py:459-497) but WITHOUT the unwind→regroup
    shuffle for the scalar fields: the order-level attributes come straight
    from ``orders``; only the item rollup aggregates lineitem. satisfaction
    is a deterministic 1..5 bucket of c_acctbal (FIXTURES.md §B).
    """
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    part = table(spark, sf_dir, "part")
    lineitem = table(spark, sf_dir, "lineitem")

    item_rollup = (
        lineitem
        .join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .groupBy("l_orderkey")
        .agg(
            dsum("l_extendedprice", "total_revenue"),
            F.count("*").alias("num_items"),
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("p_name").alias("name"),
                        F.col("l_extendedprice").alias("revenue"),
                        F.col("l_quantity").alias("quantity"),
                        F.col("l_linenumber").alias("linenumber"),
                    )
                )
            ).alias("items"),
        )
    )
    cust_dim = (
        customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .select(
            "c_custkey",
            F.col("c_name").alias("customer_email"),
            F.col("c_mktsegment").alias("customer_segment"),
            F.col("c_acctbal").alias("customer_acctbal"),
            ((F.floor(F.abs(F.col("c_acctbal"))).cast("bigint") % 5) + 1)
            .cast("int").alias("satisfaction"),
            F.col("n_name").alias("store"),
        )
    )
    return (
        orders
        .join(item_rollup, orders.o_orderkey == item_rollup.l_orderkey)
        .join(F.broadcast(cust_dim), orders.o_custkey == cust_dim.c_custkey)
        .select(
            F.col("o_orderkey").alias("sale_id"),
            F.col("o_orderdate").alias("sale_ts"),
            "customer_email", "customer_segment", "customer_acctbal",
            "satisfaction", "store",
            F.col("o_orderpriority").alias("purchase_method"),
            F.col("o_orderstatus").alias("status"),
            "total_revenue", "num_items", "items",
        )
    )


def sales_nested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference-native document shape: sale_id, sale_ts, items array
    of struct(name, revenue, quantity, linenumber). Input to explode/array
    operators (SURVEY.md §2.3) — rebuilt from flat tables, items sorted by
    (name, ...) for deterministic array order."""
    return tickets(spark, sf_dir).select("sale_id", "sale_ts", "items")
