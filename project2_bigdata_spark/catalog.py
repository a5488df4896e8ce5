"""Table catalog: load the driver's parquet tables and derived sales views.

Mapping (FIXTURES.md §B): sale ticket ≈ ``orders`` row; items array
element ≈ ``lineitem`` row (l_orderkey→orders, l_partkey→part for the
product name); ``$unwind items`` ≈ inner join orders⋈lineitem; customer
struct ≈ ``customer`` via o_custkey; storeLocation ≈ ``nation.n_name``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .session import tune

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Lazy parquet scan of one table. Column pruning + predicate pushdown
    happen automatically because every downstream op is declarative."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; have {TABLES}")
    tune(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # ts is parquet TIMESTAMP(NANOS) — unreadable by Spark natively;
        # with nanosAsLong it arrives as epoch-nanos, convert to micros
        # timestamp (UTC session ⇒ wall clock matches the NTZ source).
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        if isinstance(df.schema["ts"].dataType, T.LongType):
            # integer div: epoch-nanos > 2^53 would lose precision in double
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


class Catalog:
    """Convenience handle: ``cat.lineitem`` → DataFrame (fresh lazy scan)."""

    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = spark
        self.sf_dir = sf_dir
        tune(spark)

    def __getattr__(self, name: str) -> DataFrame:
        if name in TABLES:
            return table(self.spark, self.sf_dir, name)
        raise AttributeError(name)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """SQL view layer (SURVEY.md §4.2): temp views for every base table
    plus the derived sales relations, so the engine's whole surface is
    reachable from ``spark.sql``. Views are lazy plans — registering
    them costs nothing until queried, and Catalyst optimizes straight
    through them (a filter on ``v_sales_daily`` prunes the underlying
    lineitem scan exactly as the DataFrame form does)."""
    from .operators.salesviews import sale_lines, sales_daily, tickets

    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
    sale_lines(spark, sf_dir).createOrReplaceTempView("v_sale_lines")
    sales_daily(spark, sf_dir).createOrReplaceTempView("v_sales_daily")
    tickets(spark, sf_dir).createOrReplaceTempView("v_tickets")
