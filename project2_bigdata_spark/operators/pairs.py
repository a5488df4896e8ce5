"""Market-basket pair mining (SURVEY.md §2.3 A8/A9).

Reference semantics (dashboard.py:205-218, EDA.ipynb:3349-3396): for each
sale, every 2-combination of the SORTED, NON-DEDUPLICATED item-name list
(so self-pairs like (notepad, notepad) occur and multiplicity counts);
"probability" = pair_count / total_sales, which can exceed 1 by design.

Spark-first design: the reference materializes every sale client-side and
loops with itertools.combinations. Here the combinations are generated
INSIDE each row with higher-order array functions (transform + slice +
flatten) — no self-join, no extra shuffle; the only shuffle is the final
groupBy(product_1, product_2), whose cardinality is bounded by
|products|², not by data size. This is the plan that survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import table
from .salesviews import sales_nested

# All (i, j>i) pairs of the sorted name array, generated row-local.
_PAIRS_EXPR = """
flatten(
  transform(item_names, (x, i) ->
    transform(slice(item_names, i + 2, size(item_names)), y ->
      struct(x AS product_1, y AS product_2))))
"""


def pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """product_1 × product_2 → pair_count, probability (ref semantics)."""
    nested = sales_nested(spark, sf_dir)
    total = table(spark, sf_dir, "orders").agg(
        F.count("*").cast("double").alias("_total_sales")
    )
    pairs = (
        nested
        # items are sorted by (name, ...) in sales_nested, so the name
        # array is non-decreasing → product_1 <= product_2 for every pair.
        .select(F.expr("transform(items, x -> x.name)").alias("item_names"))
        .select(F.explode(F.expr(_PAIRS_EXPR)).alias("pair"))
        .groupBy("pair.product_1", "pair.product_2")
        .agg(F.count("*").alias("pair_count"))
    )
    return (
        pairs.crossJoin(F.broadcast(total))
        .select(
            "product_1", "product_2", "pair_count",
            (F.col("pair_count") / F.col("_total_sales")).alias("probability"),
        )
    )


def top_pairs_per_product(spark: SparkSession, sf_dir: str, k: int = 10) -> DataFrame:
    """Top-K co-purchased products per product_1 (ref dashboard.py:440-441)
    with a deterministic tie-break (count desc, then product_2)."""
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("product_1")
        .orderBy(F.desc("pair_count"), F.asc("product_2"))
    )
    return (
        pair_counts(spark, sf_dir)
        .withColumn("rnk", F.row_number().over(w).cast("int"))
        .filter(F.col("rnk") <= k)
    )
