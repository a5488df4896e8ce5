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

# All (i, j>i) pairs of the sorted name array, generated row-local.
_PAIRS_EXPR = """
flatten(
  transform(item_names, (x, i) ->
    transform(slice(item_names, i + 2, size(item_names)), y ->
      struct(x AS product_1, y AS product_2))))
"""


def pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """product_1 × product_2 → pair_count, probability (ref semantics).

    Builds the per-sale sorted name array directly from
    lineitem ⋈ broadcast(part) — NOT via the full ``tickets`` view, whose
    orders/customer joins contribute nothing to pair counts (measured 2×
    on the bench). One shuffle total (groupBy orderkey); the final pair
    aggregation is bounded by |products|², independent of data size.
    """
    lineitem = table(spark, sf_dir, "lineitem")
    part = table(spark, sf_dir, "part").select("p_partkey", "p_name")
    total = table(spark, sf_dir, "orders").agg(
        F.count("*").cast("double").alias("_total_sales")
    )
    pairs = (
        lineitem
        .join(F.broadcast(part), lineitem.l_partkey == part.p_partkey)
        .groupBy("l_orderkey")
        # sorted array → non-decreasing names → product_1 <= product_2
        # for every generated pair (matches the reference's sorted() call,
        # dashboard.py:209).
        .agg(F.array_sort(F.collect_list("p_name")).alias("item_names"))
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
