"""Bucketing: the shuffle-removal strategy the salesviews docstring
promises for the orders⇄lineitem fact-fact join at cluster scale,
demonstrated and asserted on the local catalog.

Both facts are written bucketed by the join key; the join plan must then
contain NO Exchange on either side — the sort-merge join reads
co-located buckets directly. At 100 TB this is the difference between
re-shuffling two fact tables per query and never shuffling them at all.
"""

from __future__ import annotations

import shutil

import pytest

from pyspark.sql import functions as F

from project2_bigdata_spark.catalog import table

N_BUCKETS = 8


@pytest.fixture()
def bucketed_tables(spark, sf_dir):
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    (table(spark, sf_dir, "orders")
     .write.bucketBy(N_BUCKETS, "o_orderkey").sortBy("o_orderkey")
     .mode("overwrite").saveAsTable("b_orders"))
    (table(spark, sf_dir, "lineitem")
     .write.bucketBy(N_BUCKETS, "l_orderkey").sortBy("l_orderkey")
     .mode("overwrite").saveAsTable("b_lineitem"))
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    shutil.rmtree("spark-warehouse", ignore_errors=True)


def test_bucketed_join_has_no_shuffle(spark, sf_dir, bucketed_tables):
    li = spark.table("b_lineitem")
    o = spark.table("b_orders")
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey")
        .agg(F.count("*").alias("n_items"))
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning(l_orderkey" not in plan
    assert "Exchange hashpartitioning(o_orderkey" not in plan
    # and the result is still right
    n = joined.count()
    assert n == table(spark, sf_dir, "orders").join(
        table(spark, sf_dir, "lineitem"),
        F.col("o_orderkey") == F.col("l_orderkey"),
        "left_semi",
    ).count()
