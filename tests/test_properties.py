"""Property-based tests (SURVEY.md §5.2 item 4) — hypothesis generates
small adversarial datasets; Spark must agree with an independent Python
model. Examples are kept few: each example is a Spark round-trip.
"""

from __future__ import annotations

import itertools
from collections import Counter

import pandas as pd
from hypothesis import HealthCheck, given, settings, strategies as st

from pyspark.sql import functions as F

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_items = st.lists(
    st.tuples(
        st.sampled_from(["pens", "binder", "laptop", "notepad"]),
        st.integers(1, 9),                      # quantity
        st.integers(1, 99999),                  # price in cents
    ),
    min_size=0, max_size=5,
)
_sales = st.lists(_items, min_size=1, max_size=6)


@settings(**_SETTINGS)
@given(_sales)
def test_explode_regroup_roundtrip(spark, sales):
    """G4 invariant: explode(items) → groupBy(sale).sum == per-row array
    fold — document totals survive the unwind/regroup round trip, in
    decimal (exact), including empty item arrays (inner-explode drops
    them; the fold must yield 0 for them, so compare only non-empty)."""
    rows = [
        (i, [{"name": n, "quantity": q, "price": c} for (n, q, c) in its])
        for i, its in enumerate(sales)
    ]
    df = spark.createDataFrame(
        rows,
        "sale_id int, items array<struct<name:string,quantity:int,price:int>>",
    )
    exploded = (
        df.select("sale_id", F.explode("items").alias("it"))
        .groupBy("sale_id")
        .agg(F.sum(F.expr("it.quantity * it.price")).alias("total"))
    )
    got = {r.sale_id: r.total for r in exploded.collect()}
    want = {
        i: sum(q * c for (_, q, c) in its)
        for i, its in enumerate(sales) if its
    }
    assert got == want


@settings(**_SETTINGS)
@given(
    st.lists(
        st.tuples(st.sampled_from("ab"), st.integers(0, 30), st.integers(0, 100)),
        min_size=1, max_size=30, unique_by=lambda t: (t[0], t[1]),
    )
)
def test_lag_never_leaks_across_partitions(spark, rows):
    """W1 invariant: lag over Window.partitionBy(product) must equal a
    per-product pandas shift — values never leak between products."""
    from pyspark.sql.window import Window

    df = spark.createDataFrame(rows, "product string, day int, qty int")
    w = Window.partitionBy("product").orderBy("day")
    got = (
        df.withColumn("lag_1", F.lag("qty").over(w))
        .toPandas().sort_values(["product", "day"]).reset_index(drop=True)
    )
    pdf = pd.DataFrame(rows, columns=["product", "day", "qty"])
    pdf = pdf.sort_values(["product", "day"]).reset_index(drop=True)
    want = pdf.groupby("product")["qty"].shift(1)
    assert [
        None if pd.isna(x) else int(x) for x in want
    ] == [None if pd.isna(x) else int(x) for x in got["lag_1"]]


@settings(**_SETTINGS)
@given(_sales)
def test_pair_mining_matches_itertools(spark, sales):
    """A8 invariant: the row-local higher-order-function pair expansion
    equals itertools.combinations over the sorted, NON-deduplicated name
    list (multiplicity + self-pairs, the reference's exact semantics)."""
    from project2_bigdata_spark.operators.pairs import _PAIRS_EXPR

    rows = [(i, sorted(n for (n, _, _) in its)) for i, its in enumerate(sales)]
    df = spark.createDataFrame(rows, "sale_id int, item_names array<string>")
    got = Counter(
        (r.pair.product_1, r.pair.product_2)
        for r in df.select(F.explode(F.expr(_PAIRS_EXPR)).alias("pair")).collect()
    )
    want = Counter(
        pair for _, names in rows for pair in itertools.combinations(names, 2)
    )
    assert got == want
