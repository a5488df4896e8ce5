"""Parity tests for operators/rank.py (scalable global ranking).

The two-phase rank must be bit-identical to the naive single-partition
window on any total order, including the NTILE fat/thin bucket boundary
and the N < n degenerate case.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from project2_bigdata_spark.operators.rank import global_ntile, global_row_number


def _frame(spark, n_rows: int):
    # Values with heavy ties; id is the unique tie-break. Spread over
    # several input partitions so the range shuffle actually moves rows.
    return (
        spark.range(1, n_rows + 1, numPartitions=7)
        .select(
            F.col("id").cast("bigint").alias("id"),
            (F.col("id") % 10).cast("bigint").alias("v"),
        )
    )


@pytest.mark.parametrize("n_rows", [103, 16])
def test_global_row_number_matches_window(spark, n_rows):
    df = _frame(spark, n_rows)
    order = [F.col("v").desc(), F.col("id").asc()]
    got = {
        (r["id"], r["rn"])
        for r in global_row_number(df, order, num_partitions=5).collect()
    }
    want = {
        (r["id"], r["rn"])
        for r in df.withColumn(
            "rn", F.row_number().over(Window.orderBy(*order)).cast("bigint")
        ).collect()
    }
    assert got == want


@pytest.mark.parametrize(
    ("n_rows", "n"),
    [
        (103, 4),   # fat/thin boundary: 103 = 4*25 + 3
        (100, 4),   # exact division
        (103, 7),
        (3, 5),     # N < n: bucket i for row i
        (1, 4),
    ],
)
def test_global_ntile_matches_window(spark, n_rows, n):
    df = _frame(spark, n_rows)
    order = [F.col("v").asc(), F.col("id").asc()]
    got = {
        (r["id"], r["bucket"])
        for r in global_ntile(df, order, n, num_partitions=5).collect()
    }
    want = {
        (r["id"], r["bucket"])
        for r in df.withColumn(
            "bucket", F.ntile(n).over(Window.orderBy(*order))
        ).collect()
    }
    assert got == want


def test_rfm_scores_under_reliable_checkpoint(spark, sf_dir, tmp_path,
                                              monkeypatch):
    """rfm_scores (three chained global_ntile calls, each with a
    lineage-truncating materialization) must stay oracle-exact when
    truncate_lineage takes the reliable checkpoint() path — the
    configuration a real cluster runs with."""
    monkeypatch.setenv("SPARK_GRAFT_CHECKPOINT_DIR", str(tmp_path / "ck"))
    from project2_bigdata_spark.plans import REGISTRY

    from .oracle_harness import compare

    compare(spark, REGISTRY["rfm_scores"], sf_dir)


def test_global_row_number_uses_range_partitioning(spark):
    """The data-bearing shuffle must be a range exchange, not a collapse
    to one partition — that is the whole point of the operator.
    truncate=False keeps the lineage visible for the assertion (the
    production path materializes it away — covered by the next test)."""
    df = _frame(spark, 103)
    plan = (
        global_row_number(df, [F.col("v").asc(), F.col("id").asc()],
                          truncate=False)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "rangepartitioning(" in plan


def test_chained_calls_do_not_blow_up_the_plan(spark):
    """Chained rankings must not embed the upstream plan exponentially:
    before lineage truncation, three chained ntiles planned 4^3 copies
    of the base relation (observed as 128 scans in rfm_scores)."""
    from project2_bigdata_spark.operators.rank import global_ntile

    df = _frame(spark, 103)
    d = global_ntile(df, [F.col("v").asc(), F.col("id").asc()], 4, out="a")
    d = global_ntile(d, [F.col("v").desc(), F.col("id").asc()], 4, out="b")
    d = global_ntile(d, [F.col("id").desc()], 4, out="c")
    plan = d._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") <= 4
    assert d.count() == 103


def test_approx_percentile_bounds_documented_equidepth_swap(spark, sf_dir):
    """Pins the documented 100 TB swap (functions_surface.py
    quantity_percentiles doc; VERDICT r4 item 7): replacing the exact
    `percentile` / global_ntile equi-depth thresholds with
    `approx_percentile(col, q, accuracy)` must honor Spark's contract —
    the returned value's RANK is within n/accuracy of q·n. Verified
    against the exact rank at accuracy=10000 on the same per-customer
    monetary relation rfm_scores buckets, for every quartile boundary.
    The approximate form is a plain aggregate (KLL-style sketch, one
    partial/final pair, mergeable across partitions) — exactly why it
    is the fact-scale drop-in where a full sort would shuffle
    everything."""
    from pyspark.sql import functions as F

    monetary = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
             .cast("double").alias("m"))
    )
    acc = 10_000
    qs = [0.25, 0.5, 0.75, 0.9]
    row = monetary.agg(
        F.count("*").alias("n"),
        *[F.expr(f"approx_percentile(m, {q}, {acc})").alias(f"a_{i}")
          for i, q in enumerate(qs)],
    ).first()
    n = row["n"]
    assert n > 100  # the bound below is vacuous on tiny inputs
    tol = n / acc + 1
    for i, q in enumerate(qs):
        v = row[f"a_{i}"]
        rank_lo, rank_hi = monetary.agg(
            F.sum((F.col("m") < v).cast("bigint")),
            F.sum((F.col("m") <= v).cast("bigint")),
        ).first()
        assert rank_lo <= q * n + tol, (q, v, rank_lo, n)
        assert rank_hi >= q * n - tol, (q, v, rank_hi, n)
    # the sketch aggregate must not introduce a shuffle beyond the
    # groupBy: no window, no sort in the plan
    plan = (monetary.agg(F.expr(f"approx_percentile(m, 0.5, {acc})"))
            ._jdf.queryExecution().executedPlan().toString())
    assert "Window" not in plan and "CartesianProduct" not in plan, plan
