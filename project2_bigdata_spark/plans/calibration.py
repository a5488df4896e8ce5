"""Distribution-calibration operators: isotonic (PAVA) fit and
quantile normalization.

Two ML-prep operators the reference's pandas layer would reach for
sklearn to get (``IsotonicRegression``, the bioinformatics-style
``quantile_transform``), re-expressed as pure relational plans:

* **Isotonic regression** — the monotone least-squares projection of
  per-rung means, via the minimax characterization
  ``fit(k) = max_{i<=k} min_{j>=k} mean(i..j)`` (Barlow et al. 1972;
  equivalent to pool-adjacent-violators). The rung relation is
  aggregate-bounded (|distinct l_quantity| <= 50), so the O(n^2) pair
  relation is ~1.3k rows at ANY corpus size — the only data-sized work
  is the one groupBy scan.
* **Quantile normalization** — map every store's daily-revenue
  distribution onto the cross-store reference distribution (mean of
  order statistics at each rank), the standard feature-calibration
  transform for heterogeneous sources.

Cross-engine exactness: block means are frozen to integer micro-units
via the shared C-style floor-division identity (property-tested in
tests/test_properties.py) BEFORE any min/max, so both engines compare
identical BIGINTs and the fit is bit-deterministic under any row
order. Numerators stay under 2^53 through the K=100 stress scale; at
a true 100 TB swap the shared ``/``+CAST spelling for Spark ``div`` /
DuckDB ``//`` (exact integer division) — a spelling change, not a
plan change.

Reference parity: the reference has no isotonic/QN operator (its
dashboard recomputes pandas aggregates per page, dashboard.py:459-601);
these extend the engine along the large-scale-training-pipeline axis
the brief mandates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import table
from .registry import register

#: Shared floor-division identity (see classics._TS_SLOPE): C-style
#: truncating ``%`` is identical in Spark and DuckDB, so this string is
#: exact on both engines for any sign of ``num`` and positive ``den``.
_FDIV = "CAST(({num} - ((({num} % {den}) + {den}) % {den})) / {den} AS BIGINT)"


# ---------------------------------------------------------------------------
# Isotonic regression of mean discount vs quantity rung (PAVA via minimax)
# ---------------------------------------------------------------------------

_ISO_ORACLE = f"""
WITH per AS (
  SELECT CAST(l_quantity AS BIGINT) AS rung,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT))
              AS BIGINT) AS s
  FROM lineitem GROUP BY 1
), pre AS (
  SELECT rung, n, s,
         CAST(SUM(n) OVER (ORDER BY rung
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cn,
         CAST(SUM(s) OVER (ORDER BY rung
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cs
  FROM per
), pairs AS (
  SELECT i.rung AS i, j.rung AS j,
         (j.cs - (i.cs - i.s)) * 10000 AS num,
         j.cn - (i.cn - i.n) AS den
  FROM pre i JOIN pre j ON i.rung <= j.rung
), m AS (
  SELECT i, j, {_FDIV.format(num="num", den="den")} AS m6 FROM pairs
), b AS (
  SELECT i, j,
         MIN(m6) OVER (PARTITION BY i ORDER BY j DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bik
  FROM m
), fit AS (
  SELECT j AS rung, CAST(MAX(bik) AS BIGINT) AS fit_micro FROM b GROUP BY 1
)
SELECT per.rung, per.n,
       {_FDIV.format(num="(per.s * 10000)", den="per.n")} AS mean_micro,
       fit.fit_micro,
       CAST(fit.fit_micro AS DOUBLE) / 1000000.0 AS fit
FROM per JOIN fit ON per.rung = fit.rung
ORDER BY per.rung
"""


@register(
    "isotonic_discount_quantity",
    oracle=_ISO_ORACLE,
    doc="Isotonic (monotone non-decreasing) regression of mean discount "
        "vs quantity rung, the sklearn-IsotonicRegression calibration "
        "fit as a relational plan: one lineitem groupBy collapses the "
        "corpus to <=50 (rung, n, sum-hundredths) rows; prefix sums + a "
        "bounded i<=j pair join give every block mean, frozen to BIGINT "
        "micro-units by the shared floor-div identity; the minimax "
        "fit(k) = max_{i<=k} min_{j>=k} mean(i..j) (Barlow 1972, equals "
        "PAVA) falls out of one suffix-min window + one max regroup. "
        "Everything past the scan is O(rungs^2) ~ 1.3k rows regardless "
        "of corpus size — the 100 TB cost is the scan, full stop. The "
        "whole fit is ONE linear lineage (scan -> rung aggregate -> "
        "one-row array -> row-local pair explode -> two bounded "
        "windows -> diagonal filter): no self-join, so the fact is "
        "scanned exactly once (plan-pinned), the same row-local pair "
        "device as theil_sen_trend / duplicate_event_detector.",
)
def q_isotonic_discount_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    per = (
        li.groupBy(F.col("l_quantity").cast("bigint").alias("rung"))
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(F.expr("CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT)"))
            .cast("bigint").alias("s"),
        )
    )
    # Collapse the <=50-row rung relation into ONE sorted array row so
    # pair generation is row-local (never a self-join that would force
    # a second derivation — and a second fact scan — of `per`).
    one = per.agg(
        F.array_sort(F.collect_list(F.struct("rung", "n", "s"))).alias("a"))
    pre = one.select(F.expr(
        "transform(a, (x, i) -> struct("
        "  x.rung AS rung, x.n AS n, x.s AS s,"
        "  aggregate(slice(a, 1, i + 1), CAST(0 AS BIGINT),"
        "            (acc, y) -> acc + y.n) AS cn,"
        "  aggregate(slice(a, 1, i + 1), CAST(0 AS BIGINT),"
        "            (acc, y) -> acc + y.s) AS cs))"
    ).alias("p"))
    pairs = (
        pre.select(F.expr(
            "explode(flatten(transform(p, (xi, i) ->"
            "  transform(slice(p, i + 1, size(p) - i), xj -> struct("
            "    xi.rung AS i, xj.rung AS j,"
            "    (xj.cs - xi.cs + xi.s) * 10000 AS num,"
            "    xj.cn - xi.cn + xi.n AS den)))))"
        ).alias("pr"))
        .select("pr.*")
        .withColumn("m6", F.expr(_FDIV.format(num="num", den="den")))
    )
    wm = (
        Window.partitionBy("i").orderBy(F.col("j").desc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wfit = Window.partitionBy("j")
    return (
        pairs
        .withColumn("bik", F.min("m6").over(wm))
        .withColumn("fit_micro", F.max("bik").over(wfit).cast("bigint"))
        .where(F.col("i") == F.col("j"))
        .select(
            F.col("j").alias("rung"),
            F.col("den").alias("n"),
            F.col("m6").alias("mean_micro"),
            "fit_micro",
            F.expr("CAST(fit_micro AS DOUBLE) / 1000000.0").alias("fit"),
        )
        .orderBy("rung")
    )


# ---------------------------------------------------------------------------
# Quantile normalization of store daily-revenue distributions
# ---------------------------------------------------------------------------

_QN_ORACLE = f"""
WITH daily AS (
  SELECT n_name AS store,
         strftime(o_orderdate, '%Y-%m-%d') AS sale_date,
         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS BIGINT) AS cents
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  GROUP BY 1, 2
), ranked AS (
  SELECT store, sale_date, cents,
         CAST(ROW_NUMBER() OVER (PARTITION BY store
              ORDER BY cents, sale_date) AS BIGINT) AS rk
  FROM daily
), ref AS (
  SELECT rk,
         CAST(COUNT(*) AS BIGINT) AS n_stores,
         CAST(SUM(cents) AS BIGINT) AS sc
  FROM ranked GROUP BY 1
)
SELECT r.store, r.sale_date, r.rk,
       CAST(r.cents AS DOUBLE) / 100.0 AS revenue,
       f.n_stores,
       {_FDIV.format(num="(f.sc * 10000)", den="f.n_stores")} AS qn_micro,
       CAST({_FDIV.format(num="(f.sc * 10000)", den="f.n_stores")}
            AS DOUBLE) / 1000000.0 AS qn_value
FROM ranked r JOIN ref f ON r.rk = f.rk
ORDER BY r.store, r.rk
"""


@register(
    "quantile_normalize_store_daily",
    oracle=_QN_ORACLE,
    doc="Quantile normalization of per-store daily-revenue "
        "distributions (the ML feature-calibration transform: replace "
        "each store's r-th order statistic by the cross-store mean of "
        "r-th order statistics). One orders scan -> (store, day) exact-"
        "cents aggregate (calendar-bounded: <=|stores|x|days| rows at "
        "any corpus size); rank = deterministic row_number per store on "
        "(cents, date); the reference distribution is a window over "
        "the rank partition (NOT a groupBy + join-back, which would "
        "re-derive the daily relation and re-scan the fact), its mean "
        "frozen to BIGINT micro-dollars by the shared floor-div "
        "identity (sum over <=25 stores keeps the numerator far under "
        "2^53). "
        "The store dim rides in as a broadcast of customer x nation "
        "(at a truly large customer dim this becomes one shuffle join "
        "on custkey — same relation, different physical pick). The "
        "25-partition rank window is over the calendar-bounded daily "
        "relation, never the fact.",
)
def q_quantile_normalize_store_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = table(spark, sf_dir, "orders")
    customer = table(spark, sf_dir, "customer")
    nation = table(spark, sf_dir, "nation")
    cust_store = (
        customer.join(F.broadcast(nation),
                      customer.c_nationkey == nation.n_nationkey)
        .select("c_custkey", F.col("n_name").alias("store"))
    )
    daily = (
        orders.join(F.broadcast(cust_store),
                    orders.o_custkey == cust_store.c_custkey)
        .groupBy(
            "store",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("sale_date"),
        )
        .agg(
            F.sum(F.expr(
                "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"))
            .cast("bigint").alias("cents")
        )
    )
    wr = Window.partitionBy("store").orderBy("cents", "sale_date")
    wrk = Window.partitionBy("rk")
    # The reference distribution is a window over the rank partition —
    # NOT a groupBy + join-back, which would derive `ranked` twice and
    # re-scan orders with it. One lineage, one fact scan (plan-pinned).
    return (
        daily.withColumn("rk", F.row_number().over(wr).cast("bigint"))
        .withColumn("n_stores", F.count("*").over(wrk).cast("bigint"))
        .withColumn("sc", F.sum("cents").over(wrk).cast("bigint"))
        .withColumn(
            "qn_micro",
            F.expr(_FDIV.format(num="(sc * 10000)", den="n_stores")))
        .select(
            "store", "sale_date", "rk",
            F.expr("CAST(cents AS DOUBLE) / 100.0").alias("revenue"),
            "n_stores", "qn_micro",
            F.expr("CAST(qn_micro AS DOUBLE) / 1000000.0").alias("qn_value"),
        )
        .orderBy("store", "rk")
    )
