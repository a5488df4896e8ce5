"""Per-product demand forecasting (ref EP3 / EDA.ipynb cells 54-69).

Feature relation = the W1 lag stack (plans/windowed.q_lag_features) with
a typed date. Splits are per-product positional (last ``TEST_ROWS``
observations held out) because the TPC-H-ish testdata is sparse per
product — a global last-14-days cutoff (ref dashboard.py:716-724, kept
as the ``train_test_time_split`` query) would leave most products with
an empty test set here.

Scale: training is one ``applyInPandas`` over products — each group is
(days × 1 product) rows, small by construction, and groups parallelize
across executors; the pyspark.ml variant trains one global model with
JVM-distributed least squares. No driver-side collect anywhere.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.money import oracle_dsum
from ..plans.registry import register
from ..plans.windowed import _DAILY_SQL, _daily

#: AR order for ML features (shorter than the reference's 14 so sparse
#: per-product series keep enough training rows; the 14-lag relation
#: itself is the oracle-checked `lag_features` query).
ML_LAGS = 7
TEST_ROWS = 3
RIDGE = 1e-3

FEATURES = [f"lag_{i}" for i in range(1, ML_LAGS + 1)] + [
    "month", "day_of_week", "is_weekend",
]


def feature_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """product × date grain with lag_1..lag_7 + calendar features and a
    per-product positional split marker (is_test on the last 3 rows)."""
    w = Window.partitionBy("product").orderBy("date")
    wdesc = Window.partitionBy("product").orderBy(F.desc("date"))
    lag_cols = [
        F.lag("total_quantity", i).over(w).alias(f"lag_{i}")
        for i in range(1, ML_LAGS + 1)
    ]
    return (
        _daily(spark, sf_dir)
        .select(
            "product", "date", "total_quantity", *lag_cols,
            F.month("date").alias("month"),
            ((F.dayofweek("date") + 5) % 7).alias("day_of_week"),
            (((F.dayofweek("date") + 5) % 7) >= 5).cast("int").alias("is_weekend"),
        )
        .na.drop(subset=[f"lag_{i}" for i in range(1, ML_LAGS + 1)])
        .withColumn("is_test", (F.row_number().over(wdesc) <= TEST_ROWS).cast("int"))
    )


@register(
    "wape_seasonal_naive",
    oracle=_DAILY_SQL + f"""
    , lagged AS (
      SELECT product, total_quantity,
             lag(total_quantity, 7) OVER (PARTITION BY product ORDER BY date) AS yhat
      FROM daily
    )
    SELECT product,
           COUNT(*) AS n,
           {oracle_dsum('abs(total_quantity - yhat)', 'sum_abs_err')},
           {oracle_dsum('total_quantity', 'sum_actual')},
           CAST(CAST(SUM(CAST(abs(total_quantity - yhat) AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
             / CAST(CAST(SUM(CAST(total_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE)
             AS wape
    FROM lagged WHERE yhat IS NOT NULL GROUP BY 1
    """,
    doc="U4 as pure expressions: seasonal-naive baseline (yhat = lag_7 "
        "quantity) scored per product with WAPE = Σ|err|/Σy — both sums "
        "decimal-exact, so the ratio is bit-deterministic cross-engine "
        "(plain MAPE averages per-row float ratios → order-dependent; "
        "the trainers report it, the oracle checks WAPE)",
)
def q_wape_seasonal_naive(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("product").orderBy("date")
    lagged = _daily(spark, sf_dir).select(
        "product", "total_quantity",
        F.lag("total_quantity", 7).over(w).alias("yhat"),
    ).filter(F.col("yhat").isNotNull())
    err = F.abs(F.col("total_quantity") - F.col("yhat"))
    dec = lambda c: F.sum(c.cast("decimal(18,2)")).cast("string").cast("double")  # noqa: E731
    return lagged.groupBy("product").agg(
        F.count("*").alias("n"),
        dec(err).alias("sum_abs_err"),
        dec(F.col("total_quantity")).alias("sum_actual"),
        (dec(err) / dec(F.col("total_quantity"))).alias("wape"),
    )


_TRAIN_SCHEMA = (
    "product string, n_train int, n_test int, "
    "train_wape double, test_wape double, test_mape double"
)


def _fit_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Ridge AR fit for one product — deterministic closed form."""
    pdf = pdf.sort_values("date")
    train = pdf[pdf.is_test == 0]
    test = pdf[pdf.is_test == 1]
    if len(train) < len(FEATURES) + 2 or len(test) == 0:
        return pd.DataFrame(columns=[
            "product", "n_train", "n_test",
            "train_wape", "test_wape", "test_mape",
        ]).astype({"product": str})

    def design(d: pd.DataFrame) -> np.ndarray:
        x = d[FEATURES].to_numpy(dtype=np.float64)
        return np.hstack([np.ones((len(d), 1)), x])

    xtr, ytr = design(train), train.total_quantity.to_numpy(np.float64)
    beta = np.linalg.solve(
        xtr.T @ xtr + RIDGE * np.eye(xtr.shape[1]), xtr.T @ ytr
    )
    yhat_tr = xtr @ beta
    yhat_te = design(test) @ beta
    yte = test.total_quantity.to_numpy(np.float64)
    wape = lambda y, yh: float(np.abs(y - yh).sum() / np.abs(y).sum())  # noqa: E731
    return pd.DataFrame({
        "product": [pdf["product"].iloc[0]],
        "n_train": [len(train)], "n_test": [len(test)],
        "train_wape": [wape(ytr, yhat_tr)],
        "test_wape": [wape(yte, yhat_te)],
        "test_mape": [float(np.mean(np.abs((yte - yhat_te) / yte)))],
    })


@register(
    "ml_train_per_product",
    oracle=None,  # linear solve isn't SQL-expressible; rows-only + unit tests
    doc="U3 faithful shape: per-product model training as "
        "groupBy(product).applyInPandas — numpy ridge AR(7)+calendar in "
        "closed form (deterministic; drop-in point for sklearn SVR/RF "
        "grids where the library exists). One shuffle on product; each "
        "pandas group is a single product's daily history.",
)
def q_ml_train_per_product(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        feature_frame(spark, sf_dir)
        .groupBy("product")
        .applyInPandas(_fit_group, schema=_TRAIN_SCHEMA)
    )


@register(
    "ml_sparkml_global",
    oracle=None,  # iterative/JVM training; rows-only + unit tests
    doc="U3 idiomatic scale path: ONE global pyspark.ml model "
        "(StringIndexer(product) → OneHotEncoder → VectorAssembler → "
        "LinearRegression solver='normal', JVM-distributed WLS) scored "
        "per product with expression-level WAPE on the held-out rows",
)
def q_ml_sparkml_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.ml import Pipeline
    from pyspark.ml.feature import OneHotEncoder, StringIndexer, VectorAssembler
    from pyspark.ml.regression import LinearRegression

    df = feature_frame(spark, sf_dir).cache()
    train = df.filter(F.col("is_test") == 0)
    pipe = Pipeline(stages=[
        StringIndexer(inputCol="product", outputCol="product_ix",
                      handleInvalid="keep", stringOrderType="alphabetAsc"),
        OneHotEncoder(inputCol="product_ix", outputCol="product_oh"),
        VectorAssembler(inputCols=FEATURES + ["product_oh"],
                        outputCol="features"),
        LinearRegression(featuresCol="features", labelCol="total_quantity",
                         solver="normal", regParam=1e-3,
                         elasticNetParam=0.0, standardization=True),
    ])
    model = pipe.fit(train)
    scored = model.transform(df.filter(F.col("is_test") == 1))
    return scored.groupBy("product").agg(
        F.count("*").alias("n_test"),
        (F.sum(F.abs(F.col("total_quantity") - F.col("prediction")))
         / F.sum(F.abs("total_quantity"))).alias("test_wape"),
    )


_FORECAST_SCHEMA = "product string, step int, date date, predicted_quantity double"


HORIZON = 14


def _forecast_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Recursive multi-step forecast for one product (ref EP3 forecast
    table, dashboard.py:769-784): fit the ridge AR on ALL rows, then
    roll forward ``HORIZON`` days feeding each prediction back into the
    lag vector. Deterministic closed form, one group per product.
    (Single-argument on purpose: applyInPandas passes (key, pdf) to
    two-parameter functions.)"""
    horizon = HORIZON
    pdf = pdf.sort_values("date")
    if len(pdf) < len(FEATURES) + 2:
        return pd.DataFrame(columns=["product", "step", "date", "predicted_quantity"])

    x = np.hstack([
        np.ones((len(pdf), 1)), pdf[FEATURES].to_numpy(np.float64)
    ])
    y = pdf.total_quantity.to_numpy(np.float64)
    beta = np.linalg.solve(x.T @ x + RIDGE * np.eye(x.shape[1]), x.T @ y)

    lags = list(pdf.total_quantity.iloc[-ML_LAGS:])[::-1]  # lag_1 first
    last_date = pd.Timestamp(pdf.date.iloc[-1])
    rows = []
    for step in range(1, horizon + 1):
        d = last_date + pd.Timedelta(days=step)
        dow = (d.dayofweek) % 7
        feat = np.array([1.0, *lags, float(d.month), float(dow),
                         1.0 if dow >= 5 else 0.0])
        pred = float(feat @ beta)
        rows.append((pdf["product"].iloc[0], step, d.date(), pred))
        lags = [pred] + lags[:-1]
    return pd.DataFrame(rows, columns=["product", "step", "date", "predicted_quantity"])


@register(
    "ml_forecast_14d",
    oracle=None,  # recursive linear solve — rows-only + determinism test
    doc="EP3's forecast table: 14-day recursive forecast per product "
        "(applyInPandas; each step feeds its prediction back into the "
        "lag vector — the reference's predict-on-last-14-features loop, "
        "distributed across products)",
)
def q_ml_forecast_14d(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        feature_frame(spark, sf_dir)
        .groupBy("product")
        .applyInPandas(_forecast_group, schema=_FORECAST_SCHEMA)
    )
