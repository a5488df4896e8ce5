"""ML smoke tests (SURVEY.md §5.2 item 5): training runs, metrics are
finite, model count ≤ distinct products; model persistence round-trips
(S5). No accuracy assertions — the survey's RNG caveat applies in
spirit even to the deterministic solver (different feature scaling ⇒
different numbers than sklearn)."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from project2_bigdata_spark.ml.forecast import feature_frame
from project2_bigdata_spark.plans import REGISTRY


def test_per_product_training(spark, sf_dir):
    from project2_bigdata_spark.ml.forecast import GRID_LAGS, GRID_LAMBDAS

    out = REGISTRY["ml_train_per_product"].fn(spark, sf_dir).toPandas()
    assert len(out) > 0
    n_products = feature_frame(spark, sf_dir).select("product").distinct().count()
    assert len(out) <= n_products
    assert out["product"].is_unique
    for c in ["train_wape", "test_wape", "test_mape"]:
        assert out[c].notna().all() and (out[c] >= 0).all()
    assert (out["n_test"] > 0).all()
    # family selection: every winner is a known family; ridge winners
    # carry a grid-point config + coefficient vector of the design
    # width, fit-free families carry an empty coef by contract
    from project2_bigdata_spark.ml.forecast import FAMILIES

    assert out["best_family"].isin(FAMILIES).all()
    ridge = out[out["best_family"] == "ridge"]
    other = out[out["best_family"] != "ridge"]
    assert ridge["best_lambda"].isin(GRID_LAMBDAS).all()
    assert ridge["best_n_lags"].isin(GRID_LAGS).all()
    # the registered query serializes coef to a JSON string (the driver
    # canonicalizer can't hash list cells); decode before checking width
    import json

    assert (ridge["coef"].map(json.loads).map(len) == ridge["best_n_lags"] + 4).all()
    assert (other["coef"].map(json.loads).map(len) == 0).all()
    # the search is live: at least two distinct winning (family, config)s
    assert len(set(zip(out["best_family"], out["best_lambda"], out["best_n_lags"]))) >= 2


def test_per_product_training_deterministic(spark, sf_dir):
    fn = REGISTRY["ml_train_per_product"].fn
    a = fn(spark, sf_dir).toPandas().sort_values("product").reset_index(drop=True)
    b = fn(spark, sf_dir).toPandas().sort_values("product").reset_index(drop=True)
    assert a.equals(b)


def test_sparkml_global(spark, sf_dir):
    out = REGISTRY["ml_sparkml_global"].fn(spark, sf_dir).toPandas()
    assert len(out) > 0
    assert out["test_wape"].notna().all()


def test_sparkml_persistence_roundtrip(spark, sf_dir):
    """S5 model sink/source: Pipeline.save/load preserves predictions."""
    from pyspark.ml import Pipeline, PipelineModel
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import LinearRegression

    df = feature_frame(spark, sf_dir)
    train = df.filter(F.col("is_test") == 0)
    pipe = Pipeline(stages=[
        VectorAssembler(inputCols=["lag_1", "lag_2", "month"], outputCol="features"),
        LinearRegression(featuresCol="features", labelCol="total_quantity",
                         solver="normal", regParam=1e-3),
    ])
    model = pipe.fit(train)
    path = tempfile.mkdtemp(prefix="mlmodel_", dir="/root/repo")
    try:
        model.write().overwrite().save(path)
        reloaded = PipelineModel.load(path)
        a = model.transform(df).agg(F.sum("prediction")).first()[0]
        b = reloaded.transform(df).agg(F.sum("prediction")).first()[0]
        assert a == pytest.approx(b, rel=0, abs=0)
    finally:
        shutil.rmtree(path, ignore_errors=True)


@pytest.mark.slow
def test_best_model_persistence_roundtrip(spark, sf_dir):
    """S5/U3: per-product winners persist to parquet and reload; the
    forecast from reloaded models is bit-identical to the in-memory one
    (the reference's save-best_model_*.pkl → dashboard-load protocol)."""
    from project2_bigdata_spark.ml.forecast import (
        forecast_from_models, load_models, save_models, train_best_models,
    )

    models = train_best_models(spark, sf_dir)
    path = tempfile.mkdtemp(prefix="bestmodels_", dir="/root/repo")
    try:
        save_models(models, path)
        reloaded = load_models(spark, path)
        feats = feature_frame(spark, sf_dir)
        key = ["product", "step"]
        a = forecast_from_models(feats, models).toPandas().sort_values(key)
        b = forecast_from_models(feats, reloaded).toPandas().sort_values(key)
        assert a.reset_index(drop=True).equals(b.reset_index(drop=True))
        # reload preserves the winning configs exactly
        m0 = models.toPandas().sort_values("product").reset_index(drop=True)
        m1 = reloaded.toPandas().sort_values("product").reset_index(drop=True)
        assert m0[["product", "best_lambda", "best_n_lags"]].equals(
            m1[["product", "best_lambda", "best_n_lags"]])
    finally:
        shutil.rmtree(path, ignore_errors=True)


@pytest.mark.slow
def test_forecast_14d_shape_and_determinism(spark, sf_dir):
    fn = REGISTRY["ml_forecast_14d"].fn
    a = fn(spark, sf_dir).toPandas()
    assert len(a) > 0
    per_product = a.groupby("product")["step"].agg(["count", "min", "max"])
    assert (per_product["count"] == 14).all()
    assert (per_product["min"] == 1).all() and (per_product["max"] == 14).all()
    assert a["predicted_quantity"].notna().all()
    b = fn(spark, sf_dir).toPandas()
    key = ["product", "step"]
    assert a.sort_values(key).reset_index(drop=True).equals(
        b.sort_values(key).reset_index(drop=True))


def _family_fixture_pdf():
    """Two synthetic products on which the model families GENUINELY
    disagree (VERDICT r5 item 7 — the selection logic itself, which
    rows-only checks can't see):

    - ``periodic``: an exact period-7 series. seasonal_naive forecasts
      it with validation MAPE exactly 0.0; ridge is biased away from the
      perfect lag_7 coefficient by λ-shrinkage (every grid λ > 0), so
      its MAPE is > 0. seasonal_naive must win.
    - ``trend``: a clean linear ramp. seasonal_naive lags it by a
      constant 7-day offset (MAPE ≈ 21/y), the 7-day moving average by
      ~12/y, while ridge recovers y = lag_1 + slope almost exactly.
      ridge must win.
    """
    import pandas as pd

    from project2_bigdata_spark.ml.forecast import ML_LAGS, TEST_ROWS

    rows = []
    n_days = 49  # 7 weeks; leaves 42 usable rows after the lag-7 drop
    dates = pd.date_range("2024-01-01", periods=n_days, freq="D")
    series = {
        "periodic": [float([10, 20, 30, 40, 50, 60, 70][t % 7])
                     for t in range(n_days)],
        "trend": [100.0 + 3.0 * t for t in range(n_days)],
    }
    for product, y in series.items():
        for t in range(ML_LAGS, n_days):
            d = dates[t]
            dow = (d.dayofweek) % 7
            rows.append({
                "product": product,
                "date": d.date(),
                "total_quantity": y[t],
                **{f"lag_{i}": y[t - i] for i in range(1, ML_LAGS + 1)},
                "month": d.month,
                "day_of_week": dow,
                "is_weekend": 1 if dow >= 5 else 0,
                "is_test": 1 if t >= n_days - TEST_ROWS else 0,
            })
    return pd.DataFrame(rows)


def test_family_selection_on_disagreeing_products(spark):
    """The per-product winner table must pick a DIFFERENT family per
    product when the data demands it — through the same
    groupBy(product).applyInPandas path production uses."""
    from project2_bigdata_spark.ml.forecast import _TRAIN_SCHEMA, _fit_group

    pdf = _family_fixture_pdf()
    sdf = spark.createDataFrame(pdf)
    out = (
        sdf.groupBy("product")
        .applyInPandas(_fit_group, schema=_TRAIN_SCHEMA)
        .toPandas()
        .set_index("product")
    )
    assert out.loc["periodic", "best_family"] == "seasonal_naive"
    assert out.loc["periodic", "test_mape"] == 0.0
    assert len(out.loc["periodic", "coef"]) == 0  # fit-free family contract
    assert out.loc["trend", "best_family"] == "ridge"
    assert out.loc["trend", "test_mape"] < 0.01  # near-exact ramp recovery
    assert len(out.loc["trend", "coef"]) == out.loc["trend", "best_n_lags"] + 4
    # and the recursive forecaster respects each winner's family
    from project2_bigdata_spark.ml.forecast import forecast_from_models

    models = sdf.groupBy("product").applyInPandas(
        _fit_group, schema=_TRAIN_SCHEMA)
    fc = forecast_from_models(sdf, models).toPandas()
    per = fc.set_index(["product", "step"])["predicted_quantity"]
    # periodic winner = seasonal_naive ⇒ the 14-day forecast replays the
    # exact 7-cycle; trend winner = ridge ⇒ the ramp keeps climbing
    hist = _family_fixture_pdf()
    tail = hist[hist["product"] == "periodic"]["total_quantity"].tolist()[-7:]
    for step in range(1, 15):
        assert per[("periodic", step)] == tail[(step - 1) % 7]
    assert per[("trend", 14)] > per[("trend", 1)] > hist[
        hist["product"] == "trend"]["total_quantity"].max() - 10


@pytest.mark.slow
def test_rf_grid_runs_and_is_deterministic(spark, sf_dir):
    """Seeded RF + seeded TrainValidationSplit: same winner, same scores
    across runs; winning params are actual grid points."""
    fn = REGISTRY["ml_rf_grid"].fn
    a = fn(spark, sf_dir).toPandas().sort_values("product").reset_index(drop=True)
    assert len(a) > 0
    assert a["test_wape"].notna().all()
    assert a["best_num_trees"].isin([10, 30]).all()
    assert a["best_max_depth"].isin([3, 6]).all()
    assert a["best_num_trees"].nunique() == 1  # one global winner
    b = fn(spark, sf_dir).toPandas().sort_values("product").reset_index(drop=True)
    assert a.equals(b)
