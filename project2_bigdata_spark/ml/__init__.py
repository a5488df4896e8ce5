"""ML surface (SURVEY.md §2.10 / build-plan Phase 4).

The reference grid-searches sklearn RF/SVR/MLP per product and ships
seven SVR pickles (EDA.ipynb cells 58-69, dashboard.py:753-762). sklearn
is not in this environment, so the faithful re-expression is:

- per-product training via ``groupBy("product").applyInPandas`` with a
  deterministic numpy ridge regression (closed-form normal equations —
  same embarrassingly-parallel shape the survey prescribes for the
  sklearn path; swap the solver for sklearn where available);
- an idiomatic ``pyspark.ml`` pipeline (one global model, JVM-side
  distributed training) as the scale path;
- error metrics as plain expressions (U4): WAPE is exact-sum/exact-sum →
  bit-deterministic and DuckDB-oracle-checked; MAPE is reported by the
  trainers.
"""

from . import forecast  # noqa: F401  registers ml_* queries
